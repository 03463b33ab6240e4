package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extensions, builder brief): token counting, quality scoring, language
  * identification. All pure Column expressions (codegen'd, pushdown-safe);
  * every construct has a portable DuckDB twin so the correctness gate covers
  * them bit-exactly.
  *
  * Portability rules: occurrence counting uses the replace-length trick
  * (identical integer math in both engines) instead of engine-specific
  * regex-count functions; punctuation is an explicit character class.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  val tokenCountSql: String =
    "len(regexp_split_to_array(trim(text), '\\s+'))"

  /** BPE-ish subword token count — the GPT-2-style pre-tokenizer classes
    * (letter runs, single digits, single punctuation/symbol chars) spelled
    * with explicit ASCII classes only, so the Java (Spark) and RE2
    * (DuckDB) regex engines match identically. The count approximates BPE
    * *pre-token* cardinality; real merges only split further, so it is
    * the canonical cheap upper-ish budget signal for token accounting. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  val bpeTokenCountSql: String =
    """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))"""

  /** Occurrences of literal `needle` (no regex) via replace-length. */
  def countOcc(haystack: Column, needle: String): Column =
    (length(haystack) - length(replace(haystack, lit(needle), lit("")))) /
      needle.length

  def countOccSql(h: String, needle: String): String =
    s"(length($h) - length(replace($h, '$needle', ''))) / ${needle.length}"

  // Spark/Java regex form and the DuckDB SQL-literal form (single quote
  // doubled for the SQL string literal)
  private val PunctClass = "[.,!?;:'\"()\\-]"
  private val PunctClassSqlLit = "[.,!?;:''\"()\\-]"

  /** Quality-scoring feature set per document: lengths, token stats,
    * punctuation / digit / whitespace ratios, stopword ratio, mean token
    * length — the usual pre-training quality filters. */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val n = length(t).cast("double")
    val tokens = tokenCount(t)
    val stop = Seq("the", "a", "and", "of", "to")
      .map(w => countOcc(concat(lit(" "), lower(t), lit(" ")), s" $w "))
      .reduce(_ + _)
    docs.select(
      col("doc_id"),
      length(t).as("n_chars"),
      tokens.as("n_tokens"),
      (n / tokens).as("mean_token_len"),
      (length(t) - length(regexp_replace(t, PunctClass, "")))
        .cast("double").divide(n).as("punct_ratio"),
      (length(t) - length(regexp_replace(t, "[0-9]", "")))
        .cast("double").divide(n).as("digit_ratio"),
      (length(t) - length(replace(t, lit(" "), lit(""))))
        .cast("double").divide(n).as("space_ratio"),
      (stop.cast("double") / tokens).as("stopword_ratio"))
  }

  val qualitySql: String = {
    val stop = Seq("the", "a", "and", "of", "to")
      .map(w => countOccSql("(' ' || lower(text) || ' ')", s" $w "))
      .mkString("(", " + ", ")")
    s"""SELECT doc_id, length(text) AS n_chars,
       | $tokenCountSql AS n_tokens,
       | CAST(length(text) AS DOUBLE) / $tokenCountSql AS mean_token_len,
       | CAST(length(text) - length(regexp_replace(text, '$PunctClassSqlLit', '', 'g')) AS DOUBLE)
       |   / length(text) AS punct_ratio,
       | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |   / length(text) AS digit_ratio,
       | CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
       |   / length(text) AS space_ratio,
       | CAST($stop AS DOUBLE) / $tokenCountSql AS stopword_ratio
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  /** Stopword-profile language ID heuristic. Deterministic argmax with a
    * fixed priority chain for ties. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "una", "y"),
    "it" -> Seq("il", "che", "di", "per", "non"))

  def langId(docs: DataFrame): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> words.map(w => countOcc(padded, s" $w ")).reduce(_ + _)
    }
    val scored = docs.select(col("doc_id") +: col("lang").as("lang_meta") +:
      scores.map { case (l, c) => c.as(s"s_$l") }: _*)
    // argmax with first-wins priority: en > de > fr > es > it
    val langs = LangProfiles.map(_._1)
    val maxScore = langs.map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
    val pick = langs.foldRight(lit("unknown")) { (l, acc) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, l).otherwise(acc)
    }
    scored.select(col("doc_id"), col("lang_meta"), pick.as("lang_pred"),
      maxScore.as("score"))
  }

  val langIdSql: String = {
    val scoreExpr = LangProfiles.map { case (lang, words) =>
      val c = words
        .map(w => countOccSql("(' ' || lower(text) || ' ')", s" $w "))
        .mkString("(", " + ", ")")
      lang -> c
    }
    val sels = scoreExpr.map { case (l, c) => s"$c AS s_$l" }.mkString(", ")
    val maxS = scoreExpr.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val pick = scoreExpr.reverse.foldLeft("'unknown'") { case (acc, (l, _)) =>
      s"CASE WHEN s_$l = m AND m > 0 THEN '$l' ELSE $acc END"
    }
    s"""SELECT doc_id, lang_meta, $pick AS lang_pred, m AS score FROM (
       | SELECT doc_id, lang_meta, $maxS AS m, s_en, s_de, s_fr, s_es, s_it FROM (
       |  SELECT doc_id, lang AS lang_meta, $sels FROM documents))
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }
}
