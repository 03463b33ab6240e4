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
    size(split(trim(text), "[ \\t\\n\\x0B\\f\\r]+"))

  val tokenCountSql: String =
    "len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'))"

  /** BPE-ish subword token count — the GPT-2-style pre-tokenizer classes
    * (letter runs, single digits, single punctuation/symbol chars) spelled
    * with explicit ASCII classes only, so the Java (Spark) and RE2
    * (DuckDB) regex engines match identically. The count approximates BPE
    * *pre-token* cardinality; real merges only split further, so it is
    * the canonical cheap upper-ish budget signal for token accounting. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  val bpeTokenCountSql: String =
    """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]'))"""

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

  /** Feature-hashing document vectors (the hashing trick, Weinberger et
    * al. ICML'09): every token maps to a bucket in a fixed `dims`-wide
    * space via its md5, with a ±1 sign from an independent hash bit (the
    * signed variant that makes hash collisions cancel in expectation);
    * the document's vector is the signed occurrence count per bucket.
    * The zero-training text embedder: feeds k-means / kNN / SemDeDup /
    * cosine near-dup when no neural embedding column exists, at any
    * vocabulary size and with no model artifact to ship. Emitted SPARSE
    * (`doc_id, bucket, val` — only touched buckets), which is both the
    * join-friendly shape for downstream cosine (a (bucket)-keyed
    * equi-join of two sparse vectors) and integer-exact cross-engine.
    *
    * Scale shape: tokenize → map-side hash/sign → ONE (doc_id, bucket)
    * aggregation with partial combine; nothing else. Output is bounded
    * by docs × dims. */
  def hashEmbed(docs: DataFrame, dims: Int = 64): DataFrame = {
    val h = conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long")
    val sgn = when(
      conv(substring(md5(col("term")), 16, 1), 16, 10).cast("int") < 8,
      1L).otherwise(-1L)
    tokens(docs)
      .select(col("doc_id"), (h % dims).as("bucket"), sgn.as("s"))
      .groupBy("doc_id", "bucket").agg(sum(col("s")).as("val"))
  }

  def hashEmbedSql(dims: Int = 64): String =
    s"""WITH toks AS ($tokensSql)
       |SELECT doc_id,
       | CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % $dims
       |  AS bucket,
       | CAST(sum(CASE WHEN CAST(('0x' || substr(md5(term), 16, 1))
       |    AS BIGINT) < 8 THEN 1 ELSE -1 END) AS BIGINT) AS val
       |FROM toks GROUP BY doc_id, bucket
       |ORDER BY doc_id, bucket""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------- repetition signals

  /** Gopher-style repetition signals per document: total / distinct word
    * n-gram counts, the most-frequent n-gram's share of all n-grams, and
    * the type-token ratio. The repetition share is the classic "fraction
    * of characters in the most common n-gram" filter family ("Scaling
    * Language Models" Gopher §A.1.1) restated over n-gram counts; all
    * outputs are integer counts plus single exact IEEE divisions, so the
    * oracle is bit-trivial.
    *
    * Scale shape: one map-side n-gram explode, one (doc_id, gram)
    * aggregation, one per-doc aggregation — same single-exchange layout
    * as [[Dedup.shingles]]. */
  def repetition(docs: DataFrame, n: Int = 2): DataFrame = {
    val ws = split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")
    val grams = graft.functions.parallelized(docs)
      .select(col("doc_id"), explode(array(ws)).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " "))).as("g"))
      .repartition(col("doc_id"))
    grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("distinct_grams"),
        max(col("c")).as("top_gram_count"))
      .select(col("doc_id"), col("n_grams"), col("distinct_grams"),
        col("top_gram_count"),
        (col("top_gram_count").cast("double") / col("n_grams"))
          .as("top_gram_frac"),
        (col("distinct_grams").cast("double") / col("n_grams")).as("ttr"))
  }

  def repetitionSql(n: Int = 2): String = {
    val parts = (0 until n).map {
      case 0 => "w"
      case i => s"lead(w, $i) OVER (PARTITION BY doc_id ORDER BY pos)"
    }.mkString(" || ' ' || ")
    s"""SELECT doc_id, n_grams, distinct_grams, top_gram_count,
       | CAST(top_gram_count AS DOUBLE) / n_grams AS top_gram_frac,
       | CAST(distinct_grams AS DOUBLE) / n_grams AS ttr
       |FROM (
       | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |  count(*) AS distinct_grams,
       |  max(c) AS top_gram_count
       | FROM (SELECT doc_id, g, count(*) AS c FROM (
       |   SELECT doc_id, $parts AS g FROM (
       |    SELECT doc_id,
       |     unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w,
       |     generate_subscripts(
       |       regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |    FROM documents))
       |  WHERE g IS NOT NULL GROUP BY 1, 2)
       | GROUP BY doc_id)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  /** Corpus-frequency log-probability quality signal (the CCNet-family
    * "word rarity" score): the mean over a document's word OCCURRENCES of
    * `ln(c_w / N)` — `c_w` the word's corpus count, `N` total corpus
    * tokens. Documents of common words score high (≈ -6), gibberish and
    * rare-token spam score low — the cheap proxy for an LM-perplexity
    * filter when no model is available.
    *
    * Determinism contract: each term is integer-quantized
    * `floor(ln(p)·1e12)` (the lnQ pattern — raw ln differs by 1 ulp
    * across libms), summed EXACTLY in decimal, divided once at the end —
    * so the mean is bit-identical across engines and accumulation orders
    * (same shape as the variance quantizer).
    *
    * Scale: one word explode, one vocab aggregation, one equi-join on
    * the word key (AQE picks broadcast vs shuffle by vocab size), one
    * per-doc aggregation; the corpus total joins as a 1-row
    * LocalRelation (bm25's corpus-constants pattern). */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    // freq is checkpointed so the corpus tokenizes exactly TWICE (freq
    // build + join probe side), not three times — bm25's materialization
    // contract; consts derive from the checkpointed layer for free
    val words = tokens(docs)
    val freq = words.groupBy("term").agg(count(lit(1)).as("c"))
      .transform(graft.functions.checkpointed)
    val consts = graft.functions.localRelation(
      freq.agg(sum(col("c")).cast("long").as("n_total")))
    val qterm = floor(
      log(col("c").cast("double") / col("n_total").cast("double")) * 1e12)
    words.join(freq, "term")
      .crossJoin(broadcast(consts))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(qterm.cast("decimal(38,0)")).cast("double").as("_qsum"))
      .select(col("doc_id"), col("n_words"),
        (col("_qsum") / 1e12 / col("n_words")).as("avg_logprob"))
  }

  /** Interpolated BIGRAM language-model log-prob per document — the
    * CCNet-style quality signal one model order up from
    * [[unigramLogProb]] (perplexity under an n-gram LM is THE standard
    * pre-training quality score; the unigram form ranks word rarity,
    * the bigram form additionally scores word ORDER — shuffled or
    * machine-mangled text keeps its unigram score but collapses here).
    * The LM is self-trained on the corpus: per consecutive word pair,
    * `p(w2|w1) = λ·c12/c1 + (1−λ)·c2/N` (interpolated backoff to the
    * unigram — never zero, so ln is total).
    *
    * Determinism contract: counts are exact integers, p is ONE
    * identically-spelled double chain in both engines, each pair's ln
    * goes through the lnQ quantizer, and the per-doc sum is exact
    * decimal — bit-identical at any accumulation order
    * ([[unigramLogProb]]'s recipe).
    *
    * Scale shape: one bigram explode (map-side, split bound to a
    * projected column — the O(words²) trap avoided), ONE aggregation
    * per model table (bigram counts, unigram counts), equi-joins on the
    * pair/word keys (AQE picks broadcast vs shuffle by vocab size), the
    * corpus total as a 1-row LocalRelation, one per-doc aggregation.
    * Docs with fewer than 2 words have no bigrams and emit no row,
    * identically in both engines. */
  /** The per-doc bigram stream (doc_id, w1, w2), multiplicity kept.
    * Pure stateless expressions, so it applies to STREAMING DataFrames
    * too — the join-scorer's stream side. */
  private[graft] def bigramPairs(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+").as("ws"))
    .where(size(col("ws")) >= 2)
    .select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
    .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** The TRAINED interpolated-bigram model as a first-class artifact:
    * one row per distinct corpus bigram, `(w1, w2, q_lnp)` with
    * `q_lnp = floor(ln(λ·c12/c1 + (1−λ)·c2/N)·1e12)` — the lnQ-quantized
    * pair log-prob [[bigramLogProb]] aggregates and the streaming scorer
    * ([[graft.streaming.Streaming.streamingBigramScore]]) broadcasts
    * (train batch, score the ingest stream — the shape a production
    * quality gate runs). Bounded by the bigram vocabulary. */
  def bigramModel(docs: DataFrame, lambda: Double = 0.9,
      minCount: Long = 1L): DataFrame =
    bigramModelFrom(bigramPairs(docs), docs, lambda, minCount)

  /** [[bigramModel]] pruned to the [[minCountFor]] row budget with the
    * threshold derived IN-PLAN: the model's own 1-row corpus-total
    * broadcast (needed for the interpolation anyway) also yields
    * `minCount = ceil(n_total / targetRows)`, so the prune costs zero
    * extra scans and no driver action — the tail drops in a filter that
    * sits on the pair aggregate behind a 1-row broadcast, BEFORE the
    * vocab joins. The oracle twin ([[bigramModelSql]] with targetRows)
    * computes the same threshold as a SQL subquery. */
  def bigramModelBudget(docs: DataFrame, lambda: Double = 0.9,
      targetRows: Long = 2000000L): DataFrame =
    bigramModelFrom(bigramPairs(docs), docs, lambda, 1L,
      Some(targetRows))

  /** Serving-model row budget → count-prune threshold, the
    * [[dfMaxFor]]/[[graft.ext.Dedup.bandBitsFor]] pattern with a HARD
    * guarantee instead of a heuristic: of N bigram tokens, at most N/m
    * distinct bigrams can have count ≥ m (pigeonhole), so pruning at
    * `minCount = ceil(N / targetRows)` bounds the model to ≤ targetRows
    * rows for ANY corpus — no Zipf assumption. At test/sf scale
    * (N ≤ targetRows) this returns 1: no pruning, bit-identical serving.
    * Count-pruning is also what shipped LM servers (KenLM, the
    * CCNet wikipedia models) do — rare bigrams carry no stable signal. */
  def minCountFor(nTokens: Long, targetRows: Long = 2000000L): Long =
    math.max(1L, (nTokens + targetRows - 1) / targetRows)

  private def bigramModelFrom(pairs: DataFrame, docs: DataFrame,
      lambda: Double, minCount: Long = 1L,
      targetRows: Option[Long] = None): DataFrame = {
    import graft.functions.localRelation
    val c12raw = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = tokens(docs).groupBy("term").agg(count(lit(1)).as("c"))
      .transform(graft.functions.checkpointed)
    val consts = localRelation(
      uni.agg(sum(col("c")).cast("long").as("n_total")))
    // prune BEFORE the two vocab joins, so the (huge) rare-bigram tail
    // never joins or shuffles: a literal minCount filters the aggregate
    // directly; a targetRows budget derives the threshold from the SAME
    // 1-row corpus-total broadcast the interpolation needs anyway
    // (ceil(n_total / targetRows) — minCountFor in-plan, no driver
    // action, no extra scan)
    val c12 = (minCount, targetRows) match {
      case (_, Some(t)) => c12raw.crossJoin(broadcast(consts))
        .where(col("c12") >=
          ceil(col("n_total").cast("double") / lit(t)).cast("long"))
        .select(col("w1"), col("w2"), col("c12"))
      case (m, None) if m > 1L => c12raw.where(col("c12") >= m)
      case _ => c12raw
    }
    // p spelled as ((λ·c12)/c1 + ((1−λ)·c2)/N) — the same left-assoc
    // chain the twin writes textually
    val p = lit(lambda) * col("c12").cast("double") / col("c1").cast("double") +
      lit(1.0 - lambda) * col("c2").cast("double") /
        col("n_total").cast("double")
    c12
      .join(uni.select(col("term").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("term").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(consts))
      .select(col("w1"), col("w2"),
        floor(log(p) * 1e12).cast("long").as("q_lnp"))
  }

  def bigramLogProb(docs: DataFrame, lambda: Double = 0.9): DataFrame = {
    // checkpoint: pairs feed the model's c12 AND the probe side — the
    // corpus tokenizes into bigrams exactly once
    val pairs = bigramPairs(docs).transform(graft.functions.checkpointed)
    pairs
      .join(bigramModelFrom(pairs, docs, lambda), Seq("w1", "w2"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("q_lnp").cast("decimal(38,0)")).cast("double").as("_qsum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("_qsum") / 1e12 / col("n_bigrams")).as("avg_logprob"))
  }

  /** DuckDB twin of [[bigramModel]] — the trained artifact itself as an
    * oracle-gated table: (w1, w2, q_lnp), same left-assoc interpolation
    * chain and lnQ quantization as the logprob twin. With `targetRows`
    * set, the count-prune threshold is computed IN SQL from the corpus's
    * own token count (`ceil(n_tokens / targetRows)` — exactly
    * [[minCountFor]]), so both engines derive the same data-dependent
    * minCount with no parameter side-channel. */
  def bigramModelSql(lambda: Double = 0.9,
      targetRows: Option[Long] = None): String = {
    val having = targetRows.map(t =>
      s"HAVING count(*) >= (SELECT CAST(ceil(CAST(count(*) AS DOUBLE)" +
        s" / $t) AS BIGINT) FROM toks)").getOrElse("")
    s"""WITH toks AS ($tokensSql),
       |bigr AS (SELECT doc_id, w1, lead(w1) OVER (
       |   PARTITION BY doc_id ORDER BY pos) AS w2 FROM (
       |  SELECT doc_id,
       |   unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w1,
       |   generate_subscripts(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |  FROM documents)),
       |pairs AS (SELECT doc_id, w1, w2 FROM bigr WHERE w2 IS NOT NULL),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2
       | $having),
       |uni AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni)
       |SELECT b.w1, b.w2, CAST(floor(ln(
       |  ${sqlDouble(lambda)} * CAST(b.c12 AS DOUBLE) / CAST(u1.c AS DOUBLE)
       |  + ${sqlDouble(1.0 - lambda)} * CAST(u2.c AS DOUBLE)
       |    / CAST(t.n_total AS DOUBLE)) * 1e12) AS BIGINT) AS q_lnp
       |FROM c12 b
       |JOIN uni u1 ON u1.term = b.w1
       |JOIN uni u2 ON u2.term = b.w2
       |CROSS JOIN tot t
       |ORDER BY b.w1, b.w2""".stripMargin.replace('\n', ' ')
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): each document
    * scored by the corpus-trained interpolated bigram LM
    * ([[bigramLogProb]]) and cut into per-LANGUAGE head / middle / tail
    * terciles by average log-prob (higher log-prob = lower perplexity =
    * `head`) — the quality stratification CCNet filters on (keep head,
    * sometimes middle; drop tail). Rank-based terciles with a `doc_id`
    * tiebreak, so the cut is total-ordered and bit-portable — no
    * percentile interpolation (whose midpoint arithmetic is not spelled
    * identically across engines).
    *
    * Scale shape: scoring is the [[bigramLogProb]] plan (model joins +
    * one per-doc agg). The cut itself never sorts a whole language in
    * one task (the heaviest language is ~half a web crawl — the named
    * scale-killer): [[pplBoundaryKeys]] finds the two per-language
    * boundary KEYS — the last head and last middle (avg_logprob,
    * doc_id) pairs of the ntile order — by distributed bucketed-rank
    * order statistics (the [[graft.operators.HistogramOps]] two-pass
    * shape) above [[PplWindowMaxRows]] rows, and every document then
    * buckets map-side by comparing its ordering key to the broadcast
    * boundaries — the exact serving shape of the streaming twin, which
    * replays batch buckets bit-exactly from the same boundary pairs.
    * Rank-selection is bit-equal to the ntile window (total order,
    * unique doc_id tiebreak), so the dispatch is invisible to results. */
  def pplBuckets(docs: DataFrame, lambda: Double = 0.9): DataFrame =
    pplBucketsFromScored(graft.functions.checkpointed(
      bigramLogProb(docs, lambda)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")))

  /** [[pplBuckets]] over an already-materialized scored corpus
    * (`doc_id, n_bigrams, avg_logprob, lang` — checkpointed by the
    * caller): the entry the shared LM-scored memo feeds, so bucketing
    * never re-trains or re-scores (VERDICT r16 #6). */
  def pplBucketsFromScored(scored: DataFrame): DataFrame =
    assignPplBuckets(scored, pplBoundaryKeys(scored))

  /** Per-doc scored inputs at or below this row count cut terciles with
    * the single ordered window pass per language (cheaper below ~10M
    * rows, same rationale as
    * [[graft.operators.HistogramOps.PctWindowMaxRows]]); above it, the
    * bucketed-rank boundary plan — both bit-identical
    * (OperatorPropertySpec). */
  val PplWindowMaxRows: Long = 10_000_000L

  /** Sentinel standing in for a NULL language through the boundary
    * machinery's equi-joins (null keys never equi-match, so a null-lang
    * corpus slice would silently vanish — the ntile window the plans
    * replace treats NULL as its own partition). A lone NUL byte cannot
    * be a real language tag. */
  private val NullLang = "\u0000"

  private def langEnc(df: DataFrame): DataFrame =
    df.withColumn("lang", coalesce(col("lang"), lit(NullLang)))

  private def langDec(df: DataFrame): DataFrame =
    df.withColumn("lang",
      when(col("lang") === NullLang, lit(null: String))
        .otherwise(col("lang")))

  /** Per-language tercile boundary keys of a scored corpus
    * (`doc_id, lang, avg_logprob` required): one bounded row per
    * language, `(h_lp, h_id)` = last head key and `(m_lp, m_id)` = last
    * middle key (null when the language has no middle rows, n == 1) in
    * the (avg_logprob DESC, doc_id ASC) ntile order. NULL langs form
    * their own group (the ntile semantics), carried through the
    * equi-joins by the [[NullLang]] sentinel. Materialized to a
    * LocalRelation (bounded by language cardinality) so downstream
    * bucket assignment joins by broadcast. Callers pass a checkpointed
    * `scored` — the count and the chosen plan's passes then re-read the
    * materialized snapshot instead of re-scoring the corpus. */
  private[graft] def pplBoundaryKeys(scored: DataFrame): DataFrame =
    graft.functions.localRelation(
      if (scored.count() <= PplWindowMaxRows) pplBoundaryWindowPlan(scored)
      else pplBoundaryBucketedPlan(scored))

  /** Single-pass boundary plan: the ntile window itself, aggregated to
    * the per-bucket max ordering key. Right below [[PplWindowMaxRows]],
    * where one sorted pass per language beats the bucketed plan's extra
    * stages. */
  private[graft] def pplBoundaryWindowPlan(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("avg_logprob").desc, col("doc_id"))
    val bnd = (nt: Int, p: String) => max(when(col("nt") === nt,
      struct((-col("avg_logprob")).as("nlp"), col("doc_id").as("id"))))
      .as(p)
    scored.withColumn("nt", ntile(3).over(w))
      .groupBy("lang").agg(bnd(1, "hb"), bnd(2, "mb"))
      .select(col("lang"),
        (-col("hb.nlp")).as("h_lp"), col("hb.id").as("h_id"),
        (-col("mb.nlp")).as("m_lp"), col("mb.id").as("m_id"))
  }

  /** DISTRIBUTED boundary plan (two-pass bucketed rank over the
    * composite key, the [[graft.operators.HistogramOps]] order-statistics
    * shape): no per-language full sort, so one dominant language never
    * funnels its whole corpus through a single task.
    *
    *  1. per-language (min, max, count) of `v = -avg_logprob` (ASC order
    *     ≡ the ntile's avg_logprob DESC); the counts give the exact
    *     ntile(3) bucket sizes — `q = n div 3`, head `q + (n mod 3 ≥ 1)`,
    *     middle `q + (n mod 3 ≥ 2)` — hence the two 0-based target ranks;
    *  2. equi-width bucket counts over [min,max] + an exclusive prefix
    *     sum over the TINY per-language bucket table (≤
    *     [[graft.operators.HistogramOps.PctBuckets]] rows/language)
    *     locate the bucket holding each target rank;
    *  3. only rows inside located buckets (expected n/B per bucket) get
    *     a local `row_number` ordered by (v, doc_id).
    *
    * Bit-parity with the ntile cut: `floor((v-min)/width)` is monotone
    * in v, equal v always share a bucket, and the within-bucket order
    * carries the doc_id tiebreak — bucket-local ranks compose to the
    * exact global rank of the total (avg_logprob DESC, doc_id) order. */
  private[graft] def pplBoundaryBucketedPlan(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = graft.operators.HistogramOps.PctBuckets
    // sentinel-encode NULL langs: the plan below is all equi-joins on
    // lang, and a null key would silently drop the group the ntile
    // window keeps; decoded on output
    val base = langEnc(scored).select(col("lang"),
      (-col("avg_logprob")).as("_v"), col("doc_id").as("_id"))
    val stats = base.groupBy("lang").agg(
      min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
      count(lit(1)).as("_n"))
    val qn = floor(col("_n") / 3L).cast("long")
    val rem = col("_n") - qn * 3L
    val hSize = qn + when(rem >= 1L, 1L).otherwise(0L)
    val mSize = qn + when(rem >= 2L, 1L).otherwise(0L)
    val targets = stats.select(col("lang"), explode(array(
        struct((hSize - 1L).cast("long").as("_tr"), lit("h").as("_tag")),
        struct(when(mSize > 0L, hSize + mSize - 1L).cast("long").as("_tr"),
          lit("m").as("_tag")))).as("_t"))
      .select(col("lang"), col("_t._tr").as("_tr"), col("_t._tag").as("_tag"))
      .where(col("_tr").isNotNull)
    val bucketed = base.join(stats.select("lang", "_mn", "_mx"), "lang")
      .withColumn("_w", (col("_mx") - col("_mn")) / B)
      .withColumn("_b",
        when(col("_w") > 0.0,
          least(floor((col("_v") - col("_mn")) / col("_w")),
            lit((B - 1).toDouble)))
          .otherwise(0.0).cast("long"))
      .select("lang", "_v", "_id", "_b")
    val bcounts = bucketed.groupBy("lang", "_b").agg(count(lit(1)).as("_c"))
    val wcum = Window.partitionBy("lang").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bcounts.withColumn("_base",
      coalesce(sum(col("_c")).over(wcum), lit(0L)))
    val located = targets.join(cum, "lang")
      .where(col("_tr") >= col("_base") &&
        col("_tr") < col("_base") + col("_c"))
    val needed = located.select("lang", "_b", "_base").distinct()
    val wloc = Window.partitionBy("lang", "_b").orderBy("_v", "_id")
    val ranked = bucketed.join(needed, Seq("lang", "_b"))
      .withColumn("_r", row_number().over(wloc) - 1 + col("_base"))
    langDec(
      ranked.join(targets, "lang").where(col("_r") === col("_tr"))
        .groupBy("lang").agg(
          max(when(col("_tag") === "h",
            struct(col("_v"), col("_id")))).as("hb"),
          max(when(col("_tag") === "m",
            struct(col("_v"), col("_id")))).as("mb"))
        .select(col("lang"),
          (-col("hb._v")).as("h_lp"), col("hb._id").as("h_id"),
          (-col("mb._v")).as("m_lp"), col("mb._id").as("m_id")))
  }

  /** Map-side bucket assignment from broadcast boundary keys — a doc is
    * `head` iff its (avg_logprob DESC, doc_id) ordering key is at or
    * before the last-head boundary, `middle` iff at or before the
    * last-middle one: exactly the comparison
    * [[graft.streaming.Streaming.streamingPplBucket]] serves with, so
    * batch and stream buckets agree bit-for-bit by construction. */
  private[graft] def assignPplBuckets(scored: DataFrame,
      bounds: DataFrame): DataFrame = {
    def before(bLp: Column, bId: Column): Column =
      col("avg_logprob") > bLp ||
        (col("avg_logprob") === bLp && col("doc_id") <= bId)
    // sentinel-encode both sides: a NULL lang never equi-matches, and
    // its docs would silently vanish where the ntile window kept them
    langDec(langEnc(scored).join(broadcast(langEnc(bounds)), Seq("lang"))
      .select(col("lang"), col("doc_id"), col("n_bigrams"),
        col("avg_logprob"),
        when(before(col("h_lp"), col("h_id")), "head")
          .when(col("m_lp").isNotNull && before(col("m_lp"), col("m_id")),
            "middle")
          .otherwise("tail").as("bucket")))
      .select("doc_id", "lang", "n_bigrams", "avg_logprob", "bucket")
  }

  /** DuckDB twin of [[pplBoundaryKeys]] — the boundary-key TABLE as an
    * oracle artifact, spelled via the rank arithmetic (row_number at
    * the exact ntile bucket-size cut) so the gate proves the BUCKETED
    * plan (the Spark side runs [[pplBoundaryBucketedPlan]] directly)
    * selects precisely the keys a full ntile sort would. */
  def pplBoundsSql(lambda: Double = 0.9): String =
    s"""WITH scored AS (
       | ${bigramLogProbSql(lambda).replace(" ORDER BY p.doc_id", "")}),
       |sl AS (SELECT s.doc_id, d.lang, s.avg_logprob
       | FROM scored s JOIN documents d USING (doc_id)),
       |ranked AS (SELECT lang, doc_id, avg_logprob,
       |  CAST(row_number() OVER (PARTITION BY lang
       |    ORDER BY avg_logprob DESC, doc_id) AS BIGINT) AS rn,
       |  CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
       | FROM sl),
       |sz AS (SELECT *,
       |  (n // 3) + CASE WHEN n % 3 >= 1 THEN 1 ELSE 0 END AS hsize,
       |  (n // 3) + CASE WHEN n % 3 >= 2 THEN 1 ELSE 0 END AS msize
       | FROM ranked)
       |SELECT lang,
       | max(CASE WHEN rn = hsize THEN avg_logprob END) AS h_lp,
       | CAST(max(CASE WHEN rn = hsize THEN doc_id END) AS BIGINT) AS h_id,
       | max(CASE WHEN msize > 0 AND rn = hsize + msize
       |   THEN avg_logprob END) AS m_lp,
       | CAST(max(CASE WHEN msize > 0 AND rn = hsize + msize
       |   THEN doc_id END) AS BIGINT) AS m_id
       |FROM sz GROUP BY lang ORDER BY lang""".stripMargin
      .replace('\n', ' ')

  def pplBucketsSql(lambda: Double = 0.9): String =
    s"""WITH scored AS (
       | ${bigramLogProbSql(lambda).replace(" ORDER BY p.doc_id", "")})
       |SELECT doc_id, lang, n_bigrams, avg_logprob,
       | CASE WHEN nt = 1 THEN 'head' WHEN nt = 2 THEN 'middle'
       |  ELSE 'tail' END AS bucket
       |FROM (SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logprob,
       |  ntile(3) OVER (PARTITION BY d.lang
       |    ORDER BY s.avg_logprob DESC, s.doc_id) AS nt
       | FROM scored s JOIN documents d USING (doc_id))
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  def bigramLogProbSql(lambda: Double = 0.9): String =
    s"""WITH toks AS ($tokensSql),
       |bigr AS (SELECT doc_id, w1, lead(w1) OVER (
       |   PARTITION BY doc_id ORDER BY pos) AS w2 FROM (
       |  SELECT doc_id,
       |   unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w1,
       |   generate_subscripts(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |  FROM documents)),
       |pairs AS (SELECT doc_id, w1, w2 FROM bigr WHERE w2 IS NOT NULL),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
       |uni AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni)
       |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       | CAST(sum(CAST(floor(ln(
       |   ${sqlDouble(lambda)} * CAST(b.c12 AS DOUBLE) / CAST(u1.c AS DOUBLE)
       |   + ${sqlDouble(1.0 - lambda)} * CAST(u2.c AS DOUBLE)
       |     / CAST(t.n_total AS DOUBLE)) * 1e12) AS HUGEINT))
       |  AS DOUBLE) / 1e12 / count(*) AS avg_logprob
       |FROM pairs p
       |JOIN c12 b ON b.w1 = p.w1 AND b.w2 = p.w2
       |JOIN uni u1 ON u1.term = p.w1
       |JOIN uni u2 ON u2.term = p.w2
       |CROSS JOIN tot t
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
      .replace('\n', ' ')

  // lazy: tokensSql is declared later in the object — a strict val here
  // would capture null during object initialization
  lazy val unigramLogProbSql: String =
    s"""WITH words AS ($tokensSql),
      |freq AS (SELECT term, count(*) AS c FROM words GROUP BY term),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM freq)
      |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      | CAST(SUM(CAST(floor(ln(CAST(f.c AS DOUBLE)
      |    / CAST(t.n_total AS DOUBLE)) * 1e12) AS HUGEINT)) AS DOUBLE)
      |  / 1e12 / count(*) AS avg_logprob
      |FROM words w JOIN freq f USING (term) CROSS JOIN tot t
      |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin
      .replace('\n', ' ')

  /** Character-distribution entropy per document —
    * `H = −Σ (c_i/n)·ln(c_i/n)` over the doc's character counts: the
    * cheap gibberish/encoding-junk detector (natural text sits in a
    * narrow entropy band; base64 blobs, binary spills, and
    * single-char spam fall far outside it). Restated as
    * `−(Σ c_i·lnQ(c_i/n)) / 1e12 / n` so each ln is quantized ONCE per
    * distinct character (the lnQ portability contract) and the weighted
    * sum is exact integer arithmetic — deterministic at any
    * accumulation order. The per-doc window is bounded by the alphabet,
    * not the corpus. */
  def charEntropy(docs: DataFrame): DataFrame = {
    val counts = docs.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    // widen c BEFORE the multiply: c * lnQ at c ~ 3e5 repeats of one
    // char approaches Long.Max — a 64-bit product would wrap in Spark
    // and raise in DuckDB (r5 ADVICE); decimal×decimal stays exact
    counts.withColumn("n", sum(col("c")).over(w))
      .select(col("doc_id"), col("n"),
        (col("c").cast("decimal(38,0)") *
          floor(log(col("c").cast("double") /
            col("n").cast("double")) * 1e12).cast("long")
            .cast("decimal(38,0)")).as("t"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_chars"),
        sum(col("t")).cast("double").as("_s"))
      .select(col("doc_id"), col("n_chars"),
        (-col("_s") / 1e12 / col("n_chars").cast("double")).as("entropy"))
  }

  val charEntropySql: String =
    """WITH counts AS (SELECT doc_id, ch, count(*) AS c FROM (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
      |  FROM documents) GROUP BY 1, 2),
      |wn AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n
      | FROM counts)
      |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
      | -CAST(sum(CAST(c AS HUGEINT) * CAST(floor(ln(CAST(c AS DOUBLE)
      |     / CAST(n AS DOUBLE)) * 1e12) AS BIGINT)) AS DOUBLE)
      |  / 1e12 / CAST(max(n) AS DOUBLE) AS entropy
      |FROM wn GROUP BY doc_id ORDER BY doc_id""".stripMargin
      .replace('\n', ' ')

  /** Phrase/collocation detection (the word2phrase scoring of Mikolov et
    * al.'s phrase step, used to merge "new york" → "new_york" before
    * tokenizer/embedding training): for every adjacent word pair with
    * `c12 >= minCount`, the score
    * `(c12 − delta) · N / (c1 · c2)` — counts are exact integers, the
    * score one identical double expression in both engines, so the gate
    * is bit-exact with no quantization needed. High score = the pair
    * co-occurs far beyond chance; the caller merges pairs above a
    * threshold and re-runs for trigrams.
    *
    * Scale shape: one token explode with a per-doc position window for
    * bigrams (the [[gramStream]]-family shape), two bounded aggregations
    * (pair counts, word counts), one broadcast-size join of pair→word
    * counts. */
  def phraseScores(docs: DataFrame, minCount: Long = 3L,
      delta: Double = 2.0): DataFrame = {
    import graft.functions.localRelation
    val toks = tokens(docs)
    val uni = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .transform(graft.functions.checkpointed)
    val nTotal = localRelation(uni.agg(sum(col("c")).cast("long")
      .as("n_total")))
    // materialize the split ONCE per row before the pair lambda — an
    // element_at over the inline split() re-evaluates the regex split per
    // element (O(len²) splits per doc, measured 12 s vs 2 s at sf0.1);
    // the gramStream projection shape keeps it linear
    val pairs = docs
      .select(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
    pairs
      .join(uni.select(col("term").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("term").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTotal))
      .select(col("w1"), col("w2"), col("c12"),
        ((col("c12").cast("double") - lit(delta)) *
          col("n_total").cast("double") /
          (col("c1") * col("c2")).cast("double")).as("score"))
  }

  def phraseScoresSql(minCount: Long = 3L, delta: Double = 2.0): String =
    s"""WITH toks AS ($tokensSql),
       |uni AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
       |bi AS (SELECT w1, w2, count(*) AS c12 FROM (
       |  SELECT w AS w1,
       |   lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM (SELECT doc_id,
       |    unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w,
       |    generate_subscripts(
       |      regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |   FROM documents))
       | WHERE w2 IS NOT NULL GROUP BY w1, w2
       | HAVING count(*) >= $minCount)
       |SELECT b.w1, b.w2, b.c12,
       | (CAST(b.c12 AS DOUBLE) - ${sqlDouble(delta)})
       |  * CAST(t.n_total AS DOUBLE)
       |  / CAST(u1.c * u2.c AS DOUBLE) AS score
       |FROM bi b
       |JOIN uni u1 ON u1.term = b.w1
       |JOIN uni u2 ON u2.term = b.w2
       |CROSS JOIN tot t
       |ORDER BY w1, w2""".stripMargin.replace('\n', ' ')

  /** Vocabulary induction: the top-`size` corpus words by frequency with
    * their counts — the seed step of tokenizer training (word-level vocab,
    * or the pre-merge alphabet statistics for BPE). Deterministic
    * tie-break on the word itself. Executes as TakeOrdered over the
    * per-word counts (distributed partial top-k per partition, merged on
    * the driver) — NOT a global row_number window, which would funnel the
    * whole vocabulary through one task. */
  def vocab(docs: DataFrame, size: Int = 1000): DataFrame =
    tokens(docs)
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(size)

  def vocabSql(size: Int = 1000): String =
    s"""SELECT term, c FROM (
       | SELECT term, count(*) AS c FROM ($tokensSql) GROUP BY term)
       |ORDER BY c DESC, term LIMIT $size""".stripMargin.replace('\n', ' ')

  /** Zipf rank-frequency fit per language — the corpus-linguistics
    * health check (natural language sits near slope −1 on log rank vs
    * log frequency; template spam, word soup, and synthetic filler bend
    * it toward 0): closed-form least squares over the ranked vocabulary
    * with EVERY sum integer-exact — log rank / log count are quantized
    * to integers (`floor(ln·1e6)`, small enough that all cross products
    * fit exact decimal/int128 arithmetic on both engines), summed as
    * decimals, and the slope/intercept are three IEEE ops over exact
    * integers. Rank is (count desc, term) — deterministic under ties.
    * One vocab aggregation + a per-lang window; output is
    * language-bounded. */
  def zipfFit(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("c").desc, col("term"))
    val dec = "decimal(38,0)"
    val ranked = graft.functions.parallelized(docs)
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("lang"),
        floor(log(col("rank").cast("double")) * 1e6).as("xq"),
        floor(log(col("c").cast("double")) * 1e6).as("yq"))
    ranked.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
        sum((col("xq") * col("yq")).cast(dec)).as("sxy"),
        sum((col("xq") * col("xq")).cast(dec)).as("sxx"))
      .select(col("lang"), col("n").as("n_types"),
        ((col("n") * col("sxy") - col("sx").cast(dec) * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx").cast(dec) * col("sx"))
            .cast("double")).as("slope"))
  }

  def zipfFitSql(): String =
    s"""WITH t AS (SELECT lang,
       |  unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       | FROM documents),
       |v AS (SELECT lang, term, count(*) AS c FROM t GROUP BY 1, 2),
       |r AS (SELECT lang,
       |  CAST(floor(ln(CAST(row_number() OVER (PARTITION BY lang
       |    ORDER BY c DESC, term) AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
       |  CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS yq
       | FROM v),
       |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
       |  sum(xq) AS sx, sum(yq) AS sy,
       |  sum(xq * yq) AS sxy, sum(xq * xq) AS sxx
       | FROM r GROUP BY lang)
       |SELECT lang, n AS n_types,
       | CAST(n * sxy - sx * sy AS DOUBLE)
       |   / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       |FROM s ORDER BY lang""".stripMargin.replace('\n', ' ')

  /** Flesch reading-ease per source over corpus-level counts:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` —
    * the classic readability screen (low/negative = dense prose or
    * word soup; 60–80 = plain text), computed on EXACT integer corpus
    * sums so the two divisions are the only float ops. Syllables use
    * the standard vowel-group heuristic (`[aeiouy]+` runs on the
    * lowercased text); sentence count floors at 1 per document (a doc
    * with no terminal punctuation is one sentence, and the driver
    * corpus has none). The regex classes are dialect-portable
    * (verified Java regex ≡ RE2 on the gate corpus).
    *
    * Scale shape: three per-doc regexp counts in one codegen
    * projection, one (source) hash aggregation. */
  def readability(docs: DataFrame): DataFrame = {
    val w = regexp_count(col("text"), lit("\\S+"))
    val s = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
    val y = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    graft.functions.parallelized(docs)
      .select(col("source"), w.cast("long").as("w"),
        s.cast("long").as("s"), y.cast("long").as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"),
        sum(col("s")).as("n_sentences"),
        sum(col("y")).as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0L,
          lit(206.835d) -
            lit(1.015d) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6d) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))))
      .orderBy("source")
  }

  /** DuckDB twin of [[readability]] — identical regex classes,
    * integer sums, and chain order. */
  def readabilitySql(): String =
    s"""SELECT source, n_docs, n_words, n_sentences, n_syllables,
       | CASE WHEN n_words > 0 THEN
       |  206.835 - 1.015 * (CAST(n_words AS DOUBLE)
       |    / CAST(n_sentences AS DOUBLE))
       |   - 84.6 * (CAST(n_syllables AS DOUBLE)
       |    / CAST(n_words AS DOUBLE)) END AS flesch
       |FROM (
       | SELECT source, count(*) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
       |   AS n_words,
       |  CAST(SUM(greatest(len(regexp_extract_all(text, '[.!?]+')),
       |    1)) AS BIGINT) AS n_sentences,
       |  CAST(SUM(len(regexp_extract_all(lower(text), '[aeiouy]+')))
       |    AS BIGINT) AS n_syllables
       | FROM documents GROUP BY 1)
       |ORDER BY source""".stripMargin.replace('\n', ' ')

  /** Heaps'-law vocabulary-growth fit per language: `V(n) ≈ K·n^β`,
    * the sublinear growth of distinct types with corpus size — the
    * companion diagnostic to [[zipfFit]] (a β drifting toward 1 means
    * unbounded novel types: OCR noise, IDs, or boilerplate mutation;
    * β ≈ 0.4–0.6 is natural text). The fitted `beta` is the slope of
    * the log-log regression of cumulative distinct types on cumulative
    * tokens at doc-id CHECKPOINTS.
    *
    * First occurrence is at DOC grain: a type is new at the smallest
    * `doc_id` containing it (per lang). Checkpoints are
    * `ckpt = doc_id // step` — the cumulative windows run over the
    * CHECKPOINT series, never the doc axis, so `step` is the scale
    * dial (size it so ⌈max_doc_id/step⌉ stays bounded; the gate uses
    * the sf corpus' ~2k-doc axis at step 16 → ~130 checkpoints/lang).
    *
    * Exactness (the [[zipfFit]] stance): token/type counts and their
    * checkpoint cumulatives are exact integers; `xq/yq =
    * floor(ln·1e6)`; the closed-form least-squares sums run in
    * decimal and the slope is ONE IEEE division of exact casts. */
  def heapsLaw(docs: DataFrame, step: Long = 16): DataFrame = {
    val dec = "decimal(38,0)"
    val wl = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy("ckpt")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val toks = graft.functions.parallelized(docs)
      .select(col("lang"), col("doc_id"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
    // ONE tokenization pass: both rollups (tokens per bucket, new
    // types per bucket) derive from a shared (lang, term, ckpt)
    // pre-aggregate — unmaterialized, the corpus tokenized once per
    // branch. Same numbers: Σ counts per bucket, and a term's first
    // doc is the min over its bucket minima.
    val ltc = toks
      .groupBy(col("lang"), col("term"),
        floor(col("doc_id") / step).cast("long").as("ckpt"))
      .agg(count(lit(1)).as("_c"), min(col("doc_id")).as("_md"))
      .transform(graft.functions.checkpointed)
    // tokens per checkpoint bucket
    val tk = ltc
      .groupBy(col("lang"), col("ckpt"))
      .agg(sum(col("_c")).as("toks"))
    // new types per checkpoint bucket: first containing doc, per lang
    val nv = ltc
      .groupBy(col("lang"), col("term"))
      .agg(min(col("_md")).as("first_doc"))
      .groupBy(col("lang"),
        floor(col("first_doc") / step).cast("long").as("ckpt"))
      .agg(count(lit(1)).as("news"))
    val pts = tk.join(nv, Seq("lang", "ckpt"), "left")
      .withColumn("cum_n", sum(col("toks")).over(wl))
      .withColumn("cum_v", sum(coalesce(col("news"), lit(0L))).over(wl))
      .where(col("cum_n") > 0L && col("cum_v") > 0L)
      .select(col("lang"),
        floor(log(col("cum_n").cast("double")) * 1e6).as("xq"),
        floor(log(col("cum_v").cast("double")) * 1e6).as("yq"))
    pts.groupBy("lang")
      .agg(count(lit(1)).as("n_ckpts"),
        sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
        sum((col("xq") * col("yq")).cast(dec)).as("sxy"),
        sum((col("xq") * col("xq")).cast(dec)).as("sxx"))
      .select(col("lang"), col("n_ckpts"),
        ((col("n_ckpts") * col("sxy") -
          col("sx").cast(dec) * col("sy")).cast("double") /
          (col("n_ckpts") * col("sxx") -
            col("sx").cast(dec) * col("sx")).cast("double")).as("beta"))
  }

  /** DuckDB twin of [[heapsLaw]] — identical checkpoint floors,
    * quantizations, and the single-division slope. */
  def heapsLawSql(step: Long = 16): String =
    s"""WITH t AS MATERIALIZED (SELECT lang, doc_id,
       |  unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       | FROM documents),
       |tk AS (SELECT lang, doc_id // $step AS ckpt,
       |  count(*) AS toks FROM t GROUP BY 1, 2),
       |nv AS (SELECT lang, first_doc // $step AS ckpt,
       |  count(*) AS news FROM (
       |   SELECT lang, term, min(doc_id) AS first_doc
       |   FROM t GROUP BY 1, 2) GROUP BY 1, 2),
       |pts AS (SELECT lang,
       |  CAST(floor(ln(CAST(cum_n AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
       |  CAST(floor(ln(CAST(cum_v AS DOUBLE)) * 1e6) AS BIGINT) AS yq
       | FROM (
       |  SELECT lang,
       |   CAST(SUM(toks) OVER w AS BIGINT) AS cum_n,
       |   CAST(SUM(COALESCE(news, 0)) OVER w AS BIGINT) AS cum_v
       |  FROM tk LEFT JOIN nv USING (lang, ckpt)
       |  WINDOW w AS (PARTITION BY lang ORDER BY ckpt
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       | WHERE cum_n > 0 AND cum_v > 0),
       |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_ckpts,
       |  sum(xq) AS sx, sum(yq) AS sy,
       |  sum(xq * yq) AS sxy, sum(xq * xq) AS sxx
       | FROM pts GROUP BY lang)
       |SELECT lang, n_ckpts,
       | CAST(n_ckpts * sxy - sx * sy AS DOUBLE)
       |  / CAST(n_ckpts * sxx - sx * sx AS DOUBLE) AS beta
       |FROM s ORDER BY lang""".stripMargin.replace('\n', ' ')

  /** Jensen–Shannon divergence of each source's token distribution
    * from the corpus distribution — the SYMMETRIC, bounded ([0, ln 2])
    * companion of [[sourceDrift]]'s KL: robust to words the corpus has
    * but the source lacks (KL ignores them; JSD charges them at ln 2
    * through the mixture).
    *
    * Closed form that never densifies: with `p = c_sw/n_s`,
    * `q = c_w/n_c`, `m = (p+q)/2`, both log-ratios reduce to INTEGER
    * ratios (`p/m = 2·c_sw·n_c / (c_sw·n_c + c_w·n_s)`, ditto `q/m`),
    * and the q-side sum over words ABSENT from the source collapses to
    * `ln 2 · (n_c − Σ_{w∈s} c_w)/n_c` — so the whole JSD is computed
    * from the source's own (source, word) rows plus one corpus total.
    *
    * Exactness: the integer ratio operands are exact decimal products
    * cast to double (one correctly-rounded cast each); each log-ratio
    * is floor-quantized at 1e12 (the [[sourceDrift]] stance); the two
    * weighted sums run in decimal; the final value is one fixed IEEE
    * chain with `ln 2` itself quantized. Scale shape: one (source,
    * word) aggregation joined to the word totals — [[sourceDrift]]'s
    * exact plan. */
  def jsdSources(docs: DataFrame): DataFrame = {
    val ln2Q = 693147180559L // floor(ln(2)·1e12), exact in both
    // checkpointed: the (source, word) count table feeds the per-word
    // rollup, the per-source rollup AND the scoring join —
    // unmaterialized, the corpus tokenized once per reference
    val sw = graft.functions.parallelized(docs)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .transform(graft.functions.checkpointed)
    val cw = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val ns = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val nt = graft.functions.localRelation(
      cw.agg(sum(col("c_w")).as("n_corpus")))
    val dec20 = "decimal(20,0)"
    // exact integer cross terms (decimal), cast once to double each
    val a = (col("c_sw").cast(dec20) * col("n_corpus").cast(dec20))
      .cast("double")
    val b = (col("c_w").cast(dec20) * col("n_s").cast(dec20))
      .cast("double")
    val lp = floor(log(lit(2.0d) * a / (a + b)) * 1e12).cast("long")
    val lq = floor(log(lit(2.0d) * b / (a + b)) * 1e12).cast("long")
    sw.join(cw, "w").join(broadcast(ns), "source").crossJoin(broadcast(nt))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        max(col("n_corpus")).as("n_corpus"),
        sum(col("c_sw").cast(dec20) * lp.cast("decimal(15,0)")).as("sp"),
        sum(col("c_w").cast(dec20) * lq.cast("decimal(15,0)")).as("sq"),
        sum(col("c_w")).as("sc"))
      .select(col("source"), col("n_tokens"),
        (lit(0.5d) * ((col("sp").cast("double") / 1e12) /
          col("n_tokens").cast("double")) +
          lit(0.5d) * ((col("sq").cast("double") / 1e12) /
            col("n_corpus").cast("double")) +
          lit(0.5d) * (lit(ln2Q).cast("double") / 1e12) *
            ((col("n_corpus") - col("sc")).cast("double") /
              col("n_corpus").cast("double"))).as("jsd_nats"))
  }

  /** DuckDB twin of [[jsdSources]] — identical integer ratios,
    * quantizations, and chain order. */
  def jsdSourcesSql(): String =
    s"""WITH sw AS MATERIALIZED (SELECT source, w, count(*) AS c_sw
       | FROM (SELECT source,
       |   unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
       |  FROM documents) GROUP BY 1, 2),
       |cw AS MATERIALIZED (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w
       | FROM sw GROUP BY 1),
       |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s
       | FROM sw GROUP BY 1),
       |nt AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_corpus FROM cw),
       |terms AS (SELECT source,
       |  CAST(floor(ln(2.0 * CAST(CAST(c_sw AS HUGEINT) * n_corpus
       |     AS DOUBLE) / (CAST(CAST(c_sw AS HUGEINT) * n_corpus
       |     AS DOUBLE) + CAST(CAST(c_w AS HUGEINT) * n_s AS DOUBLE)))
       |    * 1e12) AS BIGINT) AS lp,
       |  CAST(floor(ln(2.0 * CAST(CAST(c_w AS HUGEINT) * n_s
       |     AS DOUBLE) / (CAST(CAST(c_sw AS HUGEINT) * n_corpus
       |     AS DOUBLE) + CAST(CAST(c_w AS HUGEINT) * n_s AS DOUBLE)))
       |    * 1e12) AS BIGINT) AS lq,
       |  c_sw, c_w, n_s, n_corpus
       | FROM sw JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN nt)
       |SELECT source, max(n_s) AS n_tokens,
       | 0.5 * ((CAST(SUM(CAST(c_sw AS HUGEINT) * lp) AS DOUBLE) / 1e12)
       |   / CAST(max(n_s) AS DOUBLE))
       | + 0.5 * ((CAST(SUM(CAST(c_w AS HUGEINT) * lq) AS DOUBLE) / 1e12)
       |   / CAST(max(n_corpus) AS DOUBLE))
       | + 0.5 * (CAST(693147180559 AS DOUBLE) / 1e12)
       |   * (CAST(max(n_corpus) - CAST(SUM(CAST(c_w AS HUGEINT))
       |       AS BIGINT) AS DOUBLE)
       |     / CAST(max(n_corpus) AS DOUBLE)) AS jsd_nats
       |FROM terms GROUP BY source
       |ORDER BY source""".stripMargin.replace('\n', ' ')

  /** Per-source out-of-vocabulary rate against a corpus-derived top-V
    * vocabulary — the tokenizer-coverage audit next to [[bpeFertility]]
    * (fertility says how FINELY the tokenizer splits; OOV rate says
    * what it cannot represent at all). A source whose OOV rate spikes
    * is the one the vocab under-serves — the signal vocab budgets are
    * rebalanced on. Token occurrences LEFT-join the vocab (bounded,
    * broadcast) and count misses; exact integer counts, one division
    * per source row. */
  def oovRate(docs: DataFrame, size: Int = 1000): DataFrame = {
    // ONE tokenization pass: the vocabulary (top-V by total count) and
    // the per-source OOV mass both derive from a shared checkpointed
    // (source, term, count) table — the old shape tokenized the corpus
    // once to induce the vocab and AGAIN to probe it. Same numbers:
    // per-term totals are the sum of per-source counts, and the OOV
    // token count weights each (source, term) row by its count.
    val st = docs
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("_c"))
      .transform(graft.functions.checkpointed)
    val v = graft.functions.localRelation(
      st.groupBy("term").agg(sum(col("_c")).as("c"))
        .orderBy(col("c").desc, col("term")).limit(size)
        .select(col("term"), lit(1L).as("in_v")))
    st
      .join(broadcast(v), Seq("term"), "left")
      .groupBy("source")
      .agg(sum(col("_c")).as("n_tokens"),
        sum(when(col("in_v").isNull, col("_c")).otherwise(0L))
          .as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  def oovRateSql(size: Int = 1000): String =
    s"""WITH v AS (${vocabSql(size)}),
       |t AS (SELECT source,
       |  unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       | FROM documents)
       |SELECT t.source, CAST(count(*) AS BIGINT) AS n_tokens,
       | CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_oov,
       | CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |   / CAST(count(*) AS DOUBLE) AS oov_rate
       |FROM t LEFT JOIN v ON v.term = t.term
       |GROUP BY t.source ORDER BY t.source""".stripMargin
      .replace('\n', ' ')

  /** BPE merge induction (Sennrich et al., "Neural Machine Translation of
    * Rare Words with Subword Units", ACL 2016) — actual tokenizer
    * TRAINING, not just counting: k rounds of (most frequent adjacent
    * symbol pair, weighted by word frequency) → merge it everywhere →
    * recount. Emits the learned merge table (rank, pair, merged symbol,
    * weighted count) — the artifact a tokenizer ships. Word-internal
    * merges only (no end-of-word marker — a documented simplification;
    * adding one is a constant in the symbol init).
    *
    * Determinism: counts are integer sums; the per-round winner tiebreaks
    * on the pair text. Merge application is string `replace` of the
    * space-bounded pair on the space-padded symbol string, applied TWICE:
    * one left-to-right replace pass can skip an occurrence whose leading
    * space was consumed by the previous replacement (" a b a b " →
    * " ab a b "); after pass one every remaining occurrence is
    * space-bounded again, so the second pass is exact — the two-pass
    * replace IS greedy non-overlapping BPE application, in both engines.
    *
    * Scale shape: the corpus aggregates ONCE into the (distinct word,
    * freq) table; the k training rounds loop on that vocab-sized table —
    * pair counting is an explode + sum keyed on pair text, the winner is
    * a 1-row TakeOrdered, and the rewrite is a map-side expression with
    * the winner inlined as a literal (the same driver-loop pattern as
    * [[Dedup.dedupGroups]]'s rounds, with localCheckpoint truncating
    * lineage so round N never replays rounds 1..N-1). */
  /** The training loop shared by [[bpeMerges]] and [[bpeSegment]]:
    * returns the learned merge rows and the final
    * (term, sym, freq) vocabulary after all k rewrites. */
  private def bpeTrain(docs: DataFrame, k: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = tokens(docs).groupBy("term").agg(count(lit(1)).as("freq"))
      .select(col("term"),
        concat(lit(" "),
          array_join(regexp_extract_all(col("term"), lit("."), lit(0)),
            " "), lit(" ")).as("sym"),
        col("freq"))
      .transform(graft.functions.checkpointed)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val syms = split(trim(col("sym")), " ")
      val top = words
        .select(col("freq"), explode(when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => concat(element_at(syms, i), lit(" "),
              element_at(syms, i + 1))))
          .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .as[(String, Long)].collect()
      if (top.isEmpty) {
        // vocabulary exhausted (every word fully merged): stop with the
        // merges learned so far — the DuckDB twin's empty-winner stages
        // pass the vocab through unchanged, so both engines agree on
        // the short merge table AND the final segmentation (r5 ADVICE:
        // the old `require` threw here while the twin silently wiped
        // the vocab via a CROSS JOIN against the empty winner)
        exhausted = true
      } else {
        val (pair, cnt) = top.head
        val merged = pair.replace(" ", "")
        out += ((rank, pair, merged, cnt))
        // plain substring replace (never regex — symbols may carry regex
        // metachars); two-pass = exact greedy application (see scaladoc)
        def rep1(c: Column): Column = call_function("replace", c,
          lit(s" $pair "), lit(s" $merged "))
        words = words.select(col("term"),
          rep1(rep1(col("sym"))).as("sym"), col("freq"))
          .transform(graft.functions.checkpointed)
        rank += 1
      }
    }
    (out.result(), words)
  }

  def bpeMerges(docs: DataFrame, k: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spark.createDataset(bpeTrain(docs, k)._1)
      .toDF("merge_rank", "pair", "merged", "cnt")
  }

  /** Scalar twin of the BPE rewrite — one word segmented by the trained
    * merges, in rank order, with EXACTLY the training semantics: chars
    * split by the same Java-regex `.` the DataFrame op uses
    * (regexp_extract_all — code-point faithful, unlike toCharArray on
    * surrogates), each merge applied as the same two-pass bounded
    * ` pair ` → ` merged ` literal replace. Applying the rules to a
    * training-corpus word reproduces the trained vocab state
    * bit-for-bit (the rewrite IS the training rewrite); on an unseen
    * word it applies the same bounded two-pass rewrite per merge — NOT
    * full fixpoint greedy BPE: an OOV word with ≥3 non-overlapping
    * repetitions of a pair (e.g. `aaaaaa` under `a a → aa`) under-merges
    * relative to a fixpoint apply. The bound is deliberate — matching
    * the training rewrite exactly is what keeps the streamed
    * segmentation ≡ trained segmentation gate bit-exact; a fixpoint
    * loop would diverge from training on exactly those words. */
  def bpeApplyWord(word: String, merges: Seq[(String, String)]): String = {
    val m = java.util.regex.Pattern.compile(".").matcher(word)
    val sb = new StringBuilder(" ")
    while (m.find()) { sb.append(m.group()); sb.append(' ') }
    var sym = sb.toString
    merges.foreach { case (pair, merged) =>
      sym = sym.replace(s" $pair ", s" $merged ")
      sym = sym.replace(s" $pair ", s" $merged ")
    }
    sym.trim
  }

  /** Tokenize WITH the learned tokenizer: every distinct word segmented
    * by the k trained merges — (term, freq, n_pieces, pieces). The
    * round-trip a tokenizer ships: [[bpeMerges]] is the training
    * artifact, this is its application (greedy merge application is
    * exactly the training rewrite, so segmenting the training corpus is
    * the final vocab state — no separate apply pass needed). */
  def bpeSegment(docs: DataFrame, k: Int = 6): DataFrame =
    bpeTrain(docs, k)._2
      .select(col("term"), col("freq"),
        size(split(trim(col("sym")), " ")).cast("long").as("n_pieces"),
        trim(col("sym")).as("pieces"))

  def bpeSegmentSql(k: Int = 6): String =
    s"""WITH ${bpeCtesSql(k)}
       |SELECT term, freq,
       | CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS n_pieces,
       | trim(sym) AS pieces
       |FROM w$k ORDER BY term""".stripMargin.replace('\n', ' ')

  /** Per-document token count under the TRAINED tokenizer — the number a
    * production pipeline actually budgets and packs by (whitespace counts
    * are the bootstrap proxy; once merges exist, sequence lengths are
    * measured in learned subword pieces). One broadcast join of the token
    * stream against the vocab-sized segmentation table — the corpus
    * aggregates per doc, nothing else shuffles. */
  def bpeDocTokens(docs: DataFrame, k: Int = 6): DataFrame = {
    val seg = bpeSegment(docs, k).select(col("term"), col("n_pieces"))
    tokens(docs).join(broadcast(seg), "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_bpe_tokens"))
  }

  def bpeDocTokensSql(k: Int = 6): String =
    s"""WITH ${bpeCtesSql(k)}
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       | CAST(sum(len(string_split(trim(w.sym), ' '))) AS BIGINT)
       |  AS n_bpe_tokens
       |FROM toks t JOIN w$k w USING (term)
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
      .replace('\n', ' ')

  /** Shared CTE chain of the BPE twins: w0 (char-split vocab) and k
    * (m_i winner, w_i rewrite) stages — each stage counts pairs,
    * LIMIT-1s the winner (same (cnt DESC, pair) order), and rewrites the
    * vocab with the same two-pass bounded replace. */
  private def bpeCtesSql(k: Int): String = {
    def pairsOf(rel: String): String =
      s"""SELECT freq, unnest(CASE WHEN len(string_split(trim(sym), ' ')) >= 2
         | THEN list_transform(range(1, len(string_split(trim(sym), ' '))),
         |   j -> string_split(trim(sym), ' ')[j] || ' ' ||
         |        string_split(trim(sym), ' ')[j + 1])
         | ELSE [] END) AS pair FROM $rel""".stripMargin.replace('\n', ' ')
    val stages = (1 to k).map { i =>
      val prev = s"w${i - 1}"
      s"""m$i AS (SELECT $i AS merge_rank, pair,
         |  replace(pair, ' ', '') AS merged, cnt FROM (
         |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (${pairsOf(prev)}) GROUP BY pair
         |  ORDER BY cnt DESC, pair LIMIT 1)),
         |w$i AS (SELECT w.term,
         |  CASE WHEN m.pair IS NULL THEN w.sym
         |   ELSE replace(replace(w.sym,
         |    ' ' || m.pair || ' ', ' ' || m.merged || ' '),
         |    ' ' || m.pair || ' ', ' ' || m.merged || ' ') END AS sym,
         |  w.freq
         | FROM $prev w LEFT JOIN m$i m ON true)""".stripMargin
        .replace('\n', ' ')
    }.mkString(", ")
    s"""toks AS ($tokensSql),
       |w0 AS (SELECT term,
       |  ' ' || array_to_string(regexp_extract_all(term, '.'), ' ')
       |    || ' ' AS sym, count(*) AS freq
       |  FROM toks GROUP BY term),
       |$stages""".stripMargin.replace('\n', ' ')
  }

  /** DuckDB twin of [[bpeMerges]]: the merge rows unioned off the shared
    * chain. */
  def bpeMergesSql(k: Int = 6): String = {
    val union = (1 to k)
      .map(i => s"SELECT merge_rank, pair, merged, cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeCtesSql(k)}
       |SELECT * FROM ($union) ORDER BY merge_rank"""
      .stripMargin.replace('\n', ' ')
  }

  /** The repetition top-gram share as a PURE per-row scalar expression —
    * no explode, no groupBy: every n-gram of a document lives in its own
    * row, so sort the gram array and fold it counting the longest equal
    * run (= the max multiplicity = [[repetition]]'s `top_gram_count`).
    * Bit-identical to the aggregated `top_gram_frac` (integer counts, one
    * IEEE division); NULL when the doc has fewer than `n` words (the
    * aggregated form emits no row — callers coalesce identically).
    *
    * Why it exists: stateless ⇒ the repetition signal (and therefore the
    * whole [[qualityFilter]]) runs UNCHANGED on a document stream —
    * see `Streaming.streamingQualityFilter`. */
  def topGramFrac(text: Column, n: Int = 2): Column =
    topGramFracWords(split(lower(trim(text)), "[ \\t\\n\\x0B\\f\\r]+"), n)

  /** [[topGramFrac]] over an ALREADY-SPLIT word array — callers that can
    * bind the split into a projected column first should (an inline
    * split referenced inside the gram lambda re-evaluates the regex per
    * element: O(words²) splits per document, the same measured trap as
    * phraseScores' original pair build; an attribute reference reads the
    * row value once). */
  def topGramFracWords(ws: Column, n: Int = 2): Column = {
    val grams = when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val sorted = array_sort(grams)
    val folded = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
    when(size(grams) > 0,
      folded.getField("best").cast("double") / size(grams).cast("long"))
      .otherwise(lit(null).cast("double"))
  }

  /** C4/Gopher-style document filter: the standard pre-training keep/drop
    * decision composed from [[quality]] and [[repetition]] signals, with
    * per-rule flags retained so drops are attributable (the practical
    * pipeline need: you audit WHY a document fell out). Thresholds are
    * parameters; defaults chosen to discriminate on the synthetic corpus.
    * Every comparison operates on bit-identical doubles, so the boolean
    * output is oracle-stable. */
  def qualityFilter(docs: DataFrame, minTokens: Long = 25,
      maxTopGramFrac: Double = 0.08, minMeanTokLen: Double = 3.0,
      maxMeanTokLen: Double = 8.0): DataFrame = {
    val q = quality(docs).select("doc_id", "n_tokens", "mean_token_len")
    val r = repetition(docs).select("doc_id", "top_gram_frac")
    q.join(r, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_tokens") >= minTokens).as("len_ok"),
        (coalesce(col("top_gram_frac"), lit(0.0)) <= maxTopGramFrac)
          .as("rep_ok"),
        (col("mean_token_len") >= minMeanTokLen &&
          col("mean_token_len") <= maxMeanTokLen).as("toklen_ok"))
      .withColumn("keep",
        col("len_ok") && col("rep_ok") && col("toklen_ok"))
  }

  def qualityFilterSql(minTokens: Long = 25, maxTopGramFrac: Double = 0.08,
      minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 8.0): String =
    s"""SELECT q.doc_id,
       | q.n_tokens >= $minTokens AS len_ok,
       | coalesce(r.top_gram_frac, 0.0e0) <= ${sqlDouble(maxTopGramFrac)}
       |   AS rep_ok,
       | (q.mean_token_len >= ${sqlDouble(minMeanTokLen)}
       |   AND q.mean_token_len <= ${sqlDouble(maxMeanTokLen)}) AS toklen_ok,
       | (q.n_tokens >= $minTokens
       |   AND coalesce(r.top_gram_frac, 0.0e0) <= ${sqlDouble(maxTopGramFrac)}
       |   AND q.mean_token_len >= ${sqlDouble(minMeanTokLen)}
       |   AND q.mean_token_len <= ${sqlDouble(maxMeanTokLen)}) AS keep
       |FROM (${qualitySql.replace(" ORDER BY doc_id", "")}) q
       |LEFT JOIN (${repetitionSql().replace(" ORDER BY doc_id", "")}) r
       |  ON r.doc_id = q.doc_id
       |ORDER BY q.doc_id""".stripMargin.replace('\n', ' ')

  // ------------------------------------- distilled quality classifier

  /** Quality-classifier feature row: centered, O(1)-scaled signals from
    * [[quality]] plus the [[qualityFilter]] rule label — the
    * fastText-distillation setup (train a cheap linear model to mimic
    * the expensive rule cascade, then serve the model). Centering
    * constants are FIXED (not data-derived) so the feature map needs no
    * extra corpus pass and is identical at every scale. */
  /** The x-side alone — pure per-row expressions over `(doc_id, text)`,
    * no joins, so the SAME map serves a STREAM (ingest-time scoring,
    * [[graft.streaming.Streaming.streamingQualityScore]]). */
  private[graft] def classifierXFeatures(docs: DataFrame): DataFrame =
    quality(docs)
      .select(col("doc_id"),
        (lnQ(col("n_tokens").cast("double")) / 8.0 - 0.5).as("x1"),
        (col("mean_token_len") / 8.0 - 0.625).as("x2"),
        (col("stopword_ratio") - 0.05).as("x3"),
        (col("space_ratio") - 0.15).as("x4"))

  private def classifierFeatures(docs: DataFrame): DataFrame =
    classifierXFeatures(docs)
      .join(qualityFilter(docs).select(col("doc_id"), col("keep")),
        "doc_id")
      .select(col("doc_id"), col("x1"), col("x2"), col("x3"), col("x4"),
        when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))

  private def classifierFeaturesSql: String =
    s"""SELECT q.doc_id,
       | (floor(ln(CAST(q.n_tokens AS DOUBLE)) * 1e12) / 1e12) / 8.0e0
       |   - 0.5e0 AS x1,
       | q.mean_token_len / 8.0e0 - 0.625e0 AS x2,
       | q.stopword_ratio - 0.05e0 AS x3,
       | q.space_ratio - 0.15e0 AS x4,
       | CASE WHEN k.keep THEN 1.0e0 ELSE 0.0e0 END AS y
       |FROM (${qualitySql.replace(" ORDER BY doc_id", "")}) q
       |JOIN (${qualityFilterSql().replace(" ORDER BY q.doc_id", "")}) k
       |  ON k.doc_id = q.doc_id""".stripMargin.replace('\n', ' ')

  /** Distilled quality classifier: a class-weighted linear probe trained
    * by full-batch gradient descent to mimic [[qualityFilter]]'s rule
    * cascade — the production fastText pattern (heuristics label a
    * corpus once; the learned model generalizes the decision and scores
    * documents the rules never saw). Class weighting (`n_pos/n_neg` on
    * the minority drop class, both counts exact integers) is what makes
    * the 85/15-imbalanced label learnable; a hard-sigmoid variant
    * saturates and an unweighted fit collapses to all-keep (measured).
    *
    * The 1000-executor reproducibility contract: every per-document
    * gradient contribution is quantized to an INTEGER
    * (`floor(g·1e9)`, summed as decimal(38,0)) so the distributed
    * gradient sum is exact and ORDER-INDEPENDENT — the same training
    * run gives bit-identical weights on any partitioning, any cluster
    * size, any reduce order (plain double sums would drift by
    * accumulation order and make training non-reproducible). Every
    * remaining op is an identically-spelled IEEE primitive, so the
    * DuckDB twin's unrolled-CTE training loop lands on bit-equal
    * weights. Features are eagerly checkpointed once; each of the
    * `iters` passes reduces 5 quantized sums (a 6-value driver
    * round-trip per iteration — the same bounded-model-aggregate class
    * as kmeansLoop's centroid collect). */
  /** The linear-probe score head: `z = b + Σ wᵢ·xᵢ` in the fixed fold
    * order both engines spell. */
  private[graft] def classifierZ(w: Array[Double]): Column =
    Seq(col("x1"), col("x2"), col("x3"), col("x4")).zipWithIndex
      .foldLeft(lit(w(0)): Column) {
        case (acc, (x, i)) => acc + lit(w(i + 1)) * x
      }

  private def trainOn(f: DataFrame, iters: Int, eta: Double)
      : Array[Double] = {
    val Array(nPos, nNeg) = f.agg(
      sum(when(col("y") === 1.0, 1L).otherwise(0L)),
      sum(when(col("y") === 0.0, 1L).otherwise(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    require(nNeg > 0 && nPos > 0,
      "degenerate label: classifier needs both classes")
    val cw = nPos.toDouble / nNeg.toDouble
    var w = Array.fill(5)(0.0)
    val dec = "decimal(38,0)"
    for (_ <- 1 to iters) {
      val gd = (classifierZ(w) - col("y")) *
        when(col("y") === 0.0, lit(cw)).otherwise(lit(1.0))
      val row = f.agg(
        count(lit(1)),
        sum(floor(gd * 1e9).cast(dec)),
        sum(floor((gd * col("x1")) * 1e9).cast(dec)),
        sum(floor((gd * col("x2")) * 1e9).cast(dec)),
        sum(floor((gd * col("x3")) * 1e9).cast(dec)),
        sum(floor((gd * col("x4")) * 1e9).cast(dec))).collect()(0)
      val n = row.getLong(0).toDouble
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - eta * ((row.getDecimal(j + 1).doubleValue() / 1e9) / n)
      }
    }
    w
  }

  /** Train the probe and return the 5 weights (bias, w1..w4) — the
    * model artifact the streaming serving path broadcasts. Since r16
    * the weights live in the persistent
    * [[graft.ext.IndexCatalog]] (kind `quality-classifier`, keyed by
    * the documents corpus fingerprint + this op's own twin SQL as
    * the training-semantics text): the first run on a corpus pays
    * the 24 blocking gradient rounds and persists 5 doubles; every
    * later serving read — batch scoring, the streaming score path, a
    * restarted serving tier — loads them. Training is
    * order-independent-exact (integer-quantized gradient sums) and
    * parquet round-trips doubles exactly, so load ≡ retrain
    * bit-for-bit and the retraining DuckDB twin stays green against
    * a catalog-loading engine. */
  def trainQualityClassifier(docs: DataFrame, iters: Int = 24,
      eta: Double = 1.0): Array[Double] =
    IndexCatalog.classifierWeights(docs, iters, eta)

  /** The raw (un-catalogued) training pass — the artifact producer. */
  private[graft] def trainQualityClassifierInline(docs: DataFrame,
      iters: Int, eta: Double): Array[Double] =
    trainOn(graft.functions.parallelized(classifierFeatures(docs))
      .transform(graft.functions.checkpointed), iters, eta)

  /** Score any `(doc_id, text)` relation (batch OR stream — the feature
    * map is stateless per-row expressions) with trained weights. */
  def scoreQuality(docs: DataFrame, w: Array[Double]): DataFrame =
    classifierXFeatures(docs)
      .select(col("doc_id"), classifierZ(w).as("score"),
        (classifierZ(w) >= 0.5).as("keep_pred"))

  def qualityClassifier(docs: DataFrame, iters: Int = 24,
      eta: Double = 1.0): DataFrame = {
    // weights from the persistent catalog (load-or-train); the scoring
    // pass still reads the live features — that is the serving read
    val w = trainQualityClassifier(docs, iters, eta)
    val f = graft.functions.parallelized(classifierFeatures(docs))
      .transform(graft.functions.checkpointed)
    f.select(col("doc_id"), classifierZ(w).as("score"),
      (classifierZ(w) >= 0.5).as("keep_pred"),
      (col("y") === 1.0).as("keep_rule"))
  }

  /** DuckDB twin of [[qualityClassifier]]: the training loop unrolled
    * into `iters` chained (gradient-agg, weight-update) CTE pairs over
    * the materialized feature table — same quantization, same
    * identically-spelled IEEE chain, bit-equal final weights.
    *
    * Every chain CTE is `AS MATERIALIZED`: `w_k` is referenced twice
    * (by `g_{k+1}` and `w_{k+1}`), so DuckDB's default CTE inlining
    * doubles the plan per iteration — 2^iters subplans, unplannable at
    * 24 (measured: >10 min inlined vs 1.7 s materialized). */
  def qualityClassifierSql(iters: Int = 24, eta: Double = 1.0): String = {
    val zOf = (w: String) =>
      s"(((($w.b + $w.w1*x1) + $w.w2*x2) + $w.w3*x3) + $w.w4*x4)"
    val iterCtes = (1 to iters).map { k =>
      val pw = s"w${k - 1}"
      s"""g$k AS MATERIALIZED (SELECT
         |  sum(CAST(floor(gd * 1e9) AS BIGINT)) AS s0,
         |  sum(CAST(floor((gd * x1) * 1e9) AS BIGINT)) AS s1,
         |  sum(CAST(floor((gd * x2) * 1e9) AS BIGINT)) AS s2,
         |  sum(CAST(floor((gd * x3) * 1e9) AS BIGINT)) AS s3,
         |  sum(CAST(floor((gd * x4) * 1e9) AS BIGINT)) AS s4
         | FROM (SELECT x1, x2, x3, x4,
         |   (${zOf("w")} - y) *
         |    (CASE WHEN y = 0.0e0 THEN c.cw ELSE 1.0e0 END) AS gd
         |  FROM fq CROSS JOIN $pw w CROSS JOIN cwn c)),
         |w$k AS MATERIALIZED (SELECT
         |  w.b - (${sqlDouble(eta)} * ((CAST(g.s0 AS DOUBLE) / 1e9)
         |    / CAST(c.n AS DOUBLE))) AS b,
         |  w.w1 - (${sqlDouble(eta)} * ((CAST(g.s1 AS DOUBLE) / 1e9)
         |    / CAST(c.n AS DOUBLE))) AS w1,
         |  w.w2 - (${sqlDouble(eta)} * ((CAST(g.s2 AS DOUBLE) / 1e9)
         |    / CAST(c.n AS DOUBLE))) AS w2,
         |  w.w3 - (${sqlDouble(eta)} * ((CAST(g.s3 AS DOUBLE) / 1e9)
         |    / CAST(c.n AS DOUBLE))) AS w3,
         |  w.w4 - (${sqlDouble(eta)} * ((CAST(g.s4 AS DOUBLE) / 1e9)
         |    / CAST(c.n AS DOUBLE))) AS w4
         | FROM $pw w CROSS JOIN g$k g CROSS JOIN cwn c)""".stripMargin
    }.mkString(",\n")
    s"""WITH fq AS MATERIALIZED ($classifierFeaturesSql),
       |cwn AS MATERIALIZED (SELECT
       |  CAST(sum(CASE WHEN y = 1.0e0 THEN 1 ELSE 0 END) AS DOUBLE)
       |   / CAST(sum(CASE WHEN y = 0.0e0 THEN 1 ELSE 0 END) AS DOUBLE)
       |   AS cw,
       |  CAST(count(*) AS BIGINT) AS n FROM fq),
       |w0 AS MATERIALIZED (SELECT 0.0e0 AS b, 0.0e0 AS w1, 0.0e0 AS w2,
       |  0.0e0 AS w3, 0.0e0 AS w4),
       |$iterCtes
       |SELECT doc_id, ${zOf("w")} AS score,
       | ${zOf("w")} >= 0.5e0 AS keep_pred,
       | y = 1.0e0 AS keep_rule
       |FROM fq CROSS JOIN w$iters w
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  /** Reliability table for [[qualityClassifier]] — the calibration
    * audit every served ML filter needs (does score 0.7 actually mean
    * ~70% of those docs pass the rule cascade?): predicted-score decile
    * buckets × empirical rule-pass rate. A monotone keep_rate column is
    * a sane probe threshold; a flat one means the probe memorized the
    * majority class. Mean score per bucket goes through the fixed-point
    * quantize-sum-once contract (order-independent); rates are single
    * IEEE divisions of exact counts. */
  def classifierCalibration(scored: DataFrame): DataFrame =
    scored
      .groupBy(floor(col("score") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_rule"), 1L).otherwise(0L)).as("n_keep_rule"),
        sum(floor(col("score") * 1e9).cast("decimal(38,0)")).as("sq"))
      .select(col("bucket"), col("n_docs"), col("n_keep_rule"),
        (col("n_keep_rule").cast("double") / col("n_docs").cast("double"))
          .as("keep_rate"),
        ((col("sq").cast("double") / 1e9) / col("n_docs").cast("double"))
          .as("mean_score"))

  def classifierCalibrationSql(iters: Int = 24,
      eta: Double = 1.0): String =
    s"""WITH scored AS (SELECT * FROM (
       | ${qualityClassifierSql(iters, eta).replace(" ORDER BY doc_id", "")}))
       |SELECT CAST(floor(score * 10) AS BIGINT) AS bucket,
       | CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(CASE WHEN keep_rule THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_keep_rule,
       | CAST(sum(CASE WHEN keep_rule THEN 1 ELSE 0 END) AS DOUBLE)
       |   / CAST(count(*) AS DOUBLE) AS keep_rate,
       | (CAST(sum(CAST(floor(score * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
       |   / CAST(count(*) AS DOUBLE) AS mean_score
       |FROM scored GROUP BY 1 ORDER BY bucket""".stripMargin
      .replace('\n', ' ')

  /** Per-language disparate-impact audit for the quality filter stack —
    * the responsible-curation check the C4 postmortems made standard
    * (rule cascades and learned filters both tend to over-drop
    * under-resourced languages/dialects; nobody notices until the
    * per-group rates are printed). One row per language: classifier
    * keep rate vs rule keep rate vs mean score. A language whose
    * predicted keep rate sits far below the corpus mean is being
    * filtered into under-representation — the dial to fix BEFORE
    * training, not after. Exact counts, quantize-sum-once mean, one
    * division per emitted rate. */
  def classifierBias(scored: DataFrame, docs: DataFrame): DataFrame =
    scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_pred"), 1L).otherwise(0L)).as("n_keep_pred"),
        sum(when(col("keep_rule"), 1L).otherwise(0L)).as("n_keep_rule"),
        sum(floor(col("score") * 1e9).cast("decimal(38,0)")).as("sq"))
      .select(col("lang"), col("n_docs"),
        (col("n_keep_pred").cast("double") / col("n_docs").cast("double"))
          .as("keep_rate_pred"),
        (col("n_keep_rule").cast("double") / col("n_docs").cast("double"))
          .as("keep_rate_rule"),
        ((col("sq").cast("double") / 1e9) / col("n_docs").cast("double"))
          .as("mean_score"))

  def classifierBiasSql(iters: Int = 24, eta: Double = 1.0): String =
    s"""WITH scored AS (SELECT * FROM (
       | ${qualityClassifierSql(iters, eta).replace(" ORDER BY doc_id", "")}))
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(CASE WHEN s.keep_pred THEN 1 ELSE 0 END) AS DOUBLE)
       |   / CAST(count(*) AS DOUBLE) AS keep_rate_pred,
       | CAST(sum(CASE WHEN s.keep_rule THEN 1 ELSE 0 END) AS DOUBLE)
       |   / CAST(count(*) AS DOUBLE) AS keep_rate_rule,
       | (CAST(sum(CAST(floor(s.score * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
       |   / CAST(count(*) AS DOUBLE) AS mean_score
       |FROM scored s JOIN documents d ON d.doc_id = s.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin.replace('\n', ' ')

  /** Tokenizer fertility per language — the standard tokenizer-eval
    * metric (BPE pieces emitted per word): high fertility on a language
    * means the merge table under-serves it, the signal multilingual
    * tokenizer work (XLM-R, NLLB) balances vocab budgets on. Composed
    * from [[bpeDocTokens]] (the TRAINED segmenter's per-doc counts)
    * joined to the language column and re-aggregated — integer sums,
    * one exact IEEE division per language row. Output is
    * language-bounded; the heavy lifting is bpeDocTokens' own plan. */
  def bpeFertility(docs: DataFrame, k: Int = 6): DataFrame =
    bpeDocTokens(docs, k)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))

  def bpeFertilitySql(k: Int = 6): String =
    s"""WITH bdt AS (
       | ${bpeDocTokensSql(k).replace(" ORDER BY t.doc_id", "")})
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(b.n_words) AS BIGINT) AS n_words,
       | CAST(sum(b.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       | CAST(sum(b.n_bpe_tokens) AS DOUBLE) / CAST(sum(b.n_words) AS DOUBLE)
       |  AS fertility
       |FROM bdt b JOIN documents d USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin.replace('\n', ' ')

  /** Per-source domain scorecard — the FineWeb-style audit table a data
    * lead reads before setting [[graft.ext.Pipeline.mixtureSample]]
    * weights: document count, token/char totals, and the
    * [[qualityFilter]] pass rate per source. Integer sums + one exact
    * division per emitted mean; the aggregation key is source (bounded),
    * so the output is a few rows at any corpus size and the shuffle
    * carries map-side-combined partials only. */
  def sourceQuality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("nc"),
        tokenCount(col("text")).cast("long").as("nt"))
      .join(qualityFilter(docs).select(col("doc_id"), col("keep")),
        "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nc")).as("total_chars"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_rate",
        col("n_keep").cast("double") / col("n_docs").cast("double"))
      .withColumn("mean_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))

  def sourceQualitySql(): String =
    s"""WITH qf AS (
       | ${qualityFilterSql().replace(" ORDER BY q.doc_id", "")}),
       |base AS (SELECT doc_id, source,
       |  CAST(length(text) AS BIGINT) AS nc,
       |  CAST($tokenCountSql AS BIGINT) AS nt FROM documents)
       |SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(b.nt) AS BIGINT) AS total_tokens,
       | CAST(sum(b.nc) AS BIGINT) AS total_chars,
       | CAST(sum(CASE WHEN q.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       | CAST(sum(CASE WHEN q.keep THEN 1 ELSE 0 END) AS DOUBLE)
       |   / CAST(count(*) AS DOUBLE) AS keep_rate,
       | CAST(sum(b.nt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens
       |FROM base b JOIN qf q USING (doc_id)
       |GROUP BY b.source ORDER BY b.source""".stripMargin.replace('\n', ' ')

  /** Per-source length inequality: the Gini coefficient of document
    * token counts — the corpus-audit companion of [[sourceQuality]]
    * (a source whose Gini spikes is a mix of boilerplate stubs and
    * mega-documents, which mean length hides). Computed from the exact
    * rank identity `G = (2·Σ(rᵢ·xᵢ) − (n+1)·Σxᵢ) / (n·Σxᵢ)` with ranks
    * from the UNIQUE (n_tokens, doc_id) order (ties broken
    * deterministically, so both engines rank identically); the rank
    * sum is an exact decimal emitted through the shared double cast,
    * and the Gini is one identical IEEE chain. Null for a source with
    * zero total tokens.
    *
    * Scale shape: one per-SOURCE rank window (source cardinality is
    * thousands+ — the [[graft.ext.Pipeline.tokenBudget]] stance, a
    * parallelizing key) feeding one bounded-key aggregation. */
  def lengthGini(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("nt", "doc_id")
    docs.select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("nt"))
      .withColumn("r", row_number().over(w))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        sum(col("r").cast("decimal(20,0)") *
          col("nt").cast("decimal(20,0)")).cast("double")
          .as("rank_weighted"))
      .withColumn("gini",
        when(col("total_tokens") > 0L,
          (lit(2.0d) * col("rank_weighted") -
            (col("n_docs").cast("double") + lit(1.0d)) *
              col("total_tokens").cast("double")) /
            (col("n_docs").cast("double") *
              col("total_tokens").cast("double"))))
      .orderBy("source")
  }

  def lengthGiniSql(): String =
    s"""SELECT source, n_docs, total_tokens, rank_weighted,
       | CASE WHEN total_tokens > 0 THEN
       |  (2.0 * rank_weighted
       |    - (CAST(n_docs AS DOUBLE) + 1.0)
       |      * CAST(total_tokens AS DOUBLE))
       |   / (CAST(n_docs AS DOUBLE) * CAST(total_tokens AS DOUBLE))
       | END AS gini
       |FROM (
       | SELECT source, count(*) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CAST(r AS HUGEINT) * CAST(nt AS HUGEINT)) AS DOUBLE)
       |   AS rank_weighted
       | FROM (
       |  SELECT source, doc_id, nt,
       |   row_number() OVER (PARTITION BY source
       |     ORDER BY nt, doc_id) AS r
       |  FROM (
       |   SELECT doc_id, source, CAST($tokenCountSql AS BIGINT) AS nt
       |   FROM documents))
       | GROUP BY 1)
       |ORDER BY source""".stripMargin.replace('\n', ' ')

  /** Per-source distribution drift: unigram KL divergence of each
    * source's word distribution from the whole-corpus distribution —
    * the data-mixing diagnostic that tells a data lead WHICH source is
    * distributionally unlike the rest (boilerplate farms and template
    * spam jump out long before any per-doc score moves).
    *
    * `KL(P_s ‖ P_c) = Σ_w p_s(w)·(ln p_s(w) − ln p_c(w))`, computed
    * under the engine's integer-exactness contract: each log is floor-
    * quantized to an INTEGER (`floor(ln·1e12)`, a long), the per-word
    * term is `c_sw · (Q_s − Q_c)` in exact decimal arithmetic (the
    * product is decimal(36,0) — Int64 would overflow once a word's
    * count passes ~1e5 at production corpus sizes), and the per-source
    * sum runs over decimal(38,0) — order-independent at any
    * partitioning; ONE double division pair at the end. Quantization
    * bias is ≤1e-12 nats/word — 10 orders below any drift signal.
    *
    * Scale shape: one (source, word) aggregation (map-side combined),
    * word totals re-aggregated FROM it (no second corpus pass), a join
    * on word (shuffle bounded by vocab, not corpus), source totals and
    * the corpus constant broadcast. */
  def sourceDrift(docs: DataFrame): DataFrame = {
    // checkpointed: the (source, word) count table feeds the per-word
    // rollup, the per-source rollup AND the scoring join —
    // unmaterialized, the corpus tokenized once per reference
    val sw = graft.functions.parallelized(docs)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .transform(graft.functions.checkpointed)
    val cw = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val ns = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"),
      count(lit(1)).as("n_distinct"))
    val nt = graft.functions.localRelation(
      cw.agg(sum(col("c_w")).as("n_corpus")))
    val qs = floor(log(col("c_sw").cast("double") /
      col("n_s").cast("double")) * 1e12).cast("long")
    val qc = floor(log(col("c_w").cast("double") /
      col("n_corpus").cast("double")) * 1e12).cast("long")
    sw.join(cw, "w").join(broadcast(ns), "source").crossJoin(broadcast(nt))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"),
        // the multiply itself runs in decimal: |qs−qc| reaches ~1e14,
        // so a word with c_sw ≳ 1e5 would overflow an Int64 product at
        // production corpus sizes (ADVICE r9). decimal(20,0) covers any
        // Long count, decimal(15,0) any quantized log-ratio; their
        // product is decimal(36,0) — exact, no precision reduction
        sum(col("c_sw").cast("decimal(20,0)") *
          (qs - qc).cast("decimal(15,0)")).as("s"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        ((col("s").cast("double") / 1e12) /
          col("n_tokens").cast("double")).as("kl_nats"))
  }

  def sourceDriftSql(): String =
    s"""WITH sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
       | FROM (SELECT source,
       |   unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
       |  FROM documents) GROUP BY source, w),
       |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w
       | FROM sw GROUP BY w),
       |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s,
       |  CAST(count(*) AS BIGINT) AS n_distinct FROM sw GROUP BY source),
       |nt AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_corpus FROM cw)
       |SELECT s.source, ns.n_s AS n_tokens, ns.n_distinct,
       | (CAST(sum(CAST(s.c_sw AS HUGEINT) *
       |   (CAST(floor(ln(CAST(s.c_sw AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
       |      * 1e12) AS BIGINT)
       |  - CAST(floor(ln(CAST(cw.c_w AS DOUBLE)
       |      / CAST(nt.n_corpus AS DOUBLE)) * 1e12) AS BIGINT)))
       |   AS DOUBLE) / 1e12) / CAST(ns.n_s AS DOUBLE) AS kl_nats
       |FROM sw s JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN nt
       |GROUP BY s.source, ns.n_s, ns.n_distinct
       |ORDER BY s.source""".stripMargin.replace('\n', ' ')

  // ------------------------------------------------------ hash sampling

  /** 32-hex-char threshold for rate r: md5(id) < threshold keeps an
    * r-fraction of ids. Comparing the md5 STRING lexicographically equals
    * comparing the 128-bit value numerically (fixed-width lowercase hex),
    * so membership needs no hex→int conversion — the same md5-ordering
    * trick the MinHash signatures use, portable verbatim to DuckDB. */
  private[graft] def rateThresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    if (rate >= 1.0) "g" // > every hex char: keep all
    else {
      val scaled = (BigDecimal(rate) *
        BigDecimal(BigInt(16).pow(32))).toBigInt
      val hex = scaled.toString(16)
      "0" * (32 - hex.length) + hex
    }
  }

  /** Deterministic Bernoulli membership: keep `id` with probability
    * ~`rate`, as a pure function of the id (no RNG) — the reproducible
    * subsampling primitive: stable across runs, engines, partitionings,
    * and cluster sizes, and a superset-property holds (rate r ⊂ rate r'
    * for r < r'), which is what makes staged data ablations comparable. */
  def hashKeep(id: Column, rate: Double): Column =
    md5(id.cast("string")) < lit(rateThresholdHex(rate))

  def hashKeepSql(idExpr: String, rate: Double): String =
    s"md5(CAST($idExpr AS VARCHAR)) < '${rateThresholdHex(rate)}'"

  /** Stratified deterministic sampling: per-stratum keep rates (e.g.
    * downsample dominant languages, keep the tail) with a default for
    * unlisted strata. One codegen'd predicate — no shuffle, no RNG. */
  def stratifiedSample(docs: DataFrame, strata: Column,
      rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val id = col("doc_id")
    val keep = rates.foldRight(hashKeep(id, defaultRate)) {
      case ((stratum, r), acc) =>
        when(strata === stratum, hashKeep(id, r)).otherwise(acc)
    }
    docs.where(keep)
  }

  def stratifiedSampleSql(strataExpr: String, rates: Seq[(String, Double)],
      defaultRate: Double): String = {
    val cases = rates.foldRight(hashKeepSql("doc_id", defaultRate)) {
      case ((stratum, r), acc) =>
        s"CASE WHEN $strataExpr = ${sqlStr(stratum)} " +
          s"THEN ${hashKeepSql("doc_id", r)} ELSE $acc END"
    }
    s"SELECT * FROM documents WHERE $cases ORDER BY doc_id"
  }

  // -------------------------------------------------------- text scrubbing

  // ASCII-only character classes: the Java (Spark) and RE2 (DuckDB) regex
  // engines match these identically — the portability rule this file uses
  // everywhere
  private val UrlPat = """https?://[^\s]+"""
  private val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** C4-style scrubbing: URLs and email addresses replaced with
    * placeholder tokens, whitespace normalized, with per-doc counts of
    * what was removed (counts are over the RAW text) — the standard
    * PII/boilerplate cleaning pass before tokenization. Pure codegen'd
    * expressions, no UDF. */
  def clean(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(UrlPat), lit(0)))
        .as("n_urls"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0)))
        .as("n_emails"),
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), UrlPat, " <URL> "),
          EmailPat, " <EMAIL> "),
        "[ \\t\\n\\x0B\\f\\r]+", " ")).as("clean_text"))

  val cleanSql: String =
    s"""SELECT doc_id,
       | len(regexp_extract_all(text, '$UrlPat')) AS n_urls,
       | len(regexp_extract_all(text, '$EmailPat')) AS n_emails,
       | trim(regexp_replace(regexp_replace(regexp_replace(text,
       |   '$UrlPat', ' <URL> ', 'g'),
       |   '$EmailPat', ' <EMAIL> ', 'g'),
       |   '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS clean_text
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // -------------------------------------------------------- keyword search

  /** Natural log quantized to 12 decimals via exact IEEE ops
    * (`floor(ln(x)·1e12)/1e12`): libm `log` is NOT bit-portable across
    * engines (measured: 7/10500 idf arguments differ by 1 ulp between the
    * JVM and DuckDB), but floor-quantization collapses every measured
    * 1-ulp pair onto the same double. The 1e-12 score perturbation is ~4
    * orders below any ranking-relevant difference. */
  def lnQ(x: Column): Column = floor(log(x) * 1e12) / 1e12

  /** A Scala double as a DuckDB DOUBLE literal. String-parse round-trip:
    * `CAST('<toString>' AS DOUBLE)` recovers the identical IEEE value for
    * ANY double (toString is read-back-exact), where naive `"${x}e0"`
    * breaks on scientific-notation renderings (1.0E-5 -> `1.0E-5e0`) and
    * a bare literal would be typed DECIMAL. */
  private def sqlDouble(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** A Scala string as a DuckDB string literal: single quotes doubled.
    * Every builder-interpolated term/stratum goes through this — a term
    * containing `'` must not break (or inject into) the generated twin. */
  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
  // outer parens: the quantizing division must bind to floor() BEFORE any
  // surrounding multiplication, or left-associativity reorders the rounding
  private def lnQSql(x: String): String =
    s"(floor(ln($x) * 1e12) / 1e12)"

  /** Whitespace tokens, one row per occurrence: (doc_id, term). */
  /** Scalar twin of the engine-wide word split
    * `split(lower(trim(text)), "[ \\t\\n\\x0B\\f\\r]+")` — SQL semantics exactly: trim
    * strips SPACES only (Java's String.trim also strips tabs — a real
    * drift a property gate caught), and split keeps a trailing empty
    * token (Java's default limit drops it). Shared by every scalar /
    * streaming twin that tokenizes off-DataFrame. */
  def sqlWords(text: String): Array[String] = {
    var s0 = 0
    var e = text.length
    while (s0 < e && text.charAt(s0) == ' ') s0 += 1
    while (e > s0 && text.charAt(e - 1) == ' ') e -= 1
    text.substring(s0, e)
      .toLowerCase(java.util.Locale.ROOT).split("[ \\t\\n\\x0B\\f\\r]+", -1)
  }

  private def tokens(docs: DataFrame): DataFrame =
    graft.functions.parallelized(docs).select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))

  private val tokensSql: String =
    """SELECT doc_id,
      | unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |FROM documents""".stripMargin.replace('\n', ' ')

  /** BM25 keyword search: top-`topK` documents for a bag of query `terms`
    * (Robertson idf with the +1 floor, k1/b defaults per the literature).
    * Determinism contract: idf through [[lnQ]]; the per-document score is
    * an explicit left-to-right `+`-chain over the FIXED query-term order
    * (terms sorted), never an unordered float SUM — both engines perform
    * the identical IEEE sequence, so scores are bit-exact.
    *
    * Scale shape: tf filters to query terms AT the token stream (the
    * corpus never aggregates the full vocabulary); corpus constants
    * (N, avgdl) and per-term df are bounded aggregates materialized local
    * and broadcast; top-k is a TakeOrdered, not a global sort. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    import graft.functions.localRelation
    val qterms = terms.map(_.toLowerCase).distinct.sorted
    val toks = tokens(docs)
    // ONE tokenization pass (previously two — per-doc lengths and
    // query-term counts each re-tokenized the corpus): group on
    // (doc_id, query-term-or-NULL) — the null bucket pools every
    // non-query token, so per-doc lengths (Σ counts) and the
    // query-term tfs both come off the one checkpointed aggregate.
    val agg1 = toks.groupBy(col("doc_id"),
        when(col("term").isin(qterms: _*), col("term")).as("_qt"))
      .agg(count(lit(1)).as("_c"))
      .transform(graft.functions.checkpointed)
    val dl = agg1.groupBy("doc_id").agg(sum(col("_c")).as("dl"))
    val consts = localRelation(dl.agg(
        count(lit(1)).as("n_docs"), sum(col("dl")).as("tdl"))
      .select(col("n_docs"),
        (col("tdl").cast("double") / col("n_docs")).as("avgdl")))
    val tf = agg1.where(col("_qt").isNotNull)
      .select(col("doc_id"), col("_qt").as("term"), col("_c").as("tf"))
    val dfreq = localRelation(
      tf.groupBy("term").agg(count(lit(1)).as("df")))
    val scored = tf.join(dl, "doc_id").join(dfreq, "term").crossJoin(consts)
      .withColumn("idf",
        lnQ((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("tscore",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = qterms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("tscore"))).as(s"_s$i")
    }
    scored.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        qterms.indices.map(i => coalesce(col(s"_s$i"), lit(0.0)))
          .reduceLeft(_ + _).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** DuckDB twin of [[bm25]] — textually the same arithmetic, same
    * left-to-right term chain. Every fractional literal is
    * exponent-suffixed (`1.2e0`): DuckDB types a bare `1.2` as DECIMAL and
    * computes EXACT decimal products where Spark computes IEEE doubles —
    * `tf * (1.2 + 1.0)` came out 6.6 exact vs 6.6000000000000005 binary
    * until every constant was forced DOUBLE. */
  def bm25Sql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): String = {
    val qterms = terms.map(_.toLowerCase).distinct.sorted
    val inList = qterms.map(sqlStr).mkString(", ")
    val perTerm = qterms.zipWithIndex.map { case (t, i) =>
      s"max(CASE WHEN term = ${sqlStr(t)} THEN tscore END) AS _s$i"
    }.mkString(", ")
    val chain = qterms.indices.map(i => s"coalesce(_s$i, 0.0e0)")
      .mkString(" + ")
    s"""WITH toks AS ($tokensSql),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |consts AS (SELECT count(*) AS n_docs,
       |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term IN ($inList) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT t.doc_id, t.term,
       |  ${lnQSql("(c.n_docs - f.df + 0.5e0) / (f.df + 0.5e0) + 1.0e0")}
       |    * (t.tf * (${sqlDouble(k1)} + 1.0e0)) /
       |    (t.tf + ${sqlDouble(k1)} * (1.0e0 - ${sqlDouble(b)}
       |      + ${sqlDouble(b)} * d.dl / c.avgdl))
       |    AS tscore
       | FROM tf t JOIN dl d USING (doc_id) JOIN dfreq f USING (term)
       | CROSS JOIN consts c)
       |SELECT doc_id, $chain AS score FROM (
       | SELECT doc_id, $perTerm FROM scored GROUP BY doc_id)
       |ORDER BY score DESC, doc_id LIMIT $topK"""
      .stripMargin.replace('\n', ' ')
  }

  /** The full BM25 INVERTED INDEX — per (term, doc) the term's BM25
    * contribution `tscore`, precomputed over the whole vocabulary: the
    * static artifact a search-serving path joins arriving queries
    * against ([[graft.streaming.Streaming.streamingBm25TopK]]). The
    * arithmetic is [[bm25]]'s chain verbatim (same lnQ idf, same k1/b
    * saturation), so serving a query through the index reproduces the
    * batch scorer bit-exactly. Index size is Σ per-doc distinct terms —
    * the standard postings scale; at 100 TB it lives as a term-keyed
    * table (stream-static equi-join on term), never a broadcast. */
  def bm25Index(docs: DataFrame, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import graft.functions.localRelation
    // ONE tokenization pass (previously two): per-doc lengths derive
    // from the checkpointed (doc, term, tf) postings themselves —
    // Σ tf per doc IS the doc length.
    val tf = tokens(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .transform(graft.functions.checkpointed)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val consts = localRelation(dl.agg(
        count(lit(1)).as("n_docs"), sum(col("dl")).as("tdl"))
      .select(col("n_docs"),
        (col("tdl").cast("double") / col("n_docs")).as("avgdl")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id").join(dfreq, "term").crossJoin(consts)
      .select(col("term"), col("doc_id"),
        (lnQ((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
          .as("tscore"))
  }

  def bm25IndexSql(k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH toks AS ($tokensSql),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |consts AS (SELECT count(*) AS n_docs,
       |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
       |SELECT t.term, t.doc_id,
       | ${lnQSql("(c.n_docs - f.df + 0.5e0) / (f.df + 0.5e0) + 1.0e0")}
       |   * (t.tf * (${sqlDouble(k1)} + 1.0e0)) /
       |   (t.tf + ${sqlDouble(k1)} * (1.0e0 - ${sqlDouble(b)}
       |     + ${sqlDouble(b)} * d.dl / c.avgdl)) AS tscore
       |FROM tf t JOIN dl d USING (doc_id) JOIN dfreq f USING (term)
       |CROSS JOIN consts c
       |ORDER BY t.term, t.doc_id""".stripMargin.replace('\n', ' ')

  /** TF-IDF keyword extraction: the `topK` highest-tf·idf terms per
    * document (idf = quantized ln(N/df), ties broken by term). No float
    * sums at all — tf·idf is a single exact product — so bit-portability
    * needs only [[lnQ]]. The per-doc rank window is bounded by the doc's
    * own vocabulary: no hot-key funnel. */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 3): DataFrame = {
    import graft.functions.localRelation
    // checkpointed: tf feeds the df aggregate AND the scoring join
    // (the tfidfCosine stance) — unmaterialized, the corpus tokenized
    // twice per invocation
    val tf = tokens(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .transform(graft.functions.checkpointed)
    val nDocs = localRelation(
      docs.agg(count(lit(1)).as("n_docs")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(nDocs)
      .withColumn("tfidf",
        col("tf") * lnQ(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select("doc_id", "rank", "term", "tfidf")
  }

  /** TF-IDF cosine document similarity — vector-space near-dup WITHOUT
    * embeddings (the text-side analog of
    * [[Similarity.cosineNearDup]]): documents are sparse tf·idf vectors
    * over the DISCRIMINATIVE vocabulary (terms with `df <= dfMax` — hot
    * terms carry no cosine mass and all of the pair blowup, so the
    * vector space itself is restricted, keeping the cosine exact over
    * that vocabulary rather than approximated). Pairs meet through the
    * inverted-index equi-join on term; `sim >= threshold` survives.
    *
    * Determinism: weights are exact products of integer tf and
    * lnQ-quantized idf; each pair dot and each doc's squared norm are
    * sums of `floor(w·w·1e6)` INTEGER terms — exact and order-free (no
    * float fold-order pinning) — and the final
    * `sab / (sqrt(sa)·sqrt(sb))` is the identical IEEE sequence in both
    * engines.
    *
    * Scale shape: the term join is df-capped (≤ dfMax² pairs per term);
    * per-pair and per-doc aggregations key on bounded ids; the token
    * stream aggregates once into the (doc, term, tf) table that feeds
    * everything else. */
  /** The df cap as a fraction of corpus size — "discriminative" is a
    * RATIO (a term in ≤5% of documents), not an absolute count, so the
    * blocking survives any corpus scale (the ANN `planesFor` lesson
    * applied to text). */
  def dfMaxFor(nDocs: Long, frac: Double = 0.05): Int =
    math.max(1, math.ceil(nDocs * frac).toInt)

  def tfidfCosine(docs: DataFrame, dfMax: Int = 25,
      threshold: Double = 0.3): DataFrame = {
    import graft.functions.localRelation
    val tf = tokens(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .transform(graft.functions.checkpointed) // feeds df AND weights
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfMax)
    val nDocs = localRelation(docs.agg(count(lit(1)).as("n_docs")))
    val wts = tf.join(dfreq, "term").crossJoin(nDocs)
      .select(col("doc_id"), col("term"),
        (col("tf") * lnQ(col("n_docs").cast("double") / col("df")))
          .as("w"))
      .transform(graft.functions.checkpointed) // feeds norms AND the pair dots
    val norms = wts.groupBy("doc_id")
      .agg(sum(floor(col("w") * col("w") * lit(1e6)).cast("long"))
        .as("s2"))
    val a = wts.select(col("doc_id").as("doc_a"), col("term"),
      col("w").as("wa"))
    val b = wts.select(col("doc_id").as("doc_b"), col("term"),
      col("w").as("wb"))
    val dots = a.join(b, "term").where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(floor(col("wa") * col("wb") * lit(1e6)).cast("long"))
        .as("sab"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("s2").as("na")),
        "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("s2").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("sab").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("sim"))
      .where(col("sim") >= threshold)
  }

  def tfidfCosineSql(dfMax: Int = 25, threshold: Double = 0.3): String =
    s"""WITH toks AS ($tokensSql),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |dfreq AS (SELECT term, count(*) AS df FROM tf
       |  GROUP BY 1 HAVING count(*) <= $dfMax),
       |wts AS (SELECT t.doc_id, t.term,
       |  t.tf * ${lnQSql("CAST(n.n_docs AS DOUBLE) / f.df")} AS w
       | FROM tf t JOIN dfreq f USING (term) CROSS JOIN nd n),
       |norms AS (SELECT doc_id,
       |  CAST(sum(CAST(floor(w * w * 1e6) AS BIGINT)) AS BIGINT) AS s2
       | FROM wts GROUP BY 1),
       |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(sum(CAST(floor(a.w * b.w * 1e6) AS BIGINT)) AS BIGINT) AS sab
       | FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id < b.doc_id
       | GROUP BY 1, 2)
       |SELECT doc_a, doc_b, sim FROM (
       | SELECT d.doc_a, d.doc_b, CAST(d.sab AS DOUBLE) /
       |   (sqrt(CAST(na.s2 AS DOUBLE)) * sqrt(CAST(nb.s2 AS DOUBLE))) AS sim
       | FROM dots d
       | JOIN norms na ON na.doc_id = d.doc_a
       | JOIN norms nb ON nb.doc_id = d.doc_b)
       |WHERE sim >= ${sqlDouble(threshold)}
       |ORDER BY doc_a, doc_b""".stripMargin.replace('\n', ' ')

  def tfidfTopTermsSql(topK: Int = 3): String =
    s"""WITH toks AS ($tokensSql),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT t.doc_id, t.term,
       |  t.tf * ${lnQSql("CAST(n.n_docs AS DOUBLE) / f.df")} AS tfidf
       | FROM tf t JOIN dfreq f USING (term) CROSS JOIN nd n)
       |SELECT doc_id, rank, term, tfidf FROM (
       | SELECT *, row_number() OVER (
       |   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
       | FROM scored)
       |WHERE rank <= $topK ORDER BY doc_id, rank"""
      .stripMargin.replace('\n', ' ')

  /** Per-document repetition signals (the Gopher / MassiveText
    * quality-filter family, Rae et al. 2021 §A1.1): the fraction of
    * duplicate LINES and of characters inside them, the fraction of
    * characters covered by the single most frequent word 2-gram, and
    * the fraction of characters inside word 5-grams that occur more
    * than once — the standard "remove documents that repeat
    * themselves" pretraining filters.
    *
    * Definitions (deterministic, both engines verbatim):
    *  - lines split on `\n` as-is (empty lines count);
    *    `dup_line_frac = Σ_{line values with cnt ≥ 2} cnt / n_lines`,
    *    `dup_line_char_frac` weights each duplicated line by its
    *    character length over total line characters;
    *  - words are the non-empty `\s+` tokens; the char denominator is
    *    the whitespace-NORMALIZED doc length `Σ len(word) + (n−1)`
    *    (single-space joined — raw runs of whitespace do not inflate
    *    the base);
    *  - `top_2gram_char_frac = cnt·len(gram) / denom` for the most
    *    frequent 2-gram (ties break to the lexicographically GREATEST
    *    gram — `max(struct(cnt, gram))` ≡ DuckDB row max);
    *  - `dup_5gram_char_frac = Σ_{5-grams with cnt ≥ 2} cnt·len / denom`
    *    (each occurrence weighted whole — the documented simplification
    *    of Gopher's positional coverage, monotone in the same signal).
    * All counts are exact integers; each fraction is one IEEE
    * division; docs without the needed grams emit null fractions.
    *
    * Scale shape: three doc-keyed explode→aggregate branches (lines,
    * 2-grams, 5-grams) joined back on doc_id — per-doc work is linear
    * in doc length, no cross-doc state anywhere. */
  def repetitionCoverage(docs: DataFrame): DataFrame = {
    val base = graft.functions.parallelized(docs)
      .select(col("doc_id"), col("text"))
    val words = filter(split(col("text"), "[ \\t\\n\\x0B\\f\\r]+"),
      x => length(x) > 0)
    def grams(n: Int): Column =
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - lit(n)),
          i => array_join(slice(words, i + lit(1), lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    val denomBase = base.select(col("doc_id"),
      size(words).cast("long").as("n_words"),
      length(array_join(words, " ")).cast("long").as("denom"))
    val lineAgg = base
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("l"))
      .groupBy(col("doc_id"), col("l"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_lines"),
        sum(when(col("c") >= 2L, col("c")).otherwise(0L))
          .as("dup_lines"),
        sum(col("c") * length(col("l"))).as("line_chars"),
        sum(when(col("c") >= 2L, col("c") * length(col("l")))
          .otherwise(0L)).as("dup_line_chars"))
    val top2 = base
      .select(col("doc_id"), explode(grams(2)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("c"), col("g"))).as("top"))
      .select(col("doc_id"),
        (col("top.c") * length(col("top.g"))).as("top2_chars"))
    val dup5 = base
      .select(col("doc_id"), explode(grams(5)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("c") >= 2L, col("c") * length(col("g")))
        .otherwise(0L)).as("dup5_chars"))
    denomBase
      .join(lineAgg, Seq("doc_id"), "left")
      .join(top2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_lines"),
        coalesce(col("dup_lines"), lit(0L)).as("dup_lines"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("dup5_chars"), lit(0L)).as("dup5_chars"),
        when(col("n_lines") > 0L,
          coalesce(col("dup_lines"), lit(0L)).cast("double") /
            col("n_lines").cast("double")).as("dup_line_frac"),
        when(col("line_chars") > 0L,
          coalesce(col("dup_line_chars"), lit(0L)).cast("double") /
            col("line_chars").cast("double")).as("dup_line_char_frac"),
        when(col("denom") > 0L && col("top2_chars").isNotNull,
          col("top2_chars").cast("double") / col("denom").cast("double"))
          .as("top_2gram_char_frac"),
        when(col("denom") > 0L && col("n_words") >= 5L,
          coalesce(col("dup5_chars"), lit(0L)).cast("double") /
            col("denom").cast("double")).as("dup_5gram_char_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[repetitionCoverage]] — identical splits, gram
    * construction, tie-break, and chain order. */
  def repetitionCoverageSql(): String =
    s"""WITH base AS (
       | SELECT doc_id, text,
       |  list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
       |    x -> len(x) > 0) AS w
       | FROM documents),
       |den AS (
       | SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |  CAST(len(array_to_string(w, ' ')) AS BIGINT) AS denom
       | FROM base),
       |la AS (
       | SELECT doc_id,
       |  CAST(SUM(c) AS BIGINT) AS n_lines,
       |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
       |   AS dup_lines,
       |  CAST(SUM(c * len(l)) AS BIGINT) AS line_chars,
       |  CAST(SUM(CASE WHEN c >= 2 THEN c * len(l) ELSE 0 END)
       |    AS BIGINT) AS dup_line_chars
       | FROM (
       |  SELECT doc_id, l, count(*) AS c
       |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
       |        FROM base)
       |  GROUP BY 1, 2)
       | GROUP BY 1),
       |g2 AS (
       | SELECT doc_id, max({'c': c, 'g': g}) AS top
       | FROM (
       |  SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN
       |     list_transform(generate_series(1, len(w) - 1),
       |       i -> array_to_string(w[i:i+1], ' '))
       |    ELSE [] END) AS g FROM base)
       |  GROUP BY 1, 2)
       | GROUP BY 1),
       |g5 AS (
       | SELECT doc_id,
       |  CAST(SUM(CASE WHEN c >= 2 THEN c * len(g) ELSE 0 END)
       |    AS BIGINT) AS dup5_chars
       | FROM (
       |  SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 5 THEN
       |     list_transform(generate_series(1, len(w) - 4),
       |       i -> array_to_string(w[i:i+4], ' '))
       |    ELSE [] END) AS g FROM base)
       |  GROUP BY 1, 2)
       | GROUP BY 1)
       |SELECT d.doc_id, d.n_words, la.n_lines,
       | COALESCE(la.dup_lines, 0) AS dup_lines,
       | COALESCE(CAST(g2.top.c * len(g2.top.g) AS BIGINT), 0)
       |  AS top2_chars,
       | COALESCE(g5.dup5_chars, 0) AS dup5_chars,
       | CASE WHEN la.n_lines > 0 THEN
       |  CAST(COALESCE(la.dup_lines, 0) AS DOUBLE)
       |   / CAST(la.n_lines AS DOUBLE) END AS dup_line_frac,
       | CASE WHEN la.line_chars > 0 THEN
       |  CAST(COALESCE(la.dup_line_chars, 0) AS DOUBLE)
       |   / CAST(la.line_chars AS DOUBLE) END AS dup_line_char_frac,
       | CASE WHEN d.denom > 0 AND g2.top.c IS NOT NULL THEN
       |  CAST(CAST(g2.top.c * len(g2.top.g) AS BIGINT) AS DOUBLE)
       |   / CAST(d.denom AS DOUBLE) END AS top_2gram_char_frac,
       | CASE WHEN d.denom > 0 AND d.n_words >= 5 THEN
       |  CAST(COALESCE(g5.dup5_chars, 0) AS DOUBLE)
       |   / CAST(d.denom AS DOUBLE) END AS dup_5gram_char_frac
       |FROM den d
       |LEFT JOIN la USING (doc_id)
       |LEFT JOIN g2 USING (doc_id)
       |LEFT JOIN g5 USING (doc_id)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
}
