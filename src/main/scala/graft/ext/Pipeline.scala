package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus assembly operators (north-star extensions, builder
  * brief): the steps BETWEEN a filtered/deduped document set and actual
  * training batches — sequence packing, mixture (epoch-weighted) sampling,
  * train/eval decontamination, embedding quantization. Each has a
  * bit-exact DuckDB twin for the correctness gate.
  *
  * Scale stance shared by every operator here:
  *  - all decisions are pure deterministic functions of the row (id
  *    hashes, literal weights) — no RNG, no driver state, so results are
  *    stable across runs, partitionings, and cluster sizes;
  *  - the only non-map-side construct is the per-shard packing window,
  *    whose parallelism is the shard count — an explicit, user-scaled
  *    parameter (exactly how per-worker packing runs in production
  *    loaders), not a hidden global funnel.
  */
object Pipeline {

  // ------------------------------------------------------ sequence packing

  /** Concat-and-chunk sequence packing (the GPT-style pre-training layout):
    * documents are concatenated in a deterministic order and cut every
    * `seqLen` tokens; a document therefore lands in sequences
    * `[first_seq, last_seq]` of its shard, starting at `start_off` tokens
    * into the stream.
    *
    * Sharding: `doc_id % nShards` splits the corpus into independent
    * token streams packed in parallel — the window cumsum runs per shard,
    * so per-task work is corpus/nShards and scaling is a parameter bump
    * (production loaders pack per data-parallel worker the same way).
    * Empty documents (0 tokens) are dropped — they occupy no tokens.
    *
    * All outputs are integers derived from an integer cumsum; token
    * counts stay below 2^53 per shard by construction (a shard would need
    * ~9e15 tokens to overflow the double-division rounding), so
    * `floor(x / seqLen)` is bit-trivial in both engines. */
  def packSequences(docs: DataFrame, seqLen: Int = 512,
      nShards: Int = 8): DataFrame = {
    val toks = TextOps.tokenCount(col("text")).cast("long")
    val w = Window.partitionBy("shard").orderBy("doc_id")
    docs
      .select(col("doc_id"), (col("doc_id") % nShards).as("shard"),
        toks.as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        floor((col("cum") - col("n_tokens")) / seqLen).cast("long")
          .as("first_seq"),
        floor((col("cum") - 1) / seqLen).cast("long").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  def packSequencesSql(seqLen: Int = 512, nShards: Int = 8): String =
    s"""SELECT doc_id, shard, n_tokens,
       | CAST(cum - n_tokens AS BIGINT) AS start_off,
       | CAST(floor((cum - n_tokens) / $seqLen) AS BIGINT) AS first_seq,
       | CAST(floor((cum - 1) / $seqLen) AS BIGINT) AS last_seq,
       | CAST(floor((cum - 1) / $seqLen) AS BIGINT)
       |  - CAST(floor((cum - n_tokens) / $seqLen) AS BIGINT) + 1 AS n_seqs
       |FROM (
       | SELECT doc_id, shard, n_tokens,
       |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       | FROM (SELECT doc_id, doc_id % $nShards AS shard,
       |   CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens
       |  FROM documents)
       | WHERE n_tokens > 0)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  /** Per-training-sequence manifest — the inverse view of
    * [[packSequences]]: one row per (shard, seq) with how many documents
    * contribute tokens to that sequence and how many tokens land in it
    * (= `seqLen` everywhere except each shard's final partial sequence —
    * the integrity property a loader checks before building batches).
    * A document spanning several sequences contributes its clipped token
    * range to each: `min(end, (seq+1)·L) − max(start, seq·L)`.
    *
    * Scale shape: the explode fans each doc out to its (few) spanned
    * sequences; the aggregation shuffles on (shard, seq) — bounded keys,
    * no funnel beyond the packing window itself. All-integer outputs. */
  def packManifest(docs: DataFrame, seqLen: Int = 512,
      nShards: Int = 8): DataFrame =
    packSequences(docs, seqLen, nShards)
      .select(col("shard"), col("start_off"),
        (col("start_off") + col("n_tokens")).as("end_off"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq"))
      .groupBy("shard", "seq")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("end_off"), (col("seq") + 1) * seqLen) -
          greatest(col("start_off"), col("seq") * seqLen)).as("n_tokens"))

  def packManifestSql(seqLen: Int = 512, nShards: Int = 8): String =
    // stripSuffix, NOT replace: the window's own `ORDER BY doc_id` (the
    // cumsum ordering!) contains the same text as the trailing output sort
    s"""WITH packed AS (
       | ${packSequencesSql(seqLen, nShards).stripSuffix("ORDER BY doc_id")}),
       |spans AS (SELECT shard, start_off,
       |  start_off + n_tokens AS end_off,
       |  unnest(generate_series(first_seq, last_seq)) AS seq
       | FROM packed)
       |SELECT shard, seq, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(least(end_off, (seq + 1) * $seqLen)
       |   - greatest(start_off, seq * $seqLen)) AS BIGINT) AS n_tokens
       |FROM spans GROUP BY shard, seq
       |ORDER BY shard, seq""".stripMargin.replace('\n', ' ')

  /** Materialize the packed corpus as loader-ready training shards: one
    * parquet directory per shard (`shard=N/`, Hive-partitioned so a
    * loader — or any engine — prunes to its shard without listing the
    * rest), rows sorted by `doc_id` INSIDE each file, which is exactly
    * the cumsum order of [[packSequences]] — a loader streams the file
    * and reconstructs the token stream with no further sort.
    *
    * Scale shape: `repartition(shard)` routes each shard to one writer
    * task (the per-shard file is the unit a data-parallel worker maps),
    * `sortWithinPartitions` is a local sort of one shard, and the write
    * is parallel across shards. Returns the written row count. */
  def writePackedShards(docs: DataFrame, dir: String, seqLen: Int = 512,
      nShards: Int = 8): Long = {
    val packed = packSequences(docs, seqLen, nShards)
    packed
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(dir)
    packed.sparkSession.read.parquet(dir).count()
  }

  /** Shard count as a function of corpus size (the packing analog of
    * `Similarity.planesFor`): each shard's cumsum window is one ordered
    * task, so shards must grow with total tokens to bound per-task work.
    * Default bound ≈ 100M tokens/shard — minutes of window work, far
    * under any executor memory limit (the window state is one running
    * sum). */
  def shardsFor(totalTokens: Long,
      tokensPerShard: Long = 100L * 1000 * 1000): Int =
    math.max(8, math.ceil(
      totalTokens.toDouble / tokensPerShard.toDouble).toInt)

  // ------------------------------------------------- mixture / epoch sampling

  /** Epoch-weighted mixture sampling: each source gets a mixture weight
    * `w` — a document from that source appears `floor(w)` times plus one
    * more with probability `frac(w)`, decided by the same deterministic
    * md5-order membership as [[TextOps.hashKeep]] (no RNG; the fractional
    * epoch is a stable document subset, so two runs — or two cluster
    * sizes — build the SAME corpus). This is the standard "dataset X for
    * 2.3 epochs, dataset Y downweighted to 0.4" pre-training mix knob.
    *
    * Pure map-side: a literal CASE over sources plus an explode of
    * `sequence(0, n_copies-1)` — no shuffle, no driver state. Output one
    * row per (doc, copy). */
  def mixtureSample(docs: DataFrame, weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0): DataFrame = {
    def copies(wt: Double): Column = {
      val whole = math.floor(wt).toLong
      val frac = wt - math.floor(wt)
      lit(whole) +
        when(TextOps.hashKeep(col("doc_id"), frac), 1L).otherwise(0L)
    }
    val n = weights.foldRight(copies(defaultWeight)) {
      case ((src, wt), acc) =>
        when(col("source") === src, copies(wt)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"), n.as("n_copies"))
      .where(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"))
  }

  def mixtureSampleSql(weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0): String = {
    def copies(wt: Double): String = {
      val whole = math.floor(wt).toLong
      val frac = wt - math.floor(wt)
      s"$whole + CASE WHEN ${TextOps.hashKeepSql("doc_id", frac)} " +
        "THEN 1 ELSE 0 END"
    }
    val cases = weights.foldRight(copies(defaultWeight)) {
      case ((src, wt), acc) =>
        s"CASE WHEN source = '${src.replace("'", "''")}' " +
          s"THEN ${copies(wt)} ELSE $acc END"
    }
    s"""SELECT doc_id, source, n_copies,
       | unnest(generate_series(0, n_copies - 1)) AS copy
       |FROM (SELECT doc_id, source, CAST($cases AS BIGINT) AS n_copies
       | FROM documents)
       |WHERE n_copies > 0
       |ORDER BY doc_id, copy""".stripMargin.replace('\n', ' ')
  }

  // --------------------------------------------------- shared gram stream

  /** Non-distinct word n-gram stream (doc_id, g) — ONE definition shared
    * by [[decontaminate]] and [[dupSpans]] so the tokenization (trim,
    * lower, `\s+` split, slice/join) can never drift between the two
    * gates. `TextOps.repetition` and `Dedup.shingles` keep their own
    * variants deliberately (distinct + repartition semantics differ). */
  private[graft] def gramStream(df: DataFrame, n: Int): DataFrame = {
    val ws = split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")
    df.select(col("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " "))).as("g"))
  }

  /** DuckDB twin of [[gramStream]]: a full SELECT producing (doc_id, g),
    * NULL lead-tails already filtered. */
  private def gramStreamSql(n: Int): String = {
    val parts = (0 until n).map {
      case 0 => "w"
      case i => s"lead(w, $i) OVER (PARTITION BY doc_id ORDER BY pos)"
    }.mkString(" || ' ' || ")
    s"""SELECT doc_id, g FROM (
       | SELECT doc_id, $parts AS g FROM (
       |  SELECT doc_id,
       |   unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w,
       |   generate_subscripts(
       |     regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |  FROM documents))
       |WHERE g IS NOT NULL""".stripMargin
  }

  // ------------------------------------------------------- decontamination

  /** Train/eval overlap (decontamination) check: the benchmark set is the
    * deterministic slice `doc_id % evalMod == 0`; every OTHER document is
    * scored by how many distinct word `n`-grams it shares with any
    * benchmark document. Rows come back only for hits ≥ 1 — the
    * contamination report a pipeline acts on (drop or flag before
    * training).
    *
    * Scale shape: the benchmark gram set is corpus/evalMod and deduped, so
    * the equi-join on the gram key broadcasts in practice; the train side
    * is the same one-explode gram stream as [[TextOps.repetition]]. No
    * all-pairs document comparison anywhere. */
  def decontaminate(docs: DataFrame, n: Int = 3,
      evalMod: Int = 97): DataFrame =
    decontaminate(docs.where(col("doc_id") % evalMod =!= 0),
      docs.where(col("doc_id") % evalMod === 0), n)

  /** The production shape: the eval/benchmark suite is an EXTERNAL table
    * (`(doc_id, text)`-shaped), not a slice of the corpus — pass any
    * DataFrame with a `text` column as `evalDocs`. The `evalMod` overload
    * above (the oracle-gated case) is this with the deterministic
    * `doc_id % evalMod` slice as the eval set and the rest as the train
    * side. Scale shape unchanged: the eval gram set is small and deduped
    * → broadcast; the train side streams one gram explode. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
      n: Int): DataFrame = {
    val evalGrams = gramStream(
      evalDocs.select(col("doc_id"), col("text")), n)
      .select("g").distinct()
    gramStream(docs, n).join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("hits"))
  }

  def decontaminateSql(n: Int = 3, evalMod: Int = 97): String =
    s"""WITH grams AS (${gramStreamSql(n)}),
       |eval AS (SELECT DISTINCT g FROM grams WHERE doc_id % $evalMod = 0),
       |train AS (SELECT doc_id, g FROM grams
       |  WHERE doc_id % $evalMod <> 0)
       |SELECT t.doc_id, count(DISTINCT t.g) AS hits
       |FROM train t JOIN eval e ON t.g = e.g
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
      .replace('\n', ' ')

  // ------------------------------------------- cross-doc duplicated spans

  /** Cross-document duplicated-span signal (the exact-substring dedup
    * family, "Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022 — restated at word-`n`-gram granularity): a span is
    * "duplicated" when the SAME n-gram occurs in at least `minDocs`
    * DISTINCT documents (internal repeats within one doc do NOT count —
    * that is [[TextOps.repetition]]'s signal). Per document: total spans,
    * duplicated spans, and the duplicated fraction — the standard
    * drop/trim criterion before training.
    *
    * Scale shape: one (gram → distinct-doc-count) aggregation, one
    * equi-join of the gram stream back to the flagged grams, one per-doc
    * aggregation — all shuffles on gram/doc keys with bounded fan-out; no
    * pair materialization (contrast suffix-array builds: this is the
    * shuffle-native restatement that scales to 100 TB). */
  def dupSpans(docs: DataFrame, n: Int = 5, minDocs: Int = 2): DataFrame = {
    // ONE gram-stream pass (the dupProfile treatment): the old shape
    // aggregated the stream into a dup-gram list and joined the stream
    // against it — two corpus explodes per invocation. Two-level
    // aggregation: per-(g, doc) occurrence counts, per-g ndocs via a
    // g-keyed window over that REDUCED table, then the per-doc rollup.
    // n_dup_spans is unchanged — occurrences of grams seen in ≥
    // minDocs distinct docs.
    val per = gramStream(docs, n).groupBy("g", "doc_id")
      .agg(count(lit(1)).as("_c"))
    per
      .withColumn("_ndocs",
        count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(sum(col("_c")).as("n_spans"),
        sum(when(col("_ndocs") >= minDocs, col("_c")).otherwise(0L))
          .as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans"))
          .as("dup_frac"))
  }

  def dupSpansSql(n: Int = 5, minDocs: Int = 2): String =
    s"""WITH grams AS (${gramStreamSql(n)}),
       |dup AS (SELECT g FROM grams
       | GROUP BY g HAVING count(DISTINCT doc_id) >= $minDocs)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       | CAST(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_dup_spans,
       | CAST(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |  / count(*) AS dup_frac
       |FROM grams g LEFT JOIN dup d ON g.g = d.g
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin
      .replace('\n', ' ')

  /** [[gramStream]] with the gram's 1-based START POSITION — the offsets
    * the maximal-span merge below coalesces over. */
  private def gramStreamPos(df: DataFrame, n: Int): DataFrame = {
    val ws = split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")
    df.select(col("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " "))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("g"))
  }

  /** MAXIMAL duplicated spans (VERDICT r7 #3) — [[dupSpans]] coalesced to
    * the span form Lee et al.'s exact-substring output reports: adjacent
    * duplicated n-grams (start positions differing by 1) merge into one
    * maximal island per document, emitted as
    * `(doc_id, span_start, span_end, span_words, n_grams)` in word
    * coordinates (`span_end = last island gram's start + n − 1`, the last
    * word the span covers). A run of k overlapping duplicated grams is
    * ONE span of k+n−1 words, not k separate signals — the unit a
    * trim/drop pass actually cuts.
    *
    * Scale shape: the gram-frequency aggregation and the equi-join back
    * are [[dupSpans]]'s; the merge itself is gaps-and-islands over gram
    * offsets (`pos − row_number()` per doc — the `missing_ranges`
    * pattern, `TimeBars.scala:133`), a per-document window whose
    * partition is the doc's own duplicated-gram count: shuffle-native,
    * no pair materialization, no driver state. */
  def dupSpansMerged(docs: DataFrame, n: Int = 5,
      minDocs: Int = 2): DataFrame = {
    // ONE gram-stream pass (the dupSpans treatment): ndocs per gram is
    // computed over the stream itself with two g-keyed windows (a
    // dense_rank over doc_id, then its per-g max — one shuffle+sort,
    // no dup-gram list, no join, no second corpus explode). The hit
    // set is unchanged: positions of grams in ≥ minDocs distinct docs.
    val g = gramStreamPos(docs, n)
    val byG = Window.partitionBy("g")
    val hits = g
      .withColumn("_dr",
        dense_rank().over(byG.orderBy("doc_id")))
      .withColumn("_ndocs", max(col("_dr")).over(byG))
      .where(col("_ndocs") >= minDocs)
      .select("doc_id", "pos")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_words"),
        col("n_grams"))
  }

  /** DuckDB twin of [[gramStreamPos]]. */
  private def gramStreamPosSql(n: Int): String = {
    val parts = (0 until n).map {
      case 0 => "w"
      case i => s"lead(w, $i) OVER (PARTITION BY doc_id ORDER BY pos)"
    }.mkString(" || ' ' || ")
    s"""SELECT doc_id, pos, g FROM (
       | SELECT doc_id, CAST(pos AS BIGINT) AS pos, $parts AS g FROM (
       |  SELECT doc_id,
       |   unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w,
       |   generate_subscripts(
       |     regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |  FROM documents))
       |WHERE g IS NOT NULL""".stripMargin
  }

  def dupSpansMergedSql(n: Int = 5, minDocs: Int = 2): String =
    s"""WITH gramsp AS (${gramStreamPosSql(n)}),
       |dup AS (SELECT g FROM gramsp
       | GROUP BY g HAVING count(DISTINCT doc_id) >= $minDocs),
       |hits AS (SELECT gp.doc_id, gp.pos FROM gramsp gp
       | JOIN dup d ON gp.g = d.g),
       |isl AS (SELECT doc_id, pos,
       | pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       | FROM hits)
       |SELECT doc_id, min(pos) AS span_start,
       | max(pos) + ${n - 1} AS span_end,
       | max(pos) + ${n - 1} - min(pos) + 1 AS span_words,
       | CAST(count(*) AS BIGINT) AS n_grams
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin.replace('\n', ' ')

  // ------------------------------------------------ embedding quantization

  /** Per-vector symmetric int8 quantization of an embedding column — the
    * storage/serving compression step (8× smaller than float32, the
    * common layout ANN services and vector stores ingest):
    * `scale = amax/127`, `q_i = floor(x_i·127/amax + 0.5)` (round half
    * up, identical in both engines — no round-half-even ambiguity).
    *
    * Emits integer-exact summaries (`qsum`, `ql1`, `qmin`, `qmax`): each
    * `q_i` is an integer-valued double with |q_i| ≤ 127, so their sums are
    * exact and ORDER-INDEPENDENT — the gate needs no float tolerance and
    * no fold-order pinning. `amax` itself is one float read back as an
    * exact double (cast is value-preserving). Zero vectors quantize to
    * all-zero (guarded, no 0/0). Pure map-side higher-order expressions —
    * no UDF, no shuffle. */
  def quantizeEmbeddings(embs: DataFrame): DataFrame = {
    val amax = array_max(transform(col("embedding"),
      x => abs(x.cast("double"))))
    def q(x: Column): Column =
      when(col("amax") === 0d, 0d)
        .otherwise(floor(x.cast("double") * 127d / col("amax") + 0.5d))
    embs
      .select(col("vec_id"), col("embedding"), amax.as("amax"))
      .withColumn("q", transform(col("embedding"), x => q(x)))
      .select(col("vec_id"), col("amax"),
        aggregate(col("q"), lit(0d), (acc, x) => acc + x).cast("long")
          .as("qsum"),
        aggregate(col("q"), lit(0d), (acc, x) => acc + abs(x)).cast("long")
          .as("ql1"),
        array_min(col("q")).cast("long").as("qmin"),
        array_max(col("q")).cast("long").as("qmax"))
  }

  val quantizeEmbeddingsSql: String =
    """SELECT vec_id, amax,
      | CAST(list_sum(q) AS BIGINT) AS qsum,
      | CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS ql1,
      | CAST(list_min(q) AS BIGINT) AS qmin,
      | CAST(list_max(q) AS BIGINT) AS qmax
      |FROM (
      | SELECT vec_id, amax,
      |  list_transform(embedding, x -> CASE WHEN amax = 0 THEN 0.0
      |    ELSE floor(CAST(x AS DOUBLE) * 127 / amax + 0.5) END) AS q
      | FROM (
      |  SELECT vec_id, embedding,
      |   list_max(list_transform(embedding,
      |     x -> abs(CAST(x AS DOUBLE)))) AS amax
      |  FROM embeddings))
      |ORDER BY vec_id""".stripMargin.replace('\n', ' ')

  // ------------------------------------------------------ corpus curation

  /** Deterministic per-source document ordering — the shared sort key of
    * [[sourceCap]] and [[tokenBudget]]: md5 of the doc id (the same
    * portable hash as [[TextOps.hashKeep]]), id tiebreak. "First K docs"
    * / "first B tokens" of a source is then a STABLE subset across runs,
    * partitionings, and cluster sizes — no RNG, no sampling drift between
    * pipeline reruns. */
  private def sourceOrder: Seq[Column] =
    Seq(md5(col("doc_id").cast("string")), col("doc_id"))

  private val sourceOrderSql = "md5(CAST(doc_id AS VARCHAR)), doc_id"

  /** Per-source document cap (the RefinedWeb-family domain-balancing
    * step): keep at most `k` documents per source, chosen in the
    * deterministic md5 order — stops any single domain/source from
    * dominating the mixture regardless of its crawl volume.
    *
    * Scale shape: one window keyed on `source` — a key-bounded shuffle,
    * one ordered task per source (the same accepted shape as the
    * per-symbol folds). The heaviest domain bounds the task: its docs
    * sort once even though only k survive; if one source is a large
    * fraction of the whole corpus, pre-thin it with
    * [[TextOps.stratifiedSample]] (map-side) before capping. */
  def sourceCap(docs: DataFrame, k: Int = 100): DataFrame = {
    val w = Window.partitionBy("source").orderBy(sourceOrder: _*)
    docs.select(col("doc_id"), col("source"))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .where(col("rank_in_source") <= k)
  }

  def sourceCapSql(k: Int = 100): String =
    s"""SELECT doc_id, source, rank_in_source FROM (
       | SELECT doc_id, source, row_number() OVER (
       |   PARTITION BY source ORDER BY $sourceOrderSql) AS rank_in_source
       | FROM documents)
       |WHERE rank_in_source <= $k
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  /** Per-source token budget ("take the first B tokens of every source"
    * — the budgeted-mixture step when the mix is specified in tokens, as
    * pre-training mixes are): documents accumulate in the deterministic
    * md5 order and a source stops contributing once its cumulative token
    * count passes `budget`. A document is kept iff it FITS ENTIRELY
    * within the remaining budget (the loader-friendly convention — no
    * mid-document truncation here; packing handles intra-doc cuts).
    *
    * All-integer cumsum → exact in both engines (the window sum output is
    * CAST BIGINT in the twin — DuckDB types it HUGEINT otherwise). Same
    * key-bounded per-source window as [[sourceCap]]. */
  def tokenBudget(docs: DataFrame, budget: Long = 5000L): DataFrame = {
    val w = Window.partitionBy("source").orderBy(sourceOrder: _*)
    docs
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budget)
  }

  def tokenBudgetSql(budget: Long = 5000L): String =
    s"""SELECT doc_id, source, n_tokens,
       | CAST(cum_tokens AS BIGINT) AS cum_tokens FROM (
       | SELECT doc_id, source, n_tokens, sum(n_tokens) OVER (
       |   PARTITION BY source ORDER BY $sourceOrderSql) AS cum_tokens
       | FROM (SELECT doc_id, source,
       |   CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens
       |  FROM documents))
       |WHERE cum_tokens <= $budget
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  /** Per-document PROVENANCE record — the audit artifact a compliance
    * or data-governance review asks for (the Dolma-style "why is this
    * document in/out" ledger): every curation stage's verdict on every
    * document in one row, plus the composed keep decision and the FIRST
    * failing stage as a drop reason. Stages report INDEPENDENTLY (each
    * judges the full corpus, not the previous stage's survivors) — the
    * attribution stance: "which gates would this doc fail", not "which
    * gate happened to fire first in one particular sequencing".
    *
    * Composition only — quality cascade, exact-dup keeper, eval-slice
    * membership, n-gram contamination, token budget are each the
    * already-gated operator; the provenance joins are all on doc_id
    * (one shuffle key) with the md5 keeper join on the text hash. */
  def provenance(docs: DataFrame, budget: Long = 5000L, n: Int = 3,
      evalMod: Int = 97): DataFrame = {
    val qf = TextOps.qualityFilter(docs)
      .select(col("doc_id"), col("len_ok"), col("rep_ok"),
        col("toklen_ok"), col("keep").as("keep_quality"))
    val ex = docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
      .join(Dedup.exactDedup(docs), "text_hash")
      .select(col("doc_id"),
        (col("doc_id") === col("keeper")).as("is_keeper"))
    val dc = decontaminate(docs, n, evalMod)
    val tb = tokenBudget(docs, budget)
      .select(col("doc_id"), lit(true).as("in_budget0"))
    docs.select(col("doc_id"), col("source"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .join(qf, "doc_id").join(ex, "doc_id")
      .join(dc, Seq("doc_id"), "left").join(tb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("len_ok"), col("rep_ok"), col("toklen_ok"),
        col("keep_quality"), col("is_keeper"),
        (col("doc_id") % evalMod === 0).as("eval_slice"),
        coalesce(col("hits"), lit(0L)).as("contam_hits"),
        coalesce(col("in_budget0"), lit(false)).as("in_budget"))
      .withColumn("kept",
        !col("eval_slice") && col("is_keeper") && col("keep_quality") &&
          col("contam_hits") === 0 && col("in_budget"))
      .withColumn("drop_reason",
        when(col("eval_slice"), "eval_slice")
          .when(!col("is_keeper"), "duplicate")
          .when(!col("keep_quality"), "quality")
          .when(col("contam_hits") > 0, "contaminated")
          .when(!col("in_budget"), "budget")
          .otherwise(lit(null).cast("string")))
  }

  def provenanceSql(budget: Long = 5000L, n: Int = 3,
      evalMod: Int = 97): String =
    s"""WITH qf AS (
       | ${TextOps.qualityFilterSql().replace(" ORDER BY q.doc_id", "")}),
       |ex AS ($exactDedupNoOrder),
       |dc AS (SELECT * FROM (
       |  ${decontaminateSql(n, evalMod).replace(" ORDER BY t.doc_id", "")})),
       |tb AS (SELECT doc_id FROM (
       |  ${tokenBudgetSql(budget).replace(" ORDER BY doc_id", "")})),
       |base AS (SELECT doc_id, source, lang,
       |  CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens,
       |  md5(text) AS text_hash FROM documents),
       |flat AS (SELECT b.doc_id, b.source, b.lang, b.n_tokens,
       |  q.len_ok, q.rep_ok, q.toklen_ok, q.keep AS keep_quality,
       |  b.doc_id = e.keeper AS is_keeper,
       |  (b.doc_id % $evalMod = 0) AS eval_slice,
       |  CAST(coalesce(d.hits, 0) AS BIGINT) AS contam_hits,
       |  (t.doc_id IS NOT NULL) AS in_budget
       | FROM base b
       | JOIN qf q ON q.doc_id = b.doc_id
       | JOIN ex e ON e.text_hash = b.text_hash
       | LEFT JOIN dc d ON d.doc_id = b.doc_id
       | LEFT JOIN tb t ON t.doc_id = b.doc_id)
       |SELECT *,
       | (NOT eval_slice AND is_keeper AND keep_quality
       |   AND contam_hits = 0 AND in_budget) AS kept,
       | CASE WHEN eval_slice THEN 'eval_slice'
       |  WHEN NOT is_keeper THEN 'duplicate'
       |  WHEN NOT keep_quality THEN 'quality'
       |  WHEN contam_hits > 0 THEN 'contaminated'
       |  WHEN NOT in_budget THEN 'budget'
       |  ELSE NULL END AS drop_reason
       |FROM flat ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  private def exactDedupNoOrder: String =
    Dedup.exactDedupSql.replace(" ORDER BY 1", "")

  /** Duplication profile — corpus-level duplicated-gram mass as a
    * FUNCTION of gram size: one row per probed `n` with total grams,
    * cross-doc duplicated grams, and the duplicated fraction. This is
    * the dial-choosing curve for the span-dedup family ([[dupSpans]]
    * runs at ONE n; choosing that n blind is guesswork — short grams
    * overcount coincidental overlap, long grams miss real boilerplate;
    * the profile shows where the knee is). Each probe is the dupSpans
    * corpus aggregate; probes are independent single-pass aggregations
    * unioned into one bounded table. */
  def dupProfile(docs: DataFrame, ns: Seq[Int] = Seq(3, 5, 8),
      minDocs: Int = 2): DataFrame =
    ns.map { n =>
      // ONE pass per probed n: the old shape aggregated the gram
      // stream into a dup-gram list and then JOINED the stream against
      // it — Catalyst does not dedupe the shared subtree, so each
      // probe exploded the corpus twice. Two-level aggregation gives
      // the same counts with no join and no second scan: per-(g,doc)
      // occurrence counts, then per-g (total, ndocs), then the probe
      // totals — every level partial/map-side (guide §2.3). n_dup is
      // unchanged: the occurrence count of grams seen in ≥ minDocs
      // docs, exactly what the old left-join 0/1 sum counted.
      val per = gramStream(docs, n).groupBy("g", "doc_id")
        .agg(count(lit(1)).as("_c"))
      per.groupBy("g")
        .agg(sum(col("_c")).as("_cg"), count(lit(1)).as("_ndocs"))
        .agg(sum(col("_cg")).as("n_grams"),
          sum(when(col("_ndocs") >= minDocs, col("_cg"))
            .otherwise(0L)).as("n_dup"))
        .select(lit(n.toLong).as("n"), col("n_grams"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_grams").cast("double"))
            .as("dup_frac"))
    }.reduce(_ union _)

  def dupProfileSql(ns: Seq[Int] = Seq(3, 5, 8),
      minDocs: Int = 2): String = {
    val per = ns.map { n =>
      s"""SELECT CAST($n AS BIGINT) AS n,
         | CAST(count(*) AS BIGINT) AS n_grams,
         | CAST(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_dup,
         | CAST(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END)
         |   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM (${gramStreamSql(n)}) g
         |LEFT JOIN (SELECT g FROM (${gramStreamSql(n)})
         |  GROUP BY g HAVING count(DISTINCT doc_id) >= $minDocs) d
         | ON g.g = d.g""".stripMargin
    }.mkString(" UNION ALL ")
    s"SELECT * FROM ($per) ORDER BY n".replace('\n', ' ')
  }

  /** Per-source content checksum — the transfer-integrity manifest
    * (did every document survive the copy between clusters/snapshots,
    * without shipping the text back): an ORDER-INDEPENDENT additive
    * checksum of per-doc md5 prefixes, reduced mod 2^31−1 for a
    * fixed-width comparable. Addition commutes, so any partitioning /
    * shuffle order yields the same value — comparable across engines,
    * clusters, and runs; the internal sum runs over decimal so no
    * corpus size wraps it. Collision odds for an accidental mismatch
    * to go unnoticed are ~2^-31 per source — an integrity audit, not a
    * cryptographic commitment. */
  def corpusChecksum(docs: DataFrame): DataFrame =
    graft.functions.parallelized(docs)
      .select(col("source"),
        conv(substring(md5(col("text")), 1, 8), 16, 10)
          .cast("decimal(38,0)").as("h"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        (sum(col("h")) % 2147483647L).cast("long").as("checksum"))

  def corpusChecksumSql(): String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(length(text)) AS BIGINT) AS n_chars,
       | CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
       |   % 2147483647 AS BIGINT) AS checksum
       |FROM documents GROUP BY source
       |ORDER BY source""".stripMargin.replace('\n', ' ')

  /** Strided sliding-window packing manifest — the long-context
    * alternative to [[packSequences]]' concat-and-chunk: each document
    * yields overlapping windows `[k·stride, k·stride + seqLen)` (the
    * overlap preserves cross-boundary context that hard chunking
    * destroys — the standard long-doc training prep). Short docs yield
    * exactly one window; the last window clips to the document end.
    * Pure integer arithmetic + one sequence explode — map-side,
    * embarrassingly parallel over docs, zero shuffle. */
  def packStrided(docs: DataFrame, seqLen: Int = 128,
      stride: Int = 64): DataFrame = {
    require(stride > 0 && seqLen >= stride,
      "stride must be positive and no larger than seqLen")
    graft.functions.parallelized(docs)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("nt"))
      .withColumn("n_win", when(col("nt") <= seqLen, 1L)
        .otherwise(lit(1L) +
          expr(s"(nt - $seqLen + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("nt"),
        explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx") * stride).as("start_tok"),
        least(col("win_idx") * stride + seqLen, col("nt")).as("end_tok"))
      .withColumn("n_tokens", col("end_tok") - col("start_tok"))
  }

  def packStridedSql(seqLen: Int = 128, stride: Int = 64): String =
    s"""WITH d AS (SELECT doc_id,
       |  CAST(${TextOps.tokenCountSql} AS BIGINT) AS nt FROM documents),
       |w AS (SELECT doc_id, nt,
       |  CASE WHEN nt <= $seqLen THEN 1
       |   ELSE 1 + (nt - $seqLen + ${stride - 1}) // $stride END
       |  AS n_win FROM d),
       |x AS (SELECT doc_id, nt,
       |  unnest(generate_series(0, n_win - 1)) AS win_idx FROM w)
       |SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
       | CAST(win_idx * $stride AS BIGINT) AS start_tok,
       | CAST(least(win_idx * $stride + $seqLen, nt) AS BIGINT)
       |  AS end_tok,
       | CAST(least(win_idx * $stride + $seqLen, nt) - win_idx * $stride
       |  AS BIGINT) AS n_tokens
       |FROM x ORDER BY doc_id, win_idx""".stripMargin.replace('\n', ' ')

  /** Corpus snapshot diff — the crawl-to-crawl churn report (what a
    * data lead reads before re-training on a refreshed snapshot): per
    * source, how many documents were ADDED, REMOVED, MODIFIED (same id,
    * different content hash), or carried UNCHANGED, plus the token
    * delta. Full outer join on doc_id with md5 content comparison —
    * one doc-keyed shuffle per side, per-source rollup is bounded.
    *
    * The oracle gate derives two snapshots from the one documents table
    * deterministically (id-residue membership + a marker edit), so both
    * engines diff identical inputs; the operator takes ANY two
    * `(doc_id, source, text)` relations. */
  def corpusDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ax = a.select(col("doc_id"), col("source").as("src_a"),
      md5(col("text")).as("ha"),
      TextOps.tokenCount(col("text")).cast("long").as("ta"))
    val bx = b.select(col("doc_id"), col("source").as("src_b"),
      md5(col("text")).as("hb"),
      TextOps.tokenCount(col("text")).cast("long").as("tb"))
    ax.join(bx, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_a"), col("src_b")).as("source"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "modified")
          .otherwise("unchanged").as("change"),
        (coalesce(col("tb"), lit(0L)) - coalesce(col("ta"), lit(0L)))
          .as("dt"))
      .groupBy("source", "change")
      .agg(count(lit(1)).as("n_docs"), sum(col("dt")).as("token_delta"))
  }

  /** The oracle gate's deterministic snapshot pair: A = docs with
    * `doc_id % 7 != 0`; B = docs with `doc_id % 11 != 0`, where docs
    * with `doc_id % 13 == 0` carry an appended edit marker. */
  def corpusDiffGate(docs: DataFrame): DataFrame = {
    val a = docs.where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
    val b = docs.where(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" edited"))).otherwise(col("text"))
          .as("text"))
    corpusDiff(a, b)
  }

  def corpusDiffSql(): String =
    s"""WITH a AS (SELECT doc_id, source, text FROM documents
       |  WHERE doc_id % 7 <> 0),
       |b AS (SELECT doc_id, source,
       |  CASE WHEN doc_id % 13 = 0 THEN text || ' edited' ELSE text END
       |   AS text
       | FROM documents WHERE doc_id % 11 <> 0),
       |ax AS (SELECT doc_id, source AS src_a, md5(text) AS ha,
       |  CAST(${TextOps.tokenCountSql} AS BIGINT) AS ta FROM a),
       |bx AS (SELECT doc_id, source AS src_b, md5(text) AS hb,
       |  CAST(${TextOps.tokenCountSql} AS BIGINT) AS tb FROM b),
       |j AS (SELECT coalesce(src_a, src_b) AS source,
       |  CASE WHEN ha IS NULL THEN 'added'
       |   WHEN hb IS NULL THEN 'removed'
       |   WHEN ha <> hb THEN 'modified'
       |   ELSE 'unchanged' END AS change,
       |  coalesce(tb, 0) - coalesce(ta, 0) AS dt
       | FROM ax FULL JOIN bx USING (doc_id))
       |SELECT source, change, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(dt) AS BIGINT) AS token_delta
       |FROM j GROUP BY source, change
       |ORDER BY source, change""".stripMargin.replace('\n', ' ')

  /** Per-document n-gram novelty — the template/boilerplate detector on
    * the CORPUS axis: a document's gram is novel when no lower-id
    * document contains it, and the novelty ratio is the share of the
    * doc's distinct grams that are corpus-first-seen. Template spam and
    * mirrored content sit near 0; original text near 1. (The dedup
    * family asks "who shares grams with whom"; this asks each doc "did
    * you bring anything new" — the audit number curation dashboards
    * track per crawl snapshot.)
    *
    * Scale shape: one distinct gram stream, one per-gram min aggregate
    * (map-side combine on the gram key), one equi-join back, one
    * per-doc aggregate — [[dupSpans]]' exact layout, no pair surface. */
  def gramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val g = gramStream(docs, n).distinct()
    val firstDoc = g.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    g.join(firstDoc, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  def gramNoveltySql(n: Int = 3): String =
    s"""WITH g AS (SELECT DISTINCT doc_id, g FROM (${gramStreamSql(n)})),
       |fd AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       | CAST(sum(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |  AS BIGINT) AS n_novel,
       | CAST(sum(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
       |FROM g JOIN fd USING (g)
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin
      .replace('\n', ' ')

  /** Sequence-length histogram per source — the packing/loader audit
    * table: document token counts bucketed at explicit power-of-2 edges
    * (integer comparisons only, no float log2 at the boundary). Reads
    * directly against `seqLen` choices: everything in the 256+ bucket
    * will be chunked by [[packSequences]], the <16 tail is
    * filter-fodder. Bounded output (sources × 6 buckets); map-side
    * partial combine. */
  def lenHist(docs: DataFrame): DataFrame = {
    val nt = TextOps.tokenCount(col("text")).cast("long")
    val edges = Seq(16L, 32L, 64L, 128L, 256L)
    val bucket = edges.foldRight(lit(256L): Column) { (e, acc) =>
      when(nt < e, if (e == 16L) 0L else e / 2).otherwise(acc)
    }
    docs.select(col("source"), nt.as("nt"), bucket.as("bucket_lo"))
      .groupBy("source", "bucket_lo")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"))
  }

  /** Per-source token-length percentiles — [[lenHist]]'s companion
    * audit (the bucketed histogram says WHERE mass sits; this pins the
    * exact p10/p50/p90/p99 cut values a seqLen or min-length dial is
    * set against). Rank-based with NO interpolation: the p-th
    * percentile is the VALUE at 1-based rank `ceil(p·n/100)` in
    * (n_tokens, doc_id) order — all-integer rank arithmetic, and the
    * value at any rank is deterministic under ties because equal
    * values occupy a contiguous rank range. One per-source window
    * (key-bounded), conditional-max extraction, bounded output. */
  def lenPercentiles(docs: DataFrame,
      ps: Seq[Int] = Seq(10, 50, 90, 99)): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("nt"), col("doc_id"))
    val ranked = graft.functions.parallelized(docs)
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("nt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
    val pcols = ps.map(p =>
      max(when(col("rn") === expr(s"($p * n + 99) div 100"), col("nt")))
        .as(s"p$p"))
    ranked.groupBy("source")
      .agg(max(col("n")).as("n_docs"), pcols: _*)
  }

  def lenPercentilesSql(ps: Seq[Int] = Seq(10, 50, 90, 99)): String = {
    val pexprs = ps.map(p =>
      s"max(CASE WHEN rn = ($p * n + 99) // 100 THEN nt END) AS p$p")
      .mkString(", ")
    s"""WITH r AS (SELECT doc_id, source, nt,
       |  CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY nt, doc_id) AS BIGINT) AS rn,
       |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       | FROM (SELECT doc_id, source,
       |   CAST(${TextOps.tokenCountSql} AS BIGINT) AS nt
       |  FROM documents))
       |SELECT source, max(n) AS n_docs, $pexprs
       |FROM r GROUP BY source ORDER BY source""".stripMargin
      .replace('\n', ' ')
  }

  def lenHistSql(): String = {
    val nt = s"CAST(${TextOps.tokenCountSql} AS BIGINT)"
    s"""SELECT source, bucket_lo, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(nt) AS BIGINT) AS total_tokens
       |FROM (SELECT source, $nt AS nt,
       |  CASE WHEN $nt < 16 THEN 0 WHEN $nt < 32 THEN 16
       |   WHEN $nt < 64 THEN 32 WHEN $nt < 128 THEN 64
       |   WHEN $nt < 256 THEN 128 ELSE 256 END AS bucket_lo
       | FROM documents)
       |GROUP BY source, bucket_lo
       |ORDER BY source, bucket_lo""".stripMargin.replace('\n', ' ')
  }

  /** UniMax language-budget allocation (Chung et al. 2023): distribute a
    * total token budget across languages under a per-language repeat cap
    * — no language may be sampled past `maxEpochs` epochs of its own
    * corpus (the fix for low-resource languages being either drowned by
    * proportional sampling or degenerately over-repeated by uniform
    * sampling). Water-filling in closed form: languages in ascending
    * capacity order (`cap = n_tokens · maxEpochs`, `lang` tiebreak); a
    * language is cap-bound while its cap is at most the fair share of
    * what the remaining languages split, and from the FIRST language
    * whose cap exceeds its fair share onward, every remaining language
    * takes the same `floor(remaining / remaining_langs)` share (caps are
    * ascending, so once the fair share fits under one cap it fits under
    * all later ones). The budget is derived from the corpus itself —
    * `budget = n_total_tokens · budgetNum / budgetDen` (integer, in-plan)
    * — so the dial binds at every SF instead of a constant going stale.
    *
    * All-integer arithmetic (row_number / cumsum / `div`), so both
    * engines allocate bit-identically; the only double is the final
    * `epochs_served = alloc / n_tokens`, one IEEE division spelled the
    * same on both sides. The language table is bounded (ISO codes, not
    * data volume) — every window here is over a few-hundred-row
    * aggregate, a LocalRelation-class cost at any corpus size; the one
    * corpus-wide pass is the per-lang token count, a map-side partial
    * agg on a bounded key. */
  def unimaxAlloc(docs: DataFrame, maxEpochs: Int = 2,
      budgetNum: Int = 3, budgetDen: Int = 2): DataFrame = {
    val ord = Window.orderBy(col("cap"), col("lang"))
    val full = ord.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    graft.functions.parallelized(docs)
      .select(col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("s_prev", coalesce(
        sum(col("cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_langs", count(lit(1)).over(full))
      .withColumn("budget",
        expr(s"(sum(n_tokens) OVER (ORDER BY cap, lang ROWS BETWEEN " +
          s"UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) * $budgetNum) " +
          s"div $budgetDen"))
      .withColumn("fair", expr("(budget - s_prev) div (n_langs - i + 1)"))
      .withColumn("cross_i",
        min(when(col("cap") > col("fair"), col("i"))).over(full))
      .withColumn("fair_cross",
        max(when(col("i") === col("cross_i"), col("fair"))).over(full))
      .select(col("lang"), col("n_tokens"), col("cap"),
        when(col("cross_i").isNull || col("i") < col("cross_i"), col("cap"))
          .otherwise(col("fair_cross")).as("alloc"))
      .withColumn("epochs_served",
        col("alloc").cast("double") / col("n_tokens").cast("double"))
  }

  def unimaxAllocSql(maxEpochs: Int = 2, budgetNum: Int = 3,
      budgetDen: Int = 2): String =
    s"""WITH tl AS (SELECT lang,
       |  CAST(sum(CAST(${TextOps.tokenCountSql} AS BIGINT)) AS BIGINT)
       |   AS n_tokens
       | FROM documents GROUP BY lang),
       |ord AS (SELECT lang, n_tokens, n_tokens * $maxEpochs AS cap,
       |  CAST(row_number() OVER (ORDER BY n_tokens * $maxEpochs, lang)
       |   AS BIGINT) AS i,
       |  CAST(COALESCE(sum(n_tokens * $maxEpochs) OVER (
       |    ORDER BY n_tokens * $maxEpochs, lang
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |   AS BIGINT) AS s_prev,
       |  CAST(count(*) OVER () AS BIGINT) AS n_langs,
       |  CAST((sum(n_tokens) OVER () * $budgetNum) // $budgetDen
       |   AS BIGINT) AS budget
       | FROM tl),
       |fair AS (SELECT *,
       |  CAST((budget - s_prev) // (n_langs - i + 1) AS BIGINT) AS fair
       | FROM ord),
       |cx AS (SELECT *,
       |  min(CASE WHEN cap > fair THEN i END) OVER () AS cross_i FROM fair),
       |fc AS (SELECT *,
       |  max(CASE WHEN i = cross_i THEN fair END) OVER () AS fair_cross
       | FROM cx)
       |SELECT lang, n_tokens, CAST(cap AS BIGINT) AS cap, alloc,
       | CAST(alloc AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs_served
       |FROM (SELECT lang, n_tokens, cap,
       |  CAST(CASE WHEN cross_i IS NULL OR i < cross_i THEN cap
       |   ELSE fair_cross END AS BIGINT) AS alloc FROM fc)
       |ORDER BY lang""".stripMargin.replace('\n', ' ')

  /** [[unimaxAlloc]] APPLIED: each language contributes documents in the
    * deterministic md5 order until its allocated token budget is spent —
    * [[tokenBudget]]'s keep-whole-documents convention with the budget a
    * JOINED per-language column instead of a constant. Languages whose
    * allocation exceeds one epoch (`alloc ≥ n_tokens`) keep every
    * document (the repeat copies beyond epoch 1 are [[mixtureSample]]'s
    * job — selection here, multiplicity there). The allocation table is
    * language-bounded → broadcast. The selection cumsum dispatches on
    * size: one ordered window per language below [[LangWindowMaxRows]],
    * the [[saltedCumTokens]] exact two-stage prefix sum above it — the
    * per-lang window would otherwise funnel the dominant language of a
    * real corpus through a single task ([[tokenBudget]]/[[sourceCap]]
    * key on `source`, whose thousands-plus cardinality parallelizes the
    * same window shape naturally). */
  def unimaxApply(docs: DataFrame, maxEpochs: Int = 2,
      budgetNum: Int = 3, budgetDen: Int = 2): DataFrame = {
    val alloc = unimaxAlloc(docs, maxEpochs, budgetNum, budgetDen)
      .select(col("lang"), col("alloc"))
    // checkpoint the narrow 3-column frame BEFORE the dispatch count:
    // the count and the chosen arm's passes then read the materialized
    // snapshot instead of re-executing the upstream plan (the
    // pplBoundaryKeys pattern)
    val base = graft.functions.checkpointed(
      docs.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens")))
    val cum =
      if (base.count() <= LangWindowMaxRows) {
        val w = Window.partitionBy("lang").orderBy(sourceOrder: _*)
        base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      } else saltedCumTokens(base, "lang")
    cum
      .join(broadcast(alloc), "lang")
      .where(col("cum_tokens") <= col("alloc"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Inputs at or below this row count run the selection cumsum as one
    * ordered window per language (cheapest below ~10M rows); above it,
    * [[saltedCumTokens]] — bit-identical by integer exactness
    * (OperatorPropertySpec), so the dispatch is invisible to results.
    * Same adaptive-by-statistics stance as
    * [[graft.operators.HistogramOps.PctWindowMaxRows]]. */
  val LangWindowMaxRows: Long = 10_000_000L

  /** EXACT distributed prefix sum of `n_tokens` over the deterministic
    * md5 document order within `key` — the scale path for cumsum
    * selection keyed on a SKEWED column (`lang`: one language is ~half
    * of any real crawl, so `sum() OVER (PARTITION BY lang ORDER BY md5
    * ...)` funnels that language through one task).
    *
    * Two stages, both bounded:
    *  1. salt = the md5 key's first two hex chars — 256 RANGE buckets,
    *     monotone in the (md5, doc_id) order because the salt is a
    *     prefix of the fixed-width sort key itself; the local cumsum
    *     windows (key, salt) groups of ~n/256 rows;
    *  2. per-(key, salt) token totals (a tiny ≤ 256·|keys| table) get an
    *     exclusive prefix sum over salt per key, and the offsets join
    *     back by broadcast: `cum = local + offset`.
    *
    * Because the summand is an exact integer, partial sums compose
    * associatively with no rounding — the salted result is bit-equal to
    * the single-window cumsum by construction (the float bars can NOT be
    * stitched this way, which is why they stay per-symbol folds). */
  private[graft] def saltedCumTokens(base: DataFrame,
      key: String): DataFrame = {
    val salted = base
      .withColumn("_m", md5(col("doc_id").cast("string")))
      .withColumn("_salt", substring(col("_m"), 1, 2))
    val wLoc = Window.partitionBy(col(key), col("_salt"))
      .orderBy(col("_m"), col("doc_id"))
    val offs = salted.groupBy(col(key), col("_salt"))
      .agg(sum(col("n_tokens")).as("_t"))
      .withColumn("_off", coalesce(
        sum(col("_t")).over(Window.partitionBy(key).orderBy("_salt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(key), col("_salt"), col("_off"))
    salted
      .withColumn("_lc", sum(col("n_tokens")).over(wLoc))
      .join(broadcast(offs), Seq(key, "_salt"))
      .withColumn("cum_tokens", col("_lc") + col("_off"))
      .drop("_m", "_salt", "_lc", "_off")
  }

  /** DuckDB twin for the [[saltedCumTokens]] oracle gate: the cumsum the
    * salted plan must reproduce, spelled as the plain single window —
    * the gate pins the two-stage stitching against the reference
    * semantics on real corpus data, not just property fixtures. */
  def saltedCumSumSql(): String =
    s"""SELECT doc_id, lang, n_tokens,
       | CAST(sum(n_tokens) OVER (PARTITION BY lang
       |   ORDER BY $sourceOrderSql) AS BIGINT) AS cum_tokens
       |FROM (SELECT doc_id, lang,
       |  CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens
       | FROM documents)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  def unimaxApplySql(maxEpochs: Int = 2, budgetNum: Int = 3,
      budgetDen: Int = 2): String =
    s"""WITH alloc AS (
       | SELECT lang, alloc FROM (
       |  ${unimaxAllocSql(maxEpochs, budgetNum, budgetDen)
            .replace(" ORDER BY lang", "")})),
       |sel AS (SELECT doc_id, lang, n_tokens,
       |  CAST(sum(n_tokens) OVER (PARTITION BY lang
       |    ORDER BY $sourceOrderSql) AS BIGINT) AS cum_tokens
       | FROM (SELECT doc_id, lang,
       |   CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens
       |  FROM documents))
       |SELECT s.doc_id, s.lang, s.n_tokens, s.cum_tokens
       |FROM sel s JOIN alloc a ON a.lang = s.lang
       |WHERE s.cum_tokens <= a.alloc
       |ORDER BY s.doc_id""".stripMargin.replace('\n', ' ')

  /** Temperature-scaled language sampling (the multilingual-BERT /
    * XLM-R `p_l ∝ n_l^α` classic) — the OTHER canonical allocator next
    * to [[unimaxAlloc]]'s water-filling: raw proportional sampling
    * drowns low-resource languages, uniform over-repeats them;
    * temperature α ∈ (0,1) interpolates. Fixed at α = 1/2 (T = 2), the
    * one exponent where the power is an IEEE-*correctly-rounded*
    * primitive (`sqrt`) on every engine — `pow(x, 0.3)` is libm-lottery,
    * `sqrt(x)` is bit-portable by spec.
    *
    * Portability shape: the temperature weight is quantized to an
    * INTEGER (`floor(sqrt(n_l)·1e6)`) before the cross-language sum, so
    * the normalizer is an exact integer no matter the aggregation order
    * — the same order-independence contract as the classifier's
    * fixed-point gradients; each emitted probability is then ONE IEEE
    * division of identical operands. The per-lang allocation avoids
    * 64-bit overflow of `budget·wq` by going through exact-rounded
    * double multiply+floor (`budget·(wq/W)`), identically spelled on
    * both engines. Language table is bounded — every window below is
    * LocalRelation-class at any corpus size. */
  def mixtureTemp(docs: DataFrame, budgetNum: Int = 1,
      budgetDen: Int = 1): DataFrame = {
    val full = Window.orderBy("lang").rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    graft.functions.parallelized(docs)
      .select(col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
      .withColumn("wq",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("n_total", sum(col("n_tokens")).over(full))
      .withColumn("w_total", sum(col("wq")).over(full))
      .withColumn("budget",
        expr(s"(n_total * $budgetNum) div $budgetDen"))
      .select(col("lang"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_total").cast("double"))
          .as("p_raw"),
        (col("wq").cast("double") / col("w_total").cast("double"))
          .as("p_temp"),
        floor(col("budget").cast("double") *
            (col("wq").cast("double") / col("w_total").cast("double")))
          .cast("long").as("alloc"))
  }

  def mixtureTempSql(budgetNum: Int = 1, budgetDen: Int = 1): String =
    s"""WITH tl AS (SELECT lang,
       |  CAST(sum(CAST(${TextOps.tokenCountSql} AS BIGINT)) AS BIGINT)
       |   AS n_tokens
       | FROM documents GROUP BY lang),
       |w AS (SELECT lang, n_tokens,
       |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1.0e6) AS BIGINT)
       |   AS wq FROM tl),
       |t AS (SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS n_total,
       |  CAST(sum(wq) OVER () AS BIGINT) AS w_total FROM w)
       |SELECT lang, n_tokens,
       | CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_raw,
       | CAST(wq AS DOUBLE) / CAST(w_total AS DOUBLE) AS p_temp,
       | CAST(floor(CAST((n_total * $budgetNum) // $budgetDen AS DOUBLE)
       |   * (CAST(wq AS DOUBLE) / CAST(w_total AS DOUBLE))) AS BIGINT)
       |  AS alloc
       |FROM t ORDER BY lang""".stripMargin.replace('\n', ' ')

  /** The mixture audit table every pipeline builds before training: per
    * (source, lang) — document count, total tokens, total chars, and the
    * doc-length extremes. This is the artifact a data lead reads to set
    * [[mixtureSample]] weights and [[tokenBudget]] budgets.
    *
    * One hash aggregation over bounded (source, lang) keys — partial
    * map-side combine, a few-thousand-row result at any corpus size.
    * Sums are integer-exact (token/char counts are ints). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val corpusStatsSql: String =
    s"""SELECT source, lang, count(*) AS n_docs,
       | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       | CAST(sum(n_chars) AS BIGINT) AS total_chars,
       | min(n_chars) AS min_chars, max(n_chars) AS max_chars
       |FROM (SELECT source, lang,
       |  CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars
       | FROM documents)
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin.replace('\n', ' ')

  // ------------------------------------------- end-to-end corpus assembly

  /** The WHOLE pre-training data loop as ONE oracle-gated operator:
    * quality filter → exact-dedup keepers → eval-slice decontamination
    * (drop at ≥ `minHits` shared `n`-grams) → per-source cap → per-source
    * token budget. Output is [[tokenBudget]]'s manifest over the
    * surviving corpus — the artifact a trainer's loader reads. Every
    * stage is the SAME operator the per-stage gates pin (quality and the
    * eval gram set are per-doc/corpus-fixed, so computing them on the
    * full corpus and semijoining is exact); what THIS gate adds is the
    * composition: set-dependent stages (dedup keepers, cap, budget) run
    * on each stage's SURVIVOR set, which no per-stage gate exercises.
    *
    * Scale shape inherits from the stages: per-doc scores, one gram
    * equi-join, hash-keyed dedup groupBy, key-bounded per-source
    * windows. The composition adds only doc_id semijoins. */
  def corpusAssembly(docs: DataFrame, evalMod: Int = 97, n: Int = 3,
      minHits: Long = 2L, capK: Int = 20, budget: Long = 800L)
      : DataFrame =
    assembleStages(docs,
      docs.join(TextOps.qualityFilter(docs).where(col("keep"))
        .select("doc_id"), "doc_id"),
      evalMod, n, minHits, capK, budget)

  /** [[corpusAssembly]] with the LEARNED quality gate — the e2e chain a
    * classifier-filtered pipeline (fastText-style) actually runs: the
    * trained probe's keep_pred replaces the rule cascade as stage 1;
    * dedup, decontamination, cap, and budget are byte-identical stages.
    * `scored` is the (memoized) [[TextOps.qualityClassifier]] output —
    * train once, gate the corpus with the model. */
  def corpusAssemblyMl(docs: DataFrame, scored: DataFrame,
      evalMod: Int = 97, n: Int = 3, minHits: Long = 2L, capK: Int = 20,
      budget: Long = 800L): DataFrame =
    assembleStages(docs,
      docs.join(scored.where(col("keep_pred")).select("doc_id"),
        "doc_id"),
      evalMod, n, minHits, capK, budget)

  /** Stages 2..5 of the assembly chain (exact-dup keepers → eval-slice
    * exclusion → decontamination → source cap → token budget), shared
    * by the rule-gated and classifier-gated fronts. */
  private def assembleStages(docs: DataFrame, s1: DataFrame,
      evalMod: Int, n: Int, minHits: Long, capK: Int,
      budget: Long): DataFrame = {
    // each surviving-corpus stage is materialized once: every stage
    // references its predecessor TWICE (itself + the stage filter
    // derived from it — exactDedup(s1), decontaminate(s2),
    // sourceCap(s3)), and Catalyst does not dedupe common subtrees,
    // so unmaterialized the upstream chain re-evaluated once per
    // reference and the fan-out compounded stage over stage
    // (2×2×2 ≈ 8 evaluations of s1 feeding the budget pass). At scale
    // the materialized stage is the surviving corpus — strictly
    // smaller than its recomputation tree.
    val s1m = s1.transform(graft.functions.checkpointed)
    val s2 = s1m.join(
      Dedup.exactDedup(s1m).select(col("keeper").as("doc_id")), "doc_id")
      .where(col("doc_id") % evalMod =!= 0)
      .transform(graft.functions.checkpointed)
    val contaminated = decontaminate(s2,
        docs.where(col("doc_id") % evalMod === 0), n)
      .where(col("hits") >= minHits).select("doc_id")
    val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti")
      .transform(graft.functions.checkpointed)
    val s4 = s3.join(sourceCap(s3, capK).select("doc_id"), "doc_id")
    tokenBudget(s4, budget)
  }

  def corpusAssemblySql(evalMod: Int = 97, n: Int = 3,
      minHits: Long = 2L, capK: Int = 20, budget: Long = 800L): String =
    assemblyTailSql(
      s"""qf AS (${TextOps.qualityFilterSql()
            .replace(" ORDER BY q.doc_id", "")}),
         |s1 AS (SELECT d.* FROM documents d
         |  JOIN qf ON qf.doc_id = d.doc_id AND qf.keep)""".stripMargin,
      evalMod, n, minHits, capK, budget)

  def corpusAssemblyMlSql(evalMod: Int = 97, n: Int = 3,
      minHits: Long = 2L, capK: Int = 20, budget: Long = 800L): String =
    assemblyTailSql(
      s"""scored AS (SELECT * FROM (
         | ${TextOps.qualityClassifierSql()
             .replace(" ORDER BY doc_id", "")})),
         |s1 AS (SELECT d.* FROM documents d
         |  JOIN scored s ON s.doc_id = d.doc_id AND s.keep_pred)"""
        .stripMargin,
      evalMod, n, minHits, capK, budget)

  private def assemblyTailSql(s1Ctes: String, evalMod: Int, n: Int,
      minHits: Long, capK: Int, budget: Long): String =
    s"""WITH $s1Ctes,
       |kp AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
       |s2 AS (SELECT s1.* FROM s1 JOIN kp USING (doc_id)
       |  WHERE doc_id % $evalMod <> 0),
       |grams AS (${gramStreamSql(n)}),
       |evalg AS (SELECT DISTINCT g FROM grams WHERE doc_id % $evalMod = 0),
       |contaminated AS (SELECT t.doc_id FROM grams t
       |  JOIN evalg e USING (g) JOIN s2 ON s2.doc_id = t.doc_id
       |  GROUP BY t.doc_id HAVING count(DISTINCT t.g) >= $minHits),
       |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN
       |  (SELECT doc_id FROM contaminated)),
       |cap AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (
       |    PARTITION BY source ORDER BY $sourceOrderSql) AS rn FROM s3)
       |  WHERE rn <= $capK),
       |s4 AS (SELECT s3.* FROM s3 JOIN cap USING (doc_id)),
       |tb AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER (
       |    PARTITION BY source ORDER BY $sourceOrderSql) AS cum
       |  FROM (SELECT doc_id, source,
       |    CAST(${TextOps.tokenCountSql} AS BIGINT) AS n_tokens
       |   FROM s4))
       |SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
       |FROM tb WHERE cum <= $budget
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // ------------------------------------------ duplicated-span removal APPLY

  /** The shared normalized word stream `(doc_id, pos, w)` (1-based `pos`
    * over `split(lower(trim(text)), "[ \\t\\n\\x0B\\f\\r]+")` — the same word coordinates
    * [[dupSpansMerged]] reports spans in). */
  private def wordStream(docs: DataFrame): DataFrame =
    graft.functions.parallelized(docs)
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+"))
          .as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("w"))

  /** DuckDB twin of [[wordStream]]. */
  private val wordStreamSql: String =
    """SELECT doc_id, CAST(pos AS BIGINT) AS pos, w FROM (
      | SELECT doc_id,
      |  unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w,
      |  generate_subscripts(
      |    regexp_split_to_array(lower(trim(text)), '\s+'), 1) AS pos
      | FROM documents)""".stripMargin

  /** APPLY step of the exact-substring dedup family: cut every maximal
    * duplicated span [[dupSpansMerged]] reports out of its document and
    * re-emit the surviving text — Lee et al. 2022's "remove the duplicated
    * substring" pass, the step that turns the span REPORT into the corpus
    * a trainer actually reads. Output text is in normalized word space
    * (lowercased, single-space joined) for every document — spans are
    * defined over that normalization, so removal is exact there; a doc
    * whose every word sits inside some span comes back empty, never
    * missing.
    *
    * Scale shape: covered word positions come from exploding each span's
    * `sequence(span_start, span_end)` (bounded by the doc's own length,
    * deduped — overlapping islands from the n−1 gram tail can cover the
    * same word twice); removal is one LEFT ANTI equi-join on
    * `(doc_id, pos)`; reassembly is a per-document sort-and-join
    * aggregation. No pair materialization, no driver state — the same
    * shuffle-on-doc-key budget as the span report itself. */
  def dupSpansRemoved(docs: DataFrame, n: Int = 5,
      minDocs: Int = 2): DataFrame = {
    val words = wordStream(docs)
    val covered = dupSpansMerged(docs, n, minDocs)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
      .distinct()
    // ONE word-stream pass (the chunkDedup treatment): a left join
    // with a cover flag replaces the anti-join/total split that
    // re-evaluated the word explode per branch. `covered` is distinct,
    // so the join never duplicates word rows; collect_list skips
    // nulls, so the when(uncovered) filter collects exactly the kept
    // words the anti-join did.
    words
      .join(covered.withColumn("_cov", lit(1)),
        Seq("doc_id", "pos"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(when(col("_cov").isNull, 1L).otherwise(0L)).as("_n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("_cov").isNull,
            struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - col("_n_kept")).as("n_removed"),
        col("clean_text"))
  }

  def dupSpansRemovedSql(n: Int = 5, minDocs: Int = 2): String =
    s"""WITH gramsp AS (${gramStreamPosSql(n)}),
       |dup AS (SELECT g FROM gramsp
       | GROUP BY g HAVING count(DISTINCT doc_id) >= $minDocs),
       |hits AS (SELECT gp.doc_id, gp.pos FROM gramsp gp
       | JOIN dup d ON gp.g = d.g),
       |isl AS (SELECT doc_id, pos,
       | pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       | FROM hits),
       |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + ${n - 1} AS e
       | FROM isl GROUP BY doc_id, grp),
       |covered AS (SELECT DISTINCT doc_id, pos FROM (
       | SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM spans)),
       |words AS ($wordStreamSql),
       |kept AS (SELECT w.doc_id, w.pos, w.w FROM words w
       | WHERE NOT EXISTS (SELECT 1 FROM covered c
       |  WHERE c.doc_id = w.doc_id AND c.pos = w.pos)),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       | string_agg(w, ' ' ORDER BY pos) AS clean_text
       | FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words
       | FROM words GROUP BY doc_id)
       |SELECT t.doc_id, t.n_words,
       | t.n_words - coalesce(k.n_kept, 0) AS n_removed,
       | coalesce(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN ka k USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin.replace('\n', ' ')

  /** INTRA-document repeated-gram removal — the within-page cousin of
    * [[dupSpansRemoved]]: an n-gram occurrence is a repeat when the SAME
    * doc contains it at an earlier position; repeat start-positions
    * coalesce to maximal islands (the same gaps-and-islands move) whose
    * covered words are cut, first occurrences kept, survivors
    * reassembled in order. Catches what cross-doc dedup is blind to by
    * construction: nav boilerplate repeated down one page, chorus/verse
    * repeats, copy-paste stutter.
    *
    * Scale shape: one (doc_id, gram) min aggregate, per-doc windows and
    * joins only — every stage is bounded by the document's own length,
    * no cross-doc surface at all (embarrassingly parallel over docs). */
  def intradocDedup(docs: DataFrame, n: Int = 3): DataFrame = {
    // ONE gram-stream pass: first_pos per (doc, gram) as a window over
    // the stream itself instead of an aggregate joined back against a
    // second corpus explode (Catalyst does not dedupe the shared
    // subtree). Same hit set: occurrences after their gram's first.
    val gp = gramStreamPos(docs, n)
    val hits = gp
      .withColumn("_fp",
        min(col("pos")).over(Window.partitionBy("doc_id", "g")))
      .where(col("pos") > col("_fp"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val spans = hits
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (n - 1)).as("e"))
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("s"), col("e"))).as("pos")).distinct()
    val words = wordStream(docs)
    // ONE word-stream pass (the chunkDedup treatment): a left join
    // with a cover flag replaces the anti-join/total split that
    // re-evaluated the word explode per branch. `covered` is distinct,
    // so the join never duplicates word rows; collect_list skips
    // nulls, so the when(uncovered) filter collects exactly the kept
    // words the anti-join did.
    words
      .join(covered.withColumn("_cov", lit(1)),
        Seq("doc_id", "pos"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(when(col("_cov").isNull, 1L).otherwise(0L)).as("_n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("_cov").isNull,
            struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - col("_n_kept")).as("n_removed"),
        col("clean_text"))
  }

  def intradocDedupSql(n: Int = 3): String =
    s"""WITH gramsp AS (${gramStreamPosSql(n)}),
       |fp AS (SELECT doc_id, g, min(pos) AS first_pos FROM gramsp
       | GROUP BY doc_id, g),
       |hits AS (SELECT gp.doc_id, gp.pos FROM gramsp gp
       | JOIN fp ON fp.doc_id = gp.doc_id AND fp.g = gp.g
       | WHERE gp.pos > fp.first_pos),
       |isl AS (SELECT doc_id, pos,
       | pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       | FROM hits),
       |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + ${n - 1} AS e
       | FROM isl GROUP BY doc_id, grp),
       |covered AS (SELECT DISTINCT doc_id, pos FROM (
       | SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM spans)),
       |words AS ($wordStreamSql),
       |kept AS (SELECT w.doc_id, w.pos, w.w FROM words w
       | WHERE NOT EXISTS (SELECT 1 FROM covered c
       |  WHERE c.doc_id = w.doc_id AND c.pos = w.pos)),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       | string_agg(w, ' ' ORDER BY pos) AS clean_text
       | FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words
       | FROM words GROUP BY doc_id)
       |SELECT t.doc_id, t.n_words,
       | t.n_words - coalesce(k.n_kept, 0) AS n_removed,
       | coalesce(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN ka k USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin.replace('\n', ' ')

  // --------------------------------------------- chunk-level (line) dedup

  /** Chunk-level dedup (the RefinedWeb/CCNet LINE-dedup shape restated
    * for unstructured text): documents split into fixed-`width`-word
    * chunks, each chunk hashed, every repeat of a chunk already seen
    * anywhere in the corpus dropped (keep-FIRST by `(doc_id, chunk_idx)`
    * — including repeats within one document), surviving chunks
    * reassembled in order. Output per document: chunk counts and the
    * cleaned text (normalized word space, like [[dupSpansRemoved]]).
    *
    * Scale shape: the chunk split is one map-side explode (per-doc
    * `slice` windows — no shuffle); the keep-first decision is a window
    * over `md5(chunk_text)` whose partitions are duplicate GROUPS
    * (bounded by the corpus duplication factor, never a global funnel);
    * reassembly is per-document. At 100 TB this is exactly the
    * shuffle-on-content-hash budget of exact doc dedup, one granularity
    * down. */
  def chunkDedup(docs: DataFrame, width: Int = 20): DataFrame = {
    val ws = split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")
    val chunks = graft.functions.parallelized(docs)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L),
            floor((size(col("ws")).cast("long") - 1) / width).cast("long")),
          i => array_join(
            slice(col("ws"), (i * width + 1).cast("int"), lit(width)),
            " "))).as(Seq("chunk_idx", "chunk_text")))
    val byHash = Window.partitionBy(md5(col("chunk_text")))
      .orderBy(col("doc_id"), col("chunk_idx"))
    val flagged = chunks.withColumn("rn", row_number().over(byHash))
    // ONE per-doc aggregation (the cdcChunkDedup treatment): the old
    // kept/total split evaluated the chunk-explode + keep-first window
    // subtree once per branch; collect_list skips nulls, so the
    // when(rn=1) filter collects exactly the kept chunks.
    flagged.groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("_n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("chunk_idx"), col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - col("_n_kept")).as("n_dup_chunks"),
        col("clean_text"))
  }

  def chunkDedupSql(width: Int = 20): String =
    s"""WITH words AS ($wordStreamSql),
       |chunks AS (SELECT doc_id,
       | CAST((pos - 1) // $width AS BIGINT) AS chunk_idx,
       | string_agg(w, ' ' ORDER BY pos) AS chunk_text
       | FROM words GROUP BY doc_id, chunk_idx),
       |flagged AS (SELECT doc_id, chunk_idx, chunk_text,
       | row_number() OVER (PARTITION BY md5(chunk_text)
       |   ORDER BY doc_id, chunk_idx) AS rn FROM chunks),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       | string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text
       | FROM flagged WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
       | FROM flagged GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks,
       | t.n_chunks - coalesce(k.n_kept, 0) AS n_dup_chunks,
       | coalesce(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN ka k USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin.replace('\n', ' ')

  /** Content-defined chunk dedup — [[chunkDedup]]'s shift-robust
    * sibling (the FastCDC idea at word level): a chunk boundary falls
    * AFTER position i when the rolling hash of the `w` words ending at
    * i lands on the zero residue (`md5(gram) % div == 0`, expected
    * chunk ≈ div words). Because boundaries are functions of CONTENT,
    * not offsets, inserting a prefix re-synchronizes within one window
    * — the duplicated tail still chunks identically and dedups, where
    * fixed-width chunking shifts every chunk and sees nothing
    * (PipelineSpec plants exactly this). Keep-first (doc_id, chunk)
    * order, per-doc reassembly — [[chunkDedup]]'s exact output
    * contract.
    *
    * Scale shape: two per-doc windows (lag-gram + boundary cumsum) and
    * the same hash-partitioned keep-first as chunkDedup — no cross-doc
    * surface beyond the chunk-hash shuffle. */
  def cdcChunkDedup(docs: DataFrame, w: Int = 4, div: Int = 16)
      : DataFrame = {
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws(" ",
      ((w - 1) to 1 by -1).map(k => lag(col("w"), k).over(wd)) :+
        col("w"): _*)
    val bnd = when(col("pos") >= w,
      conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % div === 0)
      .otherwise(lit(false))
    val cum = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunked = wordStream(docs)
      .withColumn("bnd", bnd)
      .withColumn("cid", coalesce(
        sum(when(col("bnd"), 1L).otherwise(0L)).over(cum), lit(0L)))
    val chunks = chunked.groupBy("doc_id", "cid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("chunk_text"))
    val byHash = Window.partitionBy(md5(col("chunk_text")))
      .orderBy(col("doc_id"), col("cid"))
    val flagged = chunks.withColumn("rn", row_number().over(byHash))
    // ONE per-doc aggregation for totals AND keep-first reassembly:
    // the old kept/total split read `flagged` twice, re-running the
    // chunk windows per branch (Catalyst does not dedupe common
    // subtrees). collect_list skips nulls, so the when(rn=1) filter
    // collects exactly the kept chunks the old filtered branch did.
    flagged.groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("_n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("cid"), col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - col("_n_kept")).as("n_dup_chunks"),
        col("clean_text"))
  }

  def cdcChunkDedupSql(w: Int = 4, div: Int = 16): String = {
    val lags = ((w - 1) to 1 by -1)
      .map(k => s"lag(w, $k) OVER wd").mkString(", ")
    s"""WITH words AS ($wordStreamSql),
       |g AS (SELECT doc_id, pos, w,
       |  CASE WHEN pos >= $w THEN
       |   (CAST(('0x' || substr(md5(concat_ws(' ', $lags, w)), 1, 8))
       |     AS BIGINT) % $div = 0)
       |  ELSE false END AS bnd
       | FROM words WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)),
       |c AS (SELECT doc_id, pos, w, CAST(coalesce(
       |   sum(CASE WHEN bnd THEN 1 ELSE 0 END) OVER (
       |    PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |  AS BIGINT) AS cid FROM g),
       |chunks AS (SELECT doc_id, cid,
       |  string_agg(w, ' ' ORDER BY pos) AS chunk_text
       | FROM c GROUP BY doc_id, cid),
       |flagged AS (SELECT doc_id, cid, chunk_text,
       | row_number() OVER (PARTITION BY md5(chunk_text)
       |   ORDER BY doc_id, cid) AS rn FROM chunks),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       | string_agg(chunk_text, ' ' ORDER BY cid) AS clean_text
       | FROM flagged WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
       | FROM flagged GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks,
       | t.n_chunks - coalesce(k.n_kept, 0) AS n_dup_chunks,
       | coalesce(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN ka k USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin.replace('\n', ' ')
  }

  /** Scalar twin of [[cdcChunkDedup]]'s chunking stage — one document's
    * `(chunk_id, chunk_text)` list, the exact boundary rule of the
    * DataFrame op (boundary after position i when the md5 of the
    * trailing `w`-gram's first 8 hex chars lands on residue 0 mod
    * `div`). Used by the streaming CDC dedup path, where chunks must
    * exist BEFORE the chunk-hash-keyed shuffle, and by specs as the
    * independent replay oracle. */
  private[graft] def cdcChunksOf(text: String, w: Int = 4,
      div: Int = 16): Seq[(Long, String)] = {
    val ws = TextOps.sqlWords(text)
    val bnd = Array.tabulate(ws.length) { i0 =>
      val pos = i0 + 1
      pos >= w && {
        val gram = ws.slice(i0 - w + 1, i0 + 1).mkString(" ")
        val hex = graft.functions.md5Hex(gram.getBytes("UTF-8"))
          .substring(0, 8)
        java.lang.Long.parseLong(hex, 16) % div == 0
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var cid = 0L
    val cur = new StringBuilder
    // separator between EVERY word pair, empty words included — the
    // DataFrame side's array_join/string_agg joins all positions, so a
    // leading empty word (text starting with non-space whitespace) must
    // still contribute its separator (ADVICE r9)
    var first = true
    ws.indices.foreach { i0 =>
      if (i0 > 0 && bnd(i0 - 1)) {
        out += ((cid, cur.toString)); cid += 1; cur.setLength(0)
        first = true
      }
      if (!first) cur.append(' ')
      cur.append(ws(i0))
      first = false
    }
    out += ((cid, cur.toString))
    out.toSeq
  }

  // ---------------------------------------- Bloom-filter decontamination

  /** [[decontaminate]]'s bounded-memory sibling: the eval-set gram test
    * via a RELATIONAL Bloom filter — `k` deterministic md5-derived bit
    * positions per gram over an `mBits`-bit space, the SET-bit table
    * built from the eval grams, train grams counted as contaminated when
    * all `k` probe bits are set. Reports `(doc_id, bloom_hits)` for docs
    * with ≥1 hit gram: a SUPERSET of the exact report (Bloom false
    * positives, rate ≈ (1−e^(−k·n/m))^k; never false negatives).
    *
    * Why it exists at 100 TB: [[decontaminate]] broadcasts the DISTINCT
    * eval gram set — fine while the eval suite is small, unbounded if
    * it isn't. The bit table here is ≤ `mBits` rows NO MATTER how large
    * the eval set grows — a fixed-size broadcast by construction. And
    * because the "filter" is a plain table of bit positions, membership
    * is an equi-join Catalyst can plan (broadcast hash join), not an
    * opaque sketch UDF — no driver-side sketch collection anywhere. */
  /** Probe-`j` bit position of gram `g` in an `mBits`-bit Bloom space —
    * md5-derived, identically spelled in the DuckDB twin and reused by
    * the STREAM-side prober. */
  private[graft] def bloomBitpos(g: Column, j: Column,
      mBits: Int): Column =
    pmod(conv(substring(md5(concat(g, lit("|"), j.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(mBits.toLong))

  private[graft] def bloomJs(k: Int): Column =
    explode(array((0 until k).map(lit): _*)).as("j")

  /** The SET-BIT table of an eval corpus — ≤ `mBits` rows no matter the
    * eval-set size; the broadcast side of every Bloom membership join
    * (batch below, and the stream-static ingest gate in
    * [[graft.streaming.Streaming.streamingBloomDecontam]]). */
  def bloomBits(evalDocs: DataFrame, n: Int = 3, mBits: Int = 1 << 14,
      k: Int = 3): DataFrame =
    gramStream(evalDocs, n).select("g").distinct()
      .select(col("g"), bloomJs(k))
      .select(bloomBitpos(col("g"), col("j"), mBits).as("bit")).distinct()

  def bloomDecontam(docs: DataFrame, n: Int = 3, evalMod: Int = 97,
      mBits: Int = 1 << 14, k: Int = 3): DataFrame = {
    val bits = bloomBits(docs.where(col("doc_id") % evalMod === 0),
      n, mBits, k)
    gramStream(docs.where(col("doc_id") % evalMod =!= 0), n)
      .select("doc_id", "g").distinct()
      .select(col("doc_id"), col("g"), bloomJs(k))
      .withColumn("bit", bloomBitpos(col("g"), col("j"), mBits))
      .join(broadcast(bits), "bit")
      .groupBy("doc_id", "g").agg(count(lit(1)).as("nset"))
      .where(col("nset") === k)
      .groupBy("doc_id").agg(count(lit(1)).as("bloom_hits"))
  }

  def bloomDecontamSql(n: Int = 3, evalMod: Int = 97,
      mBits: Int = 1 << 14, k: Int = 3): String = {
    def bitposSql(g: String, j: String): String =
      s"CAST(('0x' || substr(md5($g || '|' || CAST($j AS VARCHAR)), " +
        s"1, 15)) AS BIGINT) % $mBits"
    s"""WITH grams AS (${gramStreamSql(n)}),
       |js AS (SELECT unnest(generate_series(0, ${k - 1})) AS j),
       |evalg AS (SELECT DISTINCT g FROM grams
       | WHERE doc_id % $evalMod = 0),
       |bits AS (SELECT DISTINCT ${bitposSql("g", "j")} AS bit
       | FROM evalg CROSS JOIN js),
       |cand AS (SELECT DISTINCT doc_id, g FROM grams
       | WHERE doc_id % $evalMod <> 0),
       |probes AS (SELECT c.doc_id, c.g,
       | ${bitposSql("c.g", "j.j")} AS bit FROM cand c CROSS JOIN js j),
       |hitg AS (SELECT doc_id, g FROM probes p JOIN bits b USING (bit)
       | GROUP BY doc_id, g HAVING count(*) = $k)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS bloom_hits
       |FROM hitg GROUP BY doc_id ORDER BY doc_id""".stripMargin
      .replace('\n', ' ')
  }

  // ------------------------------------- DSIR importance weighting (LLR)

  /** DSIR-style importance weighting ("Data Selection for Language Models
    * via Importance Resampling", Xie et al. 2023, restated at the
    * unigram feature level): every document scored by the log-likelihood
    * ratio of its tokens under the TARGET-domain unigram distribution
    * (here: the `targetSource` slice, playing the high-quality corpus)
    * vs the RAW corpus distribution, add-1 smoothed over the shared
    * vocabulary. `llr > 0` ⇔ the doc looks more target-like than
    * raw-like — the natural selection cut, emitted as `selected`.
    *
    * Determinism contract: both `ln` terms go through the lnQ quantizer
    * (`floor(ln·1e12)`, integral-double difference is exact), the per-doc
    * sum is exact decimal/HUGEINT, divided once — bit-identical across
    * engines and accumulation orders ([[TextOps.unigramLogProb]]'s
    * recipe).
    *
    * Scale shape: one token explode, ONE vocab aggregation carrying both
    * counts (raw + conditional target — not two passes), corpus totals
    * as a 1-row LocalRelation, one equi-join on the term key, one
    * per-doc aggregation. The LLR needs no global sort — selection is a
    * per-row threshold, not a rank. */
  /** The (term → raw count, target count) model table both the batch
    * scorer and the stream scorer join against — ONE vocab aggregation
    * carrying both counts. */
  private[graft] def dsirFreq(docs: DataFrame,
      targetSource: String): DataFrame =
    graft.functions.parallelized(docs)
      .select(col("doc_id"), col("source"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
      .groupBy("term").agg(
        count(lit(1)).as("c_raw"),
        sum(when(col("source") === targetSource, 1L).otherwise(0L))
          .as("c_tgt"))
      .transform(graft.functions.checkpointed)

  /** Zero-collect DSIR model for stream scoring (the LmModelRef
    * pattern): the vocab table stays a DataFrame — the stream-static
    * join side — and only the three BOUNDED corpus constants surface as
    * scalars. */
  case class DsirModelRef(freq: DataFrame, nRaw: Long, nTgt: Long,
      v: Long)

  def dsirModel(docs: DataFrame,
      targetSource: String = "src0"): DsirModelRef = {
    val freq = dsirFreq(docs, targetSource)
    val r = freq.agg(
      sum(col("c_raw")).cast("long"), sum(col("c_tgt")).cast("long"),
      count(lit(1))).head()
    DsirModelRef(freq, r.getLong(0), r.getLong(1), r.getLong(2))
  }

  def dsirWeights(docs: DataFrame,
      targetSource: String = "src0"): DataFrame = {
    val words = graft.functions.parallelized(docs)
      .select(col("doc_id"), col("source"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
    val freq = dsirFreq(docs, targetSource)
    val consts = graft.functions.localRelation(freq.agg(
      sum(col("c_raw")).cast("long").as("n_raw"),
      sum(col("c_tgt")).cast("long").as("n_tgt"),
      count(lit(1)).cast("long").as("v")))
    def lnQ(c: Column, tot: Column): Column =
      floor(log((c.cast("double") + 1.0d) /
        (tot.cast("double") + col("v").cast("double"))) * 1e12)
    words.join(freq, "term").crossJoin(broadcast(consts))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum((lnQ(col("c_tgt"), col("n_tgt")) -
          lnQ(col("c_raw"), col("n_raw"))).cast("decimal(38,0)"))
          .cast("double").as("_q"))
      .select(col("doc_id"), col("n_words"),
        (col("_q") / 1e12).as("llr"), (col("_q") > 0d).as("selected"))
  }

  def dsirWeightsSql(targetSource: String = "src0"): String = {
    def lnQSql(c: String, tot: String): String =
      s"floor(ln((CAST($c AS DOUBLE) + 1.0) / " +
        s"(CAST($tot AS DOUBLE) + CAST(t.v AS DOUBLE))) * 1e12)"
    s"""WITH words AS (SELECT doc_id, source,
       |  unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       | FROM documents),
       |freq AS (SELECT term, count(*) AS c_raw,
       | sum(CASE WHEN source = '$targetSource' THEN 1 ELSE 0 END)
       |  AS c_tgt FROM words GROUP BY term),
       |tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw,
       | CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
       | CAST(count(*) AS BIGINT) AS v FROM freq)
       |SELECT doc_id, n_words, CAST(q AS DOUBLE) / 1e12 AS llr,
       | CAST(q AS DOUBLE) > 0 AS selected FROM (
       | SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  SUM(CAST(${lnQSql("f.c_tgt", "t.n_tgt")} -
       |    ${lnQSql("f.c_raw", "t.n_raw")} AS HUGEINT)) AS q
       | FROM words w JOIN freq f USING (term) CROSS JOIN tot t
       | GROUP BY w.doc_id)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }
}
