package graft

import graft.ext.Pipeline

/** Planted-input semantics checks for the corpus-assembly operators
  * (packing, mixture sampling, decontamination, embedding quantization).
  * The bit-exact oracle gate is Verify + tools/validate.py; these pin the
  * semantics on small inputs where the expected values are hand-derivable. */
class PipelineSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("packSequences: offsets and chunk spans over one shard") {
    // single shard so the whole stream is one deterministic concatenation.
    // NOTE the tokenizer counts empty text as ONE (empty) token — split of
    // "" yields [""], identically in Spark and DuckDB (q_token_count pins
    // this) — so no document is ever 0 tokens under this tokenizer.
    val docs = docsDf(
      (0L, "a b c"),         // 3 tokens, [0,3)  -> seq 0
      (1L, "d e"),           // 2 tokens, [3,5)  -> seq 0 (3..4 < 5)
      (2L, ""),              // 1 token,  [5,6)  -> seq 1
      (3L, "f g h i j k"))   // 6 tokens, [6,12) -> seqs 1..2
    val out = Pipeline.packSequences(docs, seqLen = 5, nShards = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // (n_tokens, start_off, first_seq, last_seq, n_seqs)
    assert(out === Map(
      0L -> ((3L, 0L, 0L, 0L, 1L)),
      1L -> ((2L, 3L, 0L, 0L, 1L)),
      2L -> ((1L, 5L, 1L, 1L, 1L)),
      3L -> ((6L, 6L, 1L, 2L, 2L))))
  }

  test("packSequences: shards pack independently") {
    val docs = docsDf((0L, "a b c"), (1L, "d e f"), (2L, "g"), (3L, "h"))
    val out = Pipeline.packSequences(docs, seqLen = 2, nShards = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    // shard 0: docs 0,2 -> offsets 0,3; shard 1: docs 1,3 -> offsets 0,3
    assert(out === Map(0L -> ((0L, 0L)), 2L -> ((0L, 3L)),
      1L -> ((1L, 0L)), 3L -> ((1L, 3L))))
  }

  test("packManifest: every sequence holds exactly seqLen tokens except the tail") {
    val docs = docsDf(
      (0L, "a b c"),         // 3 tokens [0,3)
      (1L, "d e"),           // 2 tokens [3,5)
      (2L, ""),              // 1 token  [5,6)
      (3L, "f g h i j k"))   // 6 tokens [6,12)
    val out = Pipeline.packManifest(docs, seqLen = 5, nShards = 1)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // seq0: docs 0,1 -> 5 tokens; seq1: docs 2,3 -> 1+4 = 5; seq2: tail 2
    assert(out === Map(0L -> ((2L, 5L)), 1L -> ((2L, 5L)),
      2L -> ((1L, 2L))))
  }

  test("mixtureSample: integer weights give exact copy counts, 0 drops") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      .toDF("doc_id", "source")
    val out = Pipeline.mixtureSample(docs,
        Seq("a" -> 2.0, "b" -> 0.0), defaultWeight = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
      .toMap
    assert(byDoc === Map(
      1L -> Seq(0L, 1L), 3L -> Seq(0L, 1L), 4L -> Seq(0L)))
  }

  test("mixtureSample: fractional epoch is deterministic and bounded") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, "a")).toDF("doc_id", "source")
    def run() = Pipeline.mixtureSample(docs, Seq("a" -> 1.5))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a === run())                          // pure function of the id
    assert(a.values.forall(c => c == 1 || c == 2)) // floor(w) or floor(w)+1
    val extra = a.values.count(_ == 2)
    assert(extra > 40 && extra < 160)            // ~half get the 0.5 epoch
  }

  test("decontaminate: planted 3-gram overlap with the eval slice") {
    // doc 0 is eval (0 % 97 == 0); doc 1 shares "q w e" and "w e r",
    // doc 2 shares nothing
    val docs = docsDf(
      (0L, "q w e r"),
      (1L, "x q w e r"),
      (2L, "a b c d e"))
    val out = Pipeline.decontaminate(docs, n = 3, evalMod = 97)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L))
  }

  test("decontaminate against an EXTERNAL eval set (production shape)") {
    // benchmark suites are external tables, not corpus slices: the train
    // corpus here contains NO doc satisfying the modulo slice — only the
    // explicit eval DataFrame defines contamination
    val train = docsDf(
      (1L, "x q w e r"),      // shares "q w e" + "w e r" with eval 100
      (2L, "a b c d e"),      // clean
      (3L, "m n o q w e"))    // shares "q w e"
    val eval = docsDf((100L, "q w e r"))
    val out = Pipeline.decontaminate(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
    // the slice-based overload is this operator with the slice as eval:
    // same result when the slice reproduces the explicit set
    val docs = docsDf((0L, "q w e r"), (1L, "x q w e r"),
      (2L, "a b c d e"), (3L, "m n o q w e"))
    val sliced = Pipeline.decontaminate(docs, n = 3, evalMod = 97)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sliced === Map(1L -> 2L, 3L -> 1L))
  }

  test("writePackedShards: partition-pruned shard dirs, in-file cumsum order") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      val n = graft.ext.Pipeline.writePackedShards(docs, dir, seqLen = 128,
        nShards = 4)
      val packed = graft.ext.Pipeline.packSequences(docs, 128, 4)
      assert(n === packed.count())
      // Hive-partitioned layout: shard=N dirs exist, a single-shard read
      // prunes to one directory
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(shardDirs.toSeq === (0 until 4).map(s => s"shard=$s"))
      val one = spark.read.parquet(dir).where(col("shard") === 2)
      val plan = one.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(plan.contains("PartitionFilters: [isnotnull(shard"),
        s"shard filter not pushed to partition pruning:\n$plan")
      // read-back equals the operator output (same rows, any order)
      val a = spark.read.parquet(dir)
        .select("doc_id", "shard", "n_tokens", "start_off")
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong,
          r.getLong(2), r.getLong(3))).toSet
      val b = packed.select("doc_id", "shard", "n_tokens", "start_off")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(a === b)
      // in-FILE ordering: each parquet file's doc_id column is sorted
      // (the loader streams it without sorting)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val parquets = scala.jdk.CollectionConverters
        .IteratorHasAsScala(files).asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(parquets.nonEmpty)
      parquets.foreach { p =>
        val ids = spark.read.parquet(p.toString).select("doc_id")
          .collect().map(_.getLong(0)).toSeq
        assert(ids === ids.sorted, s"unsorted shard file $p")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("sourceCap: at most k per source, deterministic choice, stable under rerun") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    def run() = graft.ext.Pipeline.sourceCap(docs, k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = run()
    assert(a.toSeq === run().toSeq)                 // deterministic
    val bySrc = a.groupBy(_._2)
    assert(bySrc.keySet === Set("src0", "src1", "src2"))
    bySrc.values.foreach { rs =>
      assert(rs.length === 5)
      assert(rs.map(_._3).sorted.toSeq === (1L to 5L)) // ranks contiguous
    }
    // k beyond source size keeps everything
    assert(graft.ext.Pipeline.sourceCap(docs, k = 100).count() === 50)
  }

  test("tokenBudget: whole docs accumulate until the budget, never past it") {
    // src a: docs of 3 tokens each in md5 order; budget 7 -> exactly 2 docs
    // (6 tokens), the third would cross
    val docs = docsDf((1L, "a b c"), (2L, "d e f"), (3L, "g h i"))
      .withColumn("source", org.apache.spark.sql.functions.lit("a"))
    val out = graft.ext.Pipeline.tokenBudget(docs, budget = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length === 2)
    assert(out.map(_._2).forall(_ === 3L))
    assert(out.map(_._3).max === 6L)          // cumsum stops under budget
    // budget below the smallest doc keeps nothing; huge budget keeps all
    assert(graft.ext.Pipeline.tokenBudget(docs, budget = 2L).count() === 0)
    assert(graft.ext.Pipeline.tokenBudget(docs, budget = 100L).count() === 3)
  }

  test("corpusStats: totals agree with direct aggregation on real documents") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
    val stats = graft.ext.Pipeline.corpusStats(docs)
    val total = stats.agg(sum("n_docs"), sum("total_tokens")).head()
    assert(total.getLong(0) === docs.count())
    val direct = docs.select(
      sum(graft.ext.TextOps.tokenCount(col("text")).cast("long"))).head()
    assert(total.getLong(1) === direct.getLong(0))
  }

  test("packing ↔ manifest invariants hold on real documents") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
    val packed = Pipeline.packSequences(docs, seqLen = 512, nShards = 4)
    // contiguity per shard: offsets tile [0, total) with no gap/overlap
    val shards = packed.groupBy("shard").agg(
      sum(col("n_tokens")).as("total"),
      max(col("start_off") + col("n_tokens")).as("hi"))
      .collect()
    assert(shards.nonEmpty)
    shards.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"shard ${r.getLong(0)}: token stream has gaps or overlaps"))
    // manifest conserves tokens and fills every non-tail sequence exactly
    val manifest = Pipeline.packManifest(docs, seqLen = 512, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val packedTotal = shards.map(_.getLong(1)).sum
    assert(manifest.values.map(_._2).sum === packedTotal)
    val lastSeq = manifest.keys.groupBy(_._1).view.mapValues(_.map(_._2).max)
    manifest.foreach { case ((shard, seq), (_, toks)) =>
      if (seq < lastSeq(shard))
        assert(toks === 512L, s"non-tail sequence ($shard,$seq) has $toks")
      else assert(toks <= 512L)
    }
  }

  test("dupSpans: cross-doc spans flagged, internal repeats are not") {
    val docs = docsDf(
      (1L, "a b c d e x"),      // shares "a b c d e" with doc 2
      (2L, "z a b c d e"),
      (3L, "p q r s t p q r s t")) // internal repeat only -> 0 dup spans
    val out = Pipeline.dupSpans(docs, n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: spans {a b c d e, b c d e x} -> 1 dup; doc2 symmetric
    assert(out(1L) === ((2L, 1L)) && out(2L) === ((2L, 1L)))
    // doc3: "p q r s t" occurs twice but in ONE doc -> not duplicated
    assert(out(3L)._2 === 0L)
  }

  test("dupSpansMerged: overlapping duplicated grams coalesce to ONE maximal span") {
    val docs = docsDf(
      (1L, "a b c d e f g x"),   // shares words 1-7 with doc 2
      (2L, "z a b c d e f g"))
    // shared 5-grams: "a b c d e", "b c d e f", "c d e f g" — three
    // overlapping grams = one 7-word span, not three signals
    val out = Pipeline.dupSpansMerged(docs, n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === Set(
      (1L, 1L, 7L, 7L, 3L),   // doc1: starts 1..3 -> words 1..7
      (2L, 2L, 8L, 7L, 3L)))  // doc2: starts 2..4 -> words 2..8
  }

  test("dupSpansMerged: separated duplicated regions stay separate islands") {
    val docs = docsDf(
      (1L, "a b c q q q q q q a b c"), // "a b c" dup'd at starts 1 and 10
      (2L, "a b c"),
      (3L, "x y z"))
    val out = Pipeline.dupSpansMerged(docs, n = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === Set(
      (1L, 1L, 3L, 3L, 1L), (1L, 10L, 12L, 3L, 1L),
      (2L, 1L, 3L, 3L, 1L)))
  }

  test("dupSpansMerged ≡ scalar gaps-and-islands twin on seeded random corpora") {
    val n = 3; val minDocs = 2
    def scalarSpans(corpus: Seq[(Long, String)])
        : Set[(Long, Long, Long, Long, Long)] = {
      val grams = corpus.flatMap { case (id, t) =>
        val ws = t.trim.toLowerCase.split("\\s+").toSeq
        if (ws.length < n) Seq.empty
        else (0 to ws.length - n).map(i =>
          (id, i + 1L, ws.slice(i, i + n).mkString(" ")))
      }
      val dup = grams.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= minDocs).keySet
      grams.filter(g => dup(g._3)).groupBy(_._1).flatMap {
        case (id, hs) =>
          val ps = hs.map(_._2).sorted
          // islands: split where consecutive starts gap by > 1
          val islands = ps.foldLeft(List.empty[List[Long]]) {
            case (acc, p) => acc match {
              case (h :: t) :: rest if p == h + 1 => (p :: h :: t) :: rest
              case _ => List(p) :: acc
            }
          }
          islands.map { isl =>
            val (lo, hi) = (isl.min, isl.max + (n - 1))
            (id, lo, hi, hi - lo + 1, isl.size.toLong)
          }
      }.toSet
    }
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      val vocab = (1 to 8).map(i => s"v$i")
      val corpus = (1L to 6L).map(id => id ->
        (1 to (n + rnd.nextInt(20)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = Pipeline.dupSpansMerged(docsDf(corpus: _*), n, minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === scalarSpans(corpus), s"trial $trial: $corpus")
    }
  }

  test("hardNegatives: nearest same-label vector is excluded") {
    import spark.implicits._
    import graft.ext.Similarity
    // vec 0 (label 1) is nearly identical to vec 1 (label 1) — a random
    // in-batch negative would never be vec 2, but vec 1 must be excluded
    // and vec 2 (label 2, moderately similar) surface as the hard negative
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 1),
      (1L, Seq(0.99f, 0.1f, 0.0f), 1),   // same label: excluded
      (2L, Seq(0.8f, 0.6f, 0.0f), 2),    // hard negative
      (3L, Seq(0.0f, 0.0f, 1.0f), 2))    // easy negative
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(embs, nQueries = 1, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1, 2L), (2, 3L)))
  }

  test("unigramLogProb: common words score higher than rare ones") {
    import graft.ext.TextOps
    val docs = docsDf(
      (1L, "a a b"),  // mostly the corpus-common word
      (2L, "c"))      // one rare word
    val out = TextOps.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // N=4: c(a)=2, c(b)=1, c(c)=1
    val expect1 = (2 * math.log(2.0 / 4) + math.log(1.0 / 4)) / 3
    val expect2 = math.log(1.0 / 4)
    assert(out(1L)._1 === 3L && out(2L)._1 === 1L)
    assert(math.abs(out(1L)._2 - expect1) < 1e-9)
    assert(math.abs(out(2L)._2 - expect2) < 1e-9)
    assert(out(2L)._2 < out(1L)._2) // rare-word doc scores lower
  }

  test("quantizeEmbeddings: hand-derived int8 values, zero vector safe") {
    import spark.implicits._
    val embs = Seq(
      (1L, Seq(1.0f, -2.0f, 4.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Pipeline.quantizeEmbeddings(embs).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // amax=4: q = [floor(31.75+.5)=32, floor(-63.5+.5)=-63, 127]
    assert(out(1L) === ((4.0, 96L, 222L, -63L, 127L)))
    assert(out(2L) === ((0.0, 0L, 0L, 0L, 0L)))
  }

  test("end-to-end corpus assembly: filter -> dedup -> cap -> budget -> pack composes") {
    // the ops as a real training-corpus build runs them, on real driver
    // data — each stage consumes the previous stage's surviving docs and
    // the loader-facing invariants hold at the end
    import org.apache.spark.sql.functions._
    import graft.ext.{Dedup, TextOps}
    val docs = Tables.table(spark, sf("sf0.01"), "documents")
    val n0 = docs.count()

    // 1. quality filter
    val kept = docs.join(
      TextOps.qualityFilter(docs).where(col("keep")).select("doc_id"),
      "doc_id").localCheckpoint(true)
    val n1 = kept.count()

    // 2. near-dup dedup on the FILTERED corpus (order matters: junk docs
    // must not become dedup keepers of good ones)
    val pairs = Dedup.minhashNearDup(kept).select("doc_a", "doc_b")
    val deduped = kept.join(
      Dedup.dedupApply(kept, pairs).select("doc_id"), "doc_id")
      .localCheckpoint(true)
    val n2 = deduped.count()
    // no surviving exact duplicates, and no verified near-dup pair has
    // both endpoints surviving
    assert(deduped.groupBy(md5(col("text"))).count()
      .where(col("count") > 1).count() === 0L)
    val surv = deduped.select(col("doc_id"))
    assert(pairs.join(surv.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(surv.withColumnRenamed("doc_id", "doc_b"), "doc_b")
      .count() === 0L, "a near-dup pair survived dedup intact")

    // 3. per-source cap, then 4. per-source token budget
    val capK = 30
    val capped = deduped.join(
      graft.ext.Pipeline.sourceCap(deduped, k = capK).select("doc_id"),
      "doc_id").localCheckpoint(true)
    val srcCounts = capped.groupBy("source").count().collect()
    assert(srcCounts.nonEmpty &&
      srcCounts.forall(_.getLong(1) <= capK))
    val budget = 600L
    val budgeted = capped.join(
      graft.ext.Pipeline.tokenBudget(capped, budget).select("doc_id"),
      "doc_id").localCheckpoint(true)
    val perSrcTokens = budgeted
      .select(col("source"), TextOps.tokenCount(col("text"))
        .cast("long").as("t"))
      .groupBy("source").agg(sum(col("t")).as("tt")).collect()
    assert(perSrcTokens.forall(_.getLong(1) <= budget))

    // 5. pack the surviving corpus; loader integrity
    val packed = graft.ext.Pipeline.packSequences(budgeted)
    val manifest = graft.ext.Pipeline.packManifest(budgeted)
    val totTokens = budgeted
      .select(sum(TextOps.tokenCount(col("text")).cast("long")))
      .head().getLong(0)
    assert(packed.agg(sum(col("n_tokens"))).head().getLong(0) === totTokens,
      "packing lost tokens")
    assert(manifest.agg(sum(col("n_tokens"))).head().getLong(0) === totTokens,
      "manifest lost tokens")
    // every sequence is full except at most one partial per shard
    val partials = manifest.where(col("n_tokens") =!= 512).collect()
    val nShardsUsed = manifest.select("shard").distinct().count()
    assert(partials.length <= nShardsUsed)

    val n3 = budgeted.count()
    info(s"corpus assembly: $n0 -> filter $n1 -> dedup $n2 " +
      s"-> cap+budget $n3 -> ${packed.count()} packed docs, " +
      s"$totTokens tokens, ${manifest.count()} sequences")
    // every stage non-degenerate and monotone
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 > 0)
    assert(n1 < n0, "filter dropped nothing — thresholds degenerate")
    assert(n2 < n1, "dedup dropped nothing — corpus has known dups")
  }

  test("dupSpansRemoved: planted cross-doc span is cut from BOTH docs") {
    // docs 0 and 1 share the 6-word run "a b c d e f" → two overlapping
    // 5-grams → ONE maximal span in each doc; doc 2 is too short for any
    // gram and must come back untouched.
    val docs = docsDf(
      (0L, "a b c d e f x1 x2"),
      (1L, "y1 a b c d e f"),
      (2L, "z1 z2"))
    val out = Pipeline.dupSpansRemoved(docs, n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      0L -> ((8L, 6L, "x1 x2")),
      1L -> ((7L, 6L, "y1")),
      2L -> ((2L, 0L, "z1 z2"))))
  }

  test("dupSpansRemoved: counts reconcile with clean_text on real docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
    val out = Pipeline.dupSpansRemoved(docs).localCheckpoint(true)
    // kept word count == words in the reassembled text ('' → 0), per doc
    val bad = out.where(
      (col("n_words") - col("n_removed")) =!=
        when(col("clean_text") === "", 0L)
          .otherwise(size(split(col("clean_text"), " ")).cast("long")))
      .count()
    assert(bad === 0L)
    // the pass is non-degenerate on this corpus (dup spans exist) yet
    // never removes everything from every doc
    val removed = out.agg(sum(col("n_removed"))).head().getLong(0)
    val keptAll = out.where(col("n_removed") === 0).count()
    assert(removed > 0L && keptAll > 0L)
  }

  test("chunkDedup: keep-first across docs AND within one doc") {
    // width=2 chunks: doc0 [a b][c d]; doc1 [a b][x]; doc2 [c d][c d].
    // "a b" survives only at its first site (0,0); "c d" only at (0,1) —
    // doc2's internal repeat drops BOTH its copies.
    val docs = docsDf(
      (0L, "a b c d"), (1L, "a b x"), (2L, "c d c d"))
    val out = Pipeline.chunkDedup(docs, width = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      0L -> ((2L, 0L, "a b c d")),
      1L -> ((2L, 1L, "x")),
      2L -> ((2L, 2L, ""))))
  }

  test("bloomDecontam: superset of exact decontam; exact at large m") {
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
    val exact = Pipeline.decontaminate(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Pipeline.bloomDecontam(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "decontam gate degenerate on sf0.001")
    // no false negatives: every exact-contaminated doc is bloom-flagged,
    // with at least as many flagged grams
    exact.foreach { case (d, hits) =>
      assert(bloom.contains(d), s"doc $d missed by bloom")
      assert(bloom(d) >= hits, s"doc $d: bloom ${bloom(d)} < exact $hits")
    }
    // with a filter 2^22 bits wide the FP probability on this corpus is
    // ~0 — bloom must equal exact EXACTLY (hits counts included)
    val wide = Pipeline.bloomDecontam(docs, mBits = 1 << 22)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide === exact)
  }

  test("dsirWeights: target-like docs score positive, raw-like negative") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t t t t", "src0"),   // pure target language
      (2L, "r r r r", "src1"),   // pure raw-side language
      (3L, "t t t r", "src1"))   // mostly target-like
      .toDF("doc_id", "text", "source")
    val out = Pipeline.dsirWeights(docs, targetSource = "src0")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(out(1L)._1 > 0d && out(1L)._2)
    assert(out(2L)._1 < 0d && !out(2L)._2)
    assert(out(3L)._1 > 0d, "3/4 target tokens should stay positive")
    // selected ⇔ llr > 0, per row
    out.values.foreach { case (llr, sel) => assert(sel === (llr > 0d)) }
  }

  test("intradocDedup: copy-paste stutter cut, first occurrence kept, " +
      "cross-doc repeats untouched") {
    val docs = docsDf(
      1L -> "p q r s p q r s",    // verbatim self-repeat
      2L -> "a b c d e f",        // clean
      3L -> "a b c d e f")        // cross-doc dup: NOT this op's business
    val out = Pipeline.intradocDedup(docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    // doc1 grams repeat at pos 5,6 -> island [5,6] -> covers words 5..8
    assert(out(1L) === ((8L, 4L, "p q r s")))
    assert(out(2L) === ((6L, 0L, "a b c d e f")))
    assert(out(3L) === ((6L, 0L, "a b c d e f")),
      "cross-doc duplication must not trigger intra-doc removal")
    // separated repeats stay separate islands; middles survive
    val sep = Pipeline.intradocDedup(
      docsDf(9L -> "x y z m m m x y z k k k x y z"), n = 3).collect()
      .map(r => (r.getLong(2), r.getString(3))).head
    // grams "x y z" repeat at 7 and 13 -> two islands [7..9], [13..15]
    assert(sep._2 === "x y z m m m k k k")
    assert(sep._1 === 6L)
  }

  test("corpusAssemblyMl: learned gate actually gates; downstream " +
      "stages identical to the rule chain") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.table(spark, sf(), "documents")
    val scored = graft.ext.TextOps.qualityClassifier(docs)
      .localCheckpoint(true)
    val ml = Pipeline.corpusAssemblyMl(docs, scored).collect()
      .map(_.getLong(0)).toSet
    assert(ml.nonEmpty)
    // every survivor passed the learned gate
    val keepPred = scored.where(col("keep_pred"))
      .collect().map(_.getLong(0)).toSet
    assert(ml.subsetOf(keepPred))
    // swapping ONLY stage 1 reproduces the rule chain's tail: running
    // the rule e2e with the rule-keep set as the learned verdicts must
    // equal the rule e2e exactly
    val ruleAsScores = scored.select(col("doc_id"),
      col("keep_rule").as("keep_pred"))
    val viaMl = Pipeline.corpusAssemblyMl(docs, ruleAsScores).collect()
      .map(_.getLong(0)).toSet
    val rule = Pipeline.corpusAssembly(docs).collect()
      .map(_.getLong(0)).toSet
    assert(viaMl === rule, "stages 2..5 must be gate-agnostic")
  }

  test("dupProfile: hand-derivable counts; dup mass falls as n grows " +
      "past the planted span") {
    // docs share an exact 6-word span; everything else is unique
    val span = "s1 s2 s3 s4 s5 s6"
    val docs = docsDf(
      1L -> (span + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      2L -> ((1 to 10).map(i => s"b$i").mkString(" ") + " " + span))
    val out = Pipeline.dupProfile(docs, ns = Seq(3, 6, 7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // n=3: each doc contributes 4 duplicated 3-gram occurrences from
    // the span (positions fully inside it), 14 grams per doc
    assert(out(3L) === ((28L, 8L)))
    // n=6: exactly the span itself duplicates once per doc
    assert(out(6L) === ((22L, 2L)))
    // n=7: no 7-gram crosses doc boundaries identically
    assert(out(7L) === ((20L, 0L)))
  }

  test("corpusChecksum: order/partition independent; any single-doc " +
      "content change moves the checksum") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (i.toLong, "s", s"doc number $i body"))
    val a = rows.toDF("doc_id", "source", "text")
    val b = scala.util.Random.shuffle(rows).toDF("doc_id", "source", "text")
      .repartition(7)
    def cs(df: org.apache.spark.sql.DataFrame) =
      Pipeline.corpusChecksum(df).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(cs(a) === cs(b), "checksum must not depend on order/partitions")
    val mutated = rows.updated(10, (11L, "s", "doc number 11 MUTATED"))
      .toDF("doc_id", "source", "text")
    assert(cs(a)("s") !== cs(mutated)("s"), "mutation must be detected")
  }

  test("packStrided: coverage, overlap, and clipping invariants on " +
      "hand-derivable docs") {
    // 10 tokens, seqLen 4, stride 2 -> windows [0,4) [2,6) [4,8) [6,10)
    val docs = docsDf(1L -> (1 to 10).map(i => s"t$i").mkString(" "),
      2L -> "a b") // short doc: one clipped window
    val out = Pipeline.packStrided(docs, seqLen = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      (1L, 0L) -> ((0L, 4L, 4L)), (1L, 1L) -> ((2L, 6L, 4L)),
      (1L, 2L) -> ((4L, 8L, 4L)), (1L, 3L) -> ((6L, 10L, 4L)),
      (2L, 0L) -> ((0L, 2L, 2L))))
    // every token position covered by >= 1 window; consecutive windows
    // overlap by seqLen - stride
    val w1 = out.filter(_._1._1 == 1L).toSeq.sortBy(_._1._2).map(_._2)
    w1.sliding(2).foreach { case Seq(a, b) =>
      assert(b._1 - a._1 === 2L && a._2 - b._1 === 2L)
    }
  }

  test("corpusDiff: planted add/remove/modify/unchanged all classified; " +
      "token deltas signed correctly") {
    import spark.implicits._
    def snap(rows: (Long, String)*) =
      rows.map { case (id, t) => (id, "s", t) }
        .toDF("doc_id", "source", "text")
    val a = snap(1L -> "a b c", 2L -> "d e", 3L -> "f g h i")
    val b = snap(2L -> "d e", 3L -> "f g", 9L -> "new doc here")
    val out = Pipeline.corpusDiff(a, b).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      "added" -> ((1L, 3L)),      // doc 9: +3 tokens
      "removed" -> ((1L, -3L)),   // doc 1: −3 tokens
      "modified" -> ((1L, -2L)),  // doc 3: 4 → 2 tokens
      "unchanged" -> ((1L, 0L))))
  }

  test("lenPercentiles: hand-derivable rank cuts; ceil rank; ties safe") {
    import spark.implicits._
    val docs = (1 to 10).map(i =>
      (i.toLong, "s", Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val r = Pipeline.lenPercentiles(docs).collect()(0)
    // n=10: p10 -> rank ceil(1.0)=1 -> 1; p50 -> 5; p90 -> 9; p99 -> 10
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((10L, 1L, 5L, 9L, 10L)))
    // all-equal values: every percentile is that value (tie safety)
    val flat = Pipeline.lenPercentiles((1 to 7).map(i =>
      (i.toLong, "s", "a b c")).toDF("doc_id", "source", "text"))
      .collect()(0)
    assert((2 to 5).map(flat.getLong).toSet === Set(3L))
  }

  test("provenance: every drop reason attributable, priority order " +
      "fixed, kept iff all stages pass") {
    import spark.implicits._
    val good = (1 to 40).map(i => s"w$i word$i").mkString(" ")
    val evalTxt = (1 to 40).map(i => s"ev$i eword$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", "en", good),              // kept
      (2L, "srcA", "en", good),              // exact dup of 1 -> duplicate
      (3L, "srcA", "en", "too short"),       // quality
      (97L, "srcB", "en", evalTxt),          // 97 % 97 = 0 -> eval_slice
      (5L, "srcB", "en", (1 to 40).map(i => s"t$i tok$i").mkString(" ") +
        " ev1 eword1 ev2"))                  // shares 3-grams w/ 97 -> contam
      .toDF("doc_id", "source", "lang", "text")
    val out = Pipeline.provenance(docs, budget = 1000L).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(12), Option(r.getString(13))))).toMap
    assert(out(1L) === ((true, None)))
    assert(out(2L) === ((false, Some("duplicate"))))
    assert(out(3L) === ((false, Some("quality"))))
    assert(out(97L) === ((false, Some("eval_slice"))))
    assert(out(5L) === ((false, Some("contaminated"))))
    // budget: a 1-token budget drops every non-fitting doc with reason
    // 'budget' once the earlier gates pass
    val tiny = Pipeline.provenance(
      Seq((1L, "s", "en", good)).toDF("doc_id", "source", "lang", "text"),
      budget = 1L).collect()(0)
    assert(!tiny.getBoolean(12) && tiny.getString(13) === "budget")
  }

  test("cdcChunkDedup: boundaries resync after an inserted prefix — " +
      "the duplicated tail dedups where fixed-width chunking is blind") {
    // ~200 words of deterministic pseudo-text; doc 2 = prefix + same text
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = docsDf(1L -> base, 2L -> ("inserted prefix words " + base))
    val cdc = Pipeline.cdcChunkDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // content-defined: doc 2's post-resync chunks hash-match doc 1's
    assert(cdc(1L)._2 === 0L, "first doc keeps everything")
    assert(cdc(2L)._2 > 0L,
      s"CDC must catch the shifted duplicate tail: $cdc")
    // fixed-width control: the 3-word shift misaligns every 20-word
    // chunk, so fixed chunking sees zero duplication on the same input
    val fixed = Pipeline.chunkDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fixed(2L) === 0L,
      "control: fixed-width chunking must be blind to the shift")
    // identical docs still fully dedup under CDC (sanity)
    val twin = Pipeline.cdcChunkDedup(docsDf(1L -> base, 2L -> base))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(twin(2L)._1 === twin(2L)._2, "verbatim copy drops every chunk")
    assert(twin(1L)._2 === 0L)
  }

  test("gramNovelty: original doc 1.0, verbatim copy 0.0, partial copy " +
      "in between; n-grams shorter than n emit no row") {
    val docs = docsDf(
      1L -> "a b c d e f",          // all grams first-seen here
      2L -> "a b c d e f",          // verbatim copy: nothing novel
      3L -> "a b c x y z",          // half copied, half fresh
      4L -> "q r")                  // 2 words < n=3: no grams, no row
    val out = Pipeline.gramNovelty(docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((4L, 4L, 1.0)))
    assert(out(2L) === ((4L, 0L, 0.0)))
    // doc3 grams: "a b c" (seen), "b c x", "c x y", "x y z" (novel)
    assert(out(3L) === ((4L, 3L, 0.75)))
  }

  test("lenHist: power-of-2 edges honored at the boundary, totals " +
      "reconcile on real docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val boundary = Seq(
      (1L, Seq.fill(15)("w").mkString(" "), "s"),  // 15 -> bucket 0
      (2L, Seq.fill(16)("w").mkString(" "), "s"),  // 16 -> bucket 16
      (3L, Seq.fill(255)("w").mkString(" "), "s"), // 255 -> bucket 128
      (4L, Seq.fill(256)("w").mkString(" "), "s")) // 256 -> bucket 256
      .toDF("doc_id", "text", "source")
    val got = Pipeline.lenHist(boundary).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(0L -> 1L, 16L -> 1L, 128L -> 1L, 256L -> 1L))
    val docs = Tables.table(spark, sf(), "documents")
    val hist = Pipeline.lenHist(docs)
    val totals = hist.agg(sum("n_docs"), sum("total_tokens")).head()
    assert(totals.getLong(0) === docs.count())
    val want = docs.agg(
      sum(graft.ext.TextOps.tokenCount(col("text")).cast("long"))).head()
    assert(totals.getLong(1) === want.getLong(0))
  }

  /** Scalar water-filling twin of [[Pipeline.unimaxAlloc]]: process
    * languages in ascending (cap, lang) order; each takes its cap while
    * cap fits the floor fair share of what remains, and from the first
    * language whose cap exceeds its fair share onward every remaining
    * language takes that SAME frozen share. */
  private def waterfill(caps: Seq[(String, Long)], budget: Long)
      : Map[String, Long] = {
    var remaining = budget
    var m = caps.length
    var frozen: Option[Long] = None
    caps.sortBy { case (l, c) => (c, l) }.map { case (l, c) =>
      val fair = remaining / m
      if (frozen.isEmpty && c > fair) frozen = Some(fair)
      val a = frozen.getOrElse(c)
      remaining -= a
      m -= 1
      l -> a
    }.toMap
  }

  test("unimaxAlloc ≡ scalar water-filling twin on seeded random tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val nLangs = 1 + rnd.nextInt(7)
      val toks = (0 until nLangs).map(i => s"l$i" -> (1L + rnd.nextInt(40)))
      // one doc per lang with exactly that many single-char tokens
      val docs = toks.map { case (l, t) =>
        (l.drop(1).toLong, Seq.fill(t.toInt)("w").mkString(" "), l)
      }.toDF("doc_id", "text", "lang")
      val total = toks.map(_._2).sum
      val budget = total * 3 / 2 // the in-plan dial: num=3, den=2
      val want = waterfill(toks.map { case (l, t) => l -> t * 2 }, budget)
      val got = Pipeline.unimaxAlloc(docs, maxEpochs = 2)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(got === want, s"toks=$toks budget=$budget")
      // invariants: never past the cap, never past the budget in total
      got.foreach { case (l, a) =>
        assert(a <= toks.toMap.apply(l) * 2)
      }
      assert(got.values.sum <= budget)
    }
  }

  test("unimaxAlloc on real documents: cap-bound prefix, equal-share " +
      "suffix, both regimes engaged") {
    val docs = Tables.table(spark, sf(), "documents")
    val rows = Pipeline.unimaxAlloc(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(r => (r._3, r._1)) // the water-filling (cap, lang) order
    // in capacity order the cap-bound languages form a PREFIX, and every
    // budget-bound language after the crossover takes the SAME share
    val (capBound, budgetBound) = rows.span(r => r._4 === r._3)
    assert(capBound.nonEmpty, "some language must serve its full cap")
    assert(budgetBound.nonEmpty,
      "the dial must leave at least one language budget-bound")
    assert(budgetBound.map(_._4).distinct.length === 1,
      "budget-bound languages split the remainder equally")
    budgetBound.foreach(r => assert(r._4 < r._3 && r._5 < 2.0))
    capBound.foreach(r => assert(r._5 === 2.0))
    // en dominates the synthetic corpus at every SF -> never cap-bound
    assert(budgetBound.exists(_._1 == "en"))
  }

  test("mixtureTemp: strict flattening at the extremes, rank preserved, " +
      "allocation conserves the budget") {
    val docs = Tables.table(spark, sf(), "documents")
    val rows = Pipeline.mixtureTemp(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.length > 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    // sqrt-temperature flattens: the dominant language loses share, the
    // rarest gains; the ranking is preserved (monotone transform)
    assert(rows.maxBy(_._3)._4 < rows.map(_._3).max)
    assert(rows.minBy(_._3)._4 > rows.map(_._3).min)
    assert(rows.sortBy(_._3).map(_._1).toSeq ===
      rows.sortBy(_._4).map(_._1).toSeq)
    // floor'd allocations never oversubscribe one epoch of the corpus
    val nTotal = rows.map(_._2).sum
    assert(rows.map(_._5).sum <= nTotal)
    assert(rows.forall(r => r._5 > 0))
  }

  test("unimaxApply: per-lang token totals never exceed the allocation; " +
      "cap-bound langs keep every document") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf(), "documents")
    val alloc = Pipeline.unimaxAlloc(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val kept = Pipeline.unimaxApply(docs)
      .groupBy("lang").agg(
        sum(col("n_tokens")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docCounts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptCounts = Pipeline.unimaxApply(docs).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    alloc.foreach { case (l, (nTokens, a)) =>
      assert(kept(l) <= a, s"$l kept tokens past its allocation")
      if (a >= nTokens) // >= one epoch allocated -> selection keeps all
        assert(keptCounts(l) === docCounts(l), s"$l should keep all docs")
      else
        assert(keptCounts(l) < docCounts(l), s"$l must truncate")
    }
  }
}
