package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Measured single-node throughput for the two streaming SERVING paths
  * the pipeline runs hottest: corpus-assembly ingest (docs/s through
  * quality → dedup → budget) and ANN query serving (queries/s against
  * the cluster-resident LSH index). The reference publishes ingest
  * throughput as its headline number (~600k tick inserts/thread/s,
  * README.md:27) — these gates put the document-pipeline equivalents on
  * record each round. Floors are deliberately conservative (~10× under
  * the measured rate on this box) so host noise cannot flake the suite;
  * the `info` lines carry the real measurement into the test report. */
class ThroughputSpec extends SparkSpec {

  test("assembly ingest: 20k docs through quality->dedup->budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 20000
    // realistic mix: 70% unique good docs, 20% duplicates, 10% junk
    val docs = (0 until n).map { i =>
      val id = i.toLong
      if (i % 10 == 9) Streaming.DocLine(id, s"src${i % 4}", "too short")
      else if (i % 5 == 4) // 10 distinct texts shared by 2k docs: dup load
        Streaming.DocLine(id, s"src${i % 4}",
          (0 until 30).map(k => f"w${i % 100}%03d$k%02d").mkString(" "))
      else // unique good docs: 6-char words keep mean token length < 8
        Streaming.DocLine(id, s"src${i % 4}",
          (0 until 30).map(k => f"u${(i * 31 + k) % 99999}%05d")
            .mkString(" "))
    }
    val in = MemoryStream[Streaming.DocLine]
    val q = Streaming.streamingCorpusAssembly(in.toDS(),
        budget = Long.MaxValue / 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("tput_assembly").start()
    val t0 = System.nanoTime()
    in.addData(docs: _*)
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val out = spark.table("tput_assembly").count()
    val rate = n / sec
    info(f"assembly: $n%,d docs in $sec%.2f s = $rate%,.0f docs/s " +
      f"($out%,d survivors)")
    assert(out > 0L && out < n.toLong, "mix must both keep and drop")
    assert(rate > 200.0, f"assembly ingest collapsed: $rate%,.0f docs/s")
  }

  test("microstructure folds: 200k ticks through tick-rule flow at " +
      "ingest rate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 200000
    // 8 symbols, 60/40 trade/level mix, drifting prices so signs flip
    val ticks = (0 until n).map { i =>
      graft.model.Update(s"sym${i % 8}",
        1700000000000L + (i / 8).toLong * 40L,
        i.toLong, is_trade = i % 5 < 3, is_bid = i % 2 == 0,
        10.0 + ((i * 7) % 13 - 6) * 0.01, 1.0 + (i % 9) * 0.1)
    }
    val in = MemoryStream[graft.model.Update]
    val q = Streaming.streamingTickRuleFlow(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("tput_micro").start()
    val t0 = System.nanoTime()
    ticks.grouped(50000).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val buckets = spark.table("tput_micro").count()
    val rate = n / sec
    info(f"tick-rule fold: $n%,d updates in $sec%.2f s = " +
      f"$rate%,.0f updates/s ($buckets%,d closed buckets)")
    assert(buckets > 0L)
    // per-micro-batch fixed costs (state store, planning) dominate at
    // this batch size, so the floor guards against fold-cost collapse,
    // not micro-batch overhead (the wire path itself is gated >=300k/s
    // end-to-end in WireSpec)
    assert(rate > 20000.0,
      f"microstructure fold collapsed: $rate%,.0f updates/s")
  }

  test("ADC serving: streamed PQ queries touch only broadcast LUTs + codes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val embs = Tables.table(spark, sf("sf0.01"), "embeddings")
      .select("vec_id", "embedding")
    val index = Streaming.adcIndexOf(embs)
    val vecs = embs
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val in = MemoryStream[(Long, Array[Double])]
    val q = Streaming.streamingAdcTopK(in.toDS(), index).writeStream
      .outputMode("append").format("memory").queryName("tput_adc").start()
    val t0 = System.nanoTime()
    in.addData(vecs.toSeq: _*)
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val hits = spark.table("tput_adc").count()
    val rate = vecs.length / sec
    info(f"adc serving: ${vecs.length}%,d queries in $sec%.2f s = " +
      f"$rate%,.0f q/s ($hits%,d hits)")
    assert(hits > 0L)
    assert(rate > 50.0, f"adc serving collapsed: $rate%,.0f q/s")
  }

  test("ANN serving: sf0.01 corpus as query stream against its index") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val embs = Tables.table(spark, sf("sf0.01"), "embeddings")
      .select("vec_id", "embedding")
    val nVec = Tables.parquetRowCount(s"${sf("sf0.01")}/embeddings.parquet")
    val planes = graft.ext.Similarity.planesFor(nVec)
    val index = Streaming.annIndexOf(embs, planes)
    val vecs = embs
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val in = MemoryStream[(Long, Array[Double])]
    val q = Streaming.streamingAnnNearest(in.toDS(), index).writeStream
      .outputMode("append").format("memory").queryName("tput_ann").start()
    val t0 = System.nanoTime()
    in.addData(vecs.toSeq: _*)
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val hits = spark.table("tput_ann").count()
    val rate = vecs.length / sec
    info(f"ann serving: ${vecs.length}%,d queries in $sec%.2f s = " +
      f"$rate%,.0f q/s ($hits%,d hits)")
    assert(hits > 0L)
    assert(rate > 50.0, f"ann serving collapsed: $rate%,.0f q/s")
  }

  test("BM25 serving: sf0.01 doc prefixes as query stream against the " +
      "inverted index (VERDICT r9 #4)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docsDf = Tables.table(spark, sf("sf0.01"), "documents")
    val index = graft.ext.TextOps.bm25Index(docsDf)
      .transform(graft.functions.checkpointed)
    // realistic query load: each doc's 6-word prefix is one query
    val queries = docsDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split("\\s+").take(6).mkString(" ")))
    val in = MemoryStream[(Long, String)]
    val q = Streaming.streamingBm25TopK(in.toDS(), index).writeStream
      .outputMode("append").format("memory").queryName("tput_bm25").start()
    val t0 = System.nanoTime()
    in.addData(queries.toSeq: _*)
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val hits = spark.table("tput_bm25").count()
    val rate = queries.length / sec
    info(f"bm25 serving: ${queries.length}%,d queries in $sec%.2f s = " +
      f"$rate%,.0f q/s ($hits%,d hits)")
    assert(hits > 0L)
    assert(rate > 50.0, f"bm25 serving collapsed: $rate%,.0f q/s")
  }

  test("quality-score serving: trained probe over a doc stream is a " +
      "stateless projection (VERDICT r9 #4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = Tables.table(spark, sf("sf0.01"), "documents")
    val w = graft.ext.TextOps.trainQualityClassifier(docsDf)
    val rows = docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Streaming.streamingQualityScore(
        in.toDS().toDF("doc_id", "text"), w)
      .writeStream.outputMode("append")
      .format("memory").queryName("tput_qs").start()
    val t0 = System.nanoTime()
    in.addData(rows.toSeq: _*)
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val out = spark.table("tput_qs").count()
    val rate = rows.length / sec
    info(f"quality serving: ${rows.length}%,d docs in $sec%.2f s = " +
      f"$rate%,.0f docs/s")
    assert(out === rows.length.toLong)
    assert(rate > 200.0, f"quality serving collapsed: $rate%,.0f docs/s")
  }

  test("OOV monitor: frozen-vocab coverage over a doc stream " +
      "(VERDICT r9 #4)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docsDf = Tables.table(spark, sf("sf0.01"), "documents")
    val vocab = graft.ext.TextOps.vocab(docsDf)
      .transform(graft.functions.localRelation)
    val rows = docsDf.select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, String, String)]
    val q = Streaming.streamingOovRate(
        in.toDS().toDF("doc_id", "source", "text"), vocab)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tput_oov").start()
    val t0 = System.nanoTime()
    in.addData(rows.toSeq: _*)
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val out = spark.table("tput_oov").count()
    val rate = rows.length / sec
    info(f"oov monitor: ${rows.length}%,d docs in $sec%.2f s = " +
      f"$rate%,.0f docs/s (${out}%,d sources)")
    assert(out > 0L)
    assert(rate > 200.0, f"oov monitor collapsed: $rate%,.0f docs/s")
  }
}
