package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** VERDICT r7 #1 — the streaming/TTL family on the RocksDB state store.
  *
  * Everything stateful in [[graft.streaming.Streaming]] is designed so
  * state is bounded (bucket occupancy, retention horizon), but a 100-TB
  * deployment cannot keep even bounded state on executor HEAP — the
  * default HDFSBackedStateStoreProvider holds every version of every
  * bucket in JVM maps. Production runs
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` (off-heap, spillable, incremental
  * checkpointing); these gates prove the ops run UNCHANGED under it —
  * same decisions, same pair sets, same state-expiry semantics — and
  * that the provider actually engaged (RocksDB custom metrics in the
  * query progress, not a silently-ignored conf).
  *
  * The last gate is the state-SIZE audit the r7 verdict asked for: the
  * TTL family's state tracks the retention horizon, not the stream
  * length — measured via `numRowsTotal` at 1× vs 4× stream length under
  * RocksDB, where eviction happens through real EventTimeTimeout firings.
  */
class RocksDbStateSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    spark.conf.set(ProviderKey, RocksDb)
    try body finally spark.conf.unset(ProviderKey)
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("TTL exact dedup under RocksDB: expiry + re-admission semantics intact") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Streaming.TimedDoc]
      val q = Streaming.streamingExactDedupTtl(in.toDS(), ttlSecs = 500L)
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbttl").start()
      in.addData(Streaming.TimedDoc(1L, "content X", ts(1000)),
        Streaming.TimedDoc(2L, "content X", ts(1001)))
      q.processAllAvailable()
      in.addData(Streaming.TimedDoc(3L, "other Y", ts(2000)))
      q.processAllAvailable()
      in.addData(Streaming.TimedDoc(4L, "other Z", ts(2100)))
      q.processAllAvailable()
      // X's keeper state expired (wm 2000 > 1001+500): re-admitted fresh
      in.addData(Streaming.TimedDoc(5L, "content X", ts(2105)),
        Streaming.TimedDoc(6L, "content X", ts(2106)))
      q.processAllAvailable()
      // the provider must have ENGAGED: RocksDB reports its own custom
      // metrics (rocksdbGet/Put/commit latencies) in every progress
      val progress = q.lastProgress.json
      q.stop()
      assert(progress.toLowerCase.contains("rocksdb"),
        s"no RocksDB metrics in progress — provider not engaged: $progress")
      val got = spark.table("rdbttl").as[Streaming.DedupDecision]
        .collect().map(d => d.doc_id -> ((d.keeper, d.keep))).toMap
      assert(got === Map(
        1L -> ((1L, true)), 2L -> ((1L, false)),
        3L -> ((3L, true)), 4L -> ((4L, true)),
        5L -> ((5L, true)), 6L -> ((5L, false))),
        s"got $got")
    }
  }

  test("TTL simhash + minhash near-dup under RocksDB: pair sets unchanged") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val text = "alpha beta gamma delta epsilon"
      val inS = MemoryStream[(Long, String, java.sql.Timestamp)]
      val qS = Streaming.streamingSimhashNearDupTtl(inS.toDS(), ttlSecs = 500L)
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbsim").start()
      val inM = MemoryStream[(Long, String, java.sql.Timestamp)]
      val qM = Streaming.streamingMinhashNearDupTtl(inM.toDS(), ttlSecs = 500L)
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbmh").start()
      for (in <- Seq(inS, inM)) {
        in.addData((1L, text, ts(1000)), (2L, text, ts(1001)))
      }
      qS.processAllAvailable(); qM.processAllAvailable()
      for (in <- Seq(inS, inM)) {
        in.addData((3L, "totally different words here", ts(2000)))
      }
      qS.processAllAvailable(); qM.processAllAvailable()
      // 1 and 2 fell out of the horizon: 4 pairs with nobody, 5 with 4
      for (in <- Seq(inS, inM)) { in.addData((4L, text, ts(2100))) }
      qS.processAllAvailable(); qM.processAllAvailable()
      for (in <- Seq(inS, inM)) { in.addData((5L, text, ts(2150))) }
      qS.processAllAvailable(); qM.processAllAvailable()
      assert(qS.lastProgress.json.toLowerCase.contains("rocksdb"))
      assert(qM.lastProgress.json.toLowerCase.contains("rocksdb"))
      qS.stop(); qM.stop()
      val simPairs = spark.table("rdbsim").as[Streaming.SimPair]
        .collect().map(p => (p.doc_a, p.doc_b)).toSet
      assert(simPairs === Set((1L, 2L), (4L, 5L)), s"simhash got $simPairs")
      val mhPairs = spark.table("rdbmh").as[Streaming.MhPair].collect()
      assert(mhPairs.map(p => (p.doc_a, p.doc_b)).toSet ===
        Set((1L, 2L), (4L, 5L)), s"minhash got ${mhPairs.toSeq}")
      assert(mhPairs.forall(p => p.jaccard == 1.0 && p.inter == p.uni))
    }
  }

  test("stateful book top under RocksDB: cross-batch book mutation intact") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, String)]
      val q = Streaming.streamingBookTop(Streaming.parseLines(in.toDS()))
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbtops").start()
      in.addData(
        ("b1", "1505177459.658, 1, f, t, 10.00, 5.0;"),
        ("b1", "1505177459.659, 2, f, f, 11.00, 3.0;"))
      q.processAllAvailable()
      in.addData(
        ("b1", "1505177460.000, 3, f, f, 11.00, 0.0;"),
        ("b1", "1505177460.001, 4, f, f, 12.00, 1.0;"),
        ("b1", "1505177460.002, 5, f, t, 10.50, 2.0;"))
      q.processAllAvailable()
      assert(q.lastProgress.json.toLowerCase.contains("rocksdb"))
      q.stop()
      val all = spark.table("rdbtops").as[Streaming.BookTop].collect()
      assert(all.length === 2)
      assert(all.last.best_bid === 10.5 && all.last.best_ask === 12.0)
    }
  }

  test("streaming minhash near-dup under RocksDB ≡ batch pair set") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      // the heaviest state payload in the family (per-member shingle
      // arrays) — exercises RocksDB round-trip serialization of the
      // nested state rows, not just scalar keepers
      val docs = Seq(
        1L -> "alpha beta gamma delta epsilon",
        2L -> "alpha beta gamma delta epsilon",
        3L -> "alpha beta gamma delta zeta",
        4L -> "omega psi chi phi upsilon")
      val wave2 = Seq(
        5L -> "alpha beta gamma delta epsilon",
        6L -> "totally different words here")
      val in = MemoryStream[(Long, String)]
      val q = Streaming.streamingMinhashNearDup(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbmh2").start()
      in.addData(docs: _*)
      q.processAllAvailable()
      in.addData(wave2: _*)
      q.processAllAvailable()
      assert(q.lastProgress.json.toLowerCase.contains("rocksdb"))
      q.stop()
      val got = spark.table("rdbmh2").as[Streaming.MhPair].collect()
        .map(p => (p.doc_a, p.doc_b, p.inter, p.uni, p.jaccard)).toSet
      val batch = graft.ext.Dedup.minhashNearDup(
        (docs ++ wave2).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got === batch, s"streamed $got vs batch $batch")
    }
  }

  test("IVF serving under RocksDB ≡ batch IVF top-k") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      implicit val sqlCtx = spark.sqlContext
      val embs = Tables.table(spark, sf(), "embeddings")
        .select("vec_id", "embedding")
      val index = Streaming.ivfIndexOf(embs, nCentroids = 8)
      val queries = embs
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().filter(_._1 < 10L)
      val in = MemoryStream[(Long, Array[Double])]
      val q = Streaming.streamingIvfTopK(in.toDS(), index).writeStream
        .outputMode("append").format("memory").queryName("rdbivf").start()
      val (w1, w2) = queries.splitAt(5)
      in.addData(w1.toSeq: _*)
      q.processAllAvailable()
      in.addData(w2.toSeq: _*)
      q.processAllAvailable()
      assert(q.lastProgress.json.toLowerCase.contains("rocksdb"))
      q.stop()
      val got = spark.table("rdbivf").as[Streaming.AnnHit].collect()
        .map(h => (h.q_id, h.rank.toLong, h.vec_id, h.sim)).toSet
      val batch = graft.ext.Similarity.ivfTopK(embs).collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
          r.getDouble(3))).toSet
      assert(got === batch, s"${got.size} streamed vs ${batch.size} batch")
    }
  }

  /** Feed `n` all-distinct docs, 1 doc/event-second in 200-doc batches,
    * TTL = 100 s; returns the state-store row count after the final
    * watermark advance. With eviction working, live state ≈ the ~101
    * contents inside the rolling horizon — independent of `n`. */
  private def ttlStateRows(n: Int): Long = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.TimedDoc]
    val q = Streaming.streamingExactDedupTtl(in.toDS(), ttlSecs = 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName(s"rdbaudit$n").start()
    (0 until n).grouped(200).foreach { chunk =>
      in.addData(chunk.map(i =>
        Streaming.TimedDoc(i.toLong, s"content $i", ts(i.toLong))): _*)
      q.processAllAvailable()
    }
    val rows = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    rows
  }

  test("state-size audit: TTL state tracks the retention horizon, not stream length") {
    withRocksDb {
      val at1x = ttlStateRows(800)
      val at4x = ttlStateRows(3200)
      // horizon = 100 s at 1 doc/s -> ~101 live contents either way; a
      // provider (or op) that stopped evicting would show ~n instead
      assert(at1x <= 150L, s"1x stream left $at1x state rows (horizon ~101)")
      assert(at4x <= 150L, s"4x stream left $at4x state rows (horizon ~101)")
      assert(at4x <= at1x + 50L,
        s"state grew with stream length: $at1x -> $at4x")
    }
  }

  test("round-9 scorers under RocksDB: chunk dedup, DSIR, bloom unchanged") {
    withRocksDb {
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      // chunk dedup: the planted keep-first fixture, cross-batch keeper
      val inC = MemoryStream[(Long, String)]
      val qC = Streaming.streamingChunkDedup(inC.toDS(), width = 2)
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbchunk").start()
      inC.addData(0L -> "a b c d", 1L -> "a b x", 2L -> "c d c d")
      qC.processAllAvailable()
      inC.addData(3L -> "a b") // later batch: dup of (0,0) still drops
      qC.processAllAvailable()
      val progC = qC.lastProgress.json
      qC.stop()
      assert(progC.toLowerCase.contains("rocksdb"),
        "chunk dedup: provider not engaged")
      val gotC = spark.table("rdbchunk").as[Streaming.ChunkDecision]
        .collect().map(d => (d.doc_id, d.chunk_idx) -> d.keep).toMap
      assert(gotC === Map((0L, 0L) -> true, (0L, 1L) -> true,
        (1L, 0L) -> false, (1L, 1L) -> true,
        (2L, 0L) -> false, (2L, 1L) -> false, (3L, 0L) -> false))

      // DSIR + bloom: real-corpus replay must equal the batch ops
      val docsDf = Tables.table(spark, sf("sf0.001"), "documents")
      val docs = docsDf.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect()

      val inD = MemoryStream[(Long, String)]
      val qD = Streaming.streamingDsirScore(inD.toDS(),
          graft.ext.Pipeline.dsirModel(docsDf))
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbdsir").start()
      inD.addData(docs: _*)
      qD.processAllAvailable()
      val progD = qD.lastProgress.json
      qD.stop()
      assert(progD.toLowerCase.contains("rocksdb"),
        "dsir: provider not engaged")
      val gotD = spark.table("rdbdsir").as[Streaming.DsirScore].collect()
        .map(s => s.doc_id -> ((s.n_words, s.llr, s.selected))).toMap
      val batchD = graft.ext.Pipeline.dsirWeights(docsDf).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
      assert(gotD === batchD)

      val inB = MemoryStream[(Long, String)]
      val qB = Streaming.streamingBloomDecontam(inB.toDS(),
          graft.ext.Pipeline.bloomBits(
            docsDf.where(col("doc_id") % 97 === 0)).localCheckpoint(true))
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbbloom").start()
      inB.addData(docs.filter(_._1 % 97 != 0): _*)
      qB.processAllAvailable()
      val progB = qB.lastProgress.json
      qB.stop()
      assert(progB.toLowerCase.contains("rocksdb"),
        "bloom: provider not engaged")
      val gotB = spark.table("rdbbloom").as[Streaming.BloomHit].collect()
        .map(h => h.doc_id -> h.bloom_hits).toMap
      val batchB = graft.ext.Pipeline.bloomDecontam(docsDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotB === batchB)
    }
  }

  test("late round-9 scorers under RocksDB: unimax budget crosses " +
      "batches, ppl buckets replay ≡ batch") {
    withRocksDb {
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      // unimax: per-lang cum state must survive the batch boundary
      val alloc = Seq(("xx", 10L)).toDF("lang", "alloc")
        .localCheckpoint(true)
      val inU = MemoryStream[(Long, String, String)]
      val qU = Streaming.streamingUnimaxApply(inU.toDS(), alloc)
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbunimax").start()
      inU.addData((1L, "a b c d", "xx"), (2L, "e f g h", "xx"))
      qU.processAllAvailable()
      inU.addData((3L, "i j k l", "xx")) // cum 12 > 10: over budget
      qU.processAllAvailable()
      val progU = qU.lastProgress.json
      qU.stop()
      assert(progU.toLowerCase.contains("rocksdb"),
        "unimax: provider not engaged")
      val gotU = spark.table("rdbunimax").as[Streaming.UnimaxDoc]
        .collect().map(d => d.doc_id -> d.cum_tokens).toMap
      assert(gotU.keySet === Set(1L, 2L) && gotU.values.max === 8L,
        s"cross-batch budget state broken: $gotU")

      // ppl buckets: planted one-lang corpus, replay ≡ batch terciles
      val corpus = Seq(
        (1L, "a a a a a a", "xx"), (2L, "a a a a a b", "xx"),
        (3L, "a a a a b b", "xx"), (4L, "a a a b b b", "xx"),
        (5L, "a a b b b c", "xx"), (6L, "a b c a b c", "xx"))
      val corpusDf = corpus.toDF("doc_id", "text", "lang")
      val inP = MemoryStream[(Long, String, String)]
      val qP = Streaming.streamingPplBucket(inP.toDS(),
          Streaming.pplBoundsOf(corpusDf))
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbppl").start()
      inP.addData(corpus: _*)
      qP.processAllAvailable()
      val progP = qP.lastProgress.json
      qP.stop()
      assert(progP.toLowerCase.contains("rocksdb"),
        "ppl: provider not engaged")
      val gotP = spark.table("rdbppl").as[Streaming.PplBucketScore]
        .collect().map(s => s.doc_id -> s.bucket).toMap
      val batchP = graft.ext.TextOps.pplBuckets(corpusDf).collect()
        .map(r => r.getLong(0) -> r.getString(4)).toMap
      assert(gotP === batchP && batchP.values.toSet ===
        Set("head", "middle", "tail"))
    }
  }

  test("CDC chunk dedup under RocksDB: cross-batch resync decisions " +
      "intact, batch reconstruction unchanged") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val base = (1 to 200).map(i => s"tok$i").mkString(" ")
      val docs = Seq(1L -> base,
        2L -> (1 to 50).map(i => s"o$i").mkString(" "))
      val in = MemoryStream[(Long, String)]
      val q = Streaming.streamingCdcChunkDedup(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("rdbcdc").start()
      in.addData(docs: _*)
      q.processAllAvailable()
      in.addData(9L -> ("banner words here " + base))
      q.processAllAvailable()
      val prog = q.lastProgress.json
      q.stop()
      assert(prog.toLowerCase.contains("rocksdb"),
        "cdc: provider not engaged")
      val got = spark.table("rdbcdc").as[Streaming.ChunkDecision]
        .collect()
      val byDoc = got.filter(_.doc_id < 9L).groupBy(_.doc_id)
        .map { case (d, cs) =>
          d -> ((cs.length.toLong, cs.count(!_.keep).toLong))
        }
      val batch = graft.ext.Pipeline.cdcChunkDedup(
        docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(byDoc === batch)
      assert(got.filter(_.doc_id == 9L).exists(!_.keep),
        "resynced tail chunks must drop against RocksDB-held state")
    }
  }

  test("streaming realized vol under RocksDB: fold state crosses " +
      "micro-batches, emitted buckets == batch op") {
    withRocksDb {
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ups = Tables.updatesDs(spark, sf("sf0.001")).collect()
        .sortBy(u0 => (u0.ts, u0.seq))
      val batch = graft.operators.Microstructure
        .realizedVol(updatesDf(ups.toSeq)).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      val lastPerSym = batch.keys.groupBy(_._1).view
        .mapValues(_.map(_._2).max).toMap
      val in = MemoryStream[graft.model.Update]
      val q = Streaming.streamingRealizedVol(in.toDS()).writeStream
        .outputMode("append").format("memory").queryName("rdbrv").start()
      // three micro-batches: the per-symbol (lastPrice, bucket) state
      // must survive in RocksDB between them
      ups.grouped(math.max(1, ups.length / 3)).foreach { chunk =>
        in.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      val progress = q.lastProgress.json
      q.stop()
      assert(progress.contains("rocksdb"),
        s"RocksDB provider did not engage:\n$progress")
      val got = spark.table("rdbrv").as[Streaming.RvBucket].collect()
        .map(r => (r.symbol, r.start) ->
          ((r.n_returns, r.sum_sq_q, r.rv))).toMap
      val wantKeys = batch.keySet
        .filterNot { case (s0, b) => lastPerSym(s0) == b }
      assert(got.keySet === wantKeys)
      wantKeys.foreach(k => assert(got(k) === batch(k), s"drift at $k"))
    }
  }

  test("streaming twap quote under RocksDB: open-interval state crosses " +
      "micro-batches, emitted buckets == batch op (VERDICT r10 #3)") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ups = Tables.updatesDs(spark, sf("sf0.001")).collect()
        .sortBy(u0 => (u0.ts, u0.seq))
      val batch = graft.operators.Microstructure
        .twapQuote(updatesDf(ups.toSeq)).collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
      val lastPerKey = batch.keys.groupBy(k => (k._1, k._2)).view
        .mapValues(_.map(_._3).max).toMap
      val in = MemoryStream[graft.model.Update]
      val q = Streaming.streamingTwapQuote(in.toDS()).writeStream
        .outputMode("append").format("memory").queryName("rdbtwap")
        .start()
      // three micro-batches: the per-(symbol, side) open interval must
      // survive in RocksDB between them
      ups.grouped(math.max(1, ups.length / 3)).foreach { chunk =>
        in.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      val progress = q.lastProgress.json
      q.stop()
      assert(progress.contains("rocksdb"),
        s"RocksDB provider did not engage:\n$progress")
      val got = spark.table("rdbtwap").as[Streaming.TwapBucket].collect()
        .map(r => (r.symbol, r.is_bid, r.start) ->
          ((r.n_events, r.dur_ms, r.twap))).toMap
      val wantKeys = batch.keySet
        .filterNot(k => lastPerKey((k._1, k._2)) == k._3)
      assert(got.keySet === wantKeys)
      wantKeys.foreach(k => assert(got(k) === batch(k), s"drift at $k"))
    }
  }
}
