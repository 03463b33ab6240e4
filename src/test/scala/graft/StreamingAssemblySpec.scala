package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Pipeline, TextOps}
import graft.streaming.Streaming

/** The end-to-end STREAMING corpus assembly (VERDICT r6 #6): a real TCP
  * socket source feeds `<id>\t<source>\t<text>` lines through parse →
  * quality filter → exact content dedup → per-source token budget as ONE
  * streaming query (two chained append-mode flatMapGroupsWithState
  * stages), survivors land in parquet via foreachBatch, and the staged
  * corpus packs into loader shards — the streaming twin of PipelineSpec's
  * batch chain, asserted EQUAL to that chain on the same input.
  *
  * Determinism under arbitrary micro-batch splits: every source's lines
  * are sent in the budget's own (md5(doc_id), doc_id) order, and the
  * duplicate pair's keeper precedes its twin in BOTH id order (the batch
  * keeper rule) and send order (the streaming first-arrival rule), so any
  * batch boundary yields the same survivor set the batch chain computes.
  */
class StreamingAssemblySpec extends SparkSpec {

  private def md5Key(id: Long): String =
    graft.functions.md5Hex(id.toString.getBytes("UTF-8"))

  // 30 distinct 6-char words per doc: passes every quality rule
  // (tokens >= 25, mean token length 6, top bigram share 1/29)
  private def goodText(id: Long): String =
    (0 until 30).map(k => f"w$id%02d$k%02d").mkString(" ")

  test("parseDocLines: malformed lines drop, text keeps its own tabs") {
    import spark.implicits._
    val lines = Seq(
      "1\tweb\thello world",            // well-formed
      "2\tweb\ta\tb\tc",                // tabs INSIDE text are content
      "3\tweb\t",                       // empty text is a valid doc
      "-4\tweb\tnegative id ok",        // ids are any Long
      "notanum\tweb\ttext",             // non-numeric id -> drop
      "justtext",                       // no tabs -> drop
      "5\tonly-one-tab",                // one tab -> drop
      "\tweb\tempty id -> drop")
    val out = Streaming.parseDocLines(spark.createDataset(lines))
      .collect().map(d => d.doc_id -> ((d.source, d.text))).toMap
    assert(out === Map(
      1L -> (("web", "hello world")),
      2L -> (("web", "a\tb\tc")),
      3L -> (("web", "")),
      -4L -> (("web", "negative id ok"))))
  }

  test("socket -> parse -> quality -> dedup -> budget -> packed shards ≡ batch chain") {
    import spark.implicits._
    // web: 5 good docs + id 3 duplicating id 2's content (2 < 3 and
    // md5("2") < md5("3"), so both keeper rules pick 2); each doc is 30
    // tokens, budget 100 -> the md5-order first 3 unique web docs fit.
    // junk: below minTokens, dropped by quality. blog: fits entirely.
    val web = Seq(1L, 2L, 4L, 5L).map(i => (i, "web", goodText(i))) :+
      ((3L, "web", goodText(2)))
    val blog = Seq(10L, 11L).map(i => (i, "blog", goodText(i)))
    val junk = Seq(20L, 21L).map(i => (i, "junk", "too short"))
    val all = web ++ blog ++ junk
    val lines = all
      .groupBy(_._2).toSeq.flatMap { case (_, docs) =>
        docs.sortBy(d => (md5Key(d._1), d._1))
      }
      .map(d => s"${d._1}\t${d._2}\t${d._3}")
    val malformed = Seq("garbage with no tabs", "notanum\tweb\thello")

    val staging = Files.createTempDirectory("graft-assembly").toString
    val server = new ServerSocket(0)
    @volatile var done = false
    val feeder = new Thread(() => {
      val s = server.accept()
      val w = new PrintWriter(s.getOutputStream)
      // two waves with a pause: forces at least one cross-batch split in
      // practice while staying correct under ANY split (see scaladoc)
      val (wave1, wave2) = (lines ++ malformed).splitAt(6)
      wave1.foreach(w.println); w.flush()
      Thread.sleep(400)
      wave2.foreach(w.println); w.flush()
      while (!done) Thread.sleep(50)
      s.close(); server.close()
    }, "assembly-feeder")
    feeder.start()

    val budget = 100L
    val src = spark.readStream.format("socket")
      .option("host", "127.0.0.1")
      .option("port", server.getLocalPort).load().as[String]
    val assembled = Streaming.streamingCorpusAssembly(
      Streaming.parseDocLines(src), budget)
    val q = assembled.writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streaming.AssembledDoc],
          _: Long) =>
        ds.toDF().write.mode("append").parquet(staging)
      }.start()
    // drain until the expected survivors staged (or fail after 60 s)
    def stagedCount(): Long =
      try spark.read.parquet(staging).count() catch { case _: Throwable => 0L }
    val deadline = System.currentTimeMillis() + 60000
    while (stagedCount() < 5 && System.currentTimeMillis() < deadline) {
      q.processAllAvailable(); Thread.sleep(200)
    }
    q.stop(); done = true; feeder.join(5000)

    val streamed = spark.read.parquet(staging)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet

    // the batch chain on the SAME well-formed input
    val batchDocs = all.toDF("doc_id", "source", "text")
    val kept = batchDocs.join(TextOps.qualityFilter(batchDocs)
      .where(col("keep")).select("doc_id"), "doc_id")
    val deduped = kept.join(Dedup.exactDedup(kept)
      .select(col("keeper").as("doc_id")), "doc_id")
    val batch = Pipeline.tokenBudget(deduped, budget)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed === batch,
      s"streamed $streamed\nvs batch $batch")
    // stage-by-stage expectations hold: junk quality-dropped, dup 3
    // dedup-dropped, exactly one web doc budget-dropped, blog intact
    val ids = streamed.map(_._1)
    assert(!ids.contains(3L) && !ids.contains(20L) && !ids.contains(21L))
    assert(ids.count(Set(1L, 2L, 4L, 5L)) === 3)
    assert(ids.contains(10L) && ids.contains(11L))
    assert(streamed.filter(_._2 == "web").map(_._3).sum <= budget)

    // pack the staged survivors into loader shards; integrity holds
    val packedDir = Files.createTempDirectory("graft-assembly-pack").toString
    val survivors = spark.read.parquet(staging).select("doc_id", "text")
    val nPacked = Pipeline.writePackedShards(survivors, packedDir,
      seqLen = 64, nShards = 2)
    assert(nPacked === 5L)
    val shards = spark.read.parquet(packedDir)
    val totTokens = streamed.toSeq.map(_._3).sum
    assert(shards.agg(sum(col("n_tokens"))).head.getLong(0) === totTokens,
      "packing lost tokens")
    val man = Pipeline.packManifest(survivors, seqLen = 64, nShards = 2)
    assert(man.agg(sum(col("n_tokens"))).head.getLong(0) === totTokens)
    assert(man.where(col("n_tokens") =!= 64).count() <=
      man.select("shard").distinct().count())
  }
}
