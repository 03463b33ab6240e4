package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Compaction

/** Compaction: many small flush files -> few sorted files, data identical,
  * per-file ts ranges disjoint (the S4 pruning contract). */
class CompactionSpec extends SparkSpec {

  test("compact merges flush files, preserves data and disjoint ts ranges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/book"
    // 12 tiny "flushes", interleaved ts ranges like an out-of-order ingest
    (0 until 12).foreach { i =>
      (0 until 50).map(j => (i * 1000L + j * 13L, (i * 50 + j).toLong,
          1.0 + j, 2.0))
        .toDF("ts", "seq", "price", "size")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val beforeData = spark.read.parquet(dir)
      .orderBy("ts", "seq").collect().toSeq
    val beforeFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(beforeFiles >= 12)

    val (nBefore, nAfter) = Compaction.compact(spark, dir, targetBytes = 64L << 10)
    assert(nBefore === beforeFiles)
    assert(nAfter < nBefore, s"no compaction: $nBefore -> $nAfter")

    val afterData = spark.read.parquet(dir)
      .orderBy("ts", "seq").collect().toSeq
    assert(afterData === beforeData, "compaction changed data")

    // pruning contract: per-file ts ranges must not overlap
    val ranges = Compaction.fileTsRanges(spark, dir)
      .orderBy("min_ts").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      case _ => ()
    }
  }
}
