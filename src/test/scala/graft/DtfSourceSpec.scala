package graft

import java.nio.file.Files

import graft.dtf.DtfCodec
import graft.model.Update
import graft.sources.{DtfDataSource, DtfScan}

/** DataSource V2 for `.dtf` files: `spark.read.format("dtf")` — schema,
  * row parity with the codec, and header-stat file pruning (the Spark
  * rebuild of `scan_files_for_range`, `file_format.rs:822-874`). */
class DtfSourceSpec extends SparkSpec {

  private val Fixture = "/root/reference/test/test-data/bnc_zrx_btc.dtf"

  test("format(\"dtf\") reads the reference fixture with the update schema") {
    val df = spark.read.format("dtf").load(Fixture)
    assert(df.schema === DtfDataSource.Schema)
    val ups = DtfCodec.decode(Fixture)
    assert(df.count() === ups.size.toLong)
    val first = df.orderBy("ts", "seq").head()
    val expect = ups.minBy(u => (u.ts, u.seq))
    assert(first.getAs[String]("symbol") === expect.symbol)
    assert(first.getAs[Long]("ts") === expect.ts)
    assert(first.getAs[Double]("price") === expect.price)
  }

  test("ts predicates prune whole files by header stats") {
    val dir = Files.createTempDirectory("graft-dtfsrc").toString
    def up(ts: Long, seq: Long) =
      Update("s", ts, seq, is_trade = true, is_bid = true, 1.0, 2.0)
    DtfCodec.encode(s"$dir/a.dtf", "s", (0 until 50).map(i => up(1000L + i, i.toLong)))
    DtfCodec.encode(s"$dir/b.dtf", "s", (0 until 50).map(i => up(9000L + i, i.toLong)))

    // partition planning prunes the file whose [min,max] misses the range
    assert(new DtfScan(dir, 0, 2000).planInputPartitions().length === 1)
    assert(new DtfScan(dir, 8000, 10000).planInputPartitions().length === 1)
    assert(new DtfScan(dir, 0, 10000).planInputPartitions().length === 2)
    assert(new DtfScan(dir, 3000, 8000).planInputPartitions().length === 0)

    // end-to-end: pushed filters prune AND rows still filter exactly
    val df = spark.read.format("dtf").load(dir)
      .where("ts >= 1010 and ts <= 1020")
    assert(df.count() === 11L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dtf") || plan.contains("BatchScan"), plan)

    // directory read with no predicate sees both files
    assert(spark.read.format("dtf").load(dir).count() === 100L)
  }
}
