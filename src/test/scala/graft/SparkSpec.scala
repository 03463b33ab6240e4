package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Update

/** Shared local SparkSession for all suites (getOrCreate reuses one JVM-wide
  * session; sbt forks a single test JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def updatesDf(rows: Seq[Update]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  /** The reference bar-test fixture (`tick_bars.rs:125-136` etc.):
    * 10 trades, ts=i, price=i, size=i. */
  def tenTrades(sym: String = "t"): Seq[Update] =
    (0 until 10).map(i =>
      Update(sym, i.toLong, 0L, is_trade = true, is_bid = true,
        i.toDouble, i.toDouble))

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
