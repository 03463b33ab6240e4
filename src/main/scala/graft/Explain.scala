package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: prints formatted physical plans for the headline
  * queries so pushdown/broadcast/codegen can be audited (builder brief:
  * ".explain the plan and iterate until it's the plan you'd want"). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_range_scan", "q_time_bars", "q1_agg", "q_join_revenue",
        "q_orderbook")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableNanos(spark)
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      qs(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
