package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed storage for co-located per-symbol work (SURVEY §4: the
  * append-only invariant keeps the reference's files time-partitioned; at
  * Spark scale the analogous physical design is hash-bucketing on symbol
  * with (ts, seq) sort order inside each bucket).
  *
  * Every per-symbol operator — bars, book replay, events, levels — keys on
  * symbol. Reading from a table bucketed on symbol lets Catalyst drop the
  * exchange before those aggregations entirely (verified in
  * BucketingSpec), and the in-bucket (ts, seq) sort is exactly the
  * secondary-sort precondition of the ordered folds.
  */
object Bucketing {

  /** Write `updates` as a bucketed, sorted table. */
  def writeBucketed(updates: DataFrame, table: String,
      buckets: Int = 32): Unit =
    updates.write
      .mode("overwrite")
      .bucketBy(buckets, "symbol")
      .sortBy("symbol", "ts", "seq")
      .format("parquet")
      .saveAsTable(table)

  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)
}
