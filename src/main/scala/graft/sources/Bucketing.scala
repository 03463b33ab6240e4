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

  /** General bucketed writer for the star schema: pre-bucketing BOTH fact
    * tables on the join key (lineitem ⋈ orders on orderkey) removes the
    * only large exchange in the revenue/top-k join plans — at 100 TB the
    * facts are written once and joined shuffle-free forever after
    * (BucketingSpec gates the no-Exchange plan). Matching bucket COUNTS
    * on both sides is required for the exchange to drop. */
  def writeBucketedBy(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)
}
