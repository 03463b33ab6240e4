package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed tables must eliminate the exchange before per-symbol
  * aggregation — the physical-design half of the 100 TB posture. */
class BucketingSpec extends SparkSpec {

  test("groupBy(symbol) over a bucketed table plans without an exchange") {
    val table = "graft_bucketing_spec"
    try {
      Bucketing.writeBucketed(Tables.updates(spark, sf()), table, buckets = 4)
      val agg = Bucketing.readBucketed(spark, table)
        .groupBy("symbol")
        .agg(count(lit(1)).as("n"), sum("size").as("vol"))
      val plan = agg.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n$plan")
      // and the same aggregation over the unbucketed source DOES shuffle
      val unbucketed = Tables.updates(spark, sf())
        .groupBy("symbol")
        .agg(count(lit(1)).as("n"), sum("size").as("vol"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(unbucketed.contains("Exchange"))
      // results agree
      val a = agg.orderBy("symbol").collect().map(r =>
        (r.getString(0), r.getLong(1)))
      val b = Tables.updates(spark, sf()).groupBy("symbol").count()
        .orderBy("symbol").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(a === b)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
