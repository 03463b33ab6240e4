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

  test("fact-fact join over tables bucketed on orderkey plans with no fact-side exchange") {
    // The 100×-scale lever for the relational surface (VERDICT r4 #6): the
    // lineitem⋈orders shuffle in q_join_revenue / q_topk_customers is the
    // ONLY big exchange in those plans — pre-bucketing both facts on the
    // join key removes it entirely.
    val li = "graft_bucketed_lineitem"
    val ord = "graft_bucketed_orders"
    try {
      Bucketing.writeBucketedBy(
        Tables.table(spark, sf(), "lineitem"), li,
        Seq("l_orderkey"), buckets = 8)
      Bucketing.writeBucketedBy(
        Tables.table(spark, sf(), "orders"), ord,
        Seq("o_orderkey"), buckets = 8)
      // hint("merge") forces the sort-merge path a 100 TB fact-fact join
      // takes anyway — at this toy SF Spark would broadcast orders, which
      // is exactly the plan that stops existing at scale
      val joined = Bucketing.readBucketed(spark, li)
        .join(Bucketing.readBucketed(spark, ord).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the join itself must not shuffle either fact; the only allowed
      // exchange is the one introduced by the groupBy on o_custkey
      assert(plan.contains("SortMergeJoin"), s"no SMJ in:\n$plan")
      assert(!"hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findFirstIn(plan).isDefined,
        s"bucketed fact-fact join still shuffles a fact side:\n$plan")
      // the unbucketed plan shuffles BOTH facts on the join key
      val unbucketed = Tables.table(spark, sf(), "lineitem")
        .join(Tables.table(spark, sf(), "orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert("hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(unbucketed).length >= 2, s"expected both facts shuffled:\n$unbucketed")
      // results agree with the unbucketed computation
      val a = joined.orderBy("o_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val b = Tables.table(spark, sf(), "lineitem")
        .join(Tables.table(spark, sf(), "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_items"))
        .orderBy("o_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(a === b)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $li")
      spark.sql(s"DROP TABLE IF EXISTS $ord")
    }
  }
}
