package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/** General relational surface the Spark engine gets beyond the reference
  * (SURVEY §2.3 notes the reference has no joins — these demonstrate the
  * capability on the star schema) plus the concat-dedup tool (J2/S14). */
object RelationalQueries {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String,
      name: String) = Tables.table(s, dir, name)

  // The fact tables ship as one parquet row group at every driver SF,
  // so the scan — and with it the decimal-exact partial aggregation of
  // q1/revenue/topk — is ONE task (guide §2.5 input skew; measured
  // q1_agg 1.17→0.66 s, q_join_revenue 1.5→1.05 s at sf0.1/local[32]).
  // spreadBy is a no-op once the input is split; hashing on the join
  // key keeps the join's co-partitioning usable downstream.
  private def tS(s: org.apache.spark.sql.SparkSession, dir: String,
      name: String, key: String) =
    Tables.spreadBy(Tables.table(s, dir, name), key)

  val all: Seq[Q] = Seq(

    // TPC-H Q1-flavored pricing summary (decimal-exact sums)
    Q("q1_agg",
      (s, dir) => tS(s, dir, "lineitem", "l_orderkey")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          exactSumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
          | CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
          | CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
          | CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2))
          |   * CAST(CAST(1.0 - l_discount AS VARCHAR) AS DECIMAL(16,4))) AS DOUBLE) AS sum_disc_price,
          | count(*) AS count_order
          |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""
        .stripMargin.replace('\n', ' '))),

    // multi-way join with broadcast dims: revenue per nation
    Q("q_join_revenue",
      (s, dir) => tS(s, dir, "lineitem", "l_orderkey")
        .join(tS(s, dir, "orders", "o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(exactSumProduct(col("l_extendedprice"),
          lit(1.0) - col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name,
          | CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2))
          |   * CAST(CAST(1.0 - l_discount AS VARCHAR) AS DECIMAL(16,4))) AS DOUBLE) AS revenue,
          | count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace('\n', ' '))),

    // top-k with deterministic tie-break
    Q("q_topk_customers",
      (s, dir) => tS(s, dir, "lineitem", "l_orderkey")
        .join(tS(s, dir, "orders", "o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(exactSumProduct(col("l_extendedprice"),
          lit(1.0) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10),
      Some("""SELECT o_custkey,
          | CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2))
          |   * CAST(CAST(1.0 - l_discount AS VARCHAR) AS DECIMAL(16,4))) AS DOUBLE) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY revenue DESC, o_custkey LIMIT 10"""
        .stripMargin.replace('\n', ' '))),

    // J2/S14 — dtfconcat: union two overlapping slices, dedup identical
    // rows, re-sort (`dtfconcat.rs:12-144`)
    Q("q_concat_dedup",
      (s, dir) => {
        val u = Tables.updates(s, dir)
        val mid = 1705276800000L // 2024-01-15
        val f1 = u.where(col("ts") < 1705708800000L)  // .. Jan 20
        val f2 = u.where(col("ts") >= mid)            // Jan 15 ..
        f1.unionByName(f2).dropDuplicates()
          .orderBy("ts", "seq")
      },
      Some(Tables.withUpdates(
        """SELECT * FROM (
          | SELECT * FROM updates WHERE ts < 1705708800000
          | UNION
          | SELECT * FROM updates WHERE ts >= 1705276800000)
          |ORDER BY ts, seq""".stripMargin.replace('\n', ' '))))
  )
}
