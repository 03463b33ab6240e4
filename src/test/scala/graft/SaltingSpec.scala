package graft

import org.apache.spark.sql.functions._

import graft.model.Update
import graft.operators.Salting

/** Salted two-stage aggregation must agree with the direct aggregation on
  * skewed data (one hot key holding ~95% of rows). */
class SaltingSpec extends SparkSpec {

  private def skewed(): Seq[Update] = {
    val hot = (0 until 9500).map(i =>
      Update("hot", i.toLong, i.toLong, is_trade = true, is_bid = true,
        1.0 + i % 7, (i % 13).toDouble))
    val cold = (0 until 500).map(i =>
      Update(s"cold${i % 5}", i.toLong, i.toLong, is_trade = true,
        is_bid = true, 2.0 + i % 3, (i % 5).toDouble))
    hot ++ cold
  }

  test("saltedSumCount == direct groupBy on skewed keys") {
    val df = updatesDf(skewed())
    val salted = Salting.saltedSumCount(df, "symbol", "size")
      .orderBy("symbol").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val direct = df.groupBy("symbol")
      .agg(sum("size").as("sum"), count(lit(1)).as("cnt"))
      .orderBy("symbol").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.map(_._1).toSeq === direct.map(_._1).toSeq)
    salted.zip(direct).foreach { case ((_, s1, c1), (_, s2, c2)) =>
      assert(c1 === c2)
      assert(math.abs(s1 - s2) < 1e-9) // integral sizes: sums are exact
    }
  }

  test("saltedMinMax == direct groupBy; salted sum keeps both agg stages") {
    val df = updatesDf(skewed())
    val q = Salting.saltedMinMax(df, "symbol", "price")
    val got = q.orderBy("symbol").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val want = df.groupBy("symbol")
      .agg(min("price").as("min"), max("price").as("max"))
      .orderBy("symbol").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
    // the two-stage shape must survive optimization — a collapsed plan
    // would put the hot key back on one reducer
    val sumPlan = Salting.saltedSumCount(df, "symbol", "size")
      .queryExecution.optimizedPlan.toString
    assert(sumPlan.linesIterator.count(_.contains("Aggregate [")) >= 2,
      s"salted sum collapsed to one aggregate:\n$sumPlan")
  }
}
