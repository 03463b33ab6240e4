package graft

import graft.operators.RebinnedBook

/** Invariant checks mirroring the reference's rebinned-book tests
  * (`orderbook.rs:298-315`): bin-count bounds and carry semantics. */
class RebinnedBookSpec extends SparkSpec {

  test("rebinned book bin-count invariants on sf0.001") {
    val stepBins = 10
    val tickBins = 20
    val df = RebinnedBook.rebinned(Tables.updates(spark, sf()),
      decimals = 2, stepBins = stepBins, tickBins = tickBins, m = 3.0)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // <= stepBins-1 time bins per symbol
    val binsPerSym = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).distinct.size)
    binsPerSym.foreach { case (_, n) => assert(n <= stepBins - 1) }
    // <= tickBins price levels per (symbol, time_bin, side)
    rows.groupBy(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .foreach { case (_, g) => assert(g.length <= tickBins) }
    // no zero-size levels are emitted (clean())
    rows.foreach(r => assert(r.getDouble(4) != 0.0))
  }

  test("levels matrix pivot: one row per (symbol, price_bin)") {
    val rel = graft.operators.HistogramOps.levels(
      Tables.updates(spark, sf()), stepBins = 10, tickBins = 20, m = 3.0)
    val mat = graft.operators.HistogramOps.levelsMatrix(
      Tables.updates(spark, sf()), stepBins = 10, tickBins = 20, m = 3.0)
    val relKeys = rel.select("symbol", "price_bin").distinct().count()
    assert(mat.count() === relKeys)
    // pivot columns = symbol, price_bin + one per distinct time bin
    val nTimeBins = rel.select("time_bin").distinct().count()
    assert(mat.columns.length.toLong === 2L + nTimeBins)
  }
}
