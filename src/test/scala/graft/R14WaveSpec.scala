package graft

import graft.model.Update
import graft.operators.BookFeatures

/** Behavior gates for the round-14 scale-tolerant book cross-checks
  * (`q_ofi_sampled`, `q_depth_profile_sampled`): the strided bucket
  * sample must be a pure deterministic function of each symbol's
  * emitted-bucket sequence (stride = max(1, emitted/buckets), keep
  * rank % stride == 0) and the sampled output must be EXACTLY the
  * full fold output restricted to those buckets — sampling changes
  * which rows are checked, never their values. The DuckDB side of the
  * same contract (the sparse forward-fill twin) is pinned by the
  * oracle gates at sf0.01 AND sf0.1 (the dense grid twin OOMs DuckDB
  * at sf0.1 — the r13 blind spot these close). */
class R14WaveSpec extends SparkSpec {

  private val T0 = 1700000000000L

  /** A two-sided book with `n` one-minute buckets: every bucket sets
    * a fresh bid level below 100.00 and ask level above 100.02, so
    * every bucket is live on both sides and the touch drifts. */
  private def book(sym: String, n: Int): Seq[Update] =
    (0 until n).flatMap { i =>
      Seq(
        Update(sym, T0 + i * 60000L, i * 2L, is_trade = false,
          is_bid = true, 100.00 - 0.01 * (i % 7), 1.0 + i),
        Update(sym, T0 + i * 60000L + 1000L, i * 2L + 1L,
          is_trade = false, is_bid = false,
          100.02 + 0.01 * (i % 5), 2.0 + i))
    }

  test("ofiSampled: the strided sample is exactly the full fold " +
      "output at rank % stride == 0; oversized budget degenerates " +
      "to the full output") {
    val ups = book("a", 20) ++ book("b", 7)
    val full = BookFeatures.ofi(updatesDf(ups))
      .orderBy("symbol", "start").collect()
    val fullBySym = full.groupBy(_.getString(0))
    assert(fullBySym("a").length === 20 && fullBySym("b").length === 7)
    // buckets=4: symbol a stride 20/4=5 -> ranks 5,10,15,20;
    // symbol b stride 7/4=1 -> all 7 rows
    val samp = BookFeatures.ofiSampled(updatesDf(ups), buckets = 4)
      .orderBy("symbol", "start").collect()
    val expected = fullBySym("a").zipWithIndex
      .collect { case (r, i) if (i + 1) % 5 == 0 => r } ++ fullBySym("b")
    assert(samp.map(_.toString).toSeq ===
      expected.map(_.toString).toSeq)
    // a budget >= the emitted count keeps every row (stride floors at 1)
    val all = BookFeatures.ofiSampled(updatesDf(ups), buckets = 64)
      .orderBy("symbol", "start").collect()
    assert(all.map(_.toString).toSeq === full.map(_.toString).toSeq)
  }

  test("depthProfileSampled: bucket-rank striding keeps whole " +
      "8-row bucket groups and matches the full fold rows exactly") {
    val ups = book("d", 12)
    val full = BookFeatures.depthProfile(updatesDf(ups))
      .orderBy("symbol", "start", "is_bid", "band_bps").collect()
    assert(full.length === 12 * 8) // 12 buckets x 2 sides x 4 bands
    // buckets=3: stride 12/3=4 -> bucket ranks 4,8,12 survive whole
    val samp = BookFeatures.depthProfileSampled(updatesDf(ups),
        buckets = 3)
      .orderBy("symbol", "start", "is_bid", "band_bps").collect()
    val starts = full.map(_.getLong(1)).distinct.sorted
    val kept = Set(starts(3), starts(7), starts(11))
    val expected = full.filter(r => kept.contains(r.getLong(1)))
    assert(samp.length === 3 * 8)
    assert(samp.map(_.toString).toSeq ===
      expected.map(_.toString).toSeq)
  }
}
