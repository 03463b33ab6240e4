package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Update
import graft.operators.{FoldBars, TickBars, TimeBars}

/** ScalaCheck properties for the bar samplers (SURVEY §5: property-test the
  * reset-semantics folds against invariants any scalar reimplementation
  * must share). Volumes are conserved, boundaries are monotone, and the
  * distributed fold is insensitive to physical input order. Plain
  * `Gen` + fixed seeds (scalatestplus is not in the offline cache);
  * deterministic across runs. */
class BarPropertySpec extends SparkSpec {

  private val genUpdates: Gen[List[Update]] = for {
    n <- Gen.choose(1, 120)
    ups <- Gen.listOfN(n, for {
      sym <- Gen.oneOf("a", "b")
      ts <- Gen.choose(0L, 5000L)
      seq <- Gen.choose(0L, 50L)
      isTrade <- Gen.prob(0.7)
      price <- Gen.choose(1, 400).map(_ / 4.0)
      size <- Gen.choose(1, 80).map(_ / 8.0)
    } yield Update(sym, ts, seq, isTrade, is_bid = true, price, size))
  } yield ups.distinctBy(u => (u.symbol, u.ts, u.seq))

  private def cases(n: Int): Seq[List[Update]] =
    (0 until n).flatMap(i =>
      genUpdates.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def tradeVolBySym(ups: Seq[Update]): Map[String, Double] =
    ups.filter(_.is_trade).groupBy(_.symbol)
      .view.mapValues(_.map(_.size).sum).toMap

  private def barVolBySym(bars: Array[org.apache.spark.sql.Row])
      : Map[String, Double] =
    bars.groupBy(_.getAs[String]("symbol"))
      .view.mapValues(_.map(_.getAs[Double]("volume")).sum).toMap

  test("volume bars conserve trade volume; boundaries monotone per symbol") {
    cases(10).foreach { ups =>
      val bars = FoldBars.volumeBars(updatesDf(ups), interval = 10.0)
        .orderBy("symbol", "start", "end").collect()
      tradeVolBySym(ups).foreach { case (sym, v) =>
        assert(math.abs(barVolBySym(bars).getOrElse(sym, 0.0) - v) < 1e-9,
          s"volume not conserved for $sym")
      }
      bars.groupBy(_.getAs[String]("symbol")).values.foreach { bs =>
        bs.foreach(b =>
          assert(b.getAs[Long]("start") <= b.getAs[Long]("end")))
        bs.map(_.getAs[Long]("start")).sliding(2).foreach {
          case Array(x, y) => assert(x <= y, "bar starts out of order")
          case _ =>
        }
      }
    }
  }

  test("dollar-bar fold is insensitive to input row order / partitioning") {
    cases(8).foreach { ups =>
      val left = FoldBars.dollarBars(updatesDf(ups), 25.0)
        .orderBy("symbol", "start", "end", "open", "volume").collect().toSeq
      val shuffled = new scala.util.Random(42).shuffle(ups)
      val right = FoldBars.dollarBars(updatesDf(shuffled).repartition(7), 25.0)
        .orderBy("symbol", "start", "end", "open", "volume").collect().toSeq
      assert(left === right, "fold depends on physical input order")
    }
  }

  test("tick bars: every trade lands in exactly one bar") {
    cases(10).foreach { ups =>
      val bars = TickBars.bars(updatesDf(ups), interval = 7).collect()
      tradeVolBySym(ups).foreach { case (sym, v) =>
        assert(math.abs(barVolBySym(bars).getOrElse(sym, 0.0) - v) < 1e-9)
      }
    }
  }

  test("time bars: high >= max(open, close), low <= min(open, close)") {
    cases(10).foreach { ups =>
      TimeBars.bars(updatesDf(ups), dropLast = false).collect().foreach { b =>
        val (o, h, l, c) = (b.getAs[Double]("open"), b.getAs[Double]("high"),
          b.getAs[Double]("low"), b.getAs[Double]("close"))
        assert(h >= math.max(o, c) - 1e-12)
        assert(l <= math.min(o, c) + 1e-12)
      }
    }
  }

  test("tick imbalance bars golden: threshold 1, monotone upticks close " +
      "every two net ticks; quirks mirror the volume bars") {
    // prices 1..5 all upticks: t1 starts bar 1 (carry unset, theta
    // stays 0 — first-trade swallow), t2 folds theta=1, t3 would make
    // |theta+1| = 2 > 1 -> closes [1,2] and starts [3] with its
    // contribution swallowed, t4 folds, t5 closes [3,4]; the final
    // partial [5] is emitted
    val ups = (1 to 5).map(i => Update("g", i.toLong, 0L,
      is_trade = true, is_bid = true, i.toDouble, 1.0))
    val bars = FoldBars.tickImbalanceBars(updatesDf(ups), 1L)
      .orderBy("start").collect()
      .map(b => (b.getAs[Long]("start"), b.getAs[Long]("end"),
        b.getAs[Double]("open"), b.getAs[Double]("close"),
        b.getAs[Double]("volume")))
    assert(bars.toSeq === Seq((1L, 2L, 1.0, 2.0, 2.0),
      (3L, 4L, 3.0, 4.0, 2.0), (5L, 5L, 5.0, 5.0, 1.0)))
  }

  test("tick imbalance bars: volume conservation + order insensitivity") {
    cases(8).foreach { ups =>
      val left = FoldBars.tickImbalanceBars(updatesDf(ups), 2L)
        .orderBy("symbol", "start", "end", "open", "volume").collect()
      tradeVolBySym(ups).foreach { case (sym, v) =>
        assert(math.abs(barVolBySym(left).getOrElse(sym, 0.0) - v) < 1e-9)
      }
      val shuffled = new scala.util.Random(42).shuffle(ups)
      val right = FoldBars
        .tickImbalanceBars(updatesDf(shuffled).repartition(7), 2L)
        .orderBy("symbol", "start", "end", "open", "volume").collect()
      assert(left.toSeq === right.toSeq,
        "imbalance fold depends on physical input order")
    }
  }

  test("vpin golden: hand-computed buckets, trailing window, boundary " +
      "swallow") {
    // interval 10, window 2, alternating up/down trades of size 6:
    // t1 starts bucket 1 unclassified; t2 (uptick) folds buy 6 (acc 6);
    // t3 (downtick) would push acc to 12 > 10 -> closes bucket 1
    // (n=2, buy=6, sell=0, class=6, vol=12, imb=6, vpin=6/6=1) and
    // starts bucket 2 with its weight swallowed (sell 6); t4 folds
    // buy 6 -> final partial bucket 2 (imb=0, class=12), trailing
    // window of 2: imb_win=6, class_win=18, vpin=1/3
    import graft.operators.Vpin
    val ups = Seq(
      Update("g", 1L, 1L, is_trade = true, is_bid = true, 1.0, 6.0),
      Update("g", 2L, 2L, is_trade = true, is_bid = true, 2.0, 6.0),
      Update("g", 3L, 3L, is_trade = true, is_bid = true, 1.0, 6.0),
      Update("g", 4L, 4L, is_trade = true, is_bid = true, 2.0, 6.0))
    val rows = Vpin.vpin(updatesDf(ups), 10.0, 2).orderBy("bucket")
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_trades"),
        r.getAs[Double]("buy_vol"), r.getAs[Double]("sell_vol"),
        r.getAs[Double]("class_vol"), r.getAs[Double]("volume"),
        r.getAs[Double]("imb"), r.getAs[Double]("imb_win"),
        r.getAs[Double]("class_win"), r.getAs[Double]("vpin")))
    assert(rows.toSeq === Seq(
      (1L, 2L, 6.0, 0.0, 6.0, 12.0, 6.0, 6.0, 6.0, 1.0),
      (2L, 2L, 6.0, 6.0, 12.0, 12.0, 0.0, 6.0, 18.0, 6.0 / 18.0)))
  }

  test("vpin: bucket volumes conserve, vpin in [0,1], window " +
      "self-consistent, order-insensitive") {
    import graft.operators.Vpin
    cases(8).foreach { ups =>
      val rows = Vpin.vpin(updatesDf(ups), 15.0, 3)
        .orderBy("symbol", "bucket").collect()
      tradeVolBySym(ups).foreach { case (sym, v) =>
        val bv = rows.filter(_.getAs[String]("symbol") == sym)
          .map(_.getAs[Double]("volume")).sum
        assert(math.abs(bv - v) < 1e-9, s"volume leak at $sym")
      }
      rows.groupBy(_.getAs[String]("symbol")).foreach { case (_, rs) =>
        val byB = rs.sortBy(_.getAs[Long]("bucket"))
        byB.zipWithIndex.foreach { case (r, i) =>
          val tail = byB.slice(math.max(0, i - 2), i + 1)
          val iw = tail.map(_.getAs[Double]("imb")).sum
          val cw = tail.map(_.getAs[Double]("class_vol")).sum
          // recomputed from the OUTPUT columns: sums of exact scale-4
          // values stay exact in double at fixture magnitudes
          assert(math.abs(r.getAs[Double]("imb_win") - iw) < 1e-9)
          assert(math.abs(r.getAs[Double]("class_win") - cw) < 1e-9)
          if (!r.isNullAt(r.fieldIndex("vpin"))) {
            val vp = r.getAs[Double]("vpin")
            assert(vp >= 0.0 && vp <= 1.0 + 1e-12, s"vpin out of range: $vp")
          } else assert(cw == 0.0, "vpin null with classified volume")
        }
      }
      val shuffled = new scala.util.Random(7).shuffle(ups)
      val right = Vpin.vpin(updatesDf(shuffled).repartition(5), 15.0, 3)
        .orderBy("symbol", "bucket").collect()
      assert(rows.map(_.toSeq).toSeq === right.map(_.toSeq).toSeq,
        "vpin fold depends on physical input order")
    }
  }
}
