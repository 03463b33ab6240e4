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
}
