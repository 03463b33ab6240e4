package graft.operators

import graft.model.Candle

/** ASCII candlestick rendering (`candle/candlestick_graph.rs:14-175`) —
  * presentation-only surface (B9): candles collect to the driver (they are
  * already aggregated) and render to a terminal chart. Own implementation,
  * not a translation: one column per candle, `█` body, `|` wick, price
  * axis on the left. */
object CandlestickChart {

  def render(candles: Seq[Candle], height: Int = 16): String = {
    if (candles.isEmpty) return "(no candles)"
    val lo = candles.map(_.low).min
    val hi = candles.map(_.high).max
    val span = math.max(hi - lo, 1e-12)
    def row(p: Double): Int =
      math.min(height - 1, ((p - lo) / span * (height - 1)).round.toInt)

    val grid = Array.fill(height, candles.size)(' ')
    candles.zipWithIndex.foreach { case (c, x) =>
      val (wLo, wHi) = (row(c.low), row(c.high))
      (wLo to wHi).foreach(y => grid(y)(x) = '|')
      val (bLo, bHi) =
        (row(math.min(c.open, c.close)), row(math.max(c.open, c.close)))
      val body = if (c.close >= c.open) '█' else '░'
      (bLo to bHi).foreach(y => grid(y)(x) = body)
    }
    val axisW = 12
    val lines = (height - 1 to 0 by -1).map { y =>
      val price = lo + span * y / (height - 1)
      f"$price%10.4f | " + new String(grid(y))
    }
    val footer = " " * axisW + "+" + "-" * candles.size +
      s"\n${" " * axisW} ${candles.head.start} .. ${candles.last.start} (${candles.size} candles)"
    (lines :+ footer).mkString("\n")
  }
}
