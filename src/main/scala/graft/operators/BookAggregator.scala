package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.Update

/** Orderbook snapshot as a typed `Aggregator` (SURVEY §4 custom work #2):
  * composes with `groupByKey(symbol)` like any other aggregate, and —
  * unlike a sequential replay — has a COMMUTATIVE merge, so Spark can
  * partial-aggregate it map-side on unordered partitions.
  *
  * The trick making the order-sensitive fold mergeable: per (side, level)
  * the final size depends only on the LATEST level-set and the trades
  * AFTER it (`process_update`, `postprocessing/orderbook.rs:46-63`). The
  * buffer keeps, per level, the best-so-far set event and the trades newer
  * than it; a trade older than the local best set can never outlive a
  * merge (the global best set is >= every local one), so it is pruned
  * immediately and buffers stay near the live-book size.
  */
object BookAggregator {

  case class LevelAcc(
      set: Option[(Long, Long, Double)], // (ts, seq, size) of latest set
      trades: List[(Long, Long, Double)]) // trades newer than `set`

  case class BookBuf(levels: Map[(Boolean, Long), LevelAcc])

  case class LevelRow(is_bid: Boolean, level: Long, size: Double)
  case class Snapshot(rows: Seq[LevelRow])

  private def keyOf(ts: Long, seq: Long): (Long, Long) = (ts, seq)
  private implicit val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2[Long, Long]

  final class Agg(decimals: Int) extends Aggregator[Update, BookBuf, Snapshot] {
    private val mult = math.pow(10, decimals)

    override def zero: BookBuf = BookBuf(Map.empty)

    override def reduce(b: BookBuf, u: Update): BookBuf = {
      val key = (u.is_bid, math.floor(u.price * mult).toLong)
      val acc = b.levels.getOrElse(key, LevelAcc(None, Nil))
      val uk = keyOf(u.ts, u.seq)
      val next =
        if (!u.is_trade) {
          if (acc.set.forall(s => ord.lt(keyOf(s._1, s._2), uk)))
            LevelAcc(Some((u.ts, u.seq, u.size)),
              acc.trades.filter(t => ord.gt(keyOf(t._1, t._2), uk)))
          else acc // an older set is overwritten by the one we already hold
        } else {
          if (acc.set.forall(s => ord.lt(keyOf(s._1, s._2), uk)))
            acc.copy(trades = (u.ts, u.seq, u.size) :: acc.trades)
          else acc // trade older than the live set can never matter
        }
      BookBuf(b.levels.updated(key, next))
    }

    override def merge(b1: BookBuf, b2: BookBuf): BookBuf = {
      val keys = b1.levels.keySet ++ b2.levels.keySet
      BookBuf(keys.iterator.map { k =>
        val a1 = b1.levels.getOrElse(k, LevelAcc(None, Nil))
        val a2 = b2.levels.getOrElse(k, LevelAcc(None, Nil))
        val set = (a1.set, a2.set) match {
          case (Some(x), Some(y)) =>
            Some(if (ord.gteq(keyOf(x._1, x._2), keyOf(y._1, y._2))) x else y)
          case (x, y) => x.orElse(y)
        }
        val trades = set match {
          case Some(s) =>
            val sk = keyOf(s._1, s._2)
            (a1.trades ++ a2.trades).filter(t => ord.gt(keyOf(t._1, t._2), sk))
          case None => a1.trades ++ a2.trades
        }
        k -> LevelAcc(set, trades)
      }.toMap)
    }

    override def finish(b: BookBuf): Snapshot = Snapshot(
      b.levels.toSeq.sortBy(_._1).flatMap { case ((bid, lvl), acc) =>
        acc.set.filter(_._3 != 0.0).map { s =>
          LevelRow(bid, lvl, s._3 - acc.trades.map(_._3).sum)
        }
      })

    override def bufferEncoder: Encoder[BookBuf] = Encoders.kryo[BookBuf]
    override def outputEncoder: Encoder[Snapshot] = Encoders.product[Snapshot]
  }

  /** `(symbol, is_bid, level, size)` snapshot via the typed aggregate —
    * same answer as `Orderbook.snapshot` (cross-checked in OrderbookSpec). */
  def snapshot(updates: Dataset[Update], decimals: Int = 2)
      : Dataset[(String, Boolean, Long, Double)] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .groupByKey(_.symbol)
      .agg(new Agg(decimals).toColumn.name("snap"))
      .flatMap { case (sym, snap) =>
        snap.rows.map(r => (sym, r.is_bid, r.level, r.size))
      }
  }
}
