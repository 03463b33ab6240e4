package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.model.Update

/** Rebinned orderbook (`RebinnedOrderbook::from`,
  * `postprocessing/orderbook.rs:174-281`): a 2-D downsample of book
  * evolution — prices binned by the MAD-filtered histogram, time binned by
  * the uniform grid; a coarse book is maintained by size-DELTAS of the fine
  * book (clamped at 0), and the coarse book state is emitted once per time
  * bin that saw at least one in-range level update.
  *
  * Two-phase plan: (1) per-symbol bin parameters via one aggregation pass
  * (tiny result, collected and broadcast); (2) per-symbol ordered fold via
  * `repartition(symbol) + sortWithinPartitions + mapPartitions` with O(book)
  * state. Quirks preserved:
  *  - trades skipped entirely (orderbook.rs:191-194);
  *  - a fine level re-added after deletion contributes delta 0 (the
  *    `or_insert` + `clean` dance, orderbook.rs:211-216);
  *  - coarse sizes clamp at 0 ("orders before the first cancellation",
  *    orderbook.rs:246-249);
  *  - coarse price key goes through an f32 cast of the bin boundary
  *    (`temp_ob.discretize(price.unwrap() as f32)`, orderbook.rs:208).
  */
object RebinnedBook {

  private case class Bins(hmin: Double, bucket: Double, tmin: Long,
      tbucket: Long, tickBins: Int, stepBins: Int)

  def rebinned(updates: DataFrame, decimals: Int = 2, stepBins: Int = 10,
      tickBins: Int = 20, m: Double = 3.0): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._

    val kept = HistogramOps.madKeep(updates, m)
    val pb = kept.groupBy("symbol")
      .agg(min(col("price")).as("hmin"), max(col("price")).as("hmax"))
      .withColumn("bucket", (col("hmax") - col("hmin")) / (tickBins - 1))
    val tb = updates
      .select(col("symbol"), tsSeconds(col("ts")).as("tsec"))
      .groupBy("symbol")
      .agg(min(col("tsec")).as("tmin"), max(col("tsec")).as("tmax"))
      .withColumn("tbucket", expr(s"(tmax - tmin) div ${stepBins - 1}"))
    val bins: Map[String, Bins] = pb.join(tb, "symbol")
      .select("symbol", "hmin", "bucket", "tmin", "tbucket")
      .collect()
      .map(r => r.getString(0) -> Bins(r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), tickBins, stepBins))
      .toMap
    val binsB = spark.sparkContext.broadcast(bins)
    val mult = math.pow(10, decimals)

    updates
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "ts", "seq")
      .as[Update]
      .mapPartitions { rows =>
        new Iterator[(String, Long, Boolean, Long, Double)] {
          private val out = scala.collection.mutable.Queue
            .empty[(String, Long, Boolean, Long, Double)]
          private var sym: String = _
          private var b: Bins = _
          private var curBin: Long = Long.MinValue
          // fine book: (is_bid, fine dp) -> size; coarse: (is_bid, coarse dp)
          private val fine =
            scala.collection.mutable.HashMap.empty[(Boolean, Long), Double]
          private val coarse =
            scala.collection.mutable.HashMap.empty[(Boolean, Long), Double]

          private def emit(): Unit = if (curBin != Long.MinValue) {
            coarse.foreach { case ((bid, lvl), sz) =>
              if (sz != 0.0) out.enqueue((sym, curBin, bid, lvl, sz))
            }
          }
          private def reset(newSym: String): Unit = {
            emit()
            sym = newSym
            b = binsB.value.getOrElse(newSym, null)
            curBin = Long.MinValue
            fine.clear(); coarse.clear()
          }

          private def step(u: Update): Unit = {
            if (u.symbol != sym) reset(u.symbol)
            if (u.is_trade || b == null) return
            // price bin (to_bin semantics: idx in [0, tickBins-2])
            val pidx =
              if (b.bucket > 0.0) math.floor((u.price - b.hmin) / b.bucket)
              else 0.0
            val tsec = u.ts / 1000
            val tidx =
              if (b.tbucket > 0) (tsec - b.tmin) / b.tbucket else 0L
            if (pidx < 0 || pidx > b.tickBins - 2 ||
              tidx < 0 || tidx > b.stepBins - 2) return
            val priceBin = b.hmin + pidx * b.bucket
            val timeBin = b.tmin + tidx * b.tbucket
            // reference discretizes the f32-cast boundary
            val coarseKey =
              (u.is_bid, math.floor(priceBin.toFloat.toDouble * mult).toLong)
            val fineKey = (u.is_bid, math.floor(u.price * mult).toLong)

            if (timeBin != curBin) { emit(); curBin = timeBin }

            val fineSize = fine.getOrElseUpdate(fineKey, u.size)
            val coarseSize = coarse.getOrElseUpdate(coarseKey, u.size)
            val next = coarseSize + (u.size - fineSize)
            coarse(coarseKey) = if (next < 0.0) 0.0 else next
            // set + immediate zero-clean == reference's clean()-per-update
            if (u.size == 0.0) fine.remove(fineKey) else fine(fineKey) = u.size
          }

          override def hasNext: Boolean = {
            while (out.isEmpty && rows.hasNext) step(rows.next())
            if (out.isEmpty && !rows.hasNext && sym != null) {
              emit(); sym = null
            }
            out.nonEmpty
          }
          override def next(): (String, Long, Boolean, Long, Double) =
            out.dequeue()
        }
      }
      .toDF("symbol", "time_bin", "is_bid", "level", "size")
  }
}
