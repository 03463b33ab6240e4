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

  /** DuckDB oracle twin of [[rebinned]] — the sequential clamped-delta fold
    * rewritten relationally:
    *
    *  1. the per-update coarse delta is a `lag(size)` over the FINE key
    *     (delta 0 when the fine level is new or was deleted — the
    *     `or_insert`+`clean` quirk), with the coarse key's first-ever update
    *     contributing its full size (the `or_insert` base);
    *  2. the clamp-at-0 running state uses the prefix-min identity
    *     `s_k = R_k - least(0, min_{j<=k} R_j)` (R = running delta sum,
    *     R_0 = 0), which equals the sequential `max(0, s_{k-1}+d_k)` exactly
    *     — and bit-exactly here, because every size is a quarter-multiple so
    *     all sums are exact doubles;
    *  3. per-bin emission is a (bins × keys) grid with last-state-as-of-bin
    *     forward fill, dropping NULL (never touched yet) and 0 sizes.
    *
    * The f32 boundary cast survives as `CAST(.. AS REAL)`. Body starts with
    * WITH; wrap via [[graft.Tables.withUpdatesChain]]. */
  def rebinnedOracleSql(decimals: Int = 2, stepBins: Int = 10,
      tickBins: Int = 20, m: Double = 3.0): String = {
    val mult = math.pow(10, decimals)
    s"""WITH ${HistogramOps.madKeepSql(m)},
       |pb AS (SELECT symbol, min(price) AS hmin,
       |  (max(price) - min(price)) / ${tickBins - 1} AS bucket FROM kept GROUP BY symbol),
       |tb AS (SELECT symbol, min(ts // 1000) AS tmin,
       |  (max(ts // 1000) - min(ts // 1000)) // ${stepBins - 1} AS tbucket
       | FROM updates GROUP BY symbol),
       |binned AS (
       |  SELECT u.symbol, u.ts, u.seq, u.is_bid, u.size,
       |    CASE WHEN p.bucket > 0.0 THEN floor((u.price - p.hmin) / p.bucket)
       |         ELSE 0.0 END AS pidx,
       |    CASE WHEN t.tbucket > 0 THEN (u.ts // 1000 - t.tmin) // t.tbucket
       |         ELSE 0 END AS tidx,
       |    p.hmin, p.bucket, t.tmin, t.tbucket,
       |    CAST(floor(u.price * $mult) AS BIGINT) AS fine_level
       |  FROM updates u JOIN pb p USING (symbol) JOIN tb t USING (symbol)
       |  WHERE NOT u.is_trade),
       |inr AS (
       |  SELECT symbol, ts, seq, is_bid, size, fine_level,
       |    CAST(floor(CAST(CAST(hmin + pidx * bucket AS REAL) AS DOUBLE) * $mult) AS BIGINT) AS level,
       |    CAST(tmin + tidx * tbucket AS BIGINT) AS time_bin
       |  FROM binned
       |  WHERE pidx BETWEEN 0 AND ${tickBins - 2} AND tidx BETWEEN 0 AND ${stepBins - 2}),
       |delt AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY symbol, is_bid, level ORDER BY ts, seq) AS crn,
       |    lag(size) OVER (PARTITION BY symbol, is_bid, fine_level ORDER BY ts, seq) AS prev_fine
       |  FROM inr),
       |d2 AS (
       |  SELECT symbol, is_bid, level, time_bin, ts, seq,
       |    CASE WHEN crn = 1 THEN size
       |         WHEN prev_fine IS NULL OR prev_fine = 0.0 THEN 0.0
       |         ELSE size - prev_fine END AS d
       |  FROM delt),
       |run AS (
       |  SELECT *, sum(d) OVER (PARTITION BY symbol, is_bid, level ORDER BY ts, seq
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
       |  FROM d2),
       |st AS (
       |  SELECT *, r - least(0.0, min(r) OVER (PARTITION BY symbol, is_bid, level
       |    ORDER BY ts, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
       |  FROM run),
       |kb AS (SELECT symbol, is_bid, level, time_bin, last(s ORDER BY ts, seq) AS s
       |  FROM st GROUP BY 1, 2, 3, 4),
       |bins AS (SELECT DISTINCT symbol, time_bin FROM inr),
       |keys AS (SELECT DISTINCT symbol, is_bid, level FROM inr),
       |grid AS (SELECT b.symbol, b.time_bin, k.is_bid, k.level
       |  FROM bins b JOIN keys k USING (symbol)),
       |filled AS (
       |  SELECT g.symbol, g.time_bin, g.is_bid, g.level,
       |    last_value(kb.s IGNORE NULLS) OVER (
       |      PARTITION BY g.symbol, g.is_bid, g.level ORDER BY g.time_bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS size
       |  FROM grid g LEFT JOIN kb ON kb.symbol = g.symbol AND kb.is_bid = g.is_bid
       |    AND kb.level = g.level AND kb.time_bin = g.time_bin)
       |SELECT symbol, time_bin, is_bid, level, size FROM filled
       |WHERE size IS NOT NULL AND size <> 0.0
       |ORDER BY symbol, time_bin, is_bid, level"""
      .stripMargin.replace('\n', ' ')
  }

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
