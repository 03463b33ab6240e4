package graft.dtf

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Update

/** File-tool surface (`bins/dtftools`): cat, split, concat, repair — all
  * thin compositions of the codec + engine operators (SURVEY §2.1
  * S12-S15). */
object DtfTools {

  /** Interval-overlap test. The reference's `within_range`
    * (`tdb-core/src/utils.rs:34-36`) ORs the two bounds — a latent bug that
    * makes it prune nothing (SURVEY C4); this is the correct AND form,
    * shipped as the documented deviation. */
  def rangesOverlap(targetMin: Long, targetMax: Long, fileMin: Long,
      fileMax: Long): Boolean =
    targetMin <= fileMax && targetMax >= fileMin

  /** dtfcat (`dtfcat.rs:7-131`): file/dir → rows (optionally clipped to a
    * range, F7 semantics: inclusive bounds) — via the `dtf` DataSource V2,
    * so reads are distributed (one partition per file) and the ts bounds
    * push down to prune whole files by header stats. */
  def cat(spark: SparkSession, path: String,
      range: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("dtf").load(path)
    range match {
      case Some((lo, hi)) => df.where(col("ts").between(lo, hi))
      case None => df
    }
  }

  /** dtfsplit (`dtfsplit.rs:4-21`): split into chunks of `batchSize`
    * updates, one file per chunk, named `{prefix}-{i}.dtf`. */
  def split(path: String, outPrefix: String, batchSize: Int): Seq[String] = {
    val ups = DtfCodec.decode(path)
    val meta = DtfCodec.metadata(path)
    ups.grouped(batchSize).zipWithIndex.map { case (chunk, i) =>
      val out = s"$outPrefix-$i.dtf"
      DtfCodec.encode(out, meta.symbol, chunk)
      out
    }.toSeq
  }

  /** dtfconcat (`dtfconcat.rs:12-144`): merge two files of the same symbol;
    * requires overlap, dedups identical rows, sorts by (ts,seq). */
  def concat(path1: String, path2: String, out: String): Either[String, Unit] = {
    val m1 = DtfCodec.metadata(path1)
    val m2 = DtfCodec.metadata(path2)
    if (m1.symbol != m2.symbol)
      Left(s"symbol mismatch: ${m1.symbol} vs ${m2.symbol}")
    else if (!rangesOverlap(m1.minTs, m1.maxTs, m2.minTs, m2.maxTs))
      Left("files do not overlap")
    else {
      val merged = (DtfCodec.decode(path1) ++ DtfCodec.decode(path2))
        .distinct.sortBy(u => (u.ts, u.seq))
      DtfCodec.encode(out, m1.symbol, merged)
      Right(())
    }
  }

  /** dtfrepair (`dtfrepair.rs:1-11`): decode whatever is readable
    * (the codec already stops at the first undecodable batch), re-encode a
    * clean file. */
  def repair(in: String, out: String): Int = {
    val meta = DtfCodec.metadata(in)
    val ups = DtfCodec.decode(in)
    DtfCodec.encode(out, meta.symbol, ups)
    ups.size
  }

  /** dtfcat --timebars (S12 / SURVEY §3.3, `dtfcat.rs:41-48`): the full
    * batch-analytics lifecycle — decode → 1-min OHLCV → continuation fill →
    * aligned rebin → the reference's `to_csv` column shape `T,O,H,L,C,V`
    * (`candle/time_bars.rs:143-153`). One job: scan → filter → window agg →
    * grid join + forward fill → positional re-agg. */
  def catTimebars(spark: SparkSession, path: String, minutes: Int = 1)
      : DataFrame = {
    import org.apache.spark.sql.functions.col
    import graft.operators.TimeBars
    val ups = cat(spark, path)
    val oneMin = TimeBars.bars(ups)
    val filled = TimeBars.continuationFill(oneMin)
    val rebinned =
      if (minutes == 1) filled
      else TimeBars.rebin(filled, minutes, align = true)
    rebinned.select(
      col("start").as("T"), col("open").as("O"), col("high").as("H"),
      col("low").as("L"), col("close").as("C"), col("volume").as("V"))
      .orderBy("T")
  }

  /** Columnar per-field export (S11, `bins/dtftools/dtfnumpy.rs:13-91`):
    * the reference writes an `.npz` with one little-endian array per field
    * (ts <i8, seq <i4, price/size <f4, bools ?). Parquet is already
    * columnar, so the faithful analogue is one single-column parquet
    * directory per field under `outDir/<field>` — same field set, same
    * narrowing casts (seq→int, price/size→float). Returns the per-field
    * paths. */
  def exportColumnar(spark: SparkSession, dtfPath: String,
      outDir: String): Map[String, String] = {
    import org.apache.spark.sql.functions.col
    val df = cat(spark, dtfPath)
    val fields = Map(
      "ts" -> col("ts"),
      "seq" -> col("seq").cast("int").as("seq"),
      "is_trade" -> col("is_trade"),
      "is_bid" -> col("is_bid"),
      "price" -> col("price").cast("float").as("price"),
      "size" -> col("size").cast("float").as("size"))
    fields.map { case (name, c) =>
      val out = s"$outDir/$name"
      df.select(c).write.mode("overwrite").parquet(out)
      name -> out
    }
  }

  /** Kaiko trade-CSV converter (S9, `storage/filetype.rs:43-96`):
    * `id,exchange,symbol,date,price,amount,sell` → updates with
    * `is_trade=true, is_bid=!sell, seq=id` (f32-cast prices/sizes like the
    * reference). */
  def fromKaikoCsv(spark: SparkSession, csvPath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.option("header", "true").csv(csvPath)
      .select(
        col("symbol"),
        col("date").cast("long").as("ts"),
        coalesce(col("id").cast("long"), lit(0L)).as("seq"),
        lit(true).as("is_trade"),
        (!coalesce(col("sell").cast("boolean"), lit(false))).as("is_bid"),
        col("price").cast("float").cast("double").as("price"),
        col("amount").cast("float").cast("double").as("size"))
  }
}
