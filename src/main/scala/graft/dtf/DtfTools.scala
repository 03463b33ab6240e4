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

  /** Real `.npz` export (S11, `bins/dtftools/dtfnumpy.rs:13-91`): a ZIP
    * container with one npy member per field, byte-faithful to the
    * reference's `write_header` — magic `93 4E 55 4D 50 59`, version 1.0,
    * u16 LE header length, structured-dtype header dict
    * `{'descr':[('data','<fmt')],'fortran_order':False,'shape':(N,)}`
    * with NO padding (exactly what the reference emits), then the raw
    * little-endian array. Field set + narrowing match `write_arr!`:
    * ts `<i8`, seq `<i4`, price/size `<f4`, bools `?`. Entries are
    * STORED by default, Deflated with `compressed = true`
    * (`CompressionMethod` flag, dtfnumpy.rs:16-20). */
  def exportNpz(dtfPath: String, outPath: String,
      compressed: Boolean = false): Unit = {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}
    val ups = DtfCodec.decode(dtfPath)
    val n = ups.size
    def npy(fmt: String, width: Int)
        (put: (ByteBuffer, Update) => Unit): Array[Byte] = {
      val h = s"{'descr':[('data','$fmt')],'fortran_order':False,'shape':($n,)}"
      val bb = ByteBuffer.allocate(6 + 2 + 2 + h.length + n * width)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte,
        'P'.toByte, 'Y'.toByte))
      bb.put(1.toByte).put(0.toByte) // major, minor
      bb.putShort(h.length.toShort)
      bb.put(h.getBytes("US-ASCII"))
      ups.foreach(u => put(bb, u))
      bb.array()
    }
    val members: Seq[(String, Array[Byte])] = Seq(
      "ts" -> npy("<i8", 8)((b, u) => b.putLong(u.ts)),
      "seq" -> npy("<i4", 4)((b, u) => b.putInt(u.seq.toInt)),
      "price" -> npy("<f4", 4)((b, u) => b.putFloat(u.price.toFloat)),
      "size" -> npy("<f4", 4)((b, u) => b.putFloat(u.size.toFloat)),
      "is_bid" -> npy("?", 1)((b, u) =>
        b.put(if (u.is_bid) 1.toByte else 0.toByte)),
      "is_trade" -> npy("?", 1)((b, u) =>
        b.put(if (u.is_trade) 1.toByte else 0.toByte)))
    val zos = new ZipOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(outPath)))
    try members.foreach { case (name, bytes) =>
      val e = new ZipEntry(name)
      if (!compressed) { // STORED needs size + crc up front
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        e.setCompressedSize(bytes.length.toLong)
        val crc = new CRC32
        crc.update(bytes)
        e.setCrc(crc.getValue)
      } else e.setMethod(ZipEntry.DEFLATED)
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    } finally zos.close()
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
