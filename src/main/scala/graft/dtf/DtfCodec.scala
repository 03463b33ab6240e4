package graft.dtf

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream, RandomAccessFile}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Update

/** DTF ("Dense Tick Format") interop codec.
  *
  * Byte-level implementation of the reference's on-disk format so its
  * fixtures are loadable as `Dataset[Update]` and our results can be
  * written back for its tools:
  *
  *  - header: magic `44 54 46 90 01`, 20-byte space-padded symbol, u64
  *    count @25, u64 max_ts @33, main section @80
  *    (`crates/tdb-core/src/dtf/file_format.rs:1-26,49-54`)
  *  - main section: batches of `0x1, u64 ref_ts, u32 ref_seq, u16 count`
  *    then `count` 12-byte rows `u16 dts, u8 dseq, u8 flags, f32 price,
  *    f32 size` big-endian (`file_format.rs:79-86,159-211`,
  *    `update.rs:124-142`); flags bit0 = is_bid, bit1 = is_trade
  *  - batch rollover when `ts >= ref_ts + 0xFFFF`, `seq >= ref_seq + 0xF`,
  *    backwards ts/seq, or count 0xFFFF (`file_format.rs:169-211`)
  *
  * This is deliberately a plain Scala codec, not a Catalyst `FileFormat` —
  * DTF is an interop format here; parquet is the native store (SURVEY §1.3).
  */
object DtfCodec {

  val Magic: Array[Byte] =
    Array(0x44, 0x54, 0x46, 0x90, 0x01).map(_.toByte)
  private val SymbolLen = 20
  private val MainOffset = 80L

  case class Metadata(symbol: String, count: Long, maxTs: Long, minTs: Long)

  /** Read header metadata only (min_ts comes from the first batch's ref_ts,
    * `file_format.rs:502-518`). */
  def metadata(path: String): Metadata = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val magic = new Array[Byte](5)
      raf.readFully(magic)
      require(magic.sameElements(Magic), s"$path: bad DTF magic")
      val symBytes = new Array[Byte](SymbolLen)
      raf.readFully(symBytes)
      val symbol = new String(symBytes, "UTF-8").trim
      val count = raf.readLong()
      val maxTs = raf.readLong()
      raf.seek(MainOffset)
      val minTs =
        if (count == 0) 0L
        else { raf.readByte(); raf.readLong() }
      Metadata(symbol, count, maxTs, minTs)
    } finally raf.close()
  }

  /** Decode the whole file. */
  def decode(path: String): Seq[Update] = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path)))
    try {
      val magic = new Array[Byte](5)
      in.readFully(magic)
      require(magic.sameElements(Magic), s"$path: bad DTF magic")
      val symBytes = new Array[Byte](SymbolLen)
      in.readFully(symBytes)
      val symbol = new String(symBytes, "UTF-8").trim
      in.readLong() // count
      in.readLong() // max_ts
      in.skipBytes((MainOffset - 41).toInt)
      decodeBatches(in, symbol)
    } finally in.close()
  }

  /** Decode batch-framed updates until EOF — the main-section format, which
    * is ALSO the body of a binary GET response (`into_format` ->
    * `write_batches`, `tdb-server-core/src/state.rs:31-37`; clients decode
    * via `parse_stream` -> `decode_buffer`, `dtf/file_format.rs:839-851`). */
  def decodeBatches(in: DataInputStream, symbol: String = ""): Seq[Update] = {
    val out = Seq.newBuilder[Update]
    try {
      while (true) {
        val marker = in.readByte()
        require(marker == 1, s"bad batch marker $marker")
        val refTs = in.readLong()
        val refSeq = Integer.toUnsignedLong(in.readInt())
        val n = java.lang.Short.toUnsignedInt(in.readShort())
        var i = 0
        while (i < n) {
          val dts = java.lang.Short.toUnsignedInt(in.readShort())
          val dseq = java.lang.Byte.toUnsignedInt(in.readByte())
          val flags = in.readByte()
          val price = in.readFloat()
          val size = in.readFloat()
          out += Update(symbol, refTs + dts, refSeq + dseq,
            is_trade = (flags & 0x2) != 0, is_bid = (flags & 0x1) != 0,
            price = price.toDouble, size = size.toDouble)
          i += 1
        }
      }
    } catch { case _: EOFException => () }
    out.result()
  }

  /** Encode `(ts,seq)`-sorted updates as batch framing (`write_batches`,
    * `file_format.rs:169-211`): `0x1, u64 ref_ts, u32 ref_seq, u16 count`
    * then `count` 12-byte delta rows. Takes an iterator and buffers only the
    * current batch (≤ 0xFFFF rows), so a large stream encodes with bounded
    * memory. */
  def encodeBatches(out: DataOutputStream, ups: Iterator[Update]): Unit =
    if (ups.nonEmpty) {
      var refTs = 0L
      var refSeq = 0L
      var first = true
      var batch = Vector.empty[Update]
      def flushBatch(): Unit = if (batch.nonEmpty) {
        out.writeByte(1)
        out.writeLong(refTs)
        out.writeInt(refSeq.toInt)
        out.writeShort(batch.size)
        batch.foreach { u =>
          out.writeShort((u.ts - refTs).toInt)
          out.writeByte((u.seq - refSeq).toInt)
          out.writeByte(
            (if (u.is_bid) 1 else 0) | (if (u.is_trade) 2 else 0))
          out.writeFloat(u.price.toFloat)
          out.writeFloat(u.size.toFloat)
        }
        batch = Vector.empty
      }
      ups.foreach { u =>
        if (first) { refTs = u.ts; refSeq = u.seq; first = false }
        val rollover = batch.nonEmpty && (
          u.ts >= refTs + 0xFFFF || u.seq >= refSeq + 0xF ||
            u.seq < refSeq || u.ts < refTs || batch.size == 0xFFFF)
        if (rollover) { flushBatch(); refTs = u.ts; refSeq = u.seq }
        batch = batch :+ u
      }
      flushBatch()
    }

  /** Encode `(ts,seq)`-sorted updates (`encode_buffer`,
    * `file_format.rs:222-238`). */
  def encode(path: String, symbol: String, ups: Seq[Update]): Unit = {
    require(symbol.length <= SymbolLen, s"symbol longer than $SymbolLen")
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.write(Magic)
      out.write(symbol.padTo(SymbolLen, ' ').getBytes("UTF-8"))
      out.writeLong(ups.size.toLong)
      out.writeLong(if (ups.isEmpty) 0L else ups.map(_.ts).max)
      out.write(new Array[Byte]((MainOffset - 41).toInt)) // pad to 80
      encodeBatches(out, ups.iterator)
    } finally out.close()
  }

  /** Load a DTF file as a Dataset (fixture interop path). */
  def toDataset(spark: SparkSession, path: String): Dataset[Update] = {
    import spark.implicits._
    spark.createDataset(decode(path))
  }

  /** [[decode]] as a bounded-memory ITERATOR — the read-side symmetry of
    * [[encodeStream]] and the reference's buffered-reader semantics
    * (`DTFBufReader`, `file_format.rs:560-691`): exactly one batch frame
    * (≤ 0xFFFF rows) is materialized at a time, so a multi-GB book file
    * decodes in O(batch) memory. Same truncation tolerance as
    * [[decodeBatches]]: a mid-batch EOF keeps the rows decoded so far
    * (the dtfrepair recovery contract); a bad batch marker still throws.
    * Close releases the stream; exhausting the iterator also closes. */
  def decodeStream(path: String): DtfStreamReader =
    new DtfStreamReader(
      new BufferedInputStream(new FileInputStream(path)))

  /** [[decodeStream]] over an arbitrary stream (test hook: a counting
    * stream proves the bounded read-ahead byte-exactly). */
  def decodeStream(in: java.io.InputStream): DtfStreamReader =
    new DtfStreamReader(in)

  final class DtfStreamReader private[dtf] (raw: java.io.InputStream)
      extends Iterator[Update] with java.io.Closeable {
    private val in = new DataInputStream(raw)
    /** Header symbol, attached to every decoded row (as [[decode]]).
      * A bad/truncated header closes the stream before rethrowing — no
      * caller holds a handle yet, so the constructor must not leak the
      * descriptor (decode() has the same guarantee via its finally). */
    val symbol: String =
      try {
        val magic = new Array[Byte](5)
        in.readFully(magic)
        require(magic.sameElements(Magic), "bad DTF magic")
        val symBytes = new Array[Byte](SymbolLen)
        in.readFully(symBytes)
        in.readLong() // count
        in.readLong() // max_ts
        in.skipBytes((MainOffset - 41).toInt)
        new String(symBytes, "UTF-8").trim
      } catch {
        case e: Throwable => in.close(); throw e
      }
    private var batch: Array[Update] = Array.empty
    private var idx = 0
    private var eof = false

    private def fill(): Unit =
      while (!eof && idx >= batch.length) {
        try {
          val marker = in.readByte()
          require(marker == 1, s"bad batch marker $marker")
          val refTs = in.readLong()
          val refSeq = Integer.toUnsignedLong(in.readInt())
          val n = java.lang.Short.toUnsignedInt(in.readShort())
          val arr = new Array[Update](n)
          var got = 0
          try {
            while (got < n) {
              val dts = java.lang.Short.toUnsignedInt(in.readShort())
              val dseq = java.lang.Byte.toUnsignedInt(in.readByte())
              val flags = in.readByte()
              val price = in.readFloat()
              val size = in.readFloat()
              arr(got) = Update(symbol, refTs + dts, refSeq + dseq,
                is_trade = (flags & 0x2) != 0, is_bid = (flags & 0x1) != 0,
                price = price.toDouble, size = size.toDouble)
              got += 1
            }
          } catch { case _: EOFException => eof = true }
          batch = if (got == n) arr else arr.take(got)
          idx = 0
        } catch {
          case _: EOFException =>
            eof = true; batch = Array.empty; idx = 0
        }
      }

    override def hasNext: Boolean = {
      fill()
      val has = idx < batch.length
      if (!has) close() // exhausted (close is idempotent)
      has
    }
    override def next(): Update = {
      if (!hasNext) throw new NoSuchElementException("DTF stream EOF")
      val u = batch(idx); idx += 1
      u
    }
    override def close(): Unit = in.close()
  }

  /** [[encode]] for a STREAM of sorted updates: the header's count and
    * max_ts (offsets 25/33, `file_format.rs:143-152`) aren't known up
    * front, so they're written as zeros, the batches stream through
    * [[encodeBatches]]'s bounded buffering, and the two fields are
    * back-patched by RandomAccessFile at close — an arbitrarily large
    * book exports in O(batch) memory. Returns (count, maxTs). */
  def encodeStream(path: String, symbol: String,
      ups: Iterator[Update]): (Long, Long) = {
    require(symbol.length <= SymbolLen, s"symbol longer than $SymbolLen")
    var count = 0L
    var maxTs = 0L
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.write(Magic)
      out.write(symbol.padTo(SymbolLen, ' ').getBytes("UTF-8"))
      out.writeLong(0L) // count: patched below
      out.writeLong(0L) // max_ts: patched below
      out.write(new Array[Byte]((MainOffset - 41).toInt)) // pad to 80
      val counted = ups.map { u =>
        count += 1
        if (u.ts > maxTs) maxTs = u.ts
        u
      }
      encodeBatches(out, counted)
    } finally out.close()
    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.seek(25L); raf.writeLong(count)
      raf.seek(33L); raf.writeLong(maxTs)
    } finally raf.close()
    (count, maxTs)
  }
}
