package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicBoolean

import graft.model.Update

/** Wire protocol (T1/S8):
  *
  *  - request frame: u32 BE length + payload (`server.rs:90-98`)
  *  - response frame: u8 success (1/0) + u64 BE length + body
  *    (`server.rs:183-216`; errors render as `"ERR: ...\n"`)
  *  - binary raw insert: `b"ra" + u64 BE book-name length + name bytes +
  *    21-byte raw update + '\n'` (`tdb-core/src/utils.rs:50-87`); the raw
  *    update is `u64 ts, u32 seq, u8 flags, f32 price, f32 size` BE with
  *    flags bit0=is_bid, bit1=is_trade (`update.rs:66-81`)
  */
object Wire {

  val RawInsertPrefix: Array[Byte] = "ra".getBytes("UTF-8")

  def serializeRaw(u: Update): Array[Byte] = {
    val b = ByteBuffer.allocate(21)
    b.putLong(u.ts)
    b.putInt(u.seq.toInt)
    b.put(((if (u.is_bid) 1 else 0) | (if (u.is_trade) 2 else 0)).toByte)
    b.putFloat(u.price.toFloat)
    b.putFloat(u.size.toFloat)
    b.array()
  }

  def deserializeRaw(bytes: Array[Byte]): Option[Update] =
    if (bytes.length < 21) None
    else {
      val b = ByteBuffer.wrap(bytes)
      val ts = b.getLong()
      val seq = Integer.toUnsignedLong(b.getInt())
      val flags = b.get()
      val price = b.getFloat()
      val size = b.getFloat()
      Some(Update("", ts, seq, is_trade = (flags & 2) != 0,
        is_bid = (flags & 1) != 0, price.toDouble, size.toDouble))
    }

  /** `encode_insert_into` (`utils.rs:50-64`). */
  def encodeInsertInto(book: Option[String], u: Update): Array[Byte] = {
    val name = book.map(_.getBytes("UTF-8")).getOrElse(Array.emptyByteArray)
    val b = ByteBuffer.allocate(2 + 8 + name.length + 21 + 1)
    b.put(RawInsertPrefix)
    b.putLong(name.length.toLong)
    b.put(name)
    b.put(serializeRaw(u))
    b.put('\n'.toByte)
    b.array()
  }

  /** `decode_insert_into` (`utils.rs:67-87`). */
  def decodeInsertInto(buf: Array[Byte])
      : Option[(Option[Update], Option[String])] = {
    if (buf.length < 2 + 8 ||
      buf(0) != RawInsertPrefix(0) || buf(1) != RawInsertPrefix(1))
      return None
    val b = ByteBuffer.wrap(buf, 2, buf.length - 2)
    val len = b.getLong().toInt
    if (b.remaining() < len) return None
    val name =
      if (len > 0) {
        val nb = new Array[Byte](len)
        b.get(nb)
        Some(new String(nb, "UTF-8"))
      } else None
    val rest = new Array[Byte](b.remaining())
    b.get(rest)
    Some((deserializeRaw(rest), name))
  }

  /** Decode a binary GET response body. The reference serializes GET bodies
    * with DTF BATCH framing, not raw 21-byte frames (`into_format` ->
    * `write_batches`, `tdb-server-core/src/state.rs:31-37`); reference
    * clients decode via `parse_stream` -> `decode_buffer` ->
    * `read_one_batch` (`dtf/file_format.rs:839-851`). */
  def parseStream(bytes: Array[Byte]): Seq[Update] =
    graft.dtf.DtfCodec.decodeBatches(new DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))

  /** Encode updates as a binary GET response body (batch framing, see
    * [[parseStream]]). Buffers encoded bytes (~12 B/row), not rows. */
  def serializeBatches(ups: Iterator[Update]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    graft.dtf.DtfCodec.encodeBatches(dos, ups)
    dos.flush()
    bos.toByteArray
  }

  def isRawInsert(payload: Array[Byte]): Boolean =
    payload.length > 2 && payload(0) == RawInsertPrefix(0) &&
      payload(1) == RawInsertPrefix(1)
}

/** Minimal TCP front-end speaking the reference wire protocol, translating
  * commands to [[Engine]] calls (the reference's broker loop collapses to
  * a synchronized Engine — driver-side metadata only; scans stay
  * distributed). One thread per connection; good enough for the protocol
  * surface, swap for Netty if connection counts matter. */
final class TcpServer(engine: Engine, port: Int = 0) {
  private val server = new ServerSocket(port)
  private val running = new AtomicBoolean(true)
  val boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    // buffered streams + no Nagle: a request frame is two tiny writes and a
    // response three — unbuffered they each cost a syscall and the
    // write-write-read pattern trips Nagle/delayed-ACK stalls, capping the
    // pipelined insert path at ~2k/s instead of >100k/s
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    // per-connection current book, as the reference's `Connection.book_entry`
    // (`state.rs:177-188,510`) — USE/CREATE/LOAD on one connection must not
    // redirect implicit-book commands on another
    val session = new Session
    try {
      while (true) {
        val len = in.readInt()
        val payload = new Array[Byte](len)
        in.readFully(payload)
        val cmd =
          if (Wire.isRawInsert(payload))
            Wire.decodeInsertInto(payload) match {
              case Some((up, book)) => Command.Insert(up, book)
              case None => Command.BadFormat
            }
          else // a malformed GET range etc. is a Bad-format reply, not a hangup
            scala.util.Try(CommandParser.parse(new String(payload, "UTF-8")))
              .getOrElse(Command.BadFormat)
        val reply = engine.synchronized(engine.execute(cmd, session))
        reply match {
          case engine.Text(s) => write(out, ok = true, s.getBytes("UTF-8"))
          case engine.Err(e) =>
            write(out, ok = false, s"ERR: $e\n".getBytes("UTF-8"))
          case engine.Frame(df) =>
            val isText = df.schema.fields.length == 1 &&
              df.schema.fields(0).dataType ==
                org.apache.spark.sql.types.StringType
            // toLocalIterator streams one partition at a time: the driver
            // holds the encoded body bytes (~12 B/row for DTF), never the
            // full Row array — a GET ALL over a big book stays bounded by
            // the response size, not by row-object overhead
            val body = engine.synchronized {
              import scala.jdk.CollectionConverters._
              if (isText) { // AS CSV / AS JSON: newline-joined text body
                val sb = new java.lang.StringBuilder
                df.toLocalIterator().asScala.foreach { r =>
                  if (sb.length > 0) sb.append('\n')
                  sb.append(r.getString(0))
                }
                sb.toString.getBytes("UTF-8")
              } else { // binary GET: DTF batch framing (state.rs:31-37)
                import df.sparkSession.implicits._
                Wire.serializeBatches(
                  df.as[Update].toLocalIterator().asScala)
              }
            }
            write(out, ok = true, body)
        }
        // flush only when no request is already waiting: a pipelined
        // client's responses coalesce into large writes, a synchronous
        // client (exactly one in-flight request) flushes immediately
        if (in.available() == 0) out.flush()
      }
    } catch {
      case _: java.io.EOFException => () // normal client disconnect
      case e: Exception =>
        System.err.println(s"[graft-wire] connection handler died: $e")
    }
    finally sock.close()
  }

  private def write(out: DataOutputStream, ok: Boolean,
      body: Array[Byte]): Unit = {
    out.writeByte(if (ok) 1 else 0)
    out.writeLong(body.length.toLong)
    out.write(body)
  }

  def stop(): Unit = {
    running.set(false)
    server.close()
  }
}

/** Client for the wire protocol (the reference's `tdb-cli` surface). */
final class TcpClient(host: String, port: Int) {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(
    new BufferedInputStream(sock.getInputStream, 1 << 16))
  private val out = new DataOutputStream(
    new BufferedOutputStream(sock.getOutputStream, 1 << 16))

  def request(payload: Array[Byte]): (Boolean, Array[Byte]) = {
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
    val ok = in.readByte() == 1
    val len = in.readLong().toInt
    val body = new Array[Byte](len)
    in.readFully(body)
    (ok, body)
  }

  def cmd(s: String): (Boolean, String) = {
    val (ok, body) = request(s.getBytes("UTF-8"))
    (ok, new String(body, "UTF-8"))
  }

  def insertRaw(book: Option[String], u: Update): Boolean =
    request(Wire.encodeInsertInto(book, u))._1

  /** Run a GET returning binary DTF bodies and decode the updates
    * (`tdb-cli` client surface + `parse_stream` semantics). */
  def getUpdates(command: String): Seq[Update] = {
    val (ok, body) = request(command.getBytes("UTF-8"))
    if (!ok) Seq.empty else Wire.parseStream(body)
  }

  /** Pipelined fire-and-forget inserts — the reference benchmark's
    * `discard_result` mode (`tdb-cli/src/lib.rs:47-77`): frames stream
    * without per-insert round trips while a drain thread discards the
    * (empty-ok) responses, so throughput is bounded by server processing,
    * not by connection latency. Returns the number sent after all
    * responses have drained. */
  def insertRawPipelined(book: Option[String], ups: Seq[Update]): Int = {
    val expected = ups.size
    val drained = new java.util.concurrent.atomic.AtomicInteger(0)
    val drain = new Thread(() => {
      try {
        while (drained.get() < expected) {
          in.readByte()
          val len = in.readLong().toInt
          in.skipNBytes(len.toLong)
          drained.incrementAndGet()
        }
      } catch { case _: Exception => () }
    })
    drain.setDaemon(true)
    drain.start()
    ups.foreach { u =>
      val payload = Wire.encodeInsertInto(book, u)
      out.writeInt(payload.length)
      out.write(payload)
    }
    out.flush()
    drain.join(60000)
    drained.get()
  }

  def close(): Unit = sock.close()
}
