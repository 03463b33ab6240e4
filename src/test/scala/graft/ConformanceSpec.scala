package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.file.Files

import graft.model.Update
import graft.server._

/** Wire-protocol conformance transcripts derived from the REFERENCE's own
  * client spec and server source — not from builder-authored goldens (which
  * can encode the builder's own misreading; VERDICT r7 #5 / r8 #3).
  *
  * Sources of truth, cited per transcript:
  *  - request framing: u32 BE length + payload, trailing '\n' stripped by
  *    the parser (`tdb-server-core/src/server.rs:90-98`,
  *    `handler.rs:99`)
  *  - response framing: u8 success + u64 BE body length + body — the
  *    `struct.unpack('>?Q', header)` contract in
  *    `docs/API/specs.md` / `cli/python/tectonic.py:89-103`
  *  - error bodies: `"ERR: {msg}\n"` (`server.rs:196-203`)
  *  - reply strings: `state.rs:227-331` (PONG, "1", counts, `Created
  *    orderbook ...`), `handler.rs:13-15` (HELP_STR), handler's own unit
  *    goldens (`handler.rs:237-243`: CREATE reply text, ADD replies "")
  *  - GET bodies: `state.rs:31-52` (`into_format`: DTF = `write_batches`
  *    bytes; JSON = objects joined ", " + '\n'; CSV = rows joined '\n' +
  *    '\n') with per-field rendering from `dtf/update.rs:145-168`
  *    (ts as seconds float, t/f bools in CSV, true/false in JSON, Rust
  *    `{}` float Display).
  */
class ConformanceSpec extends SparkSpec {

  /** Raw transcript client: sends `u32 BE len + payload`, reads the exact
    * 9-byte header + body and returns them verbatim — no client-side
    * interpretation beyond the header length (so a wrong success flag or
    * length mis-encoding fails the byte comparison, not a decoder). */
  private final class RawClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true)
    // a protocol bug (lost push, short frame) must fail the test in
    // seconds, never hang the suite on a blocking read
    sock.setSoTimeout(30000)
    private val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))

    def roundtrip(payload: Array[Byte]): Array[Byte] = {
      out.writeInt(payload.length)
      out.write(payload)
      out.flush()
      val header = new Array[Byte](9)
      in.readFully(header)
      val len = java.nio.ByteBuffer.wrap(header, 1, 8).getLong.toInt
      val body = new Array[Byte](len)
      in.readFully(body)
      header ++ body
    }

    /** Read one unsolicited frame (subscription push) without sending. */
    def readFrame(): Array[Byte] = {
      val header = new Array[Byte](9)
      in.readFully(header)
      val len = java.nio.ByteBuffer.wrap(header, 1, 8).getLong.toInt
      val body = new Array[Byte](len)
      in.readFully(body)
      header ++ body
    }

    def close(): Unit = sock.close()
  }

  /** Expected response bytes: success flag + u64 BE length + body. */
  private def ok(body: String): Array[Byte] = frame(1, body.getBytes("UTF-8"))
  private def err(msg: String): Array[Byte] =
    frame(0, s"ERR: $msg\n".getBytes("UTF-8"))
  private def frame(flag: Byte, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9 + body.length)
    b.put(flag)
    b.putLong(body.length.toLong)
    b.put(body)
    b.array()
  }

  private def hex(a: Array[Byte]): String = a.map("%02x".format(_)).mkString

  private def withServer(f: RawClient => Unit): Unit = {
    val engine = new Engine(spark,
      Files.createTempDirectory("graft-conf").toString)
    val server = new TcpServer(engine)
    val client = new RawClient(server.boundPort)
    try f(client) finally { client.close(); server.stop() }
  }

  private def check(c: RawClient, cmd: String, expected: Array[Byte]): Unit = {
    val got = c.roundtrip(cmd.getBytes("UTF-8"))
    assert(hex(got) === hex(expected),
      s"transcript mismatch for `$cmd`:\n got ${new String(got, "UTF-8")}")
  }

  test("command/reply transcript: PING, HELP, CREATE, USE, EXISTS, " +
    "COUNT, FLUSH, CLEAR (state.rs:227-331, handler.rs:237-243)") {
    withServer { c =>
      // trailing '\n' in the payload is stripped (handler.rs:99) — the
      // Python client always appends one (tectonic.py:70)
      check(c, "PING\n", ok("PONG"))
      check(c, "PING", ok("PONG"))
      // HELP_STR byte-for-byte (handler.rs:13-15)
      check(c, "HELP", ok("\n    PING, INFO, USE [db], CREATE [db],\n" +
        "    ADD [ts],[seq],[is_trade],[is_bid],[price],[size];\n" +
        "    FLUSH, FLUSH ALL, GET ALL, GET [count], CLEAR"))
      // the reference's own handler unit golden (handler.rs:237-238)
      check(c, "CREATE bnc_btc_eth", ok("Created orderbook `bnc_btc_eth`."))
      check(c, "CREATE bnc_btc_eth",
        err("Unable to create orderbook `bnc_btc_eth`."))
      check(c, "EXISTS bnc_btc_eth", ok("1")) // ReturnType::ok (state.rs:317)
      check(c, "EXISTS ghost", err("No db named `ghost`")) // state.rs:319
      check(c, "USE bnc_btc_eth", ok("SWITCHED TO orderbook `bnc_btc_eth`."))
      check(c, "USE ghost", err("No db named `ghost`")) // state.rs:312
      // ADD replies String("") — header-only response (handler.rs:239-243)
      check(c, "ADD 1505177459.658, 139010, t, f, 0.0703629, 7.65064249;",
        ok(""))
      check(c, "COUNT IN MEM", ok("1")) // format!("{}", c) — no newline
      check(c, "COUNT ALL IN MEM", ok("1"))
      check(c, "FLUSH", ok("1")) // ReturnType::ok (state.rs:262)
      check(c, "COUNT", ok("1"))
      check(c, "CLEAR", ok("1")) // ReturnType::ok (state.rs:254)
      check(c, "COUNT IN MEM", ok("0"))
      // noop: empty command replies success, empty body (state.rs:227) —
      // the Python client's poll() path
      check(c, "", ok(""))
      check(c, "\n", ok(""))
      // unknown + bad-format error bodies (state.rs:327-331) framed as
      // "ERR: ...\n" with success=0 (server.rs:196-203)
      check(c, "GIBBERISH", err("Unknown command."))
      check(c, "INSERT not,a,real,line; INTO bnc_btc_eth",
        err("Unable to parse line")) // state.rs:278
      check(c, "ADD 1, 2, t, f, 1.0, 1.0; INTO ghost",
        err("DB ghost not found.")) // state.rs:275
    }
  }

  test("GET AS JSON / AS CSV body transcript (state.rs:31-52, " +
    "update.rs:145-168)") {
    withServer { c =>
      check(c, "CREATE tjson", ok("Created orderbook `tjson`."))
      // values chosen exactly representable in f32 so the reference's
      // f32 fields and our doubles have identical shortest-digit reprs
      check(c, "ADD 1505177459.658, 139010, t, f, 1.25, 4.5;", ok(""))
      check(c, "ADD 1505177460.0, 139011, f, t, 0.0625, 2.0;", ok(""))
      // JSON: objects joined ", ", ONE trailing '\n' (into_format
      // state.rs:39-45, update_vec_to_json update.rs:39-42); ts = ms/1000
      // as float, integral floats render without ".0" (Rust `{}`), bools
      // lowercase true/false (update.rs:145-155)
      check(c, "GET ALL AS JSON",
        ok("{\"ts\":1505177459.658,\"seq\":139010,\"is_trade\":true," +
          "\"is_bid\":false,\"price\":1.25,\"size\":4.5}, " +
          "{\"ts\":1505177460,\"seq\":139011,\"is_trade\":false," +
          "\"is_bid\":true,\"price\":0.0625,\"size\":2}\n"))
      // CSV: rows joined '\n', ONE trailing '\n'; bools render t/f
      // (update.rs:157-168)
      check(c, "GET ALL AS CSV",
        ok("1505177459.658,139010,t,f,1.25,4.5\n" +
          "1505177460,139011,f,t,0.0625,2\n"))
    }
  }

  test("binary transcript: raw INSERT INTO frame + GET ALL DTF body " +
    "(utils.rs:50-87, state.rs:31-37)") {
    withServer { c =>
      check(c, "CREATE tdtf", ok("Created orderbook `tdtf`."))
      // raw insert frame (utils.rs:50-64): b"ra" + u64 BE name len + name
      // + 21-byte raw update + '\n'; reply is success + empty body
      val up = Update("", 1505177459658L, 139010L, is_trade = true,
        is_bid = false, 1.25, 4.5)
      val raw = Wire.encodeInsertInto(Some("tdtf"), up)
      assert(hex(c.roundtrip(raw)) === hex(ok("")))
      check(c, "USE tdtf", ok("SWITCHED TO orderbook `tdtf`."))
      // binary GET body IS write_batches output (into_format state.rs:31-37):
      // per batch a 0x1 marker + u64 ref_ts + u32 ref_seq + u16 count, then
      // 12-byte delta rows (file_format.rs read_one_batch layout)
      val resp = c.roundtrip("GET ALL".getBytes("UTF-8"))
      assert(resp(0) === 1.toByte)
      val body = resp.drop(9)
      assert(hex(body) === hex(Wire.serializeBatches(Iterator(
        up.copy(symbol = "tdtf")))))
      // and the reference client decodes it via parse_stream
      // (tectonic.py:79-83 -> ffi.parse_stream)
      val decoded = Wire.parseStream(body)
      assert(decoded.map(_.copy(symbol = "")) === Seq(up))
    }
  }

  test("SUBSCRIBE push transcript: inserts to a subscribed book arrive " +
    "as raw encode_insert_into frames (state.rs:469-477)") {
    val engine = new Engine(spark,
      Files.createTempDirectory("graft-subs").toString)
    val server = new TcpServer(engine)
    val sub = new RawClient(server.boundPort)
    val pub = new RawClient(server.boundPort)
    try {
      check(pub, "CREATE subbook", ok("Created orderbook `subbook`."))
      check(sub, "SUBSCRIBE subbook", ok("Subscribed to subbook"))
      // publisher inserts; the subscriber's NEXT frame (unsolicited — no
      // request sent) must be a success frame whose body is exactly the
      // send_subs payload: encode_insert_into(book, update)
      check(pub, "ADD 1505177459.658, 7, t, f, 1.25, 4.5; INTO subbook",
        ok(""))
      val up = graft.model.Update("subbook", 1505177459658L, 7L,
        is_trade = true, is_bid = false, 1.25, 4.5)
      val expected = frame(1, Wire.encodeInsertInto(Some("subbook"), up))
      val got = sub.readFrame()
      assert(hex(got) === hex(expected), "pushed frame mismatch")
      // the pushed body round-trips through the raw-insert decoder the
      // reference clients use
      val Some((Some(back), Some(book))) =
        Wire.decodeInsertInto(got.drop(9))
      assert(book === "subbook" && back.copy(symbol = "subbook") === up)
      // disconnecting the subscriber unregisters its sink: further
      // inserts must not error the server
      sub.close()
      Thread.sleep(50)
      check(pub, "ADD 1505177460.0, 8, t, f, 1.5, 2.0; INTO subbook", ok(""))
      check(pub, "COUNT IN MEM", ok("2"))
    } finally { pub.close(); server.stop() }
  }

  test("INFO body matches the reference's pretty-printed shape " +
    "(state.rs:379-435, ts field normalized)") {
    withServer { c =>
      check(c, "CREATE infobook", ok("Created orderbook `infobook`."))
      check(c, "ADD 1505177459.658, 1, t, f, 1.25, 4.5;", ok(""))
      val resp = c.roundtrip("INFO".getBytes("UTF-8"))
      assert(resp(0) === 1.toByte)
      val body = new String(resp.drop(9), "UTF-8")
      // the "ts" field is wall-clock; normalize it, then compare the whole
      // body byte-for-byte against the reference format strings
      val normalized = body.replaceAll("\"ts\": \\d+", "\"ts\": TS")
      val expected =
        "{\n  \"meta\": {\n    \"clis\": 1,\n    \"subs\": 0,\n" +
          "    \"ts\": TS,\n    \"autoflush_enabled\": false,\n" +
          "    \"autoflush_interval\": 1000,\n" +
          "    \"dtf_folder\": \"DIR\",\n" +
          "    \"total_in_memory_count\": 1,\n    \"total_count\": 1\n" +
          "  },\n  \"dbs\": [{\n    \"name\": \"default\",\n" +
          "    \"in_memory\": 0,\n    \"count\": 0\n  }, {\n" +
          "    \"name\": \"infobook\",\n" +
          "    \"in_memory\": 1,\n    \"count\": 1\n  }]\n}\n"
      val normDir =
        normalized.replaceAll("\"dtf_folder\": \"[^\"]*\"",
          "\"dtf_folder\": \"DIR\"")
      assert(normDir === expected, s"INFO body:\n$body")
    }
  }
}
