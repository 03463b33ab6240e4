package graft

import java.nio.file.Files

import graft.model.Update
import graft.server._

/** End-to-end wire protocol: real TCP sockets against the Engine,
  * reference framing (u32-len requests, u8+u64-len responses), binary raw
  * inserts, and the client benchmark loop shape
  * (`tests/integration_test.rs:8-35`). */
class WireSpec extends SparkSpec {

  test("raw-insert frame roundtrip (utils.rs:50-87, update.rs:215-234)") {
    // exact reference golden (update.rs:216-229)
    val golden = Update("", 1L, 1L, is_trade = false, is_bid = false,
      1e13f.toDouble, 1e12f.toDouble)
    assert(Wire.serializeRaw(golden).map(b => b & 0xFF).toSeq ===
      Seq(0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 85, 17, 132, 231, 83,
        104, 212, 165))
    val up = Update("", 1L, 2L, is_trade = false, is_bid = true, 3.0, 4.0)
    val frame = Wire.encodeInsertInto(Some("mybook"), up)
    val Some((Some(back), Some(book))) = Wire.decodeInsertInto(frame)
    assert(book === "mybook")
    assert(back.copy(symbol = "") === up)
  }

  test("tcp server: command round-trips and raw-insert ingest") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-wire").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      assert(client.cmd("PING") === ((true, "PONG")))
      assert(client.cmd("CREATE w1")._1)
      // text insert + binary raw insert
      assert(client.cmd("ADD 1505177459.658, 1, t, f, 1.5, 2.0; INTO w1")._1)
      assert(client.insertRaw(Some("w1"),
        Update("", 1505177460000L, 2, is_trade = false, is_bid = true,
          1.25, 3.5)))
      assert(client.cmd("COUNT ALL IN MEM") === ((true, "2")))
      // errors frame as failures
      val (ok, err) = client.cmd("GIBBERISH")
      assert(!ok && err.startsWith("ERR:"))
      // GET ALL returns a DTF batch-framed body (into_format/write_batches)
      client.cmd("USE w1")
      val got = client.getUpdates("GET ALL")
      assert(got.length === 2)
      assert(got.head.ts === 1505177459658L)
      assert(got(1).ts === 1505177460000L && !got(1).is_trade)
      // CSV format returns text
      val (cok, csv) = client.cmd("GET ALL AS CSV")
      assert(cok && csv.contains("1.5") && csv.split("\n").length === 2)
    } finally { client.close(); server.stop() }
  }

  test("binary GET bodies use DTF batch framing (write_batches golden)") {
    // reference byte golden (`file_format.rs:1219-1261`): one all-zero
    // update framed as marker, u64 ref_ts, u32 ref_seq, u16 count, 12-byte
    // delta row
    val zero = Update("", 0L, 0L, is_trade = false, is_bid = false, 0.0, 0.0)
    val bytes = Wire.serializeBatches(Iterator(zero))
    assert(bytes.map(b => b & 0xFF).toSeq ===
      Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(Wire.parseStream(bytes) === Seq(zero))
    // multi-batch roundtrip: a backwards seq forces a batch rollover
    val ups = Seq(
      Update("", 100L, 10L, is_trade = true, is_bid = true, 1.5, 2.0),
      Update("", 100L, 11L, is_trade = false, is_bid = false, 1.25, 0.5),
      Update("", 200L, 3L, is_trade = false, is_bid = true, 2.5, 1.0))
    val body = Wire.serializeBatches(ups.iterator)
    assert(body.length === 2 * 15 + 3 * 12) // two batch headers
    assert(Wire.parseStream(body) === ups)
  }

  test("OB over TCP returns serde-shaped orderbook JSON (state.rs:437-441)") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-ob").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      client.cmd("CREATE obbook")
      // levels discretize at the reference's hardcoded PRICE_DECIMALS=10
      // (state.rs:23): bid 1.25 -> 12500000000, ask 1.5 -> 15000000000
      assert(client.cmd("ADD 1505177459.658, 1, f, t, 1.25, 4.5;")._1)
      assert(client.cmd("ADD 1505177459.659, 2, f, f, 1.5, 2.0;")._1)
      val (ok, json) = client.cmd("OB")
      assert(ok, json)
      assert(json ===
        """{"price_decimals":10,"bids":{"12500000000":4.5},""" +
          """"asks":{"15000000000":2.0}}""")
      val (ok2, _) = client.cmd("OB obbook")
      assert(ok2)
      // unknown book errors instead of killing the connection
      val (ok3, err) = client.cmd("OB nosuchbook")
      assert(!ok3 && err.contains("Unable to get orderbook"))
      assert(client.cmd("PING")._1)
    } finally { client.close(); server.stop() }
  }

  test("current book is per-connection (Connection.book_entry semantics)") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-sess").toString)
    val server = new TcpServer(engine)
    val c1 = new TcpClient("127.0.0.1", server.boundPort)
    val c2 = new TcpClient("127.0.0.1", server.boundPort)
    try {
      c1.cmd("CREATE booka") // switches c1's session to booka
      c2.cmd("CREATE bookb") // switches c2's session to bookb
      assert(c1.cmd("ADD 1505177459.658, 1, t, f, 1.0, 2.0;")._1)
      assert(c1.cmd("ADD 1505177459.659, 2, t, f, 1.0, 2.0;")._1)
      assert(c2.cmd("ADD 1505177459.660, 3, t, f, 1.0, 2.0;")._1)
      // implicit-book COUNT must read each connection's own current book
      assert(c1.cmd("COUNT IN MEM") === ((true, "2")))
      assert(c2.cmd("COUNT IN MEM") === ((true, "1")))
      // c2's USE does not redirect c1
      c2.cmd("USE booka")
      assert(c2.cmd("COUNT IN MEM") === ((true, "2")))
      assert(c1.cmd("COUNT IN MEM") === ((true, "2")))
    } finally { c1.close(); c2.close(); server.stop() }
  }

  test("malformed command yields an error frame, not a disconnect") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-bad").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      // FROM without TO garbles parseRange's substring -> parse throws;
      // the server must reply Bad format and keep the connection alive
      val (ok, err) = client.cmd("GET 5 FROM 100")
      assert(!ok && err.contains("Bad format"))
      val (ok2, err2) = client.cmd("GET ALL FROM x TO y")
      assert(!ok2 && err2.contains("Bad format"))
      assert(client.cmd("PING") === ((true, "PONG")))
    } finally { client.close(); server.stop() }
  }

  test("malformed raw insert (negative name length) replies Bad format") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-badra").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      // forge `ra` + negative i64 name length + padding: decodeInsertIntoAt
      // must return None (Bad format reply), not throw out-of-bounds and
      // kill the connection
      val b = java.nio.ByteBuffer.allocate(2 + 8 + 22)
      b.put("ra".getBytes("UTF-8"))
      b.putLong(-42L)
      b.put(new Array[Byte](22))
      val (ok, err) = client.request(b.array())
      assert(!ok && new String(err, "UTF-8").contains("Bad format"))
      // frame-overrunning name length is equally malformed
      val b2 = java.nio.ByteBuffer.allocate(2 + 8 + 22)
      b2.put("ra".getBytes("UTF-8"))
      b2.putLong(1000000L)
      b2.put(new Array[Byte](22))
      val (ok2, err2) = client.request(b2.array())
      assert(!ok2 && new String(err2, "UTF-8").contains("Bad format"))
      // a 64-bit length that narrows to 0 (1L<<32) must NOT decode the
      // trailing garbage as a real insert — validate before .toInt
      val b3 = java.nio.ByteBuffer.allocate(2 + 8 + 22)
      b3.put("ra".getBytes("UTF-8"))
      b3.putLong(1L << 32)
      b3.put(new Array[Byte](22))
      val (ok3, err3) = client.request(b3.array())
      assert(!ok3 && new String(err3, "UTF-8").contains("Bad format"))
      assert(client.cmd("COUNT") === ((true, "0")),
        "forged-length frame must not insert data")
      assert(client.cmd("PING") === ((true, "PONG")))
    } finally { client.close(); server.stop() }
  }

  test("forged oversize/overflowing frame length closes cleanly") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-hugelen").toString)
    val server = new TcpServer(engine)
    // Int.MaxValue-2 as a length prefix: `len + 4` would overflow Int and
    // slip past both the negative-length and oversized-frame guards; the
    // server must treat it as a protocol error (EOF), never allocate, and
    // keep accepting fresh connections
    val sock = new java.net.Socket("127.0.0.1", server.boundPort)
    try {
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      out.writeInt(Int.MaxValue - 2)
      out.write(new Array[Byte](64))
      out.flush()
      assert(sock.getInputStream.read() === -1) // server hung up, no reply
      val client = new TcpClient("127.0.0.1", server.boundPort)
      try assert(client.cmd("PING") === ((true, "PONG")))
      finally client.close()
    } finally { sock.close(); server.stop() }
  }

  test("integration throughput shape: 10k raw inserts land in mem") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-bench").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      client.cmd("CREATE bench")
      val t0 = System.nanoTime()
      var i = 0
      while (i < 10000) {
        client.insertRaw(Some("bench"),
          Update("", 1500000000000L + i, i.toLong, i % 2 == 0, i % 3 == 0,
            1.0f + (i % 100), 2.0))
        i += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      assert(client.cmd("COUNT ALL IN MEM") === ((true, "10000")))
      info(f"10k inserts in $secs%.2f s (${10000 / secs}%.0f inserts/s)")
      assert(secs < 15.0) // integration_test.rs bound
    } finally { client.close(); server.stop() }
  }

  test("pipelined fire-and-forget inserts (tdb -b benchmark mode)") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-bench2").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      client.cmd("CREATE pbench")
      val n = 500000
      val ups = (0 until n).map(i =>
        Update("", 1500000000000L + i, i.toLong, i % 2 == 0, i % 3 == 0,
          1.0f + (i % 100), 2.0))
      val t0 = System.nanoTime()
      val sent = client.insertRawPipelined(Some("pbench"), ups)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(sent === n)
      assert(client.cmd("COUNT ALL IN MEM") === ((true, s"$n")))
      info(f"$n pipelined inserts in $secs%.2f s (${n / secs}%.0f inserts/s)")
      // reference baseline: 600k inserts/thread/s (README.md:28); the
      // batched read path measures ~750k/s here — gate well above the old
      // per-frame path (~110k/s) so a regression to it fails loudly
      assert(n / secs > 300000.0, f"pipelined rate too low: ${n / secs}%.0f/s")
    } finally { client.close(); server.stop() }
  }

  test("GET stays correct while compaction swaps the book dir under it") {
    // regression for the round-4 race: Wire used to release the engine
    // lock between GET execution (which captures the parquet file
    // listing) and row materialization — a compaction swap in that gap
    // made GETs fail on moved files. Now both run in one synchronized
    // section, so swaps and GETs interleave but never overlap.
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-race").toString)
    val server = new TcpServer(engine)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      assert(client.cmd("CREATE rc")._1)
      client.cmd("USE rc")
      // several flush files so every compaction performs a real swap
      for (i <- 0 until 4) {
        for (j <- 0 until 25) {
          val ts = 1505177000.0 + i * 100 + j
          assert(client.cmd(f"ADD $ts%.3f, ${i * 25 + j}, t, f, 1.5, 2.0;")._1)
        }
        assert(client.cmd("FLUSH")._1)
      }
      @volatile var stop = false
      @volatile var compactions = 0
      @volatile var compactErr: Option[Throwable] = None
      val compactor = new Thread(() => {
        try {
          while (!stop) {
            engine.compactBook("rc", targetBytes = 16L << 10)
            compactions += 1
          }
        } catch { case e: Throwable => compactErr = Some(e) }
      })
      compactor.start()
      val deadline = System.currentTimeMillis + 3000
      var gets = 0
      while (System.currentTimeMillis < deadline) {
        // ranged GET -> Loc.Fs: reads the parquet book dir being swapped
        val got = client.getUpdates(
          "GET 100 FROM 1505176000 TO 1505180000")
        assert(got.length === 100,
          s"GET during compaction lost rows: ${got.length}/100")
        gets += 1
      }
      stop = true
      compactor.join(10000)
      assert(compactErr.isEmpty, s"compactor failed: $compactErr")
      assert(gets > 0 && compactions > 0,
        s"no real interleaving: $gets GETs, $compactions compactions")
    } finally { client.close(); server.stop() }
  }

  test("ingest proceeds while a big GET ALL materializes on another connection") {
    // VERDICT r5 #7: the r5 scheme materialized every GET body inside
    // engine.synchronized, so a GET ALL over a big book stalled ingest on
    // every other connection for its full duration. Now readers share
    // swapGate's read side and the monitor covers only execute(), so
    // inserts on connection B must complete WHILE connection A's large
    // GET is still draining — red under the old locking.
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-rw").toString
    val n = 2 * 1000 * 1000
    spark.range(n.toLong).select(
      lit("big").as("symbol"), (lit(1500000000000L) + col("id")).as("ts"),
      col("id").as("seq"), lit(true).as("is_trade"),
      lit(true).as("is_bid"), lit(1.5).as("price"), lit(2.0).as("size"))
      .write.parquet(s"$dir/book=big")
    val engine = new Engine(spark, dir)
    val server = new TcpServer(engine)
    val getter = new TcpClient("127.0.0.1", server.boundPort)
    val inserter = new TcpClient("127.0.0.1", server.boundPort)
    try {
      assert(getter.cmd("USE big")._1)
      assert(inserter.cmd("CREATE other")._1)
      val getDone = new java.util.concurrent.atomic.AtomicLong(0L)
      @volatile var getRows = -1
      val getThread = new Thread(() => {
        getRows = getter.getUpdates(
          s"GET ALL FROM 1400000000 TO 1600000000").length
        getDone.set(System.nanoTime())
      })
      getThread.start()
      Thread.sleep(100) // let the GET enter materialization
      val insStart = System.nanoTime()
      for (i <- 0 until 200)
        assert(inserter.insertRaw(Some("other"),
          graft.model.Update("other", 1500000000000L + i, i.toLong,
            true, true, 1.0, 1.0)))
      val insDone = System.nanoTime()
      getThread.join(120000)
      assert(getRows === n, s"GET ALL lost rows: $getRows/$n")
      assert(getDone.get() > 0, "GET never completed")
      assert(insDone < getDone.get(),
        "inserts queued behind the GET: reader gate not shared")
      val insSecs = (insDone - insStart) / 1e9
      assert(insSecs < 5.0, f"insert latency under GET: $insSecs%.2f s")
      info(f"200 inserts in $insSecs%.3f s while GET ALL drained " +
        f"${(getDone.get() - insStart) / 1e9}%.2f s behind them")
    } finally { getter.close(); inserter.close(); server.stop() }
  }

  test("concurrent pipelined ingest across connections stays consistent") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-bench3").toString)
    val server = new TcpServer(engine)
    val setup = new TcpClient("127.0.0.1", server.boundPort)
    val books = (0 until 4).map(i => s"cbench$i")
    try {
      books.foreach(b => setup.cmd(s"CREATE $b"))
      val perConn = 250000
      val t0 = System.nanoTime()
      val threads = books.map { b =>
        val t = new Thread(() => {
          val c = new TcpClient("127.0.0.1", server.boundPort)
          try {
            val ups = (0 until perConn).map(i =>
              Update("", 1500000000000L + i, i.toLong, i % 2 == 0,
                i % 3 == 0, 1.0 + (i % 100), 2.0))
            assert(c.insertRawPipelined(Some(b), ups) === perConn)
          } finally c.close()
        })
        t.start(); t
      }
      threads.foreach(_.join(120000))
      val secs = (System.nanoTime() - t0) / 1e9
      val total = books.length * perConn
      assert(setup.cmd("COUNT ALL IN MEM") === ((true, s"$total")))
      books.foreach { b =>
        setup.cmd(s"USE $b")
        assert(setup.cmd("COUNT IN MEM") === ((true, s"$perConn")))
      }
      info(f"$total concurrent inserts over ${books.length} connections " +
        f"in $secs%.2f s (${total / secs}%.0f inserts/s)")
      // VERDICT r1 done-bar: >= 2x the old aggregate (~450k/s); measured
      // ~2M/s with per-connection batch ingest
      assert(total / secs > 450000.0,
        f"aggregate rate too low: ${total / secs}%.0f/s")
    } finally { setup.close(); server.stop() }
  }

  test("SQL passthrough (VERDICT r15 #5): opt-in flag exposes the " +
      "analytics surface over TCP; reference grammar untouched either " +
      "way") {
    val engine =
      new Engine(spark, Files.createTempDirectory("graft-sql").toString)
    // flag OFF (the default): `SQL ...` is an unknown line, byte-equal
    // to the reference's unknown-command reply — grammar parity holds
    val plain = new TcpServer(engine)
    val pc = new TcpClient("127.0.0.1", plain.boundPort)
    try assert(pc.cmd("SQL SELECT 1 AS x") ===
      ((false, "ERR: Unknown command.\n")))
    finally { pc.close(); plain.stop() }
    // flag ON: scalar SQL, engine data through the `updates` view, and
    // an error reply on bad SQL (no hangup)
    val server = new TcpServer(engine, enableSql = true)
    val client = new TcpClient("127.0.0.1", server.boundPort)
    try {
      assert(client.cmd("SQL SELECT 1 AS x") === ((true, "{\"x\":1}\n")))
      assert(client.cmd("CREATE sq1")._1)
      client.cmd("USE sq1")
      assert(client.cmd("ADD 1505177459.658, 1, t, f, 1.5, 2.0; INTO sq1")._1)
      assert(client.cmd("ADD 1505177459.659, 2, t, t, 2.5, 4.0; INTO sq1")._1)
      val (ok, body) = client.cmd(
        "SQL SELECT count(*) AS n, sum(size) AS sz FROM updates")
      assert(ok && body === "{\"n\":2,\"sz\":6.0}\n", body)
      // per-row JSON lines with an ORDER BY
      val (ok2, body2) = client.cmd(
        "SQL SELECT seq, price FROM updates ORDER BY seq")
      assert(ok2 && body2 ===
        "{\"seq\":1,\"price\":1.5}\n{\"seq\":2,\"price\":2.5}\n", body2)
      val (bad, err) = client.cmd("SQL SELEKT nonsense")
      assert(!bad && err.startsWith("ERR: SQL:"), err)
      // the reference grammar still answers on the SAME connection
      assert(client.cmd("PING") === ((true, "PONG")))
      assert(client.cmd("COUNT ALL IN MEM") === ((true, "2")))
    } finally { client.close(); server.stop() }
  }
}
