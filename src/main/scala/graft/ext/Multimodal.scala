package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat opaque binary payloads with typed
  * metadata, run per-partition batch "decode / feature-extract" kernels.
  *
  * Two kernel tiers:
  *
  *  - the ORACLE-GATED operators ([[decodeMeta]], [[resizeStub]]) use a
  *    clearly-marked DETERMINISTIC STUB (`stubDecode`) because the DuckDB
  *    correctness twin must replicate the kernel in SQL;
  *  - [[decodeImageMeta]] / [[resizeImage]] / [[decodeAudioMeta]] /
  *    [[decodeVideoMeta]] are REAL kernels on the same `mapPartitions`
  *    batch plumbing: the JDK's own codec surfaces (`javax.imageio`:
  *    PNG/JPEG/BMP/GIF; `javax.sound.sampled`: WAV/AIFF/AU PCM — both
  *    headless-safe) plus a hand-rolled MP4/ISO-BMFF box walk for video
  *    metadata (pure byte parsing, no codec needed) — all spec-gated with
  *    synthesized payloads since the driver testdata carries no real
  *    blobs. Only video PIXEL decode still needs an external codec
  *    (JNI/ffmpeg would swap in without touching the plumbing).
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("modality", StringType)))

  /** STUB decode kernel: in a real pipeline this would parse the container
    * header / run the codec. Deterministic pure function of the payload so
    * the DuckDB oracle can replicate it. */
  private def stubDecode(docId: Long, payload: Array[Byte])
      : (Long, Long, Long, String) = {
    val n = payload.length.toLong
    val width = 64 + n % 512
    val height = 64 + (n * 7) % 512
    val frames = 1 + docId % 30
    val modality = (docId % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    (width, height, frames, modality)
  }

  /** Batch feature extraction over an opaque binary column. `documents.text`
    * stands in for the blob (cast to UTF-8 bytes); the operator consumes a
    * genuine BinaryType column. */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val binary = docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.Encoders.row(metaSchema)
    binary.mapPartitions { rows =>
      // one iterator pass per partition = one batch per decode kernel call
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, f, m) = stubDecode(id, payload)
        Row(id, payload.length.toLong, w, h, f, m)
      }
    }(enc)
  }

  /** Frame sampling over video payloads: every `everyK`-th frame index of
    * each decoded video. The sampling itself is pure Spark
    * (`sequence` + `explode` — a Generate, no UDF); a real pipeline would
    * then feed (doc_id, frame_idx) to a frame-extract kernel. */
  def frameSample(docs: DataFrame, everyK: Int = 5): DataFrame =
    decodeMeta(docs)
      .where(col("modality") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong)))
          .as("frame_idx"))

  def frameSampleSql(everyK: Int = 5): String =
    s"""SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, $everyK)) AS frame_idx
       |FROM (SELECT doc_id, 1 + doc_id % 30 AS n_frames,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |    ELSE 'video' END AS modality
       | FROM documents)
       |WHERE modality = 'video'
       |ORDER BY doc_id, frame_idx""".stripMargin.replace('\n', ' ')

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_bytes", LongType)))

  /** STUB resize kernel over image payloads via the same `mapPartitions`
    * batch plumbing as [[decodeMeta]]: output dimensions are the target,
    * byte size is the deterministic RGB-buffer stub `w*h*3`. Swap the row
    * mapper for a real scaler without touching schema or batching. */
  def resizeStub(docs: DataFrame, width: Int, height: Int): DataFrame = {
    val binary = docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.Encoders.row(resizeSchema)
    val (w, h) = (width.toLong, height.toLong)
    binary.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (_, _, _, modality) = stubDecode(id, payload)
        // a real kernel resizes here; only images pass through
        if (modality == "image") Some(Row(id, w, h, w * h * 3L)) else None
      }
    }(enc)
  }

  def resizeStubSql(width: Int, height: Int): String =
    s"""SELECT doc_id, $width AS width, $height AS height,
       | ${width.toLong * height * 3} AS n_bytes
       |FROM documents WHERE doc_id % 3 = 0
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  /** REAL image decode over a `(doc_id, payload: binary)` frame — the JDK
    * codec surface (`ImageIO.read`) parses PNG/JPEG/BMP/GIF headers and
    * pixels; undecodable payloads come back with null dimensions and
    * modality "unknown" instead of failing the task. Same batch plumbing
    * and output schema as [[decodeMeta]]. */
  def decodeImageMeta(images: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(metaSchema)
    images.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null)
          Row(id, payload.length.toLong, null, null, null, "unknown")
        else
          Row(id, payload.length.toLong, img.getWidth.toLong,
            img.getHeight.toLong, 1L, "image")
      }
    }(enc)
  }

  val imageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("payload", BinaryType)))

  /** REAL resize kernel: bilinear `Graphics2D` scale, re-encoded as PNG.
    * Undecodable payloads are dropped (the real-pipeline convention:
    * corrupt blobs filter out, they don't poison the batch). */
  def resizeImage(images: DataFrame, width: Int, height: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageSchema)
    images.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (src == null) None
        else {
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, width, height, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Some(Row(id, width.toLong, height.toLong, baos.toByteArray))
        }
      }
    }(enc)
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("sample_rate", DoubleType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_s", DoubleType),
    StructField("rms", DoubleType)))

  /** REAL audio decode over a `(doc_id, payload: binary)` frame — the
    * JDK's own codec surface (`javax.sound.sampled.AudioSystem`) parses
    * WAV/AIFF/AU containers, no external library. Any supported encoding
    * (8/16-bit PCM, µ-law/a-law) is CONVERTED to signed 16-bit PCM before
    * the sample loop, so RMS energy (the standard cheap silence /
    * quality signal) is computed over real samples, never over raw
    * container bytes. Sample counts come from the decoded byte stream,
    * not the header's (possibly NOT_SPECIFIED) frame length.
    * NULL or undecodable payloads come back with null audio fields —
    * corrupt blobs are data, not task failures. Same batch plumbing as
    * [[decodeMeta]]; only video now lacks a real kernel (no JDK codec). */
  def decodeAudioMeta(audio: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioSchema)
    audio.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        // payload length is read OUTSIDE the try: the failure row uses it,
        // and a NULL payload must not NPE inside the catch
        val nBytes = if (payload == null) 0L else payload.length.toLong
        try {
          val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val srcFmt = raw.getFormat
          val pcm16 = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            srcFmt.getSampleRate, 16, srcFmt.getChannels,
            srcFmt.getChannels * 2, srcFmt.getSampleRate, false)
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(pcm16, raw)
          val bytes = in.readAllBytes()
          // RMS over signed 16-bit little-endian samples (all channels)
          var sumSq = 0.0
          var i = 0
          while (i + 1 < bytes.length) {
            val s = (((bytes(i + 1).toInt << 8) |
              (bytes(i) & 0xFF)).toShort) / 32768.0
            sumSq += s * s
            i += 2
          }
          val n = bytes.length / 2
          val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
          val frames = n.toLong / srcFmt.getChannels
          Row(id, nBytes, srcFmt.getSampleRate.toDouble,
            srcFmt.getChannels, frames,
            frames / srcFmt.getSampleRate.toDouble, rms)
        } catch {
          case _: Exception =>
            Row(id, nBytes, null, null, null, null, null)
        }
      }
    }(enc)
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("duration_s", DoubleType)))

  /** REAL video METADATA kernel: an MP4/ISO-BMFF box walk — pure byte
    * parsing, no codec required for metadata (the same class of work as
    * the WAV header path): `moov/trak/tkhd` → width/height (16.16 fixed
    * point), `moov/trak/mdia/mdhd` → timescale + duration,
    * `moov/trak/mdia/hdlr` = 'vide' selects the video track among audio /
    * hint tracks, `stbl/stsz` → sample (frame) count. Handles version 0
    * and version 1 full boxes and 64-bit `largesize` boxes. PIXEL decode
    * genuinely needs a codec the JDK lacks and stays out of scope.
    * Undecodable / non-MP4 payloads yield null video fields — corrupt
    * blobs are data, not task failures. Same batch plumbing as
    * [[decodeMeta]]. */
  def decodeVideoMeta(videos: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(videoSchema)
    videos.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nBytes = if (payload == null) 0L else payload.length.toLong
        parseMp4VideoTrack(payload) match {
          case Some((w, h, frames, dur)) =>
            Row(id, nBytes, w, h, frames, dur)
          case None => Row(id, nBytes, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Iterate the ISO-BMFF boxes in `b[from, to)` as
    * (type, payloadStart, boxEnd). Malformed sizes end the walk instead of
    * throwing — whatever parsed up to that point stands. */
  private def boxes(b: Array[Byte], from: Int, to: Int)
      : Seq[(String, Int, Int)] = {
    def be32(off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    def be64(off: Int): Long = (be32(off) << 32) | be32(off + 4)
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = from
    var ok = true
    while (ok && off + 8 <= to) {
      val size32 = be32(off)
      val tpe = new String(b, off + 4, 4, "ISO-8859-1")
      val (payloadStart, end) =
        if (size32 == 1L && off + 16 <= to) (off + 16L, off + be64(off + 8))
        else if (size32 == 0L) (off + 8L, to.toLong) // box runs to EOF
        else (off + 8L, off + size32)
      if (size32 != 0L && size32 != 1L && size32 < 8L) ok = false
      else if (end > to || payloadStart > end) ok = false
      else {
        out += ((tpe, payloadStart.toInt, end.toInt))
        off = end.toInt
      }
    }
    out.result()
  }

  /** Width/height/frame-count/duration of the FIRST `vide` track, or None
    * when the payload is not parseable MP4. Exposed for the spec. */
  private[ext] def parseMp4VideoTrack(b: Array[Byte])
      : Option[(Long, Long, Long, Double)] = {
    if (b == null || b.length < 16) return None
    try {
      def be16(off: Int): Int =
        ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
      def be32(off: Int): Long =
        ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
          ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
      def be64(off: Int): Long = (be32(off) << 32) | be32(off + 4)
      val top = boxes(b, 0, b.length)
      // require the MP4 signature: an ftyp/styp before (or a bare) moov —
      // pure-garbage payloads otherwise risk accidental "box" framing
      if (!top.exists(t => t._1 == "ftyp" || t._1 == "styp" ||
        t._1 == "moov")) return None
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      val traks = boxes(b, moov._2, moov._3).filter(_._1 == "trak")
      traks.iterator.flatMap { case (_, ts, te) =>
        val tboxes = boxes(b, ts, te)
        val mdia = tboxes.find(_._1 == "mdia")
        val mboxes = mdia.map(m => boxes(b, m._2, m._3)).getOrElse(Seq.empty)
        val handler = mboxes.find(_._1 == "hdlr").map { case (_, p, _) =>
          new String(b, p + 8, 4, "ISO-8859-1")
        }
        if (!handler.contains("vide")) Iterator.empty
        else {
          // tkhd: after version(1)+flags(3), v0 has 5×u32 (creation,
          // modification, track_id, reserved, duration) = 20 B, v1 grows
          // times+duration to u64 = 32 B; then 8 B reserved, layer/
          // alternate_group/volume/reserved (2 B each), 36 B matrix,
          // then width/height as 16.16 fixed point.
          val wh = tboxes.find(_._1 == "tkhd").map { case (_, p, _) =>
            val fixed = if (b(p) == 0) 20 else 32
            val at = p + 4 + fixed + 8 + 2 + 2 + 2 + 2 + 36
            (be32(at) >> 16, be32(at + 4) >> 16)
          }
          // mdhd: v0 = u32 creation/modification/timescale/duration,
          // v1 = u64 times, u32 timescale, u64 duration
          val dur = mboxes.find(_._1 == "mdhd").map { case (_, p, _) =>
            if (b(p) == 0) (be32(p + 12), be32(p + 16).toDouble)
            else (be32(p + 20), be64(p + 24).toDouble)
          }.collect { case (scale, d) if scale > 0 => d / scale }
          // stsz sample_count = frame count (entries may be fixed-size)
          val frames = for {
            (_, mp, me) <- mboxes.find(_._1 == "minf")
            (_, sp, se) <- boxes(b, mp, me).find(_._1 == "stbl")
            (_, zp, _) <- boxes(b, sp, se).find(_._1 == "stsz")
          } yield be32(zp + 8)
          (wh, frames, dur) match {
            case (Some((w, h)), Some(f), Some(d)) => Iterator((w, h, f, d))
            case _ => Iterator.empty
          }
        }
      }.nextOption()
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** DuckDB twin of the stub arithmetic (text is ASCII in the testdata, so
    * byte length == char length). */
  val decodeMetaSql: String =
    """SELECT doc_id, length(text) AS n_bytes,
      | 64 + length(text) % 512 AS width,
      | 64 + (length(text) * 7) % 512 AS height,
      | 1 + doc_id % 30 AS n_frames,
      | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |   ELSE 'video' END AS modality
      |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')
}
