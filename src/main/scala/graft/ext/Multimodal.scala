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
  *  - [[decodeImageMeta]] / [[resizeImage]] / [[decodeAudioMeta]] are REAL
  *    kernels on the same `mapPartitions` batch plumbing, built on the
  *    JDK's own codec surfaces (`javax.imageio`: PNG/JPEG/BMP/GIF;
  *    `javax.sound.sampled`: WAV/AIFF/AU PCM — both headless-safe) —
  *    spec-gated with synthesized payloads since the driver testdata
  *    carries no real blobs. Only video lacks a JDK codec and stays
  *    stubbed (swap the kernel for JNI/ffmpeg without touching plumbing).
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
