package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat opaque binary payloads with typed
  * metadata, run per-partition batch "decode / feature-extract" kernels.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (`stubDecode`) — what is real and
  * tested is the Spark-side plumbing: binary column + schema, partition
  * batching via `mapPartitions` (the Scala analogue of `mapInPandas` batch
  * UDFs), and the output schema contract. Swap `stubDecode` for a real
  * codec (JNI/ONNX/ffmpeg) without touching the plumbing.
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
