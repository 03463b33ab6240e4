package org.apache.spark.sql.graftglue

import org.apache.spark.rdd.{RDD, ReliableCheckpointRDD}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Cross-session resume for reliable checkpoints.
  *
  * `Dataset.checkpoint` under `spark.graft.checkpoint.reliable=true`
  * materializes the query's UnsafeRow RDD as checkpoint part-files
  * under the context checkpoint dir. Within one session Spark reloads
  * them transparently when an executor (or its cached partitions) is
  * lost — the preemptible-worker story. The files are just as readable
  * by the NEXT session — the driver-restart story — but the reader
  * (`ReliableCheckpointRDD`) is `private[spark]` and the
  * RDD[InternalRow] → DataFrame hop is `private[sql]`, so the resume
  * path needs this shim (same escape hatch as [[Bridge]]: two
  * delegating calls in a subpackage of `org.apache.spark.sql`, nothing
  * else). */
object CheckpointBridge {

  /** Rebuild a DataFrame from the checkpoint part-files a previous (or
    * the current) session wrote at `path` (a `.../rdd-N` directory).
    * `schema` must be the checkpointed query's schema — checkpoint
    * files store rows, not metadata. */
  def readCheckpoint(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val rdd: RDD[InternalRow] =
      new ReliableCheckpointRDD[InternalRow](spark.sparkContext, path)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
  }
}
