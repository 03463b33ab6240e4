package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed keys (builder brief: "salting
  * for skew"). A hot key — one symbol carrying most of the tick volume is
  * the canonical case — lands on a single reducer under plain
  * `groupBy(key)`; salting spreads it over `salts` partial groups first,
  * then merges the partials per key. Only decomposable aggregates
  * (sum/count/min/max) qualify; the helpers below cover the engine's
  * volume/count use cases. AQE's skew handling covers joins at runtime;
  * this covers aggregation skew deterministically in the plan. */
object Salting {

  /** Deterministic row salt in [0, salts): hash of the full row — spreads
    * uniformly and needs no RNG (Bench/Verify must be replayable). */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** `groupBy(key).agg(sum(value), count(*))` via a salted two-stage
    * aggregation: stage 1 on (key, salt), stage 2 merges per key. */
  def saltedSumCount(df: DataFrame, key: String, value: String,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("cnt"))

  /** Salted min/max (e.g. per-symbol price envelope over a hot symbol).
    * Mostly for API symmetry: min/max are already skew-tolerant via
    * map-side partial aggregation; the load-bearing case for salting is
    * [[saltedSumCount]]-style hot-key reduction. */
  def saltedMinMax(df: DataFrame, key: String, value: String,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(min(col(value)).as("_pmin"), max(col(value)).as("_pmax"))
      .groupBy(col(key))
      .agg(min(col("_pmin")).as("min"), max(col("_pmax")).as("max"))
}
