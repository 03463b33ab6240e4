package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One correctness-gate entry: a Spark query plus (when SQL-expressible)
    * its DuckDB oracle twin. `oracle == None` ⇒ the driver records a weaker
    * rows-only check (used for sequential-fold operators whose reset
    * semantics SQL cannot express). */
  case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])
}
