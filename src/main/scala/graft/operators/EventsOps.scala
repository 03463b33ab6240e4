package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-event classification (`postprocessing/event.rs:28-72`).
  *
  * The reference walks updates in `(ts,seq)` order keeping one global
  * `price -> last size` map (BOTH sides conflated, and — quirk — trades also
  * overwrite the map entry at their price). Classification of a non-trade:
  * prev defaults 0; `size == 0 || size <= prev` ⇒ cancel; `size > prev` ⇒
  * create. Trades classify as trade.
  *
  * Because "previous size at the same raw price" is exactly
  * `lag(size) over (partition by symbol, price order by ts, seq)`, this is a
  * pure window function — no fold needed (SURVEY §2.5 B4).
  */
object EventsOps {

  def classify(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("price"))
      .orderBy(col("ts"), col("seq"))
    updates
      .withColumn("prev", coalesce(lag(col("size"), 1).over(w), lit(0.0)))
      .withColumn("event_class",
        when(col("is_trade"), "trade")
          .when(col("size") === 0.0 || col("size") <= col("prev"), "cancel")
          .otherwise("create"))
      .drop("prev")
  }

  val classifySql: String =
    """SELECT symbol, ts, seq, is_trade, is_bid, price, size,
      | CASE WHEN is_trade THEN 'trade'
      |      WHEN size = 0.0 OR size <= prev THEN 'cancel'
      |      ELSE 'create' END AS event_class
      |FROM (SELECT *, coalesce(lag(size) OVER (
      |   PARTITION BY symbol, price ORDER BY ts, seq), 0.0) AS prev
      |  FROM updates)""".stripMargin.replace('\n', ' ')

  /** `filter_size` (`event.rs:76-92`): events of one class with
    * `from <= size <= to`. */
  def filterSize(updates: DataFrame, eventClass: String, from: Double,
      to: Double): DataFrame =
    classify(updates)
      .where(col("event_class") === eventClass &&
        col("size").between(from, to))
}
