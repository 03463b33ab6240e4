package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{discretize, fillDigits, tsSeconds, undiscretize}
import graft.plans.GraftExtensions

/** The SparkSessionExtensions SQL surface must agree with the Column API
  * (same Catalyst trees, different front door). Extensions bind at session
  * creation, so this suite builds its own session on the shared context
  * and restores the default afterwards. */
class ExtensionsSpec extends SparkSpec {

  test("SQL functions registered via GraftExtensions match the Column API") {
    val base = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      val df = Seq(
        (0L, 0.0703629, 2),
        (1505177459L, 123.456, 4),
        (1505177459658L, 9.99, 0),
        (150517745L, 0.01, 8)).toDF("ts", "price", "d")
      df.createOrReplaceTempView("t")
      val viaSql = s.sql(
        """SELECT fill_digits(ts) AS fd, ts_seconds(ts) AS tsec,
          | discretize(price, d) AS lvl,
          | undiscretize(discretize(price, d), d) AS undisc
          |FROM t""".stripMargin).collect()
      val viaCol = df.select(
        fillDigits($"ts").as("fd"), tsSeconds($"ts").as("tsec"),
        discretize($"price", 4).as("lvl4")).collect()
      viaSql.zip(viaCol).zip(df.collect()).foreach {
        case ((sqlRow, colRow), in) =>
          assert(sqlRow.getAs[Long]("fd") === colRow.getAs[Long]("fd"))
          assert(sqlRow.getAs[Long]("tsec") === colRow.getAs[Long]("tsec"))
          val d = in.getAs[Int]("d")
          val p = in.getAs[Double]("price")
          assert(sqlRow.getAs[Long]("lvl") ===
            math.floor(p * math.pow(10, d)).toLong)
          assert(math.abs(sqlRow.getAs[Double]("undisc") -
            math.floor(p * math.pow(10, d)) / math.pow(10, d)) < 1e-12)
      }
      // reference goldens: second- and ms-epochs normalize to 13 digits
      val fd = s.sql("SELECT fill_digits(1505177459) v").head().getLong(0)
      assert(fd === 1505177459000L)
      assert(s.sql("SELECT fill_digits(0) v").head().getLong(0) === 0L)
      // text-pipeline scalars: SQL == Column API on the same engine
      assert(s.sql("SELECT token_count(' a b  c ') v").head().getInt(0) === 3)
      assert(s.sql("SELECT bpe_token_count('ab 12, x') v")
        .head().getInt(0) === 5) // ab | 1 | 2 | , | x
      val lnqSql = s.sql("SELECT ln_q(2.5) v").head().getDouble(0)
      val lnqCol = s.range(1)
        .select(graft.ext.TextOps.lnQ(
          org.apache.spark.sql.functions.lit(2.5)).as("v"))
        .head().getDouble(0)
      assert(lnqSql === lnqCol)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
