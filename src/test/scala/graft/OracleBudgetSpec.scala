package graft

import java.nio.file.Files

/** Oracle-latency budget (VERDICT r12 #4): every DuckDB twin must run
  * inside a per-query wall ceiling, so an oracle-SIDE pathology — like
  * the round-12 `markovAttributionSql` chained-CTE twin that DuckDB 1.0
  * inlined into a ~100× re-evaluation (>300 s at sf0.01, which emptied
  * the round's entire correctness artifact) — fails THIS suite instead
  * of zeroing a round.
  *
  * Two passes: the full twin surface at sf0.001 (catches errors and
  * egregious blowups cheaply), and the chained/recursive-CTE subset —
  * the inlining-blowup class, whose cost is multiplicative in data
  * scale — again at sf0.01 under a tighter relative ceiling.
  * python3+duckdb is ASSERTED present (r13 verdict #7: an `assume`
  * would let a broken duckdb install silently cancel the gate);
  * a box genuinely without duckdb can opt out explicitly with
  * `GRAFT_ALLOW_NO_DUCKDB=1`, which downgrades the assert to a
  * visible cancellation.
  */
class OracleBudgetSpec extends SparkSpec {

  private lazy val duckdbAvailable: Boolean = {
    import scala.sys.process._
    try Process(Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Throwable => false }
  }

  /** Loud by default: the budget gate must not silently cancel. */
  private def requireDuckdb(): Unit =
    if (sys.env.get("GRAFT_ALLOW_NO_DUCKDB").contains("1"))
      assume(duckdbAvailable, "python3+duckdb opted out explicitly")
    else assert(duckdbAvailable,
      "python3+duckdb must exist for the oracle budget gate (set " +
        "GRAFT_ALLOW_NO_DUCKDB=1 to opt out on a box without it)")

  /** Build oracle_sql.json parameterized against `sfDir` into a temp
    * dir; returns its path. Registry construction needs the session. */
  private def oracleJson(sfDir: String): String = {
    Tables.enableNanos(spark)
    Tables.oracleSfDir.set(sfDir)
    val dir = Files.createTempDirectory("oracle_budget").toFile
    dir.deleteOnExit()
    Verify.writeOracleJson(dir.getAbsolutePath)
    s"${dir.getAbsolutePath}/oracle_sql.json"
  }

  private def runBudget(sfDir: String, json: String, ceilingSec: Double,
      only: Seq[String] = Nil): (Int, String) = {
    import scala.sys.process._
    val out = new StringBuilder
    val cmd = Seq("python3", "tools/oracle_budget.py", sfDir, json,
      ceilingSec.toString) ++ only
    val rc = Process(cmd, new java.io.File(".")).!(
      ProcessLogger(l => out.append(l).append('\n')))
    (rc, out.toString)
  }

  /** The chained/recursive twin class: a recursive CTE, or a long CTE
    * chain (each step re-referencing shared CTEs — the shape DuckDB's
    * inliner turns multiplicative). */
  private def chained(sql: String): Boolean =
    sql.toUpperCase.contains("RECURSIVE") ||
      "(?i)(^|[(,\\s])\\w+\\s+AS\\s+(MATERIALIZED\\s+)?\\(".r
        .findAllIn(sql).length >= 8

  /** The catalog twins read persisted artifacts — replaying them
    * without the serving queries having run first (exactly what this
    * suite does) needs the train-or-load pre-flight. */
  private def ensureCatalog(sfDir: String): Unit =
    graft.ext.IndexCatalog.ensure(Tables.table(spark, sfDir, "embeddings"))

  test("every oracle twin runs inside a 10s ceiling at sf0.001") {
    requireDuckdb()
    ensureCatalog(sf())
    val json = oracleJson(sf())
    val (rc, out) = runBudget(sf(), json, 10.0)
    assert(rc === 0, s"over-budget/erroring twins at sf0.001:\n$out")
  }

  test("chained/recursive twins run inside a 20s ceiling at sf0.01") {
    requireDuckdb()
    // The subset's SQL is data-independent for the RETRAINING twins
    // (events/ticks params are literals), so the sf0.001-built json
    // mostly transfers to sf0.01; the catalog twins bake sf0.001
    // artifact paths, which only shifts their (tiny) read cost — the
    // budget measures wall time, not values.
    ensureCatalog(sf())
    val json = oracleJson(sf())
    val subset = SparkEntry.oracleSql.collect {
      case (name, sql) if chained(sql) => name
    }.toSeq.sorted
    // the class must actually cover the r12 killer and its siblings
    assert(subset.contains("q_markov_attribution"), subset.mkString(","))
    assert(subset.contains("q_type_pagerank"), subset.mkString(","))
    assert(subset.contains("q_vpin"), subset.mkString(","))
    val (rc, out) = runBudget(sf("sf0.01"), json, 20.0, subset)
    assert(rc === 0, s"over-budget/erroring chained twins at sf0.01:\n$out")
  }
}
