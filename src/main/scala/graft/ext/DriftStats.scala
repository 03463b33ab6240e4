package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{localRelation, parallelized}

/** Distribution-drift monitors over the `documents` table beyond the
  * token-level KL of [[TextOps.sourceDrift]]: the Population Stability
  * Index of each source's document-LENGTH distribution against the
  * corpus — the standard production drift gauge for "did this source's
  * shape change", orthogonal to vocabulary drift (a source can keep
  * its vocabulary and still collapse to snippets).
  *
  * Exactness (the [[TextOps.sourceDrift]] playbook): bin assignment is
  * a fixed pure-integer threshold ladder (no `log2` near power-of-two
  * boundaries), counts are exact, the one libm call (`ln` of the
  * smoothed probability ratio) is floor-quantized to an integer at
  * 1e12, each PSI term's mass difference is cleared to an exact
  * decimal numerator over the common denominator, and the per-source
  * sum runs in decimal — order-independent at any partitioning — with
  * ONE double chain at the end.
  *
  * Scale shape: one (source, bin) aggregation (map-side combined, at
  * most `Bins` rows per source), corpus totals re-aggregated from it,
  * everything downstream broadcast-sized. */
object DriftStats {

  /** Upper-exclusive character-length thresholds of the fixed bin
    * ladder (powers of 4 from 4 to 16384; the final bin is open). The
    * same literals appear in both engines' CASE ladders. */
  val LengthBinEdges: Seq[Long] = Seq(4L, 16L, 64L, 256L, 1024L, 4096L, 16384L)

  /** Total bin count (the open top bin included). */
  val Bins: Int = LengthBinEdges.length + 1

  private def binCase(lenExpr: String): String =
    LengthBinEdges.zipWithIndex
      .map { case (e, i) => s"WHEN $lenExpr < $e THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${LengthBinEdges.length} END")

  /** Per-source PSI of the document-length histogram against the
    * whole corpus, Laplace-smoothed (`+1` per bin, so empty bins stay
    * finite):
    * `PSI_s = Σ_b (p_bs − p_b) · ln(p_bs / p_b)` with
    * `p_bs = (c_bs + 1)/(n_s + Bins)` and
    * `p_b = (c_b + 1)/(n + Bins)`. Non-negative by construction
    * (every term is `(x−y)·ln(x/y) ≥ 0`); the conventional read is
    * < 0.1 stable, 0.1–0.25 moderate, > 0.25 major shift.
    *
    * The term is computed exactly:
    * `p_bs − p_b = ((c_bs+1)·D − (c_b+1)·D_s) / (D_s·D)` with
    * `D_s = n_s + Bins`, `D = n + Bins`, so
    * `PSI = Σ_b [(c_bs+1)·D − (c_b+1)·D_s]·Q_b / (D_s·D·1e12)` with
    * `Q_b = floor(ln(((c_bs+1)·D)/((c_b+1)·D_s))·1e12)` — the decimal
    * sum is exact, the divisor chain is correctly rounded. */
  def lengthPsi(docs: DataFrame): DataFrame = {
    val bins = LengthBinEdges.zipWithIndex.foldRight(
      lit(LengthBinEdges.length): Column) { case ((e, i), acc) =>
        when(length(col("text")) < e, lit(i)).otherwise(acc)
      }
    // checkpointed: the (source, bin) table is bounded (sources ×
    // Bins) but feeds THREE consumers (c_b, n_s, the grid join) —
    // unmaterialized, the corpus scan + bin projection re-ran per
    // reference
    val sb = parallelized(docs)
      .select(col("source"), bins.as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("c_sb"))
      .transform(graft.functions.checkpointed)
    val cb = sb.groupBy("bin").agg(sum(col("c_sb")).as("c_b"))
    val ns = sb.groupBy("source").agg(sum(col("c_sb")).as("n_s"))
    val nt = localRelation(cb.agg(sum(col("c_b")).as("n_corpus")))
    // all Bins*sources cells must exist — the bin axis is the FULL
    // literal 0..Bins-1 ladder (not just bins present somewhere in
    // the corpus): a corpus-wide-empty bin still contributes the
    // smoothed term (p_bs = 1/(n_s+Bins) vs p_b = 1/(n+Bins) is
    // nonzero whenever n_s != n), per the documented Laplace formula
    val binAxis = docs.sparkSession.range(Bins.toLong)
      .select(col("id").cast("int").as("bin"))
    val grid = ns.crossJoin(broadcast(localRelation(
      binAxis.join(cb, Seq("bin"), "left").na.fill(0L, Seq("c_b")))))
      .join(sb, Seq("source", "bin"), "left")
      .na.fill(0L, Seq("c_sb"))
      .crossJoin(broadcast(nt))
    val ds = col("n_s") + Bins
    val d = col("n_corpus") + Bins
    val num1 = (col("c_sb") + 1L).cast("decimal(20,0)") *
      d.cast("decimal(20,0)")
    val num2 = (col("c_b") + 1L).cast("decimal(20,0)") *
      ds.cast("decimal(20,0)")
    val q = floor(log(
      ((col("c_sb") + 1L).cast("double") * d.cast("double")) /
        ((col("c_b") + 1L).cast("double") * ds.cast("double"))) *
      1e12d).cast("long")
    grid
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        max(d).as("_d"),
        sum((num1 - num2) * q.cast("decimal(15,0)")).as("_s"))
      .select(col("source"), col("n_docs"),
        (col("_s").cast("double") /
          ((col("n_docs") + Bins).cast("double") * col("_d").cast("double"))
          / 1e12d).as("psi"))
  }

  /** DuckDB twin of [[lengthPsi]] — identical ladder, smoothing,
    * quantization, and final chain. */
  def lengthPsiSql(): String = {
    val bc = binCase("length(text)")
    s"""WITH sb AS (
       | SELECT source, $bc AS bin, CAST(count(*) AS BIGINT) AS c_sb
       | FROM documents GROUP BY 1, 2),
       |lad AS (SELECT CAST(range AS INTEGER) AS bin FROM range($Bins)),
       |cb0 AS (SELECT bin, CAST(sum(c_sb) AS BIGINT) AS c_b
       | FROM sb GROUP BY bin),
       |cb AS (SELECT lad.bin, COALESCE(cb0.c_b, 0) AS c_b
       | FROM lad LEFT JOIN cb0 USING (bin)),
       |ns AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_s
       | FROM sb GROUP BY source),
       |nt AS (SELECT CAST(sum(c_b) AS BIGINT) AS n_corpus FROM cb),
       |grid AS (
       | SELECT ns.source, cb.bin, ns.n_s, cb.c_b,
       |  COALESCE(sb.c_sb, 0) AS c_sb, nt.n_corpus
       | FROM ns CROSS JOIN cb
       | LEFT JOIN sb ON sb.source = ns.source AND sb.bin = cb.bin
       | CROSS JOIN nt)
       |SELECT source, max(n_s) AS n_docs,
       | (CAST(sum(
       |    (CAST(c_sb + 1 AS HUGEINT) * CAST(n_corpus + $Bins AS HUGEINT)
       |     - CAST(c_b + 1 AS HUGEINT) * CAST(n_s + $Bins AS HUGEINT))
       |    * CAST(floor(ln(
       |       (CAST(c_sb + 1 AS DOUBLE) * CAST(n_corpus + $Bins AS DOUBLE))
       |       / (CAST(c_b + 1 AS DOUBLE) * CAST(n_s + $Bins AS DOUBLE)))
       |      * 1e12) AS HUGEINT)) AS DOUBLE)
       |  / (CAST(max(n_s) + $Bins AS DOUBLE)
       |     * CAST(max(n_corpus) + $Bins AS DOUBLE)) / 1e12) AS psi
       |FROM grid GROUP BY source
       |ORDER BY source""".stripMargin.replace('\n', ' ')
  }
}
