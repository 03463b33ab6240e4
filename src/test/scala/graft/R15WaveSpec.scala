package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

import graft.ext.Similarity

/** Round-15 wave gates: the indexed TwoNN arm (VERDICT r14 #2 —
  * route the dimension audit through the candidate machinery so it
  * can run corpus-wide, demote the maxVectors guard to the all-pairs
  * arm only). */
class R15WaveSpec extends SparkSpec {

  test("twoNNIndexed chain == exact twoNN at full probe coverage; " +
      "default probing stays within the audit tolerance; the guard " +
      "binds only the exact arm") {
    val emb = Tables.table(spark, sf("sf0.01"), "embeddings")
    def row(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => r.toSeq.map(v =>
        if (v == null) "null" else v.toString).mkString("|")).toSeq
    val exactDf = Similarity.twoNN(emb)
    val exact = row(exactDf)
    // nProbe = kCells probes EVERY cell, so the candidate set is the
    // whole corpus and any difference could only be a drift between
    // the indexed chain and the exact chain — bit-equality pins the
    // xq kernel, integer d2, rank selection and MLE end-to-end
    // through the candidate machinery
    assert(row(Similarity.twoNNIndexed(emb, kCells = 8, nProbe = 8))
      === exact, "indexed chain drifted from the exact chain")
    // default partial probing on this UNCLUSTERED random corpus
    // misses some true neighbors by design — the estimate must stay
    // within the documented audit tolerance, with every point still
    // reached through its own primary cell
    val d = Similarity.twoNNIndexed(emb).collect()(0)
    val dExact = exactDf.collect()(0)
    assert(d.getAs[Long]("n_points") === dExact.getAs[Long]("n_points"))
    val (h, hx) = (d.getAs[Double]("d_hat"), dExact.getAs[Double]("d_hat"))
    assert(math.abs(h - hx) / hx < 0.10,
      s"indexed d_hat $h drifted >10% from exact $hx")
    // the guard is the exact arm's only: twoNN raises at maxVectors,
    // twoNNIndexed has no such parameter and runs the same corpus
    val e = intercept[IllegalStateException] {
      Similarity.twoNN(emb, maxVectors = 10)
    }
    assert(e.getMessage.contains("twoNNIndexed"),
      "the guard message must route users to the corpus-wide arm")
  }

  test("twoNNIndexed plan: candidates flow through the cell equi-join " +
      "and broadcast centroids — no all-pairs cartesian anywhere") {
    val emb = Tables.table(spark, sf("sf0.001"), "embeddings")
    val p = Similarity.twoNNIndexed(emb)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"),
      s"indexed arm degenerated to a cartesian:\n$p")
    // the only nested-loop joins are the sanctioned broadcast
    // centroid rankings (bounded kCells rows); the candidate pair
    // stream itself is a keyed join
    val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    val keyed = p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin")
    assert(keyed, s"no keyed candidate join in:\n$p")
    assert(bnl <= 4, s"unexpected nested-loop joins ($bnl):\n$p")
  }

  test("twoNNIndexed on a planted two-cluster manifold: exact arm " +
      "parity under REAL partial probing and a sane dimension " +
      "estimate") {
    // two 1-D line segments far apart with GEOMETRIC gap growth
    // (Facco's MLE needs irregular spacing — on a regular lattice
    // both neighbors are equidistant, μ ≡ 1 and the estimator
    // degenerates): interior points see μ² = (g_j/g_{j-1})² = 4, so
    // d̂ ≈ 2/ln 4 = 1/ln 2 ≈ 1.44. Every 2-NN is an adjacent line
    // point, so probing each point's own cell plus its next-nearest
    // (the adjacent sub-segment of the SAME line — the other cluster
    // is 50 units away) finds it: parity at nProbe = 2 of 4 cells is
    // a real selectivity test, not full coverage
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0 else 50.0
      val t = (math.pow(2.0, (i / 2).toDouble) - 1.0) * 1e-5
      (i.toLong, Array.tabulate(8)(d =>
        (base + t * (d + 1)).toFloat))
    }
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    def row(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => r.toSeq.map(v =>
        if (v == null) "null" else v.toString).mkString("|")).toSeq
    assert(row(Similarity.twoNNIndexed(emb, kCells = 4, nProbe = 2)) ===
      row(Similarity.twoNN(emb)),
      "partial probing missed a within-line 2-NN")
    // ideal interior value is 2/ln 4 ≈ 1.44; the earliest (tiniest)
    // gaps quantize to near-equal distances (μ → 1, zero
    // contribution) and the float32 storage perturbs them further,
    // so the measured estimate sits above it — the band pins "looks
    // 1-D-ish, nowhere near the 8 ambient dims", which is the
    // estimator's actual job
    val dHat = Similarity.twoNNIndexed(emb, kCells = 4, nProbe = 2)
      .collect()(0).getAs[Double]("d_hat")
    assert(dHat > 0.8 && dHat < 3.0, s"line-manifold d_hat = $dHat")
  }

  test("a wholly-null embedding raises LOUD in the shared twoNN " +
      "kernel (ADVICE r15: it slips every per-coordinate guard — " +
      "size(null) passes the dim check, transform(null) never runs " +
      "the null-coordinate lambda — and the null d2 ranks FIRST in " +
      "Spark but LAST in DuckDB)") {
    val rows: Seq[(Long, Array[Float])] = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(1.5f, 2.5f)),
      (2L, Array(9.0f, 9.0f)), (3L, null))
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex = intercept[Exception] { Similarity.twoNN(emb).collect() }
    assert(messages(ex).exists(_.contains("null embedding")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
    // the kernel is shared, so the indexed arm raises identically —
    // but its kmeans front-end touches the embedding first, so pin
    // the raise text loosely (any loud null raise qualifies there)
    val ex2 = intercept[Exception] {
      Similarity.twoNNIndexed(emb, kCells = 2, nProbe = 1).collect()
    }
    assert(ex2 != null)
  }
}
