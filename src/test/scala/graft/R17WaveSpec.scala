package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Round-17 optimization gates: the twoNN top-2 aggregation
  * (VERDICT r16 #1 — LongMin2 + native integer distance instead of a
  * rank window over the candidate stream), the shared dedup signature
  * checkpoint (VERDICT r16 #4/#5), and the bounded-window audit of
  * the events/pipeline global windows (VERDICT r16 #7). */
class R17WaveSpec extends SparkSpec {

  private def min2Col = {
    import org.apache.spark.sql.graftglue.Bridge
    Bridge.column(graft.plans.LongMin2(
      Bridge.expression(col("v"))).toAggregateExpression())
  }

  test("LongMin2 == window-rank top-2 on adversarial groups " +
      "(duplicated minima, singleton groups, shuffled order)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // groups with 1..7 members, values with deliberate collisions
    val rows = (0 until 200).flatMap { g =>
      val n = 1 + rnd.nextInt(7)
      (0 until n).map(i => (g.toLong, {
        val v = rnd.nextInt(5).toLong // heavy ties
        if (rnd.nextBoolean()) v else v + rnd.nextInt(1000000).toLong
      }))
    } :+ ((9999L, Long.MaxValue - 1)) // near-sentinel value
    val df = spark.createDataset(rnd.shuffle(rows)).toDF("g", "v")
    val got = df.groupBy("g").agg(min2Col.as("m"))
      .select(col("g"), col("m.d1"), col("m.d2n"))
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)): (Any, Any))).toMap
    val want: Map[Long, (Any, Any)] =
      rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> ((sorted.head,
          if (sorted.length > 1) sorted(1) else null): (Any, Any))
      }
    assert(got.keySet === want.keySet)
    want.foreach { case (g, expect) =>
      assert(got(g) === expect, s"group $g")
    }
  }

  test("ArraySqDistLong == the interpreted zip_with/aggregate fold " +
      "on random long vectors") {
    import spark.implicits._
    import org.apache.spark.sql.graftglue.Bridge
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      val d = 1 + rnd.nextInt(64)
      (i.toLong, Seq.fill(d)(rnd.nextInt(200000001).toLong - 100000000L),
        Seq.fill(d)(rnd.nextInt(200000001).toLong - 100000000L))
    }
    val df = spark.createDataset(rows).toDF("i", "a", "b")
    val native = Bridge.column(graft.plans.ArraySqDistLong(
      Bridge.expression(col("a")), Bridge.expression(col("b"))))
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val diff = df.select(col("i"), native.as("n"), hof.as("h"))
      .where(col("n") =!= col("h")).count()
    assert(diff === 0L)
  }

  test("twoNN plan has no rank Window: top-2 selection is a hash " +
      "aggregation over the candidate stream") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = Similarity.twoNN(
      Tables.table(spark, sf("sf0.001"), "embeddings"))
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[WindowExec] = p.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
    }.flatten
    assert(windows(df.queryExecution.executedPlan).isEmpty,
      "twoNN still ranks candidates through a window")
  }

  test("editDistNearDupFrom over a prebuilt signature table == " +
      "editDistNearDup end-to-end") {
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
    val perDoc = Dedup.minhashPerDoc(docs, 2, 16)
      .transform(graft.functions.checkpointed)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
    assert(rows(Dedup.editDistNearDupFrom(perDoc, docs))
      === rows(Dedup.editDistNearDup(docs)))
  }

  test("events/pipeline global windows only ever see bounded " +
      "aggregates — no data-scale single-partition window") {
    // VERDICT r16 #7: a WindowExec with an empty partitionSpec moves
    // its whole input through ONE task; that is only acceptable when
    // the input is an already-aggregated bounded-key table (language /
    // event-type cardinality), never raw data-scale rows. Audit every
    // events-family gate plus the bounded-window pipeline gates.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val names = SparkEntry.registryFamilies.toMap
      .apply("events").map(_.name) ++
      Seq("q_unimax", "q_unimax_apply", "q_mixture_temp",
        "q_len_percentiles", "q_dwell_percentiles")
    def globalWindows(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case a: AdaptiveSparkPlanExec => globalWindows(a.executedPlan)
    }.flatten
    def boundedBelow(p: SparkPlan): Boolean = {
      // an aggregate at or below the window's shuffle boundary proves
      // the single-partition input is a grouped (bounded-key) table
      def hasAgg(q: SparkPlan): Boolean = q.collectFirst {
        case _: BaseAggregateExec => true }.nonEmpty
      hasAgg(p) || p.collectFirst {
        case s: ShuffleExchangeLike if hasAgg(s.child) => true
      }.nonEmpty
    }
    val qs = SparkEntry.queries
    names.distinct.foreach { n =>
      val df = qs(n)(spark, sf("sf0.001"))
      globalWindows(df.queryExecution.executedPlan).foreach { w =>
        assert(boundedBelow(w.child),
          s"$n: global window over a non-aggregated input: " +
            s"order=${w.orderSpec.mkString(",")}")
      }
    }
  }
}
