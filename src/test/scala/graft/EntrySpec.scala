package graft

/** The driver contract itself: `entry` must return rows on sf0.001, every
  * registry query must analyze against the testdata (schema resolution
  * catches broken plans without paying for execution), names must be
  * unique, and every oracle key must have a query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke check)") {
    Tables.enableNanos(spark)
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("registry: unique names, oracle keys subset of queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length, "duplicate query names")
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k), k))
  }

  test("bench families exactly partition the registry") {
    // the family slices are boundary-derived from build() order — this
    // gate is what makes a silent re-order impossible (VERDICT r6 #7)
    val fams = SparkEntry.registryFamilies
    val tagged = fams.flatMap(_._2.map(_.name))
    assert(tagged.distinct.length === tagged.length,
      "a query landed in two families")
    assert(tagged.toSet === SparkEntry.registry.map(_.name).toSet,
      "families must cover the registry exactly")
    assert(fams.forall(_._2.nonEmpty), "empty family")
    assert(fams.map(_._1) ===
      Seq("core", "dedup", "ann", "text", "pipeline", "multimodal",
        "events"))
  }

  test("every registry query analyzes against sf0.001") {
    Tables.enableNanos(spark)
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sf()).schema
      catch {
        case e: Exception => fail(s"$name failed analysis: ${e.getMessage}")
      }
    }
  }
}
