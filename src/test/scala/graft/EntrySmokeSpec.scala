package graft

/** Smoke: every catalog query runs end-to-end on the sf0.001 fixtures and
  * the flagship entry returns rows — mirrors the driver's t1 gate. */
class EntrySmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
