package graft

/** Smoke: every registered query runs on sf0.001 and yields rows with a
  * non-empty schema — catches unexecutable plans before the driver's
  * sf0.01 correctness gate (ADVICE r1, medium). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sfDir)
      assert(df.schema.nonEmpty, "schema must be non-empty")
      assert(df.count() > 0, "query must return rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
