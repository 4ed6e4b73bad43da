package graft.registry

import graft.SparkSpec

class TypedSpec extends SparkSpec {

  test("typed Dataset[TrialCore] surface round-trips the merged fields") {
    val ds = Typed.trials(spark, SyntheticCorpus.ensure())
    val byId = ds.collect().map(t => t.eudract_id -> t).toMap
    assert(byId("2004-000001-11").overall_status.contains("not ongoing"))
    assert(byId("2004-000001-11").phase2.contains(1))
    assert(byId("2005-000002-22").phase3.contains(1))
    assert(byId("2006-000003-33").completion_date.isEmpty)
  }

  test("catalog views serve spark.sql like the reference's SQLite (S7)") {
    Typed.createViews(spark, SyntheticCorpus.ensure())
    val n = spark.sql(
      """SELECT count(*) FROM registry_trial t
        |JOIN registry_location l ON t.eudract_id = l.eudract_id
        |WHERE l.location = 'Germany' AND t.overall_status <> 'completed'""".stripMargin)
      .head().getLong(0)
    assert(n == 1)
  }
}
