package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-group guards on q115 (q93's discipline applied to the
  * regression): zero x-variance (all events on one day) makes
  * slope/intercept/r² 0/0, zero y-variance makes only r² degenerate,
  * and a singleton group is both. Spark and DuckDB render 0/0
  * differently (NaN/Inf/NULL), so both sides gate with identical CASE
  * predicates; the fixture's event_type groups span many days and
  * values, so this spec drives the query over a synthetic events table
  * with exactly the degenerate shapes. */
class OlsTrendSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ols").toString
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    Seq(
      // singleton group: n = 1 -> everything NULL
      ("solo", 3.25, ts(5)),
      // one-day group: x-variance 0 -> everything NULL even with n = 3
      ("oneday", 1.00, ts(7)), ("oneday", 2.00, ts(7)), ("oneday", 9.00, ts(7)),
      // constant-value group: y-variance 0 -> slope/intercept real
      // (slope exactly 0), r² NULL
      ("flat", 2.00, ts(1)), ("flat", 2.00, ts(2)), ("flat", 2.00, ts(3)),
      // healthy group: y = day + 1 exactly -> slope 1, r² 1
      ("ok", 1.00, ts(1)) , ("ok", 2.00, ts(2)), ("ok", 3.00, ts(3)))
      .toDF("event_type", "value", "ts")
      .withColumn("user_id", lit(1L))
      .write.parquet(s"$d/events.parquet")
    d
  }

  private lazy val rows = graft.SparkEntry.queries("q115_ols_trend")(spark, dir)
    .collect().map(r => r.getString(0) -> r).toMap

  test("singleton and one-day groups: slope, intercept and r² all NULL") {
    for (g <- Seq("solo", "oneday"); i <- 2 to 4)
      assert(rows(g).isNullAt(i), s"$g col $i not null")
  }

  test("constant-value group: slope exactly 0, intercept the constant, r² NULL") {
    val r = rows("flat")
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 2.0)
    assert(r.isNullAt(4))
  }

  test("exact-linear group: slope 1, r² 1 to the last bit") {
    val r = rows("ok")
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(4) == 1.0)
  }
}
