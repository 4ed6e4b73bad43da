package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-group guards on q93 (ADVICE r7): a singleton group's
  * sample variance and a constant group's correlation are 0/0, which
  * Spark and DuckDB RENDER differently (NaN/Inf/NULL) — both sides
  * now gate those cells to NULL with identical CASE predicates. The
  * fixture's event_type groups are all large and non-degenerate, so
  * this spec drives the query over a synthetic events table that has
  * exactly the degenerate shapes. */
class StatsAggSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_stats").toString
    Seq(
      // singleton group: n = 1 -> var/stddev/corr all NULL
      ("solo", 3.25, 7L),
      // constant-value group: var = 0 -> corr NULL, var/stddev = 0
      ("flat", 2.00, 1L), ("flat", 2.00, 2L), ("flat", 2.00, 3L),
      // constant-user group: syy degenerate -> corr NULL, var real
      ("cuser", 1.00, 5L), ("cuser", 4.00, 5L),
      // healthy group: everything defined
      ("ok", 1.00, 1L), ("ok", 2.00, 2L), ("ok", 4.00, 3L))
      .toDF("event_type", "value", "user_id")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.parquet(s"$d/events.parquet")
    d
  }

  private lazy val rows = graft.SparkEntry.queries("q93_stats_agg")(spark, dir)
    .collect().map(r => r.getString(0) -> r).toMap

  test("singleton group: variance, stddev and correlation are NULL, mean is real") {
    val r = rows("solo")
    assert(!r.isNullAt(2) && r.getDouble(2) == 3.25) // mean_v
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("zero-variance group: var/stddev are 0, correlation is NULL") {
    val r = rows("flat")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.isNullAt(5))
  }

  test("constant-user group: variance real, correlation NULL") {
    val r = rows("cuser")
    assert(r.getDouble(3) > 0.0)
    assert(r.isNullAt(5))
  }

  test("healthy group: every statistic defined and finite") {
    val r = rows("ok")
    for (i <- 2 to 5) {
      assert(!r.isNullAt(i), s"col $i null")
      assert(java.lang.Double.isFinite(r.getDouble(i)), s"col $i not finite")
    }
  }
}
