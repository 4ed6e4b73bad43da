package graft

import graft.core.Q
import org.apache.spark.sql.functions._

/** Failure honesty + median protocol of the benchmark harness
  * (VERDICT r7 items 1/2/8): a query that throws must surface as an
  * error marker in the metric line — round 7's Bench swallowed
  * exceptions and would have reported a crashed query as a fast
  * success. */
class BenchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a poisoned query is reported as an error, never a success") {
    val poisoned = Q.noOracle("q999_poisoned") { (s, _) =>
      import s.implicits._
      Seq(1).toDF("x").select((col("x") / 0).cast("int").as("boom"))
        .filter(expr("assert_true(boom > 0) is null"))
    }
    val (dt, err) = Bench.timedRun(spark, dir, poisoned)
    assert(err.isDefined, "exception was swallowed")
    assert(dt >= 0)
  }

  test("a healthy query times cleanly") {
    val ok = Q.noOracle("q998_ok") { (s, d) => graft.core.T.df(s, d, "region") }
    val (dt, err) = Bench.timedRun(spark, dir, ok)
    assert(err.isEmpty, s"unexpected error: $err")
    assert(dt > 0)
  }

  test("metric line renders errors as -1 plus an errors map") {
    val line = Bench.metricLine("/sf", runs = 3,
      times = Seq(
        "q1_agg" -> Seq(1.0, 2.0, 3.0),
        "q2_filter" -> Seq.empty,
        "q3_join" -> Seq(0.5, 0.5)),
      errors = Map("q2_filter" -> "SparkException", "q3_join" -> "OOM"))
    assert(line.contains(""""q1":2.000"""), line) // median of 3
    assert(line.contains(""""q2":-1.000"""), line)
    assert(line.contains(""""q3":-1.000"""), line) // errored in one sweep -> error
    assert(line.contains(""""error_count":2"""), line)
    assert(line.contains(""""q2":"SparkException""""), line)
    assert(line.contains(""""runs":3"""), line)
    assert(line.contains(""""value":2.000"""), line) // errored queries excluded from total
  }

  test("an errored query's surviving sweep timings never surface in spread") {
    // ADVICE r8: a query that errored in one sweep renders -1 in
    // `queries` — its other sweeps' timings appearing in `spread`
    // would point regression triage at a query the line already
    // declares broken
    val line = Bench.metricLine("/sf", runs = 3,
      times = Seq(
        "q1_agg" -> Seq(1.0, 1.1, 1.2),
        "q2_wild" -> Seq(0.5, 9.5)), // widest spread, but errored
      errors = Map("q2_wild" -> "OOM"))
    assert(!line.contains(""""spread":{"q2""""), line)
    assert(line.contains(""""spread":{"q1""""), line)
  }

  test("metric line carries spread for multi-run sweeps and stays compact") {
    val times = (1 to 95).map(i => s"q${i}_x" -> Seq(0.5, 0.6, 1.4))
    val line = Bench.metricLine("/sf", runs = 3, times, Map.empty)
    assert(line.contains(""""spread":{"""), line)
    assert(line.contains(""""error_count":0"""), line)
    // the consumer keeps only the output tail (~2000 chars): the whole
    // headline must survive at full 95-query scale
    assert(line.length < 1900, s"metric line too long: ${line.length}")
    // spread is capped at the 5 widest queries
    assert("\\[".r.findAllIn(line).size == 5, line)
  }

  test("median") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0)) == 2.5)
    assert(Bench.median(Seq.empty) == -1.0)
  }
}
