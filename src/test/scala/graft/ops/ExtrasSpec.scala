package graft.ops

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

  test("q85: SCD2 intervals tile each user's history — contiguous, non-overlapping, type-alternating") {
    val rows = graft.SparkEntry.queries("q85_scd2_intervals")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("valid_from_us"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"user $u: interval gap/overlap at ${b.getAs[Long]("valid_from_us")}")
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u: adjacent runs share a type — run collapse lost")
        case _ => ()
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")),
        s"user $u: open-ended current run must have NULL valid_to")
    }
  }

  test("q60: approx_count_distinct within 5% of exact per group") {
    val rows = graft.SparkEntry.queries("q60_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"${r.getString(0)}: HLL estimate drifted past 5% of exact=${r.getAs[Long]("exact_cust")}")
    }
  }
}
