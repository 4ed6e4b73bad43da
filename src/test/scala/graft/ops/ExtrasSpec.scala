package graft.ops

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

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
