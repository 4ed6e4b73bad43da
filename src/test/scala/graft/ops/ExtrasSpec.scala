package graft.ops

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

  test("q60: approx_count_distinct within 5% of exact per group") {
    val rows = graft.SparkEntry.queries("q60_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_cust").toDouble
      val exact = r.getAs[Long]("exact_cust").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
