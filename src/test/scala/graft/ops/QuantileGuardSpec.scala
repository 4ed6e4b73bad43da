package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial gate for q150's group-cardinality guard (VERDICT r14
  * item 5): the exact-selection driver cell walk is bounded by
  * construction ONLY for enumerable group keys. Pointed at a
  * high-cardinality key it must fail LOUDLY with the named fallback
  * (the q104 sketch path), never walk |groups|·4096 cells toward a
  * driver OOM — the `Layout.scaled` 2^53 discipline. */
class QuantileGuardSpec extends SparkSpec {

  private val q150 = graft.SparkEntry.all.find(_.name == "q150_exact_quantile_select").get

  private def stage(nGroups: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q150guard").toString
    (0 until nGroups).flatMap(g => (0 until 3).map(i =>
        (s"g$g", (100 + 7 * g + i).toDouble)))
      .toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("a high-cardinality group key fails loudly with the sketch-path pointer") {
    val e = intercept[IllegalArgumentException] {
      q150.run(spark, stage(1025)).collect()
    }
    assert(e.getMessage.contains("q104"), e.getMessage)
    assert(e.getMessage.contains("1024"), e.getMessage)
  }

  test("an enumerable key (at the budget boundary minus one) still selects exactly") {
    // small per-group data so the exact answer is enumerable in-spec:
    // 3 values per group -> median = 2nd, p90 = ceil(0.9*3) = 3rd,
    // p99 = ceil(0.99*3) = 3rd (cents-scaled by the query)
    val rows = q150.run(spark, stage(40)).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val g = r.getString(0).drop(1).toInt
      assert(r.getLong(1) == 3L, s"n for g$g")
      assert(r.getLong(2) == (100 + 7 * g + 1) * 100L, s"median for g$g")
      assert(r.getLong(3) == (100 + 7 * g + 2) * 100L, s"p90 for g$g")
      assert(r.getLong(4) == (100 + 7 * g + 2) * 100L, s"p99 for g$g")
    }
  }
}
