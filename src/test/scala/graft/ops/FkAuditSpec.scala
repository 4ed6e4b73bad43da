package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q118's fixture audits to zero orphans on every edge (TPC-H-shaped
  * data is referentially intact), so the oracle alone cannot prove the
  * DETECTION side. This spec drives the same operator over a synthetic
  * star with injected violations: true orphans, a duplicated parent
  * key (which must NOT amplify child counts — the distinct guard), and
  * a clean edge as the control. */
class FkAuditSpec extends SparkSpec {

  import spark.implicits._

  private lazy val result = {
    val child = Seq(1L, 1L, 2L, 3L, 99L, 98L).toDF("k") // 99, 98 orphaned
    // parent key 1 duplicated: without the distinct guard the two
    // child rows with k=1 would double
    val dirtyParent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val cleanChild = Seq(10L, 11L).toDF("k")
    val cleanParent = Seq(10L, 11L, 12L).toDF("pk")
    Audit.audit(Seq(
      ("dirty", child, dirtyParent),
      ("clean", cleanChild, cleanParent)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("orphans are counted and the duplicated parent key does not amplify") {
    assert(result("dirty") == (6L, 2L))
  }

  test("a referentially intact edge audits to zero") {
    assert(result("clean") == (2L, 0L))
  }
}
