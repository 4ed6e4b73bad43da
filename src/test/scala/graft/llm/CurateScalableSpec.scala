package graft.llm

import graft.SparkSpec

/** The few-huge-sources curation shape must equal the reference window
  * formulation row for row (cum values included) — on every fixture
  * and at budgets that land the boundary in different classes. */
class CurateScalableSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq

  for (sf <- Seq("0.001", "0.01"); budget <- Seq(100L, 800L, 10000L, 1000000L)) {
    test(s"curateScalable == curateWindow at sf$sf, budget=$budget") {
      val scored = LlmText.curationScored(spark, s"/root/testdata/sf$sf").cache()
      try {
        val w = rows(LlmText.curateWindow(scored, budget))
        val sc = rows(LlmText.curateScalable(scored, budget))
        assert(sc == w,
          s"diverged: window=${w.size} rows, scalable=${sc.size} rows; " +
            s"firstDiff=${w.zip(sc).find { case (a, b) => a != b }}")
      } finally { scored.unpersist(); () }
    }
  }
}
