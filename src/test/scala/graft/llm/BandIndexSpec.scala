package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q89 incremental-dedup index artifact: a delta probe against the
  * PERSISTED bucketed band table must not shuffle the index side —
  * that asymmetry (shuffle ∝ delta, scan bucket-aligned) is the whole
  * point of materializing the index. */
class BandIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("delta probe of the bucketed band index: index side scans bucket-aligned, no exchange") {
    LlmText.writeBandIndex(spark, dir, "band_index_test", buckets = 4)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle path: broadcast would mask the bucketing win
      // on a fixture-sized delta
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idx = spark.table("band_index_test")
      // q89's deterministic delta split — known to band-collide with
      // the index side at sf0.001 (limit(N) would sample arbitrary
      // rows and could miss every collision)
      val delta = idx.filter(col("index_id") % 10 === 0)
        .select(col("index_id").as("delta_id"), col("band"), col("bkey"))
      val probe = delta.join(idx, Seq("bkey"))
        .filter(col("delta_id") =!= col("index_id"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucket-aligned:\n$plan")
      // exactly the delta-side exchange may appear; the index side must
      // join straight off its buckets
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"index side shuffles for the probe ($exchanges):\n$plan")
      assert(probe.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS band_index_test")
      LlmText.release(spark)
    }
  }
}
