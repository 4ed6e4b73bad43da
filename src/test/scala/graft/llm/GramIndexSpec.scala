package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q233 incremental substring-dedup index artifact (round 19, the
  * [[LlmText.writeBandIndex]] analogue): a delta gram probe against
  * the PERSISTED hash-bucketed gram table must not shuffle the index
  * side — shuffle ∝ delta gram hashes, index scan bucket-aligned. */
class GramIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("delta gram probe of the bucketed gram index: index side scans bucket-aligned, no exchange") {
    LlmText.writeGramIndex(spark, dir, "gram_index_test", buckets = 4)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle path: broadcast would mask the bucketing win
      // on a fixture-sized delta hash set
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idx = spark.table("gram_index_test")
      // q233's deterministic delta split — known to share 589
      // cross-split gram texts with the index side at sf0.001
      val delta = LlmText.gramHashes(
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 10 === 0), LlmText.SpanK)
      val probe = delta.select(col("gh")).distinct().join(idx, Seq("gh"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucket-aligned:\n$plan")
      // exactly the delta-side exchange may appear; the index side must
      // join straight off its buckets
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"index side shuffles for the probe ($exchanges):\n$plan")
      assert(probe.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS gram_index_test")
      LlmText.release(spark)
    }
  }
}
