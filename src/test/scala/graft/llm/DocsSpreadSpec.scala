package graft.llm

import graft.SparkSpec

/** Both plan shapes of the gated docs() fixture spread (VERDICT r7
  * item 4): the repartition(doc_id) that fans a single tiny fixture
  * split across the shuffle parallelism must be a CODE decision, not a
  * comment — present on a single-split scan, ABSENT the moment the
  * scan has natural splits (the 100 TB shape), and forcible both ways
  * via spark.graft.docs.spread. */
class DocsSpreadSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  private def withSpread[A](mode: Option[String])(body: => A): A = {
    val key = "spark.graft.docs.spread"
    mode.foreach(spark.conf.set(key, _))
    try body finally spark.conf.unset(key)
  }

  test("auto: the single-split fixture scan gets the spread exchange") {
    // sf0.001 documents.parquet is one split < 4 shuffle partitions
    assert(exchanges(LlmText.docs(spark, dir)) == 1)
  }

  test("auto: a scan with >= shuffle-parallelism splits plans NO exchange") {
    // the at-scale shape: natural splits already cover the parallelism
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try assert(exchanges(LlmText.docs(spark, dir)) == 0)
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("never/always override the split-count check both ways") {
    withSpread(Some("never")) {
      assert(exchanges(LlmText.docs(spark, dir)) == 0)
    }
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try withSpread(Some("always")) {
      assert(exchanges(LlmText.docs(spark, dir)) == 1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
