package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming near-dup ingest gate must equal the batch dominance
  * dedup — accepted = corpus minus every doc_b of the q41 pair list —
  * for ANY chunking of the stream, and replaying a batch (including
  * after a crash that already wrote the batch's seen-store state) must
  * not change the outcome. */
class StreamDedupGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Batch reference: every doc except the dominated (doc_b) side of
    * the corpus-wide verified near-dup pairs. */
  private def reference(): Set[Long] = {
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dominated = graft.llm.LlmText.lshPairs(spark, dir)
      .select("doc_b").distinct().collect().map(_.getLong(0)).toSet
    graft.llm.LlmText.release(spark)
    all -- dominated
  }

  private def accepted(stateDir: String): Set[Long] =
    spark.read.parquet(s"$stateDir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  /** Stage the documents as `chunks` doc_id-ordered parquet files. */
  private def stage(chunks: Int): String = {
    val dir0 = java.nio.file.Files.createTempDirectory("graft_gate_in").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("chunk", ntile(chunks).over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
    for (c <- 1 to chunks)
      docs.filter(col("chunk") === c).drop("chunk").sort("doc_id")
        .coalesce(1).write.mode("append").parquet(dir0)
    dir0
  }

  private def runGate(landing: String, stateDir: String): Unit = {
    val schema = spark.read.parquet(landing).schema
    val q = StreamDedupGate.gateSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(landing),
        stateDir,
        java.nio.file.Files.createTempDirectory("graft_gate_cp").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
  }

  test("streamed end state equals the batch dominance dedup, for two different chunkings") {
    val ref = reference()
    assert(ref.size < 500, "fixture has no near-dup pairs — gate untested")
    for (chunks <- Seq(4, 7)) {
      val state = java.nio.file.Files.createTempDirectory(s"graft_gate_$chunks").toString
      runGate(stage(chunks), state)
      assert(accepted(state) == ref, s"gate diverged from batch dedup at $chunks chunks")
    }
  }

  test("replaying a batch after a torn run (seen-store already written) changes nothing") {
    val state = java.nio.file.Files.createTempDirectory("graft_gate_replay").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    StreamDedupGate.acceptBatch(b0, state, 0L)
    val n1 = StreamDedupGate.acceptBatch(b1, state, 1L)
    // crash model: batch 1's bands/sh landed but the run is replayed —
    // the prior-state read must exclude batch 1's own subdirs, or every
    // replayed doc would self-match and be rejected
    val n1replay = StreamDedupGate.acceptBatch(b1, state, 1L)
    assert(n1replay == n1, s"replay drifted: $n1 then $n1replay accepted")
    assert(accepted(state) == reference(), "replayed end state diverged from batch dedup")
  }
}
