package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** [[StreamTopK]] pins: the sketch state stays ≤ Cap per bucket while
  * eviction actually fires, the Misra–Gries threshold guarantee
  * carries heavy keys across micro-batch boundaries, and the
  * candidates-then-exact recount recovers the exact top-k from a
  * chunked stream. */
class StreamTopKSpec extends SparkSpec {

  private def run(chunks: Seq[Seq[Long]]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val name = "stream_topk_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = input.toDS()
      .groupByKey(_ % StreamTopK.NBuckets)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(StreamTopK.update)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .withColumn("r", row_number().over(
        Window.partitionBy("bucket").orderBy(col("seq").desc)))
      .filter(col("r") === 1)
      .select("bucket", "cands").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  test("eviction fires, state stays bounded, heavy keys survive chunk boundaries") {
    // one bucket (all keys ≡ 0 mod NBuckets), 200 distinct light keys
    // of one occurrence each — past Cap=128, so eviction MUST fire —
    // plus a heavy key at freq 100 ≫ n/(Cap+1) ≈ 2.3
    val heavy = 16L * 1000
    val light = (1 to 200).map(i => 16L * i)
    val all = new scala.util.Random(7).shuffle(
      (light ++ Seq.fill(100)(heavy)).toVector)
    val out = run(all.grouped(75).map(_.toSeq).toSeq) // 4 micro-batches
    val cands = out(0L)
    assert(cands.size <= StreamTopK.Cap,
      s"sketch exceeded Cap: ${cands.size}")
    assert(cands.size < 201, "eviction never fired — the stream wasn't adversarial")
    assert(cands.contains(heavy),
      "threshold guarantee broken: heavy key evicted across chunk boundaries")
  }

  test("near-uniform keys under per-bucket Cap: candidate set is complete (exact regime)") {
    // 64 distinct keys spread over all buckets (≤ Cap per bucket by
    // far): no eviction, candidates = every key — the regime the
    // fixture gate runs in
    val keys = (0L until 64L).flatMap(k => Seq.fill(3 + (k % 5).toInt)(k))
    val out = run(Seq(keys.take(100), keys.drop(100)))
    assert(out.values.flatten.toSet == (0L until 64L).toSet)
  }
}
