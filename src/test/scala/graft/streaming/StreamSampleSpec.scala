package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** [[StreamSample]] pins: the bucketed bottom-k state stays ≤ K per
  * bucket, the final sample is CHUNKING-INDEPENDENT (any micro-batch
  * split of the same records folds to the identical sample — the
  * determinism that makes the sample exactly-once under replay and
  * oracle-comparable), and the streamed result equals the batch
  * bottom-k over the same ids. */
class StreamSampleSpec extends SparkSpec {

  private def run(chunks: Seq[Seq[Long]]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val name = "stream_sample_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = input.toDS()
      .groupByKey(_ % StreamSample.NBuckets)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(StreamSample.update)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .withColumn("r", row_number().over(
        Window.partitionBy("bucket").orderBy(col("seq").desc)))
      .filter(col("r") === 1)
      .select("bucket", "ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  private def globalSample(out: Map[Long, Seq[Long]]): Seq[Long] =
    out.values.flatten.toSeq
      .sortBy(id => (StreamSample.hashOf(id), id)).take(StreamSample.K)

  test("state bounded at K per bucket; sample equals the batch bottom-k") {
    val ids = (1L to 5000L)
    val out = run(ids.grouped(1300).map(_.toSeq).toSeq) // 4 micro-batches
    out.values.foreach(b => assert(b.size <= StreamSample.K,
      s"bucket state exceeded K: ${b.size}"))
    val expected = ids.sortBy(id => (StreamSample.hashOf(id), id)).take(StreamSample.K)
    assert(globalSample(out) == expected,
      "streamed bottom-k diverged from the batch ranking")
  }

  test("chunking-independence: different micro-batch splits, identical sample") {
    val ids = new scala.util.Random(11).shuffle((1L to 3000L).toVector)
    val a = run(Seq(ids))                                    // one batch
    val b = run(ids.grouped(97).map(_.toSeq).toSeq)          // 31 batches
    val c = run(Seq(ids.take(10), ids))                      // replayed prefix
    assert(globalSample(a) == globalSample(b))
    assert(globalSample(a) == globalSample(c),
      "a replayed prefix changed the sample — set-fold idempotence broken")
  }
}
