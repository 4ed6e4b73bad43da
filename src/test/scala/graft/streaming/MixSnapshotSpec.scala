package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Torn-read fence for the online training-mix monitor (VERDICT r15
  * item 4): per-window weights are JOINT across event types, so the
  * only safe read is a complete internally-consistent state
  * generation. [[MixMonitor]] publishes exactly that — per trigger,
  * the full weight frame behind an atomic manifest swap. This spec
  * pins the invariant a torn per-row upsert read would break: in
  * EVERY published snapshot, each day's weights sum to unity within
  * integer truncation (Σ weight_micro ∈ (1e6 − |types|, 1e6]) — and
  * that a reader between triggers sees a complete old state, never a
  * partial new one. */
class MixSnapshotSpec extends SparkSpec {

  private val ts1 = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
  private val ts2 = java.sql.Timestamp.valueOf("2024-03-02 09:30:00")

  private def writeBatch(srcDir: java.nio.file.Path, tag: String,
                         rows: Seq[(Long, java.sql.Timestamp, String, Double)]): Unit = {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("mixsnap_stage")
    rows.map { case (id, t, et, v) => (id, t, id, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, srcDir.resolve(s"$tag.parquet"))
  }

  private def runTrigger(srcDir: String, outDir: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val masses = spark.readStream.schema(schema).parquet(srcDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).as("mass_dec"))
    val q = MixMonitor.sink(masses, outDir, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** The joint-consistency invariant: weights in one snapshot derive
    * from ONE state generation, so they sum to unity (up to one unit
    * of truncation per type). A torn read — one fresh row next to
    * stale siblings — breaks this bound. */
  private def assertConsistent(rows: Array[org.apache.spark.sql.Row]): Unit = {
    rows.groupBy(_.getString(0)).foreach { case (day, rs) =>
      val sumW = rs.map(_.getLong(4)).sum
      assert(sumW <= 1000000L && sumW > 1000000L - rs.length,
        s"day=$day torn weights: sum=$sumW over ${rs.length} types")
    }
  }

  test("every published snapshot is a complete, internally consistent state") {
    val srcDir = java.nio.file.Files.createTempDirectory("mixsnap_src")
    val outDir = java.nio.file.Files.createTempDirectory("mixsnap_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mixsnap_ckpt").toString

    assert(MixMonitor.readCurrent(spark, outDir).isEmpty, "no snapshot before first trigger")

    // trigger 1: one day, two types
    writeBatch(srcDir, "b1", Seq(
      (1L, ts1, "click", 10.0), (2L, ts1, "click", 6.0), (3L, ts1, "view", 4.0)))
    runTrigger(srcDir.toString, outDir, ckpt)
    val s1 = MixMonitor.readCurrent(spark, outDir).get.collect()
    assert(s1.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("2024-03-01", "click"), ("2024-03-01", "view")))
    assertConsistent(s1)

    // a mid-stream reader between triggers holds the OLD complete
    // state: snapshot the manifest target now, then advance the stream
    val before = MixMonitor.readCurrent(spark, outDir).get.collect()

    // trigger 2: a NEW type lands in day 1 (re-weights ALL of day 1 —
    // the exact joint update an upsert sink tears) plus a new day
    writeBatch(srcDir, "b2", Seq(
      (4L, ts1, "purchase", 80.0), (5L, ts2, "click", 5.0)))
    runTrigger(srcDir.toString, outDir, ckpt)
    val s2 = MixMonitor.readCurrent(spark, outDir).get.collect()
    assert(s2.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("2024-03-01", "click"), ("2024-03-01", "view"),
        ("2024-03-01", "purchase"), ("2024-03-02", "click")))
    assertConsistent(s2)
    // day 1's PRE-EXISTING types were re-weighted in the same
    // generation as the new arrival — the update an upsert sink
    // would have left stale
    val w1 = s1.map(r => r.getString(1) -> r.getLong(4)).toMap
    val w2 = s2.filter(_.getString(0) == "2024-03-01")
      .map(r => r.getString(1) -> r.getLong(4)).toMap
    assert(w2("click") < w1("click") && w2("view") < w1("view"),
      s"siblings must re-weight jointly: $w1 -> $w2")

    // the old state the mid-stream reader resolved was itself complete
    assertConsistent(before)

    // trigger 3: GC keeps current + predecessor only
    writeBatch(srcDir, "b3", Seq((6L, ts2, "view", 2.0)))
    runTrigger(srcDir.toString, outDir, ckpt)
    import scala.jdk.CollectionConverters._
    val snaps = java.nio.file.Files.list(java.nio.file.Paths.get(outDir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches("snap_\\d+")).toSeq.sorted
    assert(snaps.size == 2, s"GC must keep exactly current+predecessor: $snaps")
    assertConsistent(MixMonitor.readCurrent(spark, outDir).get.collect())
    // the predecessor snapshot stays readable for an in-flight reader
    val pred = spark.read.parquet(s"$outDir/${snaps.head}").collect()
    assertConsistent(pred)
  }

  test("a replayed batch id is idempotent: same snapshot, manifest intact") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("mixsnap_replay").toString
    val weights = Seq(("2024-03-01", "click", 2L, 16.0, 666666L, 800000L, Some(833L)))
      .toDF("day", "event_type", "n", "mass", "weight_micro", "natural_micro", "boost_milli")
    // direct writeSnapshot drive (the foreachBatch interior): batch 7 twice
    MixMonitor.writeSnapshot(weights, outDir, 7L)
    MixMonitor.writeSnapshot(weights, outDir, 7L)
    val cur = MixMonitor.readCurrent(spark, outDir).get.collect()
    assert(cur.length == 1 && cur.head.getLong(4) == 666666L)
    import scala.jdk.CollectionConverters._
    val stages = java.nio.file.Files.list(java.nio.file.Paths.get(outDir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.contains(".stage_")).toSeq
    assert(stages.isEmpty, s"stage dirs must not leak: $stages")
  }
}
