package graft.streaming

import graft.SparkSpec
import graft.core.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.TimestampType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{LocalDateTime, ZoneOffset}

/** Pins BOTH halves of the events dual-encoding normalization
  * (VERDICT r11 missing-item 2): `T.events` and `Streams.eventStream`
  * must yield the SAME session-zone microseconds whether the fixture
  * ships `ts` as TIMESTAMP(NANOS) — surfaced by the reader as a raw
  * LONG under `nanosAsLong` — or as timestamp[us] without UTC
  * adjustment (TIMESTAMP_NTZ). On any given testdata generation only
  * one branch runs end-to-end; these two generated fixtures keep the
  * other branch from silently rotting until the fixtures flip again.
  *
  * Also exercises the ADVICE r11 staging fix: the stream landing dir
  * is keyed by the source's size+mtime, so a regenerated fixture at
  * the same path (here: the same /tmp dir rewritten with the OTHER
  * encoding) gets a fresh landing copy instead of a stale one whose
  * physical type contradicts the freshly-read schema.
  */
class EventsEncodingSpec extends SparkSpec {

  // instants with sub-microsecond residue in the nanos encoding, so
  // the nanos->micros truncation (the same one DuckDB applies) is
  // observable, not incidental
  private val micros = Seq(
    1700000000000000L, 1700000123456789L, 1735689600000001L, 1700003600999999L)

  /** Write `df` as a SINGLE parquet file at dest/events.parquet — the
    * testdata ships single files, and the stream staging Files.copy's
    * exactly one. */
  private def writeSingle(df: DataFrame, dest: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_evt_out")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("out").toString)
    val part = Files.list(tmp.resolve("out")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(dest)
    Files.move(part, dest.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Fixture A — the TIMESTAMP(NANOS) generation as the engine sees it:
    * `nanosAsLong` surfaces the physical INT64 nanos as a plain LONG
    * column, which is exactly the schema this writer produces. */
  private def nanosDir(): Path = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evt_nanos")
    writeSingle(
      micros.zipWithIndex.map { case (us, i) =>
        (i.toLong, us * 1000L + 999L, i.toLong % 3, "click", 1.5, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      dir)
    dir
  }

  /** Fixture B — the timestamp[us]-without-UTC-adjustment generation:
    * LocalDateTime columns write as TIMESTAMP_NTZ micros. */
  private def ntzDir(): Path = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evt_ntz")
    writeSingle(
      micros.zipWithIndex.map { case (us, i) =>
        (i.toLong,
          LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000, ZoneOffset.UTC),
          i.toLong % 3, "click", 1.5, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      dir)
    dir
  }

  private def batchMicros(dir: Path): Map[Long, Long] = {
    val df = T.events(spark, dir.toString)
    assert(df.schema("ts").dataType == TimestampType,
      s"normalized ts must be session-zone TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def streamMicros(dir: Path): Map[Long, Long] = {
    val st = Streams.eventStream(spark, dir.toString)
    assert(st.schema("ts").dataType == TimestampType,
      s"stream ts must be session-zone TIMESTAMP, got ${st.schema("ts").dataType}")
    val name = "evt_enc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = st.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_evt_ck").toString)
      .start()
    q.awaitTermination()
    spark.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val expected: Map[Long, Long] =
    micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap

  test("batch T.events: nanos-long and NTZ-micros encodings normalize to identical UTC micros") {
    assert(batchMicros(nanosDir()) == expected) // nanos truncate, residue dropped
    assert(batchMicros(ntzDir()) == expected)   // NTZ re-labels the same wall clock
  }

  test("Streams.eventStream: both encodings yield identical micros through the streaming path") {
    assert(streamMicros(nanosDir()) == expected)
    assert(streamMicros(ntzDir()) == expected)
  }

  test("staging: regenerating the fixture with the OTHER encoding at the same path is picked up") {
    // same /tmp dir, first nanos then NTZ: the size+mtime-keyed landing
    // dir must re-stage, not serve the stale first copy
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evt_flip")
    writeSingle(
      micros.zipWithIndex.map { case (us, i) =>
        (i.toLong, us * 1000L + 999L, i.toLong % 3, "click", 1.5, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"), dir)
    assert(streamMicros(dir) == expected)
    writeSingle(
      micros.zipWithIndex.map { case (us, i) =>
        (i.toLong,
          LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000, ZoneOffset.UTC),
          i.toLong % 3, "click", 1.5, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"), dir)
    assert(streamMicros(dir) == expected)
    // ADVICE r12 + r13: regeneration must not strand the previous
    // stamp's staged copy FOREVER, but cleanup is age-gated — a
    // sibling younger than an hour may back a concurrent run still on
    // the previous fixture generation, so it survives the re-stage...
    import scala.jdk.CollectionConverters._
    val prefix = "stream_events_" + Integer.toHexString(dir.toString.hashCode) + "_"
    def staged = Files.list(Paths.get("/tmp/graft")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(prefix)).toList
    assert(staged.size == 2,
      s"young stale sibling must survive the age gate (concurrent-run safety): $staged")
    // ...and once aged past the gate it is reaped by the next call:
    // back-date every sibling 2h, re-open the stream, and exactly ONE
    // landing dir (the live stamp) remains
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600L * 1000)
    staged.foreach(n => Files.setLastModifiedTime(Paths.get("/tmp/graft", n), old))
    assert(streamMicros(dir) == expected)
    assert(staged.size == 1, s"aged stale landing dirs not cleaned: $staged")
  }
}
