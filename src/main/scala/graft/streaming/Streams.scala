package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, T}

/** Structured Streaming surface (SURVEY §2.9).
  *
  * q55 runs a REAL streaming query — file source → tumbling-window
  * aggregation → memory sink — driven to completion with a one-shot
  * trigger, then returns the materialized result; the oracle is the
  * equivalent batch aggregation in DuckDB. At scale the same plan runs
  * continuously: the file source checkpoints for exactly-once, the
  * window aggregation keeps one state row per (window, type), and a
  * watermark bounds state (watermark/late-data behavior is pinned in
  * StreamingSpec where batch arrival order is controllable).
  */
object Streams {

  /** Streaming exact-dedup for a document ingest stream: drop every
    * record whose `keyCol` was already seen within the watermark
    * horizon. `dropDuplicatesWithinWatermark` keeps one state row per
    * key and EXPIRES state once the key's event time falls behind the
    * watermark — the property that makes streaming dedup viable at
    * 100 TB/day, where an unbounded `dropDuplicates` state would grow
    * forever. Exactly-once within the horizon; re-emission of a key
    * after the horizon passes is the documented trade (tune the delay
    * to the upstream's max duplicate lag). StreamingSpec pins both the
    * dedup and the cross-batch state retention. */
  def dedupStream(in: DataFrame, keyCol: String, tsCol: String,
                  watermarkDelay: String): DataFrame =
    in.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  val qs: Seq[Q] = Seq(
    Q("q55_stream_window",
      """SELECT cast(date_trunc('day', ts) as date)::VARCHAR AS day, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, dir) =>
      // the file streaming source requires a DIRECTORY: stage the table
      // file into a per-sf landing dir (the same shape a production
      // stream consumes: one dir, files arriving over time)
      val landing = java.nio.file.Paths.get(
        "/tmp/graft/stream_events_" + Integer.toHexString(dir.hashCode))
      java.nio.file.Files.createDirectories(landing)
      val dst = landing.resolve("events.parquet")
      if (!java.nio.file.Files.exists(dst))
        java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), dst)
      // schema from the batch reader (ts arrives as raw nano longs)
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val name = "stream_window_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val stream = s.readStream.schema(schema).parquet(landing.toString)
      val withTs =
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else stream
      val q = withTs
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .count()
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("window.start").cast("date").cast("string").as("day"),
          col("event_type"), col("count").as("n"))
        .orderBy("day", "event_type")
    },

    // ---- stream-static join (production enrichment shape): the event
    // stream joins a STATIC dimension (customer → nation) that Spark
    // re-plans per micro-batch and BROADCASTS — the stream side never
    // shuffles for the join; the only stateful exchange is the
    // windowed aggregation. At 100 TB/day this is the standard
    // "enrich-then-aggregate" topology: dims broadcast, state is one
    // row per (window, nation).
    Q("q72_stream_static_join",
      """SELECT cast(date_trunc('day', ts) as date)::VARCHAR AS day, n_name AS nation,
        |       count(*) AS n,
        |       cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY day, nation""".stripMargin) { (s, dir) =>
      val landing = java.nio.file.Paths.get(
        "/tmp/graft/stream_events_" + Integer.toHexString(dir.hashCode))
      java.nio.file.Files.createDirectories(landing)
      val dst = landing.resolve("events.parquet")
      if (!java.nio.file.Files.exists(dst))
        java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), dst)
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val name = "stream_enrich_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val stream = s.readStream.schema(schema).parquet(landing.toString)
      val withTs =
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else stream
      val dim = broadcast(T.df(s, dir, "customer")
        .join(broadcast(T.df(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
      val q = withTs
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 day"), col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(T.dec(col("value"))).as("sum_value_dec"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("window.start").cast("date").cast("string").as("day"),
          col("n_name").as("nation"), col("n"),
          T.dbl(col("sum_value_dec")).as("sum_value"))
        .orderBy("day", "nation")
    }
  )
}
