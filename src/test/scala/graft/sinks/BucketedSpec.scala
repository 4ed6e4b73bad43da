package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing: the write-time co-location that lets repeated key joins
  * skip their shuffle (SURVEY §4 — the cluster-scale replacement for
  * the reference's eudract_id indexes). */
class BucketedSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with NO exchange") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"))
    Sinks.bucketed(ev, "b_events_a", "user_id", buckets = 4)
    Sinks.bucketed(ev.withColumnRenamed("event_id", "other_id"), "b_events_b", "user_id", buckets = 4)
    // force the non-broadcast path: the point is that bucket co-location
    // replaces the SHUFFLE, which broadcast would mask on tiny inputs
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_events_a")
        .join(spark.table("b_events_b"), "user_id")
        .groupBy("user_id").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("FULL OUTER join of pk-bucketed snapshots plans with NO exchange (q84's at-scale shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    Sinks.bucketed(docs, "b_snap_base", "doc_id", buckets = 4)
    Sinks.bucketed(docs.filter(col("doc_id") % 17 =!= 3), "b_snap_new", "doc_id", buckets = 4)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diff = spark.table("b_snap_base").as("b")
        .join(spark.table("b_snap_new").as("n"),
          col("b.doc_id") === col("n.doc_id"), "full_outer")
        .filter(col("n.doc_id").isNull || col("b.doc_id").isNull)
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed snapshot diff still shuffles:\n$plan")
      assert(diff.count() > 0) // the removed ids surface
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
