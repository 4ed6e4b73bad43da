package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Few-huge-sources sweep for q97's keyed prefix-sum — the
  * measure-don't-narrate protocol applied to the VERDICT r8 weak item:
  * one source cloned K× (a single giant source among uniform small
  * ones, the corpus shape q87's curation models), then the per-source
  * running weight computed BOTH ways over the same frame:
  *
  *  - `window`: the plain `sum OVER (PARTITION BY source ORDER BY
  *    doc_id)` — the whole giant source serializes through ONE task's
  *    sort, so max-rows-per-sort-partition grows ∝ K;
  *  - `keyed`: [[graft.llm.LlmText.keyedOffsets]] — per-(source,
  *    doc_id-range-bucket) windows, so the giant source splits across
  *    nBuckets sorts and max-rows-per-partition stays ~flat in K.
  *
  * Per shape the tool prints wall seconds, the longest single task
  * (SparkListener), and the max rows any one window sort saw — the
  * scale quantity itself, noise-free at fixture size. The pass
  * criterion: `keyed`'s max partition is bounded (≈ giant/nBuckets)
  * while `window`'s tracks the giant source 1:1.
  *
  * Usage: `runMain graft.tools.SkewSweep [sfDir] [K]`
  * (defaults: /root/testdata/sf0.1, 200). Results land in the
  * README's "skew sweep" note.
  */
object SkewSweep {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1's union-preserves-partitioning feature zips co-partitioned
      // union children; a memoized frame whose AQE-materialized partition
      // count diverges from its claimed partitioning crashes the zip
      // (q233 hot at clone10) -- keep the sound concatenating Union
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nBuckets = 8

    val d = skewed(spark, src, k).persist()
    val total = d.count()
    val hotRows = d.groupBy("source").count().agg(max("count")).first().getLong(0)
    println(f"== skewed docs: $total%,d rows, hottest source $hotRows%,d rows (K=$k) ==")

    val wSrc = Window.partitionBy("source").orderBy("doc_id")
    val plainCumw = d
      .withColumn("cumw", sum("n_chars").over(wSrc))
      .withColumn("W", sum("n_chars").over(Window.partitionBy("source")))
    val keyedCumw = graft.llm.LlmText.keyedOffsets(d, "source", "n_chars", nBuckets)

    for ((label, cumw) <- Seq(("window", plainCumw), ("keyed ", keyedCumw))) {
      // identical downstream pick for both shapes (q97's threshold scan)
      val picked = cumw
        .select(col("source"), col("doc_id"), col("cumw"), col("W"),
          explode(sequence(lit(0L), lit(3L))).as("j"))
        .filter(col("cumw") > expr("(j * W) div 4"))
        .groupBy("source", "j").agg(min("doc_id").as("picked_doc_id"))
      val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTask.getAndAccumulate(e.taskInfo.duration, math.max)
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      picked.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"$label: wall=$sec%6.2f s  maxTask=${maxTask.get()}%,6d ms  " +
        f"maxSortPartition=${maxSortPartition(spark, d, label.trim, nBuckets)}%,d rows")
    }
    d.unpersist()
    spark.stop()
  }

  /** Largest row count any one running-sum window sort sees under each
    * shape — computed from the frame itself (deterministic): `window`
    * partitions by source alone; `keyed` by (source, doc_id DIV width)
    * with [[graft.llm.LlmText.keyedOffsets]]'s width rule. */
  private def maxSortPartition(spark: SparkSession, d: DataFrame,
                               shape: String, nBuckets: Int): Long = {
    val grouped =
      if (shape == "window") d.groupBy("source")
      else {
        val maxId = d.agg(max("doc_id")).first().getLong(0)
        val width = (maxId / nBuckets + 1).max(1L)
        d.groupBy(col("source"), expr(s"doc_id DIV $width"))
      }
    grouped.count().agg(max("count")).first().getLong(0)
  }

  /** documents with the first source cloned `k`× under shifted ids —
    * one giant source among uniform small ones. */
  private def skewed(spark: SparkSession, src: String, k: Int): DataFrame = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val hot = docs.groupBy("source").count().orderBy("source").first().getString(0)
    val shift = docs.agg(max("doc_id")).first().getLong(0) + 1
    docs.filter(col("source") =!= hot).unionByName(
      docs.filter(col("source") === hot)
        .crossJoin(broadcast(spark.range(k).select(col("id").as("copy"))))
        .select(col("source"), (col("doc_id") + col("copy") * shift).as("doc_id"),
          col("n_chars")))
  }
}
