package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mega-basket adversary for q133's Apriori pair stage (VERDICT r13
  * item 3) — the StateSweep/SkewSweep measure-don't-narrate protocol
  * pointed at baskets. q133's pair count is `items ⋈ items ON k,
  * p < p`: per-key quadratic, so one customer holding M distinct
  * parts squares inside a single task (C(M,2) rows materialized by
  * ONE sort-merge-join partition) while every other task finishes in
  * milliseconds — the skew cliff the r13 verdict flagged as "watch".
  *
  * Fixture: sf0.1's real q133 items frame (≈1.5M (customer, part)
  * rows, basket p99 ≈ 40) plus ONE synthetic customer (key = max+1)
  * holding M distinct parts, M ∈ {1000, 3163, 10000}. For each M the
  * tool runs the pair-count stage to the noop sink BOTH ways:
  *
  *  - `direct`: q133's production self-join — the whole mega-basket's
  *    C(M,2) in one task; wall and maxTask must track C(M,2) ≈ M².
  *  - `sliced`: [[graft.ops.Graph.frequentTriples]]'s hedged pair
  *    stage (see `pairCounts` there): baskets over the size threshold
  *    are bucket-tiled into S×S ordered slice-pairs on a composite
  *    shuffle key, so the quadratic work spreads across ~S²/2 tasks
  *    and maxTask stays ~flat in M (each tile is (M/S)²).
  *
  * Also prints the end-to-end q133 wall at each M so the hedge's
  * fixed overhead on the REAL distribution (no mega-basket) is priced
  * — the hedge must be ≈free when no basket crosses the threshold,
  * because the threshold filter finds nothing and the tiled branch is
  * an empty frame.
  *
  * Usage: `runMain graft.tools.BasketSweep [sfDir]` → README table.
  */
object BasketSweep {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1's union-preserves-partitioning feature zips co-partitioned
      // union children; a memoized frame whose AQE-materialized partition
      // count diverges from its claimed partitioning crashes the zip
      // (q233 hot at clone10) -- keep the sound concatenating Union
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.T

    val items = T.df(spark, src, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(T.df(spark, src, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("k"), col("l_partkey").as("p"))
      .distinct()
      .persist()
    val base = items.count()
    val maxK = items.agg(max("k")).first().getLong(0)
    val p99 = items.groupBy("k").count()
      .agg(expr("percentile(count, 0.99)")).first().getDouble(0)
    println(f"== base items: $base%,d rows, basket p99 ≈ $p99%.0f ==")

    def timed(df: DataFrame): (Double, Long) = {
      val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTask.getAndAccumulate(e.taskInfo.duration, math.max)
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      (sec, maxTask.get())
    }

    def directPairs(it: DataFrame): DataFrame = it.as("a")
      .join(it.as("b"), col("a.k") === col("b.k") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n"))

    // warmup: codegen + page cache on the real frame, both shapes
    timed(directPairs(items))
    timed(graft.ops.Graph.pairCounts(items))

    for (m <- Seq(0L, 1000L, 3163L, 10000L)) {
      val withMega =
        if (m == 0L) items
        else items.unionByName(
          spark.range(m).select(lit(maxK + 1).as("k"),
            // part ids disjoint from the real range so the mega-basket
            // adds NO support to real pairs — output differs only by
            // the mega rows themselves, identical between both shapes
            (col("id") + 10000000L).as("p")))
      val label = if (m == 0) "base   " else f"mega$m%-6d"
      val (dSec, dTask) = timed(directPairs(withMega))
      val (sSec, sTask) = timed(graft.ops.Graph.pairCounts(withMega))
      println(f"$label pair-stage  direct wall=$dSec%6.2f s maxTask=$dTask%,8d ms" +
        f"   sliced wall=$sSec%6.2f s maxTask=$sTask%,8d ms")
      val (fSec, _) = timed(graft.ops.Graph.frequentTriples(withMega, 3))
      println(f"$label full q133 (hedged pair stage) wall=$fSec%6.2f s")
    }
    items.unpersist()
    spark.stop()
  }
}
