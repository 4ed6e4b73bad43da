package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isolated triage for q101's r10 sweep regression (1.68 → 2.57 s
  * median in the very round that halved its tokenization work — the
  * board's one untriaged number, VERDICT r10 What's-wrong #2).
  *
  * Protocol = the repo's StreamProbe/GraphProbe discipline: a fresh
  * local[32] JVM, the Bench warmup (codegen + page-cache faulting),
  * then each variant runs SPARK_GRAFT_PROBE_RUNS times (default 5)
  * through the noop sink with LlmText.release between runs, so every
  * run is billed exactly like a sweep's first consumer (cache rebuilt
  * from cold). Reported per variant: median + [min, max].
  *
  * Variants:
  *   persisted  — the shipped r10 shape: tokenize ONCE into the
  *                persisted bm25Pre projection; the N/Σdl scalar job
  *                and the tf pass both read the materialization.
  *   recompute  — the r9 shape: no persist, the scalar job and the tf
  *                pass each tokenize the corpus (2 passes), fully
  *                pipelined, no storage churn.
  *   phases     — the persisted form split at its job boundaries:
  *                (1) persist build + scalar first(), (2) score+rank
  *                off the warm cache — names where the time goes.
  */
object Q101Probe {
  private val Terms = Seq(0L -> "join", 0L -> "hash", 1L -> "vector",
    1L -> "scan", 1L -> "filter", 2L -> "merge", 2L -> "slow")

  /** Score + rank over any (doc_id, dl, mt) projection — the shared
    * tail of both variants, identical to the registered q101 body. */
  private def scoreTail(s: SparkSession, pre: DataFrame,
                        nDocs: Long, sumdl: Long): DataFrame = {
    import s.implicits._
    val qtab = Terms.toDF("q_id", "term")
    val tf = pre
      .select(col("doc_id"), col("dl"), explode(col("mt")).as("w"))
      .groupBy("doc_id", "w", "dl").agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfTab), "w")
      .join(broadcast(qtab), col("term") === col("w"))
      .withColumn("s", expr(
        s"(12000 * tf * (CAST($nDocs AS BIGINT) - df) * CAST($sumdl AS BIGINT))" +
          s" div (4 * CAST($sumdl AS BIGINT) * tf" +
          s" + 2 * (CAST($sumdl AS BIGINT) + 3 * dl * CAST($nDocs AS BIGINT)))"))
      .groupBy("q_id", "doc_id").agg(sum("s").as("score_milli"))
    graft.ops.KeyedTopK.prune(scored, Seq("q_id"),
        Seq("score_milli" -> false, "doc_id" -> true), 10)
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("score_milli").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
      .select("q_id", "rk", "doc_id", "score_milli")
      .orderBy("q_id", "rk")
  }

  private def rawPre(s: SparkSession, dir: String): DataFrame =
    LlmText.docs(s, dir)
      .select(col("doc_id"), LlmText.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        filter(col("t"), w => w.isin(Terms.map(_._2).distinct: _*)).as("mt"))

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "5").toInt
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Bench-identical warmup: codegen paths + page-cache faulting.
    val r = spark.read.parquet(s"$dir/region.parquet")
    r.groupBy(col("r_name"))
      .agg(sum(col("r_regionkey").cast("decimal(12,2)")).as("s"), count(lit(1)).as("c"))
      .join(broadcast(r.select(col("r_name"))), "r_name")
      .withColumn("rk", row_number().over(Window.partitionBy("r_name").orderBy("s")))
      .write.format("noop").mode("overwrite").save()
    graft.core.T.df(spark, dir, "documents").write.format("noop").mode("overwrite").save()

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sweep(label: String)(f: => Unit): Seq[Double] = {
      val ts = (1 to runs).map { _ =>
        val dt = t(f); LlmText.release(spark); dt
      }
      println(f"$label%-12s median ${graft.Bench.median(ts)}%6.3f s  " +
        f"[${ts.min}%.3f, ${ts.max}%.3f]  runs=${ts.mkString(", ")}")
      ts
    }

    val q101 = graft.SparkEntry.queries("q101_bm25_topk")
    sweep("persisted") {
      q101(spark, dir).write.format("noop").mode("overwrite").save()
    }
    sweep("recompute") {
      val pre = rawPre(spark, dir)
      val sc = pre.agg(count(lit(1)).cast("long").as("n"), sum(col("dl")).as("sumdl")).first()
      scoreTail(spark, pre, sc.getLong(0), sc.getLong(1))
        .write.format("noop").mode("overwrite").save()
    }
    // Phase split of the persisted form (cold cache each iteration).
    (1 to runs).foreach { i =>
      val pre = LlmText.bm25Pre(spark, dir, Terms.map(_._2).distinct)
      var n = 0L; var sd = 0L
      val p1 = t {
        val sc = pre.agg(count(lit(1)).cast("long").as("n"), sum(col("dl")).as("sumdl")).first()
        n = sc.getLong(0); sd = sc.getLong(1)
      }
      val p2 = t {
        scoreTail(spark, pre, n, sd).write.format("noop").mode("overwrite").save()
      }
      val p3 = t { LlmText.release(spark) }
      println(f"phases run$i: build+scalar $p1%6.3f s  score+rank $p2%6.3f s  release $p3%6.3f s")
    }
    spark.stop()
  }
}
