package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Headless stage profiler (round 21 — the optimization guide's §1
  * empirical loop without the Spark UI): run a registered query N
  * times (cold then hot, QueryProbe's protocol) with a listener that
  * aggregates per-stage executor run/CPU time, input bytes, shuffle
  * read/write bytes and fetch-wait, then print the stages of the LAST
  * (hot) run sorted by executor run time. This answers "which operator
  * is the time going to" for a query whose wall-clock the bench
  * already names — the per-stage name carries the first callsite.
  *
  * Usage: runMain graft.tools.StageProf <qNN> [sfDir] [runs]
  */
object StageProf {

  final case class Row(id: Int, name: String, tasks: Int, runMs: Long,
      cpuMs: Long, inB: Long, srB: Long, swB: Long, fetchMs: Long, spillB: Long)

  /** Batch mode: one session, each query run `runs` times (last run
    * profiled), printing a per-query one-line summary plus its top-3
    * stages — the tail-scan instrument (a per-query session would pay
    * ~40 s JVM+sbt startup each). Family caches are NOT released
    * between queries (the bench's in-sweep state), so numbers read
    * like board medians, not isolated colds. */
  private def multi(qlist: String, sfDir: String, runs: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionTuning.configure(graft.core.LocalDirs.configure(SparkSession.builder())).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.T.names.foreach { t =>
      graft.core.T.df(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo; val m = si.taskMetrics
        if (m != null) rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.fetchWaitTime, m.memoryBytesSpilled))
      }
    }
    val wanted = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    wanted.foreach { qn =>
      val q = graft.SparkEntry.all
        .find(x => x.name == qn || x.name.takeWhile(_ != '_') == qn)
        .getOrElse(sys.error(s"unknown query $qn"))
      var wall = 0.0
      for (r <- 1 to runs) {
        if (r == runs) { rows.clear(); spark.sparkContext.addSparkListener(listener) }
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"$qn: $e") }
        wall = (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(-_.runMs)
      val totRun = all.map(_.runMs).sum
      val oneTask = all.filter(r => r.tasks <= 2 && r.runMs >= 150)
      println(f"${q.name}%-34s wall $wall%5.2f s  stages ${all.size}%3d  " +
        f"exec ${totRun / 1000.0}%6.1f s  1task>=150ms ${oneTask.size}%2d " +
        oneTask.take(3).map(r => s"[${r.runMs}ms/${r.tasks}t]").mkString(" "))
      all.take(3).foreach { r =>
        println(f"    top stage ${r.id}%5d ${r.tasks}%4dt ${r.runMs}%7dms cpu${r.cpuMs}%7d " +
          f"in ${r.inB / 1048576.0}%6.1fM sr ${r.srB / 1048576.0}%6.1fM sw ${r.swB / 1048576.0}%6.1fM")
      }
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProf <qNN[,qNN...]> [sfDir] [runs]")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    if (args(0).contains(",")) { multi(args(0), sfDir, runs); return }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionTuning.configure(graft.core.LocalDirs.configure(SparkSession.builder())).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = graft.SparkEntry.queries.keys
      .find(k => k == args(0) || k.takeWhile(_ != '_') == args(0))
      .getOrElse(sys.error(s"unknown query ${args(0)}"))
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo; val m = si.taskMetrics
        if (m != null) rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.fetchWaitTime,
          m.memoryBytesSpilled))
      }
    }
    // page-cache warmup (QueryProbe protocol)
    graft.core.T.names.foreach { t =>
      graft.core.T.df(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val q = graft.SparkEntry.all.find(_.name == name).get
    var wall = 0.0
    for (r <- 1 to runs) {
      graft.Caches.releaseAll(spark)
      if (r == runs) {
        // profile only the LAST run: cold runs carry family builds
        // the bench bills to the untimed slot
        rows.clear(); spark.sparkContext.addSparkListener(listener)
      }
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      wall = (System.nanoTime() - t0) / 1e9
      System.err.println(f"run $r: $wall%.2f s")
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(-_.runMs)
    println(f"== $name last-run wall $wall%.2f s — stages by executor run time ==")
    println(f"${"stage"}%6s ${"tasks"}%5s ${"run_ms"}%8s ${"cpu_ms"}%8s " +
      f"${"in_MB"}%8s ${"sr_MB"}%8s ${"sw_MB"}%8s ${"fetch_ms"}%8s ${"spill_MB"}%8s  name")
    all.take(30).foreach { r =>
      println(f"${r.id}%6d ${r.tasks}%5d ${r.runMs}%8d ${r.cpuMs}%8d " +
        f"${r.inB / 1048576.0}%8.1f ${r.srB / 1048576.0}%8.1f ${r.swB / 1048576.0}%8.1f " +
        f"${r.fetchMs}%8d ${r.spillB / 1048576.0}%8.1f  ${r.name.take(90)}")
    }
    val totRun = all.map(_.runMs).sum
    println(f"total executor run ${totRun}ms across ${all.size} stages")
    spark.stop()
  }
}
