package graft.tools
import org.apache.spark.sql.SparkSession

/** One-session interleaved A/B: a query's cold/hot cost with Spark
  * 4.1's spark.sql.unionOutputPartitioning ON vs OFF (round 19 — the
  * feature is disabled engine-wide after the q233 zip crash; this
  * attributes any board movement to that decision, per-query).
  * Usage: runMain graft.tools.UnionAb <qNN> [sfDir] [rounds] */
object UnionAb {
  def main(args: Array[String]): Unit = {
    val qn = args.headOption.getOrElse(sys.error("usage: UnionAb qNN [sfDir] [rounds]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.all.find(x =>
      x.name == qn || x.name.takeWhile(_ != '_') == qn).get
    graft.core.T.names.foreach(t =>
      graft.core.T.df(s, dir, t).write.format("noop").mode("overwrite").save())
    def run(): Double = {
      val t0 = System.nanoTime()
      q.run(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val (con, coff, hon, hoff) = (Array.newBuilder[Double], Array.newBuilder[Double],
      Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to rounds) {
      s.conf.set("spark.sql.unionOutputPartitioning", "true")
      graft.Caches.releaseAll(s); con += run(); hon += run()
      s.conf.set("spark.sql.unionOutputPartitioning", "false")
      graft.Caches.releaseAll(s); coff += run(); hoff += run()
    }
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"${q.name}: conf ON  cold ${med(con.result())}%.2f hot ${med(hon.result())}%.2f")
    println(f"${q.name}: conf OFF cold ${med(coff.result())}%.2f hot ${med(hoff.result())}%.2f")
    s.stop()
  }
}
