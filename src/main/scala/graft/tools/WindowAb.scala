package graft.tools

import org.apache.spark.sql.SparkSession

/** One-session interleaved A/B for the WindowHashes kernel arms
  * (round 19, VERDICT r18 item 3): the shipped O(n·k) fresh-FNV fold
  * vs the O(n) polynomial rolling hash, measured on the substring
  * span-family build — the largest cold cost in the clone100 stress
  * (17–23 s in r18). Interleaved rounds so ambient host noise hits
  * both arms equally (the PersistAb/TripleAb protocol). The arms
  * produce different hash VALUES (candidate sets differ, both
  * supersets of truth); the verified span result is identical —
  * printed counts must agree.
  *
  * Usage: runMain graft.tools.WindowAb [sfDir] [rounds]
  */
object WindowAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master("local[32]")
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
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    docs.count() // page-cache warm

    def build(rolling: Boolean): Long =
      graft.llm.LlmText.substringDedupSpans(docs, graft.llm.LlmText.SpanK,
        rolling = rolling).count()
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm both code paths once (codegen/JIT) before timing
    build(rolling = false); build(rolling = true)
    val (h0, c0) = graft.Bench.calibrate(s)
    println(f"calib pre: hash $h0%.3f s  spark $c0%.3f s")
    val (fa, ra) = (Array.newBuilder[Double], Array.newBuilder[Double])
    var (nf, nr) = (0L, 0L)
    for (_ <- 1 to rounds) {
      graft.Caches.releaseAll(s)
      val (tf, cf) = time(() => build(rolling = false)); fa += tf; nf = cf
      graft.Caches.releaseAll(s)
      val (tr, cr) = time(() => build(rolling = true)); ra += tr; nr = cr
    }
    val (h1, c1) = graft.Bench.calibrate(s)
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"fnv     spans=$nf cold rounds: ${fa.result().map(x => f"$x%.2f").mkString(" ")}  median ${med(fa.result())}%.2f")
    println(f"rolling spans=$nr cold rounds: ${ra.result().map(x => f"$x%.2f").mkString(" ")}  median ${med(ra.result())}%.2f")
    println(f"calib post: hash $h1%.3f s  spark $c1%.3f s")
    assert(nf == nr, s"ARM DIVERGENCE: fnv $nf spans vs rolling $nr — exact verify broken")
    s.stop()
  }
}
