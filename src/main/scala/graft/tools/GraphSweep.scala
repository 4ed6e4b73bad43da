package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew sweep for the q113 triangle pipeline (the SkewSweep/StateSweep
  * protocol applied to graphs): synthetic celebrity-vertex graphs at
  * growing scale, measuring that degree-ordered orientation keeps the
  * enumerated wedge count near the m^1.5 envelope while the naive
  * center-at-every-node shape grows with hub_degree² — the difference
  * between "slower at 10×" and "dead at 10×".
  *
  * Graph at factor F: one hub 0 connected to 2000·F spokes (the
  * celebrity vertex: degree 2000·F), plus a deterministic background
  * ring of 4000·F edges among the spokes (i → i+1, i → i+7 wrap) so
  * triangles exist and every spoke has degree ≥ 3. No randomness —
  * the sweep is rerun-stable.
  *
  * Usage: `runMain graft.tools.GraphSweep [factors…]` (default 1 4 16).
  * Prints one JSON line per factor: edges m, hub degree, max oriented
  * out-degree, oriented wedge count vs naive hub wedge count, and the
  * pipeline wall time.
  *
  * `runMain graft.tools.GraphSweep bfs [rounds…]` (default 3 10 30)
  * instead sweeps the q136 BFS DEPTH axis (VERDICT r14): a 20k-node
  * path graph traversed at growing round counts, each depth timed with
  * the lineage UNCUT (ckptEvery = MaxValue — every round stacks
  * join+union+agg on the prior logical plan, so analyzer/optimizer
  * time compounds) and with the shipped 5-round localCheckpoint cut.
  * The uncut arm is the cliff; the cut arm is its removal.
  */
object GraphSweep {

  private def pairs(s: SparkSession, factor: Int): DataFrame = {
    import s.implicits._
    val n = 2000 * factor
    val star = (1 to n).map(i => (0L, i.toLong))
    val ring = (1 to n).flatMap { i =>
      Seq((i.toLong, (i % n + 1).toLong), (i.toLong, ((i + 6) % n + 1).toLong))
    }
    (star ++ ring).map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.filter { case (a, b) => a != b }
      .toDF("a", "b")
  }

  /** BFS-depth arm: long-path graph so deep rounds keep reaching new
    * nodes (the frontier never drains early); both traversal arms must
    * return the identical label census. */
  private def bfsSweep(spark: SparkSession, roundsAxis: Seq[Int]): Unit = {
    import spark.implicits._
    val n = 20000
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst").persist()
    edges.count()
    val sources = Seq(0L).toDF("node")
    // GRAFT_BFS_ARMS=cut5 (or uncut) runs one arm only: the uncut arm
    // is the cliff under measurement — at rounds=30 its analyzer cost
    // is unboundedly worse than the traversal (rounds=10 already reads
    // 126 s vs 7 s cut), so deep axes run cut-only.
    val arms = Seq("uncut" -> Int.MaxValue, "cut5" -> 5).filter { case (n, _) =>
      sys.env.get("GRAFT_BFS_ARMS").forall(_.split(",").contains(n)) }
    for (rounds <- roundsAxis; (arm, every) <- arms) {
      val t0 = System.nanoTime()
      val lab = graft.ops.Graph.bfsHops(edges, sources, rounds, every)
        .agg(count(lit(1)), sum(col("node")), sum(col("hop"))).first()
      val wallMs = (System.nanoTime() - t0) / 1000000
      println(s"""{"mode":"bfs","rounds":$rounds,"arm":"$arm","wall_ms":$wallMs,""" +
        s""""reached":${lab.getLong(0)},"node_sum":${lab.getLong(1)},"hop_sum":${lab.getLong(2)}}""")
    }
    edges.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.headOption.contains("bfs")) {
      val axis = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(3, 10, 30)
      bfsSweep(spark, axis)
      spark.stop()
      return
    }
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)

    for (f <- factors) {
      val p = pairs(spark, f).persist()
      val m = p.count()
      val t0 = System.nanoTime()
      val ori = graft.ops.Graph.orient(p).persist()
      val maxOut = ori.groupBy("u").agg(count(lit(1)).as("od"))
        .agg(max(col("od"))).first().getLong(0)
      // oriented wedge count = what q113 enumerates
      val wedges = ori.select(col("u"), col("v").as("v1"))
        .join(ori.select(col("u"), col("v").as("v2")), "u")
        .filter(col("v1") < col("v2"))
      val nWedges = wedges.count()
      val tri = wedges.join(p,
        col("a") === least(col("v1"), col("v2")) &&
          col("b") === greatest(col("v1"), col("v2"))).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      val hubDeg = 2000L * f
      // the naive shape's hub contribution alone: C(hub_deg, 2)
      val naiveHubWedges = hubDeg * (hubDeg - 1) / 2
      println(s"""{"factor":$f,"edges":$m,"hub_degree":$hubDeg,""" +
        s""""max_oriented_outdeg":$maxOut,"oriented_wedges":$nWedges,""" +
        s""""naive_hub_wedges":$naiveHubWedges,"triangles":$tri,"wall_ms":$wallMs}""")
      ori.unpersist(); p.unpersist()
    }
    spark.stop()
  }
}
