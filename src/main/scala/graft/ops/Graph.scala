package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, T}

/** Iterative graph analytics over relational edge lists — the
  * entity-importance pass a curation pipeline runs over its link /
  * citation / co-occurrence graphs (e.g. domain authority as a
  * document-quality prior).
  *
  * q109 is PageRank over the undirected customer↔supplier trading
  * graph (an edge per distinct trading pair from orders⋈lineitem,
  * both directions), run for a fixed 3 iterations.
  *
  * Exactness: ranks are integer milli-units with floor division on
  * both engines (`div` / `//` agree on positives): pr₀ = 1000,
  * contribution = pr div outdeg, pr' = 150 + (850·Σcontrib) div 1000
  * — the 0.15/0.85 damped update with no float anywhere, so the
  * DuckDB unrolled-CTE oracle hashes identically. Dropped remainders
  * stay dropped identically on both sides.
  *
  * Plan at 100 TB: iterative algorithms must NOT re-derive the graph
  * per iteration — lazy lineage re-expands the whole build under every
  * iteration, and runtime exchange reuse only partially rescues it (a
  * measured build of this query without the persists scanned lineitem
  * 16× for 3 iterations: AQE reused 9 exchanges and still recomputed
  * the rest). So the two invariant frames are persisted once per
  * (session, dir): the distinct trading-pair list (the expensive
  * orders⋈lineitem distinct — its fact-table scan happens exactly
  * once) and the out-degree-annotated edge list `ed` that every
  * iteration joins. Each iteration is then: cached `ed` ⋈ rank frame
  * (shuffle on the rank key), contribution sum shuffled on dst with
  * map-side partials — O(|edges|) per iteration, ranks O(|nodes|),
  * never on the driver. A long-running production job additionally
  * checkpoints the rank frame every ~5 iterations to cut lineage. The
  * final top-30 is TakeOrderedAndProject (per-partition heaps, no
  * global sort). PlanSpec pins one-lineitem-scan + no-cartesian +
  * the top-k form; released via [[release]] (Caches family).
  */
object Graph {

  /** (src, dst, outdeg) undirected trading edges with out-degree
    * attached — the per-iteration join frame, persisted once per
    * (session, dir). */
  private val edCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  /** Distinct (custkey, suppkey+1e6) trading pairs — the one
    * fact-table-scanning subtree, persisted so the edge list, the
    * degree table, and nothing else ever re-reads lineitem. */
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def pairs(s: SparkSession, dir: String): DataFrame =
    pairCache.computeIfAbsent((s, dir), _ => {
      val o = T.df(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = T.df(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("s"))
        .distinct()
        .persist()
    })

  private[graft] def edgesDeg(s: SparkSession, dir: String): DataFrame =
    edCache.computeIfAbsent((s, dir), _ => {
      val cs = pairs(s, dir)
      val edges = cs.select(col("c").as("src"), col("s").as("dst"))
        .union(cs.select(col("s").as("src"), col("c").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      edges.join(deg, "src").persist()
    })

  /** Unpersists the pair + edge frames for `s` (fires after q109, the
    * family's only consumer). */
  def release(s: SparkSession): Unit = {
    graft.Caches.dropSession(edCache, s)(_.unpersist())
    graft.Caches.dropSession(pairCache, s)(_.unpersist())
  }

  val qs: Seq[Q] = Seq(
    Q("q109_pagerank",
      """WITH e0 AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        |            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT c AS src, s + 1000000 AS dst FROM e0
        |          UNION ALL SELECT s + 1000000, c FROM e0),
        |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY 1),
        |p1 AS (SELECT e.dst AS node, 150 + (850 * sum(1000 // d.outdeg)) // 1000 AS pr
        |       FROM edges e JOIN deg d ON d.src = e.src GROUP BY 1),
        |p2 AS (SELECT e.dst AS node, 150 + (850 * sum(p.pr // d.outdeg)) // 1000 AS pr
        |       FROM edges e JOIN p1 p ON p.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
        |p3 AS (SELECT e.dst AS node, 150 + (850 * sum(p.pr // d.outdeg)) // 1000 AS pr
        |       FROM edges e JOIN p2 p ON p.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1)
        |SELECT node, pr::BIGINT AS pr_milli FROM p3
        |ORDER BY pr_milli DESC, node LIMIT 30""".stripMargin) { (s, dir) =>
      val ed = edgesDeg(s, dir)
      // pr₀ = 1000 for every node with out-edges (= every node of the
      // undirected graph); distinct over the CACHED edge frame, no
      // fact-table re-scan
      var pr = ed.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000L))
      for (_ <- 1 to 3) {
        pr = ed.join(pr, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(expr("pr div outdeg")).as("csum"))
          .select(col("dst").as("node"),
            expr("150 + (850 * csum) div 1000").cast("long").as("pr"))
      }
      pr.select(col("node"), col("pr").as("pr_milli"))
        .orderBy(col("pr_milli").desc, col("node"))
        .limit(30)
    }
  )
}
