package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property behind q113's O(m^1.5) claim: degree-ordered
  * orientation caps every node's OUT-degree near √m even when its
  * undirected degree is Θ(n) — the celebrity-vertex shape that makes
  * the naive center-at-every-node wedge enumeration quadratic. Driven
  * on a synthetic star-plus-clique graph where the pathology is
  * maximal, plus an exhaustive triangle cross-check on the clique. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  // hub 0 joined to every spoke 1..400 (star: 400 edges, zero
  // triangles) + a 30-clique on 1000..1029 (435 edges, C(30,3)
  // triangles). m = 835, √m ≈ 29.
  private lazy val pairs = {
    val star = (1 to 400).map(i => (0L, i.toLong))
    val clique = for {
      i <- 1000 to 1029; j <- (i + 1) to 1029
    } yield (i.toLong, j.toLong)
    (star ++ clique).toDF("a", "b")
  }

  test("hub out-degree collapses under degree orientation") {
    val outdeg = Graph.orient(pairs)
      .groupBy("u").agg(count(lit(1)).as("od"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the hub has undirected degree 400 but every spoke has degree 1:
    // all star edges orient spoke -> hub, so the hub's OUT-degree is 0
    // and no node's out-degree exceeds the clique bound (≤ 29 ≈ √m)
    assert(!outdeg.contains(0L), s"hub kept out-edges: ${outdeg.get(0L)}")
    val worst = outdeg.values.max
    assert(worst <= 29, s"out-degree $worst exceeds the √m bound")
  }

  test("orientation preserves every edge exactly once") {
    val ori = Graph.orient(pairs)
    assert(ori.count() == pairs.count())
    val back = ori.select(least(col("u"), col("v")).as("a"),
      greatest(col("u"), col("v")).as("b"))
    assert(back.except(pairs).count() == 0 && pairs.except(back).count() == 0)
  }

  test("wedge+close counts the clique's triangles exactly") {
    val ori = Graph.orient(pairs)
    val wedges = ori.select(col("u"), col("v").as("v1"))
      .join(ori.select(col("u"), col("v").as("v2")), "u")
      .filter(col("v1") < col("v2"))
    val tri = wedges.join(pairs,
      col("a") === least(col("v1"), col("v2")) &&
        col("b") === greatest(col("v1"), col("v2")))
    // C(30,3) from the clique, zero from the star
    assert(tri.count() == 4060L)
  }
}
