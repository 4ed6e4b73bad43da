package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q183's cluster-cohesion audit: exact clones verify every
  * in-cluster pair directly (density exactly 1000, Jaccard exactly
  * 1000), the fixture respects the structural bounds, and the edge
  * population reconciles with q41's verified pair listing (every
  * verified pair lives in exactly one cluster). */
class ClusterCohesionSpec extends SparkSpec {

  private val q183 = graft.SparkEntry.all.find(_.name == "q183_cluster_cohesion").get
  private val q41 = graft.SparkEntry.all.find(_.name == "q41_dedup_minhash_lsh").get

  test("clone-only corpus: full density, Jaccard 1000") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cohesion").toString
    val ta = (1 to 12).map(i => s"w$i").mkString(" ")
    val tb = (1 to 9).map(i => s"v$i").mkString(" ")
    // one 3-cluster and one 2-cluster of exact clones
    (Seq((1L, ta), (2L, ta), (3L, ta), (10L, tb), (11L, tb)))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q183.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // csize 2: 1 cluster, 1 closure pair, 1 edge, density 1000
    assert(out(2L) == ((1L, 1L, 1L, 1000L, 1000L, 1000L)), out(2L).toString)
    // csize 3: 1 cluster, 3 closure pairs, 3 edges (all verified)
    assert(out(3L) == ((1L, 3L, 3L, 1000L, 1000L, 1000L)), out(3L).toString)
    graft.llm.LlmText.release(spark)
  }

  test("fixture: bounds hold, edges reconcile with q41") {
    val dir = "/root/testdata/sf0.001"
    val out = q183.run(spark, dir).collect()
    val nPairs = q41.run(spark, dir).count()
    out.foreach { r =>
      val (csize, nClusters, closure, edges, density, minJm, meanJm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))
      assert(csize >= 2L && nClusters >= 1L)
      assert(closure == nClusters * csize * (csize - 1) / 2)
      // the closure is CONNECTED over edges: at least a spanning tree
      assert(edges >= nClusters * (csize - 1) && edges <= closure)
      assert(density >= 1L && density <= 1000L)
      // verified pairs sit at Jaccard >= 0.5 by construction
      assert(minJm >= 500L && minJm <= meanJm && meanJm <= 1000L)
    }
    assert(out.map(_.getLong(3)).sum == nPairs,
      "every verified pair must land in exactly one cluster")
    graft.llm.LlmText.release(spark)
  }
}
