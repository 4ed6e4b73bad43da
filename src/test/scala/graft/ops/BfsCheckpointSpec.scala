package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Durability gate for the BFS lineage cut (ADVICE r15): bfsHops
  * truncates lineage every few rounds — with localCheckpoint that
  * stores NON-replicated executor-local blocks, so on a real cluster
  * an executor loss after truncation would make the traversal
  * unrecoverable instead of recomputable. When the session has a
  * reliable checkpoint dir configured, bfsHops must use it; the
  * dir-less local fallback stays localCheckpoint. Both arms must
  * produce identical hop labels. */
class BfsCheckpointSpec extends SparkSpec {

  private def chain(n: Int) = {
    import spark.implicits._
    (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
  }
  private def src0 = {
    import spark.implicits._
    Seq(0L).toDF("node")
  }

  test("local fallback (no checkpoint dir) cuts lineage and labels correctly") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "another suite set a checkpoint dir first; the reliable arm covers this run")
    val out = Graph.bfsHops(chain(9), src0, rounds = 8, ckptEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0L to 8L).map(i => i -> i).toMap, out.toString)
  }

  test("a configured reliable checkpoint dir is used for the lineage cut") {
    val ckpt = java.nio.file.Files.createTempDirectory("bfs_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val out = Graph.bfsHops(chain(9), src0, rounds = 8, ckptEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0L to 8L).map(i => i -> i).toMap, out.toString)
    // the reliable dir actually received checkpoint data (the
    // durability property localCheckpoint cannot give a cluster)
    def treeSize(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally s.close()
    }
    assert(treeSize(ckpt) > 0, "no files under the reliable checkpoint dir")
  }
}
