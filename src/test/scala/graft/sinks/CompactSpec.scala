package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sinks.compact]]: file count drops to the byte-target bound,
  * contents stay row-identical, and the directory swap is all-or-
  * nothing (old layout fully replaced, no stage/old residue). */
class CompactSpec extends SparkSpec {

  private def parquetFiles(p: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(f)).toSeq
  }

  test("many small files compact to few; rows identical; no residue") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // 64 tiny files — the post-intake sprawl shape
    (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(64).write.parquet(dir)
    assert(parquetFiles(dir).size == 64)
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val n = Sinks.compact(spark, dir, targetFileBytes = 512L * 1024)
    val files = parquetFiles(dir)
    assert(files.size == n && n < 64, s"expected $n compacted files, got ${files.size}")
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before)
    // swap hygiene: no stage/old siblings left behind
    val parent = java.nio.file.Paths.get(dir).getParent
    import scala.jdk.CollectionConverters._
    val residue = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString).filter(f => f.contains(".stage_") || f.contains(".old_"))
    assert(residue.isEmpty)
  }
}
