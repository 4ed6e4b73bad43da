package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fail-loud gate for the ragged-embedding guard (ADVICE r15):
  * [[LlmVector.embDim]] probes the dimensionality from ONE arbitrary
  * row, and `element_at` past a shorter array returns NULL which
  * sum() silently skips — so a ragged corpus fed to the centroid
  * family would produce WRONG centroids with no error. [[LlmVector
  * .guardDim]] must raise on the first disagreeing row instead. */
class RaggedEmbeddingSpec extends SparkSpec {

  private val q157 = graft.SparkEntry.all.find(_.name == "q157_embed_outliers").get

  private def stage(ragged: Boolean): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ragged").toString
    val rows = Seq(
      (1L, Seq(0.1f, 0.2f, 0.3f), 0),
      (2L, if (ragged) Seq(0.4f, 0.5f) else Seq(0.4f, 0.5f, 0.6f), 0),
      (3L, Seq(0.7f, 0.8f, 0.9f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a ragged embedding column fails loudly, never a silent wrong centroid") {
    val e = intercept[Throwable] {
      q157.run(spark, stage(ragged = true)).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("ragged embedding")), chain(e).mkString(" | "))
  }

  test("a uniform embedding column passes the guard unchanged") {
    val rows = q157.run(spark, stage(ragged = false)).collect()
    assert(rows.nonEmpty)
    // every (label, rank) present; distances are exact int64
    assert(rows.forall(_.getLong(3) >= 0L))
  }

  test("guardDim is a per-row predicate, not an extra scan") {
    import spark.implicits._
    val ok = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .filter(LlmVector.guardDim(2)).count()
    assert(ok == 1L)
  }
}
