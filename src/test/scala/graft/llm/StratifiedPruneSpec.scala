package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q68's map-side candidate prune must be row-identical (rk values
  * included) to the plain per-stratum window on every frame shape:
  * the real fixtures, a single dominant stratum spread across many
  * partitions, strata smaller than k, and an empty frame. */
class StratifiedPruneSpec extends SparkSpec {

  private def plain(base: org.apache.spark.sql.DataFrame, k: Int) =
    base
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))))
      .filter(col("rk") <= k)
      .select("lang", "rk", "doc_id", "hk", "in_10pct")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSet

  private def check(base: org.apache.spark.sql.DataFrame, k: Int): Unit =
    assert(rows(LlmText.stratifiedTopK(base, k)) == rows(plain(base, k)),
      s"prune diverged from the plain window at k=$k")

  private def fixture(sf: String) = {
    val hk = LlmText.lehmer3(col("doc_id"))
    spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), hk.as("hk"))
      .withColumn("in_10pct", col("hk") % 100 < 10)
  }

  test("fixtures at both gate scales") {
    check(fixture("0.001"), 5)
    check(fixture("0.01"), 5)
  }

  test("one dominant stratum across many partitions; strata smaller than k") {
    import spark.implicits._
    val dominant = (0L until 5000L).map(i => (i, "en", (i * 7919) % 104729, i % 10 == 0))
    val tiny = Seq((9001L, "mt", 5L, false), (9002L, "mt", 3L, true))
    val base = (dominant ++ tiny).toDF("doc_id", "lang", "hk", "in_10pct")
      .repartition(13)
    check(base, 5)   // "mt" has 2 rows < k: all kept, rk dense from 1
    check(base, 1)
  }

  test("empty frame") {
    import spark.implicits._
    check(Seq.empty[(Long, String, Long, Boolean)]
      .toDF("doc_id", "lang", "hk", "in_10pct"), 5)
  }
}
