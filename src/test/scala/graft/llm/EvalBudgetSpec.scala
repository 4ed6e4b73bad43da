package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property q164 exists for: the largest-remainder apportionment
  * sums EXACTLY to the budget, for any source-size distribution —
  * naive per-source rounding does not. Also pins proportionality
  * (quota ≤ alloc ≤ quota+1) and the deterministic tie-break. */
class EvalBudgetSpec extends SparkSpec {

  private val q164 = graft.SparkEntry.all.find(_.name == "q164_eval_budget").get

  private def stage(sizes: Seq[(String, Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("budget").toString
    sizes.flatMap { case (src, k) => (0 until k).map(j => (src, j)) }
      .zipWithIndex
      .map { case ((src, _), id) => (id.toLong, src, "t") }
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", lit(1L))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("allocations sum EXACTLY to the 1000 budget across adversarial skews") {
    val skews = Seq(
      Seq(("a", 1), ("b", 1), ("c", 1)),                     // tiny, all ties
      Seq(("a", 999), ("b", 1)),                             // extreme skew
      (0 until 7).map(i => (s"s$i", 3)),                     // equal, budget not divisible
      (0 until 13).map(i => (s"s$i", 1 + i * i)),            // quadratic spread
      Seq(("x", 100), ("y", 101), ("z", 102)))               // near-equal remainders
    skews.foreach { sizes =>
      val rows = q164.run(spark, stage(sizes)).collect()
      assert(rows.map(_.getLong(4)).sum == 1000L,
        s"largest-remainder invariant broken for $sizes: ${rows.toSeq}")
      rows.foreach { r =>
        assert(r.getLong(3) == 0L || r.getLong(3) == 1L)
        assert(r.getLong(4) == r.getLong(2) + r.getLong(3),
          s"alloc != quota + extra: $r")
      }
    }
  }

  test("equal sources with an indivisible budget split the leftovers by source name") {
    // 3 equal sources, budget 1000: quotas 333 each, leftover 1 goes to
    // the lexicographically FIRST source (all remainders tie)
    val rows = q164.run(spark, stage(Seq(("a", 5), ("b", 5), ("c", 5)))).collect()
    val byName = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byName == Map("a" -> 334L, "b" -> 333L, "c" -> 333L), s"$byName")
  }
}
