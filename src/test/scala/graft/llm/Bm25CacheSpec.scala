package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bm25Pre memoization contract: the cached posting
  * projection is filtered to the CALLER's term set, so the cache key
  * must include the terms — two callers with different query terms on
  * the same (session, dir) must each read postings matched to their
  * own terms, never the other caller's. (Before r11 the key was
  * (session, dir) only: the second term set silently reused the
  * first's filtered postings and produced wrong BM25 scores.) */
class Bm25CacheSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("two term sets on the same dir get their own posting projections") {
    // Pick two disjoint high-frequency term sets straight off the corpus.
    val top = LlmText.docs(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 4)
      .groupBy("w").count().orderBy(col("count").desc, col("w"))
      .limit(4).collect().map(_.getString(0)).toSeq
    val tA = top.take(2)
    val tB = top.drop(2)
    assert(tA.intersect(tB).isEmpty && tA.size == 2 && tB.size == 2)

    def matched(terms: Seq[String]): Set[String] =
      LlmText.bm25Pre(spark, dir, terms)
        .select(explode(col("mt")).as("w")).distinct()
        .collect().map(_.getString(0)).toSet

    val mA = matched(tA)
    val mB = matched(tB) // second caller, same (session, dir), new terms
    assert(mA.nonEmpty && mA.subsetOf(tA.toSet),
      s"set A postings contain foreign terms: $mA vs $tA")
    assert(mB.nonEmpty && mB.subsetOf(tB.toSet),
      s"set B postings reused/contaminated: $mB vs $tB")
    // term order must not fragment the cache: reversed set A hits the
    // same memoized frame (same result, no recompute of a third frame)
    assert(matched(tA.reverse) == mA)
    LlmText.release(spark)
  }
}
