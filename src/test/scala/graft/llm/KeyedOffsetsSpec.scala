package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q97's keyed distributed prefix-sum must equal the plain per-key
  * window (`sum OVER (PARTITION BY key ORDER BY doc_id)` + group
  * total) on frames the fixture can't produce: one giant key among
  * tiny ones (the few-huge-sources corpus shape), sparse ids with
  * empty range buckets, zero-weight docs, single-row keys, empty
  * frames, and bucket counts that don't divide the id range. */
class KeyedOffsetsSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cumw", sum("wt").over(
        Window.partitionBy("k").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("W", sum("wt").over(Window.partitionBy("k")))

  private def asMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap

  private def check(rows: Seq[(String, Long, Long)], buckets: Seq[Int]): Unit = {
    import spark.implicits._
    val df = rows.toDF("k", "doc_id", "wt").repartition(3)
    val expect = asMap(naive(df).select("k", "doc_id", "wt", "cumw", "W").collect())
    for (nb <- buckets) {
      val got = asMap(LlmText.keyedOffsets(df, "k", "wt", nb)
        .select("k", "doc_id", "wt", "cumw", "W").collect())
      assert(got == expect, s"keyed offsets diverge at nBuckets=$nb")
    }
  }

  test("one giant key among tiny ones — the few-huge-sources shape") {
    val giant = (0L until 200L).map(i => ("huge", i * 3, i % 11))
    val small = Seq(("a", 5L, 7L), ("a", 600L, 2L), ("b", 17L, 0L))
    check(giant ++ small, Seq(1, 2, 7, 32, 512))
  }

  test("sparse ids, zero-weight docs, non-dividing bucket widths") {
    check(Seq(("x", 0L, 5L), ("x", 1L, 0L), ("y", 7L, 3L),
        ("x", 100L, 12L), ("y", 101L, 1L), ("x", 999L, 7L)),
      Seq(1, 2, 3, 7, 32, 1000))
  }

  test("single-row keys and empty frame") {
    check(Seq(("solo", 42L, 9L)), Seq(1, 8))
    check(Seq.empty, Seq(1, 4))
  }
}
