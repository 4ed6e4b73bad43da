package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q197's trimmed robust length profile: the histogram-
  * arithmetic trimmed mean must equal the direct sort-and-slice
  * computation — on a hand corpus with planted outliers AND on the
  * fixture corpus (the counting-sort decomposition vs the definition,
  * differentially). */
class TrimmedLengthSpec extends SparkSpec {

  private val q197 = graft.SparkEntry.all.find(_.name == "q197_trimmed_length").get

  /** The definition: sort, drop k = n/10 from each end, exact milli. */
  private def direct(lens: Seq[Long]): (Long, Long, Long, Long) = {
    val n = lens.size.toLong
    val k = n / 10
    val sorted = lens.sorted
    val kept = sorted.slice(k.toInt, (n - k).toInt)
    (n, k, 1000L * lens.sum / n,
      if (n - 2 * k == 0) -1L else 1000L * kept.sum / (n - 2 * k))
  }

  private def check(dir: String): Unit = {
    val lens = graft.core.T.df(spark, dir, "documents")
      .select(col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val out = q197.run(spark, dir).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out.keySet == lens.keySet)
    out.foreach { case (src, got) =>
      assert(got == direct(lens(src)), s"$src: got $got expected ${direct(lens(src))}")
    }
    TextMining.release(spark)
  }

  test("planted outliers: trimmed mean ignores them, plain mean does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trimmed").toString
    // s1: 18 body docs of ~10 tokens + 2 giant outliers -> k=2 trims both
    val rows = (1L to 18L).map(i => (i, Seq.fill(10)("w").mkString(" "), "s1")) ++
      Seq((19L, Seq.fill(5000)("w").mkString(" "), "s1"),
        (20L, Seq.fill(7000)("w").mkString(" "), "s1")) ++
      // s2: 5 docs, k=0 -> trimmed == mean
      (21L to 25L).map(i => (i, Seq.fill(i.toInt)("w").mkString(" "), "s2"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    check(dir)
    // and the headline claim: the outlier gap is visible
    val out = q197.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out("s1")._1 > 10 * out("s1")._2, s"outliers did not move the mean: $out")
    assert(out("s2")._1 == out("s2")._2, "k=0 source must have trimmed == mean")
    TextMining.release(spark)
  }

  test("fixture: histogram arithmetic equals the sort-and-slice definition") {
    check("/root/testdata/sf0.001")
  }
}
