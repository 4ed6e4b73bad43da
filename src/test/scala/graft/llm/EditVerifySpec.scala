package graft.llm

import graft.SparkSpec

/** Gate for q203's edit-distance verification: the emitted pair set
  * must reconcile exactly with q66's candidate set, and every lev /
  * sim_milli must match a classic DP Levenshtein over the 200-char
  * ASCII projection — on a hand corpus engineered to pin the
  * projection (a non-ASCII char that must be stripped on BOTH
  * engines), the prefix cap, and the both-empty NULL case. */
class EditVerifySpec extends SparkSpec {

  private val q203 = graft.SparkEntry.all.find(_.name == "q203_edit_verify").get
  private val q66 = graft.SparkEntry.all.find(_.name == "q66_dedup_simhash_ham").get

  private def proj(t: String): String =
    t.replaceAll("[^\\x00-\\x7F]", "").take(200)

  private def lev(a: String, b: String): Long = {
    val d = Array.tabulate(a.length + 1)(i => i.toLong)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j.toLong
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def check(dir: String, texts: Map[Long, String]): Unit = {
    val pairs = q66.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = q203.run(spark, dir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == pairs,
      "q203 must verify exactly q66's candidate set")
    out.foreach { r =>
      val (a, b) = (proj(texts(r.getLong(0))), proj(texts(r.getLong(1))))
      val l = lev(a, b)
      val ml = math.max(a.length, b.length).toLong
      assert(r.getLong(3) == l, s"lev(${r.getLong(0)},${r.getLong(1)})")
      if (ml == 0) assert(r.isNullAt(4))
      else assert(r.getLong(4) == 1000L * (ml - l) / ml)
    }
    LlmText.release(spark)
  }

  test("hand corpus: strip pin, cap pin, exact clone, both-empty NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("editv").toString
    // 40 distinct tokens x10 keeps every simhash bit's acc far from 0,
    // so the single-token edits below stay hamming<=2 candidates
    val base = (0 until 40).flatMap(i => Seq.fill(10)(s"tok$i")).mkString(" ")
    val texts = Map[Long, String](
      1L -> base,
      2L -> base,                  // exact clone: lev 0, sim 1000
      3L -> ("é " + base),    // leading é must strip on BOTH engines -> lev 1
      4L -> "é é é",  // all non-ASCII: empty projection
      5L -> "é é é") // ... both-empty pair -> sim NULL
    texts.toSeq.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    check(dir, texts)
    // and the engineered rows really were candidates (the test has teeth)
    val got = q203.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)))
    assert(got.contains((1L, 3L)) || got.contains((2L, 3L)))
    LlmText.release(spark)
  }

  test("fixture: reconciles with q66 and the DP brute force") {
    val dir = "/root/testdata/sf0.001"
    val texts = graft.core.T.df(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    check(dir, texts)
  }
}
