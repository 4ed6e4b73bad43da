package graft.llm

import graft.SparkSpec

/** Gate for q211's code-switching purity census: every source row must
  * match a Scala brute force that independently re-derives the 32-token
  * chunking, the q45 profile votes and tie order, and the plurality
  * arithmetic — on a hand corpus with a pure doc, an exactly half-mixed
  * doc, an undetermined doc (must drop), and a boilerplate-wrapped doc;
  * the fixture run must satisfy the purity laws. */
class CodeSwitchSpec extends SparkSpec {

  private val q211 = graft.SparkEntry.all.find(_.name == "q211_code_switching").get

  private val profiles = Seq(
    "en" -> Set("the", "a", "of", "and", "in"),
    "de" -> Set("der", "die", "und", "das", "ist"),
    "es" -> Set("el", "la", "y", "los", "que"),
    "fr" -> Set("le", "les", "et", "des", "un"))

  private def brute(rows: Seq[(String, String)]): Seq[(String, Long, Long, Long, Long)] = {
    val perDoc = rows.flatMap { case (src, t) =>
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) None else {
        val votes = toks.grouped(32).toSeq.flatMap { ck =>
          val scores = profiles.map { case (l, ws) => l -> ck.count(ws).toLong }
          if (scores.map(_._2).sum == 0) None
          else Some(scores.maxBy(s => (s._2, -profiles.indexWhere(_._1 == s._1)))._1)
        }
        if (votes.isEmpty) None
        else {
          val byLang = votes.groupBy(identity).view.mapValues(_.size.toLong)
          Some((src, votes.size.toLong, byLang.values.max))
        }
      }
    }
    perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.size.toLong
      val mixed = ds.count { case (_, v, m) => m < v }.toLong
      val sp = ds.map { case (_, v, m) => 1000L * m / v }.sum
      (src, n, mixed, 1000L * mixed / n, sp / n)
    }
  }

  private def run(rows: Seq[(String, String)]): Seq[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csw").toString
    rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    q211.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
  }

  test("matches the brute force: pure, half-mixed, undetermined, wrapped") {
    def block(seed: String, marker: String, n: Int) =
      (0 until n).map(i => if (i % 4 == 0) marker else s"${seed}_$i").mkString(" ")
    val rows = Seq(
      ("web", block("e", "the", 64)),                       // pure en, 2 chunks
      ("web", block("e", "the", 32) + " " + block("g", "der", 32)), // 1 en + 1 de
      ("web", "zz qq xx"),                                  // undetermined: drops
      ("wiki", block("g", "und", 96)),                      // pure de, 3 chunks
      ("wiki", block("f", "les", 32) + " " + block("e", "of", 64))) // 1 fr + 2 en
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    val m = got.map(r => r._1 -> r).toMap
    assert(m("web") == ("web", 2L, 1L, 500L, 750L))   // the half-mixed doc
    assert(m("wiki")._3 == 1L)                        // the wrapped doc is mixed
  }

  test("fixture: purity laws hold per source") {
    val out = q211.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mixed, mm, mp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mixed <= n && mm == 1000L * mixed / n)
      assert(mp >= 250 && mp <= 1000) // plurality of 4 langs is >= 1/4
    }
  }
}
