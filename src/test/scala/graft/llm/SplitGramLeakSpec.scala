package graft.llm

import graft.SparkSpec

/** Gate for q194's cross-split n-gram leakage census: shared-gram
  * counts, occurrence masses, and leak shares must match a Scala
  * brute force (split by the deterministic hash, word trigrams as
  * strings — collision-free at fixture scale, so string grams and the
  * 32-bit hash identity agree) on a corpus engineered to leak a
  * phrase across every split; plus mass laws on the fixture. */
class SplitGramLeakSpec extends SparkSpec {

  private val q194 = graft.SparkEntry.all.find(_.name == "q194_split_gram_leak").get

  private def splitOf(id: Long): String = {
    val h = (id % 1000000007L) * 2654435761L % 1000L
    if (h < 800) "train" else if (h < 900) "val" else "test"
  }

  private def brute(rows: Seq[(Long, String)]): Seq[(String, String, Long, Long, Long, Long)] = {
    val grams = rows.flatMap { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      ws.sliding(3).filter(_.length == 3).map(g => (splitOf(id), g.mkString(" ")))
    }
    val gs = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case ((sp, g), c) => (g, sp, c) }.toSeq
    val tot = gs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairs = for {
      (g, sa, ca) <- gs; (g2, sb, cb) <- gs
      if g2 == g && sa < sb
    } yield (sa, sb, ca, cb)
    pairs.groupBy(p => (p._1, p._2)).toSeq.sortBy(_._1).map { case ((sa, sb), ps) =>
      (sa, sb, ps.size.toLong, ps.map(_._3).sum, ps.map(_._4).sum,
        1000L * ps.size / tot(sb))
    }
  }

  test("matches the brute force on an engineered three-way leak") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gramleak").toString
    val leak = "alpha beta gamma delta" // 2 trigrams, planted everywhere
    // ids 0..39 spread across splits by the hash; the plant set is
    // chosen to land in train (0, 2), val (5, 9), and test (17, 21)
    val plant = Set(0L, 2L, 5L, 9L, 17L, 21L)
    val rows = (0L until 40L).map { id =>
      val t = if (plant(id)) s"$leak tail$id" else s"u$id v$id w$id x$id y$id"
      (id, t)
    }
    // ensure the plant reaches all three splits
    assert(plant.map(splitOf).size == 3)
    rows.map { case (id, t) => (id, t, "en", s"s${id % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q194.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == brute(rows), s"got ${out.toSeq}\nexpected ${brute(rows)}")
  }

  test("fixture: leakage is nonzero, masses bound shared counts") {
    val dir = "/root/testdata/sf0.001"
    val out = q194.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty, "the fixture corpus must leak some trigram")
    out.foreach { case (sa, sb, sh, oa, ob, lm) =>
      assert(sa < sb)
      assert(oa >= sh && ob >= sh) // each shared gram occurs >= once per side
      assert(lm >= 0 && lm <= 1000)
    }
  }
}
