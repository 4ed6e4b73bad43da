package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q218's BPE merge training against a DIRECT token-list reference
  * implementation (explicit Vector[String] merging, no string
  * framing): the ·-framed replace device must equal canonical
  * left-to-right non-overlapping merge application on adversarial
  * words — consecutive repeats (llll), merges that create new
  * adjacencies, and multi-char merge chains — and the argmax
  * tie-break must be (count DESC, lhs, rhs). */
class BpeMergeSpec extends SparkSpec {

  // ---- reference: canonical word-level BPE over token vectors ----
  private def mergeWord(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2 // left-to-right, non-overlapping
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(words: Seq[(String, Long)], g: Int): Seq[(Int, String, String, Long)] = {
    var ws = words.map { case (w, n) => (w.map(_.toString).toVector, n) }
    (1 to g).flatMap { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      ws.foreach { case (toks, n) =>
        toks.sliding(2).foreach {
          case Seq(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + n
          case _ => ()
        }
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        ws = ws.map { case (toks, n) => (mergeWord(toks, a, b), n) }
        Some((step, a, b, cnt))
      }
    }
  }

  /** Drive the ENGINE's framing device (the exact q218 per-step ops)
    * on an explicit word table. */
  private def engineBpe(words: Seq[(String, Long)], g: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    var cur = words.toDF("w", "n")
      .select(col("n"), regexp_replace(col("w"), "(.)", "·$1·").as("tok"))
    (1 to g).map { step =>
      val best = cur
        .select(col("n"),
          split(regexp_replace(col("tok"), "^·|·$", ""), "··").as("sp"))
        .filter(size(col("sp")) >= 2)
        .select(col("n"), explode(expr(
          """transform(sequence(1, size(sp) - 1), i ->
            |  struct(element_at(sp, i) AS a, element_at(sp, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()(0)
      val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      cur = cur.select(col("n"),
        expr(s"replace(tok, '·${a}··${b}·', '·${a}${b}·')").as("tok"))
      (step, a, b, cnt)
    }
  }

  test("framing device == canonical token-list BPE on adversarial words") {
    // llll: consecutive repeats (must merge to (ll)(ll), not (ll)l l);
    // abab: the merged 'ab' creates an (ab, ab) adjacency next step;
    // banana: overlapping (an, an); weights force deterministic order
    val words = Seq(
      ("llll", 10L), ("lll", 7L), ("abab", 9L), ("banana", 8L),
      ("aaaa", 6L), ("abba", 5L), ("ba", 4L))
    val g = 6
    assert(engineBpe(words, g) == refBpe(words, g))
  }

  test("consecutive-run merge is non-overlapping: ll ll, not ll l + stale count") {
    // one word 'llll' x1: step 1 pair (l,l) count 3 (three adjacencies),
    // merge -> (ll)(ll); step 2 pair (ll,ll) count 1
    val out = engineBpe(Seq(("llll", 1L)), 2)
    assert(out == Seq((1, "l", "l", 3L), (2, "ll", "ll", 1L)), out.toString)
  }

  test("tie-break is lexicographic on (lhs, rhs) at equal counts") {
    val out = engineBpe(Seq(("zy", 3L), ("ab", 3L)), 1)
    assert(out.head._2 == "a" && out.head._3 == "b")
  }

  test("fixture run: merges compound (a later step reuses an earlier merged token)") {
    val q218 = graft.SparkEntry.all.find(_.name == "q218_bpe_merges").get
    val rows = q218.run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.length == TextMining.BpeSteps)
    assert(rows.map(_._1).toSeq == (1 to TextMining.BpeSteps))
    // counts are non-increasing in a merge sequence? NOT guaranteed in
    // general BPE (a merge can create a pair hotter than the next raw
    // pair) — assert only positivity + the vocabulary-driven shape
    assert(rows.forall(_._4 > 0))
    graft.Caches.releaseAll(spark)
  }

  test("fertility census obeys the counting laws and the merge direction") {
    val q219 = graft.SparkEntry.all.find(_.name == "q219_bpe_fertility").get
    val rows = q219.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nt, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // every word is >= 1 token; tokens never exceed chars (merges
      // only ever SHRINK the initial char tokenization)
      assert(nw <= nt && nt <= nc, s"token law broken: $r")
      assert(r.getLong(4) == 1000L * nt / nw, s"tpw law broken: $r")
      assert(r.getLong(5) == 1000L * nt / nc, s"tpc law broken: $r")
    }
    graft.Caches.releaseAll(spark)
  }
}
