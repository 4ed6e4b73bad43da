package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q227's [[TextMining.phraseSearch]] on adversarial fixtures
  * (overlapping instances, duplicate-term phrases, boundary
  * positions), plus q226's oracle identity: every [[TextMining
  * .Blocklist]] pattern is border-free, so DuckDB's replace-length
  * (non-overlapping) count equals the automaton's all-occurrence
  * count — pinned here against the kernel on random vocab texts. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def toksDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))

  private def run(rows: Seq[(Long, String)], phrase: Seq[String]) =
    TextMining.phraseSearch(toksDf(rows), phrase).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("overlapping instances each count; first_pos is 1-based") {
    val got = run(Seq(
      1L -> "a b a b a",   // anchors 0 and 2 overlap
      2L -> "x a b a",     // match at token 2
      3L -> "a b x a b"),  // no "a b a"
      Seq("a", "b", "a"))
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("duplicate-term phrase") {
    val got = run(Seq(1L -> "a a a", 2L -> "a x a"), Seq("a", "a"))
    assert(got == Seq((1L, 2L, 1L)))
  }

  test("single-term phrase counts occurrences") {
    val got = run(Seq(1L -> "q w q", 2L -> "w w"), Seq("q"))
    assert(got == Seq((1L, 2L, 1L)))
  }

  test("blocklist patterns are border-free (q226 oracle precondition)") {
    TextMining.Blocklist.foreach { p =>
      (1 until p.length).foreach { k =>
        assert(p.take(k) != p.takeRight(k),
          s"'$p' has border of length $k — replace-count oracle invalid")
      }
    }
  }

  test("border-free ⇒ replace-count equals automaton all-occurrence count") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("slow", "table", "window", "hash", "join", "merge",
      "batch", "agg", "scan", "leak", "spark", "row")
    val texts = Seq.fill(100)(
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val got = texts.toDF("t")
      .select(graft.plans.AhoCorasick.counts(col("t"), TextMining.Blocklist).as("c"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    texts.zip(got).foreach { case (t, cs) =>
      TextMining.Blocklist.zip(cs).foreach { case (p, c) =>
        val nonOverlap = (t.length - t.replace(p, "").length) / p.length
        assert(c == nonOverlap, s"'$p' on '$t'")
      }
    }
  }
}
