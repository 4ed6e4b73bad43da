package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.plans.UnigramViterbi

/** q228's unigram-LM pieces: the Viterbi kernel against exhaustive
  * segmentation enumeration (min cost, validity, tie-break), and the
  * hard-EM trainer ([[TextMining.unigramTrainWords]]) against a fully
  * hand-computed two-step fixture including the char floor. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- kernel vs exhaustive enumeration ----

  private def allSegs(w: String, vocab: Set[String], maxTok: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxTok, w.length)).flatMap { l =>
      val h = w.substring(0, l)
      if (vocab(h)) allSegs(w.substring(l), vocab, maxTok).map(h +: _) else Nil
    }

  private val costs = Map(
    "a" -> 5L, "b" -> 5L, "c" -> 9L, "ab" -> 10L, "ba" -> 7L,
    "abc" -> 30L, "bc" -> 6L, "aba" -> 11L)

  private def kernel(words: Seq[String], cs: Map[String, Long]): Seq[Seq[String]] =
    words.toDF("w")
      .select(UnigramViterbi.segment(col("w"), cs, 6).as("t"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq

  test("kernel finds a minimum-cost valid segmentation") {
    val words = Seq("a", "ab", "aba", "abab", "ababa", "abcba", "bcbc", "aabba")
    val got = kernel(words, costs)
    words.zip(got).foreach { case (w, seg) =>
      val segs = allSegs(w, costs.keySet, 6)
      assert(segs.nonEmpty, s"fixture word '$w' must be segmentable")
      assert(seg.mkString == w && seg.forall(costs.contains), s"'$w' → $seg invalid")
      assert(seg.map(costs).sum == segs.map(_.map(costs).sum).min,
        s"'$w' → $seg not minimal")
    }
  }

  test("equal-cost tie keeps the smallest backpointer (longest last token)") {
    // "ab": [ab]=10 ties [a,b]=10; smallest j at i=2 is 0 → single token
    assert(kernel(Seq("ab"), costs) == Seq(Seq("ab")))
  }

  test("unsegmentable word → empty array; null → null") {
    assert(kernel(Seq("axb"), costs) == Seq(Seq()))
    val r = Seq((1, Option.empty[String])).toDF("id", "w")
      .select(UnigramViterbi.segment(col("w"), costs, 6)).collect()
    assert(r(0).isNullAt(0))
  }

  // ---- trainer vs the hand-computed two-step fixture ----

  test("hard-EM trainer: recounts, pruning and the char floor") {
    // words: aa×4, ab×2. Seeds: a=10, aa=4, b=2, ab=2 (total 18).
    // Step 1 costs (micro-nats): a=587787, aa=1504077, b=ab=2197225.
    //   "aa"→[a,a] (1175574 < 1504077); "ab"→[ab] (2197225 < 2785012).
    //   Recount: a=8, ab=2, b floored to 1; "aa" pruned (unused).
    // Step 2 (total 11): a=318454, b=2397895, ab=1704748.
    //   "aa"→[a,a]; "ab"→[ab] → final a=8, ab=2, b=1.
    val words = Seq(("aa", 4L), ("ab", 2L)).toDF("w", "n")
    val got = TextMining.unigramTrainWords(words).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 8L, "ab" -> 2L, "b" -> 1L))
  }

  test("random cost maps: kernel segmentation is minimal and valid (property)") {
    val rnd = new scala.util.Random(99)
    def word(n: Int) = (0 until n).map(_ => "ab".charAt(rnd.nextInt(2))).mkString
    (1 to 40).foreach { _ =>
      val toks = (Seq("a", "b") ++ (0 until 4).map(_ => word(2 + rnd.nextInt(2)))).distinct
      val cs = toks.map(_ -> (1L + rnd.nextInt(1000))).toMap
      val words = (0 until 5).map(_ => word(1 + rnd.nextInt(9)))
      val got = kernel(words, cs)
      words.zip(got).foreach { case (w, seg) =>
        val best = allSegs(w, cs.keySet, 6).map(_.map(cs).sum).min
        assert(seg.mkString == w && seg.map(cs).sum == best,
          s"costs $cs word '$w' → $seg")
      }
    }
  }

  test("q229 counting laws: n_words <= n_tokens <= n_chars per source") {
    val rows = graft.SparkEntry.queries("q229_unigram_fertility")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, t, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= t && t <= c, s"laws violated: $r")
    }
  }
}
