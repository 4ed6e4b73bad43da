package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AhoCorasick]] against a brute-force all-occurrence counter:
  * the automaton must count EVERY match — overlapping occurrences of
  * self-overlapping patterns, nested patterns (one pattern inside
  * another's match), matches abutting non-ASCII chars — through the
  * codegen path (DataFrame select), on adversarial and random texts. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong

  private val pats = Seq("a", "aa", "ab", "aba", "ba", "table", "window table", "zz")

  private def viaDf(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(AhoCorasick.counts(col("t"), pats).as("c"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq

  test("adversarial texts: overlaps, nesting, boundaries, non-ASCII") {
    val texts = Seq(
      "aaaa",                       // "a"=4, "aa"=3 (overlapping)
      "ababa",                      // "aba"=2 (overlapping via border)
      "window table table",         // "table" nested in "window table" + standalone
      "tablé table",                // é resets the automaton mid-candidate
      "ab", "a", "", "ba ab aba",
      "window tablewindow table")   // match ending at last char
    val got = viaDf(texts)
    texts.zip(got).foreach { case (t, cs) =>
      pats.zip(cs).foreach { case (p, c) =>
        assert(c == brute(t, p), s"pattern '$p' on '$t'")
      }
    }
  }

  test("random texts equal brute force") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab tlewindo"
    val texts = Seq.fill(200)(
      (0 until rnd.nextInt(60)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val got = viaDf(texts)
    texts.zip(got).foreach { case (t, cs) =>
      pats.zip(cs).foreach { case (p, c) =>
        assert(c == brute(t, p), s"pattern '$p' on '$t'")
      }
    }
  }

  test("null input propagates null; interpreted eval matches codegen") {
    val r = Seq((1, Option.empty[String]), (2, Some("aa")))
      .toDF("id", "t")
      .select(col("id"), AhoCorasick.counts(col("t"), pats).as("c"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1))
    assert(r(1).getSeq[Long](1) == Seq(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
    // interpreted path (nullSafeEval) directly
    val e = MultiPatternCounts(
      org.apache.spark.sql.catalyst.expressions.Literal("aaa"), Seq("aa"))
    assert(e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(2L))
  }

  test("constructor rejects empty and non-ASCII patterns") {
    intercept[IllegalArgumentException](new AhoCorasick.Automaton(Seq("")))
    intercept[IllegalArgumentException](new AhoCorasick.Automaton(Seq("café")))
    intercept[IllegalArgumentException](new AhoCorasick.Automaton(Nil))
  }

  test("random pattern SETS equal brute force (automaton build property)") {
    // the fixed-pattern tests pin one automaton; this drives the BUILD
    // itself — random sets over a tiny alphabet maximize shared
    // prefixes, fail-link chains and nested outputs
    val rnd = new scala.util.Random(1234)
    def word(n: Int) = (0 until n).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
    (1 to 60).foreach { _ =>
      val ps = (0 until 2 + rnd.nextInt(6)).map(_ => word(1 + rnd.nextInt(4))).distinct
      val auto = new AhoCorasick.Automaton(ps)
      (1 to 20).foreach { _ =>
        val t = word(rnd.nextInt(30))
        val got = auto.count(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)).toLongArray().toSeq
        ps.zip(got).foreach { case (p, c) =>
          assert(c == brute(t, p), s"set $ps pattern '$p' on '$t'")
        }
      }
    }
  }
}
