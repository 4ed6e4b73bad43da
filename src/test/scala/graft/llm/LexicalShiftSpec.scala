package graft.llm

import graft.SparkSpec

/** Differential spec for q179's target-domain lexical scorer: the
  * one-persist Spark pipeline must agree with a BigInt brute force on
  * a hand corpus, and the score must order documents by target
  * affinity — the property a selection step exists for.
  */
class LexicalShiftSpec extends SparkSpec {

  // target (en) speaks foo/bar, the rest speaks qux/zap; doc 5 is a
  // declared-de document written in target vocabulary (should score
  // positive), doc 6 the reverse
  private val corpus = Seq(
    (1L, "foo bar foo foo", "en", "a"),
    (2L, "bar foo bar common", "en", "a"),
    (3L, "qux zap qux common", "de", "b"),
    (4L, "zap qux zap zap", "de", "b"),
    (5L, "foo bar foo bar", "de", "b"),
    (6L, "qux zap qux zap", "en", "a"))

  private def brute: Map[Long, Long] = {
    val toks = corpus.map { case (id, t, l, _) => (id, t.split(" ").toSeq, l) }
    val tgt = toks.filter(_._3 == "en").flatMap(_._2)
    val all = toks.flatMap(_._2)
    def f(ws: Seq[String], w: String): BigInt =
      BigInt(1000000) * ws.count(_ == w) / ws.size
    toks.map { case (id, ws, _) =>
      val sd = ws.map(w => f(tgt, w) - f(all, w)).sum
      id -> (sd / ws.size).toLong
    }.toMap
  }

  test("scorer agrees with the BigInt brute force per document") {
    import spark.implicits._
    val got = TextMining.lexicalShift(
      corpus.toDF("doc_id", "text", "lang", "source"), "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == brute, s"got $got expected $brute")
  }

  test("target-vocabulary documents outscore off-target ones regardless of label") {
    import spark.implicits._
    val got = TextMining.lexicalShift(
      corpus.toDF("doc_id", "text", "lang", "source"), "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(5L) > 0, s"target-vocab doc 5 should score positive: $got")
    assert(got(6L) < 0, s"off-target doc 6 should score negative: $got")
    assert(got(1L) > got(3L))
  }
}
