package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q234/q235's byte-level BPE (round 19): the hex-framed byte device
  * must equal canonical byte-token BPE — including REAL multibyte
  * UTF-8 splits, where word-level framing cannot even represent the
  * seed — and the trained surface must satisfy the byte-fallback
  * laws: no OOV (every word of the stream tokenizes) and
  * n_words ≤ n_tokens ≤ n_bytes. */
class ByteBpeSpec extends SparkSpec {

  // ---- reference: canonical BPE over UTF-8 byte tokens (hex) ----
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

  private def hexBytes(w: String): Vector[String] =
    w.getBytes("UTF-8").toVector.map(b => "%02X".format(b & 0xff))

  private def refByteBpe(words: Seq[(String, Long)], g: Int): Seq[(Int, String, String, Long)] = {
    var ws = words.map { case (w, n) => (hexBytes(w), n) }
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

  /** The ENGINE's byte framing device (the exact q234 per-step ops)
    * on an explicit word table. */
  private def engineByteBpe(words: Seq[(String, Long)], g: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    var cur = words.toDF("w", "n")
      .select(col("n"),
        regexp_replace(hex(encode(col("w"), "UTF-8")), "(..)", "·$1·").as("tok"))
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

  test("hex framing device == canonical byte BPE, multibyte words included") {
    // café/naïve: 2-byte UTF-8 chars whose bytes must seed separately;
    // 日本: 3-byte chars; '99'-style digits and punctuation — exactly
    // the inputs q218's ^[a-z]+$ screen had to EXCLUDE
    val words = Seq(
      ("café", 10L), ("cafés", 7L), ("naïve", 6L), ("日本", 5L),
      ("c3a9", 4L), ("a-b", 3L), ("x", 2L), ("caf", 8L))
    val g = 6
    assert(engineByteBpe(words, g) == refByteBpe(words, g))
  }

  test("a multibyte-heavy corpus merges the C3+A9 pair — bytes, not chars") {
    val words = Seq(("café", 50L), ("cb", 1L))
    val m = engineByteBpe(words, 1)
    assert(m == refByteBpe(words, 1))
    // é = C3 A9 in UTF-8: the top merge must be that byte pair (all
    // adjacent pairs in 'café' tie at 50; (61,66) < (63,61) < (66,C3)
    // < (C3,A9) lexicographically, so the tie-break picks 61,66 —
    // force the multibyte win with weights instead
    val heavy = Seq(("éé", 50L), ("ab", 1L))
    val hm = engineByteBpe(heavy, 1)
    assert(hm == refByteBpe(heavy, 1))
    assert(hm.head._2 == "C3" && hm.head._3 == "A9", hm.toString)
  }

  test("q236 merge REPLAY == trained state on seen words; unseen words still tokenize") {
    // the apply operator's two load-bearing laws: (a) replaying the
    // merge table over a TRAIN word must reproduce the trained state's
    // tokenization exactly (apply is stateless-correct), and (b) a
    // word the trainer never saw — unseen bytes included — still
    // yields a full tokenization whose concatenated hex decodes back
    // to the word's bytes (byte fallback, no OOV)
    val dir = "/root/testdata/sf0.001"
    val (merges, state) = TextMining.byteBpeTrainSplit(spark, dir)
    val applyExpr = merges.foldLeft(
      "regexp_replace(hex(encode(w, 'UTF-8')), '(..)', '·$1·')") {
      case (acc, (_, a, b, _)) => s"replace($acc, '·${a}··${b}·', '·${a}${b}·')"
    }
    val replayed = state.select(col("w"), col("tok").as("trained"))
      .withColumn("replayed", expr(applyExpr))
    assert(replayed.filter(col("trained") =!= col("replayed")).count() == 0,
      "merge replay diverged from the trained state")
    // unseen words: digits + multibyte bytes the split trainer never saw
    import spark.implicits._
    val unseen = Seq("zq123é", "日本x", "---").toDF("w")
      .withColumn("tok", expr(applyExpr))
      .select(col("w"),
        regexp_replace(col("tok"), "·", "").as("hexcat"),
        hex(encode(col("w"), "UTF-8")).as("hexw"))
      .collect()
    unseen.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"${r.getString(0)}: tokenization lost bytes (${r.getString(1)} vs ${r.getString(2)})")
    }
    TextMining.release(spark)
    LlmText.release(spark)
  }

  test("byte-fallback laws on the fixture: no OOV; words <= tokens <= bytes") {
    val dir = "/root/testdata/sf0.001"
    val (_, state) = TextMining.byteBpeTrain(spark, dir)
    // no OOV: the trained state covers EVERY distinct word of the
    // grafted stream, including the multibyte graft itself
    val stream = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(LlmText.tokens(concat(col("text"), lit(TextMining.ByteGraft)))).as("w"))
      .distinct()
    assert(state.select("w").distinct().count() == stream.count())
    assert(state.filter(col("w") === "café").count() == 1)
    // per-word: 1 <= tokens <= bytes
    val viol = state.select(col("w"),
        size(split(regexp_replace(col("tok"), "^·|·$", ""), "··")).as("nt"),
        octet_length(col("w")).as("nb"))
      .filter(col("nt") < 1 || col("nt") > col("nb")).count()
    assert(viol == 0)
    TextMining.release(spark)
    LlmText.release(spark)
  }
}
