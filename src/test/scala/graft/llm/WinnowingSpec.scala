package graft.llm

import graft.SparkSpec

/** Differential + adversarial gate for [[TextMining.winnowFingerprints]]
  * (q146): the HOF-pipeline selection must equal a direct in-spec
  * reference implementation of Schleimer et al.'s winnowing (per-window
  * min hash, rightmost on ties), the ≥ K+W−1-token shared-run detection
  * guarantee must hold, and the hot-fingerprint df cap must actually
  * drop a stop-phrase fingerprint shared by more docs than the cap. */
class WinnowingSpec extends SparkSpec {

  private val W = 4

  /** Direct reference: md5-based trigram hashes, explicit window scan
    * with min-then-rightmost selection. */
  private def reference(text: String): Set[(Long, Int)] = {
    val ws = text.split(" ", -1).filter(_.nonEmpty)
    if (ws.length < W + 2) Set.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to ws.length - 3).map { i =>
        val gram = s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"
        val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(8), 16)
      }
      (0 to hs.length - W).map { s =>
        // min hash in window; rightmost position on ties
        val win = (s until s + W).map(p => (hs(p), p))
        val m = win.map(_._1).min
        val p = win.filter(_._1 == m).map(_._2).max
        (hs(p), p)
      }.toSet
    }
  }

  private def run(docsSeq: Seq[(Long, String)]): Map[Long, Set[(Long, Int)]] = {
    import spark.implicits._
    val df = docsSeq.toDF("doc_id", "text")
    TextMining.winnowFingerprints(df, W).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2).toInt)).toSet }
  }

  private val rnd = new scala.util.Random(7)
  private def randWords(n: Int): String =
    Seq.fill(n)("w" + rnd.nextInt(50)).mkString(" ")

  test("selection equals the direct winnowing reference (hash AND position)") {
    val docs = (0L until 30L).map(id => (id, randWords(8 + rnd.nextInt(60))))
    val got = run(docs)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) == reference(text), s"doc $id")
    }
  }

  test("short docs (< K+W-1 tokens) yield no fingerprints in either form") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b"), (3L, "a b c d e f"))
    val got = run(docs)
    assert(!got.contains(1L) && !got.contains(2L))
    assert(got(3L) == reference("a b c d e f") && got(3L).nonEmpty)
  }

  test("guarantee: a shared run of ≥ K+W-1 tokens yields ≥ 1 shared fingerprint hash") {
    // 50 random pairs, each sharing a planted 6..20-token run inside
    // otherwise-unrelated text — the winnowing theorem says at least
    // one window inside the run must select the same (hash, gram).
    (0 until 50).foreach { t =>
      val shared = randWords(6 + rnd.nextInt(15))
      val a = s"${randWords(10)} $shared ${randWords(10)}"
      val b = s"${randWords(10)} $shared ${randWords(10)}"
      val ha = reference(a).map(_._1)
      val hb = reference(b).map(_._1)
      assert((ha & hb).nonEmpty, s"trial $t: planted run undetected")
      // and the Spark pipeline agrees with the reference on both docs
      val got = run(Seq((1L, a), (2L, b)))
      assert(got(1L).map(_._1) == ha && got(2L).map(_._1) == hb)
    }
  }

  test("trailing/extra whitespace does not shift the tokenization (ADVICE r14)") {
    // Java split drops trailing empties, DuckDB string_split keeps
    // them; the empty-token filter makes both engines see the same
    // token sequence. The Spark pipeline on a whitespace-dirty doc
    // must equal the reference on its CLEAN form.
    val clean = randWords(20)
    val dirty = s"  ${clean.replace(" ", "  ")}   "
    val got = run(Seq((1L, dirty)))
    assert(got(1L) == reference(clean))
  }

  test("a document over the 2^20-token packed-position bound fails loudly (ADVICE r14)") {
    // h·2²⁰ + (2²⁰−1−pos) silently corrupts the extracted hash once
    // pos ≥ 2²⁰; the guard must raise, not fingerprint garbage.
    import spark.implicits._
    val over = Array.fill(1048579)("x").mkString(" ")
    val df = Seq((1L, over)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextMining.winnowFingerprints(df, W).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packed-position bound")), e.toString)
    // one token under the bound still fingerprints normally
    val ok = Array.fill(1048578)("x").mkString(" ")
    val n = TextMining.winnowFingerprints(
      Seq((1L, ok)).toDF("doc_id", "text"), W).count()
    assert(n > 0)
  }

  test("rightmost tie-break: a repeated trigram selects its LAST in-window position") {
    // every trigram identical -> every window is an all-tie; the
    // reference and the packed-key min must both pick the rightmost
    // position of each window, i.e. positions W-1, W, ..., n-3.
    val text = Seq.fill(12)("x").mkString(" ") // grams all "x x x"
    val got = run(Seq((1L, text)))(1L)
    val ref = reference(text)
    assert(got == ref)
    assert(got.map(_._2) == (W - 1 to 12 - 3).toSet)
  }

  test("df cap: boilerplate shared by > 64 docs never enumerates its pair square") {
    import spark.implicits._
    // 70 BYTE-IDENTICAL boilerplate docs: identical hash sequences
    // select identical fingerprints, so EVERY one has df = 70 > 64 and
    // the cap must drop them all — zero pairs among the 70, where the
    // uncapped join would enumerate C(70,2) = 2415 pairs (×|fp| rows
    // into the pair aggregate). Hot boilerplate carries no
    // discriminative signal; exact-dup is q38's job, and the cap is
    // what keeps a stop-phrase from exploding THIS operator at scale.
    // A planted low-df pair (distinctive 10-token run, disjoint noise
    // alphabets) must still surface — the cap prunes, it doesn't gag.
    val boiler = (0 until 40).map(j => s"b$j").mkString(" ")
    def noise(id: Long, j: Int) = (0 until 8).map(k => s"n${id}_${j}_$k").mkString(" ")
    val run10 = (0 until 10).map(j => s"r$j").mkString(" ")
    val rows =
      (0L until 70L).map(id => (id, boiler)) ++
        Seq((1000L, s"${noise(1000L, 0)} $run10 ${noise(1000L, 1)}"),
          (1001L, s"${noise(1001L, 0)} $run10 ${noise(1001L, 1)}"))
    val q = graft.SparkEntry.all.find(_.name == "q146_winnowing_overlap").get
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    val pairs = q.run(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1000L, 1001L)),
      s"expected only the planted pair, got ${pairs.mkString(",")}")
  }
}
