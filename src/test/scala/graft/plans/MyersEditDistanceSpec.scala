package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Myers bit-parallel kernel must equal the classic DP and the
  * native `levenshtein` EVERYWHERE — q203's oracle hash rides on the
  * exact distance values. Coverage targets the algorithm's risk
  * surface: the 64/128/192-bit block boundaries, hin/hout carry
  * propagation between blocks, the garbage-bit region of the last
  * partial block, repeated-character Peq rows, and code-point (not
  * UTF-16) counting for astral-plane input. */
class MyersEditDistanceSpec extends SparkSpec {

  /** Classic O(mn) two-row reference DP over code points. */
  private def refDp(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(b.length)
  }

  test("random strings across all block-boundary lengths equal the reference DP") {
    val rnd = new scala.util.Random(20260815L)
    val alphabets = Seq("ab", "abcdefgh", "abcdefghijklmnopqrstuvwxyz0123456789 ")
    val lengths = Seq(0, 1, 2, 63, 64, 65, 127, 128, 129, 191, 192, 193, 200, 210)
    for (_ <- 1 to 80) {
      val la = lengths(rnd.nextInt(lengths.size))
      val lb = lengths(rnd.nextInt(lengths.size))
      val ab = alphabets(rnd.nextInt(alphabets.size))
      def mk(n: Int) = (0 until n).map(_ => ab(rnd.nextInt(ab.length))).mkString
      val (x, y) = (mk(la), mk(lb))
      assert(EditDistanceKernel.distance(x, y) == refDp(x, y),
        s"mismatch len=(${x.length},${y.length}) x=$x y=$y")
    }
  }

  test("near-duplicates (small edits on long strings) equal the reference DP") {
    val rnd = new scala.util.Random(7L)
    val base = (0 until 200).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (nEdits <- Seq(0, 1, 2, 5, 17)) {
      val sb = new StringBuilder(base)
      for (_ <- 0 until nEdits) {
        val p = rnd.nextInt(sb.length)
        rnd.nextInt(3) match {
          case 0 => sb.setCharAt(p, ('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.deleteCharAt(p)
          case 2 => sb.insert(p, ('a' + rnd.nextInt(26)).toChar)
        }
      }
      val y = sb.toString
      assert(EditDistanceKernel.distance(base, y) == refDp(base, y))
    }
  }

  test("unicode: BMP and astral code points count as ONE edit, like the native fn") {
    // astral (surrogate-pair) chars must not count double
    assert(EditDistanceKernel.distance("a😀b", "ab") == 1)
    assert(EditDistanceKernel.distance("日本語テキスト", "日本語テクスト") == 1)
    assert(EditDistanceKernel.distance("", "😀") == 1)
  }

  test("kernel == native levenshtein on every distinct fixture pair q203 evaluates") {
    val docs = graft.core.T.df(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"),
        substring(regexp_replace(col("text"), "[^\\x00-\\x7F]", ""), 1, 200).as("px"))
    val pairs = graft.llm.LlmText.simhashHamPairs(spark, "/root/testdata/sf0.01")
      .join(docs.select(col("doc_id").as("doc_a"), col("px").as("pa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("px").as("pb")), "doc_b")
      .select("pa", "pb").distinct()
    val diverging = pairs
      .select(EditDistanceKernel.editDistance(col("pa"), col("pb")).as("k"),
        levenshtein(col("pa"), col("pb")).as("n"))
      .filter(col("k") =!= col("n")).count()
    assert(diverging == 0, s"$diverging fixture pairs diverge from native levenshtein")
    graft.llm.LlmText.release(spark)
  }

  test("null propagation matches the native function") {
    val df = spark.sql(
      "SELECT * FROM VALUES ('abc', CAST(NULL AS STRING)), (CAST(NULL AS STRING), 'x'), ('ab', 'axb') AS t(a, b)")
    val rows = df.select(EditDistanceKernel.editDistance(col("a"), col("b")).as("k"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(rows.toSeq == Seq(null, null, 1))
  }
}
