package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Algebra gate for [[KmvAgg]] (q152): the sketch must be a
  * commutative, associative, duplicate-folding bounded set — the
  * properties that make partial aggregation CORRECT, not just fast —
  * and its estimator must sit inside the 1/√k error class. */
class KmvAggSpec extends AnyFunSuite {

  private val K = 16
  private val agg = new KmvAgg(K)
  private val P = 1000000007L
  private def hash(x: Long): Long = ((x % P) * 2654435761L) % P

  private def fold(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps the k smallest DISTINCT values, sorted") {
    val xs = Seq(9L, 3L, 9L, 7L, 3L, 1L, 100L, 50L, 1L)
    assert(fold(xs).toSeq == Seq(1L, 3L, 7L, 9L, 50L, 100L))
    val big = (1L to 100L).map(hash)
    val sk = fold(big)
    assert(sk.length == K)
    assert(sk.toSeq == big.distinct.sorted.take(K))
  }

  test("order-insensitive: any permutation folds to the same sketch") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(300)(hash(rnd.nextLong(1000)))
    val base = fold(xs).toSeq
    (1 to 20).foreach { i =>
      assert(fold(new scala.util.Random(i).shuffle(xs)).toSeq == base, s"perm $i")
    }
  }

  test("merge is bottom-k of the union and agrees with any partition split") {
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(500)(hash(rnd.nextLong(5000)))
    val whole = fold(xs).toSeq
    (1 to 20).foreach { i =>
      val cut = 1 + new scala.util.Random(i).nextInt(xs.length - 1)
      val (a, b) = xs.splitAt(cut)
      assert(agg.merge(fold(a), fold(b)).toSeq == whole, s"split at $cut")
      assert(agg.merge(fold(b), fold(a)).toSeq == whole, s"swapped split at $cut")
    }
    // three-way associativity
    val (p, rest) = xs.splitAt(100); val (q, r) = rest.splitAt(200)
    val l = agg.merge(agg.merge(fold(p), fold(q)), fold(r)).toSeq
    val rr = agg.merge(fold(p), agg.merge(fold(q), fold(r))).toSeq
    assert(l == rr && l == whole)
  }

  test("merge folds duplicates across partials") {
    val a = fold(Seq(1L, 2L, 3L))
    val b = fold(Seq(2L, 3L, 4L))
    assert(agg.merge(a, b).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("under-filled sketch IS the exact distinct set") {
    val xs = Seq(5L, 5L, 2L, 9L, 2L)
    assert(fold(xs).toSeq == Seq(2L, 5L, 9L))
  }

  test("estimator lands within the 1/sqrt(k) class on 10k distinct values") {
    val k = 256
    val big = new KmvAgg(k)
    val sk = (1L to 10000L).map(hash).foldLeft(big.zero)(big.reduce)
    assert(sk.length == k)
    val est = (k - 1).toLong * P / sk(k - 1)
    val err = math.abs(est - 10000L) / 10000.0
    assert(err <= 0.20, s"estimate $est (err $err) outside the envelope")
  }
}
