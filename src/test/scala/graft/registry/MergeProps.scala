package graft.registry

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.collection.mutable.ArrayBuffer

/** ScalaCheck properties of the merge semantics (SURVEY §5.2.2).
  * (scalatestplus isn't on the offline classpath; properties run
  * through scalacheck's own Test runner.) */
class MergeProps extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: $res")
  }

  // ---- first-non-blank fold: the min-of-(seq,value)-struct formulation
  // used in TrialMerge must be insensitive to record arrival order.
  private def firstNonBlank(recs: Seq[(Long, Option[String])]): Option[String] =
    recs.filter(_._2.isDefined).sortBy(_._1).headOption.flatMap(_._2)

  test("first-non-blank is arrival-order independent given distinct seqs") {
    val gen = for {
      n <- Gen.choose(0, 8)
      vals <- Gen.listOfN(n, Gen.option(Gen.alphaStr.suchThat(_.nonEmpty)))
      seed <- Gen.long
    } yield (vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }, seed)
    check("first-non-blank", Prop.forAll(gen) { case (recs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(recs)
      firstNonBlank(shuffled) == firstNonBlank(recs)
    })
  }

  // ---- yes-over-no is a commutative, associative max.
  test("yes-over-no flag merge is arrival-order independent") {
    val rank = Map("yes" -> 2, "no" -> 1)
    def merge(vs: Seq[String]): Int = vs.flatMap(rank.get).foldLeft(0)(math.max)
    val gen = for {
      vs <- Gen.listOf(Gen.oneOf("yes", "no", "junk", ""))
      seed <- Gen.long
    } yield (vs, seed)
    check("yes-over-no", Prop.forAll(gen) { case (vs, seed) =>
      merge(vs) == merge(vs.reverse) &&
        merge(vs) == merge(new scala.util.Random(seed).shuffle(vs))
    })
  }

  // ---- IMP consolidation properties that hold regardless of the
  // reference's order-dependent tie-breaks.
  private val entryGen: Gen[Array[String]] = for {
    t <- Gen.oneOf("", "a", "ab", "abc", "b")
    p <- Gen.oneOf("", "p", "pq", "q")
    c <- Gen.oneOf("", "c1", "c2")
  } yield Array(t, p, c)

  test("consolidation shrinks, preserves provenance, and leaves disjoint inputs alone") {
    // NOTE: survivor count is NOT bounded by static connected components
    // in either direction — the reference's shorter-name rule can discard
    // a bridge value before it links a later entry (under-merge), and
    // blank-fill can link entries that shared no field (over-merge). Both
    // are pinned reference behavior (scan.py:148-188); the invariants
    // below are the ones that genuinely hold.
    check("imp-shape", Prop.forAll(Gen.listOfN(6, entryGen)) { es =>
      val entries = es.filter(_.exists(_.nonEmpty))
      val out = ImpDedup.consolidate(ArrayBuffer.from(entries.map(_.clone())))
      val n = entries.size
      val anyMatch = (0 until n).exists(i => (i + 1 until n).exists(j =>
        (0 to 2).exists(k => entries(i)(k).nonEmpty && entries(i)(k) == entries(j)(k))))
      val inputVals = entries.flatten.toSet
      out.size <= entries.size &&
        (anyMatch || out.size == entries.size) && // no match -> no merge
        out.flatten.forall(v => v.isEmpty || inputVals(v))
    })
  }

  test("consolidation of an all-identical list yields one unchanged survivor") {
    val gen = for {
      e <- entryGen.suchThat(_.exists(_.nonEmpty))
      k <- Gen.choose(1, 5)
    } yield (e, k)
    check("imp-identical", Prop.forAll(gen) { case (e, k) =>
      val out = ImpDedup.consolidate(ArrayBuffer.fill(k)(e.clone()))
      out.size == 1 && out.head.sameElements(e)
    })
  }
}
