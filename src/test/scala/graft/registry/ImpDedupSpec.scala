package graft.registry

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Unit semantics of the IMP union-find consolidation
  * (reference scan.py:135-188). */
class ImpDedupSpec extends AnyFunSuite {

  private def run(entries: (String, String, String)*): Seq[(String, String, String)] =
    ImpDedup.consolidate(ArrayBuffer.from(entries.map(e => Array(e._1, e._2, e._3))))
      .map(a => (a(0), a(1), a(2))).toSeq

  test("empty and singleton lists pass through") {
    assert(run() == Seq.empty)
    assert(run(("a", "b", "c")) == Seq(("a", "b", "c")))
  }

  test("no shared non-empty field -> no merge; empty==empty is not a match") {
    assert(run(("a", "", ""), ("", "b", ""), ("", "", "c")).size == 3)
  }

  test("match on any one field merges; shorter non-empty trade/product win") {
    // product matches; trade takes the shorter; code blank-filled
    assert(run(("alphamab forte", "alphamab", "ab-1"), ("alphamab", "alphamab", "")) ==
      Seq(("alphamab", "alphamab", "ab-1")))
  }

  test("transitive chain A~B via trade, B~C via code -> single survivor") {
    assert(run(("gammax", "gammaxol", ""), ("gammax", "", "gx-7"), ("", "", "gx-7")) ==
      Seq(("gammax", "gammaxol", "gx-7")))
  }

  test("blank-fill only fills blanks, never overwrites non-empty code") {
    assert(run(("t", "p", "c1"), ("t", "", "c2")) == Seq(("t", "p", "c1")))
  }

  test("swap-delete keeps scanning the moved entry (reference scan.py:181-182)") {
    // B merges into A; D (moved into B's slot) must still be examined.
    assert(run(("a", "", ""), ("a", "p", ""), ("z", "", ""), ("a", "", "k")) ==
      Seq(("a", "p", "k"), ("z", "", "")))
  }

  test("survivor order is first-occurrence order") {
    assert(run(("x", "", ""), ("y", "", ""), ("x", "p", "")) ==
      Seq(("x", "p", ""), ("y", "", "")))
  }
}
