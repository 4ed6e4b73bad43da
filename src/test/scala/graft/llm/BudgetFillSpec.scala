package graft.llm

import graft.SparkSpec

/** Differential spec for q177's epoch-capped water-fill: the query's
  * sorted-prefix saturation scan must agree with an INDEPENDENT BigInt
  * rational fixpoint (iteratively saturate any source whose water
  * share exceeds its cap, recompute the level, repeat) on every
  * corpus shape — plus the exactness invariants the operator exists
  * for (Σ alloc = B exactly; alloc ≤ cap; epochs ≤ the 1.6 cap).
  */
class BudgetFillSpec extends SparkSpec {

  /** Independent brute force: same integer contract as q177
    * (w = floor(sqrt(n)·1e6), cap = (8n) div 5, B = (3Σn) div 2,
    * Hamilton remainders), but the saturated set is found by
    * FIXPOINT iteration, not the query's one-pass sorted prefix. */
  private def brute(sizes: Seq[(String, Long)]): Map[String, (Long, Long, Boolean)] = {
    val n = sizes.toMap.view.mapValues(BigInt(_)).toMap
    val w = n.view.mapValues(v => BigInt(math.floor(math.sqrt(v.toDouble) * 1e6).toLong)).toMap
    val cap = n.view.mapValues(v => (v * 8) / 5).toMap
    val b = (n.values.sum * 3) / 2
    var sat = Set.empty[String]
    val weighted = sizes.map(_._1).filter(s => w(s) > 0).toSet
    var changed = true
    while (changed) {
      changed = false
      val num = b - sat.toSeq.map(cap).sum
      val den = (weighted -- sat).toSeq.map(w).sum
      (weighted -- sat).foreach { s =>
        if (den > 0 && w(s) * num > cap(s) * den) { sat += s; changed = true }
      }
    }
    val num = b - sat.toSeq.map(cap).sum
    val den = (weighted -- sat).toSeq.map(w).sum
    val floors = sizes.map { case (s, _) =>
      s -> (if (sat(s)) cap(s)
            else if (w(s) == 0 || den == 0) BigInt(0)
            else w(s) * num / den)
    }.toMap
    val leftover = (b - floors.values.sum).toLong
    val extras = sizes.map(_._1)
      .filterNot(sat)
      .map(s => s -> (if (w(s) == 0 || den == 0) BigInt(0) else w(s) * num % den))
      .sortBy { case (s, r) => (-r, s) }
      .take(math.max(leftover, 0L).toInt).map(_._1).toSet
    sizes.map { case (s, _) =>
      s -> ((floors(s) + (if (extras(s)) 1 else 0)).toLong, cap(s).toLong, sat(s))
    }.toMap
  }

  private def run(sizes: Seq[(String, Long)]) = {
    import spark.implicits._
    TextMining.budgetFill(sizes.toDF("source", "n")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(2), r.getLong(5) == 1L)).toMap
  }

  private val shapes = Seq(
    "spread with saturating tail" ->
      Seq(("a", 10000L), ("b", 300L), ("c", 250L), ("d", 9000L), ("e", 40L)),
    "uniform (nothing saturates)" ->
      (0 until 6).map(i => (s"s$i", 500L)),
    "zero-token source fenced out" ->
      Seq(("a", 800L), ("z", 0L), ("b", 1200L)),
    "single source" -> Seq(("only", 777L)),
    "extreme skew (tiny ones saturate)" ->
      (Seq(("g", 1000000L)) ++ (0 until 8).map(i => (s"t$i", 10L + i))),
    "near-equal remainders (Hamilton ties)" ->
      Seq(("x", 100L), ("y", 101L), ("z", 102L), ("w", 103L)))

  test("water-fill agrees with the BigInt rational fixpoint on every shape") {
    shapes.foreach { case (label, sizes) =>
      assert(run(sizes) == brute(sizes), s"shape: $label")
    }
  }

  test("allocation invariants: exact budget sum, cap respected, epochs bounded") {
    shapes.foreach { case (label, sizes) =>
      import spark.implicits._
      val rows = TextMining.budgetFill(sizes.toDF("source", "n")).collect()
      val b = (sizes.map(_._2).map(BigInt(_)).sum * 3) / 2
      assert(BigInt(rows.map(_.getLong(3)).sum) == b, s"Σalloc != B for $label")
      rows.foreach { r =>
        assert(r.getLong(3) <= r.getLong(2), s"alloc > cap for $label: $r")
        if (!r.isNullAt(4))
          assert(r.getLong(4) <= 1600L, s"epochs above the 1.6 cap for $label: $r")
      }
    }
  }
}
