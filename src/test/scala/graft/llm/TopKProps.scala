package graft.llm

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the q67 heavy-hitter pipeline.
  *
  * The pipeline's exactness rests on the Misra–Gries guarantee: a
  * capacity-c pass keeps every item with frequency > n/(c+1). The
  * fixture (40-word vocabulary under capacity 64) never exercises
  * eviction at all, so the guarantee is pinned here on adversarial
  * random streams with tiny capacities where eviction churns. */
class TopKProps extends SparkSpec {

  private def runProp(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("Misra-Gries keeps every item with freq > n/(cap+1) (adversarial streams, cap 1-8)") {
    val gen = for {
      cap <- Gen.choose(1, 8)
      n <- Gen.choose(0, 400)
      // small alphabet + geometric-ish skew so heavy items exist
      stream <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        3 -> Gen.oneOf("a", "b", "c"), 5 -> Gen.choose(0, 50).map("t" + _)))
    } yield (cap, stream)
    runProp(Prop.forAll(gen) { case (cap, stream) =>
      val kept = MisraGries.summarize(stream.iterator, cap).toSet
      val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val threshold = stream.size.toDouble / (cap + 1)
      counts.forall { case (w, c) => c <= threshold || kept(w) }
    })
  }

  test("per-partition candidates + exact recount == exact top-k (eviction active)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = for {
      n <- Gen.choose(50, 300)
      words <- Gen.listOfN(n, Gen.frequency(
        10 -> Gen.const("hot"), 6 -> Gen.const("warm"), 4 -> Gen.const("mild"),
        6 -> Gen.choose(0, 25).map("t" + _)))
    } yield words
    runProp(Prop.forAll(gen) { rand =>
      // cap 12 over a <=29-word alphabet: evictions happen, yet every
      // word with freq > n_p/(cap+1) per partition survives, so the
      // recount is exact for the top-3. The deterministic head keeps
      // hot/warm/mild above the n/(cap+1) threshold with wide margin
      // for every generated n (no tail-luck flakes).
      val cap = 12
      val words = List.fill(30)("hot") ++ List.fill(18)("warm") ++
        List.fill(12)("mild") ++ rand
      val toks = words.toDF("w").repartition(4)
      val cands = toks.as[String].mapPartitions(MisraGries.summarize(_, cap))
        .toDF("w").distinct()
      val got = toks.join(broadcast(cands), "w")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toList
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toList
        .sortBy { case (w, c) => (-c, w) }.take(3)
      got == exact
    })
  }

  test("capacity >= distinct alphabet: summarize is lossless") {
    val stream = Seq("a", "b", "a", "c", "a", "b")
    assert(MisraGries.summarize(stream.iterator, 8).toSet == Set("a", "b", "c"))
    assert(MisraGries.summarize(Iterator.empty, 4).isEmpty)
  }
}
