package graft.llm

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property: the distributed min-label-propagation
  * [[Dedup.components]] equals a plain union-find on arbitrary random
  * pair graphs — including disconnected nodes, self-loops, duplicate
  * and reversed edges, chains, and multi-component mixes that the
  * fixture corpora never produce. (scalatestplus isn't on the offline
  * classpath; properties run through scalacheck's own Test runner.
  * Few cases, each a real multi-round Spark job.) */
class DedupProps extends SparkSpec {

  private def referenceComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("components == union-find on random graphs (chains, dups, self-loops, multi-component)") {
    import spark.implicits._
    val genEdges = for {
      n <- Gen.choose(0, 30)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L)
      } yield (a, b))
    } yield edges
    val prop = Prop.forAll(genEdges) { edges =>
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.components(pairs, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == referenceComponents(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.toString)
  }

  test("a long chain (diameter >> cluster-ish graphs) still converges to one component") {
    import spark.implicits._
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = Dedup.components(chain.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 19L).map(_ -> 0L).toMap)
  }
}
