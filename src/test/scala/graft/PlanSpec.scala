package graft

/** Physical-plan regression pins: the properties that make these plans
  * scale-correct must stay visible in explain output — losing one is a
  * silent 100× regression at the target scale, invisible at sf0.001. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q2: filter and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "filter pushdown lost")
    assert(!p.contains("l_comment"), "column pruning lost: scan reads unused columns")
  }

  test("q3: small dims broadcast; aggregation has a map-side partial phase") {
    val p = plan("q3_join_inner_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, "broadcast joins lost")
    assert(p.contains("partial_count"), "partial aggregation lost")
  }

  test("q4: fact side is pre-aggregated BEFORE the customer join") {
    val p = plan("q4_join_left")
    assert(p.contains("partial_count(o_orderkey"), "orders no longer pre-aggregated")
  }

  test("q5: semi-join chain plans as LeftSemi hash joins") {
    assert("LeftSemi".r.findAllIn(plan("q5_join_semi_chain")).size >= 2)
  }

  test("q10: top-k plans TakeOrderedAndProject, not a full sort") {
    assert(plan("q10_sort_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("q41 LSH: no cartesian/nested-loop join anywhere in the plan") {
    val p = plan("q41_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "LSH degenerated to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "LSH degenerated to nested loop")
  }

  test("q44 IVF: bucket assignment is a map-only projection — zero exchanges scan→bucket") {
    // the r4 formulation (crossJoin(pivots) + row_number window) shuffled
    // nlist× the corpus here; the NearestPivots expression must keep the
    // whole assignment inside one stage (mirror of the q41 no-cartesian pin)
    val p = llm.LlmVector.assignBuckets(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bucket assignment shuffles:\n$p")
    assert(!p.contains("Join"), s"bucket assignment joins:\n$p")
  }

  test("LSH signatures: zero exchanges from documents scan to band keys (map-only kernels)") {
    // rounds 3-5 computed signatures relationally (dictionary join +
    // explode + 64 min-aggregates): three shuffles before the first
    // band key existed. The TextKernels composition must keep the
    // whole sketch inside the scan stage — at 100 TB the ONLY shuffle
    // in candidate generation is the bucket join itself.
    import org.apache.spark.sql.functions._
    import graft.plans.TextKernels
    val p = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(TextKernels.minhashBands(
        TextKernels.shingleSet(TextKernels.tokenHashes(lower(col("text")))))))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"signature pipeline shuffles:\n$p")
    assert(!p.contains("Join"), s"signature pipeline joins:\n$p")
  }

  test("registry merge: exactly one exchange keyed by eudract_id for the trial fold") {
    // TrialMerge.merge directly: Registry.load memoizes + persists, which
    // would show an InMemoryTableScan instead of the raw plan
    val p = registry.TrialMerge
      .merge(spark, registry.SyntheticCorpus.ensure())
      .drop("imps", "sponsors", "locations")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(eudract_id".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 eudract_id exchange, got $exchanges:\n$p")
  }
}
