package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unified deduplication surface — the generalization SURVEY §2.4 A4
  * calls for: the reference's per-trial union-find and the corpus-scale
  * near-dup paths share one shape:
  *
  *   candidates (exact key | LSH bucket | position join)
  *     → verified pairs (exact Jaccard / cosine)
  *     → [[components]] (connected components over the pair graph)
  *     → keep one representative per cluster.
  *
  * [[components]] is iterative min-label propagation: each node adopts
  * the smallest label among itself and its neighbors until fixpoint —
  * converging in O(graph diameter) rounds. Near-dup graphs are shallow
  * (clusters are cliques-ish), so 2–4 rounds suffice; at 100 TB the
  * same loop runs with the pair table persisted and the label frame
  * checkpointed per round (the large-star/small-star optimization
  * halves rounds but the plain loop is already diameter-bounded). */
object Dedup {

  /** Exact/normalized dedup: one survivor (min id) per normalized key. */
  def exact(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.select(col(idCol), key.as("key"))
      .groupBy("key")
      .agg(min(idCol).as("kept_" + idCol), count(lit(1)).as("n_copies"))

  /** Connected components over an undirected pair list: returns
    * (id, cluster_rep) for every node, rep = min id of the component.
    *
    * Lineage hygiene for the at-scale loop: EVERY round the label
    * frame's Catalyst lineage is cut by rebuilding the Dataset from
    * its materialized RDD (`createDataFrame(rdd, schema)`). persist()
    * alone truncates recompute but the LOGICAL plan still nests per
    * round and ANALYSIS cost grows ~4× a round — measured on a
    * 477-node graph: rounds of 2.3 s → 5.2 s → 26 s → 94 s, ~0.5 s
    * flat with the cut. The RDD handle is held explicitly so each
    * round's storage is unpersisted deterministically once the next
    * round materializes (localCheckpoint would store a copy the
    * Dataset API gives no handle to release). The returned frame is a
    * plain projection over the FINAL round's persisted RDD — one
    * result-sized footprint, dropped by the ContextCleaner when the
    * caller's plan releases it; `sym` and every intermediate are freed
    * before returning. */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 20): DataFrame = {
    val sym = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .persist()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist()
    // labels only ever decrease, so Σlbl is a strictly-monotone
    // convergence witness: one single-row aggregate per round instead
    // of a join-and-count against the previous frame. sum over an
    // EMPTY frame is a single null cell — a pair-free corpus is a
    // normal input and must yield an empty result, not an NPE.
    def lblSum(df: DataFrame): Option[Long] =
      Option(df.agg(sum("lbl")).head().getAs[java.lang.Long](0)).map(_.longValue)
    var prevSum = lblSum(labels)
    if (prevSum.isEmpty) {
      val empty = labels.select(col("id"), col("lbl").as("cluster_rep"))
      labels.unpersist(); sym.unpersist()
      return empty // empty graph: recomputing the 0-row plan is free
    }
    val session = pairs.sparkSession
    var prevRdd: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("lbl").as("nlbl")), "b")
        .groupBy("a").agg(min("nlbl").as("minNbr"))
      val stepped = labels
        .join(nbrMin.withColumnRenamed("a", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("minNbr"), col("lbl"))).as("lbl"))
      val cut = stepped.rdd.persist()
      val next = session.createDataFrame(cut, stepped.schema)
      val s = lblSum(next) // materializes `cut`
      converged = s == prevSum
      prevSum = s
      labels.unpersist() // round 0's Dataset cache; later rounds hold RDDs
      prevRdd.foreach(_.unpersist(blocking = false))
      prevRdd = Some(cut)
      labels = next
      iter += 1
    }
    val out = labels.select(col("id"), col("lbl").as("cluster_rep"))
    labels.unpersist()
    sym.unpersist()
    out
  }

  /** Survivors after near-dup clustering: drop every non-representative
    * member of each component. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame,
                         aCol: String, bCol: String): DataFrame = {
    val losers = components(pairs, aCol, bCol)
      .filter(col("id") =!= col("cluster_rep"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
