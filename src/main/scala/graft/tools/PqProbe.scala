package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures q105's PQ shortlist+re-rank recall@10 per query against
  * the exact brute baseline at a given fixture scale — the numbers
  * [[graft.llm.LlmVector.PqRecallBound]] was calibrated from (the
  * bound must sit under the measured floor across BOTH gate scales,
  * with the sf0.1 corpus being 4× the shortlist's training scale).
  *
  * Usage: `runMain graft.tools.PqProbe [sfDir]`
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false") // see Bench.scala
      .getOrCreate()
    try {
      val brute = graft.llm.LlmVector.qs.find(_.name == "q43_ann_cosine_topk").get
        .run(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val pq = graft.llm.LlmVector.pqTopk(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      pq.toSeq.sortBy(_._1).foreach { case (q, n) =>
        println(f"query $q%d recall@10 = ${(n & brute(q)).size / 10.0}%.2f")
      }
      val mean = pq.map { case (q, n) => (n & brute(q)).size / 10.0 }.sum / pq.size
      println(f"mean recall@10 = $mean%.3f over ${pq.size} queries ($sfDir)")
    } finally spark.stop()
  }
}
