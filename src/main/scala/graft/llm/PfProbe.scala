package graft.llm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object PfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1's union-preserves-partitioning feature zips co-partitioned
      // union children; a memoized frame whose AQE-materialized partition
      // count diverges from its claimed partitioning crashes the zip
      // (q233 hot at clone10) -- keep the sound concatenating Union
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val dsh = LlmText.tokenHashArr(spark, dir) // warm docs
    t("docShingles build+count") { LlmText.docShingles(spark, dir).count() }
    val d = LlmText.docShingles(spark, dir)
    println("docs=" + d.count() + " shingle rows=" + d.select(explode(col("sh"))).count())
    val classes = d.groupBy(sort_array(col("sh")).as("shs"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .withColumn("cid", element_at(col("ids"), 1)).persist()
    t("class build") { classes.count() }
    val ex = classes.select(col("cid"), size(col("shs")).as("n"), explode(col("shs")).as("sh")).persist()
    t("explode") { ex.count() }
    val dfc = ex.groupBy("sh").agg(count(lit(1)).as("dfc")).filter(col("dfc") >= 2).persist()
    t("dfc build") { dfc.count() }
    val wd = Window.partitionBy("cid")
    val pre = ex.join(dfc, "sh")
      .select(col("cid"), col("sh"), col("n"),
        row_number().over(wd.orderBy(col("dfc"), col("sh"))).as("rn"),
        count(lit(1)).over(wd).as("r2"))
      .filter(expr("rn + (n - r2) <= n div 2 + 1"))
      .select("cid", "sh").persist()
    t("df join + rank window") { println("prefix rows=" + pre.count()) }
    val cand = pre.as("x").join(pre.as("y"),
        col("x.sh") === col("y.sh") && col("x.cid") < col("y.cid"))
      .select(col("x.cid").as("cid_a"), col("y.cid").as("cid_b")).distinct().persist()
    t("candidate self-join") { println("cand pairs=" + cand.count()) }
    val a = classes.select(col("cid").as("cid_a"), col("shs").as("sh_a"), col("ids").as("ids_a"))
    val b = classes.select(col("cid").as("cid_b"), col("shs").as("sh_b"), col("ids").as("ids_b"))
    t("verify+expand") {
      cand.join(a, "cid_a").join(b, "cid_b")
        .select(size(array_intersect(col("sh_a"), col("sh_b"))).as("i")).agg(sum("i")).collect()
    }
    spark.stop()
  }
}
