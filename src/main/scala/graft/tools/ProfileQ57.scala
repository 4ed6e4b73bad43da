package graft.tools
import org.apache.spark.sql.SparkSession
import graft.llm.{LlmText, Dedup}
object ProfileQ57 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val m = classOf[LlmText.type].getDeclaredMethods.find(_.getName == "lshPairs").get
    m.setAccessible(true)
    val pairs = time("lshPairs build")(m.invoke(LlmText, spark, dir)).asInstanceOf[org.apache.spark.sql.DataFrame]
    println("[prof] pairs rows: " + pairs.count())
    val comps = time("components")(Dedup.components(pairs, "doc_a", "doc_b"))
    time("collect")(comps.count())
    val again = time("components 2nd")(Dedup.components(pairs, "doc_a", "doc_b"))
    time("collect 2nd")(again.count())
    spark.stop()
  }
}
