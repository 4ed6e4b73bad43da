package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q170's packing-efficiency table: hand doc
  * lengths where chunk counts and both waste columns are computable
  * by eye, including the doc-longer-than-context split case and the
  * concat lower bound. */
class PackingEffSpec extends SparkSpec {

  private val q170 = graft.SparkEntry.all.find(_.name == "q170_packing_efficiency").get

  test("chunk counts and waste exact, incl. docs longer than the context") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("packeff").toString
    // token counts: 600 (splits at cap 512), 100, 300 -> T = 1000
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val rows = Seq((1L, doc(600), "s"), (2L, doc(100), "s"), (3L, doc(300), "s"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q170.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // cap 512: chunks = 2+1+1 = 4, pad = (1024-600)+(512-100)+(512-300) = 1048
    //          milli = 1000*1048/(4*512) = 511; concat: 2*512-1000 = 24
    assert(out(512L) == ((1000L, 4L, 1048L, 511L, 24L)), out.toString)
    // cap 1024: chunks 3, pad = (1024-600)+(1024-100)+(1024-300) = 2072
    //           milli = 1000*2072/3072 = 674; concat 1024-1000 = 24
    assert(out(1024L) == ((1000L, 3L, 2072L, 674L, 24L)), out.toString)
    // cap 4096: chunks 3, pad = 3*4096-1000 = 11288; concat 4096-1000 = 3096
    assert(out(4096L) == ((1000L, 3L, 11288L, (1000L * 11288) / (3 * 4096), 3096L)), out.toString)
  }
}
