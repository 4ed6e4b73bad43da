package graft.llm

import graft.SparkSpec

/** Gate for q189's shuffle run-length census: the per-source run
  * histogram in shard order must match a Scala brute force of the
  * q99 permutation (seeded hash, per-shard (hv, doc_id) order), and
  * the fixture run must satisfy the mass law (runs weighted by length
  * partition each source's docs). */
class ShuffleRunSpec extends SparkSpec {

  private val q189 = graft.SparkEntry.all.find(_.name == "q189_shuffle_run_census").get

  private def brute(rows: Seq[(Long, String)]): Map[(String, Long), Long] = {
    val a = TextHash.ABase
    val m = TextHash.M
    val keyed = rows.map { case (id, src) => (id, src, (id * a + 7919) % m) }
    keyed.groupBy(_._3 % 16).values.flatMap { shard =>
      val ordered = shard.sortBy(r => (r._3, r._1)).map(_._2)
      // run-length encode consecutive same-source docs
      ordered.foldLeft(List.empty[(String, Long)]) {
        case ((s, n) :: t, src) if s == src => (s, n + 1) :: t
        case (acc, src) => (src, 1L) :: acc
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case ((src, len), n) => (src, len) -> n }
  }

  test("matches the brute-force run-length encode of the q99 order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shufruns").toString
    // 60 docs over 3 sources with id-clustered blocks (the adversary
    // the shuffle must break up)
    val rows = (0L until 60L).map(id => (id, s"s${id / 20}"))
    rows.map { case (id, src) => (id, s"w$id", "en", src, 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q189.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == brute(rows), s"got $out\nexpected ${brute(rows)}")
  }

  test("fixture: length-weighted runs partition each source's docs") {
    val dir = "/root/testdata/sf0.001"
    val out = q189.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val perSource = graft.core.T.df(spark, dir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val massed = out.groupBy(_._1).view
      .mapValues(_.map(r => r._2 * r._3).sum).toMap
    assert(massed == perSource, s"got $massed\nexpected $perSource")
  }
}
