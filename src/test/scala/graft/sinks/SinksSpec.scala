package graft.sinks

import graft.SparkSpec
import graft.registry.{Registry, Search, SyntheticCorpus}

class SinksSpec extends SparkSpec {

  test("csvSingle export writes one part file with header (S8, toexcel.py role)") {
    val t = Registry.load(spark, SyntheticCorpus.ensure())
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/export"
    Sinks.csvSingle(Search.export(t, Search.Query(), Seq("official_title")), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "eudract_id,official_title,imp_entry,location_entry,sponsor_entry")
    assert(lines.length == 4) // header + 3 trials
  }

  test("parquet sink round-trips with partitioning (S6)") {
    val t = Registry.load(spark, SyntheticCorpus.ensure())
    val out = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/loc"
    Sinks.parquet(t.location, out, partitionBy = Seq("eudract_id"))
    val back = spark.read.parquet(out)
    assert(back.count() == t.location.count())
  }
}
