package graft.registry

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Ingest robustness: the shapes a real multi-GB registry dump throws
  * at the record splitter. */
class CorpusSpec extends SparkSpec {

  private def write(name: String, text: String): String = {
    val p = Paths.get(s"/tmp/graft/corpus_spec_$name.txt")
    Files.createDirectories(p.getParent)
    Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("CRLF line endings and tab/multi-space runs normalize away") {
    val path = write("crlf",
      "### PAGE 1 ####\r\n" +
        "EudraCT Number:   2007-000007-77\r\n" +
        "Trial Status: \t Ongoing\r\n" +
        "A.3 Full title of the trial:  Tabbed \t Title  Here\r\n")
    val t = TrialMerge.merge(spark, path)
    val r = t.select("eudract_id", "overall_status", "official_title").head()
    assert(r.getString(0) == "2007-000007-77")
    assert(r.getString(1) == "ongoing")
    assert(r.getString(2) == "Tabbed Title Here")
  }

  test("page delimiter mid-record does not split the record") {
    val path = write("pagebreak",
      "EudraCT Number: 2008-000008-88\n" +
        "Trial Status: Ongoing\n" +
        "### PAGE 2 ####\n" +
        "F.4.2.2 In the whole clinical trial: 77\n")
    val t = TrialMerge.merge(spark, path)
    assert(t.count() == 1)
    assert(t.select("enrollment").head().getString(0) == "77")
  }

  test("preamble before the first record is dropped; empty corpus yields zero trials") {
    val some = write("preamble", "garbage preamble\nmore garbage\n" +
      "EudraCT Number: 2009-000009-99\nTrial Status: Completed\n")
    assert(TrialMerge.merge(spark, some).count() == 1)
    val empty = write("empty", "no records at all\njust text\n")
    assert(TrialMerge.merge(spark, empty).count() == 0)
  }

  test("multi-file corpus: lexical file order beats byte offset for first-non-blank") {
    // file 1 (lexically first) has a LARGER offset for its record than
    // file 2's record; first-non-blank must still take file 1's value.
    val dir = Paths.get("/tmp/graft/corpus_spec_multifile")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    Files.createDirectories(dir)
    Files.write(dir.resolve("page-001.txt"),
      (("x" * 5000) + "\nEudraCT Number: 2011-000011-11\nTrial Status: Ongoing\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("page-002.txt"),
      "EudraCT Number: 2011-000011-11\nTrial Status: Completed\n"
        .getBytes(StandardCharsets.UTF_8))
    val t = TrialMerge.merge(spark, dir.toString + "/*")
    assert(t.count() == 1)
    assert(t.select("overall_status").head().getString(0) == "ongoing")
  }

  test("field-shaped lines inside an EEA location block are locations, not fields (scan.py:381-397)") {
    // the reference's block loop consumes lines blindly; ExtractRecord
    // reproduces that — the 'Trial Status' line inside the block must
    // become a LOCATION and must NOT override the real status
    val path = write("blockshield",
      "EudraCT Number: 2012-000012-12\n" +
        "E.8.6.3 If E.8.6.1 or E.8.6.2 are Yes, specify the regions\n" +
        "Trial Status: Bogus\n" +
        "E.8.7 Trial has a data monitoring committee: No\n" +
        "Trial Status: Ongoing\n")
    val t = Registry.load(spark, path)
    assert(t.trials.select("overall_status").head().getString(0) == "ongoing")
    val locs = t.location.collect().map(_.getString(1)).toSet
    assert(locs == Set("Trial Status: Bogus"))
  }

  test("record_seq packing: file rank and offset compose in order; a >1 TiB offset fails loudly") {
    // ordering invariant: any (rank, offset) pair within bounds packs
    // strictly monotonically — file order dominates, offset breaks ties
    assert(Corpus.packSeq(0, 0) == 0L)
    assert(Corpus.packSeq(0, 5000) == 5000L)
    assert(Corpus.packSeq(3, 7) == (3L << Corpus.OffsetBits | 7))
    assert(Corpus.packSeq(1, 0) > Corpus.packSeq(0, (1L << Corpus.OffsetBits) - 1))
    // a single landing file beyond the 1 TiB offset space must throw,
    // not silently corrupt merge order (round-2 verdict #10)
    intercept[IllegalArgumentException](Corpus.packSeq(0, 1L << Corpus.OffsetBits))
    intercept[IllegalArgumentException](Corpus.packSeq(-1, 0))
    intercept[IllegalArgumentException](Corpus.packSeq(1L << 23, 0))
  }

  test("mid-line 'EudraCT Number:' text DOES split (byte-delimiter semantics, documented)") {
    // The Hadoop record delimiter is a byte sequence, not line-anchored:
    // a title containing the literal marker splits the record. Real
    // dumps never contain it mid-line; pinned so the tradeoff is visible.
    val path = write("midline",
      "EudraCT Number: 2010-000010-10\n" +
        "A.3 Full title of the trial: about EudraCT Number: things\n")
    val ids = Corpus.records(spark, path).select("eudract_id")
      .collect().map(_.getString(0)).toSeq
    assert(ids.length == 2) // split mid-title: divergence from line-based reference
  }
}
