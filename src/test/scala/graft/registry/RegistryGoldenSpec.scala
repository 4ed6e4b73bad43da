package graft.registry

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden end-to-end parse/merge tests on the synthetic corpus
  * (SURVEY §5.2.1) plus the pinned-divergence ledger (§5.2.6): each
  * deliberate difference from reference behavior is asserted so it
  * stays intentional. */
class RegistryGoldenSpec extends SparkSpec {

  private lazy val t = Registry.load(spark, SyntheticCorpus.ensure())

  test("three trials come out of five member-state records") {
    assert(t.trials.count() == 3)
  }

  test("first-non-blank merge keeps record-1 title; whitespace collapsed; case preserved") {
    val titles = t.trials.select("eudract_id", "official_title")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(titles("2004-000001-11") == "Study of Alpha Versus Placebo")
    assert(titles("2006-000003-33") == "Gamma Study of Delta")
  }

  test("status imputation: completion date + ongoing -> 'not ongoing' (scan.py:103-104)") {
    val r = t.trials.filter("eudract_id = '2004-000001-11'")
      .select("overall_status", "completion_date").head()
    assert(r == Row("not ongoing", "2010-05-01"))
  }

  test("MedDRA SOC imputation only when level='soc' and soc blank (scan.py:110-111)") {
    val socs = t.trials.select("eudract_id", "meddra_soc")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(socs("2004-000001-11") == "10038738") // imputed from classification
    assert(socs("2005-000002-22") == "10029205") // given, level=pt -> untouched
  }

  test("LEDGER §7.4.4a: yes-over-no upgrade is engine default (reference dead code keeps first 'no')") {
    val placebo = t.trials.filter("eudract_id = '2004-000001-11'").select("placebo").head().getInt(0)
    assert(placebo == 1) // record 1 said no, record 2 said yes
  }

  test("LEDGER §7.4.4a strict-parity mode: first-wins keeps the 'no' the reference's dead code keeps") {
    val parity = TrialMerge.merge(spark, SyntheticCorpus.ensure(), strictParity = true)
    val placebo = parity.filter("eudract_id = '2004-000001-11'").select("placebo").head()
    assert(placebo.getInt(0) == 0) // record 1's 'no' survives record 2's 'yes'
  }

  test("LEDGER: non-yes/no flag junk maps to null (reference stores raw string)") {
    val r = t.trials.filter("eudract_id = '2006-000003-33'").select("open_design").head()
    assert(r.isNullAt(0))
  }

  test("LEDGER §7.4.4c: sponsor-less trial exports null sponsor, not a crash (toexcel.py:157)") {
    val row = Search.export(t, Search.Query(trial = Some("eudract_id = '2005-000002-22'")), Nil).head()
    assert(row.getAs[String]("sponsor_entry") == null)
    assert(row.getAs[String]("imp_entry") == "")
  }

  test("multi-word NCA country never matches the NCA regex (SURVEY §7.4.3)") {
    val locs = t.location.filter("eudract_id = '2006-000003-33'")
      .collect().map(_.getString(1)).toSet
    assert(locs == Set("Switzerland")) // 'United Kingdom' dropped by (\S*) capture
  }

  test("LEDGER §7.4.3: default mode keeps lower/initcap; strict mode is Python casefold/title") {
    // a German-sponsor corpus: 'Straße' separates casefold (ß→ss) from
    // lower (ß kept), and O'Brien separates str.title (uppercase after
    // any un-cased char) from initcap (whitespace-split words only)
    val p = java.nio.file.Paths.get("/tmp/graft/corpus_spec_strict_strings.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      ("EudraCT Number: 2014-000014-14\n" +
        "B.1.1 Name of Sponsor: Straße O'Brien Pharma\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def sponsorName(strict: Boolean): String =
      TrialMerge.merge(spark, p.toString, strictParity = strict)
        .select(org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col("sponsors"), 1).getField("name"))
        .head().getString(0)
    // reference: capture.casefold() → "strasse o'brien pharma", then
    // .title() → "Strasse O'Brien Pharma" (scan.py:325, scan.py:248)
    assert(sponsorName(strict = true) == "Strasse O'Brien Pharma")
    // engine default: lower() keeps ß, initcap capitalizes per
    // whitespace word → pinned divergence
    assert(sponsorName(strict = false) == "Straße O'brien Pharma")
  }

  test("LEDGER §7.4.3: strict pyTitle/casefold primitives match CPython on the edge cases") {
    import graft.plans.StrictStrings._
    assert(casefold("Straße") == "strasse")
    assert(casefold("ẞ") == "ss") // capital sharp s full-folds too
    assert(pyTitle("o'brien") == "O'Brien")   // initcap: "O'brien"
    assert(pyTitle("abc1def") == "Abc1Def")   // digit is un-cased: restart
    assert(pyTitle("they're bill's") == "They'Re Bill'S") // CPython quirk, faithfully
    // accents + the ĳ digraph (validated byte-for-byte against the
    // reference's own CPython output on a Unicode corpus — BASELINE.md)
    assert(casefold("ÉCOLE D'ÉTÉ ĲSSELMEER") == "école d'été ĳsselmeer")
    assert(pyTitle("école d'été ĳsselmeer") == "École D'Été Ĳsselmeer")
  }

  test("search: expr() predicates + semi-join chain narrow correctly (toexcel.py:109-115)") {
    val ids = Search.search(t, Search.Query(
      trial = Some("overall_status = 'ongoing'"),
      imp = Some("code = 'gx-7'"))).collect().map(_.getString(0)).toSeq
    assert(ids == Seq("2006-000003-33"))
    // un-searched child tables do not narrow
    val all = Search.search(t, Search.Query()).count()
    assert(all == 3)
  }

  test("export condensed strings match toexcel.py assembly rules") {
    val row = Search.export(t, Search.Query(trial = Some("eudract_id = '2004-000001-11'")), Nil).head()
    assert(row.getAs[String]("imp_entry") == "product:alphamab; product:betazol")
    assert(row.getAs[String]("location_entry") == "France, Germany, Japan, United States")
    assert(row.getAs[String]("sponsor_entry") == "Acme Pharma")
  }
}
