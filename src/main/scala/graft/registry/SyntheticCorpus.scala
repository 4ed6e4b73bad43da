package graft.registry

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Deterministic synthetic registry corpus in the exact text format the
  * reference parses (field lines matching scan.py:411-482, `D.IMP: n`
  * blocks scan.py:476, sponsor sections scan.py:470-473, NCA lines and
  * EEA location blocks scan.py:477-481, page delimiters scrape.py:66).
  * Plays the role of the reference's stripped `test2000x.txt` fixture
  * (.MISSING_LARGE_BLOBS:1).
  *
  * Exercises: multi-member-state redundancy and first-non-blank merge,
  * yes-over-no flag upgrade, status/SOC imputations, IMP fuzzy-dedup
  * transitive chain with shorter-name + blank-fill rules, sponsor
  * title-cased dedup + the no-sponsor empty row, both location paths
  * incl. the multi-word-NCA no-match trap, whitespace collapse, and
  * casefold-except-title.
  */
object SyntheticCorpus {

  val path = "/tmp/graft/registry_corpus.txt"

  val text: String =
    """### PAGE 1 ####
      |EudraCT Number: 2004-000001-11
      |Trial Status: Ongoing
      |Date on which this record was first entered in the EudraCT database: 2004-02-01
      |A.3 Full title of the trial: Study of Alpha Versus Placebo
      |A.4.1 Sponsor's protocol code number: AbC-123
      |A.5.2 US NCT (ClinicalTrials.gov registry) number: NCT00000001
      |B.1.1 Name of Sponsor: Acme Pharma
      |B.5.1 Name of organisation: Acme Pharma Trials Unit
      |B.5.2 Functional name of contact point: Clinical Ops
      |B.5.6 E-mail: Trials@Acme.example.com
      |National Competent Authority: France - ANSM
      |D.IMP: 1
      |D.2.1.1.1 Trade name: Alphamab Forte
      |D.3.1 Product name: Alphamab
      |D.3.2 Product code: AB-1
      |D.8.1 Is a Placebo used in this Trial? No
      |E.1.1 Medical condition(s) being investigated: Severe Asthma
      |E.1.2 Version: 20.0
      |E.1.2 Level: SOC
      |E.1.2 Classification code: 10038738
      |E.1.2 Term: Respiratory Disorders
      |E.7.1 Human pharmacology (Phase I): No
      |E.7.2 Therapeutic exploratory (Phase II): Yes
      |E.8.1.1 Randomised: Yes
      |E.8.1.4 Double blind: Yes
      |F.2.1 Female: Yes
      |F.2.2 Male: Yes
      |F.4.2.2 In the whole clinical trial: 120
      |EudraCT Number: 2004-000001-11
      |Trial Status: Completed
      |A.3 Full title of the trial: Studie von Alpha gegen Placebo
      |B.1.1 Name of Sponsor: Acme Pharma
      |B.5.2 Functional name of contact point: German Ops
      |National Competent Authority: Germany - BfArM
      |D.IMP: 1
      |D.2.1.1.1 Trade name: Alphamab
      |D.3.1 Product name: Alphamab
      |D.IMP: 2
      |D.3.1 Product name: Betazol
      |D.3.2 Product code: BZ-9
      |D.8.1 Is a Placebo used in this Trial? Yes
      |E.7.2 Therapeutic exploratory (Phase II): Yes
      |E.8.6.3 If E.8.6.1 or E.8.6.2 are Yes, specify the regions in which trial sites are planned
      |United States
      |Japan
      |E.8.7 Trial has a data monitoring committee: Yes
      |P. Date of the global end of the trial: 2010-05-01
      |### PAGE 2 ####
      |EudraCT Number: 2005-000002-22
      |Trial Status: Completed
      |Date on which this record was first entered in the EudraCT database: 2005-03-15
      |A.3 Full title of the trial: Beta Trial of Gamma
      |National Competent Authority: Italy - AIFA
      |E.1.1 Medical condition(s) being investigated: Migraine
      |E.1.2 Version: 19.1
      |E.1.2 Level: PT
      |E.1.2 Classification code: 10027599
      |E.1.2 Term: Migraine
      |E.1.2 System Organ Class: 10029205
      |E.7.3 Therapeutic confirmatory (Phase III): Yes
      |F.4.2.2 In the whole clinical trial: 450
      |EudraCT Number: 2006-000003-33
      |Trial Status: Ongoing
      |A.3 Full title of the trial: Gamma   Study of   Delta
      |B.1.1 Name of Sponsor: Gamma Bio
      |B.5.6 E-mail: INFO@Gamma.example.ORG
      |National Competent Authority: United Kingdom - MHRA
      |D.IMP: 1
      |D.2.1.1.1 Trade name: Gammax
      |D.3.1 Product name: Gammaxol
      |D.IMP: 2
      |D.2.1.1.1 Trade name: Gammax
      |D.3.2 Product code: GX-7
      |E.1.3 Condition being studied is a rare disease: No
      |E.8.1.2 Open: Information not present in EudraCT
      |EudraCT Number: 2006-000003-33
      |Trial Status: Ongoing
      |E.1.3 Condition being studied is a rare disease: No
      |D.IMP: 1
      |D.3.2 Product code: GX-7
      |E.8.6.3 Specify the countries outside of the EEA in which trial sites are planned
      |Switzerland
      |E.8.7 Trial has a data monitoring committee: No
      |""".stripMargin

  /** Write the corpus if absent (idempotent, deterministic content). */
  def ensure(): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    }
    path
  }
}
