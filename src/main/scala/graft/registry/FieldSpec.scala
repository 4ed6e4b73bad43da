package graft.registry

/** Declarative field table for the clinical-trial registry corpus — the
  * engine's single source of truth for schema, extraction, and merge
  * semantics, playing the role of the reference's `Element` dicts
  * (reference: scan.py:411-482) which simultaneously declare SQL type,
  * regex, and row buffer.
  *
  * Each field's regex is kept byte-for-byte identical to the reference
  * (including its dot-as-wildcard quirks, e.g. "D.IMP") so extraction
  * semantics match. Patterns are applied per *record* with (?m) so the
  * reference's per-line anchored `re.match` becomes a line-anchored
  * multiline search — the first non-blank capture in record order wins,
  * exactly like the reference's first-wins guard (scan.py:302).
  */
final case class FieldSpec(
    name: String,
    pattern: String,
    kind: FieldKind)

sealed trait FieldKind
object FieldKind {
  /** Free text; captured value casefolded (scan.py:325). */
  case object Text extends FieldKind
  /** Free text; case preserved — only the trial title (scan.py:322-324). */
  case object Title extends FieldKind
  /** Tri-state yes/no flag stored INTEGER in the reference
    * (scan.py:115-119); engine type = nullable int 1/0/null. */
  case object Flag extends FieldKind
}

object FieldSpec {
  import FieldKind._

  /** trial table fields — reference scan.py:411-462. eudract_id is
    * handled separately (it is the record delimiter / grouping key). */
  val trial: Seq[FieldSpec] = Seq(
    FieldSpec("overall_status", "^Trial Status: (.*$)", Text),
    FieldSpec("study_first_submitted_date",
      "^Date on which this record was first entered in the EudraCT database: (.*$)", Text),
    FieldSpec("official_title", "^A.3 Full title of the trial: (.*$)", Title),
    FieldSpec("sponsor_id", "^A.4.1 Sponsor's protocol code number: (.*$)", Text),
    FieldSpec("isrctn_id",
      """^A.5.1 ISRCTN \(International Standard Randomised Controlled Trial\) number: (.*$)""", Text),
    FieldSpec("who_utrn_id",
      """^A.5.3 WHO Universal Trial Reference Number \(UTRN\): (.*$)""", Text),
    FieldSpec("nct_id",
      """^A.5.2 US NCT \(ClinicalTrials.gov registry\) number: (NCT\d+)""", Text),
    FieldSpec("placebo", """^D.8.1 Is a Placebo used in this Trial\? (.*$)""", Flag),
    FieldSpec("condition", """^E.1.1 Medical condition\(s\) being investigated: (.*$)""", Text),
    FieldSpec("meddra_version", "^E.1.2 Version: ([0-9.]+)", Text),
    FieldSpec("meddra_level", "^E.1.2 Level: (.*$)", Text),
    FieldSpec("meddra_classification", """^E.1.2 Classification code: (\d+)""", Text),
    FieldSpec("meddra_term", "^E.1.2 Term: (.*$)", Text),
    FieldSpec("meddra_soc", """^E.1.2 System Organ Class: (\d+)""", Text),
    FieldSpec("rare", "^E.1.3 Condition being studied is a rare disease: (.*$)", Flag),
    FieldSpec("fih", "^E.7.1.1 First administration to humans: (.*$)", Flag),
    FieldSpec("bioequivalence", "^E.7.1.2 Bioequivalence study: (.*$)", Flag),
    FieldSpec("phase1", """^E.7.1 Human pharmacology \(Phase I\): (.*$)""", Flag),
    FieldSpec("phase2", """^E.7.2 Therapeutic exploratory \(Phase II\): (.*$)""", Flag),
    FieldSpec("phase3", """^E.7.3 Therapeutic confirmatory \(Phase III\): (.*$)""", Flag),
    FieldSpec("phase4", """^E.7.4 Therapeutic use \(Phase IV\): (.*$)""", Flag),
    FieldSpec("diagnosis", "^E.6.1 Diagnosis: (.*$)", Flag),
    FieldSpec("prophylaxis", "^E.6.2 Prophylaxis: (.*$)", Flag),
    FieldSpec("therapy", "^E.6.3 Therapy: (.*$)", Flag),
    FieldSpec("safety", "^E.6.4 Safety: (.*$)", Flag),
    FieldSpec("efficacy", "^E.6.5 Efficacy: (.*$)", Flag),
    FieldSpec("pk", "^E.6.6 Pharmacokinetic: (.*$)", Flag),
    FieldSpec("pd", "^E.6.7 Pharmacodynamic: (.*$)", Flag),
    FieldSpec("randomised", "^E.8.1.1 Randomised: (.*$)", Flag),
    FieldSpec("open_design", "^E.8.1.2 Open: (.*$)", Flag),
    FieldSpec("single_blind", "^E.8.1.3 Single blind: (.*$)", Flag),
    FieldSpec("double_blind", "^E.8.1.4 Double blind: (.*$)", Flag),
    FieldSpec("crossover", "^E.8.1.6 Cross over: (.*$)", Flag),
    FieldSpec("age_in_utero", "^F.1.1.1 In Utero: (.*$)", Flag),
    FieldSpec("age_preterm",
      """^F.1.1.2 Preterm newborn infants \(up to gestational age < 37 weeks\): (.*$)""", Flag),
    FieldSpec("age_newborn", """^F.1.1.3 Newborns \(0-27 days\): (.*$)""", Flag),
    FieldSpec("age_under2", """^F.1.1.4 Infants and toddlers \(28 days-23 months\): (.*$)""", Flag),
    FieldSpec("age_2to11", """^F.1.1.5 Children \(2-11years\): (.*$)""", Flag),
    FieldSpec("age12to17", """^F.1.1.6 Adolescents \(12-17 years\): (.*$)""", Flag),
    FieldSpec("age18to64", """^F.1.2 Adults \(18-64 years\): (.*$)""", Flag),
    FieldSpec("age_65plus", """^F.1.3 Elderly \(>=65 years\): (.*$)""", Flag),
    FieldSpec("female", "^F.2.1 Female: (.*$)", Flag),
    FieldSpec("male", "^F.2.2 Male: (.*$)", Flag),
    FieldSpec("enrollment", "^F.4.2.2 In the whole clinical trial: (.*$)", Text),
    FieldSpec("network", "^G.4.1 Name of Organisation: (.*$)", Text),
    FieldSpec("completion_date", "^P. Date of the global end of the trial: (.*$)", Text)
  )

  /** imp child-table fields — reference scan.py:465-467. */
  val imp: Seq[FieldSpec] = Seq(
    FieldSpec("trade", "^D.2.1.1.1 Trade name: (.*$)", Text),
    FieldSpec("product", "^D.3.1 Product name: (.*$)", Text),
    FieldSpec("code", "^D.3.2 Product code: (.*$)", Text)
  )

  /** sponsor child-table fields — reference scan.py:470-473. */
  val sponsor: Seq[FieldSpec] = Seq(
    FieldSpec("name", "^B.1.1 Name of Sponsor: (.*$)", Text),
    FieldSpec("org", "^B.5.1 Name of organisation: (.*$)", Text),
    FieldSpec("contact", "^B.5.2 Functional name of contact point: (.*$)", Text),
    FieldSpec("email", """^B.5.6 E-mail:\s*(\S+@\S+[.]\S+)\s*$""", Text)
  )

  /** Structure markers — reference scan.py:476-481. */
  val impHeader = """D.IMP: \d+"""
  val eudractId = """^EudraCT Number:\s*(\S+)"""
  val ncaLocation = """^National Competent Authority:\s+(\S*)\s+[-]"""
  val eeaBlockStart1 = "^E.8.6.3 If E.8.6.1 or E.8.6.2 are Yes"
  val eeaBlockStart2 = "^E.8.6.3 Specify the countries outside of the EEA"
  val eeaBlockEnd = "^E.8.7 Trial has a data monitoring committee"
}
