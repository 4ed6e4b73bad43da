package graft.registry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TEST-SCOPE cross-validation path: the declarative 54-regex
  * formulation of per-record extraction, superseded in the shipped
  * pipeline by the one-pass native [[graft.plans.ExtractRecord]]
  * expression (VERDICT r4 #4). Kept under test/ as the independent
  * second implementation that ExtractRecordSpec and StreamingSpec pin
  * the native path against.
  *
  * Per-record columnar extraction (reference scan.py:310-327 + the parse
  * state machine scan.py:330-407, re-expressed as pure column
  * expressions). Everything here is per-row — no cross-row state, no
  * shuffle, fully inside whole-stage codegen.
  *
  * First-wins semantics: the reference fills a field only while it is
  * empty (scan.py:302) and treats an empty capture as no match, so the
  * per-record value is the FIRST NON-BLANK capture in line order —
  * `regexp_extract_all(...)` filtered to non-blank, element 1.
  *
  * Known, documented divergences from the reference's line cascade
  * (all invisible on well-formed registry dumps):
  *  - lines inside an EEA location block are consumed blindly by the
  *    reference (scan.py:381-397) but are visible to our whole-record
  *    field extraction; real blocks contain only country names.
  *  - a sponsor/IMP buffer left unflushed at a record boundary merges
  *    into the next record's leading lines in the reference
  *    (buffers are only wiped per trial, scan.py:32-43); we segment
  *    per record.
  */
object Extract {

  /** First non-blank capture of `pattern` (line-anchored, multiline)
    * in the normalized record; null if none. */
  def firstCapture(rec: Column, pattern: String): Column =
    try_element_at(
      filter(regexp_extract_all(rec, lit("(?m)" + pattern), lit(1)), x => x =!= ""),
      lit(1))

  private def captureRaw(rec: Column, f: FieldSpec): Column = f.kind match {
    case FieldKind.Title => firstCapture(rec, f.pattern)
    case _               => lower(firstCapture(rec, f.pattern)) // scan.py:325 casefold
  }

  /** All 47 trial fields as named columns (raw string captures,
    * casefolded except the title). */
  def trialCols(rec: Column): Seq[Column] =
    FieldSpec.trial.map(f => captureRaw(rec, f).as(f.name))

  /** IMP entries of one record: the record text is segmented at
    * `D.IMP: n` headers (reference flush rule scan.py:353-358); each
    * segment yields its first non-blank trade/product/code. Segment 0
    * (before any header) participates — the reference's pre-header
    * buffer is flushed at the first header (scan.py:355). Entries with
    * all three fields blank are dropped (empty_dict, scan.py:252-261).
    * Blank fields stay "" here — the union-find merge's exact-match and
    * shorter-name rules operate on "" like the reference. */
  def impCol(rec: Column): Column = {
    val segs = split(rec, """(?=\n""" + FieldSpec.impHeader + ")")
    val entries = transform(segs, (s, i) => struct(
      (i.as("pos") +: FieldSpec.imp.map(f =>
        coalesce(lower(firstCapture(s, f.pattern)), lit("")).as(f.name))): _*))
    filter(entries, e =>
      e.getField("trade") =!= "" || e.getField("product") =!= "" || e.getField("code") =!= "")
  }

  /** Sponsor sections of one record: segmented at `B.1.1 Name of
    * Sponsor:` lines (flush rule scan.py:360-365). Fields captured
    * before the first B.1.1 merge into the first section where its
    * fields are blank (the reference's unflushed-buffer guard
    * scan.py:361); if the record has no B.1.1 at all, the leading
    * fields form a nameless sponsor. Values are casefolded at capture;
    * title-casing happens at the trial-level dedup (scan.py:248). */
  def sponsorCol(rec: Column): Column = {
    val segs = split(rec, """(?=\nB.1.1 Name of Sponsor: )""")
    val structs = transform(segs, (s, i) => struct(
      (i.as("pos") +: FieldSpec.sponsor.map(f =>
        coalesce(lower(firstCapture(s, f.pattern)), lit("")).as(f.name))): _*))
    val s0 = try_element_at(structs, lit(1))
    val named = slice(structs, lit(2), greatest(size(structs) - 1, lit(0)))
    val s0HasData = FieldSpec.sponsor
      .map(f => s0.getField(f.name) =!= "")
      .reduce(_ || _)
    def mergedFirst(first: Column): Column = struct(
      (first.getField("pos").as("pos") +:
        FieldSpec.sponsor.map { f =>
          when(first.getField(f.name) =!= "", first.getField(f.name))
            .otherwise(s0.getField(f.name)).as(f.name)
        }): _*)
    when(size(structs) <= 1,
      filter(array(s0), _ => s0HasData))
      .otherwise(concat(
        array(mergedFirst(try_element_at(named, lit(1)))),
        slice(named, lit(2), greatest(size(named) - 1, lit(0)))))
  }

  /** Locations mentioned in one record, via both reference paths:
    * the per-member-state NCA header line (scan.py:373-377 — note the
    * single-token capture: multi-word countries never match, SURVEY
    * §7.4.3) and EEA block bodies (scan.py:378-397), both start-marker
    * variants. Locations are NOT casefolded (scan.py:375). */
  def locationCol(rec: Column): Column = {
    // After normalization, the reference's \s+ on a collapsed line is a
    // single space; [^\S\n] keeps the match within one line like re.match.
    val nca = regexp_extract_all(rec,
      lit("""(?m)^National Competent Authority: (\S*) [-]"""), lit(1))
    val blockPat =
      """(?m)^E.8.6.3 (?:If E.8.6.1 or E.8.6.2 are Yes|Specify the countries outside of the EEA)[^\n]*\n([\s\S]*?)\nE.8.7 Trial has a data monitoring committee"""
    val blocks = regexp_extract_all(rec, lit(blockPat), lit(1))
    concat(nca, flatten(transform(blocks, b => split(b, "\n"))))
  }
}
