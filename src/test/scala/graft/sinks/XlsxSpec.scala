package graft.sinks

import graft.SparkSpec
import graft.registry.{Registry, Search, SyntheticCorpus}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** The driver-side xlsx post-step (S8): structural validity of the
  * hand-assembled OOXML package plus content fidelity for the export
  * frame the reference writes to Excel. No spreadsheet reader exists
  * in the sandbox, so validity is asserted at the package level (zip
  * structure + part XML) — the same level openpyxl itself writes. */
class XlsxSpec extends SparkSpec {

  private def readEntry(z: ZipFile, name: String): String = {
    val in = z.getInputStream(z.getEntry(name))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  test("export frame round-trips into a structurally complete xlsx package") {
    val t = Registry.load(spark, SyntheticCorpus.ensure())
    val out = java.nio.file.Files.createTempDirectory("graft_xlsx").resolve("export.xlsx")
    Xlsx.fromDataFrame(Search.export(t, Search.Query(), Seq("official_title")), out)
    val z = new ZipFile(out.toFile)
    try {
      val names = z.entries().asScala.map(_.getName).toSet
      assert(names == Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/styles.xml", "xl/worksheets/sheet1.xml"))
      val sheet = readEntry(z, "xl/worksheets/sheet1.xml")
      // header row is bolded (style 1) and carries the export columns
      assert(sheet.contains("""<c r="A1" s="1" t="inlineStr"><is><t xml:space="preserve">eudract_id</t></is>"""))
      assert(sheet.contains(">official_title</t>"))
      // one row per trial + header
      assert("<row ".r.findAllIn(sheet).size == 4)
      // a known condensed value survives intact
      assert(sheet.contains(">product:alphamab; product:betazol</t>"))
      // workbook names the sheet and wires the worksheet relationship
      assert(readEntry(z, "xl/workbook.xml").contains("""<sheet name="trials" sheetId="1" r:id="rId1"/>"""))
      assert(readEntry(z, "xl/_rels/workbook.xml.rels").contains("Target=\"worksheets/sheet1.xml\""))
    } finally z.close()
  }

  test("cell typing: numbers numeric, booleans boolean, nulls blank, strings escaped") {
    val out = java.nio.file.Files.createTempDirectory("graft_xlsx").resolve("typed.xlsx")
    Xlsx.write(Seq("s", "n", "d", "b", "x"),
      Iterator(Seq("a<b&c", 42L, 2.5d, true, null), Seq("plain", 7, 0.0d, false, "y")),
      out, sheet = "t")
    val z = new ZipFile(out.toFile)
    try {
      val sheet = readEntry(z, "xl/worksheets/sheet1.xml")
      assert(sheet.contains(">a&lt;b&amp;c</t>"))
      assert(sheet.contains("""<c r="B2"><v>42</v></c>"""))
      assert(sheet.contains("""<c r="C2"><v>2.5</v></c>"""))
      assert(sheet.contains("""<c r="D2" t="b"><v>1</v></c>"""))
      assert(!sheet.contains("""r="E2"""")) // null -> cell omitted
    } finally z.close()
  }

  test("non-finite doubles become inline strings, not corrupt numeric cells") {
    val out = java.nio.file.Files.createTempDirectory("graft_xlsx").resolve("nan.xlsx")
    Xlsx.write(Seq("x", "y", "z"),
      Iterator(Seq(Double.NaN, Double.PositiveInfinity, 1.5d)), out, sheet = "t")
    val z = new ZipFile(out.toFile)
    try {
      val sheet = readEntry(z, "xl/worksheets/sheet1.xml")
      assert(sheet.contains("""<c r="A2" t="inlineStr"><is><t xml:space="preserve">NaN</t></is></c>"""))
      assert(sheet.contains("""t="inlineStr"><is><t xml:space="preserve">Infinity"""))
      assert(sheet.contains("""<c r="C2"><v>1.5</v></c>"""))
    } finally z.close()
  }

  test("column references follow A1 lettering past Z") {
    assert(Seq(0, 25, 26, 27, 51, 52, 701, 702).map(Xlsx.colRef) ==
      Seq("A", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"))
  }
}
