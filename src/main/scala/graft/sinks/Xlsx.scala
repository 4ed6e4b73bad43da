package graft.sinks

import java.io.OutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/** Driver-side .xlsx post-step — the last leg of the reference's Excel
  * export (toexcel.py:126-162; SURVEY §1.4/§2.1 S8: "CSV + driver-side
  * xlsx conversion"). The cluster produces the export frame (ordered,
  * human-sized — the same frame [[Sinks.csvSingle]] writes); this
  * utility materializes it into a minimal single-worksheet Office Open
  * XML workbook, hand-assembled over `java.util.zip` because no
  * spreadsheet library exists in the dependency set (the reference
  * could not ship its own Excel step offline either — openpyxl).
  *
  * Scope is deliberately the reference's: one sheet, a header row
  * (bolded via the one-cell style table, like openpyxl's default
  * append of a header), inline strings (no shared-string table —
  * export-sized data doesn't need the indirection), numbers written as
  * numeric cells. NOT a cluster sink: rows stream through the driver
  * (`toLocalIterator`), which is exactly the shape of the reference's
  * per-row worksheet append and fine for export-sized frames only.
  */
object Xlsx {

  /** Write `df` (small, export-sized) to a single-sheet xlsx file. */
  def fromDataFrame(df: DataFrame, out: Path, sheet: String = "trials"): Unit = {
    import scala.jdk.CollectionConverters._
    write(df.columns.toSeq,
      df.toLocalIterator().asScala.map(r => Seq.tabulate(r.length)(r.get)),
      out, sheet)
  }

  /** Write a header + row iterator to `out`. Strings become inline-str
    * cells; Byte/Short/Int/Long/Float/Double/BigDecimal become numeric
    * cells; Boolean becomes a boolean cell; null cells are skipped
    * (blank in the sheet). */
  def write(header: Seq[String], rows: Iterator[Seq[Any]], out: Path,
            sheet: String = "trials"): Unit = {
    Option(out.getParent).foreach(Files.createDirectories(_))
    val zip = new ZipOutputStream(Files.newOutputStream(out))
    try {
      entry(zip, "[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |</Types>""".stripMargin)
      entry(zip, "_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry(zip, "xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${esc(sheet)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      entry(zip, "xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin)
      entry(zip, "xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<fonts count="2"><font/><font><b/></font></fonts>
          |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
          |<borders count="1"><border/></borders>
          |<cellStyleXfs count="1"><xf/></cellStyleXfs>
          |<cellXfs count="2"><xf xfId="0"/><xf xfId="0" fontId="1" applyFont="1"/></cellXfs>
          |</styleSheet>""".stripMargin)

      zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w: OutputStream = zip
      def raw(s: String): Unit = w.write(s.getBytes(UTF_8))
      raw("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      raw(row(1, header.map(h => (h, true))))
      var rn = 2
      rows.foreach { r =>
        raw(row(rn, r.map(v => (v, false))))
        rn += 1
      }
      raw("</sheetData></worksheet>")
      zip.closeEntry()
    } finally zip.close()
  }

  private def entry(zip: ZipOutputStream, name: String, content: String): Unit = {
    zip.putNextEntry(new ZipEntry(name))
    zip.write(content.getBytes(UTF_8))
    zip.closeEntry()
  }

  /** One <row>: numbered cells in A1 references, header cells bolded
    * (style index 1 from the two-entry cellXfs table). */
  private def row(rn: Int, cells: Seq[(Any, Boolean)]): String = {
    val sb = new StringBuilder(s"""<row r="$rn">""")
    cells.zipWithIndex.foreach { case ((v, bold), ci) =>
      val ref = colRef(ci) + rn
      val style = if (bold) """ s="1"""" else ""
      v match {
        case null => () // blank cell: omit entirely
        case n: Byte => sb ++= s"""<c r="$ref"$style><v>$n</v></c>"""
        case n: Short => sb ++= s"""<c r="$ref"$style><v>$n</v></c>"""
        case n: Int => sb ++= s"""<c r="$ref"$style><v>$n</v></c>"""
        case n: Long => sb ++= s"""<c r="$ref"$style><v>$n</v></c>"""
        // NaN/Infinity are not valid OOXML numbers — Excel declares the
        // whole workbook corrupt. Emit them as inline strings instead.
        case n: Float if java.lang.Float.isFinite(n) => sb ++= s"""<c r="$ref"$style><v>$n</v></c>"""
        case n: Double if java.lang.Double.isFinite(n) => sb ++= s"""<c r="$ref"$style><v>$n</v></c>"""
        case n: java.math.BigDecimal => sb ++= s"""<c r="$ref"$style><v>${n.toPlainString}</v></c>"""
        case b: Boolean => sb ++= s"""<c r="$ref"$style t="b"><v>${if (b) 1 else 0}</v></c>"""
        case s => sb ++= s"""<c r="$ref"$style t="inlineStr"><is><t xml:space="preserve">${esc(s.toString)}</t></is></c>"""
      }
    }
    sb ++= "</row>"
    sb.toString
  }

  /** 0-based column index → A1 letters (A..Z, AA..). */
  private[sinks] def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }
}
