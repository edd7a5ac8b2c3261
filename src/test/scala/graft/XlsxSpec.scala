package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Ingest, Xlsx}

/** Excel ingestion against hand-built xlsx fixtures (zip + XML written
  * directly — no spreadsheet library on either side, which is the point:
  * the fixture exercises the same OOXML shapes real files carry: shared
  * strings, inline strings, sparse rows, multiple sheets, rels
  * indirection).
  */
class XlsxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import XlsxFixture.{writeXlsx, Inline}

  private def fixture(dir: String, name: String): String = {
    val p = s"$dir/$name"
    writeXlsx(p, Seq(
      "1" -> Seq(
        Seq("Código", "Edad"),
        Seq("A1", 30),
        Seq("A2", null)), // sparse row: missing Edad cell
      "2" -> Seq(
        Seq("Código", "Edad"),
        Seq(Inline("A3"), 50.5)),
      "Notas" -> Seq(
        Seq("junk"),
        Seq("should never be read"))))
    p
  }

  // ------------------------------------------------------------------

  test("date-styled numerics render as timestamps; plain and non-date-styled stay raw") {
    import XlsxFixture.{CustomDate, DateSerial, StyledNum}
    val dir = Files.createTempDirectory("graft-xlsx-dates").toString
    val p = s"$dir/dates.xlsx"
    XlsxFixture.writeXlsx(p, Seq(
      "1" -> Seq(
        Seq("Código", "Fecha", "Cuando", "Monto", "Serial"),
        Seq("A1", DateSerial(45321), CustomDate(45321.5), StyledNum(45321), 45321))))
    val rows = Xlsx.readSheetRows(p, "1")
    assert(rows(1).toSeq == Seq("A1",
      "2024-01-30 00:00:00", // built-in date style (numFmtId 14)
      "2024-01-30 12:00:00", // custom dd/mm/yyyy hh:mm, fraction = time
      "45321.0", // styled NON-date numeric stays a raw serial
      "45321")) // unstyled numeric untouched
  }

  test("isDateFormatCode: quoted/bracketed/escaped sections don't fake dates") {
    assert(Xlsx.isDateFormatCode("dd/mm/yyyy"))
    assert(Xlsx.isDateFormatCode("[$-409]d-mmm-yy"))
    assert(Xlsx.isDateFormatCode("hh:mm:ss"))
    assert(!Xlsx.isDateFormatCode("#,##0.00"))
    assert(!Xlsx.isDateFormatCode("General"))
    assert(!Xlsx.isDateFormatCode("0.00%"))
    assert(!Xlsx.isDateFormatCode("\"yes\"0;\"no\"0")) // quoted y/s literals
    assert(!Xlsx.isDateFormatCode("[Red]0.0")) // bracketed d
  }

  test("serialToIso: 1900 and 1904 epochs") {
    assert(Xlsx.serialToIso(45321.0, epoch1904 = false) == "2024-01-30 00:00:00")
    assert(Xlsx.serialToIso(0.75, epoch1904 = false) == "1899-12-30 18:00:00")
    // Same instant expressed in the 1904 epoch is 1462 days earlier.
    assert(Xlsx.serialToIso(45321.0 - 1462.0, epoch1904 = true) == "2024-01-30 00:00:00")
  }

  test("pickSheets follows the reference: numeric sheets, blacklist, fallbacks") {
    assert(Xlsx.pickSheets(Seq("1", "2", "Notas"), Seq("notas")) == Seq("1", "2"))
    assert(Xlsx.pickSheets(Seq("1", "2", "Notas"), Nil) == Seq("1", "2"))
    // Blacklist matching is accent-stripped + lowercased.
    assert(Xlsx.pickSheets(Seq("Resumen", "Datos"), Seq("RESÚMEN".toLowerCase)) == Seq("Datos"))
    assert(Xlsx.pickSheets(Seq("Resúmen", "Datos"), Seq("resumen")) == Seq("Datos"))
    // No numeric sheets -> first non-blacklisted; all blacklisted -> first.
    assert(Xlsx.pickSheets(Seq("Hoja1", "Hoja2"), Nil) == Seq("Hoja1"))
    assert(Xlsx.pickSheets(Seq("Hoja1", "Hoja2"), Seq("hoja1", "hoja2")) == Seq("Hoja1"))
  }

  test("colIndex decodes OOXML column letters") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA10") == 26)
    assert(Xlsx.colIndex("BC12") == 54)
  }

  test("read: sheet selection + shared/inline strings + sparse rows + header promotion") {
    val dir = Files.createTempDirectory("graft-xlsx").toString
    val path = fixture(dir, "detenidos.xlsx")
    assert(Xlsx.sheetNames(path) == Seq("1", "2", "Notas"))

    val df = Xlsx.read(spark, path, sheetBlacklist = Seq("notas")).orderBy("codigo")
    assert(df.columns.toSeq == Seq("codigo", "edad"), "headers promoted + normalized")
    val rows = df.collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      ("A1", Some("30")),
      ("A2", None), // sparse cell -> NULL
      ("A3", Some("50.5"))), "numeric + shared + inline cells, no Notas rows")
  }

  test("ingest end-to-end: xlsx resources flow through incremental extraction") {
    val base = Files.createTempDirectory("graft-xlsx-e2e").toString
    val landing = base + "/landing"
    new java.io.File(landing).mkdirs()
    fixture(landing, "drop1.xlsx")
    val cfg = Ingest.SourceCfg(format = "xlsx", dir = landing, glob = "*.xlsx",
      sheetBlacklist = Seq("notas"))
    val statePath = base + "/state.properties"

    val first = Ingest.extractUpdated(spark, cfg, statePath)
    assert(first.isDefined)
    val (df, st) = first.get
    assert(df.count() == 3 && df.columns.toSeq == Seq("codigo", "edad"))
    Ingest.saveState(spark, statePath, st)
    assert(Ingest.extractUpdated(spark, cfg, statePath).isEmpty,
      "unchanged xlsx must not re-extract")
  }
}

/** Hand-built xlsx fixtures (zip + XML written directly): the same OOXML
  * shapes real files carry — shared strings, inline strings, sparse rows,
  * multiple sheets, rels indirection. Shared across specs.
  */
object XlsxFixture {

  /** Marks a cell to be written as an inline string (t="inlineStr"). */
  case class Inline(s: String)

  /** Numeric cell carrying a BUILT-IN date style (numFmtId 14). */
  case class DateSerial(serial: Double)

  /** Numeric cell carrying a CUSTOM date format (numFmtId 164). */
  case class CustomDate(serial: Double)

  /** Numeric cell with a non-date style (numFmtId 4, "#,##0.00"). */
  case class StyledNum(v: Double)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Writes a minimal-but-valid xlsx: workbook + rels + sharedStrings +
    * one worksheet part per sheet. Cell values: String → shared string,
    * Inline → inline string, Int/Double → number, null → omitted cell.
    */
  def writeXlsx(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val strings = mutable.LinkedHashMap.empty[String, Int]
    def sidx(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    val sheetXmls = sheets.map { case (_, rows) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellsXml = cells.zipWithIndex.collect {
          case (v, ci) if v != null =>
            val ref = s"${colRef(ci)}${ri + 1}"
            v match {
              case s: String => s"""<c r="$ref" t="s"><v>${sidx(s)}</v></c>"""
              case Inline(s) => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
              case DateSerial(d) => s"""<c r="$ref" s="1"><v>$d</v></c>"""
              case CustomDate(d) => s"""<c r="$ref" s="2"><v>$d</v></c>"""
              case StyledNum(d) => s"""<c r="$ref" s="3"><v>$d</v></c>"""
              case n => s"""<c r="$ref"><v>$n</v></c>"""
            }
        }.mkString
        s"""<row r="${ri + 1}">$cellsXml</row>"""
      }.mkString
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        s"<sheetData>$rowsXml</sheetData></worksheet>"
    }
    val workbook = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
      "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheets>" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>"
    val rels = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
      sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString + "</Relationships>"
    val sst = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">""" +
      strings.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString + "</sst>"

    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // Styles: xf index 1 → built-in date (14), 2 → custom 164 (a date
    // format code), 3 → non-date numeric format.
    val styles = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<styleSheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
      """<numFmts count="1"><numFmt numFmtId="164" formatCode="dd/mm/yyyy hh:mm"/></numFmts>""" +
      """<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14"/>""" +
      """<xf numFmtId="164"/><xf numFmtId="4"/></cellXfs></styleSheet>"""
    try {
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      put("xl/sharedStrings.xml", sst)
      put("xl/styles.xml", styles)
      sheetXmls.zipWithIndex.foreach { case (xml, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", xml)
      }
    } finally zos.close()
  }
}
