package graft.sources

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.commons.compress.archivers.zip.ZipFile

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.FixHeader

/** Minimal .xlsx ingestion — the reference pipeline's ACTUAL input format
  * (reference etl/extract.py:240-289: `_pick_excel_sheets` + pandas
  * `ExcelFile`/`parse` with a sheet blacklist). An xlsx is a zip of XML
  * parts; this reads workbook/sharedStrings/worksheet parts with StAX —
  * no spreadsheet library exists in this environment, and none is needed
  * for the reference's usage (untyped cell grids + header promotion).
  *
  * Scale posture: one spreadsheet is a single zip — inherently unsplittable
  * — so each resource parses driver-side exactly like the reference's
  * per-resource pandas parse; cluster parallelism comes from fanning out
  * ACROSS resources (Ingest lists many files per run) and from everything
  * downstream of the parallelize. Cells surface as raw strings ("30.5",
  * booleans as "0"/"1") — typing is TRANSFORM's job (t_coerce_types),
  * same division of labor as the reference. The one typed exception is
  * DATES: Excel stores them as style-flagged numeric serials, so a date
  * cell's raw value ("45321") is meaningless once the style is dropped —
  * date-styled numerics are rendered to "yyyy-MM-dd HH:mm:ss" here
  * (matching pandas' read + the reference's to_iso_local shape), which
  * TRY_CASTs cleanly downstream.
  */
object Xlsx {

  // Hardened against XXE: spreadsheet inputs are untrusted.
  private lazy val xif: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Accent-strip + lowercase + trim, the reference's `_normalize`
    * (extract.py:228-232) used for blacklist matching.
    */
  private[sources] def norm(s: String): String =
    java.text.Normalizer.normalize(Option(s).getOrElse("").trim,
        java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "").toLowerCase

  /** Open a local xlsx. commons-compress (on Spark's classpath) instead
    * of java.util.zip so the SAME parsers also run over a remote
    * seekable channel (see XlsxSource.withZip) — reads touch only the
    * zip central directory plus the requested parts, never a staged
    * full copy.
    */
  private[sources] def openZip(path: String): ZipFile =
    ZipFile.builder().setFile(new java.io.File(path)).get()

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zf = openZip(path)
    try sheetNames(zf)
    finally zf.close()
  }

  /** Sheet names from an already-open workbook zip. */
  private[sources] def sheetNames(zf: ZipFile): Seq[String] =
    sheetEntries(zf).map(_._1)

  /** Reference `_pick_excel_sheets` (extract.py:240-253): purely-numeric
    * sheet names not in the blacklist; else the first non-blacklisted
    * sheet; else the first sheet.
    */
  def pickSheets(names: Seq[String], blacklist: Seq[String]): Seq[String] = {
    val bl = blacklist.map(norm).toSet
    val numeric = names.filter(s => s.trim.nonEmpty &&
      s.trim.forall(_.isDigit) && !bl.contains(norm(s)))
    if (numeric.nonEmpty) numeric
    else names.find(s => !bl.contains(norm(s))).map(Seq(_))
      .getOrElse(names.take(1))
  }

  /** One sheet as a dense string grid (null = empty cell), rows in
    * document order, each padded to the sheet's max width.
    */
  def readSheetRows(path: String, sheet: String): Seq[Array[String]] = {
    val zf = openZip(path)
    try readSheetRows(zf, sheet)
    finally zf.close()
  }

  /** Same, over an already-open workbook zip (local file or remote
    * channel — the parsers don't care).
    */
  private[sources] def readSheetRows(zf: ZipFile, sheet: String): Seq[Array[String]] = {
    val entries = sheetEntries(zf)
    val rid = entries.collectFirst { case (n, r) if n == sheet => r }
      .getOrElse(throw new IllegalArgumentException(
        s"no sheet named '$sheet' (have ${entries.map(_._1).mkString(", ")})"))
    val target = relTargets(zf).getOrElse(rid,
      throw new IllegalArgumentException(s"no relationship $rid"))
    val part = if (target.startsWith("/")) target.drop(1) else "xl/" + target
    val shared = sharedStrings(zf)
    val rows = parseSheet(zf, part, shared, dateStyleFlags(zf), date1904(zf))
    val width = rows.iterator.map(_.length).maxOption.getOrElse(0)
    rows.map(r => if (r.length == width) r else r.padTo(width, null: String))
  }

  /** Read an xlsx resource the way the reference does: pick sheets per
    * `_pick_excel_sheets`, promote each sheet's header (FixHeader = the
    * reference's `_fix_header`), then concat aligning columns by name
    * (pandas `concat` semantics).
    */
  def read(spark: SparkSession, path: String,
      sheetBlacklist: Seq[String] = Nil): DataFrame = {
    val (local, isStaged) = localCopy(spark, path)
    try {
      val picked = pickSheets(sheetNames(local), sheetBlacklist)
      val frames = picked.iterator.map(s => sheetDF(spark, local, s))
        .filter(_.columns.nonEmpty).map(FixHeader(_)).toSeq
      frames match {
        case Seq() => spark.emptyDataFrame
        case fs => fs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
      }
    } finally if (isStaged) new java.io.File(local).delete()
  }

  /** ZipFile needs a real local file: unwrap file: URIs, stage any other
    * Hadoop-readable scheme to a temp file first (the reference does the
    * same — `_download_raw` stages remote resources to disk before
    * pandas parses them, extract.py:258-276).
    */
  private def localCopy(spark: SparkSession, path: String): (String, Boolean) =
    if (path.startsWith("file:")) (new java.net.URI(path).getPath, false)
    else if (!path.contains(":/")) (path, false)
    else {
      val src = new org.apache.hadoop.fs.Path(path)
      val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = java.nio.file.Files.createTempFile("graft-xlsx-", ".xlsx")
      fs.copyToLocalFile(false, src,
        new org.apache.hadoop.fs.Path(tmp.toString), true)
      (tmp.toString, true)
    }

  /** One sheet as an untyped `_c0.._cN` frame (no header promotion). */
  def sheetDF(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val rows = readSheetRows(path, sheet)
    val width = rows.headOption.map(_.length).getOrElse(0)
    val schema = StructType((0 until width)
      .map(i => StructField(s"_c$i", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row.fromSeq(r.toIndexedSeq)),
        math.max(1, math.min(rows.size, 4))),
      schema)
  }

  // ------------------------------------------------------------------
  // Writer
  // ------------------------------------------------------------------

  /** Write one workbook to any Hadoop-visible path, at the fidelity the
    * reader consumes: inline-string cells, raw numeric cells, one
    * worksheet part per sheet, rels indirection — no styles, no shared
    * strings (both optional parts the reader tolerates). Serves as the
    * landing-zone synthesizer for ingest drills (x_xlsx_ingest_e2e) and
    * a minimal export utility. One workbook is one unsplittable zip, so
    * call this from ONE task per file — a partitionBy(fileKey) fan-out
    * writes a whole landing zone in parallel; the per-sheet buffering
    * is the format's own constraint, not a plan choice.
    *
    * Cell mapping (the [[graft]] fixture convention): null → omitted
    * cell, String → inlineStr, anything else → numeric `<v>` via
    * toString.
    */
  def write(conf: org.apache.hadoop.conf.Configuration, path: String,
      sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
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
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val zos = new java.util.zip.ZipOutputStream(fs.create(p, true))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      sheets.zipWithIndex.foreach { case ((_, rows), si) =>
        val rowsXml = rows.iterator.zipWithIndex.map { case (cells, ri) =>
          val cellsXml = cells.iterator.zipWithIndex.collect {
            case (v, ci) if v != null =>
              val ref = s"${colRef(ci)}${ri + 1}"
              v match {
                case s: String =>
                  s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
                case n => s"""<c r="$ref"><v>$n</v></c>"""
              }
          }.mkString
          s"""<row r="${ri + 1}">$cellsXml</row>"""
        }.mkString
        put(s"xl/worksheets/sheet${si + 1}.xml",
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
            "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
            s"<sheetData>$rowsXml</sheetData></worksheet>")
      }
    } finally zos.close()
  }

  // ------------------------------------------------------------------
  // XML part parsers
  // ------------------------------------------------------------------

  private def withPart[A](zf: ZipFile, name: String)(f: XMLStreamReader => A): Option[A] =
    Option(zf.getEntry(name)).map { e =>
      val in = zf.getInputStream(e)
      val r = xif.createXMLStreamReader(in)
      try f(r)
      finally { r.close(); in.close() }
    }

  /** (sheet name, relationship id) in workbook order. */
  private def sheetEntries(zf: ZipFile): Seq[(String, String)] =
    withPart(zf, "xl/workbook.xml") { r =>
      val out = mutable.ArrayBuffer.empty[(String, String)]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          var name: String = null; var rid: String = null
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "name" => name = r.getAttributeValue(i)
              case "id" => rid = r.getAttributeValue(i) // r:id (namespaced)
              case _ =>
            }
          }
          if (name != null && rid != null) out += ((name, rid))
        }
      }
      out.toSeq
    }.getOrElse(throw new IllegalArgumentException(s"$zf: not an xlsx (no xl/workbook.xml)"))

  /** relationship id → part target (relative to xl/). */
  private def relTargets(zf: ZipFile): Map[String, String] =
    withPart(zf, "xl/_rels/workbook.xml.rels") { r =>
      val out = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          var id: String = null; var tgt: String = null
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "Id" => id = r.getAttributeValue(i)
              case "Target" => tgt = r.getAttributeValue(i)
              case _ =>
            }
          }
          if (id != null && tgt != null) out(id) = tgt
        }
      }
      out.toMap
    }.getOrElse(Map.empty)

  /** Shared string table; rich-text runs concatenate their `<t>` parts. */
  private def sharedStrings(zf: ZipFile): IndexedSeq[String] =
    withPart(zf, "xl/sharedStrings.xml") { r =>
      val out = mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inSi = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            inSi = true; sb.clear()
          case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
            sb.append(r.getElementText)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            inSi = false; out += sb.toString
          case _ =>
        }
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** "BC12" → 0-based column index 54. */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  // ------------------------------------------------------------------
  // Date-styled numerics (OOXML styles.xml)
  // ------------------------------------------------------------------

  /** Built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30). */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Custom format-code date heuristic (the Apache-POI-style test, public
    * knowledge): after dropping bracketed sections, quoted literals and
    * escaped chars, any remaining y/m/d/h/s token means date/time.
    */
  private[graft] def isDateFormatCode(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\\[[^\\]]*\\]", "") // [$-409], [Red], [h] sections
      .replaceAll("\"[^\"]*\"", "") // quoted literals
      .replaceAll("\\\\.", "") // escaped single chars
    cleaned.toLowerCase.exists("ymdhs".contains(_))
  }

  /** Per-cellXf "is a date style" flags, indexed by the `s` attribute of
    * a cell. Missing styles part (fixtures, minimal writers) → all false.
    */
  private def dateStyleFlags(zf: ZipFile): IndexedSeq[Boolean] =
    withPart(zf, "xl/styles.xml") { r =>
      val customDate = mutable.Set.empty[Int]
      val flags = mutable.ArrayBuffer.empty[Boolean]
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            // toIntOption throughout: a malformed style attribute from a
            // sloppy writer must surface the raw cell value, not fail the
            // whole workbook.
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId"))
                .flatMap(_.trim.toIntOption)
              val code = Option(r.getAttributeValue(null, "formatCode")).getOrElse("")
              if (id.isDefined && isDateFormatCode(code)) customDate += id.get
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              val fmt = Option(r.getAttributeValue(null, "numFmtId"))
                .flatMap(_.trim.toIntOption).getOrElse(0)
              flags += (BuiltinDateFmts.contains(fmt) || customDate.contains(fmt))
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
      }
      flags.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** Whether the workbook uses the 1904 (classic-Mac) date epoch. */
  private def date1904(zf: ZipFile): Boolean =
    withPart(zf, "xl/workbook.xml") { r =>
      var found = false
      while (r.hasNext && !found) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
          val v = Option(r.getAttributeValue(null, "date1904")).getOrElse("false")
          found = v == "1" || v == "true"
        }
      }
      found
    }.getOrElse(false)

  /** Excel serial → "yyyy-MM-dd HH:mm:ss". The 1900 epoch anchors at
    * 1899-12-30, which absorbs Excel's phantom 1900-02-29 for every
    * modern serial (> 60) — the same convention pandas/openpyxl use.
    * Sub-day fractions are clock time, rounded to whole seconds.
    */
  private[graft] def serialToIso(serial: Double, epoch1904: Boolean): String = {
    val base = if (epoch1904) java.time.LocalDateTime.of(1904, 1, 1, 0, 0, 0)
      else java.time.LocalDateTime.of(1899, 12, 30, 0, 0, 0)
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    base.plusDays(days).plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  private def parseSheet(zf: ZipFile, part: String, shared: IndexedSeq[String],
      dateFlags: IndexedSeq[Boolean], epoch1904: Boolean): Seq[Array[String]] =
    withPart(zf, part) { r =>
      val rows = mutable.ArrayBuffer.empty[Array[String]]
      val cells = mutable.Map.empty[Int, String]
      var lastCol = -1
      var cellCol = -1
      var cellType = ""
      var cellDateStyle = false
      var inIs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => cells.clear(); lastCol = -1
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(lastCol + 1)
              lastCol = cellCol
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellDateStyle = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.trim.toIntOption) // malformed style ⇒ not a date
                .flatMap(dateFlags.lift).getOrElse(false)
              inIs = false
            case "is" => inIs = true
            case "v" =>
              val raw = r.getElementText
              val v =
                if (cellType == "s")
                  raw.trim.toIntOption.flatMap(shared.lift).getOrElse(raw)
                else if (cellDateStyle && (cellType == "" || cellType == "n"))
                  // Date-styled numeric: render the serial, else downstream
                  // typing sees a meaningless number. Unparseable → raw.
                  raw.trim.toDoubleOption.map(serialToIso(_, epoch1904)).getOrElse(raw)
                else raw
              if (cellCol >= 0) cells(cellCol) = v
            case "t" if inIs =>
              if (cellCol >= 0) cells(cellCol) = r.getElementText
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "row" =>
              if (cells.nonEmpty) {
                val width = cells.keys.max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr
              } else rows += Array.empty[String]
            case "is" => inIs = false
            case "c" => cellCol = -1
            case _ =>
          }
          case _ =>
        }
      }
      rows.toSeq
    }.getOrElse(throw new IllegalArgumentException(s"missing worksheet part $part"))
}
