package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.normColname
import graft.operators.FixHeader

/** Parallel xlsx ingestion as a DataSource V2 connector:
  * `spark.read.format("graft-xlsx").option("path", <dir or glob>).load()`.
  *
  * [[Xlsx.read]] (the [[Ingest]] path) parses each workbook driver-side,
  * serially — the exact shape of the reference's per-resource pandas loop
  * (extract.py:258-276). That is fine for a handful of resources; a
  * landing zone with HUNDREDS of spreadsheets wants the parse fanned out.
  * This connector plans one InputPartition per (file, sheet), so every
  * EXECUTOR parses its own workbook — ingestion throughput scales with
  * the cluster while each unsplittable zip still parses as a unit.
  *
  * Remote files are NEVER staged whole: the zip opens over a seekable
  * Hadoop input stream (commons-compress ZipFile — reads the central
  * directory plus the requested parts only), so driver-side planning
  * touches just each workbook's directory + workbook.xml, and a sheet
  * partition reads the few parts it parses. The driver's Hadoop
  * configuration travels to executors via SerializableConfiguration, so
  * object-store credentials/FS settings behave identically there.
  *
  * Schema contract: inferred driver-side from the first picked sheet of
  * the first file (header detected with the same scorer FixHeader uses,
  * names normalized, all strings — typing is TRANSFORM's job). Every
  * partition then aligns its own sheet's header BY NAME to that schema:
  * sheets may order columns differently or omit some (→ null), exactly
  * like Ingest's unionByName(allowMissingColumns) semantics. Column
  * pruning is honored — unrequested cells are never materialized into
  * rows.
  *
  * Options: `path` (file/dir/glob), `sheetBlacklist` (comma-separated,
  * accent-insensitive — the reference's SHEET_BLACKLIST).
  */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (files, blacklist) = XlsxSource.resolve(options)
    require(files.nonEmpty, s"graft-xlsx: no files match ${options.get("path")}")
    XlsxSource.inferFrom(files.head, blacklist, XlsxSource.sessionConf())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (files, blacklist) = XlsxSource.resolve(opts)
    // Capture the session's Hadoop conf ON THE DRIVER so executor-side
    // reads see the same credentials/FS settings.
    new XlsxTable(files, blacklist, schema,
      new org.apache.spark.util.SerializableConfiguration(XlsxSource.sessionConf()))
  }
}

object XlsxSource {

  /** (matched files, normalized sheet blacklist) from reader options.
    * Listing runs driver-side over any Hadoop-visible FS; executors
    * re-open the chosen paths themselves.
    */
  /** Driver-side Hadoop conf (session's when available). */
  private[sources] def sessionConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private[sources] def resolve(options: CaseInsensitiveStringMap): (Seq[String], Seq[String]) = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-xlsx: option 'path' is required"))
    val blacklist = Option(options.get("sheetBlacklist")).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sessionConf())
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(s =>
            s.isFile && s.getPath.getName.toLowerCase.endsWith(".xlsx"))
        else Seq(st)
      }
      .map(_.getPath.toString).sorted
    (matched, blacklist)
  }

  /** Open a workbook zip wherever it lives and hand it to `f`. Local
    * paths open directly; any other Hadoop scheme opens as a SEEKABLE
    * channel — commons-compress reads the central directory and then
    * only the parts the caller touches, so no full-file staging, ever.
    */
  private[sources] def withZip[A](path: String,
      conf: org.apache.hadoop.conf.Configuration)(
      f: org.apache.commons.compress.archivers.zip.ZipFile => A): A = {
    val zf =
      if (path.startsWith("file:")) Xlsx.openZip(new java.net.URI(path).getPath)
      else if (!path.contains(":/")) Xlsx.openZip(path)
      else {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val ch = new HadoopSeekableByteChannel(fs.open(p), fs.getFileStatus(p).getLen)
        org.apache.commons.compress.archivers.zip.ZipFile.builder()
          .setSeekableByteChannel(ch).get()
      }
    try f(zf) finally zf.close() // closing the archive closes the channel
  }

  /** Header row index within the first `lookahead` rows — the FixHeader
    * scorer applied to raw cell grids (same formula as the reference's
    * `_fix_header`).
    */
  private[sources] def headerIndex(rows: Seq[Array[String]], lookahead: Int = 5): Int = {
    val head = rows.take(lookahead)
    if (head.isEmpty) -1
    else head.indices.maxBy(i => FixHeader.scoreCells(head(i).toIndexedSeq))
  }

  /** (name, cell index) pairs for one sheet's detected header, in cell
    * order (normalized names; first occurrence wins).
    */
  private[sources] def headerMap(header: Array[String]): Seq[(String, Int)] = {
    val out = mutable.LinkedHashMap.empty[String, Int]
    header.zipWithIndex.foreach { case (h, i) =>
      val n = normColname(Option(h).getOrElse("").trim)
      if (n.nonEmpty && !out.contains(n)) out(n) = i
    }
    out.toSeq
  }

  private[sources] def inferFrom(file: String, blacklist: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): StructType =
    withZip(file, conf) { zf =>
      val sheets = Xlsx.pickSheets(Xlsx.sheetNames(zf), blacklist)
      val rows = sheets.headOption.map(Xlsx.readSheetRows(zf, _)).getOrElse(Nil)
      val hi = headerIndex(rows)
      require(hi >= 0 && rows.isDefinedAt(hi),
        s"graft-xlsx: no header row found in $file")
      val names = headerMap(rows(hi)).map(_._1)
      StructType(names.map(StructField(_, StringType, nullable = true)))
    }
}

/** Read-only SeekableByteChannel over a Hadoop FSDataInputStream —
  * positioned reads, so concurrent part reads within one archive are
  * safe and a remote open costs no bulk transfer.
  */
private[sources] class HadoopSeekableByteChannel(
    in: org.apache.hadoop.fs.FSDataInputStream, total: Long)
    extends java.nio.channels.SeekableByteChannel {
  private var pos = 0L
  @volatile private var open = true
  override def read(dst: java.nio.ByteBuffer): Int = {
    if (pos >= total) return -1
    val want = math.min(dst.remaining().toLong, total - pos).toInt
    val buf = new Array[Byte](want)
    var done = 0
    while (done < want) {
      val n = in.read(pos + done, buf, done, want - done)
      if (n < 0) {
        if (done == 0) return -1
        else { dst.put(buf, 0, done); pos += done; return done }
      }
      done += n
    }
    dst.put(buf, 0, done); pos += done; done
  }
  override def write(src: java.nio.ByteBuffer): Int =
    throw new java.nio.channels.NonWritableChannelException
  override def position(): Long = pos
  override def position(newPosition: Long): java.nio.channels.SeekableByteChannel = {
    pos = newPosition; this
  }
  override def size(): Long = total
  override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
    throw new java.nio.channels.NonWritableChannelException
  override def isOpen: Boolean = open
  override def close(): Unit = { open = false; in.close() }
}

private class XlsxTable(files: Seq[String], blacklist: Seq[String],
    tableSchema: StructType,
    sconf: org.apache.spark.util.SerializableConfiguration)
    extends Table with SupportsRead {
  override def name(): String = s"graft_xlsx(${files.size} files)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(files, blacklist, tableSchema, sconf)
}

private class XlsxScanBuilder(files: Seq[String], blacklist: Seq[String],
    tableSchema: StructType,
    sconf: org.apache.spark.util.SerializableConfiguration)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new XlsxScan(files, blacklist, required, sconf)
}

private case class XlsxPartition(file: String, sheet: String) extends InputPartition

private class XlsxScan(files: Seq[String], blacklist: Seq[String],
    required: StructType,
    sconf: org.apache.spark.util.SerializableConfiguration) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx files=${files.size} cols=${required.fieldNames.mkString(",")}"

  /** One partition per (file, sheet). Sheet listing opens each zip's
    * central directory + workbook.xml only (seekable channel for remote
    * schemes — no staging), cheap enough for driver-side planning; the
    * row parse — the real cost — runs on executors.
    */
  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap { f =>
      XlsxSource.withZip(f, sconf.value)(zf =>
        Xlsx.pickSheets(Xlsx.sheetNames(zf), blacklist))
        .map(s => XlsxPartition(f, s))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    val conf = sconf // serialized to executors; carries the driver's FS settings
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val XlsxPartition(file, sheet) = partition.asInstanceOf[XlsxPartition]
        new PartitionReader[InternalRow] {
          // Parse eagerly on open: one sheet is one unit of work, and the
          // grid is small relative to the decompressed XML just streamed.
          private val data: Iterator[Array[String]] =
            XlsxSource.withZip(file, conf.value) { zf =>
              val rows = Xlsx.readSheetRows(zf, sheet)
              val hi = XlsxSource.headerIndex(rows)
              if (hi < 0) Iterator.empty
              else {
                val byName = XlsxSource.headerMap(rows(hi)).toMap
                val idx = fields.map(byName.get) // schema field → cell index
                rows.drop(hi + 1).iterator.map { cells =>
                  idx.map {
                    case Some(i) if i < cells.length => cells(i)
                    case _ => null
                  }
                }
              }
            }
          private var current: Array[String] = _
          override def next(): Boolean = {
            if (!data.hasNext) return false
            current = data.next(); true
          }
          override def get(): InternalRow =
            InternalRow.fromSeq(current.toIndexedSeq.map(v =>
              if (v == null) null else UTF8String.fromString(v)))
          override def close(): Unit = ()
        }
      }
    }
  }
}
