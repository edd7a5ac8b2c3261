package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-xlsx DataSource V2 connector: per-(file, sheet) partition
  * planning (executor-side parse), by-name header alignment across
  * heterogeneous files, sheet blacklist, and column pruning.
  */
class XlsxSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import XlsxFixture.writeXlsx

  private def fixtures(): String = {
    val dir = Files.createTempDirectory("graft-xlsx-dsv2").toString
    writeXlsx(s"$dir/a.xlsx", Seq(
      "1" -> Seq(
        Seq("Código", "Edad"),
        Seq("A1", 30),
        Seq("A2", 31)),
      "2" -> Seq(
        Seq("Código", "Edad"),
        Seq("A3", 32)),
      "Notas" -> Seq(Seq("junk"))))
    // Second file: columns SWAPPED and one extra — alignment is by name.
    writeXlsx(s"$dir/b.xlsx", Seq(
      "1" -> Seq(
        Seq("Edad", "Código", "Extra"),
        Seq(40, "B1", "x"))))
    dir
  }

  test("reads all files and sheets with by-name alignment; one partition per (file, sheet)") {
    val dir = fixtures()
    val df = spark.read.format("graft-xlsx")
      .option("path", dir)
      .option("sheetBlacklist", "notas")
      .load()
    assert(df.columns.toSeq == Seq("codigo", "edad"),
      "schema from the first file's first picked sheet, normalized")
    val rows = df.orderBy("codigo").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      ("A1", "30"), ("A2", "31"), ("A3", "32"),
      ("B1", "40"))) // swapped columns still land by name
    assert(df.rdd.getNumPartitions == 3,
      "a.xlsx sheets 1+2 (Notas blacklisted) + b.xlsx sheet 1")
  }

  test("column pruning reaches the scan") {
    val dir = fixtures()
    val df = spark.read.format("graft-xlsx").option("path", dir)
      .option("sheetBlacklist", "notas").load()
      .select("edad")
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("cols=edad"), s"pruned scan description expected:\n$scan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("30", "31", "32", "40"))
  }

  test("glob paths and missing-path errors") {
    val dir = fixtures()
    val one = spark.read.format("graft-xlsx").option("path", s"$dir/a.xlsx").load()
    assert(one.count() == 3)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-xlsx").load()
    }
  }
}
