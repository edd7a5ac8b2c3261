package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.operators.Audit
import graft.sources.Ingest

/** The reference's WHOLE loop in one spec — STATE → EXTRACT (staged CSV,
  * incremental by mtime) → TRANSFORM (config-driven pipeline) → LOAD
  * (upsert + audit) → state promotion — then a second incremental drop.
  * This is the "a user of the reference switches to graft" path walked
  * end to end on messy reference-shaped input (accented headers, NA
  * tokens, out-of-bounds numerics, duplicate business keys).
  */
class ReferenceE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = DatasetConfig(
    dataset = "detenidos_like",
    padMissing = true,
    normalize = NormalizeCfg(naValues = Seq("", "NA", "null")),
    types = TypesCfg(datetime = Seq("fecha"), numeric = Seq("edad")),
    order = Seq("codigo", "fecha", "edad"),
    critical = CriticalCfg(all = Seq("codigo")),
    numericRules = Map("edad" -> NumericRule(min = Some(0), max = Some(120))),
    ids = IdStrategy(compositeKey = Seq("codigo"),
      surrogate = SurrogateCfg(enabled = true, method = "sha256")),
    integrity = IntegrityCfg(enforceUniqueBusinessKey = true,
      latestBy = Some("fecha")))

  test("state -> extract -> transform -> load -> audit -> promote, twice, incrementally") {
    val base = Files.createTempDirectory("graft-e2e").toString
    val landing = base + "/landing"
    val statePath = base + "/state.properties"
    val target = base + "/table"
    val auditDir = base + "/audit"
    new java.io.File(landing).mkdirs()

    // Drop 1: messy reference-shaped CSV (accented headers, NA tokens,
    // an out-of-bounds age, a duplicate key with an older fecha).
    val csv1 = Seq(
      "Código,Edad,Fecha",
      "A1,30,2024-01-10 00:00:00",
      "A1,31,2024-03-01 00:00:00", // same key, newer -> wins
      "A2,NA,2024-02-02 00:00:00",
      "A3,999,2024-02-03 00:00:00" // out of bounds -> NULL edad
    ).mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(landing + "/drop1.csv"),
      csv1.getBytes("UTF-8"))

    val srcCfg = Ingest.SourceCfg(format = "csv", dir = landing, glob = "drop*.csv")
    val first = Ingest.extractUpdated(spark, srcCfg, statePath)
    assert(first.isDefined, "first extract must see drop1")
    val (raw1, st1) = first.get

    val res1 = Runner.run(spark, Map("drop1" -> raw1), cfg, target, auditDir, "run_1")
    // State promotion ONLY after a successful load (the reference's
    // contract) — next extract with no new files sees nothing.
    Ingest.saveState(spark, statePath, st1)
    assert(Ingest.extractUpdated(spark, srcCfg, statePath).isEmpty)

    assert(res1.status == "ok" && res1.rowsInTotal == 4)
    val t1 = spark.read.parquet(target)
    assert(t1.count() == 3) // A1 (deduped), A2, A3
    assert(t1.filter(col("codigo") === "A1").select("edad").as[Double].head() == 31.0)
    assert(t1.filter(col("codigo") === "A3").select("edad").isEmpty ||
      t1.filter(col("codigo") === "A3" && col("edad").isNull).count() == 1)
    val m1 = res1.resources.head
    // enforceUniqueBusinessKey dedups INSIDE the pipeline, so the audit
    // window sees no remaining duplicate keys; the dropped copy shows up
    // as dedup_rows_dropped (= rows_in − rows_out), same as the
    // reference's report.
    assert(m1.duplicates_key == 0 && m1.rows_out == 3 && m1.dedup_rows_dropped == 1)

    // Drop 2: updates A2, inserts A4 — extract sees ONLY the new file.
    val csv2 = Seq(
      "Código,Edad,Fecha",
      "A2,40,2024-04-01 00:00:00",
      "A4,50,2024-04-02 00:00:00").mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(landing + "/drop2.csv"),
      csv2.getBytes("UTF-8"))
    val second = Ingest.extractUpdated(spark, srcCfg, statePath)
    assert(second.isDefined)
    val (raw2, st2) = second.get
    assert(raw2.count() == 2, "incremental extract must read only drop2")

    val res2 = Runner.run(spark, Map("drop2" -> raw2), cfg, target, auditDir, "run_2")
    Ingest.saveState(spark, statePath, st2)
    assert(res2.status == "ok")

    val t2 = spark.read.parquet(target).orderBy("codigo")
    assert(t2.count() == 4) // A1, A2 (updated), A3, A4
    assert(t2.filter(col("codigo") === "A2").select("edad").as[Double].head() == 40.0)
    assert(t2.filter(col("codigo") === "A1").select("edad").as[Double].head() == 31.0,
      "non-updated key must survive the second load")

    // Audit trail: two runs, two resource rows, surrogate ids present.
    assert(Audit.readRuns(spark, auditDir).count() == 2)
    assert(Audit.readResources(spark, auditDir).count() == 2)
    assert(t2.filter(length(col("surrogate_id")) === 64).count() == 4)
  }

  test("remote catalog -> xlsx download -> ingest -> transform -> load -> promote, incrementally") {
    import graft.sources.{Catalog, Xlsx}
    val base = Files.createTempDirectory("graft-cat-e2e").toString
    val rawDir = base + "/raw"
    val catState = base + "/catalog_state.json"
    val ingState = base + "/ingest_state.properties"
    val target = base + "/table"
    val auditDir = base + "/audit"

    // The remote resource: a two-sheet xlsx (numeric data sheets + a
    // blacklisted notes sheet), served by a scripted fetcher — the
    // reference's CKAN package with one spreadsheet resource.
    val xlsxPath = base + "/fixture.xlsx"
    XlsxFixture.writeXlsx(xlsxPath, Seq(
      "1" -> Seq(
        Seq("Código", "Edad", "Fecha"),
        Seq("A1", 30, "2024-01-10 00:00:00"),
        Seq("A2", 41, "2024-02-02 00:00:00")),
      "Notas" -> Seq(Seq("junk"))))
    val xlsxBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(xlsxPath))
    def pkg(lastMod: String) =
      s"""{"success": true, "result": {"resources": [
         |  {"id": "r1", "name": "detenciones", "url": "http://x/d1",
         |   "format": "XLSX", "last_modified": "$lastMod", "size": ${xlsxBytes.length}}
         |]}}""".stripMargin
    def fetcher(lastMod: String) = new Catalog.Fetcher {
      override def get(url: String, params: Map[String, String]): Catalog.FetchResponse =
        url match {
          case "api" => Catalog.FetchResponse(200, pkg(lastMod).getBytes("UTF-8"))
          case "http://x/d1" => Catalog.FetchResponse(200, xlsxBytes)
          case other => fail(s"unexpected fetch: $other")
        }
    }

    // Pass 1: catalog sync stages the xlsx; ingest + pipeline + load.
    val s1 = Catalog.sync(spark, fetcher("2024-03-01T00:00:00"), "api", "pkg",
      "deten", rawDir, catState)
    assert(s1.downloaded == Seq(s"$rawDir/detenciones.xlsx"))
    val srcCfg = Ingest.SourceCfg(format = "xlsx", dir = rawDir, glob = "*.xlsx",
      sheetBlacklist = Seq("notas"))
    val (raw1, st1) = Ingest.extractUpdated(spark, srcCfg, ingState).get
    val res1 = Runner.run(spark, Map("detenciones" -> raw1), cfg, target, auditDir, "run_c1")
    assert(res1.status == "ok" && res1.rowsInTotal == 2)
    // Promote BOTH states only after the load landed (reference contract).
    Ingest.saveState(spark, ingState, st1)
    Catalog.saveCatalogState(spark, catState, s1.state)
    assert(spark.read.parquet(target).count() == 2)

    // Pass 2, nothing changed upstream: no download, no re-extract.
    val s2 = Catalog.sync(spark, fetcher("2024-03-01T00:00:00"), "api", "pkg",
      "deten", rawDir, catState)
    assert(s2.downloaded.isEmpty && s2.unchanged == 1)
    assert(Ingest.extractUpdated(spark, srcCfg, ingState).isEmpty)

    // Pass 3, resource republished (new last_modified): the full chain
    // re-runs and the upsert keeps the table idempotent.
    val s3 = Catalog.sync(spark, fetcher("2024-04-01T00:00:00"), "api", "pkg",
      "deten", rawDir, catState)
    assert(s3.downloaded.size == 1 &&
      s3.reasons == Seq(Catalog.DiffReason("r1", "last_modified")))
    val (raw3, st3) = Ingest.extractUpdated(spark, srcCfg, ingState).get
    val res3 = Runner.run(spark, Map("detenciones" -> raw3), cfg, target, auditDir, "run_c2")
    assert(res3.status == "ok")
    Ingest.saveState(spark, ingState, st3)
    Catalog.saveCatalogState(spark, catState, s3.state)
    assert(spark.read.parquet(target).count() == 2, "upsert on same keys stays 2 rows")
    assert(Audit.readRuns(spark, auditDir)
      .filter(col("run_id").startsWith("run_c")).count() == 2)
  }

  test("saveState promotes atomically: every crash window still loads a consistent state") {
    val base = Files.createTempDirectory("graft-state").toString
    val statePath = base + "/state.properties"
    Ingest.saveState(spark, statePath, Map("r1" -> 100L))

    // Crash window A: killed mid-.tmp-write — a torn .tmp sits next to an
    // untouched state file. Load must ignore it; the next save overwrites.
    java.nio.file.Files.write(java.nio.file.Paths.get(statePath + ".tmp"),
      "r1=torn-garbag".getBytes("UTF-8"))
    assert(Ingest.loadState(spark, statePath) == Map("r1" -> 100L))
    Ingest.saveState(spark, statePath, Map("r1" -> 200L))
    assert(Ingest.loadState(spark, statePath) == Map("r1" -> 200L))

    // Crash window B: killed between "state -> .old" and ".tmp -> state"
    // — only .old remains. Load heals it back to the previous complete
    // state (the save never completed, so the caller re-extracts — the
    // incremental contract, not data loss).
    assert(new java.io.File(statePath)
      .renameTo(new java.io.File(statePath + ".old")))
    assert(!new java.io.File(statePath).exists())
    assert(Ingest.loadState(spark, statePath) == Map("r1" -> 200L))
    assert(new java.io.File(statePath).exists(), "heal must restore the state file")

    // A clean save after healing leaves no residue files behind.
    Ingest.saveState(spark, statePath, Map("r1" -> 300L, "r2" -> 1L))
    assert(Ingest.loadState(spark, statePath) == Map("r1" -> 300L, "r2" -> 1L))
    assert(!new java.io.File(statePath + ".old").exists())
    assert(!new java.io.File(statePath + ".tmp").exists())
  }
}
