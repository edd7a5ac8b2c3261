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
