package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.operators.{Audit, TransformHardFail}

class RunnerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = DatasetConfig(
    dataset = "people",
    padMissing = true,
    types = TypesCfg(numeric = Seq("edad")),
    order = Seq("codigo", "edad"),
    critical = CriticalCfg(all = Seq("codigo")),
    ids = IdStrategy(compositeKey = Seq("codigo"),
      surrogate = SurrogateCfg(enabled = true, method = "sha256")),
    integrity = IntegrityCfg(enforceUniqueBusinessKey = true))

  test("runner: multi-resource transform → upsert target → audit trail") {
    val base = Files.createTempDirectory("graft-run").toString
    val target = base + "/table"
    val audit = base + "/audit"

    val r1 = Seq(("A1", "30"), ("A2", "40")).toDF("Código", "Edad")
    val r2 = Seq(("A2", "41"), ("A3", "50")).toDF("Código", "Edad") // A2 updated
    val res = Runner.run(spark, Map("res1" -> r1, "res2" -> r2), cfg,
      target, audit, runId = "run_1")
    assert(res.status == "ok" && res.rowsInTotal == 4)

    val table = spark.read.parquet(target)
    assert(table.count() == 3) // A1, A2 (updated), A3
    assert(table.filter(col("codigo") === "A2").select("edad").as[Double].head() == 41.0)

    val runs = Audit.readRuns(spark, audit)
    assert(runs.count() == 1 && runs.select("status").as[String].head() == "ok")
    assert(Audit.readResources(spark, audit).count() == 2)
    // No recommended columns configured → no advisories in the audit rows.
    assert(res.resources.forall(_.recommended_warnings.isEmpty))

    // Second run is idempotent: same inputs → same target state.
    Runner.run(spark, Map("res1" -> r1, "res2" -> r2), cfg, target, audit, "run_2")
    assert(spark.read.parquet(target).count() == 3)
    assert(Audit.readRuns(spark, audit).count() == 2)
  }

  test("within-batch duplicate keys keep the LATEST row by latestBy") {
    val base = Files.createTempDirectory("graft-latest").toString
    val cfgLatest = cfg.copy(
      types = TypesCfg(numeric = Seq("edad"), datetime = Seq("fecha")),
      order = Seq("codigo", "edad", "fecha"),
      integrity = IntegrityCfg(enforceUniqueBusinessKey = false,
        latestBy = Some("fecha")))
    // Same key A1 twice in ONE resource: 30 (old) then 99 (new).
    val r = Seq(("A1", "30", "2024-01-01 00:00:00"), ("A1", "99", "2024-06-01 00:00:00"))
      .toDF("Código", "Edad", "Fecha")
    val res = Runner.run(spark, Map("res" -> r), cfgLatest, base + "/t", base + "/a", "run_l")
    val out = spark.read.parquet(base + "/t")
    assert(out.count() == 1)
    assert(out.select("edad").as[Double].head() == 99.0, "stale row won the upsert")
    // Observed in-flight metrics (no separate metric scans): both rows
    // reached the dedup window, and the duplicated key was counted there.
    val m = res.resources.head
    assert(m.rows_in == 2 && m.rows_out == 2 && m.duplicates_key == 1L)
  }

  test("runner: recommended-column advisories reach the audit row") {
    val base = Files.createTempDirectory("graft-rec").toString
    // The geo pair is never supplied (padMissing pads it all-null — the
    // warning must still fire, like the reference's notna().any() check);
    // edad is populated so its singleton group stays silent.
    val cfgRec = cfg.copy(recommended = Seq(Seq("latitud", "longitud"), Seq("edad")))
    val r = Seq(("A1", "30"), ("A2", "40")).toDF("Código", "Edad")
    val res = Runner.run(spark, Map("res" -> r), cfgRec, base + "/t", base + "/a", "run_r")
    assert(res.resources.head.recommended_warnings == "any_of_missing:latitud|longitud")
    // And it is queryable from the persisted audit table.
    val audited = Audit.readResources(spark, base + "/a")
      .select("recommended_warnings").as[String].head()
    assert(audited == "any_of_missing:latitud|longitud")
  }

  test("runner: hard failure still writes the failed-run audit row") {
    val base = Files.createTempDirectory("graft-runfail").toString
    val bad = Seq(("x": String, "y": String)).toDF("otra", "cosa") // no 'codigo'
    intercept[TransformHardFail] {
      Runner.run(spark, Map("res" -> bad), cfg, base + "/t", base + "/a", "run_f")
    }
    val runs = Audit.readRuns(spark, base + "/a")
    assert(runs.select("status").as[String].head() == "failed")
  }
}
