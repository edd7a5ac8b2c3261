package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.operators.Transform
import graft.sources.Ingest

class ConfigLoaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The reference YAML (configs/detenidos_aprehendidos.yaml) transcribed
    * to the JSON shape — exercises every section of the loader.
    */
  private val json =
    """{
      "dataset": "detenidos_aprehendidos",
      "allowed_schema_diffs": 0,
      "schema": {"pad_missing": true},
      "promote_policy": {
        "on_critical_fail": "error",
        "fail_on_missing_expected": true,
        "fail_on_extra_columns": false
      },
      "normalize": {"na_values": ["", "NA", "null"], "drop_all_null_rows": true},
      "rename": {"Fecha": "fecha_detencion"},
      "types": {
        "datetime": ["fecha_detencion"],
        "numeric": ["edad"],
        "category": ["sexo"],
        "string_codes": ["codigo_iccs"]
      },
      "order": ["codigo_iccs", "fecha_detencion", "edad", "sexo"],
      "critical": {"all": ["fecha_detencion"], "any_of": [["codigo_iccs", "sexo"]]},
      "recommended": [["latitud", "longitud"], "observaciones"],
      "categories": {
        "sexo": {
          "map": {"m": "Masculino", "f": "Femenino"},
          "allowed": ["Masculino", "Femenino"],
          "coerce_to": "Desconocido"
        }
      },
      "numeric_rules": {"edad": {"min": 0, "max": 120}},
      "id_strategy": {
        "mode": "composite_first",
        "composite_key": ["codigo_iccs", "fecha_detencion"],
        "surrogate": {
          "enabled": true, "method": "uuid5",
          "namespace": "https://example.org/mdi",
          "fields": ["codigo_iccs", "fecha_detencion"]
        }
      },
      "integrity": {
        "enforce_unique_business_key": true,
        "on_duplicate": "keep_latest",
        "latest_by": "fecha_detencion",
        "tie_breakers": ["codigo_iccs"]
      },
      "derive": {"year_from": "fecha_detencion", "year_col": "ano"},
      "load": {"table": "detenidos", "upsert_key": "surrogate_id",
               "extras_json_column": "extras"}
    }"""

  test("JSON config loads every section with reference-shaped keys") {
    val cfg = ConfigLoader.fromJsonString(json)
    assert(cfg.dataset == "detenidos_aprehendidos")
    assert(cfg.padMissing)
    assert(cfg.normalize.naValues == Seq("", "NA", "null") && cfg.normalize.dropAllNullRows)
    assert(cfg.rename == Map("Fecha" -> "fecha_detencion"))
    assert(cfg.types.datetime == Seq("fecha_detencion") && cfg.types.numeric == Seq("edad"))
    assert(cfg.critical.anyOf == Seq(Seq("codigo_iccs", "sexo")))
    assert(cfg.categories("sexo").coerceTo.contains("Desconocido"))
    assert(cfg.numericRules("edad") == NumericRule(Some(0.0), Some(120.0)))
    assert(cfg.ids.compositeKey == Seq("codigo_iccs", "fecha_detencion"))
    assert(cfg.ids.surrogate.enabled && cfg.ids.surrogate.method == "uuid5")
    assert(cfg.integrity.latestBy.contains("fecha_detencion"))
    assert(cfg.deriveYear.contains(("fecha_detencion", "ano")))
    assert(cfg.load.extrasJsonColumn.contains("extras"))
    assert(cfg.expectedColumns.contains("latitud")) // via recommended
    // Reference-style mixed items: bare string ≡ singleton any-of group.
    assert(cfg.recommended == Seq(Seq("latitud", "longitud"), Seq("observaciones")))
  }

  test("file round-trip + the loaded config drives the pipeline") {
    val p = Files.createTempDirectory("graft-cfg").resolve("ds.json")
    Files.writeString(p, json)
    val cfg = ConfigLoader.fromJsonFile(spark, p.toString)
    val raw = Seq(
      ("0101", "2024-03-04 10:00:00", "34", "m"),
      ("0101", "2024-03-05 11:00:00", "200", "f"), // same key parts? no — different fecha
      ("0102", "2024-03-04 12:00:00", "x", "desconocido")
    ).toDF("Codigo ICCS", "Fecha", "Edad", "Sexo")
    val out = Transform.pipeline(raw, cfg)
    val cols = out.columns.toSeq
    assert(cols.take(2) == Seq("surrogate_id", "business_key"))
    assert(cols.containsSlice(Seq("codigo_iccs", "fecha_detencion", "edad", "sexo")))
    val rows = out.orderBy("codigo_iccs", "fecha_detencion")
      .selectExpr("sexo", "edad", "ano").collect()
    assert(rows(0).getString(0) == "Masculino")
    assert(rows(1).getString(0) == "Femenino" && rows(1).isNullAt(1)) // 200 → null
    assert(rows(2).getString(0) == "Desconocido" && rows(2).isNullAt(1)) // 'x' → null
    assert(rows.forall(_.getInt(2) == 2024))
  }

  test("ingest blacklist skips matching resources") {
    val dir = Files.createTempDirectory("graft-bl").toString
    Seq((1, "a")).toDF("id", "v").coalesce(1).write.parquet(dir + "/keep_data")
    Seq((2, "b")).toDF("id", "v").coalesce(1).write.parquet(dir + "/skip_contenido")
    val cfg = Ingest.SourceCfg("parquet", dir, "*/part-*.parquet")
    val (allFiles, _) = Ingest.newFiles(spark, cfg, Map.empty)
    assert(allFiles.size == 2)
    // Blacklist applies to file names; target the directory via glob filter
    val cfgBl = cfg.copy(glob = "keep_*/part-*.parquet")
    val (kept, _) = Ingest.newFiles(spark, cfgBl, Map.empty)
    assert(kept.size == 1)
    val cfgBl2 = Ingest.SourceCfg("parquet", dir, "*/part-*.parquet",
      blacklist = Seq("part-00000"))
    val (none, _) = Ingest.newFiles(spark, cfgBl2, Map.empty)
    assert(none.isEmpty)
  }

  test("ingest reads csv and json formats") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "r1.csv"), "id,v\n1,a\n2,b\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "r2.json"),
      "{\"id\":3,\"v\":\"c\"}\n{\"id\":4,\"v\":\"d\"}\n")
    val csv = Ingest.extractUpdated(spark,
      Ingest.SourceCfg("csv", dir, "*.csv"), dir + "/s1.properties")
    assert(csv.get._1.count() == 2)
    val jsonDf = Ingest.extractUpdated(spark,
      Ingest.SourceCfg("json", dir, "*.json"), dir + "/s2.properties")
    assert(jsonDf.get._1.count() == 2)
  }
}
