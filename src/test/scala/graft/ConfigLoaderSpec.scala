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

  test("the reference YAML loads unmodified == its JSON transcription") {
    // The reference's actual config (configs/detenidos_aprehendidos.yaml,
    // loaded there by etl/yaml_config_loader.py:36 via PyYAML) must parse
    // through the YAML front-end with NO transcription step and produce
    // the exact DatasetConfig its mechanical JSON transcription does —
    // the last porting gap from the reference closed (r13).
    val refPath = java.nio.file.Paths.get(
      "/root/reference/configs/detenidos_aprehendidos.yaml")
    assume(java.nio.file.Files.exists(refPath), "reference yaml not present")
    val fromYaml = ConfigLoader.fromYamlString(
      java.nio.file.Files.readString(refPath))
    val categoryCols = Seq("tipo", "estado_civil", "estatus_migratorio",
      "sexo", "genero", "nacionalidad", "autoidentificacion_etnica",
      "nivel_de_instruccion", "condicion", "movilizacion", "tipo_arma",
      "arma", "lugar", "tipo_lugar", "nombre_zona", "nombre_subzona",
      "nombre_distrito", "nombre_circuito", "nombre_subcircuito",
      "nombre_provincia", "nombre_canton", "nombre_parroquia",
      "presunta_infraccion", "grupo_edad")
    val codeCols = Seq("codigo_iccs", "codigo_distrito", "codigo_circuito",
      "codigo_subcircuito", "codigo_provincia", "codigo_canton",
      "codigo_parroquia", "hora_detencion_aprehension")
    val orderCols = Seq("codigo_iccs", "fecha_detencion_aprehension",
      "hora_detencion_aprehension", "tipo", "presunta_infraccion",
      "estado_civil", "estatus_migratorio", "edad", "sexo", "genero",
      "nacionalidad", "autoidentificacion_etnica", "nivel_de_instruccion",
      "condicion", "movilizacion", "tipo_arma", "arma", "lugar",
      "tipo_lugar", "nombre_zona", "nombre_subzona", "codigo_distrito",
      "codigo_circuito", "codigo_subcircuito", "codigo_provincia",
      "codigo_canton", "codigo_parroquia", "nombre_distrito",
      "nombre_circuito", "nombre_subcircuito", "nombre_provincia",
      "nombre_canton", "nombre_parroquia", "latitud", "longitud",
      "grupo_edad", "ano")
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fromJson = ConfigLoader.fromJsonString(s"""{
      "dataset": "detenidos_aprehendidos",
      "allowed_schema_diffs": 0,
      "schema": {"pad_missing": true},
      "promote_policy": {"on_critical_fail": "error",
        "fail_on_missing_expected": true, "fail_on_extra_columns": false,
        "fail_on_schema_drift": false},
      "normalize": {"na_values": ["", "NA", "N/A", "na", "null", "None",
          "none", "Nan", "NaN"],
        "drop_all_null_rows": true, "drop_all_null_cols": false},
      "rename": {},
      "types": {"datetime": ["fecha_detencion_aprehension"],
        "numeric": ["edad", "latitud", "longitud", "ano"],
        "category": ${arr(categoryCols)},
        "string_codes": ${arr(codeCols)}},
      "order": ${arr(orderCols)},
      "critical": {"all": ["fecha_detencion_aprehension", "presunta_infraccion"],
        "any_of": [["codigo_provincia", "codigo_canton", "codigo_parroquia"],
                   ["nombre_provincia", "nombre_canton", "nombre_parroquia"]]},
      "recommended": [["latitud", "longitud"]],
      "categories": {"sexo": {
        "map": {"m": "Masculino", "masculino": "Masculino",
                "f": "Femenino", "femenino": "Femenino"},
        "allowed": ["Masculino", "Femenino"], "coerce_to": null}},
      "numeric_rules": {"edad": {"min": 0, "max": 120},
        "latitud": {"min": -5.5, "max": 2.5},
        "longitud": {"min": -92.5, "max": -74.5}},
      "id_strategy": {"mode": "composite_first",
        "single_key": ["codigo_iccs"],
        "composite_key": ["codigo_iccs", "fecha_detencion_aprehension",
          "codigo_provincia", "codigo_canton"],
        "composite_allow_nulls": true,
        "surrogate": {"enabled": true, "method": "uuid5",
          "namespace": "https://tu-org.ec/mdi/detenidos_aprehendidos",
          "fields": ["codigo_iccs", "fecha_detencion_aprehension",
            "codigo_provincia", "codigo_canton"]}},
      "integrity": {"enforce_unique_business_key": true,
        "on_duplicate": "keep_latest_by_fecha"},
      "derive": {"ano_from_fecha": true},
      "load": {"table": "detenidos_aprehendidos",
        "upsert_key": "surrogate_id", "extras_json_column": "extras"}
    }""")
    assert(fromYaml == fromJson)
    // Spot-check the YAML parser actually saw the non-trivial shapes.
    assert(fromYaml.categories("sexo").map("masculino") == "Masculino")
    assert(fromYaml.categories("sexo").coerceTo.isEmpty) // coerce_to: null
    assert(fromYaml.numericRules("longitud") ==
      NumericRule(Some(-92.5), Some(-74.5)))
    assert(fromYaml.deriveYear.contains(
      ("fecha_detencion_aprehension", "ano")))
    assert(fromYaml.order.size == 37)
  }

  test("YAML front-end: flow/quoted/null/comment edge shapes") {
    val cfg = ConfigLoader.fromYamlString(
      """# leading comment
        |dataset: ds1   # trailing comment
        |normalize:
        |  na_values: ["", 'NA', "a # not-comment"]
        |rename: {}
        |types:
        |  numeric: [edad]
        |categories:
        |  "sexo":
        |    map:
        |      "m": "Masculino"
        |    coerce_to: null
        |recommended:
        |  - [latitud, longitud]
        |  - observaciones
        |numeric_rules:
        |  lat: {min: -5.5, max: 2.5}
        |""".stripMargin)
    assert(cfg.dataset == "ds1")
    assert(cfg.normalize.naValues == Seq("", "NA", "a # not-comment"))
    assert(cfg.rename.isEmpty)
    assert(cfg.types.numeric == Seq("edad"))
    assert(cfg.categories("sexo").map == Map("m" -> "Masculino"))
    assert(cfg.categories("sexo").coerceTo.isEmpty)
    assert(cfg.recommended == Seq(Seq("latitud", "longitud"),
      Seq("observaciones")))
    assert(cfg.numericRules("lat") == NumericRule(Some(-5.5), Some(2.5)))
  }

  test("YAML front-end: zero-indent block sequences, misaligned nesting " +
      "rejected, PyYAML float typing") {
    import org.json4s._
    // `key:` followed by `- item` at the KEY's indent — PyYAML-valid and
    // common; the dash run is the key's value.
    assert(graft.config.Yaml.parse(
      "types:\n- a\n- b\nnext: 1\nnested:\n  inner:\n  - x\n  k: 2\n") ==
      JObject(List(
        "types" -> JArray(List(JString("a"), JString("b"))),
        "next" -> JInt(1),
        "nested" -> JObject(List(
          "inner" -> JArray(List(JString("x"))),
          "k" -> JInt(2))))))
    // A nested block whose later line dedents below its first entry used
    // to be silently DROPPED; PyYAML rejects it — so do we, loudly.
    val e = intercept[IllegalArgumentException] {
      graft.config.Yaml.parse("key:\n    a: 1\n  b: 2\n")
    }
    assert(e.getMessage.contains("line 3"))
    // A sequence may not follow a key that already has an inline value.
    intercept[IllegalArgumentException] {
      graft.config.Yaml.parse("key: v\n- item\n")
    }
    // safe_load float resolution requires a dot: `1e3` is a STRING.
    assert(graft.config.Yaml.parse("v: 1e3") ==
      JObject(List("v" -> JString("1e3"))))
    assert(graft.config.Yaml.parse("v: 1.0e3") ==
      JObject(List("v" -> JDouble(1000.0))))
    assert(graft.config.Yaml.parse("v: -2.5") ==
      JObject(List("v" -> JDouble(-2.5))))
    // And the config path accepts the zero-indent style end-to-end.
    val cfg = ConfigLoader.fromYamlString(
      "dataset: d0\nrecommended:\n- obs\n- [a, b]\n")
    assert(cfg.recommended == Seq(Seq("obs"), Seq("a", "b")))
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
