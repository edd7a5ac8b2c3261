package graft.config

/** Typed configuration mirroring the reference's declarative YAML surface
  * (reference configs/detenidos_aprehendidos.yaml, loaded by
  * etl/yaml_config_loader.py). Idiomatic-Scala replacement: a case-class DSL
  * instead of YAML parsing — the structure and defaults match the reference
  * key-for-key so any reference config can be transcribed mechanically.
  */
final case class TypesCfg(
    datetime: Seq[String] = Nil,
    numeric: Seq[String] = Nil,
    category: Seq[String] = Nil,
    stringCodes: Seq[String] = Nil)

final case class NormalizeCfg(
    naValues: Seq[String] = Nil,
    dropAllNullRows: Boolean = false,
    dropAllNullCols: Boolean = false)

/** Category-domain rule (reference etl/transform.py:284-318). */
final case class CategoryRule(
    map: Map[String, String] = Map.empty,
    allowed: Seq[String] = Nil,
    coerceTo: Option[String] = None)

/** Numeric bounds rule (reference etl/transform.py:320-350). */
final case class NumericRule(min: Option[Double] = None, max: Option[Double] = None)

final case class SurrogateCfg(
    enabled: Boolean = false,
    method: String = "uuid5", // uuid5 | sha256
    namespace: String = "",
    fields: Seq[String] = Nil)

/** Key strategy (reference etl/transform.py:415-422, yaml id_strategy). */
final case class IdStrategy(
    mode: String = "composite_first",
    singleKey: Seq[String] = Nil,
    compositeKey: Seq[String] = Nil,
    compositeAllowNulls: Boolean = true,
    surrogate: SurrogateCfg = SurrogateCfg())

/** Dedup policy (reference etl/transform.py:495-507 + yaml integrity).
  * `latestBy`/`tieBreakers` make "keep latest"/"keep first" deterministic in
  * a distributed engine (pandas relied on input row order).
  */
final case class IntegrityCfg(
    enforceUniqueBusinessKey: Boolean = false,
    onDuplicate: String = "keep_first", // keep_first | keep_latest
    latestBy: Option[String] = None,
    tieBreakers: Seq[String] = Nil)

final case class CriticalCfg(all: Seq[String] = Nil, anyOf: Seq[Seq[String]] = Nil)

final case class PromotePolicy(
    onCriticalFail: String = "error", // error | warn
    failOnMissingExpected: Boolean = true,
    failOnExtraColumns: Boolean = false,
    failOnSchemaDrift: Boolean = false)

final case class LoadCfg(
    table: String = "",
    upsertKey: String = "surrogate_id",
    extrasJsonColumn: Option[String] = None)

final case class DatasetConfig(
    dataset: String,
    allowedSchemaDiffs: Int = 0,
    padMissing: Boolean = false,
    promote: PromotePolicy = PromotePolicy(),
    normalize: NormalizeCfg = NormalizeCfg(),
    rename: Map[String, String] = Map.empty,
    types: TypesCfg = TypesCfg(),
    order: Seq[String] = Nil,
    critical: CriticalCfg = CriticalCfg(),
    recommended: Seq[Seq[String]] = Nil,
    categories: Map[String, CategoryRule] = Map.empty,
    numericRules: Map[String, NumericRule] = Map.empty,
    ids: IdStrategy = IdStrategy(),
    integrity: IntegrityCfg = IntegrityCfg(),
    /** (sourceDateCol, targetYearCol) — reference `derive.ano_from_fecha`. */
    deriveYear: Option[(String, String)] = None,
    load: LoadCfg = LoadCfg()) {

  /** Expected canonical columns (reference etl/transform.py:188-231). */
  def expectedColumns: Set[String] = {
    import graft.functions.normColname
    val fromTypes = types.datetime ++ types.numeric ++ types.category ++ types.stringCodes
    val fromCritical = critical.all ++ critical.anyOf.flatten
    val fromRename = rename.values
    (fromTypes ++ order ++ fromCritical ++ recommended.flatten ++ fromRename)
      .map(normColname).filter(_.nonEmpty).toSet
  }
}
