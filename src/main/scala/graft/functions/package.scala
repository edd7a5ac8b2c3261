package graft

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by graft operators.
  *
  * All helpers compose codegen-friendly Catalyst expressions — no Scala UDFs —
  * so whole-stage codegen spans stay wide and the same logic is expressible
  * as a DuckDB oracle for correctness checks.
  */
package object functions {

  /** Strip accents/diacritics (native expression; reference etl/transform.py:49-51). */
  def stripAccents(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))

  /** Deterministic UUIDv5 of `seed` under a URL-namespace string
    * (reference etl/transform.py:367-370).
    */
  def uuid5(namespace: String, seed: Column): Column =
    GraftBridge.column(
      UuidV5(GraftBridge.expression(lit(namespace)), GraftBridge.expression(seed)))

  /** Free-text normalization: trim → strip accents → lower → collapse runs of
    * whitespace (reference etl/transform.py:61-68 `_norm_text`).
    */
  def normText(c: Column): Column =
    regexp_replace(lower(stripAccents(trim(c))), "\\s+", " ")

  /** Column-NAME normalization → snake_case ascii
    * (reference etl/transform.py:53-59 `_normalize_colname`). Driver-side.
    */
  def normColname(name: String): String = {
    val noAccents = java.text.Normalizer.normalize(name.trim, java.text.Normalizer.Form.NFKD)
      .filterNot(ch => Character.getType(ch) == Character.NON_SPACING_MARK)
    noAccents.toLowerCase
      .replaceAll("[^a-z0-9_]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
  }

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count (whitespace segmentation). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Token count under the sketch tokenizer (SketchHash.tokenize) — use
    * when relating to Shingles-derived counts so both sides segment
    * identically.
    */
  def normTokenCount(c: Column): Column =
    GraftBridge.column(NormTokenCount(GraftBridge.expression(c)))

  /** 16-hex-char content fingerprint (sha256 prefix) — stable across engines. */
  def fingerprint(c: Column): Column = substring(sha2(c, 256), 1, 16)

  /** All 8 unsigned-32-bit lanes of sha256(c) as array<long> — value-
    * identical to `conv(substring(sha2(c, 256), 1+8j, 8), 16, 10)::long`
    * per lane j, minus the hex round-trip (see [[Sha256Lanes]]). */
  def sha256Lanes(c: Column): Column =
    GraftBridge.column(Sha256Lanes(GraftBridge.expression(c)))

  /** Lane 0 of sha256(c) as a long — the single-lane portable hash
    * `conv(substring(sha2(c, 256), 1, 8), 16, 10)::long` without the
    * hex round-trip. */
  def sha256Lane(c: Column): Column =
    GraftBridge.column(Sha256Lane(GraftBridge.expression(c)))

  /** SpaceSaving heavy-hitters summary of a string column: array of
    * (item, count_hi, count_lo) sorted by count_hi desc — approximate
    * top frequent items with a constant-size mergeable sketch (see
    * [[SpaceSavingAgg]]).
    */
  def heavyHitters(item: Column, capacity: Int): Column =
    GraftBridge.column(
      SpaceSavingAgg(GraftBridge.expression(item), capacity).toAggregateExpression())

  /** Elementwise min of fixed-width `array<long>` rows per group — the
    * MinHash signature aggregation (see [[VecMinAgg]]).
    */
  def vecMin(c: Column, width: Int): Column =
    GraftBridge.column(
      VecMinAgg(GraftBridge.expression(c), width).toAggregateExpression())

  /** Count-Min frequency sketch of a string column: struct(total,
    * counters) with a depth×width counter grid, merged by elementwise sum
    * (see [[CountMinAgg]]; read with [[CountMinAgg.estimate]]).
    */
  def countMin(item: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(item), depth, width).toAggregateExpression())

  /** Content-defined chunks of `text` (rolling-hash boundaries, see
    * [[CdcChunks]]): shift-robust, concatenation-lossless.
    */
  def cdcChunks(text: Column, window: Int = 16, maskBits: Int = 5,
      minLen: Int = 32, maxLen: Int = 128): Column =
    GraftBridge.column(
      CdcChunks(GraftBridge.expression(text), window, maskBits, minLen, maxLen))
}
