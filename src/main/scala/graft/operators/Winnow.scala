package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting scheme): hash every k-gram, slide a
  * window of w hashes, keep each window's minimum (rightmost on ties).
  * Guarantees: any shared substring of length ≥ w+k−1 produces at least
  * one shared fingerprint, and fingerprint density is ~2/(w+1) —
  * position-robust dedup signatures at a fraction of full-shingle cost.
  *
  * Everything runs INSIDE one narrow projection with higher-order array
  * functions — no join, no shuffle, no state: per doc the k-gram hashes,
  * the w-windows, and the rightmost-min selection are array ops, then one
  * explode publishes (pos, fp) rows. The hash is the portable sha256
  * prefix, so the whole selection is integer-exact cross-engine (oracled
  * by x_winnow_fingerprint).
  */
object Winnow {

  /** (id, pos, fp): winnowed fingerprints per document. `pos` is the
    * 0-based token index of the selected k-gram. Docs shorter than k
    * tokens yield no rows; docs with fewer than w k-grams winnow over a
    * single truncated window (the standard degenerate case).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    val ts = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // k-gram portable hashes: int64 from the first 8 hex chars of sha256.
    val hs = transform(
      sequence(lit(0), size(col("ts")) - k),
      i => conv(substring(sha2(concat_ws(" ", slice(col("ts"), i + 1, lit(k))), 256),
        1, 8), 16, 10).cast("long"))
    // One (pos, fp) per window: mn = window min, selected position =
    // RIGHTMOST occurrence of mn (robust winnowing's tie rule), found by
    // first-position in the reversed window.
    val sel = transform(
      sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
      j => {
        val win = slice(col("hs"), j + 1, lit(w))
        val mn = array_min(win)
        val rpos = array_position(reverse(win), mn)
        struct((j + size(win) - rpos).cast("long").as("pos"), mn.as("fp"))
      })
    df.select(col(idCol).as("id"), ts.as("ts"))
      .filter(size(col("ts")) >= k)
      .withColumn("hs", hs)
      .withColumn("sel", sel)
      .select(col("id"), explode(col("sel")).as("s"))
      .select(col("id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
      .distinct()
  }
}
