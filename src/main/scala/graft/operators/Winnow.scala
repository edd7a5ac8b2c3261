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
  * Everything runs INSIDE one narrow projection — no join, no shuffle,
  * no state — built so that NO lambda body references a projected array
  * alias. That constraint is load-bearing: CollapseProject inlines
  * aliases into higher-order-function lambdas, and an inlined alias is
  * re-evaluated PER ELEMENT in interpreted eval — a first cut that
  * sliced `col("hs")` inside the window lambda re-tokenized and
  * re-hashed the whole document per window, O(n²·sha) per doc (~17 min
  * single-task at sf0.1). The shapes below pass arrays only as
  * zip_with/transform ARGUMENTS (evaluated once per row): k-grams via a
  * shifted zip chain, window minima via a sparse-table zip tournament
  * on (hash, −pos) structs — lexicographic struct `least` implements
  * the rightmost-min tie rule directly. O(n·k + n·log w) per doc.
  */
object Winnow {

  /** Concatenate j-shifted copies: grams(i) = ts[i..i+k-1] joined by ' '.
    * zip_with pads the shorter side with null and concat propagates it,
    * so trailing (<k)-grams become null — sliced off by the caller. */
  private[graft] def kGrams(ts: Column, k: Int): Column =
    (1 until k).foldLeft(ts) { (acc, j) =>
      zip_with(acc, slice(ts, lit(j + 1), greatest(size(ts) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }

  /** Sliding-window minimum over `st` (array of orderable structs) for
    * window width w, via doubling spans: t_{2s}[i] = least(t_s[i],
    * t_s[i+s]). `least` skips the null padding, so tail entries hold
    * truncated-window minima — the caller slices to the exact window
    * count. */
  private def windowMin(st: Column, w: Int): Column = {
    var span = 1
    var t = st
    while (span * 2 <= w) {
      t = zip_with(t, slice(t, lit(span + 1), greatest(size(t) - span, lit(0))),
        (a, b) => least(a, b))
      span *= 2
    }
    if (span < w)
      t = zip_with(t, slice(t, lit(w - span + 1), greatest(size(t) - (w - span), lit(0))),
        (a, b) => least(a, b))
    t
  }

  /** (id, pos, fp): winnowed fingerprints per document. `pos` is the
    * 0-based token index of the selected k-gram. Docs shorter than k
    * tokens yield no rows; docs with fewer than w k-grams winnow over a
    * single truncated window (the standard degenerate case).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    val ts = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    df.select(col(idCol).as("id"), ts.as("ts"))
      .filter(size(col("ts")) >= k)
      // Each stage references the previous alias ONLY as a row-level
      // argument (slice/size/zip_with inputs), never inside a lambda —
      // inlining by CollapseProject then costs a constant number of
      // re-evaluations per row, not per element.
      .withColumn("grams", slice(kGrams(col("ts"), k), lit(1),
        greatest(size(col("ts")) - (k - 1), lit(0))))
      .withColumn("st", zip_with(col("grams"),
        sequence(lit(0), size(col("grams")) - 1),
        (g, i) => struct(
          // digest-byte lane == conv(substr(sha2-hex))::long, hex-free
          graft.functions.sha256Lane(g).as("fp"),
          (-i).cast("long").as("np"))))
      .withColumn("sel", slice(windowMin(col("st"), w), lit(1),
        greatest(size(col("st")) - (w - 1), lit(1))))
      .select(col("id"), explode(array_distinct(col("sel"))).as("s"))
      .select(col("id"), (-col("s.np")).as("pos"), col("s.fp").as("fp"))
      .distinct()
  }
}
