package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly primitives: concatenate-and-split packing
  * and overlapping document chunking — the "shape the corpus into model
  * inputs" stage that follows cleaning/dedup in an LLM data pipeline.
  */
object Pack {

  /** Distributed exclusive prefix sum of `valCol` over `keyCol` order
    * (keys must be non-negative: bucketing uses truncating `div`).
    * Returns (keyCol, "off") where off = sum of valCol over all rows with
    * strictly smaller keys.
    *
    * Recursive two-phase split: keys group into super-buckets of `fanout`
    * consecutive key values, so every within-super window partition holds
    * at most `fanout` rows; the super-bucket totals frame (≤ n/1 of the
    * input, typically n/fanout) recurses until one bucket's worth
    * remains. Depth is log_fanout(n); the ONLY unpartitioned window runs
    * over ≤ `fanout` rows at the recursion floor; level joins are keyed
    * on the super-bucket the window already partitioned by (exchange
    * reuse), with no forced broadcast — AQE may still choose one when a
    * level's offsets frame is genuinely small.
    *
    * Each level's input is materialized so the per-level row count (the
    * recursion guard) is a cheap driver action, not a recompute.
    */
  private[graft] def exclusivePrefix(totals: DataFrame, keyCol: String,
      valCol: String, fanout: Int): DataFrame = {
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    val t = Materialize(totals.select(
      col(keyCol).cast("long").as("k"), col(valCol).cast("long").as("v")))
    if (t.count() <= fanout) {
      val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
      t.select(col("k").as(keyCol), coalesce(sum("v").over(w), lit(0L)).as("off"))
    } else {
      val withSb = t.withColumn("sb", expr(s"k div $fanout"))
      val within = Window.partitionBy("sb").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
      val inner = withSb.withColumn("woff", coalesce(sum("v").over(within), lit(0L)))
      val superOff = exclusivePrefix(
          withSb.groupBy("sb").agg(sum("v").as("sv")), "sb", "sv", fanout)
        .withColumnRenamed("off", "soff")
      inner.join(superOff, "sb")
        .select(col("k").as(keyCol), (col("soff") + col("woff")).as("off"))
    }
  }

  /** Concatenate-and-split sequence packing: documents are laid out in
    * `idCol` order as one virtual token stream, which is then cut into
    * fixed-`capacity` training bins. Per document: its first bin, offset
    * inside that bin, and how many bins it spans.
    *
    * Scale posture: the global prefix sum is fully recursive — within-
    * bucket cumulative sums partition by a row-bucket key (`idCol div
    * bucketRows`, an all-parallel window), and the per-bucket totals run
    * through [[exclusivePrefix]], which keeps splitting until one
    * bucket's worth of rows remains. No single-task pass ever sees more
    * than `bucketRows` rows, and no broadcast grows with the input (the
    * offsets join back to the per-doc frame on the bucket key the window
    * already partitioned by).
    */
  def seqPack(df: DataFrame, idCol: String, textCol: String,
      capacity: Int = 256, bucketRows: Int = 50): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .withColumn("bkt", expr(s"doc_id div $bucketRows"))
    val within = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinCum = toks.withColumn("wcum", sum("n_tok").over(within))
    val offsets = exclusivePrefix(
        toks.groupBy("bkt").agg(sum("n_tok").as("btok")), "bkt", "btok",
        fanout = bucketRows)
      .withColumnRenamed("off", "boff")
    withinCum.join(offsets, "bkt")
      .withColumn("cum_end", col("boff") + col("wcum"))
      .select(col("doc_id"), col("n_tok"),
        expr(s"(cum_end - n_tok) div $capacity").as("bin"),
        expr(s"(cum_end - n_tok) % $capacity").as("bin_off"),
        expr(s"(cum_end - 1) div $capacity - (cum_end - n_tok) div $capacity + 1")
          .as("n_bins"))
  }

  /** Overlapping fixed-size chunking: one row per (document, window) with
    * `size`-char chunks every `stride` chars (`size - stride` overlap).
    * Pure narrow projection + explode — no shuffle, fully parallel; the
    * per-row fan-out is bounded by ceil(len/stride).
    */
  def docChunk(df: DataFrame, idCol: String, textCol: String,
      size: Int = 200, stride: Int = 150,
      keep: Seq[String] = Nil): DataFrame =
    df.select(col(idCol).as("doc_id") +: col(textCol).as("text") +:
        keep.map(col): _*)
      .select(col("doc_id") +: col("text") +:
        // greatest(·,1): for EMPTY text, (length-1) div stride would hit
        // Spark's toward-zero `div` (−1 div s = 0 here, −1 in engines
        // with floor division) AND sequence(0, −1), which Spark expands
        // DESCENDING — the guard pins empty docs to exactly one empty
        // chunk on every engine.
        expr(s"explode(sequence(0L, (greatest(length(text), 1) - 1) div $stride))")
          .as("chunk_idx") +: keep.map(col): _*)
      .select(col("doc_id") +: col("chunk_idx") +:
        expr(s"substr(text, CAST(chunk_idx * $stride + 1 AS INT), $size)").as("chunk") +:
        keep.map(col): _*)
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
}
