package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly primitives: concatenate-and-split packing
  * and overlapping document chunking — the "shape the corpus into model
  * inputs" stage that follows cleaning/dedup in an LLM data pipeline.
  */
object Pack {

  /** Concatenate-and-split sequence packing: documents are laid out in
    * `idCol` order as one virtual token stream, which is then cut into
    * fixed-`capacity` training bins. Per document: its first bin, offset
    * inside that bin, and how many bins it spans.
    *
    * Scale posture: the global prefix sum is TWO-PHASE — within-bucket
    * cumulative sums partition by a row-bucket key (`idCol div
    * bucketRows`, an all-parallel window), and only the per-bucket totals
    * (rows/bucketRows of them) go through the small global-order window,
    * whose output broadcasts back. No single-partition pass ever sees
    * more than `bucketRows` rows or the bucket-total frame; at 100 TB the
    * bucket-total frame (~rows/1e3) would recurse through the same
    * two-phase split once more.
    */
  def seqPack(df: DataFrame, idCol: String, textCol: String,
      capacity: Int = 256, bucketRows: Int = 50): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .withColumn("bkt", expr(s"doc_id div $bucketRows"))
    val within = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinCum = toks.withColumn("wcum", sum("n_tok").over(within))
    val bucketTotals = toks.groupBy("bkt").agg(sum("n_tok").as("btok"))
    // Exclusive prefix over bucket totals: tiny frame (rows/bucketRows),
    // the only global-order window in the op.
    val exclusive = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boff", coalesce(sum("btok").over(exclusive), lit(0L)))
      .select("bkt", "boff")
    withinCum.join(broadcast(offsets), "bkt")
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
      size: Int = 200, stride: Int = 150): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"), col("text"),
        // greatest(·,1): for EMPTY text, (length-1) div stride would hit
        // Spark's toward-zero `div` (−1 div s = 0 here, −1 in engines
        // with floor division) AND sequence(0, −1), which Spark expands
        // DESCENDING — the guard pins empty docs to exactly one empty
        // chunk on every engine.
        expr(s"explode(sequence(0L, (greatest(length(text), 1) - 1) div $stride))")
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substr(text, CAST(chunk_idx * $stride + 1 AS INT), $size)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
}
