package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.normText

/** T5/UL2-style span corruption — the denoising-objective preprocessing
  * step of an LLM training pipeline: deterministic pseudo-random token
  * spans are replaced by numbered sentinels in the input, and the target
  * lists each sentinel followed by the tokens it swallowed.
  *
  * Everything is decided by sha256(salt:doc:pos) integer arithmetic —
  * reproducible across runs/engines (no RNG state), and the whole op is
  * doc-keyed windows + one reassembly aggregation per output column, so
  * it scales exactly like sessionization: no cross-document traffic
  * beyond the hash-partition on doc id.
  */
object SpanMask {

  /** Returns (id, masked_input, target, n_masked, n_spans).
    *
    * A span STARTS at position p when H1(p) % 1000 < startPermille; its
    * length is minLen + H2(p) % (maxLen-minLen+1). Overlapping spans
    * merge into one sentinel run (the standard T5 behavior after span
    * sampling), numbered <m0>, <m1>, ... per document in order.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      startPermille: Int = 80, minLen: Int = 2, maxLen: Int = 4,
      salt: String = "m"): DataFrame = {
    require(maxLen >= minLen && minLen >= 1)
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(normText(col(textCol)), " ")).as(Seq("pos", "tok")))
    val hx = sha2(concat_ws(":", lit(salt), col("id"), col("pos")), 256)
    val h1 = conv(substring(hx, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(hx, 9, 8), 16, 10).cast("long")
    val spanLen = (h2 % (maxLen - minLen + 1)).cast("int") + minLen
    val w = Window.partitionBy("id").orderBy("pos")
    val wSpan = w.rowsBetween(-(maxLen - 1), 0)
    val runs = toks
      .withColumn("start", (h1 % 1000) < startPermille)
      .withColumn("span_end", when(col("start"), col("pos") + spanLen - 1))
      .withColumn("masked",
        coalesce(max(col("span_end")).over(wSpan) >= col("pos"), lit(false)))
      .withColumn("new_run",
        col("masked") && !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("run_idx",
        sum(when(col("new_run"), 1).otherwise(0)).over(w))
    val sentinel = concat(lit("<m"), (col("run_idx") - 1).cast("string"), lit(">"))
    // BOTH reassemblies and the stats come out of ONE aggregation over the
    // single window pipeline: per-row conditional pieces (null = token
    // absent from that side; array_join skips nulls after the positional
    // sort), conditional sums for the counters. A join-of-three-branches
    // formulation re-evaluated the explode+window chain once per branch
    // (4 corpus scans in the plan); this shape scans once. Every doc
    // tokenizes to >= 1 row, so no outer join back is needed.
    def assembled(piece: Column) =
      array_join(transform(
        sort_array(collect_list(struct(col("pos"), piece.as("p")))),
        s => s("p")), " ")
    runs.groupBy(col("id"))
      .agg(
        assembled(when(!col("masked"), col("tok"))
          .when(col("new_run"), sentinel)).as("masked_input"),
        assembled(when(col("masked"),
          when(col("new_run"), concat(sentinel, lit(" "), col("tok")))
            .otherwise(col("tok")))).as("target"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("new_run"), 1L).otherwise(0L)).as("n_spans"))
  }
}
