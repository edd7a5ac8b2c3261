package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize

/** Raw-text cleanup for web-scale curation (SURVEY.md §2.3): HTML
  * stripping, Unicode canonicalization, and a char-bigram language-model
  * quality signal. These run BEFORE dedup/quality scoring in a real
  * pipeline — markup and decomposed Unicode otherwise defeat exact
  * hashing and skew every length/punctuation metric.
  *
  * Scale: everything here is a narrow per-row projection (regexp chains
  * and one native expression — no shuffle, no UDF) except the LM, which
  * adds one bounded-vocabulary aggregate (charset², broadcast back).
  */
object TextClean {

  /** Strip markup from an HTML fragment: tags → space, the common
    * entities unescaped (`&amp;` LAST so `&amp;lt;` can't double-decode),
    * whitespace collapsed. Mirrors the regex-based extraction step of
    * web-corpus pipelines (tag-aware parsers live upstream; by the time
    * text reaches the engine this is the shape of the job). Every piece
    * is a codegen'd built-in and DuckDB-expressible, so oracle-checkable.
    */
  def htmlStrip(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (acc, (ent, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(ent),
        java.util.regex.Matcher.quoteReplacement(ch))
    }
    trim(regexp_replace(unescaped, "[ \\t\\n\\r]+", " "))
  }

  /** Unicode canonical form: NFC-compose (native expression, ASCII
    * fast-path) then drop C0 control characters other than \t \n \r.
    * The canonical storage form before hashing — "e"+U+0301 and "é"
    * must dedup together.
    */
  def nfcClean(c: Column): Column =
    regexp_replace(
      GraftBridge.column(NfcNormalize(GraftBridge.expression(c))),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")

  /** The cleanup GATE: html strip → NFC canonicalize → quality filter
    * (token floor + punctuation ceiling), adding `clean`, `n_tokens`,
    * `punct_ratio` and keeping every input column. Entirely stateless
    * narrow projections — the same call runs under `readStream`
    * unchanged (spec'd in StreamingSpec) and is the gating stage of
    * `x_curation_e2e`. One source for the formula: the batch oracle,
    * the composed pipeline, and the stream can't drift apart.
    */
  def cleanGate(df: DataFrame, textCol: String,
      minTokens: Int = 10, maxPunct: Double = 0.3): DataFrame = {
    val withClean = df.withColumn("clean", nfcClean(htmlStrip(col(textCol))))
    val nChars = length(col("clean")).cast("double")
    val punct = nChars - length(regexp_replace(col("clean"), "[.,!?;:]", "")).cast("double")
    withClean
      .withColumn("n_tokens", graft.functions.tokenCount(col("clean")))
      // nullif guard: an empty clean string must NULL the ratio (and
      // fail the gate) on both engines, not divide by zero.
      .withColumn("punct_ratio",
        round(punct / when(nChars === 0, lit(null)).otherwise(nChars), 6))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") < maxPunct)
  }

  /** Char-bigram multiset of a text column: position i → substr(i, 2).
    * Empty for texts shorter than 2 chars (sequence() would count DOWN
    * from 1 to 0 otherwise — Spark generates descending sequences).
    */
  def charBigrams(c: Column): Column =
    when(length(c) >= 2,
      transform(sequence(lit(1), length(c) - 1), i => c.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Corpus char-bigram counts: (bigram, cnt). The vocabulary is bounded
    * by charset² (a few thousand for natural text), so the result is
    * broadcastable regardless of corpus size.
    */
  def charBigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(charBigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))

  /** Score each document against the corpus char-bigram LM (CCNet-style
    * quality signal, self-trained: no external model in scope). Returns
    * one row per doc with
    *   - n_bigrams, sum_df, min_df — integer-exact (oracle-checkable):
    *     total / minimum corpus frequency of the doc's bigrams, and
    *   - bits_per_char — the float LM score users want: mean
    *     −log2 P(b) under the corpus unigram-of-bigrams distribution
    *     (Laplace-smoothed). High bits_per_char = rare character
    *     transitions = likely garbage/mojibake/boilerplate.
    *
    * Plan shape: one explode + one broadcast join against the bounded
    * count table + one per-doc aggregate. Docs without bigrams keep a
    * row (n_bigrams=0, score null) via the left join on the spine.
    */
  def charLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Materialized (r15): the count table is consumed twice — the
    // driver-side totals row below and the broadcast probe — and each
    // consumer otherwise re-executes the FULL corpus bigram explode +
    // aggregate. The frame itself is vocabulary-bounded (≤ |charset|²
    // rows), so the checkpoint is bytes while the saved pass is a
    // corpus scan (3 corpus passes → 2).
    val counts = Materialize(charBigramCounts(df, textCol))
    val totals = counts.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("vocab")).head()
    val total = totals.getLong(0)
    val vocab = totals.getLong(1)
    val perDoc = df
      .select(col(idCol).as("id"), explode(charBigrams(col(textCol))).as("bigram"))
      .join(broadcast(counts), "bigram")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("cnt")).as("sum_df"),
        min(col("cnt")).as("min_df"),
        sum(-log2((col("cnt") + 1).cast("double") / lit(total + vocab).cast("double")))
          .as("bits_sum"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_df"), lit(0L)).as("sum_df"),
        coalesce(col("min_df"), lit(0L)).as("min_df"),
        (col("bits_sum") / col("n_bigrams")).as("bits_per_char"))
  }
}
