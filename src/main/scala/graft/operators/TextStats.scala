package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{normText, tokens}

/** Text analysis for training-data pipelines (SURVEY.md §2.3): token
  * counting, quality scoring, language identification, fingerprinting.
  * All narrow projections over codegen'd expressions — a single scan even
  * when every operator is applied at once.
  */
object TextStats {

  /** Small multilingual stopword profiles for the heuristic language ID.
    * Deliberately tiny and public-knowledge (most frequent function words).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "del", "las", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"))

  /** Count of tokens that appear in `words` (multiset count, not distinct). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Shared metric column builders — the single source of each formula for
    * qualityMetrics, the gopher filter AND their DuckDB oracles (editing
    * one copy of a formula desynchronizes the others silently).
    */
  def nCharsCol(t: Column): Column = length(t).cast("double")
  def punctCol(t: Column): Column =
    (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double")
  def enStopHitsCol(t: Column): Column =
    stopwordHits(split(normText(t), " "), stopwords("en")).cast("double")
  def meanTokenLenCol(nChars: Column, nToks: Column): Column =
    (nChars - (nToks - 1)) / nToks

  /** Quality metrics in one projection:
    * n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len, score.
    * Score: heuristic in [0,1] rewarding stopword presence and moderate
    * token length, penalizing punctuation soup.
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = nCharsCol(t)
    val nToks = size(toks).cast("double")
    val punct = punctCol(t)
    val hits = enStopHitsCol(t)
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round(punct / nChars, 6).as("punct_ratio"),
      round(hits / nToks, 6).as("stopword_ratio"),
      round(meanTokenLenCol(nChars, nToks), 6).as("mean_token_len"),
      round(least(lit(1.0),
        lit(0.25) + least(hits / nToks * 2, lit(0.5)) +
          when(punct / nChars < 0.1, 0.25).otherwise(0.0)), 6).as("quality_score"))
  }

  /** Heuristic language ID: argmax of stopword-profile hit counts, with a
    * fixed precedence order on ties; 'und' when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = split(normText(text), " ")
    val langs = Seq("en", "es", "fr", "de")
    val scores = langs.map(l => l -> stopwordHits(toks, stopwords(l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** 64-bit content fingerprint, hex (sha256 prefix — engine-stable). */
  def fingerprintHex(text: Column): Column = substring(sha2(text, 256), 1, 16)

  /** Rolling 64-bit fingerprint of the token sequence (xxhash64 chain) —
    * order-sensitive, unlike the set-based sketches.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** The GPT-2-family BPE pre-tokenizer pattern (lowercased corpus
    * variant) — ONE canonical spelling, shared by the per-doc count
    * (x_token_count_bpe) and the fertility report below.
    */
  val BpePretokenRegex: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"

  /** Per-language tokenizer fertility report — the eval a tokenizer
    * rollout runs before training: chars per BPE token and BPE tokens
    * per whitespace word, by language. A language whose fertility sits
    * far above the corpus mean is under-served by the vocab (its text
    * fragments into byte-ish pieces and burns sequence length for the
    * same content). One narrow projection + one lang-keyed agg;
    * integer-exact publication (BIGINT sums, ppm floor divisions — no
    * float aggregation, so the report is bit-stable cross-engine).
    */
  def tokenizerFertility(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs.select(col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("nc"),
        graft.functions.tokenCount(col(textCol)).cast("long").as("nw"),
        size(regexp_extract_all(lower(col(textCol)),
          lit(BpePretokenRegex), lit(0))).cast("long").as("nb"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("nw")).as("n_words"), sum(col("nb")).as("n_bpe_tokens"))
      // nullif guards: a language whose docs are all empty/whitespace
      // has 0 tokens — Spark's DIV would return NULL but DuckDB's //
      // RAISES on divide-by-zero, so both engines must see the same
      // explicit NULL (oracle guards identically).
      .withColumn("chars_per_tok_ppm",
        expr("(n_chars * 1000000) DIV nullif(n_bpe_tokens, 0)"))
      .withColumn("toks_per_word_ppm",
        expr("(n_bpe_tokens * 1000000) DIV nullif(n_words, 0)"))

  /** Per-source (source, tok) occurrence counts of normalized tokens —
    * the sufficient statistic for [[tvDrift]]. Counts are distributive
    * over ANY document split, which is what lets the streaming gate
    * accumulate them per micro-batch and re-aggregate at publish.
    */
  def sourceTokenCounts(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.select(col(sourceCol).as("source"),
        explode(split(normText(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))

  /** Total-variation drift per source from a (source, tok, c_st) count
    * frame: tv_ppm = (Σ_present |c_st·N − c_t·n_s| + absent-mass term)
    * ·1e6 DIV (2·n_s·N) — exact in decimal arithmetic (no libm logs),
    * with Σ ≤ 2·n_s·N by construction so the ·1e6 product fits
    * decimal(38) at any corpus size. The input frame is Materialize'd:
    * it feeds the vocab marginal, the per-source marginal and the
    * deviation join — three downstream partitionings, nothing reuses
    * (A/B'd at both factors, r12 s4: the frame is BOUNDED at
    * |sources|·|vocab| rows, the regime where the checkpoint wins —
    * sf10 2.94 → 1.56 s, sf100 17.73 → 6.82 s).
    */
  def tvDrift(counts: DataFrame): DataFrame = {
    val st = Materialize(counts)
    val ct = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val n = ns.agg(sum(col("n_s")).as("n_tot"))
    st.join(ct, Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .groupBy(col("source"), col("n_s"), col("n_tot"))
      .agg(
        sum(expr("""abs(CAST(c_st AS DECIMAL(38,0)) * n_tot
                    - CAST(c_t AS DECIMAL(38,0)) * n_s)"""))
          .as("present_dev"),
        sum(col("c_t")).as("present_ct"))
      .select(col("source"), col("n_s").as("n_tokens"),
        expr("""CAST(((present_dev
                 + (CAST(n_tot AS DECIMAL(38,0)) - present_ct) * n_s)
                * 1000000)
                DIV (2 * CAST(n_s AS DECIMAL(38,0)) * n_tot)
                AS BIGINT)""").as("tv_ppm"))
  }
}
