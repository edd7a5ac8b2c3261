package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw documents whose hashed-n-gram profile
  * resembles a small high-quality target corpus. The reference pipeline
  * has no analog — this is one of the selection stages a 100 TB
  * training-data build runs between dedup and packing.
  *
  * Scale shape, stage by stage:
  *  - [[features]]: one explode over unigrams+bigrams, pre-aggregated to
  *    (doc, bucket) counts — output is vocabulary-bounded per doc, never
  *    corpus × buckets.
  *  - [[bucketLogRatio]]: the whole model is `numBuckets` rows (counts +
  *    smoothed log-likelihood ratios) regardless of corpus size, so it
  *    broadcasts; fitting is two groupBy passes.
  *  - [[importanceWeights]]: broadcast join + one sum per doc.
  *  - [[resample]]: Gumbel top-k compiles to TakeOrderedAndProject
  *    (per-partition heaps + driver merge of k rows) — no global sort.
  *
  * The token hash is PORTABLE (first 8 hex chars of sha256 → int64 →
  * mod buckets), so the integer feature stage is verified bit-level
  * against DuckDB by the `x_dsir_features` oracle; the float log-ratio /
  * Gumbel stages are covered by DsirSpec (determinism, target
  * enrichment, plan shape) — ln() bit-parity across engines is not
  * guaranteed, the same split as x_charlm_score.
  */
object Dsir {

  /** (id, bucket, cnt): unigram + bigram counts hashed into
    * `numBuckets`. Tokenization is the portable lower/whitespace split
    * (the d_simhash_portable twin), not SketchHash.tokenize — this stage
    * must be re-derivable in the oracle.
    */
  def features(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 4096): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("ts"))
    val uni = base.select(col("id"), explode(col("ts")).as("ng"))
    // Bigrams via a shifted zip — zip_with null-pads the shorter side
    // and concat propagates the null, so the trailing partial pair
    // drops in the explode-side filter. Deliberately NOT
    // transform(sequence, i => element_at(ts, i)): a lambda that
    // references the `ts` alias gets the whole tokenizer inlined per
    // element by CollapseProject (quadratic re-evaluation).
    val bi = base.select(col("id"), explode(
        zip_with(col("ts"), slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("ng"))
      .filter(col("ng").isNotNull)
    uni.unionAll(bi)
      // Direct digest-byte lane (graft.functions.sha256Lane) — value-
      // identical to conv(substr(sha2-hex))::long, no hex round-trip in
      // the per-ngram-occurrence hot path (x_dsir_features oracle
      // unchanged).
      .withColumn("bucket",
        graft.functions.sha256Lane(col("ng")) % numBuckets)
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-bucket smoothed log-likelihood ratio
    * `log((cnt_t+α)/(tot_t+α·B)) − log((cnt_r+α)/(tot_r+α·B))` from two
    * feature frames. Output: (bucket, cnt_t, cnt_r, log_ratio) —
    * `numBuckets` rows, broadcastable no matter the corpus size.
    */
  def bucketLogRatio(target: DataFrame, raw: DataFrame, numBuckets: Int,
      alpha: Double = 0.5): DataFrame = {
    def bucketCounts(f: DataFrame, n: String) =
      f.groupBy(col("bucket")).agg(sum(col("cnt")).as(n))
    val t = bucketCounts(target, "cnt_t")
    val r = bucketCounts(raw, "cnt_r")
    val joined = r.join(t, Seq("bucket"), "full")
      .na.fill(0L, Seq("cnt_t", "cnt_r"))
    val tot = joined.agg(sum(col("cnt_t")).as("tot_t"), sum(col("cnt_r")).as("tot_r"))
    val b = lit(alpha * numBuckets)
    joined.crossJoin(broadcast(tot))
      .withColumn("log_ratio",
        log((col("cnt_t") + alpha) / (col("tot_t") + b)) -
          log((col("cnt_r") + alpha) / (col("tot_r") + b)))
      .select(col("bucket"), col("cnt_t"), col("cnt_r"), col("log_ratio"))
  }

  /** Per-doc importance weight `log w = Σ cnt_b · log_ratio_b` via a
    * broadcast of the bucket model. */
  def importanceWeights(feat: DataFrame, ratios: DataFrame): DataFrame =
    feat.join(broadcast(ratios.select(col("bucket"), col("log_ratio"))), Seq("bucket"))
      .groupBy(col("id")).agg(sum(col("cnt") * col("log_ratio")).as("log_w"))

  /** Collect a fitted [[bucketLogRatio]] model to a driver map for
    * [[scoreStateless]] / streaming gates — bounded at numBuckets rows
    * by construction. */
  def collectModel(ratios: DataFrame): Map[Long, Double] =
    ratios.select(col("bucket"), col("log_ratio")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Stateless per-doc score under an ALREADY-FITTED model: the same
    * unigram+bigram/bucket features as [[features]], but folded inside
    * one projection via a map literal over the bounded bucket model — no
    * explode, no shuffle, no state. This is the form a STREAMING quality
    * gate needs (append mode, watermark-free), and the cheapest batch
    * scorer once the model exists. The literal is bounded by numBuckets
    * (4096 default) by construction — same discipline as
    * labelCentroidAssign's documented bound. Buckets absent from the
    * model contribute 0, matching the inner model join in
    * [[importanceWeights]].
    */
  def scoreStateless(df: DataFrame, idCol: String, textCol: String,
      model: Map[Long, Double], numBuckets: Int = 4096,
      out: String = "dsir_score"): DataFrame = {
    require(model.size <= numBuckets,
      s"model has ${model.size} entries for $numBuckets buckets")
    val kvs = model.toSeq.sortBy(_._1)
      .flatMap { case (b, r) => Seq(lit(b), lit(r)) }
    val m = map(kvs: _*)
    def bucketOf(ng: Column): Column =
      graft.functions.sha256Lane(ng) % numBuckets // == features' bucket
    val ts = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // Shifted-zip bigrams (null tail skipped in the fold) — see
    // features() for why the lambda must not reference the __ts alias.
    val bi = zip_with(col("__ts"),
      slice(col("__ts"), lit(2), greatest(size(col("__ts")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    df.withColumn("__ts", ts)
      .withColumn(out,
        aggregate(concat(col("__ts"), bi), lit(0.0),
          (acc, ng) => acc + when(ng.isNull, lit(0.0))
            .otherwise(coalesce(element_at(m, bucketOf(ng)), lit(0.0)))))
      .drop("__ts")
  }

  /** Gumbel top-k resample without replacement: rank by
    * `log_w + g`, `g = −ln(−ln(u))`, with `u` drawn DETERMINISTICALLY
    * from sha256(salt‖id) (52 mantissa-exact bits → (0,1)) so reruns and
    * retries select the identical sample. Returns (id, log_w, key).
    */
  def resample(weights: DataFrame, k: Int, salt: String): DataFrame = {
    val u = (conv(substring(
        sha2(concat(lit(salt), lit("|"), col("id").cast("string")), 256),
        1, 13), 16, 10).cast("double") + 0.5) / 4503599627370496.0 // 2^52
    weights
      .withColumn("key", col("log_w") - log(-log(u)))
      .orderBy(col("key").desc, col("id"))
      .limit(k)
  }
}
