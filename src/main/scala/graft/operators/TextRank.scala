package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword ranking over a document corpus — the text-retrieval
  * primitive a training-data pipeline uses for relevance filtering and
  * benchmark-query mining (Robertson/Spärck Jones probabilistic model;
  * public formula).
  *
  * Spark-first layout, sized for a 100 TB corpus:
  *  - rows are cut to query terms BEFORE any shuffle (`isin` filter on the
  *    exploded tokens — predicate on the stream side, nothing else of the
  *    corpus moves);
  *  - corpus stats (doc count, total length) and per-term document
  *    frequencies reduce to ONE broadcast row each — no per-doc join
  *    against a stats table;
  *  - per-term tf is pivoted to columns so the final score is a FIXED
  *    left-to-right chain over the term list: float addition order is
  *    identical on every partitioning (and in the DuckDB oracle), so
  *    scores are bit-deterministic.
  *
  * `lnIdf = true` is classic BM25 idf `ln(1 + (N-df+.5)/(df+.5))`;
  * `false` uses the raw odds ratio `(N-df+.5)/(df+.5)` — the same
  * ranking-monotone quantity without the transcendental, for cross-engine
  * bit-exact oracles (libm `log` is not guaranteed identical across
  * engines; +,-,*,/ are IEEE-exact everywhere).
  */
object TextRank {

  /** Tokenized corpus projection: (id, dl, tk). */
  private[operators] def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), split(col(textCol), " ").as("tk"))
      .select(col("id"), size(col("tk")).as("dl"), col("tk"))

  /** One broadcast row: N and total doc length (avgdl derived
    * in-expression so both engines divide the same exact integers).
    */
  private[operators] def corpusStats(toks: DataFrame): DataFrame =
    toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("bigint").as("tot_dl"))

  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10, lnIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val toks = tokenized(docs, idCol, textCol)
    val tf = toks
      .select(col("id"), col("dl"), explode(col("tk")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    scoreTf(tf, corpusStats(toks), terms, k1, b, topK, lnIdf)
  }

  /** Score a prepared term-frequency frame — `tf` rows are
    * (id, dl, tok, tf: double), distinct per (id, tok) and already cut to
    * `terms` (the corpus path filters pre-shuffle; the persisted-index
    * path reads only the probed buckets). Shared by [[bm25]] and
    * [[TextIndex.search]] so both produce BIT-IDENTICAL scores: the dfs,
    * pivot and fixed-order term chain are literally the same expressions.
    */
  private[operators] def scoreTf(tf: DataFrame, stats: DataFrame,
      terms: Seq[String], k1: Double, b: Double, topK: Int,
      lnIdf: Boolean): DataFrame = {
    // One broadcast row of per-term dfs (tf is distinct per (id, tok)).
    val dfs = tf.agg(
      terms.map(t => coalesce(sum(when(col("tok") === t, lit(1))), lit(0))
        .cast("double").as(s"df_$t")).head,
      terms.tail.map(t => coalesce(sum(when(col("tok") === t, lit(1))), lit(0))
        .cast("double").as(s"df_$t")): _*)

    val piv = tf.groupBy(col("id"), col("dl")).agg(
      terms.map(t => max(when(col("tok") === t, col("tf"))).as(s"tf_$t")).head,
      terms.tail.map(t => max(when(col("tok") === t, col("tf"))).as(s"tf_$t")): _*)

    val avgdl = col("tot_dl").cast("double") / col("n_docs")
    def idf(dfc: Column): Column = {
      val odds = (col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5))
      if (lnIdf) log(lit(1.0) + odds) else odds
    }
    def termScore(t: String): Column = {
      val tfc = coalesce(col(s"tf_$t"), lit(0.0))
      idf(col(s"df_$t")) * (tfc * (lit(k1) + lit(1.0))) /
        (tfc + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    piv.crossJoin(broadcast(dfs)).crossJoin(broadcast(stats))
      .withColumn("score", terms.map(termScore).reduce(_ + _))
      .select(col("id"), col("dl"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}
