package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index with bucket-pruned keyword search — the
  * text twin of [[IvfIndex]]'s persisted ANN path.
  *
  * Build once: tokenize the corpus, materialize (tok, doc, tf, dl) posting
  * rows HIVE-PARTITIONED BY a hash bucket of the token, plus a tiny corpus
  * stats file. Search many: the query terms' buckets are computed on the
  * driver and pushed as a STATIC partition filter, so a k-term query lists
  * and reads only ~k/nBuckets of the index no matter how large the corpus
  * — at 100 TB the unprobed bucket directories are never even listed.
  * Scoring delegates to [[TextRank.scoreTf]], so a persisted search is
  * BIT-IDENTICAL to running [[TextRank.bm25]] over the raw corpus (the
  * probed buckets contain the complete postings of every query term, and
  * corpus-level stats come from the stats file, not the probed subset).
  *
  * Posting rows stay one-row-per-(tok, doc) — a per-token array layout
  * would concentrate a stop-token's whole posting list into one value;
  * row-shaped postings spread across row groups and compress the same.
  */
object TextIndex {

  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextRank.tokenized(docs, idCol, textCol)
    TextRank.corpusStats(toks)
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    toks.select(col("id"), col("dl"), explode(col("tk")).as("tok"))
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
  }

  /** Append a batch WITHOUT a rebuild: posting rows land as new files in
    * only the buckets the batch's tokens hash to, and the corpus stats
    * merge ADDITIVELY (n_docs and tot_dl are plain sums; per-term df is
    * derived from the postings at search time, so it is right
    * automatically). Search after append is bit-identical to a rebuild
    * over the union — same posting rows, same stats, same scoring
    * expressions (spec'd). Postings are appended before the stats swap,
    * so a crash in between leaves the batch under-weighted in idf (N one
    * batch stale) but never double-counted; re-running append or a
    * periodic [[build]] repairs it.
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val old = spark.read.parquet(s"$path/stats").head()
    val nBuckets = old.getAs[Int]("n_buckets")
    val toks = TextRank.tokenized(docs, idCol, textCol)
    toks.select(col("id"), col("dl"), explode(col("tk")).as("tok"))
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).cast("int"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/postings")
    val add = TextRank.corpusStats(toks).head()
    Seq((old.getAs[Double]("n_docs") + add.getAs[Double]("n_docs"),
        old.getAs[Long]("tot_dl") + add.getAs[Long]("tot_dl"), nBuckets))
      .toDF("n_docs", "tot_dl", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** The bucket ids for `terms` under the SAME hash the build used —
    * evaluated through a one-row Spark plan so driver and executors can
    * never disagree on the hash function.
    */
  private def bucketsOf(spark: SparkSession, terms: Seq[String],
      nBuckets: Int): Seq[Int] =
    spark.range(1)
      .select(terms.map(t =>
        pmod(xxhash64(lit(t)), lit(nBuckets.toLong)).cast("int").as(t)): _*)
      .head().toSeq.asInstanceOf[Seq[Int]].distinct

  def search(spark: SparkSession, path: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
      lnIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val stats = spark.read.parquet(s"$path/stats")
    val nBuckets = stats.head().getAs[Int]("n_buckets")
    val buckets = bucketsOf(spark, terms, nBuckets)
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("tok").isin(terms: _*))
      .select("id", "dl", "tok", "tf")
    TextRank.scoreTf(tf, stats.select("n_docs", "tot_dl"),
      terms, k1, b, topK, lnIdf)
  }
}
