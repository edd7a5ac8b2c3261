package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Persisted GRAM INDEX for incremental exact-substring dedup — the
  * standing artifact a crawl pipeline maintains so each new drop is
  * deduplicated against the accumulated corpus WITHOUT re-reading it
  * (the ExactSubstr sibling of [[LshIndex]]'s near-dup probe and
  * `TextIndex`'s BM25 postings).
  *
  * Layout under `path`:
  *   meta/   one row: (min_tokens, num_buckets)
  *   grams/  (h, h2, doc_id, pos, bucket) — the FIRST (doc_id, pos)
  *           occurrence of every distinct `minTokens`-token window in
  *           the corpus, hive-partitioned by bucket = pmod(h, buckets).
  *
  * Grams are stored as 128-bit fingerprints (xxhash64 pair), not
  * strings: the probe join ships 16 B per posting and equality is
  * exact up to a 2^-128 cross-gram collision — the same odds-class the
  * clustered PPJoin verify already calls exact. Positions refer to the
  * RAW corpus (pre-dedup), so index semantics equal "min(struct(doc,
  * pos)) over the raw union" — exactly [[TextDedup.substringDedup]]'s
  * first-occurrence table, which is what makes [[dedupBatch]] ≡ the
  * batch rows of a full-union rerun (spec'd).
  *
  * Scale shape: build/append are one partial-aggregable groupBy over
  * the batch's windows; append lands new grams in ONLY the bucket
  * directories the batch touches (bounded collect of ≤ numBuckets
  * partition values pushes an IN partition filter on both the
  * append-time existence probe and the read). A small drop against a
  * 100 TB standing index reads the touched buckets' postings, never
  * the corpus.
  */
object SubstrIndex {

  private def fp(gram: Column): (Column, Column) =
    (xxhash64(gram), xxhash64(lit("graft.substr"), gram))

  /** (doc_id, pos, h, h2) for every window of every doc. */
  private def windows(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    val w = docs.select(col(idCol).as("doc_id"),
      posexplode(GraftBridge.column(graft.functions.SubstrWindows(
        GraftBridge.expression(col(textCol)), minTokens)))
        .as(Seq("pos", "gram")))
    val (h, h2) = fp(col("gram"))
    w.select(col("doc_id"), col("pos"), h.as("h"), h2.as("h2"))
  }

  /** First (doc_id, pos) per distinct gram — partial-aggregable, so a
    * boilerplate gram repeated millions of times combines map-side. */
  private def firstOcc(wins: DataFrame): DataFrame =
    wins.groupBy("h", "h2")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      .select(col("h"), col("h2"),
        col("first.doc_id").as("doc_id"), col("first.pos").as("pos"))

  private def bucketCol(numBuckets: Int): Column =
    pmod(col("h"), lit(numBuckets.toLong)).cast("int")

  def build(corpus: DataFrame, idCol: String, textCol: String, path: String,
      minTokens: Int = 8, numBuckets: Int = 64): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((minTokens, numBuckets)).toDF("min_tokens", "num_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    firstOcc(windows(corpus, idCol, textCol, minTokens))
      .withColumn("bucket", bucketCol(numBuckets))
      // Cluster by partition value so each task writes only its own
      // bucket directories (the LshIndex build discipline).
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/grams")
  }

  private def meta(spark: SparkSession, path: String): (Int, Int) = {
    val m = spark.read.parquet(s"$path/meta").head()
    (m.getAs[Int]("min_tokens"), m.getAs[Int]("num_buckets"))
  }

  /** The standing postings PRUNED to the buckets `wins` touches: the
    * distinct bucket list is ≤ numBuckets values (bounded collect) and
    * lands as a static IN partition filter — untouched bucket dirs are
    * never listed. */
  private def touchedIds(wins: DataFrame, numBuckets: Int): Array[Int] =
    wins.select(bucketCol(numBuckets).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted

  private def touched(spark: SparkSession, path: String, wins: DataFrame,
      numBuckets: Int): DataFrame =
    touchedFrom(spark, path, touchedIds(wins, numBuckets))

  private def touchedFrom(spark: SparkSession, path: String,
      ids: Array[Int]): DataFrame =
    spark.read.parquet(s"$path/grams")
      .filter(col("bucket").isin(ids.map(Int.box): _*))

  /** Dedup a new batch against the standing corpus: every batch window
    * whose gram the INDEX already owns is cut (the corpus holds its
    * first occurrence); windows new to the corpus dedup batch-
    * internally with [[TextDedup.substringDedup]]'s first-occurrence
    * rule. Returns (doc_id, text_clean, n_dropped) for every batch doc.
    *
    * Equivalence contract (spec'd): when corpus doc ids precede batch
    * doc ids, this equals `substringDedup(corpus ∪ batch)` restricted
    * to the batch — the precondition matches the crawl timeline (the
    * standing corpus was published first and is immutable; the index
    * owning a gram IS the statement that its first occurrence lives
    * there).
    */
  def dedupBatch(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val (minTokens, numBuckets) = meta(spark, path)
    val wins = Materialize(windows(batch, idCol, textCol, minTokens))
    dedupCut(batch, idCol, textCol, wins,
      touched(spark, path, wins, numBuckets), minTokens)
  }

  /** [[dedupBatch]] body over a PRE-materialized window frame and a
    * pre-pruned touched-postings frame — shared with [[dedupAndAppend]]
    * so the sink path hashes/checkpoints the batch's grams and collects
    * the touched-bucket list once, not once per phase. */
  private def dedupCut(batch: DataFrame,
      idCol: String, textCol: String, wins: DataFrame,
      tch: DataFrame, minTokens: Int): DataFrame = {
    // REPLAY GUARD: postings whose doc_id is one of the batch's own ids
    // can only exist if a crashed run already appended this batch (doc
    // ids are globally unique across drops). Probing against them would
    // make every batch window a "hit" — the replayed docs would re-emit
    // fully cut — so they are excluded: the replayed probe then sees
    // exactly the pre-append index and reproduces the crashed run's
    // output byte-for-byte (the remaining replay exposure is the out/
    // sink's documented at-least-once double-append, which a
    // batchId-keyed committer can heal because the content now agrees).
    val batchIds = batch.select(col(idCol).as("doc_id")).distinct()
    val idx = tch
      .join(batchIds, Seq("doc_id"), "left_anti")
      .select(col("h"), col("h2"))
    val hit = wins.join(idx, Seq("h", "h2"), "left_semi")
    val miss = wins.join(idx, Seq("h", "h2"), "left_anti")
    val flagged = firstOcc(miss)
      .withColumnRenamed("doc_id", "fdoc").withColumnRenamed("pos", "fpos")
    val cnt = miss.groupBy("h", "h2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("h"), col("h2"))
    val batchDel = miss.join(cnt, Seq("h", "h2"))
      .join(flagged, Seq("h", "h2"))
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
    val deleted = hit.select(col("doc_id"), col("pos"))
      .unionByName(batchDel.select(col("doc_id"), col("pos")))
      .select(col("doc_id"), col("pos").cast("long").as("s"),
        (col("pos") + minTokens - 1).cast("long").as("e"))
    TextDedup.cutDeleted(batch, idCol, textCol, deleted)
  }

  /** Extend the index with a batch's grams NEW to the corpus (grams the
    * index owns keep their standing first occurrence — nothing to
    * write). New postings land in only the touched bucket dirs; probe
    * after append equals a rebuild over the union (spec'd). Positions
    * are the RAW batch's, preserving the raw-union min semantics.
    */
  def append(newDocs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val (minTokens, numBuckets) = meta(spark, path)
    val wins = Materialize(windows(newDocs, idCol, textCol, minTokens))
    appendGrams(path, wins,
      touched(spark, path, wins, numBuckets), numBuckets)
  }

  /** [[append]] body over a PRE-materialized window frame and a
    * pre-pruned touched-postings frame. The anti-join probes the FULL
    * touched postings (no batch-id exclusion): a replayed batch whose
    * grams a crashed run already appended adds nothing, which is what
    * makes append idempotent. */
  private def appendGrams(path: String, wins: DataFrame,
      tch: DataFrame, numBuckets: Int): Unit = {
    firstOcc(wins.join(tch.select(col("h"), col("h2")),
        Seq("h", "h2"), "left_anti"))
      .withColumn("bucket", bucketCol(numBuckets))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/grams")
  }

  /** The sink path's dedup-then-grow sequence over ONE shared window
    * materialization: [[dedupBatch]] and [[append]] back to back each
    * re-hashed every batch window into a fresh localCheckpoint and
    * re-collected the touched-bucket list — all pure duplication, since
    * append is defined over the same RAW batch windows the dedup probed
    * (the raw-union first-occurrence semantics). Emits the cleaned batch
    * to `outPath` BEFORE growing the index — the crash-replay contract
    * ([[dedupBatch]]'s guard heals the append-landed case). Output is
    * byte-identical to the two-call sequence (spec'd in SubstrIndexSpec).
    */
  def dedupAndAppend(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String, outPath: String): Unit = {
    val (minTokens, numBuckets) = meta(spark, path)
    val wins = Materialize(windows(batch, idCol, textCol, minTokens))
    val tch = touchedFrom(spark, path, touchedIds(wins, numBuckets))
    dedupCut(batch, idCol, textCol, wins, tch, minTokens)
      .write.mode("append").parquet(outPath)
    appendGrams(path, wins, tch, numBuckets)
  }
}
