package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed IVF × PQ persisted index — the standard billion-scale ANN
  * layout (FAISS IVFPQ, public; the no-residual `by_residual=false`
  * variant, so codes come straight from [[PqIndex.encode]]):
  *
  *  - [[IvfIndex]] k-means cells partition the corpus; the PERSISTED code
  *    table is hive-partitioned by cell, so a probe's nProbe cells arrive
  *    as a static partition filter and unprobed directories are never
  *    listed;
  *  - within the probed cells candidates are PQ CODES (m bytes), not
  *    vectors — the scan reads 32× fewer bytes and distance is m table
  *    lookups per candidate ([[PqIndex.searchADC]]).
  *
  * At 100 TB both levers matter independently: partition pruning bounds
  * WHICH bytes are touched, PQ bounds HOW MANY bytes per candidate.
  */
object IvfPq {

  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
      ivf: IvfIndex.Model, pq: PqIndex.Model): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Tiny model files: IVF centroids, and PQ codebooks flattened to
    // (sub, code, centroid) rows.
    ivf.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/ivf")
    pq.codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pq")
    // One pass computes cell AND codes; codes land cell-partitioned.
    corpus.select(col(idCol).as("id"),
        IvfIndex.cellId(ivf, col(vecCol)).as("cell"),
        array((0 until pq.m).map(s =>
          PqIndex.code(pq, col(vecCol), s)): _*).as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Append new vectors WITHOUT retraining (the [[IvfIndex.append]]
    * discipline, composed): assign + PQ-encode them with the SAVED
    * models, landing new files in only the touched cell directories.
    * Codebooks age as the corpus drifts (estimate quality decays
    * gracefully, never correctness of the probe contract); periodic
    * [[build]] is the repair pass. Probe after append exactly equals
    * probing a fresh build over the union with the same models (spec'd).
    */
  def append(newRows: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = newRows.sparkSession
    val ivf = loadIvf(spark, path)
    val pq = loadPq(spark, path)
    newRows.select(col(idCol).as("id"),
        IvfIndex.cellId(ivf, col(vecCol)).as("cell"),
        array((0 until pq.m).map(s =>
          PqIndex.code(pq, col(vecCol), s)): _*).as("codes"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  def loadIvf(spark: SparkSession, path: String): IvfIndex.Model =
    IvfIndex.Model(spark.read.parquet(s"$path/ivf")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray))

  def loadPq(spark: SparkSession, path: String): PqIndex.Model = {
    val rows = spark.read.parquet(s"$path/pq")
      .orderBy("sub", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    PqIndex.Model(rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray)
  }

  /** ADC top-k within the probed cells only. The probe cell set
    * (≤ |queries| × nProbe; query batches are driver-small by contract)
    * becomes a literal partition filter on the codes scan.
    */
  def search(spark: SparkSession, path: String,
      queries: Seq[(Long, Array[Double])], k: Int = 10,
      nProbe: Int = 2): DataFrame = {
    val ivf = loadIvf(spark, path)
    val pq = loadPq(spark, path)
    val probeCells = queries.flatMap { case (_, q) =>
      ivf.centroids.zipWithIndex
        .map { case (c, i) =>
          val d2 = q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, i)
        }
        .sortBy(_._1).take(nProbe).map(_._2)
    }.distinct
    val pruned = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probeCells: _*))
      .select("id", "codes")
    PqIndex.searchADC(pruned, queries, pq, k)
  }
}
