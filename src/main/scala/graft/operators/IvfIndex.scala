package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the k-means-partition
  * scale path next to the hyperplane-LSH one (SURVEY.md §2.3).
  *
  * Build: k-means over (a sample of) the corpus → every vector assigned to
  * its nearest centroid (one narrow pass; centroids broadcast as literals).
  * Search: probe only the `nProbe` centroids nearest each query — the
  * corpus scan is pruned to candidate cells by an equi-join on cell id,
  * which at 100 TB is the difference between touching ~nProbe/k of the
  * data and touching all of it.
  *
  * Uses MLlib's KMeans (ships with Spark) for training only; assignment
  * and search are plain DataFrame ops over array<float> columns via the
  * native VecDot expression.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Train centroids. `sampleFraction` bounds driver/ML cost on huge
    * corpora — k-means on a uniform sample converges to near-identical
    * cells (standard IVF practice).
    *
    * Two execution paths by TRAINING-SAMPLE size (not corpus size):
    * samples at or below `driverThreshold` rows collect once and run
    * Lloyd's on the driver — codebook training on 50k × 64 doubles is
    * milliseconds of FLOPs, while MLlib schedules ~3 distributed jobs
    * PER ITERATION (measured ~1.5-2 s of pure scheduling at any data
    * size). Larger samples go through MLlib. This is the FAISS split:
    * codebooks train in memory on a sample; the DISTRIBUTED work is
    * assignment/search over the full corpus, which stays in DataFrames
    * here either way.
    */
  def train(corpus: DataFrame, vecCol: String, k: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L, maxIter: Int = 10,
      driverThreshold: Long = 50000L): Model = {
    val base = if (sampleFraction >= 1.0) corpus else corpus.sample(sampleFraction, seed)
    // Parquet-backed counts fold to row-group stats — this job is cheap.
    val n = base.count()
    if (n <= driverThreshold) {
      val pts = base.select(col(vecCol).cast("array<double>").as("v"))
        .collect().map(_.getSeq[Double](0).toArray)
      return Model(lloyd(pts, k, maxIter, seed))
    }
    // Normalize the element type first: the rest of the module (VecDot)
    // accepts float OR double arrays, so training must too.
    val feats = base.select(org.apache.spark.ml.functions.array_to_vector(
      col(vecCol).cast("array<double>")).as("features"))
    // Seeded random init: k-means|| costs ~5 extra distributed passes and
    // an IVF codebook over a uniform sample doesn't need it.
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).setTol(1e-3)
      .setInitMode("random")
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray))
  }

  /** Seeded in-memory Lloyd's: deterministic for a given (points order,
    * seed). Empty clusters keep their previous center (MLlib semantics).
    */
  private[operators] def lloyd(pts: Array[Array[Double]], k: Int,
      maxIter: Int, seed: Long, tol: Double = 1e-3): Array[Array[Double]] = {
    require(pts.nonEmpty, "kmeans: empty training sample")
    val dim = pts(0).length
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, pts.length)
    val centers = rnd.shuffle(pts.indices.toVector).take(kk)
      .map(i => pts(i).clone).toArray
    val assignBuf = new Array[Int](pts.length)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      var p = 0
      while (p < pts.length) {
        val v = pts(p)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < kk) {
          val ctr = centers(c); var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - ctr(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assignBuf(p) = best
        p += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Long](kk)
      p = 0
      while (p < pts.length) {
        val s = sums(assignBuf(p)); val v = pts(p); var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        cnts(assignBuf(p)) += 1
        p += 1
      }
      moved = 0.0
      var c = 0
      while (c < kk) {
        if (cnts(c) > 0) {
          var d = 0.0; var j = 0
          while (j < dim) {
            val nv = sums(c)(j) / cnts(c)
            val t = nv - centers(c)(j); d += t * t
            centers(c)(j) = nv; j += 1
          }
          moved = math.max(moved, math.sqrt(d))
        }
        c += 1
      }
      iter += 1
    }
    centers
  }

  /** Nearest-centroid cell id for a vector column (argmin of squared
    * distance ≙ argmax of dot − ||c||²/2; centroids inlined as literals so
    * the pass is narrow and codegen-friendly).
    */
  /** Per-centroid (score, cell) structs — the single source of the scoring
    * formula used by both assignment and probing (editing one without the
    * other would silently desynchronize them).
    */
  private def scoredCells(model: Model,
      vec: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    model.centroids.zipWithIndex.map { case (c, i) =>
      val half = c.map(x => x * x).sum / 2.0
      struct((Similarity.dot(vec, typedlit(c.toSeq)) - half).as("score"), lit(i).as("cell"))
    }.toIndexedSeq

  def cellId(model: Model, vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    greatest(scoredCells(model, vec): _*).getField("cell")

  /** Assign every corpus row to its cell (the "inverted file"). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", cellId(model, col("vec")))

  /** Approximate top-k: each query probes its `nProbe` nearest cells; exact
    * cosine only within those cells.
    */
  def search(assigned: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      model: Model, k: Int = 5, nProbe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cells",
        slice(sortCells(model, col("qvec")), 1, nProbe))
      .withColumn("cell", explode(col("cells"))).drop("cells")
    val cands = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", Similarity.cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    cands.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "id", "cosine", "rk")
  }

  /** Cell ids sorted by descending affinity to `vec`. */
  private[operators] def sortCells(model: Model, vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(
      reverse(array_sort(array(scoredCells(model, vec): _*))),
      s => s.getField("cell"))

  // ------------------------------------------------------------------
  // Persistence: train once, reuse across queries / sessions
  // ------------------------------------------------------------------

  /** Persist the codebook and the inverted file. The codebook is a tiny
    * (cell, centroid) parquet; the assigned corpus is written
    * HIVE-PARTITIONED BY CELL, so a persisted probe prunes unprobed cells
    * at the file-listing level — at 100 TB the search never opens the
    * ~(k−nProbe)/k of the corpus it doesn't probe, and the k-means
    * training cost is paid once, not per query batch.
    */
  def save(assigned: DataFrame, model: Model, path: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
  }

  /** Append new vectors to a persisted index WITHOUT retraining: assign
    * them with the SAVED codebook, landing new files in only the touched
    * cell directories — batch-cost maintenance for a corpus-scale index.
    * The codebook ages as the corpus drifts (recall decays gracefully,
    * correctness never — probes still search the cells nearest each
    * query); periodic [[train]]+[[save]] is the repair pass. Probe after
    * append exactly equals probing the union assigned with the same
    * codebook (spec'd).
    */
  def append(newRows: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val model = loadModel(newRows.sparkSession, path)
    assign(newRows, idCol, vecCol, model)
      .write.mode("append").partitionBy("cell").parquet(s"$path/index")
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(spark.read.parquet(s"$path/codebook")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray))

  /** Probe a persisted index. The probe cell set (≤ |queries|·nProbe —
    * query batches are driver-small by contract) is collected and pushed
    * as a literal partition filter, so only the probed cell directories
    * are listed/read; scoring then delegates to [[search]], which
    * recomputes the same cells deterministically from the same codebook.
    */
  def searchPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, nProbe: Int = 2): DataFrame = {
    val model = loadModel(spark, path)
    val probeCells = queries
      .select(explode(slice(sortCells(model, col(vecCol)), 1, nProbe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(s"$path/index")
      .filter(col("cell").isin(probeCells: _*))
    search(pruned, queries, idCol, vecCol, model, k, nProbe)
  }
}
