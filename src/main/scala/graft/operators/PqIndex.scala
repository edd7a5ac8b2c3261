package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression + fast approximate
  * distance — the codebook compression real ANN stacks pair with an IVF
  * partition (public Jégou et al. PQ/ADC math; FAISS-style layout).
  *
  * The d-dim vector space is cut into `m` subspaces of d/m dims; each
  * subspace gets its own k-centroid codebook (k ≤ 256 → one byte per
  * subspace). A vector is stored as its `m` nearest-centroid codes:
  * 64 float dims (256 bytes) → 8 codes (8 bytes), a 32× footprint cut,
  * which is what makes a 100 TB embedding corpus RAM-resident for search.
  *
  * Search is ADC (asymmetric distance computation): the QUERY stays
  * exact; per subspace a k-entry table of ||q_sub − centroid_j||² is
  * computed once on the driver, and a candidate's distance estimate is
  * just `m` table lookups summed — no float math per candidate dimension.
  * Everything row-side is Column arithmetic (codes via the same
  * literal-centroid argmax trick as [[IvfIndex.cellId]]; lookups via
  * `element_at` on literal arrays in a FIXED chain), so the scan stays
  * narrow and codegen-friendly, and a multi-query batch is ONE pass
  * (per-query structs exploded, not per-query plan branches).
  */
object PqIndex {

  /** `codebooks(sub)(code)` = centroid (subDim doubles). */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
  }

  private def sub(vec: Column, subIdx: Int, subDim: Int): Column =
    slice(vec, subIdx * subDim + 1, subDim)

  /** Train one k-means codebook per subspace (seeded random init on an
    * optional sample — same training discipline as [[IvfIndex.train]]).
    */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L, maxIter: Int = 10,
      driverThreshold: Long = 50000L): Model = {
    val base =
      if (sampleFraction >= 1.0) corpus else corpus.sample(sampleFraction, seed)
    val dim = base.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // One cheap pass materializes all m slices; each sub-training reads
    // its own narrow column of the cached slice frame.
    val sliced = base.select((0 until m).map(s =>
      sub(col(vecCol).cast("array<double>"), s, subDim).as(s"s$s")): _*)
      .persist()
    try {
      // Bounded samples train all m codebooks from ONE collect on the
      // driver (IvfIndex.lloyd) — m separate MLlib fits schedule
      // m × iters × ~3 jobs of overhead for milliseconds of FLOPs.
      val n = sliced.count()
      if (n <= driverThreshold) {
        val rows = sliced.collect()
        val books = (0 until m).map { s =>
          val pts = rows.map(_.getSeq[Double](s).toArray)
          IvfIndex.lloyd(pts, k, maxIter, seed + s)
        }.toArray
        return Model(books)
      }
      val books = (0 until m).map { s =>
        val km = new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
          .setTol(1e-3).setInitMode("random")
        km.fit(sliced.select(org.apache.spark.ml.functions.array_to_vector(
            col(s"s$s")).as("features")))
          .clusterCenters.map(_.toArray)
      }.toArray
      Model(books)
    } finally { sliced.unpersist(); () }
  }

  /** Per-subspace nearest-code column (argmin ‖x−c‖² ≙ argmax x·c − ‖c‖²/2,
    * centroids inlined as literals — the [[IvfIndex.cellId]] trick).
    */
  private[operators] def code(model: Model, vec: Column, subIdx: Int): Column = {
    val x = sub(vec, subIdx, model.subDim)
    greatest(model.codebooks(subIdx).zipWithIndex.map { case (c, j) =>
      val half = c.map(v => v * v).sum / 2.0
      struct((Similarity.dot(x, typedlit(c.toSeq)) - half).as("score"),
        lit(j).as("code"))
    }.toIndexedSeq: _*).getField("code")
  }

  /** Compress the corpus: (id, codes array<int> of length m). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    corpus.select(col(idCol).as("id"),
      array((0 until model.m).map(s => code(model, col(vecCol), s)): _*).as("codes"))

  /** Reconstruction (decode) of one code row — driver-side helper for
    * error measurement.
    */
  def decode(model: Model, codes: Seq[Int]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, s) => model.codebooks(s)(c) }.toArray

  /** ADC top-k against the encoded corpus for a driver-small query batch:
    * queries → per-subspace distance tables (computed on the driver, tiny:
    * m × k doubles per query) → ONE pass over the codes, per-query
    * estimates exploded from a literal struct array.
    */
  def searchADC(encoded: DataFrame, queries: Seq[(Long, Array[Double])],
      model: Model, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perQuery: Seq[Column] = queries.map { case (qid, q) =>
      val tables: Seq[Seq[Double]] = (0 until model.m).map { s =>
        val qs = q.slice(s * model.subDim, (s + 1) * model.subDim)
        model.codebooks(s).map(c =>
          qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).toSeq
      }
      val est = (0 until model.m).map(s =>
        element_at(typedlit(tables(s)), element_at(col("codes"), s + 1) + 1))
        .reduce(_ + _) // fixed fold order — deterministic estimates
      struct(lit(qid).as("query_id"), est.as("est_d2"))
    }
    val w = Window.partitionBy(col("query_id")).orderBy(col("est_d2"), col("id"))
    encoded.select(col("id"), explode(array(perQuery: _*)).as("e"))
      .select(col("e.query_id").as("query_id"), col("id"), col("e.est_d2").as("est_d2"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
  }
}
