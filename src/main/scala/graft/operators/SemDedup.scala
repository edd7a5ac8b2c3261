package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv:2303.09540, public): k-means
  * the embedding space into cells, compare vectors ONLY within a cell,
  * and drop all but one of each group whose pairwise cosine clears `tau`.
  *
  * Scale shape: the quadratic step is confined to cells. Clustering makes
  * candidate generation an equi-join on cell id (one shuffle, prunable),
  * and `k` grows with the corpus so cells stay bounded on average.
  * Against adversarial skew (a dense semantic clump that k-means can't
  * split), cells over `maxCell` rows are refined by `extraPlanes`
  * hyperplane sign bits — within-clump recall degrades gracefully instead
  * of the join degenerating quadratic. Same family of guard as the
  * MinHash-LSH `maxBucket` cap (TextDedup.minhashLshTopK).
  */
object SemDedup {

  /** Near-duplicate pairs (id_a < id_b, cosine ≥ tau) found within
    * k-means cells. `model` comes from [[IvfIndex.train]] — the codebook
    * is shared infrastructure with ANN search, trained once per corpus.
    */
  def semanticPairs(corpus: DataFrame, idCol: String, vecCol: String,
      model: IvfIndex.Model, tau: Double, maxCell: Int = 1000,
      extraPlanes: Int = 4, seed: Long = 7L): DataFrame = {
    val dim = model.centroids.headOption.map(_.length)
      .getOrElse(sys.error("semanticPairs: empty codebook"))
    // Materialized (leak-free): read by the cell-count agg and both sides
    // of the pair join — three passes of centroid scoring otherwise.
    val assigned = Materialize(
      IvfIndex.assign(corpus, idCol, vecCol, model))
    // Cell counts are k-sized (the codebook bounds distinct cells), so
    // the broadcast is bounded no matter the corpus size.
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    val keyed = assigned.join(broadcast(counts), "cell")
      .withColumn("subcell",
        when(col("cell_n") > maxCell,
          Similarity.lshBucket(col("vec"), extraPlanes, dim, seed))
          .otherwise(lit(0L)))
    keyed.as("a").join(keyed.as("b"),
        col("a.cell") === col("b.cell") && col("a.subcell") === col("b.subcell") &&
        col("a.id") < col("b.id"))
      .withColumn("cosine", Similarity.cosine(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** The full SemDeDup pass: corpus minus semantic duplicates (min-id
    * survivor per connected component, via [[DedupResolve]]).
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      model: IvfIndex.Model, tau: Double, maxCell: Int = 1000,
      extraPlanes: Int = 4): DataFrame = {
    val pairs = semanticPairs(corpus, idCol, vecCol, model, tau, maxCell, extraPlanes)
      .select("id_a", "id_b")
    DedupResolve.dropDuplicates(corpus, idCol, pairs)
  }
}
