package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Turns near-duplicate candidate PAIRS into a dedup DECISION: connected
  * components over the pair graph, then one survivor per component
  * (min id — deterministic).
  *
  * Components run as iterative min-label propagation: each vertex
  * repeatedly adopts the smallest label among itself and its neighbors —
  * one hop per round, so convergence takes O(graph diameter) rounds (the
  * large-star/small-star variants get O(log n); this implementation
  * favors simplicity since LSH candidate graphs have tiny diameters).
  * Every round is one equi-join + one agg, both shuffling on vertex id.
  * Hitting the iteration cap without convergence THROWS rather than
  * silently splitting components; intermediate frames are persisted and
  * freed per round (mandatory for any DataFrame loop — otherwise lineage
  * grows without bound and replans every round).
  */
object DedupResolve {

  /** labels(id → component) for every vertex present in `pairs`
    * (columns id_a, id_b). Component id = min vertex id in the component.
    *
    * Adaptive: candidate-pair graphs are usually tiny relative to the
    * corpus (that is the point of LSH); below `driverThreshold` edges the
    * graph is solved with driver-side union-find in one collect instead of
    * O(log n) distributed rounds of join+agg jobs (measured ~0.5 s of
    * scheduler overhead per round). Above it, min-label propagation runs
    * distributed.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Persist + exact count: BOTH branches consume every pair (driver
    // collect or distributed edge build), and upstream pair generation is
    // typically an expensive sketch join — without the cache the probe
    // and the consumer each run that pipeline in full (measured 2x).
    // Thresholds are capped below Int.MaxValue so the driver collect
    // stays representable.
    val cached = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = cached.count()
    val effThreshold = math.min(driverThreshold, Int.MaxValue.toLong - 1L)
    if (edgeCount <= effThreshold) {
      // Generic over the id type (numeric, string, ...) — same contract as
      // the distributed path, which never casts either.
      val idType = pairs.schema("id_a").dataType
      val edges = cached.select(col("id_a"), col("id_b")).collect()
        .map(r => (r.get(0), r.get(1)))
      cached.unpersist()
      def lt(a: Any, b: Any): Boolean =
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      val parent = scala.collection.mutable.Map.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (lt(ra, rb)) (ra, rb) else (rb, ra); parent(hi) = lo }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("label", idType)))
      val rows = parent.keys.toSeq
        .map(v => org.apache.spark.sql.Row(v, find(v)))
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    } else distributedComponents(cached, maxIter)
  }

  /** `pairs` arrives persisted by connectedComponents and is released here
    * once the doubled edge list is materialized.
    */
  private def distributedComponents(pairs: DataFrame, maxIter: Int): DataFrame = {
    // Undirected edge list, both directions.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize (also fills the edges cache)
    pairs.unpersist()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Each vertex adopts min(own label, neighbors' labels).
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds the cap); raise maxIter")
    }
    // Cut lineage and release the per-round cache: callers get a frame that
    // does not pin the final iteration's blocks forever.
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    out
  }

  /** Resolve candidate pairs into per-document decisions:
    * (id, component, keep) — keep=false means the row is a near-duplicate
    * of the component's survivor (min id). Documents absent from `pairs`
    * are implicit survivors.
    */
  def resolve(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumn("keep", col("id") === col("label"))
      .select(col("id"), col("label").as("component"), col("keep"))

  /** Apply the decision: corpus minus non-survivors. One shuffle (the
    * left-anti join on id).
    */
  def dropDuplicates(corpus: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = resolve(pairs).filter(!col("keep")).select(col("id"))
    corpus.join(losers, corpus(idCol) === losers("id"), "left_anti")
  }
}
