package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VecDot

/** Embedding similarity search (SURVEY.md §2.3).
  *
  * Vectors are `array<float>` columns; all arithmetic is composed from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, no
  * MLlib dependency. Dot products accumulate in double.
  *
  * Scale posture: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — the right plan when queries ≪ corpus. The LSH
  * variants bucket by random-hyperplane signs so candidate generation is an
  * equi-join on bucket key; at 100 TB that is the only shuffle and it moves
  * (id, bucket) pairs, not vectors×vectors.
  */
object Similarity {

  /** dot(a, b) accumulated in double (native VecDot expression — the
    * zip_with/aggregate formulation pays interpreted-lambda dispatch per
    * element).
    */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplanes: `numPlanes` × `dim` values in
    * [-1, 1), derived from a seeded splitmix-style integer mix (stable
    * across runs/JVMs — no java.util.Random state).
    */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(numPlanes, dim) { (p, d) =>
      val h = mix(seed + p.toLong * 10007L + d.toLong)
      (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1)
    }
  }

  /** Sign-bit bucket key of `vec` over explicit plane vectors. */
  def lshBucketFromPlanes(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      when(dot(vec, typedlit(plane)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** Sign-bit bucket key of `vec` over `numPlanes` hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column =
    lshBucketFromPlanes(vec,
      hyperplanes(numPlanes, dim, seed).map(_.toSeq).toSeq)

  /** sha256-derived hyperplanes — the CROSS-ENGINE-portable plane family:
    * each component is an exact 32-bit integer (first 4 digest bytes)
    * scaled to [-1, 1), so a SQL oracle re-derives the identical doubles
    * from `sha256(p || ',' || d)`. Use these when the query must be
    * verifiable outside the JVM; `hyperplanes` (splitmix64 — wrapping
    * multiplies SQL can't express) stays the default elsewhere.
    */
  def portablePlanes(numPlanes: Int, dim: Int,
      salt: String = ""): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes, dim) { (p, d) =>
      val hx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$salt$p,$d".getBytes("UTF-8"))
      val u = ((hx(0) & 0xffL) << 24) | ((hx(1) & 0xffL) << 16) |
        ((hx(2) & 0xffL) << 8) | (hx(3) & 0xffL)
      (u - 2147483648L).toDouble / 2147483648.0
    }

  /** Brute-force cosine top-k: exact baseline. `queries` is broadcast; one
    * corpus scan; per-query top-k via window over (query, cosine).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))),
        col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "id", "cosine", "rk")
  }

  /** Per-label centroids + nearest-centroid assignment — the k-means-step
    * primitive (also how an IVF codebook refreshes). Centroid means are
    * decimal-exact per dimension (order-independent under shuffle, so the
    * output is bit-stable); the tiny centroid table is collected and
    * inlined as literals, making assignment a narrow broadcast-free pass.
    * Returns (label, assigned, n): the label-vs-nearest-centroid confusion
    * counts.
    *
    * Bounded by construction: the collect + literal inlining assume a
    * CLASS-LABEL-sized label space (tens to hundreds — codebooks,
    * language ids, source buckets). `maxLabels` makes the bound explicit:
    * a high-cardinality label column (user ids…) would inline a
    * plan-sized expression per label and must go through a join-based
    * assignment instead.
    */
  def labelCentroidAssign(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, maxLabels: Int = 1024): DataFrame = {
    // Generic over the label type (any orderable, lit-able value);
    // null-label rows contribute no centroid but are still assigned.
    val centroids = corpus
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("clabel"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("clabel"), col("pos"))
      // Exact decimal sum (order-independent) cast to double, THEN a
      // double division by the count: decimal÷bigint would round at a
      // decimal scale that engines pick differently, while double÷long
      // is one IEEE operation both compute identically — this is what
      // keeps the oracle bit-exact.
      .agg((sum(col("x").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("cx"))
      .groupBy(col("clabel"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("sorted"))
      .select(col("clabel"), transform(col("sorted"), _.getField("cx")).as("cvec"))
      .collect()
      .map(r => r.get(0) -> r.getSeq[Double](1))
      .sortWith((a, b) => a._1.asInstanceOf[Comparable[Any]].compareTo(b._1) < 0)
    require(centroids.nonEmpty, "labelCentroidAssign needs at least one non-null label")
    require(centroids.length <= maxLabels,
      s"labelCentroidAssign: ${centroids.length} labels exceeds maxLabels=$maxLabels " +
        "(literal-inlined centroids need a class-label-sized label space)")
    val scored = centroids.map { case (lbl, cvec) =>
      struct(cosine(col(vecCol), typedlit(cvec)).as("score"), lit(lbl).as("cl"))
    }
    // greatest() needs two args; a single-label corpus assigns trivially.
    val best =
      if (scored.size == 1) scored.head else greatest(scored.toIndexedSeq: _*)
    corpus
      .withColumn("assigned", best.getField("cl"))
      .groupBy(col(labelCol).as("label"), col("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("assigned"))
  }

  /** JOIN-based nearest-centroid assignment — the high-cardinality
    * companion to [[labelCentroidAssign]] (whose literal-inlined
    * centroids require a class-label-sized space). Here `centroids` is a
    * DATAFRAME (centroidId, vec) of any size: a coarse IVF quantizer is
    * trained over the CENTROIDS (small k-means — centroids ≪ corpus),
    * each corpus vector probes its `nProbe` nearest coarse cells, and
    * candidate (vector, centroid) pairs meet in an equi-join on coarse
    * cell — never a corpus × centroids cross join, and nothing inlined
    * into the plan. Exact argmax within candidates; nProbe = coarseK
    * recovers the exact assignment (spec'd).
    *
    * Returns (id, assigned, cosine) — one row per corpus vector that
    * found a candidate (every vector does when nProbe ≥ 1, since every
    * coarse cell holds ≥ 0 centroids and probes fan out in affinity
    * order; a vector can only miss if some probed cells are empty, which
    * `nProbe > 1` absorbs in practice).
    */
  def centroidAssignJoin(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      coarseK: Int = 16, nProbe: Int = 2, seed: Long = 42L): DataFrame = {
    val coarse = IvfIndex.train(centroids, centroidVecCol, coarseK, seed = seed)
    val cAssigned = IvfIndex.assign(
        centroids.select(col(centroidIdCol).as("cid"), col(centroidVecCol).as("cvec")),
        "cid", "cvec", coarse)
      .select(col("id").as("cid"), col("vec").as("cvec"), col("cell"))
    val probed = corpus
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", explode(
        slice(IvfIndex.sortCells(coarse, col("vec")), 1, nProbe)))
    probed.join(cAssigned, Seq("cell"))
      .withColumn("cosine", cosine(col("vec"), col("cvec")))
      .groupBy(col("id"))
      .agg(max(struct(col("cosine"), col("cid"))).as("best"))
      .select(col("id"), col("best.cid").as("assigned"), col("best.cosine").as("cosine"))
  }

  /** One Lloyd assignment step: nearest centroid by squared L2, ties to
    * the lower centroid id. `centroids` is a small (cid, cvec) frame —
    * broadcast cross join (k rows replicated, corpus scanned once), the
    * argmin folds through a map-side min(struct(dist, cid)). The
    * distance is a FIXED-ORDER fold (0.0-seeded accumulate over
    * zip_with), so a SQL engine replays the identical doubles — what
    * makes the iterated k-means below oracle-checkable bit-for-bit.
    */
  def lloydAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    corpus.select(col(idCol).as("id"), col(vecCol).as("__vec"))
      .crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .withColumn("__vecd", transform(col("__vec"), x => x.cast("double")))
      .withColumn("dist", aggregate(
        zip_with(col("__vecd"), col("cvec"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"),
        first(col("__vec")).as("vec"))
      .select(col("id"), col("best.cid").as("cid"), col("best.dist").as("dist"),
        col("vec"))

  /** Recompute centroids from an assignment: decimal-exact per-dimension
    * sums (order/partitioning-independent) cast to double, then ONE IEEE
    * division by the member count — the same float discipline as
    * [[labelCentroidAssign]], so both engines rebuild identical centroid
    * doubles. Returns the (cid, cvec) frame for the next
    * [[lloydAssign]]; empty clusters simply drop out.
    */
  def lloydMeans(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("x").cast("decimal(28,10)")).cast("double") / count(lit(1)))
        .as("cx"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("sorted"))
      .select(col("cid"), transform(col("sorted"), _.getField("cx")).as("cvec"))

  /** Cluster-balanced diversity sample — the D4-style curation stage
    * (Tirumala et al. 2023: dedup + diversify before training): nearest-
    * centroid assignment (one broadcast of k rows over one corpus scan,
    * [[lloydAssign]]) followed by a deterministic per-cluster quota: at
    * most `cap` members survive per cluster, chosen by ascending 48-bit
    * sha256 prefix of the salted id (a uniform, rerun-stable draw).
    * Over-dense embedding regions are down-sampled toward uniform
    * cluster representation; clusters at or under the cap pass whole.
    *
    * Scale shape: the quota rides [[ScaleJoins.topKPerGroup]]'s bounded
    * map-side heaps — `cap` rows per cluster per partition cross the
    * shuffle — never a window sort, which would drag the whole corpus
    * into k partitions. The heap score is the NEGATED hash (48 bits,
    * exactly representable in double), so both the retained set and the
    * emitted rank are (hash asc, id asc) — replayable as a ROW_NUMBER
    * in any engine. Returns (cid, idCol, rk), rk 1-based within cluster.
    */
  def clusterSample(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cap: Int, saltPrefix: String = "cs|"): DataFrame = {
    val scored = lloydAssign(corpus, idCol, vecCol, centroids)
      .select(col("id"), col("cid"))
      .withColumn("negh",
        -conv(substring(sha2(concat(lit(saltPrefix), col("id").cast("string")), 256),
            1, 12), 16, 10)
          .cast("long").cast("double"))
    ScaleJoins.topKPerGroup(scored, Seq("cid"), "negh", "id", cap)
      .select(col("cid"), col("id").as(idCol), col("rk").cast("long").as("rk"))
  }

  /** All same-bucket candidate pairs with exact cosine, over explicit
    * planes — the shared core of the top-k and near-dup variants.
    * Candidates share the full bucket key (all sign bits); exact cosine
    * is recomputed only within buckets, so the only shuffle moves
    * (id, bucket, vec) rows into bucket-keyed partitions.
    *
    * Occupancy guard (the SemDedup sign-bit pattern): the plane count is
    * FIXED, so bucket population grows linearly with the corpus and the
    * within-bucket self-join grows QUADRATICALLY — unguarded, this was
    * the r8 sf10 scale-killer (s_ann_lsh: 4 planes = 16 buckets, ~31k
    * rows/bucket at 100× data, 398 s ≈ 80× the sf1 cost for 10× rows).
    * Buckets past `maxBucket` rows are therefore refined by just enough
    * extra hyperplane sign bits to bring EXPECTED occupancy back under
    * the cap: bits = ⌈log₂(n/maxBucket)⌉ (per-bucket adaptive, capped at
    * `refinePlanes`), taken as the top bits of one shared
    * `refinePlanes`-bit key from an independent plane family. Both join
    * sides derive bits from the same broadcast count, so the key is
    * consistent. Below the cap nothing changes — the d_dedup_embedding /
    * s_ann_lsh_portable oracles (driver SFs never fill a bucket past
    * `maxBucket`) stay bit-identical. Recall degrades gracefully instead
    * of the join degenerating: a near-dup pair at cosine c crosses a
    * refinement plane with probability arccos(c)/π per bit (exact dups:
    * never — identical vectors share every sign bit).
    *
    * The guard is OPT-IN (`maxBucket` defaults to unbounded): refinement
    * trades recall for boundedness — at 4 refinement bits a cosine-0.99
    * pair is dropped with ~11% probability — and that is a policy the
    * CALLER must choose, not a silent default that changes an existing
    * caller's pair set the day a bucket fills. The scale-path query
    * (s_ann_lsh) passes maxBucket=1024 explicitly; exact-contract
    * consumers leave it unbounded and keep their bit-stable output.
    */
  /** Recall@k eval of the IVF×PQ retrieval SHAPE with fully PORTABLE
    * quantizers — the oracle-checkable twin of the persisted
    * [[IvfPq]] layout (whose MLlib k-means codebooks float-drift across
    * runs and so can only be spec-checked): IVF cells come from
    * sha256-derived centroids (argmin L2, ties to the lower cell),
    * PQ codebooks are SAMPLED — the `codes` lowest-id corpus vectors'
    * subvectors (the random-sampling init every PQ trainer starts from)
    * — and candidates are scored by asymmetric-distance inner product
    * (per subspace, dot(query sub, codebook entry of the candidate's
    * code)), exactly the ADC chain [[PqIndex]] runs. Every stage —
    * centroid derivation, both argmins, the probe's nProbe cell
    * ranking, the ADC sum (left-associated, fixed fold order) and the
    * top-k tie-break — replays bit-for-bit in a SQL engine, so the
    * recall measurement ITSELF is oracled, not just the machinery.
    *
    * Scale shape: centroids and the `codes`-row sampled codebook are
    * literals/bounded collects; quantization is one narrow corpus
    * projection (no join); probes broadcast; candidates ride the cell
    * equi-join; per-probe windows sort candidate sets, not the corpus.
    * Returns (query_id, n_candidates, n_hits, recall_e6) like the LSH
    * recall eval.
    */
  def portableIvfPqRecall(emb: DataFrame, idCol: String, vecCol: String,
      probeMax: Long = 10L, cells: Int = 16, m: Int = 8, subDim: Int = 8,
      codes: Int = 16, nProbe: Int = 2, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = m * subDim
    val cents = portablePlanes(cells, dim, salt = "ivf:")
    // Sampled codebook: the `codes` lowest-id vectors (bounded collect).
    val cb: IndexedSeq[Seq[Double]] = emb
      .orderBy(col(idCol)).limit(codes)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0)).toIndexedSeq
    require(cb.length == codes,
      s"portableIvfPqRecall: corpus has ${cb.length} < $codes vectors")

    def l2(vec: Column, cvec: Seq[Double]): Column =
      aggregate(zip_with(vec, typedlit(cvec), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)

    val vd = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val cellPick = least(cents.zipWithIndex.map { case (c, i) =>
      struct(l2(col("v"), c).as("d"), lit(i).as("c")) }: _*)
    val coded0 = vd.withColumn("cell", cellPick.getField("c"))
    val coded = (0 until m).foldLeft(coded0) { (df, mi) =>
      val subCol = slice(col("v"), mi * subDim + 1, subDim)
      df.withColumn(s"code_$mi", least((0 until codes).map { j =>
        val cbSub = cb(j).slice(mi * subDim, (mi + 1) * subDim)
        struct(aggregate(
          zip_with(subCol, typedlit(cbSub), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"), lit(j).as("j"))
      }: _*).getField("j"))
    }
    val corpus = Materialize(coded)

    val probes = corpus.filter(col("id") < probeMax)
      .select(col("id").as("query_id"), col("v").as("qv"))
    // nProbe nearest cells per probe: ascending (L2, cell) over the
    // centroid literals — array_sort of (d, c) structs, then slice.
    val probeCellArr = array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(l2(col("qv"), c).as("d"), lit(i).as("c")) }: _*))
    val probed = probes
      .withColumn("pc", explode(slice(probeCellArr, 1, nProbe)))
      .select(col("query_id"), col("qv"), col("pc.c").as("cell"))

    val cand = corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
    // ADC score: left-associated sum over subspaces of
    // dot(query sub m, codebook[code_m] sub m) — the m-lookup chain.
    val adc = (0 until m).map { mi =>
      val qSub = slice(col("qv"), mi * subDim + 1, subDim)
      val cbArr = typedlit((0 until codes).map(j =>
        cb(j).slice(mi * subDim, (mi + 1) * subDim)))
      dot(qSub, element_at(cbArr, col(s"code_$mi") + 1))
    }.reduce(_ + _)
    val scored = cand.withColumn("adc", adc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("id"))
    val ann = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select(col("query_id"), col("id"))
    val exact = cosineTopK(emb, emb.filter(col(idCol) < probeMax),
        idCol, vecCol, k)
      .select(col("query_id"), col("id"))
    val nCand = cand.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_candidates"))
    val nHits = ann.join(exact, Seq("query_id", "id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    probes.select(col("query_id"))
      .join(nCand, Seq("query_id"), "left")
      .join(nHits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        // Multiply BEFORE the integer division: `1000000 / k` at
        // plan-build time loses the remainder for k ∤ 1e6 (k=3 would
        // report perfect recall as 999999).
        expr(s"coalesce(n_hits, CAST(0 AS BIGINT)) * 1000000 DIV $k")
          .as("recall_e6"))
      .orderBy(col("query_id"))
  }

  def annLshPairs(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], maxBucket: Int = Int.MaxValue,
      refinePlanes: Int = 16, refineSeed: Long = 0x5eed2L): DataFrame = {
    require(maxBucket > 0 && refinePlanes >= 1 && refinePlanes <= 60)
    val dim = planes.head.length
    // Materialized (leak-free, see Materialize): referenced on both sides
    // of the self-join — without it the bucket signature (numPlanes dot
    // products per row) is computed twice.
    val withBucket = Materialize(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("bucket", lshBucketFromPlanes(col("vec"), planes)))
    // ≤ 2^numPlanes rows — broadcast no matter the corpus size.
    val counts = withBucket.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
    val keyed = withBucket.join(broadcast(counts), "bucket")
      .withColumn("__subfull", lshBucket(col("vec"), refinePlanes, dim, refineSeed))
      .withColumn("bits",
        when(col("bucket_n") > maxBucket,
          least(ceil(log(2.0, col("bucket_n").cast("double") / maxBucket)),
            lit(refinePlanes.toDouble)))
          .otherwise(lit(0.0)).cast("int"))
      .withColumn("sub",
        when(col("bits") > 0,
          expr(s"shiftright(__subfull, $refinePlanes - bits)"))
          .otherwise(lit(0L)))
    val pruned = keyed.drop("bucket_n", "bits", "__subfull")
    pruned.as("a").join(pruned.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.sub") === col("b.sub") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("cosine"))
  }

  /** LSH-bucketed approximate top-k: candidates share the full bucket key
    * (all `numPlanes` sign bits). Exact cosine is recomputed only within
    * buckets. `maxBucket` opts into the occupancy guard (see
    * [[annLshPairs]]) — approximate-top-k callers usually should (the
    * ranking is already probabilistic), exact-pair-set callers decide.
    */
  def annLshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int, dim: Int, k: Int = 20, seed: Long = 42L,
      maxBucket: Int = Int.MaxValue): DataFrame =
    annLshPairs(corpus, idCol, vecCol,
      hyperplanes(numPlanes, dim, seed).map(_.toSeq).toSeq,
      maxBucket = maxBucket)
      .orderBy(col("cosine").desc, col("id_a"), col("id_b")).limit(k)

  /** Embedding near-dup detection: all bucket-colliding pairs at or above
    * `threshold` cosine — the pair-emission stage of semantic dedup
    * (resolution/collapse is DedupResolve's job). Unlike the top-k
    * variant there is no global ordering, so at scale the output streams
    * straight from the bucket join with no final single-partition sort.
    */
  def annLshNearDup(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], threshold: Double): DataFrame =
    annLshPairs(corpus, idCol, vecCol, planes)
      .filter(col("cosine") >= threshold)
}
