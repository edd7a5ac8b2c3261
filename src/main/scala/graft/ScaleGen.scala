package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: scale the driver testdata by integer replication for
  * scale benchmarks — `runMain graft.ScaleGen <srcDir> <outDir> <factor>`.
  *
  * Replica r of each fact row gets every key shifted by r·(max+1) so
  * join cardinalities and per-key row counts are preserved exactly
  * (each replica is a disjoint copy of the star schema; region/nation
  * stay fixed like TPC-H dims). Content columns are decorrelated
  * ACROSS replicas while preserving WITHIN-replica structure, so the
  * dedup/similarity workload keeps its per-replica characteristics
  * instead of turning every document into a 10-way duplicate family:
  *  - documents.text: words whose xxhash64 ≡ 0 (mod 5) — ~20% of the
  *    vocabulary — get a `~r` suffix. Within a replica the rewrite is a
  *    pure vocabulary bijection, so shingle overlap (and thus every
  *    Jaccard/MinHash/SimHash relation) is preserved bit-exactly;
  *    across replicas ~49% of 3-gram shingles differ, far below any
  *    near-dup threshold.
  *  - embeddings.embedding: rotated by r positions. A permutation
  *    applied to both sides preserves all within-replica dot products
  *    and norms; across replicas rotation decorrelates.
  * Everything else (dates, types, values, langs) is copied, so filter
  * selectivities are scale-invariant.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    // Optional 4th arg: comma-separated table subset (e.g.
    // "lineitem,orders,events" to re-create just the relational side of
    // an existing scale dir without churning the doc/vector tables).
    val tables: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.harness(cpus)
    try run(spark, srcDir, outDir, factor, tables) finally spark.stop()
  }

  def run(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int, tables: Option[Set[String]] = None): Unit = {
    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def keyBase(t: String, k: String): Long =
      src(t).agg(max(col(k))).collect()(0).getLong(0) + 1L

    val custB = keyBase("customer", "c_custkey")
    val suppB = keyBase("supplier", "s_suppkey")
    val partB = keyBase("part", "p_partkey")
    val ordB = keyBase("orders", "o_orderkey")
    val evB = keyBase("events", "event_id")
    val docB = keyBase("documents", "doc_id")
    val vecB = keyBase("embeddings", "vec_id")

    // Shifted keys top out at base·factor − 1. The name re-derivation
    // below lpads to exactly 9 digits, and Spark's lpad TRUNCATES wider
    // input — which would silently reintroduce the duplicate-name
    // block-inflation artifact it exists to prevent. Fail loudly instead.
    require(custB * factor <= 1000000000L && suppB * factor <= 1000000000L,
      s"factor $factor pushes customer/supplier keys past 9 digits " +
        s"(custB=$custB, suppB=$suppB); widen the name format first")
    // The per-replica vocabulary suffix uses '~' as its delimiter; a
    // source token already containing '~' could collide with a suffixed
    // twin and break the claimed within-replica vocabulary bijection.
    require(src("documents").filter(col("text").contains("~")).isEmpty,
      "source documents.text contains '~'; pick a different suffix delimiter")

    val reps = spark.range(factor).select(col("id").cast("int").as("r"))
    // Spread the SMALL source across the session's cores BEFORE the
    // ×factor explode: the source parquet is one scan split, and the
    // crossJoin explode runs inside the scan stage — unspread, ONE task
    // generated and shuffle-wrote the entire replicated table (observed
    // at factor 1000: sf100 lineitem had a single core LZ4-compressing
    // ~60 GB of shuffle while 31 idled). With the source spread first,
    // each task explodes its own slice and `write` skips the post-explode
    // repartition entirely — the big data is never shuffled at all.
    val cores = spark.sparkContext.defaultParallelism
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val crossed = df.repartition(cores).crossJoin(broadcast(reps))
      shifts.foldLeft(crossed) { case (d, (c, base)) =>
        d.withColumn(c, col(c) + col("r") * base)
      }
    }
    // `parts` is now a floor, not a target: a frame already wider than
    // it (the spread replicas) writes its own partitions directly.
    def write(df: DataFrame, t: String, parts: Int): Unit =
      if (tables.forall(_.contains(t)))
        (if (df.rdd.getNumPartitions > parts) df else df.repartition(parts))
          .write.mode("overwrite")
          .parquet(s"$outDir/$t.parquet")

    // Dims: fixed, like TPC-H region/nation at every SF.
    write(src("region"), "region", 1)
    write(src("nation"), "nation", 1)

    // Names re-derive from the SHIFTED key in the source's own
    // "Entity#<9-digit-key>" format — replicated rows must not share
    // names, or name-blocked operators (t_fuzzy_match blocks on the
    // 16-char prefix) see 10× block sizes that a REAL 10× TPC-H corpus
    // (keys growing into fresh digits, unique names, constant block
    // occupancy) would never produce: measured 50× query cost from the
    // duplicate-name artifact before this fix.
    write(replicate(src("customer"), "c_custkey" -> custB)
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
      .drop("r"), "customer", 4)
    write(replicate(src("supplier"), "s_suppkey" -> suppB)
      .withColumn("s_name",
        concat(lit("Supplier#"), lpad(col("s_suppkey").cast("string"), 9, "0")))
      .drop("r"), "supplier", 1)
    write(replicate(src("part"), "p_partkey" -> partB)
      .drop("r"), "part", 4)
    write(replicate(src("orders"), "o_orderkey" -> ordB, "o_custkey" -> custB)
      .drop("r"), "orders", 8)
    write(replicate(src("lineitem"), "l_orderkey" -> ordB,
        "l_partkey" -> partB, "l_suppkey" -> suppB)
      .drop("r"), "lineitem", 16)
    write(replicate(src("events"), "event_id" -> evB, "user_id" -> custB)
      .drop("r"), "events", 8)

    // ~20% of the vocabulary gets a per-replica suffix (r=0 untouched:
    // replica 0 IS the source data).
    val perturbed = transform(split(col("text"), " "),
      w => when(col("r") > 0 && pmod(xxhash64(w), lit(5)) === 0,
        concat(w, lit("~"), col("r"))).otherwise(w))
    write(replicate(src("documents"), "doc_id" -> docB)
      .withColumn("text", array_join(perturbed, " "))
      .withColumn("n_chars", length(col("text")).cast(
        src("documents").schema("n_chars").dataType))
      .drop("r"), "documents", 8)

    write(replicate(src("embeddings"), "vec_id" -> vecB)
      .withColumn("embedding", embeddingTransform(col("embedding"), col("r")))
      .drop("r"), "embeddings", 4)

    println(s"[scalegen] wrote ${factor}x of $srcDir to $outDir")
  }

  /** Per-replica orthogonal transform of an embedding: rotate by
    * `r mod dim` (slice is 1-based; a plain rotate-by-r underflows
    * `slice` once factor > dim — found the hard way at factor 100),
    * then flip signs at positions where xxhash64(r, j) is odd. Both
    * steps are orthogonal — every within-replica dot product and norm
    * is preserved EXACTLY — and the sign pattern is what decorrelates
    * replicas that share a rotation (r ≡ r' mod dim), which a rotation
    * alone would make identical copies. r=0 is the untouched source.
    */
  private[graft] def embeddingTransform(emb: Column, r: Column): Column = {
    val dim = size(emb)
    val rot = pmod(r, dim)
    val rotated = when(rot === 0, emb).otherwise(
      concat(slice(emb, rot + 1, dim - rot), slice(emb, lit(1), rot)))
    when(r === 0, emb).otherwise(
      zip_with(rotated, sequence(lit(0), dim - 1),
        (v, j) => when(pmod(xxhash64(r, j), lit(2)) === 0, v).otherwise(-v)))
  }
}
