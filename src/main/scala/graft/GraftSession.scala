package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory with graft's recommended configuration —
  * the adoption entry point for a user switching from the reference
  * pipeline: SQL extensions registered (strip_accents/uuid5/shingles/
  * minhash_sig/simhash/vec_dot), AQE on (with skew-join handling),
  * UTC session timezone (cross-engine timestamp parity), and
  * nanosecond-parquet compatibility for event feeds.
  *
  * `shufflePartitions` should track the deployment: cores on a laptop,
  * ~2-3× total executor cores (or data-volume-derived) on a cluster —
  * AQE coalesces the excess at runtime.
  */
object GraftSession {

  def builder(master: String = "", shufflePartitions: Int = 0): SparkSession.Builder = {
    var b = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tz-naive parquet (pandas/pyarrow writers) reads as an instant under
      // the UTC session rather than TIMESTAMP_NTZ, which unix_millis/
      // watermarks reject. Tables.events also normalizes NTZ defensively.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Serialized RDD blocks (persist/localCheckpoint disk tier —
      // graft's Materialize discipline runs through it) compress with
      // the default lz4 codec: the dedup/components pipelines checkpoint
      // shingle-array and pair frames whose text-heavy blocks compress
      // 3-5×, and an uncompressed spill tier is what overflowed the
      // disk in the sf100 components probe. Shuffle spill is already
      // compressed by default; this aligns the checkpoint tier with it
      // (lz4 throughput ≫ local-disk bandwidth, so CPU cost is noise).
      .config("spark.rdd.compress", "true")
    if (master.nonEmpty) b = b.master(master)
    if (shufflePartitions > 0)
      b = b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    b
  }

  /** Build (or reuse) the session and register graft's SQL functions. */
  def getOrCreate(master: String = "", shufflePartitions: Int = 0): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    GraftExtensions.register(spark)
    spark
  }

  /** One shuffle partition per scan split, clamped to [floor, 8192]:
    * the input-sized INITIAL shuffle-partition count. Passed to AQE's
    * `coalescePartitions.initialPartitionNum`, so it is a starting
    * grain, not a final count — AQE coalesces every small shuffle back
    * to the advisory size (i.e. tiny inputs behave exactly like the
    * fixed-cores regime), while shuffles that genuinely carry the
    * input's volume keep enough partitions to stay out of the
    * single-partition spill regime. This is what a cluster deployment
    * configures: initialPartitionNum high (sized by data), AQE sizes
    * down at runtime.
    */
  def sizedInitialPartitions(inputBytes: Long, partitionBytes: Long,
      floor: Int): Int =
    math.min(8192L,
      math.max(floor.toLong, inputBytes / math.max(1L, partitionBytes))).toInt

  /** Recursive byte size of a local directory tree (0 if missing). */
  private def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
    }
  }

  /** Local-harness session (Bench/Verify/RunOne): GraftSession confs +
    * finer scan splits (tiny test parquet — clusters keep the 128 MB
    * default), no UI, WARN logs, and the SQL surface registered. One
    * entry point so the harness can never drift from `getOrCreate`
    * (e.g. an `s.sql` query using strip_accents/minhash_sig failing
    * only under the harness).
    *
    * Shuffle sizing (r13 — promoted from the r12 `SPARK_GRAFT_SHUFFLE`
    * probe knob to the DEFAULT): `spark.sql.shuffle.partitions` stays
    * at cpus (non-AQE surfaces), but AQE's initialPartitionNum is
    * derived from `sfDir`'s on-disk bytes via
    * [[sizedInitialPartitions]] — one initial partition per 4 MB scan
    * split. A fixed-cores count at probe scale forces ~19M
    * rows/partition into hash-agg/sort spills a real deployment never
    * sees (r11 q18_large_orders 2.55x; r12 q_geo_nearest_grid 27x were
    * exactly this); AQE coalescing makes the sized start free for
    * small boards (sf0.1's 17 MB sizes to the cpus floor — bit-for-bit
    * the old regime). `SPARK_GRAFT_SHUFFLE` still overrides BOTH
    * values for fixed-partition A/B probes.
    */
  def harness(cpus: Int, sfDir: String = ""): SparkSession = {
    val partitionBytes = 4L << 20
    val env = sys.env.get("SPARK_GRAFT_SHUFFLE")
      .map(_.trim.toInt).filter(_ > 0)
    val shuffle = env.getOrElse(cpus)
    val initial = env.getOrElse(
      if (sfDir.nonEmpty)
        sizedInitialPartitions(dirBytes(sfDir), partitionBytes, shuffle)
      else shuffle)
    val spark = builder(s"local[$cpus]", shuffle)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initial.toString)
      .config("spark.sql.files.maxPartitionBytes", partitionBytes.toString)
      .config("spark.ui.enabled", "false")
      // Probe-scale heaps (64 GB) see full-GC pauses past the 10 s
      // heartbeat default; in local mode the "lost" executor is the
      // driver's own JVM, so the timeout is pure log noise that can
      // escalate to task re-runs mid-probe. Widen both.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
