package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Transform

/** Key-hash-bucketed parquet target with per-bucket merge — the
  * BATCH-COST upsert sink (reference etl/load.py:388-460 pays per-row
  * via the Postgres index; a parquet lake can't pay per-row, so the
  * standard granularity is per-BUCKET, the Hudi-bucket-index /
  * partition-level-rewrite shape).
  *
  * Layout: `target/kb=<i>/part-*.parquet`, `i = pmod(xxhash64(keys…),
  * numBuckets)` — plain hive partitioning, so `spark.read.parquet
  * (target)` works everywhere, partition pruning applies to the bucket
  * column, and the merge's target read is PRUNED to the buckets the
  * batch actually touches. `_graft_buckets.json` in the root pins
  * (numBuckets, keys) at creation; every later merge re-reads it, so a
  * caller can't silently re-bucket half a table.
  *
  * Cost model (the point): a micro-batch with `k` distinct keys touches
  * ≤ min(k, numBuckets) buckets, so the merge reads + rewrites
  * O(k · |target| / numBuckets) — batch-shaped, not target-shaped. The
  * legacy [[graft.streaming.StreamOps.upsertIntoParquet]] full
  * read-merge-swap stays available for small targets; THIS is the shape
  * that survives a 100 TB target (numBuckets sized so a bucket is a few
  * GB: 4096 buckets × 25 GB ≈ 100 TB).
  *
  * Crash contract: per-bucket atomic swap (live → `_old_kb=i` →
  * staging-in → delete old; `_`-prefixed dirs are invisible to Spark's
  * listing). A crash mid-merge leaves SOME buckets new and some old —
  * weaker than the full-table swap, same contract as
  * [[Sink.compactPartitioned]] — which the idempotent merge heals: the
  * streaming checkpoint replays the same batch, and re-merging already
  * merged rows is a content no-op (last-writer-wins; the stamped
  * variant replays with the same deterministic batch stamp).
  * [[heal]] runs at the start of every merge and finishes any
  * interrupted swap rename-by-rename.
  */
object BucketedTable {

  val BucketCol = "kb"
  private val MetaFile = "_graft_buckets.json"
  private val OldPrefix = "_old_kb="

  /** Bucket id of a key tuple: non-negative, stable across batches and
    * engines that implement xxhash64 (the portability discipline every
    * graft hash column follows).
    */
  def bucketOf(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int")

  /** The logical table: the physical layout (bucket column) stripped. */
  def read(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop(BucketCol)

  /** Stored (numBuckets, keys) — None when the target doesn't exist. */
  def meta(spark: SparkSession, targetDir: String): Option[(Int, Seq[String])] = {
    val (fs, root) = fsRoot(spark, targetDir)
    readMeta(fs, root)
  }

  /** Merge one batch into the bucketed target (creating it on first
    * call), pruned to the batch's buckets. Same merge semantics as
    * [[graft.streaming.StreamOps.upsertIntoParquet]]: within-batch
    * dedup by (latestBy desc, tieBreakers asc), `latestBy` protects the
    * target against stale re-deliveries, `stamp` threads the
    * inserted_at/updated_at row-stamping through the merge.
    */
  def upsert(batch: DataFrame, targetDir: String, keys: Seq[String],
      numBuckets: Int = 256, latestBy: Option[String] = None,
      tieBreakers: Seq[String] = Nil, preDeduped: Boolean = false,
      stamp: Option[Column] = None,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(keys.nonEmpty, "bucketed upsert needs at least one key column")
    require(numBuckets > 0, "numBuckets must be positive")
    require(!batch.columns.contains(BucketCol),
      s"batch must not carry a '$BucketCol' column (reserved for the layout)")
    val spark = batch.sparkSession
    val (fs, root) = fsRoot(spark, targetDir)
    heal(fs, root)
    val deduped =
      if (preDeduped) batch
      else Transform.dedupByKey(batch, keys, latestBy, tieBreakers)

    readMeta(fs, root) match {
      case None =>
        // First load: the whole batch is the table. Staging + one root
        // rename — all-or-nothing like the legacy sink's first write.
        // The meta file is written INTO the staging dir before the
        // rename, so data and meta become visible in the same atomic
        // step: a crash can never leave a loaded target without meta
        // (the old meta-after-rename order had exactly that window, and
        // the next upsert's None branch would have read it as "no
        // table" and wiped it).
        val init = stamp.map(st => Transform.stampInitial(deduped, st))
          .getOrElse(deduped)
        val staging = new Path(targetDir + ".staging")
        fs.delete(staging, true)
        writeBuckets(init, keys, numBuckets, staging.toString,
          numBuckets, maxRecordsPerFile)
        writeMeta(fs, staging, numBuckets, keys)
        if (fs.exists(root)) {
          // Meta-less non-empty root: NOT ours to destroy — either a
          // foreign dataset the caller mistyped, or (pre-atomic-meta
          // layouts) a crash artifact. Refuse loudly instead of
          // silently treating it as a fresh first load.
          if (fs.listStatus(root).nonEmpty)
            throw new java.io.IOException(
              s"BucketedTable: target $targetDir exists non-empty without " +
                s"$MetaFile — refusing to overwrite; delete it explicitly " +
                "or restore the meta file")
          must(fs.delete(root, true), "delete empty target", targetDir)
        }
        must(fs.rename(staging, root), "rename .staging -> target", targetDir)

      case Some((n, storedKeys)) =>
        require(storedKeys == keys,
          s"bucketed target $targetDir was created with keys $storedKeys, " +
            s"merge called with $keys")
        // The batch is micro-batch-sized: materialize it once (it feeds
        // the touched-bucket collect AND the merge union).
        val bk = graft.operators.Materialize(
          deduped.withColumn(BucketCol, bucketOf(keys, n)))
        val touched = bk.select(BucketCol).distinct()
          .collect().map(_.getInt(0)).sorted
        if (touched.nonEmpty) {
          // Partition-PRUNED target read: the In over ≤ numBuckets int
          // literals is planning-cheap (the 65k-literal lesson applies
          // to corpus-sized sets, not bucket counts).
          val tgt = spark.read.parquet(targetDir)
            .filter(col(BucketCol).isin(touched.map(Int.box).toIndexedSeq: _*))
            .drop(BucketCol)
          val merged = stamp match {
            case None =>
              Transform.upsert(tgt, bk.drop(BucketCol), keys, tieBreakers, latestBy)
            case Some(st) =>
              Transform.upsertStamped(tgt, bk.drop(BucketCol), keys, st,
                tieBreakers, latestBy)
          }
          val staging = new Path(targetDir + ".staging")
          fs.delete(staging, true)
          writeBuckets(merged, keys, n, staging.toString,
            touched.length, maxRecordsPerFile)
          touched.foreach(k => swapBucket(fs, root, staging, k, targetDir))
          fs.delete(staging, true)
        }
    }
    // Spark's own writers invalidate cached plans/listings for their
    // output path; our FS-level renames bypass that, so a caller-held
    // cached DataFrame over targetDir would keep serving the pre-swap
    // file list (FAILED_READ_FILE after the _old cleanup). Same hygiene
    // every table format does post-commit.
    spark.catalog.refreshByPath(targetDir)
  }

  /** Finish any interrupted per-bucket swap: a `_old_kb=i` whose live
    * `kb=i` is missing is the pre-swap data (restore it); one whose
    * live dir exists is a completed swap's leftover (drop it).
    */
  def heal(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { s =>
      val name = s.getPath.getName
      if (s.isDirectory && name.startsWith(OldPrefix)) {
        val live = new Path(root, "kb=" + name.stripPrefix(OldPrefix))
        if (!fs.exists(live)) must(fs.rename(s.getPath, live),
          s"heal: restore $name", root.toString)
        else must(fs.delete(s.getPath, true),
          s"heal: drop completed $name", root.toString)
      }
    }
  }

  // One task per touched bucket (repartition on the bucket column) so
  // each bucket dir gets contiguous files; maxRecordsPerFile splits the
  // occasional oversize bucket.
  private def writeBuckets(df: DataFrame, keys: Seq[String], n: Int,
      dir: String, tasks: Int, maxRecordsPerFile: Long): Unit =
    df.withColumn(BucketCol, bucketOf(keys, n))
      .repartition(math.max(tasks, 1), col(BucketCol))
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(BucketCol)
      .mode("overwrite").parquet(dir)

  private def swapBucket(fs: FileSystem, root: Path, staging: Path,
      k: Int, targetDir: String): Unit = {
    val live = new Path(root, s"kb=$k")
    val old = new Path(root, s"$OldPrefix$k")
    val stg = new Path(staging, s"kb=$k")
    // A touched bucket always has staged output: the batch had a row in
    // it and the merge never deletes keys.
    require(fs.exists(stg), s"missing staged bucket kb=$k under $staging")
    if (fs.exists(old)) must(fs.delete(old, true), s"delete stale _old kb=$k", targetDir)
    if (fs.exists(live)) must(fs.rename(live, old), s"rename kb=$k -> _old", targetDir)
    must(fs.rename(stg, live), s"rename staged kb=$k into place", targetDir)
    if (fs.exists(old)) must(fs.delete(old, true), s"delete _old kb=$k", targetDir)
  }

  private def fsRoot(spark: SparkSession, targetDir: String): (FileSystem, Path) = {
    val root = new Path(targetDir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def must(ok: Boolean, what: String, target: String): Unit =
    if (!ok) throw new java.io.IOException(s"BucketedTable: $what failed for $target")

  private def readMeta(fs: FileSystem, root: Path): Option[(Int, Seq[String])] = {
    val p = new Path(root, MetaFile)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val json = try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, false)
      new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    // Tiny fixed-shape doc; parsed with the same regex discipline the
    // RunLog reader uses rather than pulling in a JSON library.
    val n = """"num_buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new java.io.IOException(s"bad $MetaFile at $root: $json"))
    val keys = """"keys"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    Some((n, keys))
  }

  private def writeMeta(fs: FileSystem, root: Path, n: Int,
      keys: Seq[String]): Unit = {
    val json = s"""{"num_buckets":$n,"keys":[${keys.map("\"" + _ + "\"").mkString(",")}]}"""
    val out = fs.create(new Path(root, MetaFile), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
