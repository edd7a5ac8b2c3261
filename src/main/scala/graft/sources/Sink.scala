package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side layout control — at 100 TB the written layout IS the read
  * performance of every downstream query: partition pruning only works if
  * the data is partitioned on the pruned columns, and small-file storms
  * (one file per task per partition value) destroy listing/scan times.
  */
object Sink {

  /** Hive-style partitioned parquet write with file-count control:
    * repartitioning on the partition columns makes each output partition
    * directory receive data from few tasks (no small-file explosion), and
    * `maxRecordsPerFile` caps file size from above. `bucketTasks` spreads
    * a skewed partition value over that many tasks.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      bucketTasks: Int = 1,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    // The salt must be materialized as a column BEFORE repartition():
    // RepartitionByExpression rejects nondeterministic expressions outright,
    // and a deterministic row-content hash is reproducible anyway.
    val salted =
      if (bucketTasks > 1)
        df.withColumn("__salt", pmod(crc32(concat_ws("§",
          df.columns.map(col).toIndexedSeq: _*)), lit(bucketTasks)))
      else df
    val keys = partitionCols.map(col) ++ (if (bucketTasks > 1) Seq(col("__salt")) else Nil)
    // Explicit partition count: AQE would otherwise coalesce small shuffles
    // back into few tasks and undo the requested writer spread.
    val numParts =
      salted.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    salted.repartition(numParts, keys: _*)
      .drop("__salt")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode(mode)
      .parquet(path)
  }

  /** Small-file compaction — the maintenance pass after many incremental
    * appends, where a directory of thousands of KB-sized part files
    * destroys listing and scan times. Sizes the output from the INPUT'S
    * ACTUAL BYTES (ceil(totalBytes / targetBytes) files, so compaction is
    * idempotent and never re-fragments), rewrites, and swaps atomically:
    * the new files land in a temp dir, the old dir is renamed aside, the
    * temp renamed in, and only then is the old data deleted — a reader
    * never observes a half-written dataset, and a crash leaves either the
    * old or the new complete copy. Returns (filesBefore, filesAfter,
    * bytesBefore).
    */
  def compact(df: DataFrame, path: String,
      targetBytes: Long = 128L << 20): (Int, Int, Long) = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val parts = fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".__compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    df.repartition(nOut).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Swap: two renames bracket the only unsafe instant; both are
    // metadata-only on HDFS-like stores.
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: cannot move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    fs.delete(old, true)
    (parts.length, nOut, bytes)
  }

  /** [[compact]] for a hive-partitioned dataset: every leaf partition
    * directory compacts independently (its own byte-derived file count,
    * its own atomic swap), so a reader mid-maintenance sees each
    * partition either fully old or fully new — and a huge backlog can be
    * compacted partition-by-partition across maintenance windows.
    * Returns per-partition (relativeDir, filesBefore, filesAfter).
    */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long = 128L << 20): Seq[(String, Int, Int)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    def leafDirs(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val kids = fs.listStatus(p).toIndexedSeq
      val dirs = kids.filter(_.isDirectory).map(_.getPath)
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(leafDirs)
    }
    val rootUri = root.toUri.getPath
    leafDirs(root).filter(_ != root).map { leaf =>
      // Partition columns live in the directory name, not the files —
      // read the leaf alone and write back only the file columns.
      val (nb, na, _) = compact(spark.read.parquet(leaf.toString),
        leaf.toString, targetBytes)
      (leaf.toUri.getPath.stripPrefix(rootUri).stripPrefix("/"), nb, na)
    }
  }

  /** Artifact write with an oversize manifest (reference etl/load.py's
    * artifact upload: artifacts beyond the size cap are recorded as a
    * manifest of their parts instead of one oversized blob). Writes the
    * frame as parquet; when the total byte size exceeds `maxBytes`, a
    * `_manifest.json` listing every part file + size is placed next to
    * the data so downstream consumers page through parts (underscore
    * prefix: Spark/Hadoop readers treat `_`-files as hidden, so
    * spark.read.parquet on the directory still works). Returns the total
    * bytes written and whether a manifest was emitted.
    */
  def writeArtifact(df: DataFrame, path: String, maxBytes: Long): (Long, Boolean) = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val parts = fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val total = parts.map(_.getLen).sum
    val oversize = total > maxBytes
    if (oversize) {
      val entries = parts.map(s =>
        s"""{"name":"${s.getPath.getName}","bytes":${s.getLen}}""")
      val json =
        s"""{"total_bytes":$total,"max_bytes":$maxBytes,"parts":[${entries.mkString(",")}]}"""
      val out = fs.create(new org.apache.hadoop.fs.Path(p, "_manifest.json"), true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    (total, oversize)
  }
}
