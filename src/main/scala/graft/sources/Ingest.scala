package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config-driven incremental ingestion — the Spark analog of the
  * reference's EXTRACT stage (reference etl/extract.py + etl/get_status.py):
  * poll a landing directory, read only files that are new or modified since
  * the stored state, and advance the state on success.
  *
  * Differences from the reference, by design:
  *  - State is a simple properties file on any Hadoop-compatible FS (the
  *    reference round-trips state.json through object storage).
  *  - Resources are files matched by glob + prefix (the reference filters
  *    CKAN resources by name prefix; same role).
  *  - Excel is out of scope (no such input in this environment); formats are
  *    the Spark-native parquet/csv/json readers.
  *
  * For continuous pipelines prefer StreamOps.readParquetStream (checkpointed
  * file source); this module is the batch/cron-shaped equivalent, like the
  * reference's weekly Railway schedule.
  */
object Ingest {

  final case class SourceCfg(
      format: String, // parquet | csv | json
      dir: String,
      glob: String = "*",
      prefix: String = "",
      /** Resource-name substrings to skip (the reference's SHEET_BLACKLIST). */
      blacklist: Seq[String] = Nil,
      options: Map[String, String] = Map.empty)

  /** resource path → last-seen modification time (epoch millis). */
  type IngestState = Map[String, Long]

  // ------------------------------------------------------------------
  // State file (reference etl/get_status.py: ensure_state_locally)
  // ------------------------------------------------------------------

  def loadState(spark: SparkSession, statePath: String): IngestState = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try {
        val props = new java.util.Properties()
        props.load(in)
        val out = mutable.Map.empty[String, Long]
        props.forEach((k, v) => out(k.toString) = v.toString.toLong)
        out.toMap
      } finally in.close()
    }
  }

  def saveState(spark: SparkSession, statePath: String, state: IngestState): Unit = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val props = new java.util.Properties()
      state.foreach { case (k, v) => props.setProperty(k, v.toString) }
      props.store(out, "graft ingest state")
    } finally out.close()
  }

  // ------------------------------------------------------------------
  // Incremental listing (reference etl/extract.py: extract_updated_dfs)
  // ------------------------------------------------------------------

  /** Files under cfg.dir matching glob+prefix that are new or modified
    * relative to `state`, plus the advanced state covering them.
    */
  def newFiles(spark: SparkSession, cfg: SourceCfg,
      state: IngestState): (Seq[FileStatus], IngestState) = {
    val dir = new Path(cfg.dir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return (Nil, state)
    val all = fs.globStatus(new Path(dir, cfg.glob)).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(cfg.prefix) &&
        !cfg.blacklist.exists(st.getPath.getName.contains))
    val fresh = all.filter { st =>
      state.get(st.getPath.toString).forall(_ < st.getModificationTime)
    }
    val advanced = state ++ fresh.map(st => st.getPath.toString -> st.getModificationTime)
    (fresh, advanced)
  }

  /** Read only new/changed files. Returns None when nothing changed (the
    * reference logs "no new resources" and skips the run). Caller persists
    * results, then calls `saveState` with the returned state — state
    * advances only after a successful load, exactly like the reference's
    * promote-state-after-DB-OK rule (reference etl/load.py).
    */
  def extractUpdated(spark: SparkSession, cfg: SourceCfg,
      statePath: String): Option[(DataFrame, IngestState)] = {
    val state = loadState(spark, statePath)
    val (fresh, advanced) = newFiles(spark, cfg, state)
    if (fresh.isEmpty) None
    else {
      val reader = spark.read.options(cfg.options)
      val paths = fresh.map(_.getPath.toString)
      val df = cfg.format match {
        case "parquet" => reader.parquet(paths: _*)
        case "csv" => reader.option("header", "true").csv(paths: _*)
        case "json" => reader.json(paths: _*)
        case other => throw new IllegalArgumentException(s"unsupported format: $other")
      }
      Some((df, advanced))
    }
  }
}
