package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, when}

import graft.config.DatasetConfig
import graft.operators.{Audit, Transform, TransformHardFail}

/** The pipeline orchestrator — the analog of the reference's
  * `pipeline.py::etl_process` (EXTRACT → TRANSFORM → LOAD → AUDIT), with
  * Spark-native pieces: per-resource transform via `Transform.pipeline`,
  * idempotent merge into a parquet target via `Transform.upsert`, and
  * `etl_runs`/`etl_run_resources` audit appended on success AND failure
  * (the reference records failed runs too).
  *
  * State promotion contract mirrors the reference (etl/load.py): callers
  * using `Ingest.extractUpdated` save the advanced state ONLY after this
  * returns successfully.
  */
object Runner {

  final case class RunResult(
      runId: String,
      status: String,
      resources: Seq[Audit.ResourceRow],
      rowsInTotal: Long,
      rowsOutTotal: Long)

  def run(
      spark: SparkSession,
      resources: Map[String, DataFrame],
      cfg: DatasetConfig,
      targetDir: String,
      auditDir: String,
      runId: String): RunResult = {
    val started = new java.sql.Timestamp(System.currentTimeMillis())
    val resourceRows = Seq.newBuilder[Audit.ResourceRow]
    var status = "ok"
    var failure: Throwable = null
    try {
      resources.toSeq.sortBy(_._1).foreach { case (rid, raw) =>
        // ALL audit metrics ride the load action as Dataset.observe
        // accumulators — no standalone raw.count() scan and no post-load
        // metrics aggregation over the transformed frame (at 100 TB those
        // were two extra full passes; the reference's per-resource report
        // becomes piggybacked CollectMetrics instead).
        val inObs = org.apache.spark.sql.Observation(s"graft_in_${runId}_$rid")
        val transformed = Transform.pipeline(
          raw.observe(inObs, count(lit(1)).as("rows_in")), cfg)
        try {
          // Config-driven upsert key (reference load.py honors the YAML's
          // load.upsert_key); fall back to surrogate_id-then-business_key
          // only when the configured key isn't among the output columns.
          val keyCol =
            if (transformed.columns.contains(cfg.load.upsertKey)) cfg.load.upsertKey
            else if (transformed.columns.contains("surrogate_id")) "surrogate_id"
            else "business_key"
          // The upsert's own dedup window, applied HERE so rows_out and
          // the duplicate-key count (`__rn = 2` ≡ "key has a 2nd row")
          // are observed on it in-flight; the upsert then skips its
          // internal window (preDeduped).
          val ranked = Transform.dedupRank(transformed, Seq(keyCol),
            latestBy = cfg.integrity.latestBy, tieBreakers = cfg.integrity.tieBreakers)
          val outObs = org.apache.spark.sql.Observation(s"graft_out_${runId}_$rid")
          val observed = ranked.observe(outObs,
            count(lit(1)).as("rows_out"),
            count(when(col("__rn") === 2, true)).as("dup_keys"))
          // Recommended-column advisories (reference transform.py:256-270)
          // also ride the load action: non-null counts of the recommended
          // columns observed on the post-dedup frame — zero extra passes.
          val deduped = observed.filter(col("__rn") === 1).drop("__rn")
          val recCols = cfg.recommended.flatten.distinct
            .filter(deduped.columns.contains).toIndexedSeq
          val recObs = org.apache.spark.sql.Observation(s"graft_rec_${runId}_$rid")
          val loaded =
            if (recCols.isEmpty) deduped
            else deduped.observe(recObs,
              count(col(recCols.head)).as(recCols.head),
              recCols.tail.map(c => count(col(c)).as(c)): _*)
          // Merge into the target: latest row wins by the configured
          // latestBy column, both within the batch and against the target.
          graft.streaming.StreamOps.upsertIntoParquet(
            loaded,
            targetDir, keys = Seq(keyCol),
            latestBy = cfg.integrity.latestBy,
            tieBreakers = cfg.integrity.tieBreakers,
            preDeduped = true)
          val diff = Transform.schemaDiff(transformed, cfg.expectedColumns)
          // All gets return instantly: the load action above computed the
          // observe nodes (rows_in possibly earlier, during the pipeline's
          // critical-check action — first action wins, same value).
          val rowsIn = inObs.get("rows_in").asInstanceOf[Long]
          val rowsOut = outObs.get("rows_out").asInstanceOf[Long]
          val dupKeys = outObs.get("dup_keys").asInstanceOf[Long]
          val recCounts: Map[String, Long] =
            recCols.map(c => c -> recObs.get(c).asInstanceOf[Long]).toMap
          val recWarns = Transform.recommendedWarnings(
            deduped, cfg.recommended, precomputed = Some(recCounts))
          resourceRows += Audit.ResourceRow(runId, rid, rowsIn, rowsOut, dupKeys,
            math.max(0L, rowsIn - rowsOut), diff.missing.size, diff.extra.size,
            recWarns.mkString(","))
        } finally transformed.unpersist() // pipeline persists at its check barrier
      }
    } catch {
      // Record ANY failure in the audit trail (the reference logs failed
      // runs too), then rethrow the original exception.
      case scala.util.control.NonFatal(e) => status = "failed"; failure = e
    }
    val rows = resourceRows.result()
    val ended = new java.sql.Timestamp(System.currentTimeMillis())
    Audit.appendRun(spark, auditDir, Audit.RunRow(
      runId, started, ended, status, rows.size,
      rows.map(_.rows_in).sum, rows.map(_.rows_out).sum,
      if (failure == null) null else failure.getMessage,
      stamp_local = graft.sources.Log.nowIsoLocal()))
    if (rows.nonEmpty) Audit.appendResources(spark, auditDir, rows)
    if (failure != null) throw failure
    RunResult(runId, status, rows, rows.map(_.rows_in).sum, rows.map(_.rows_out).sum)
  }
}
