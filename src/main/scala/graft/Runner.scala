package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
        val rowsIn = raw.count()
        // Persist: the chain is consumed by the upsert write AND the audit
        // metrics (and the pipeline only persists when critical checks ran).
        val transformed = Transform.pipeline(raw, cfg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // Config-driven upsert key (reference load.py honors the YAML's
          // load.upsert_key); fall back to surrogate_id-then-business_key
          // only when the configured key isn't among the output columns.
          val keyCol =
            if (transformed.columns.contains(cfg.load.upsertKey)) cfg.load.upsertKey
            else if (transformed.columns.contains("surrogate_id")) "surrogate_id"
            else "business_key"
          // Merge into the target: latest row wins by the configured
          // latestBy column, both within the batch and against the target.
          graft.streaming.StreamOps.upsertIntoParquet(
            transformed, targetDir, keys = Seq(keyCol),
            latestBy = cfg.integrity.latestBy,
            tieBreakers = cfg.integrity.tieBreakers)
          val diff = Transform.schemaDiff(transformed, cfg.expectedColumns)
          resourceRows += Audit.resourceMetrics(runId, rid, rowsIn, transformed, keyCol, diff)
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
      if (failure == null) null else failure.getMessage))
    if (rows.nonEmpty) Audit.appendResources(spark, auditDir, rows)
    if (failure != null) throw failure
    RunResult(runId, status, rows, rows.map(_.rows_in).sum, rows.map(_.rows_out).sum)
  }
}
