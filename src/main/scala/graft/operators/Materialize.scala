package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialize a frame consumed 2+ times (self-joins, probe + consumer)
  * WITHOUT pinning a cache entry for the session's lifetime: an eager
  * `localCheckpoint` stores MEMORY_AND_DISK blocks whose lineage-free
  * RDD the ContextCleaner reclaims once the plan is no longer referenced.
  * `persist()` without a matching `unpersist()` (impossible inside a
  * lazily-consumed query builder) leaked one pinned copy per call in
  * long-lived sessions — the harness masked it with catalog.clearCache,
  * library users would not.
  *
  * Cluster tradeoff, deliberate: checkpoint blocks are not recomputable
  * from lineage, so a lost executor fails the stage instead of silently
  * recomputing a multi-pass sketch pipeline — for dedup sketches that is
  * the cheaper failure mode (recompute ≈ full re-scan anyway).
  */
object Materialize {
  def apply(df: DataFrame): DataFrame = df.localCheckpoint()

  /** [[apply]] with an explicit block storage level — for callers whose
    * frames are memory-outsized (DISK_ONLY) or rarely re-read
    * (MEMORY_AND_DISK_SER shrinks heap footprint ~3-5× at one
    * encode/decode per consumer). Measured caution (r14): switching the
    * graph loops' per-round frames to SER did NOT tame the q_kcore
    * isolated swing band (GC logging put total JVM pause ≤ 4.6 s on
    * fast AND slow runs — the variance is I/O-side) and regressed the
    * sf100 label-propagation probe 274.5 → 401.1 s; prefer the default
    * unless the frame demonstrably pressures the unified pool.
    */
  def apply(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame =
    df.localCheckpoint(eager = true, storageLevel = level)
}
