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

  /** [[apply]] with an explicit block storage level. Iterative operators
    * (k-core peel, label propagation) checkpoint a frame per ROUND; at
    * probe scale the default deserialized MEMORY_AND_DISK blocks of
    * still-referenced rounds stack up in the unified pool and turn the
    * whole loop into GC churn (the 36-165 s q_kcore swing band across
    * identical binaries). Serialized blocks cost one encode/decode per
    * consumer but shrink the heap footprint several-fold (and compress
    * via spark.rdd.compress) — the right trade for a frame written once
    * and read once-or-twice the next round.
    */
  def apply(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame =
    df.localCheckpoint(eager = true, storageLevel = level)
}
