package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** Robust batched LOAD against a record-level sink (reference
  * etl/load.py:126-158 `_split_batches`/`_shrink_sequence` and
  * :387-441 `_upsert_with_retries`): rows go out in batches, each batch
  * retries with backoff, and batches that keep failing are re-split into
  * the reference's shrinking size sequence so an oversized/poisoned
  * payload degrades to smaller probes instead of sinking the whole load.
  *
  * Differences from the reference, by design:
  *  - The reference re-upserts the ENTIRE row set once per shrink size
  *    (load.py:420-421 loops sizes × all batches) and leans on upsert
  *    idempotence to make that harmless. Graft re-splits only the batches
  *    that exhausted their retries — same eventual state under an
  *    idempotent writer, without re-sending rows that already landed.
  *  - The loop runs per PARTITION via foreachPartition (the reference is
  *    single-node): every executor drives its own batch/retry loop, so
  *    load bandwidth scales with the cluster instead of a driver funnel.
  *    Counters aggregate through Spark accumulators.
  */
object Load {

  /** Decreasing batch sizes for retries, byte-compatible with the
    * reference: 1000 → [1000, 250, 100, 50] (load.py:133-146).
    */
  def shrinkSequence(initial: Int): Seq[Int] = {
    val seq = Seq.newBuilder[Int]
    seq += math.max(1, initial)
    if (initial > 500) seq += 250
    if (initial > 100) seq += 100
    val built = seq.result()
    if (built.last != 50) built :+ 50 else built
  }

  /** A record-level sink client (the reference's PostgREST upsert). Must
    * be idempotent on the upsert key: a batch may be retried after a
    * partial failure. Implementations must be serializable — one instance
    * ships to every executor. Throw to signal a failed batch.
    */
  trait BatchWriter extends Serializable {
    def write(rows: Seq[Row]): Unit
  }

  final case class LoadResult(rowsWritten: Long, failedBatches: Long, rowsFailed: Long)

  /** Write `df` through `writer` with the reference's retry envelope:
    * batches of `batchSize`, each attempted `maxRetries + 1` times with
    * `backoffSeq` sleeps between attempts (last entry repeats, load.py
    * :437-439); exhausted batches re-split through [[shrinkSequence]]'s
    * remaining sizes before counting as failed.
    *
    * `sleeper` is injectable for tests (and for rate-limit shaping).
    */
  def writeWithRetries(
      df: DataFrame,
      writer: BatchWriter,
      batchSize: Int = 1000,
      maxRetries: Int = 2,
      backoffSeq: Seq[Int] = Seq(2, 5, 10),
      sleeper: Int => Unit = s => Thread.sleep(s * 1000L)): LoadResult = {
    val sc = df.sparkSession.sparkContext
    val written = sc.longAccumulator("graft.load.rowsWritten")
    val failedB = sc.longAccumulator("graft.load.failedBatches")
    val failedR = sc.longAccumulator("graft.load.rowsFailed")
    val sizes = shrinkSequence(batchSize)

    df.foreachPartition { (it: Iterator[Row]) =>
      // Attempt one batch with retry/backoff; true iff it landed.
      def attempt(batch: Seq[Row]): Boolean = {
        var tries = 0
        while (true) {
          try { writer.write(batch); written.add(batch.size); return true }
          catch {
            case scala.util.control.NonFatal(_) =>
              tries += 1
              if (tries > maxRetries) return false
              if (backoffSeq.nonEmpty)
                sleeper(backoffSeq(math.min(tries - 1, backoffSeq.size - 1)))
          }
        }
        false
      }
      // Failed batches cascade into the next smaller size; survivors of
      // the smallest size are the load's casualties.
      var pending: Iterator[Seq[Row]] = it.grouped(sizes.head)
      for (size <- sizes) {
        val failed = pending.filterNot(attempt).flatten.toSeq
        pending =
          if (size == sizes.last) {
            failed.grouped(size).foreach { b =>
              failedB.add(1); failedR.add(b.size)
            }
            Iterator.empty
          } else failed.grouped(sizesAfter(sizes, size))
      }
    }
    LoadResult(written.value, failedB.value, failedR.value)
  }

  private def sizesAfter(sizes: Seq[Int], current: Int): Int = {
    val i = sizes.indexOf(current)
    sizes(math.min(i + 1, sizes.size - 1))
  }
}
