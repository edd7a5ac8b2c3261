package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Transform

/** Structured Streaming analogs of the reference's incremental ETL
  * (SURVEY.md §2.4).
  *
  * The reference polls CKAN and uses `state.json` watermarks to process
  * only new/changed resources (reference etl/get_status.py + extract.py);
  * Structured Streaming's file source + checkpoint IS that loop, with
  * exactly-once bookkeeping instead of a hand-rolled state file. The LOAD
  * upsert (reference etl/load.py:388-460) becomes a foreachBatch
  * merge-by-key.
  *
  * All transforms here are plain DataFrame→DataFrame so the same logic runs
  * in batch (tested against the DuckDB oracle via their batch twins) and in
  * streams (tested with memory sinks in StreamingSpec).
  */
object StreamOps {

  /** File-source stream over a directory of parquet drops with a known
    * schema. `maxFilesPerTrigger=1` gives deterministic per-file
    * micro-batches in tests; leave default for throughput in production.
    */
  def readParquetStream(
      spark: SparkSession,
      dir: String,
      schemaFrom: DataFrame,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Canonicalize an event stream: trimmed strings, bounded values nulled,
    * business key added — the streaming twin of the batch transform chain.
    */
  def canonicalizeEvents(df: DataFrame): DataFrame = {
    // coalesce each part to '' — raw concat_ws SKIPS nulls, which collides
    // (null,"x") with ("x",null) and diverges from the batch twin's
    // Transform.businessKeyCol encoding.
    def part(c: org.apache.spark.sql.Column) = coalesce(c.cast("string"), lit(""))
    df.withColumn("event_type", trim(col("event_type")))
      .withColumn("business_key",
        concat_ws("|", part(col("user_id")), part(col("event_type")), part(col("ts"))))
  }

  /** Stream-static enrichment: join the (unbounded) event stream against a
    * bounded dimension with an explicit broadcast — the standard
    * lookup-table pattern. Stream-static joins need no watermark or state:
    * each micro-batch joins against the current dim snapshot.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Watermarked tumbling-window aggregation (counts + exact decimal sums,
    * same discipline as the batch queries).
    */
  def windowedAgg(df: DataFrame, watermark: String = "30 minutes",
      windowLen: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native session-window aggregation (Spark's built-in merging session
    * windows inside the agg operator) — the declarative sibling of
    * Sessionize.flatMapGroupsWithState for when per-session output is
    * just an aggregate. Works identically over batch and streaming input;
    * in streaming append mode a session emits once the watermark passes
    * its gap boundary.
    */
  def sessionWindowAgg(df: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Streaming dedup on a business key, state bounded by the watermark
    * (the streaming twin of Transform.dedupByKey / the reference's
    * enforce_unique_business_key). `dropDuplicatesWithinWatermark` is
    * streaming-only, so in batch the SAME call degrades to plain
    * `dropDuplicates` — the deterministic contract either way is the
    * surviving KEY SET (which physical row survives is arrival-order /
    * partition-order dependent in both modes).
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String],
      watermark: String = "30 minutes"): DataFrame =
    if (df.isStreaming)
      df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** Streaming SPAN dedup — the incremental twin of
    * `TextDedup.spanDedup`: documents explode into `w`-word spans and
    * every span already seen earlier in the stream is dropped
    * (first-seen survivor). State holds one key per distinct span —
    * unbounded by design here; production corpora bound it with a
    * watermark/TTL on an event-time column (as in
    * [[dedupWithinWatermark]]). The SET of surviving spans equals the
    * batch operator's; WHICH occurrence survives inside one micro-batch
    * is arrival-order-dependent (the batch twin's (doc_id, position)
    * rule needs a global sort a stream cannot see).
    */
  def spanDedupStream(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 10): DataFrame =
    graft.operators.TextDedup.spans(docs, idCol, textCol, w).dropDuplicates("ch")

  /** Streaming DSIR quality gate: score each arriving document against a
    * PRE-FITTED bounded bucket model (Dsir.collectModel) and keep
    * target-like docs. Fully stateless — the model rides the plan as a
    * numBuckets-bounded literal, scoring is one projection — so the gate
    * runs in append mode with no watermark and composes before any
    * stateful stage. Refreshing the model = restarting the query with a
    * new map (the model is a run parameter, like the reference's YAML
    * config, not state).
    */
  def dsirGate(docs: DataFrame, model: Map[Long, Double],
      threshold: Double, numBuckets: Int = 4096): DataFrame =
    graft.operators.Dsir.scoreStateless(docs, "doc_id", "text", model, numBuckets)
      .filter(col("dsir_score") >= threshold)

  /** Streaming Count-Min sketch maintenance: a global streaming
    * aggregation whose state is ONE depth×width counter grid (the custom
    * mergeable CountMinAgg — the state store carries the serialized
    * sketch, each micro-batch folds in by elementwise sum). Complete
    * mode emits the up-to-date sketch every trigger; because the merge
    * is exactly associative, the emitted sketch after N batches is
    * bit-identical to the batch aggregate over their union (spec'd).
    * This is the streaming shape of per-item frequency monitoring at an
    * open vocabulary: constant state, no per-key streaming state store
    * entries, no watermark.
    */
  def countMinStream(stream: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    stream.groupBy()
      .agg(graft.functions.countMin(col(itemCol), depth, width).as("sk"))
      .select(col("sk.total").as("total"), col("sk.counters").as("counters"))

  /** Watermarked stream-stream interval join: each left event pairs with
    * right events of the same key within `[l.ts, l.ts + window]`. Both
    * sides carry watermarks so join state is evicted once event time
    * passes; state is bounded by (watermark + window) per key.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      watermark: String = "1 hour", windowExpr: String = "INTERVAL 1 HOUR",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    // The two-sided time bound + both watermarks is exactly what lets
    // Spark age out join state AND — for the outer variants — declare a
    // left row unmatchable once the right watermark passes l.ts + window,
    // at which point the null-padded row is emitted. Without the bound an
    // outer stream-stream join would have to hold state forever.
    l.join(r,
      expr(s"l.$key = r.$key AND r.ts >= l.ts AND r.ts <= l.ts + $windowExpr"),
      joinType)
  }

  /** Incremental exact-substring dedup as a STREAMING stage: each
    * micro-batch is cut against the gram index the PRIOR batches built
    * ([[graft.operators.SubstrIndex.dedupBatch]] — touched-bucket
    * partition-filtered probe, never a corpus re-read), its cleaned docs
    * append to `outPath`, and its raw grams grow the index. When drops
    * arrive in doc-id order (the crawl timeline), the accumulated output
    * equals ONE batch [[graft.operators.TextDedup.substringDedup]] over
    * the union — the property the st_substr_gate oracle checks
    * end-to-end. Restart caveat: the out/ sink is plain append — a batch
    * replayed after a crash between the write and the checkpoint commit
    * would double-append (same class as the CDC sink's at-least-once
    * contract; production points outPath at an idempotent/batchId-keyed
    * committer). The nastier crash window — append committed, checkpoint
    * not, so the replay probes an index that already owns the batch's
    * own grams — is healed inside [[graft.operators.SubstrIndex
    * .dedupBatch]]: postings keyed by the batch's own doc ids are
    * excluded from the probe (globally-unique ids mean they can only be
    * a replayed append), so the replayed output is byte-identical to
    * the crashed run's and the replayed append is a no-op (spec'd).
    */
  def substrDedupSink(
      df: DataFrame,
      indexPath: String,
      outPath: String,
      checkpointDir: String,
      idCol: String,
      textCol: String,
      minTokens: Int = 8,
      numBuckets: Int = 64): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // One materialization: the batch feeds the dedup AND the index
        // growth below.
        val b = batch.localCheckpoint()
        val meta = new org.apache.hadoop.fs.Path(s"$indexPath/meta")
        val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val exists = fs.exists(meta)
        if (exists)
          // One shared gram pass for dedup + index growth (emit before
          // grow — the crash-replay contract): the dedupBatch-then-
          // append sequence hashed and checkpointed every batch window
          // twice and collected the touched-bucket list twice.
          graft.operators.SubstrIndex.dedupAndAppend(
            spark, indexPath, b, idCol, textCol, outPath)
        else {
          // first drop: no standing corpus — batch-internal dedup
          graft.operators.TextDedup.substringDedup(
              b, idCol, textCol, minTokens)
            .write.mode("append").parquet(outPath)
          graft.operators.SubstrIndex.build(
            b, idCol, textCol, indexPath, minTokens, numBuckets)
        }
        ()
      }
      .start()

  /** foreachBatch upsert sink: merge each micro-batch into a parquet
    * target by key (last-writer-wins within the batch via tieBreakers).
    * The swap is write-new → rename, via the Hadoop FileSystem API so it
    * works on HDFS/object-store committers, not just local disk.
    *
    * `buckets = Some(n)` switches the target to the key-hash-bucketed
    * layout ([[graft.sources.BucketedTable]]) and makes each merge
    * BATCH-cost: only the buckets the batch touches are read and
    * rewritten, O(batchKeys · target/n) per micro-batch instead of the
    * legacy full read-merge-swap's O(|target|) — the shape that
    * survives a 100 TB target. Read the bucketed result through
    * `BucketedTable.read` (or ignore the extra `kb` partition column).
    */
  def upsertSink(
      df: DataFrame,
      targetDir: String,
      checkpointDir: String,
      keys: Seq[String],
      latestBy: Option[String] = None,
      tieBreakers: Seq[String] = Nil,
      stamp: Option[Long => Column] = None,
      buckets: Option[Int] = None): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        buckets match {
          case Some(n) =>
            graft.sources.BucketedTable.upsert(batch, targetDir, keys,
              numBuckets = n, latestBy = latestBy, tieBreakers = tieBreakers,
              stamp = stamp.map(_(batchId)))
          case None =>
            upsertIntoParquet(batch, targetDir, keys, latestBy, tieBreakers,
              stamp = stamp.map(_(batchId)))
        }
      }
      .start()

  /** One merge step: read current target (if any), upsert the batch, swap
    * directories. Within-batch duplicate keys keep the LATEST row by
    * `latestBy` (descending), then `tieBreakers` ascending — matching the
    * keep-latest integrity semantics (ascending-only tie-breakers would
    * silently keep the OLDEST row).
    *
    * Per-batch cost is O(|target|) — the full table is read and
    * rewritten every merge. Fine for small/medium targets where the
    * all-or-nothing swap is worth it; for a large target use
    * [[graft.sources.BucketedTable.upsert]] (or `upsertSink(buckets =
    * Some(n))`), which confines each merge to the key-hash buckets the
    * batch touches.
    *
    * Swap order is crash-recoverable: target → .old, staging → target,
    * delete .old; a crash window leaves either the old target or a
    * recoverable `.old` (healed on the next call). True atomicity needs a
    * transactional table format — on object stores rename is copy+delete,
    * so widen the maintenance window accordingly.
    */
  def upsertIntoParquet(batch: DataFrame, targetDir: String,
      keys: Seq[String], latestBy: Option[String] = None,
      tieBreakers: Seq[String] = Nil, preDeduped: Boolean = false,
      stamp: Option[Column] = None): Unit =
    mergeIntoParquet(batch, targetDir) { (spark, targetExists) =>
      // preDeduped: the caller already ran the dedup window (e.g. to
      // observe duplicate metrics on it) — re-running it here would add
      // a second whole-batch shuffle for nothing.
      val deduped =
        if (preDeduped) batch else Transform.dedupByKey(batch, keys, latestBy, tieBreakers)
      // stamp: the reference's inserted_at/updated_at row-stamping rides
      // the merge (Transform.upsertStamped) — pass `current_timestamp()`
      // per batch in production, a deterministic batch-seq in tests.
      (targetExists, stamp) match {
        case (false, None)     => deduped
        case (false, Some(st)) => Transform.stampInitial(deduped, st)
        case (true, None)      =>
          // latestBy participates against the TARGET too: a re-delivered
          // stale batch row must not regress a newer target row.
          Transform.upsert(spark.read.parquet(targetDir), deduped, keys,
            tieBreakers, latestBy)
        case (true, Some(st))  =>
          Transform.upsertStamped(spark.read.parquet(targetDir), deduped,
            keys, st, tieBreakers, latestBy)
      }
    }

  /** foreachBatch CDC sink: compact each micro-batch's insert/update/
    * delete changelog onto the parquet target via
    * `Transform.applyChangelog` — the streaming LOAD path for sources
    * that emit deletions (which `upsertSink` cannot express). Batch
    * columns = target payload + `opCol` + the ordering columns; the
    * latter two are dropped on write.
    */
  def cdcSink(
      df: DataFrame,
      targetDir: String,
      checkpointDir: String,
      keys: Seq[String],
      opCol: String = "op",
      latestBy: Option[String] = None,
      tieBreakers: Seq[String] = Nil): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        cdcIntoParquet(batch, targetDir, keys, opCol, latestBy, tieBreakers)
      }
      .start()

  /** One CDC merge step (see [[cdcSink]]); batch mode callable. */
  def cdcIntoParquet(batch: DataFrame, targetDir: String,
      keys: Seq[String], opCol: String = "op",
      latestBy: Option[String] = None, tieBreakers: Seq[String] = Nil): Unit =
    mergeIntoParquet(batch, targetDir) { (spark, targetExists) =>
      val payload = batch.columns
        .filterNot(c => c == opCol || latestBy.contains(c) || tieBreakers.contains(c))
      val snapshot =
        if (targetExists) spark.read.parquet(targetDir)
        else batch.select(payload.map(col).toIndexedSeq: _*).limit(0)
      Transform.applyChangelog(snapshot, batch, keys, opCol, latestBy, tieBreakers)
    }

  /** foreachBatch windowed range-count sink — the streaming twin of
    * [[graft.operators.RangeJoin.countInInterval]] (the r11
    * order-statistics plan): `intervals` is a STATIC frame (the
    * registered window table), points stream in, and each micro-batch
    * writes its per-interval counts to a batchId-keyed subdirectory of
    * `targetDir`. count(interval) is distributive over ANY partition of
    * the points, so the published aggregate ([[rangeCountRead]]) equals
    * the batch operator over the union of all batches bit-for-bit —
    * order-INsensitive, unlike the substring gate. The batchId-keyed
    * overwrite is what makes replay idempotent: a batch re-run after a
    * crash between write and checkpoint commit overwrites its own
    * subdirectory instead of double-counting (a running-total merge
    * target would silently double-add — the at-least-once hazard the
    * CDC sink documents).
    */
  def rangeCountSink(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String, idCol: String,
      targetDir: String,
      checkpointDir: String): StreamingQuery =
    points.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.RangeJoin.countInInterval(
            batch, pointTs, intervals, startCol, endCol, idCol)
          .write.mode("overwrite").parquet(s"$targetDir/batch_$batchId")
        ()
      }
      .start()

  /** Publish step for [[rangeCountSink]]: sum the per-batch increments.
    * One groupBy over (#batches × matched intervals) rows — interval-
    * cardinality, never point-cardinality. The zero-count intervals are
    * absent (inner-join contract, matching countInInterval).
    */
  def rangeCountRead(spark: org.apache.spark.sql.SparkSession,
      targetDir: String, idCol: String): DataFrame =
    spark.read.parquet(increments(spark, targetDir, "batch_"): _*)
      .groupBy(col(idCol)).agg(sum(col("n_points")).as("n_points"))

  /** Concrete batchId-keyed subdirectories of a sink target. Globbing
    * (`targetDir/batch_*`) works but makes every publish read stat the
    * literal glob string for a `_spark_metadata` dir (FileStreamSink
    * .hasMetadata), logging a spurious FileNotFoundException WARN stack
    * per read — explicit paths keep probe/ops logs exception-free.
    */
  private def increments(spark: org.apache.spark.sql.SparkSession,
      targetDir: String, prefix: String): Seq[String] = {
    val dir = new Path(targetDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(prefix)).map(_.toString).toSeq
  }

  /** foreachBatch per-user event-transition sink — STATEFUL streaming:
    * the per-user LAST EVENT must survive micro-batch boundaries so the
    * transition that straddles two batches (user's last event of batch
    * N → first event of batch N+1) is counted exactly once. State lives
    * as a batchId-VERSIONED user-cardinality snapshot
    * (`state_<batchId>` = prior snapshot overridden by this batch's
    * per-user lasts), and the boundary join always reads
    * `state_<batchId-1>` — NOT "the latest" — so an at-least-once
    * REPLAY of batch N recomputes against exactly the state it saw the
    * first time (a mutate-in-place state table would feed the replay
    * its own output: the stateful twin of the double-count hazard the
    * range sink documents). Increments are batchId-keyed overwrites,
    * idempotent as in [[rangeCountSink]].
    *
    * Requires the stream to deliver each user's events in
    * (ts, event_id) order ACROSS batches (within a batch any order is
    * fine — the lag window sorts); a time-split file source satisfies
    * this, matching the replay/backfill regime the batch operator runs
    * in. Scale shape: state is user-cardinality (one row per user seen
    * so far), increments are ≤ |types|² per batch, the per-batch lag
    * window shuffles only the batch.
    */
  def transitionsSink(
      events: DataFrame,
      targetDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.localCheckpoint() // 3 consumers: pairs/firsts/lasts
        val wAsc = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val intra = b.withColumn("dst", lead(col("event_type"), 1).over(wAsc))
          .filter(col("dst").isNotNull)
          .select(col("event_type").as("src"), col("dst"))
        val firsts = b.withColumn("rn", row_number().over(wAsc))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("first_type"))
        val lasts = b.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("user_id")
              .orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("last_type"))
        val statePath = new Path(s"$targetDir/state_${batchId - 1}")
        val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // batchId > 0 with a missing prior snapshot means the target dir
        // was wiped or partially lost while the checkpoint survived —
        // defaulting to empty state would silently publish wrong
        // boundary transitions. Fail loudly; recovery is wiping the
        // checkpoint too and replaying from the source.
        if (batchId > 0 && !fs.exists(statePath))
          throw new IllegalStateException(
            s"transitionsSink: state snapshot $statePath missing for batch " +
              s"$batchId — target dir lost while checkpoint survived; wipe " +
              "the checkpoint and replay")
        val prev =
          if (batchId > 0) spark.read.parquet(statePath.toString)
          else lasts.limit(0)
        val boundary = prev.join(firsts, Seq("user_id"))
          .select(col("last_type").as("src"), col("first_type").as("dst"))
        intra.unionByName(boundary)
          .groupBy("src", "dst").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$targetDir/inc_$batchId")
        prev.join(lasts, Seq("user_id"), "left_anti")
          .unionByName(lasts)
          .write.mode("overwrite").parquet(s"$targetDir/state_$batchId")
        ()
      }
      .start()

  /** Publish step for [[transitionsSink]]: sum the per-batch increments
    * and derive the per-src floor-ppm share — column-identical to the
    * batch `q_event_transitions`, so the batch oracle replays verbatim.
    */
  def transitionsRead(spark: org.apache.spark.sql.SparkSession,
      targetDir: String): DataFrame = {
    val counts = spark.read.parquet(increments(spark, targetDir, "inc_"): _*)
      .groupBy("src", "dst").agg(sum(col("n")).as("n"))
    counts
      .withColumn("tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), col("n"),
        expr("n * 1000000 DIV tot").as("share_ppm"))
  }

  /** foreachBatch per-source admission-quota sink — STATEFUL streaming:
    * admit each source's first `quota` documents by doc_id order across
    * ALL batches (the streaming twin of a batch
    * `row_number() OVER (PARTITION BY source ORDER BY doc_id) <= quota`
    * — the canonical "cap any one domain at ingest" gate). State is the
    * per-source SEEN count so far, batchId-VERSIONED like
    * [[transitionsSink]]: batch N's admission ranks are offset by
    * `state_<N-1>` — never "the latest" — so an at-least-once replay of
    * batch N recomputes against exactly the counts it saw the first
    * time; admitted rows land in a batchId-keyed overwrite (idempotent
    * as in [[rangeCountSink]]).
    *
    * Requires the stream to deliver each source's docs in doc_id order
    * ACROSS batches (a doc_id-split file source satisfies this — the
    * backfill regime); within a batch any order is fine, the rank
    * window sorts. Scale shape: state is source-cardinality, the
    * per-batch rank window shuffles only the batch, and published
    * increments total ≤ quota·|sources| rows.
    */
  def quotaSink(
      docs: DataFrame,
      quota: Int,
      targetDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.localCheckpoint() // 2 consumers: ranks + counts
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("doc_id"))
        val counts = b.groupBy(col("source")).agg(count(lit(1)).as("n_new"))
        val statePath = new Path(s"$targetDir/state_${batchId - 1}")
        val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // Same discipline as transitionsSink: a missing prior snapshot at
        // batchId > 0 is a lost target dir, not a cold start — empty
        // seen-counts would silently over-admit. Fail loudly.
        if (batchId > 0 && !fs.exists(statePath))
          throw new IllegalStateException(
            s"quotaSink: state snapshot $statePath missing for batch " +
              s"$batchId — target dir lost while checkpoint survived; wipe " +
              "the checkpoint and replay")
        val prev =
          if (batchId > 0) spark.read.parquet(statePath.toString)
          else counts.select(col("source"), col("n_new").as("n_seen")).limit(0)
        b.withColumn("rn", row_number().over(w))
          .join(prev, Seq("source"), "left")
          .withColumn("rk",
            col("rn").cast("long") + coalesce(col("n_seen"), lit(0L)))
          .filter(col("rk") <= quota)
          .select(col("doc_id"), col("source"), col("rk"))
          .write.mode("overwrite").parquet(s"$targetDir/inc_$batchId")
        prev.join(counts, Seq("source"), "full_outer")
          .select(col("source"),
            (coalesce(col("n_seen"), lit(0L)) +
              coalesce(col("n_new"), lit(0L))).as("n_seen"))
          .write.mode("overwrite").parquet(s"$targetDir/state_$batchId")
        ()
      }
      .start()

  /** Publish step for [[quotaSink]]: the admitted rows are disjoint
    * across batchId-keyed increments by construction (ranks are offset
    * by the versioned seen-counts), so publishing is a plain union —
    * no re-aggregation needed.
    */
  def quotaRead(spark: org.apache.spark.sql.SparkSession,
      targetDir: String): DataFrame =
    spark.read.parquet(increments(spark, targetDir, "inc_"): _*)

  /** foreachBatch corpus-drift sink — the streaming twin of
    * x_dist_drift's sufficient statistic: each micro-batch lands its
    * (source, tok) occurrence counts
    * ([[graft.operators.TextStats.sourceTokenCounts]]) in a
    * batchId-keyed increment file (idempotent under at-least-once
    * replay, as in [[rangeCountSink]]). Token counts are distributive
    * over ANY document split, so the publish-time re-aggregation +
    * [[graft.operators.TextStats.tvDrift]] equals ONE batch
    * x_dist_drift whatever the micro-batch boundaries — stateless and
    * order-insensitive by construction. Increments are
    * vocabulary-bounded (≤ |sources|·|vocab| rows/batch), never
    * document-cardinality.
    */
  def distDriftSink(
      docs: DataFrame,
      targetDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextStats.sourceTokenCounts(batch)
          .write.mode("overwrite").parquet(s"$targetDir/inc_$batchId")
        ()
      }
      .start()

  /** Publish step for [[distDriftSink]]: re-aggregate the per-batch
    * count increments (one groupBy over #batches × vocab rows) and run
    * the shared TV computation — column-identical to the batch
    * x_dist_drift, so the batch oracle replays verbatim.
    */
  def distDriftRead(spark: org.apache.spark.sql.SparkSession,
      targetDir: String): DataFrame =
    graft.operators.TextStats.tvDrift(
      spark.read.parquet(increments(spark, targetDir, "inc_"): _*)
        .groupBy(col("source"), col("tok"))
        .agg(sum(col("c_st")).as("c_st")))

  /** Test/ops instrumentation for [[lshPairsSink]]: per (targetDir,
    * batchId), how many posting ROOTS the probe read — StreamingSpec
    * asserts this stays within the tiered bound at any stream age (the
    * compaction contract). BOUNDED: a ring of the most recent
    * [[lshDiagRing]] batches per targetDir — a long-running sink never
    * grows driver memory through this map.
    */
  private[graft] val lshDiagRing = 256
  private[graft] val lshProbeRoots =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(Long, Int)]]
  private def recordProbeRoots(targetDir: String, batchId: Long,
      roots: Int): Unit =
    lshProbeRoots.updateWith(targetDir) { prev =>
      Some((prev.getOrElse(Vector.empty) :+ (batchId -> roots))
        .takeRight(lshDiagRing))
    }

  /** Test/ops instrumentation for the tiered fold: per targetDir, the
    * cumulative BATCH-SPAN of all fold/merge inputs (an L0 fold of t
    * tails adds t; a tier merge of runs covering s batches adds s).
    * Each batch's postings are re-written once per tier they climb, so
    * this sum is O(N·log N) in stream age N — the quadratic-write fix
    * StreamingSpec pins. One counter per targetDir, not state.
    */
  private[graft] val lshFoldSpans =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  // Managed-name shapes under an lshPairsSink targetDir. Anything NOT
  // matching is a stranger (user temp file, `_bak` copy) and is skipped
  // by discovery and cleanup rather than crashing the stream on a
  // NumberFormatException from an arbitrary suffix.
  private val lshTailRx = """^(bands|sigs|inc)_(\d+)$""".r
  private val lshRunRx = """^(cbands|csigs|cinc)_(\d+)_(\d+)$""".r
  private val lshDoneRx = """^cdone_(\d+)_(\d+)$""".r

  /** Compacted-run discovery for [[lshPairsSink]]/[[lshPairsRead]]:
    * marker-gated batch ranges. A run `c*_<lo>_<hi>` is DONE iff its
    * `cdone_<lo>_<hi>` marker exists (written only after all three
    * family dirs land — a half-written run is invisible); it is VISIBLE
    * iff done and not strictly contained in another done run (a tier
    * merge writes the containing run's marker LAST, so the narrow runs
    * flip invisible atomically with the wide one appearing). Visible
    * runs tile `[0, hi]` disjointly; a batch-suffixed tail `f_<i>` is
    * LIVE iff `i > hi` — anything ≤ hi is a folded original or a replay
    * stray, swept by [[lshCleanup]] and ignored by every reader.
    */
  private def lshVisibleRuns(fs: org.apache.hadoop.fs.FileSystem,
      targetDir: String): Seq[(Long, Long)] = {
    val dir = new Path(targetDir)
    if (!fs.exists(dir)) return Nil
    val done = fs.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case lshDoneRx(lo, hi) => (lo.toLong, hi.toLong) }
    done.filterNot { case (lo, hi) =>
      done.exists { case (l2, h2) =>
        l2 <= lo && hi <= h2 && (l2, h2) != (lo, hi) }
    }.sortBy(_._1)
  }

  /** Delete superseded roots: tier-merged (contained) runs plus their
    * markers, marker-less compacted dirs (a crashed fold's half-written
    * garbage — never visible, rewritten on retry), and any
    * batch-suffixed tail already covered by `hi` (folded originals plus
    * replay strays). Unrecognized names are left alone. Re-runnable
    * after any crash window — every step is exists-then-delete.
    */
  private def lshCleanup(fs: org.apache.hadoop.fs.FileSystem,
      targetDir: String, visible: Seq[(Long, Long)], hi: Long): Unit = {
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(
        s"lshPairsSink: cleanup $what failed under $targetDir")
    val keep = visible.toSet
    fs.listStatus(new Path(targetDir)).map(_.getPath).foreach { p =>
      val dead = p.getName match {
        case lshDoneRx(lo, h) => !keep((lo.toLong, h.toLong))
        case lshRunRx(_, lo, h) => !keep((lo.toLong, h.toLong))
        case lshTailRx(_, i) => i.toLong <= hi
        case _ => false
      }
      if (dead) must(fs.delete(p, true), s"delete ${p.getName}")
    }
  }

  /** One tier-merge sweep for [[lshPairsSink]]'s LSM-shaped fold: while
    * `fanout` adjacent visible runs share a size class (size classes are
    * geometric — class t covers spans in [u·fanout^t, u·fanout^(t+1))
    * for L0 unit u = compactEvery), merge the OLDEST such window into
    * one run of the next class. Each batch's postings therefore climb
    * at most log_fanout(N/u) tiers over the stream's life — cumulative
    * fold write volume O(N·log N), vs the O(N²) of re-writing one
    * standing generation every compactEvery batches — while the probe
    * reads ≤ (fanout-1)·tiers + compactEvery roots. Runs idempotently
    * OUTSIDE the `batchId % compactEvery` window too, so a crash
    * between an L0 fold's marker and its carry merges heals on the next
    * batch instead of leaving an over-full tier forever. Crash-safe the
    * same versioned-swap way as the L0 fold: overwrite the wide run's
    * three dirs, marker LAST, sweep the narrow runs after.
    */
  private def lshMergeTiers(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, targetDir: String,
      compactEvery: Int, fanout: Int): Unit = {
    def sizeClass(r: (Long, Long)): Int = {
      var span = (r._2 - r._1 + 1) / math.max(1, compactEvery)
      var t = 0
      while (span >= fanout) { span /= fanout; t += 1 }
      t
    }
    var progressed = true
    while (progressed) {
      progressed = false
      val visible = lshVisibleRuns(fs, targetDir)
      visible.sliding(fanout).find(w =>
          w.size == fanout && w.map(sizeClass).distinct.size == 1)
        .foreach { w =>
          val (lo, hi) = (w.head._1, w.last._2)
          def merge(prefix: String): Unit = {
            val all = w.map { case (l, h) =>
                spark.read.parquet(s"$targetDir/$prefix${l}_$h") }
              .reduce(_.unionByName(_))
            if (prefix == "cbands_")
              all.repartition(col("pb"))
                .write.mode("overwrite").partitionBy("pb")
                .parquet(s"$targetDir/$prefix${lo}_$hi")
            else all.write.mode("overwrite")
              .parquet(s"$targetDir/$prefix${lo}_$hi")
          }
          merge("cbands_"); merge("csigs_"); merge("cinc_")
          fs.create(new Path(s"$targetDir/cdone_${lo}_$hi"), true).close()
          lshFoldSpans.updateWith(targetDir)(p =>
            Some(p.getOrElse(0L) + (hi - lo + 1)))
          val vis = lshVisibleRuns(fs, targetDir)
          lshCleanup(fs, targetDir, vis,
            vis.map(_._2).foldLeft(-1L)(math.max))
          progressed = true
        }
    }
  }

  /** foreachBatch MinHash-LSH candidate-pair sink — the streaming twin
    * of the banded near-dup detector (d_minhash_portable's pair stage),
    * maintaining a persisted band index incrementally the way
    * [[graft.operators.LshIndex.append]] does: each micro-batch writes
    * its portable signatures and band postings as batchId-keyed
    * OVERWRITES (idempotent under at-least-once replay — a plain
    * `append` to one index tree would double postings on a batch
    * re-run), the posting files hive-partitioned by
    * `pb = band·keyBuckets + (k1 mod keyBuckets)` so the probe against
    * the standing corpus reads ONLY the partitions the batch's own band
    * keys touch (a static `pb IN (...)` filter — the standing corpus is
    * never rescanned; the LshIndex partition-pruning discipline).
    *
    * Pair emission is EXACT against the one-shot batch query over the
    * union, for any batch boundaries and any arrival order (pairs are
    * symmetric — the later-arriving side emits new×old plus new×new per
    * bucket): a bucket whose occupancy-so-far already exceeds
    * `maxBucket` is skipped in-flight, which cannot diverge because
    * occupancy only grows — the publish step ([[lshPairsRead]]) applies
    * the cap against FINAL occupancy, exactly the batch twin's
    * `HAVING COUNT(*) BETWEEN 2 AND maxBucket`, and drops those pairs
    * either way. In-flight emission is therefore bounded by
    * maxBucket² per bucket lifetime, never duplicate-family².
    *
    * LONG-RUN posture — a TIERED (LSM-shaped) fold: every
    * `compactEvery` batches the per-batch snapshots fold into a NEW L0
    * run `cbands_<lo>_<hi>` (hive-partitioned by pb, so the pruned
    * probe holds at any stream age) + `csigs_/cinc_<lo>_<hi>`, gated by
    * a `cdone_<lo>_<hi>` marker written only after all three land; the
    * folded tails are then deleted. When `tierFanout` adjacent runs
    * share a geometric size class, [[lshMergeTiers]] merges them into
    * one run of the next class (marker last, narrow runs swept after) —
    * so each batch's postings are re-written at most
    * log_fanout(N/compactEvery) times over the stream's life.
    * Cumulative fold write volume is O(N·log N) in stream age N; the
    * r14 single-standing-generation fold re-wrote the FULL corpus every
    * compactEvery batches (quadratic cumulative volume, and each fold
    * stalled the stream for a corpus-sized rewrite — the r14 verdict's
    * scale-killer). A probe reads ≤ (tierFanout-1)·tiers + compactEvery
    * roots — logarithmic, vs O(batchId) without folding. Replay stays
    * byte-identical through folding and merging: compacted postings
    * carry their origin batch in `src_batch`, so a replayed batch
    * N ≤ hi probes `filter(src_batch < N)` over the visible runs —
    * exactly the prior-corpus rows its first run saw — and its
    * re-written `bands_N/sigs_N/inc_N` strays are ignored by every
    * reader (live iff id > hi) and swept by the next cleanup. Folds and
    * merges are crash-safe the versioned-swap way: overwrites of NEW
    * run dirs, marker last, every reader gated on markers; a
    * half-written run is invisible, its garbage swept, and the merge
    * pass re-runs idempotently on the next batch.
    */
  def lshPairsSink(
      docs: DataFrame,
      targetDir: String,
      checkpointDir: String,
      maxBucket: Int = 100,
      keyBuckets: Int = 64,
      compactEvery: Int = 8,
      tierFanout: Int = 4): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val bkt = Seq("b", "k1", "k2")
        val fs = new Path(targetDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val visible0 = lshVisibleRuns(fs, targetDir)
        val hi = visible0.map(_._2).foldLeft(-1L)(math.max)
        if (fs.exists(new Path(targetDir)))
          lshCleanup(fs, targetDir, visible0, hi)
        val sigs = graft.operators.Materialize(
          graft.queries.TextQueries.portableMinhashSig(batch))
        // A folded batch's replay still overwrites its own snapshots
        // (idempotent, deterministic) — readers ignore ids ≤ hi, so the
        // strays are dead weight until the next cleanup, never input.
        sigs.write.mode("overwrite").parquet(s"$targetDir/sigs_$batchId")
        val bands = graft.operators.Materialize(
          graft.queries.TextQueries.portableBands(sigs)
            .withColumn("pb", (col("b").cast("long") * keyBuckets +
              pmod(col("k1"), lit(keyBuckets.toLong))).cast("int")))
        // Per-batch tail snapshot: ONE parquet dir, range-partitioned and
        // sorted on pb, so the probe's static `pb IN (...)` prunes at ROW
        // GROUP granularity from the footers. The hive-partitioned
        // `pb=...` layout here cost ~1024 directory creates + commits PER
        // BATCH and as many listings per probe/publish — measured as the
        // bulk of the gate's sf-independent ~34 s stream constant; the
        // long-lived pruning layout belongs to the folded generation
        // (cbands_, still hive-partitioned), not the short-lived tails.
        bands.repartitionByRange(col("pb"))
          .sortWithinPartitions(col("pb"))
          .write.mode("overwrite").parquet(s"$targetDir/bands_$batchId")
        // L0 fold due? Covers batches hi+1..batchId-1 (never the current
        // batch: the probe's prior-corpus join excludes own postings, and
        // a compacted run containing them would self-pair).
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
            hi < batchId - 1) {
          val lo = hi + 1; val newHi = batchId - 1
          def tail(prefix: String): Seq[(Long, String)] =
            (lo to newHi).map { i =>
              val p = new Path(s"$targetDir/$prefix$i")
              if (!fs.exists(p))
                throw new IllegalStateException(
                  s"lshPairsSink: snapshot $p missing while folding at " +
                    s"batch $batchId — wipe the checkpoint and replay")
              i -> p.toString
            }
          // An L0 run folds ONLY the tails — never the standing runs;
          // standing-run rewrites happen one tier at a time in
          // lshMergeTiers (the O(N log N) contract).
          tail("bands_").map { case (i, p) =>
              spark.read.parquet(p)
                .select(col("doc_id"), col("b"), col("k1"), col("k2"),
                  lit(i).as("src_batch"), col("pb"))
            }
            .reduce(_.unionByName(_))
            .repartition(col("pb"))
            .write.mode("overwrite").partitionBy("pb")
            .parquet(s"$targetDir/cbands_${lo}_$newHi")
          def foldPlain(prefix: String, cname: String): Unit =
            tail(prefix).map { case (_, p) => spark.read.parquet(p) }
              .reduce(_.unionByName(_))
              .write.mode("overwrite")
              .parquet(s"$targetDir/$cname${lo}_$newHi")
          foldPlain("sigs_", "csigs_")
          foldPlain("inc_", "cinc_")
          // Marker LAST: the new run becomes visible atomically; then
          // sweep the folded tails.
          fs.create(new Path(s"$targetDir/cdone_${lo}_$newHi"), true).close()
          lshFoldSpans.updateWith(targetDir)(p =>
            Some(p.getOrElse(0L) + (newHi - lo + 1)))
          val vis = lshVisibleRuns(fs, targetDir)
          lshCleanup(fs, targetDir, vis, newHi)
        }
        // Carry pass — also heals a crash window between an L0 fold's
        // marker and its tier merges (idempotent no-op when nothing is
        // due).
        if (compactEvery > 0 && tierFanout > 1)
          lshMergeTiers(spark, fs, targetDir, compactEvery, tierFanout)
        val runsNow = lshVisibleRuns(fs, targetDir)
        val hiNow = runsNow.map(_._2).foldLeft(-1L)(math.max)
        // Standing-corpus postings, partition-pruned to the batch's own
        // band keys (≤ numBands·keyBuckets distinct pb values, collected
        // as static literals): the compacted generation (src_batch <
        // batchId — a no-op filter in forward progress, the exact replay
        // cut for a re-run of a folded batch) plus the un-folded tails
        // strictly before this batch. Missing tails = lost target dir,
        // not a cold start (the quotaSink discipline).
        val tailDirs = (((hiNow + 1) max 0L) until batchId).map { i =>
          val p = new Path(s"$targetDir/bands_$i")
          if (!fs.exists(p))
            throw new IllegalStateException(
              s"lshPairsSink: posting snapshot $p missing for batch " +
                s"$batchId — wipe the checkpoint and replay")
          p.toString
        }
        val pbs = bands.select("pb").distinct().collect()
          .map(_.getInt(0)).sorted
        // Per-root reads + union (multiple hive-partitioned roots in one
        // read call break partition inference); the static pb filter
        // prunes each root's directory listing independently. The
        // src_batch < batchId cut is a no-op in forward progress and the
        // exact prior-corpus reconstruction when a FOLDED batch replays
        // (hiNow ≥ batchId: fresh checkpoint over an intact folded
        // target — the standing runs hold more than this batch's past;
        // runs entirely at/after this batch are skipped outright).
        val priorParts =
          runsNow.filter(_._1 < batchId).map { case (lo, h) =>
            spark.read.parquet(s"$targetDir/cbands_${lo}_$h")
              .filter(col("pb").isin(pbs.map(Int.box): _*))
              .filter(col("src_batch") < batchId)
              .select("doc_id", "b", "k1", "k2")
          } ++
          tailDirs.map(spark.read.parquet(_)
            .filter(col("pb").isin(pbs.map(Int.box): _*))
            .select("doc_id", "b", "k1", "k2"))
        recordProbeRoots(targetDir, batchId, priorParts.size)
        val prior =
          if (priorParts.isEmpty)
            bands.select(col("doc_id"), col("b"), col("k1"), col("k2")).limit(0)
          else priorParts.reduce(_.unionByName(_))
        val bn = bands.select("doc_id", "b", "k1", "k2")
        val occOk = bn.unionByName(prior)
          .groupBy(bkt.map(col): _*).agg(count(lit(1)).as("occ"))
          .filter(col("occ") <= maxBucket)
          .select(bkt.map(col): _*)
        val nn = bn.toDF("id_a", "b", "k1", "k2")
          .join(bn.toDF("id_b", "b", "k1", "k2"), bkt)
          .filter(col("id_a") < col("id_b"))
        val no = bn.toDF("id_x", "b", "k1", "k2")
          .join(prior.toDF("id_y", "b", "k1", "k2"), bkt)
          .select(col("b"), col("k1"), col("k2"),
            least(col("id_x"), col("id_y")).as("id_a"),
            greatest(col("id_x"), col("id_y")).as("id_b"))
        nn.select(col("b"), col("k1"), col("k2"), col("id_a"), col("id_b"))
          .unionByName(no)
          .join(occOk, bkt)
          .distinct()
          .write.mode("overwrite").parquet(s"$targetDir/inc_$batchId")
        ()
      }
      .start()

  /** Publish step for [[lshPairsSink]]: apply the occupancy cap against
    * FINAL bucket occupancy (the batch twin's HAVING clause — pairs
    * already imply occupancy ≥ 2), dedup pairs across buckets and
    * batches, score signature agreement from the persisted signatures,
    * and aggregate to PER-DOC dedup flags — the minhashIncremental
    * contract: for each doc, the count of LOWER-id partners whose
    * agreement clears `minAgree`, plus the best partner by (n_eq, id)
    * packed argmax (the Geo packed-argmin trick, decimal-free since
    * n_eq·10¹⁰ + id fits a long at any realistic corpus id width).
    * Per-doc output keeps the publish CORPUS-cardinality — the raw
    * scored pair set is Σ_buckets occ² and publishing it verbatim
    * OOM'd the sf100 single-JVM probe; the pair volume still flows
    * through the scoring join (the exact tier's cost), but it
    * aggregates away immediately instead of materializing.
    *
    * CONCURRENCY: do not run against a targetDir with an ACTIVE sink —
    * a fold/merge sweeps superseded runs after its marker lands, so a
    * reader that resolved the visible-run set just before a fold can
    * hit FileNotFoundException on the swept paths mid-scan. Publish
    * between stream stops (the AvailableNow discipline every caller
    * here uses), or retry on a fresh listing.
    */
  def lshPairsRead(spark: SparkSession, targetDir: String,
      maxBucket: Int = 100, minAgree: Int = 16): DataFrame = {
    val bkt = Seq("b", "k1", "k2")
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val runs = lshVisibleRuns(fs, targetDir)
    val hi = runs.map(_._2).foldLeft(-1L)(math.max)
    // Visible tiered runs + live tails (id > hi) per family —
    // log-bounded root count at any stream age, and replay strays
    // (re-written snapshots of folded batches) are invisible by the
    // same cut. Non-managed names under targetDir are skipped, not
    // parsed.
    def family(prefix: String, cname: String): Seq[String] = {
      val tails = fs.listStatus(new Path(targetDir)).map(_.getPath).toSeq
        .filter(p => p.getName match {
          case lshTailRx(f, i) => f + "_" == prefix && i.toLong > hi
          case _ => false
        }).map(_.toString)
      runs.map { case (lo, h) => s"$targetDir/$cname${lo}_$h" } ++ tails
    }
    val occOk = family("bands_", "cbands_")
      .map(spark.read.parquet(_).select(bkt.map(col): _*))
      .reduce(_.unionByName(_))
      .groupBy(bkt.map(col): _*).agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= maxBucket)
      .select(bkt.map(col): _*)
    val pairs = family("inc_", "cinc_")
      .map(spark.read.parquet(_))
      .reduce(_.unionByName(_))
      .join(occOk, bkt)
      .select("id_a", "id_b").distinct()
    val sigs = family("sigs_", "csigs_")
      .map(spark.read.parquet(_))
      .reduce(_.unionByName(_))
    val pk = lit(10000000000L)
    pairs
      .join(sigs.toDF("id_a", "sa"), "id_a")
      .join(sigs.toDF("id_b", "sb"), "id_b")
      .withColumn("n_eq",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          p => p)).cast("long"))
      .filter(col("n_eq") >= minAgree)
      .groupBy(col("id_b").as("id"))
      .agg(count(lit(1)).as("n_matches"),
        max(col("n_eq") * pk + col("id_a")).as("best"))
      .select(col("id"), col("n_matches"),
        pmod(col("best"), pk).as("best_match"),
        expr("best DIV 10000000000").as("best_n_eq"))
  }

  /** Shared merge-and-swap skeleton: heal a half-finished previous swap,
    * build the merged frame (given whether a target exists), write it to
    * staging, then swap. Swap order is crash-recoverable: target → .old,
    * staging → target, delete .old; a crash window leaves either the old
    * target or a recoverable `.old` (healed on the next call). True
    * atomicity needs a transactional table format — on object stores
    * rename is copy+delete, so widen the maintenance window accordingly.
    */
  private[graft] def mergeIntoParquet(batch: DataFrame, targetDir: String)(
      merge: (org.apache.spark.sql.SparkSession, Boolean) => DataFrame): Unit = {
    val spark = batch.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val target = new Path(targetDir)
    val old = new Path(targetDir + ".old")
    val fs = target.getFileSystem(hadoopConf)
    // Heal a crash between the two renames of a previous call.
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
    val merged = merge(spark, fs.exists(target))
    val tmp = new Path(targetDir + ".staging")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // Hadoop rename/delete report failure by RETURNING false — every step
    // must be checked or a failed rename cascades into deleting the only
    // copy of the data.
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"mergeIntoParquet: $what failed for $targetDir")
    if (fs.exists(old)) must(fs.delete(old, true), "delete stale .old")
    if (fs.exists(target)) must(fs.rename(target, old), "rename target -> .old")
    must(fs.rename(tmp, target), "rename .staging -> target")
    if (fs.exists(old)) must(fs.delete(old, true), "delete .old")
  }
}
