package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark has no native range-join strategy
  * (Databricks' range-join hint is proprietary); the scalable public
  * technique is bucketing: quantize time into `bucketSeconds` buckets,
  * explode each interval onto the buckets it covers, equi-join on bucket,
  * then apply the exact range predicate. The shuffle is an equi-join on
  * (bucket) instead of an O(n·m) inequality join; bucket width trades
  * duplication factor vs bucket fan-out.
  */
object RangeJoin {

  /** Join point events to intervals: rows (point ⋈ interval) where
    * `start <= pointTs < end`. Interval columns are prefixed to avoid
    * collisions. Both inputs shuffle once, on the bucket key.
    */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    val b = lit(bucketSeconds)
    val p = points.withColumn("__bucket", (unix_timestamp(col(pointTs)) / b).cast("long"))
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(
          (unix_timestamp(col(startCol)) / b).cast("long"),
          (unix_timestamp(col(endCol)) / b).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bucket")
  }

  /** COUNT of points per interval (`start <= ts < end`) WITHOUT
    * materializing the point×interval pairs — the order-statistics plan
    * for the aggregate contract. [[pointInInterval]]'s bucketed pair
    * join is the right shape when the pairs themselves are the output,
    * but its intermediate grows with pointDensity × intervalDensity per
    * bucket: the r11 factor-1000 probe (ScaleGen replicates events at
    * the SAME timestamps, so per-bucket density rises with the factor —
    * the adversarial dense-overlap regime) blew the pair count up ~10⁶×
    * while the true COUNT output only grew 10³×.
    *
    * Here count(interval) = C(<end) − C(<start), where C(<t) = number of
    * points with ts strictly below t. Each interval becomes two SIGNED
    * endpoint probes (−1 at start, +1 at end) unioned with the points;
    * one range partition by (ts, isPoint) orders the stream (probes sort
    * BEFORE points at equal ts, so C(<t) excludes points AT t — which
    * puts ts == start in and ts == end out, exactly the half-open
    * window); a per-partition running point count plus
    * [[Pack.exclusivePrefix]] over the ≤ numPartitions partition totals
    * turns that order into global C(<t) with no single-task scan.
    * Intervals that cover no point are dropped (inner-join contract,
    * matching pointInInterval + groupBy).
    *
    * Cost: three linear shuffles (range partition, window hash on the
    * partition id, final per-interval agg) — independent of how densely
    * intervals overlap points.
    */
  def countInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      idCol: String): DataFrame = {
    // NULL endpoints/timestamps must match pointInInterval's predicate
    // semantics (a NULL never satisfies the range filter): a NULL __ts
    // would otherwise sort FIRST under repartitionByRange and inflate
    // the running count C(<t) for every probe, and a NULL interval
    // endpoint would place its probe undefined instead of dropping the
    // interval.
    val iv = intervals.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val probes = iv.select(col(idCol), col(startCol).as("__ts"),
        lit(-1L).as("__sgn"), lit(0L).as("__c"))
      .unionByName(iv.select(col(idCol), col(endCol).as("__ts"),
        lit(1L).as("__sgn"), lit(0L).as("__c")))
    val pts = points.filter(col(pointTs).isNotNull).select(lit(null).cast(
        intervals.schema(idCol).dataType).as(idCol),
      col(pointTs).as("__ts"), lit(0L).as("__sgn"), lit(1L).as("__c"))
    // Range partition on the sort key: partition boundaries respect
    // (ts, isPoint) order, so partition ids are ordered slabs of the
    // global sort — the property the prefix sum below needs. The id is
    // stamped in the same stage that materializes the exchange output.
    val slabbed = pts.unionByName(probes)
      .repartitionByRange(col("__ts"), col("__c"))
      .withColumn("__pid", spark_partition_id().cast("long"))
    val mat = Materialize(slabbed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("__ts"), col("__c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val run = mat.withColumn("__run", coalesce(sum("__c").over(w), lit(0L)))
    // ≤ shuffle.partitions rows: the recursion floor handles it directly.
    val slabOff = Pack.exclusivePrefix(
      mat.groupBy("__pid").agg(sum("__c").as("__n")), "__pid", "__n",
      fanout = 1024)
    run.filter(col("__sgn") =!= 0)
      .join(slabOff.withColumnRenamed("off", "__off"), Seq("__pid"))
      .groupBy(col(idCol))
      .agg(sum(col("__sgn") * (col("__off") + col("__run"))).as("n_points"))
      .filter(col("n_points") > 0)
  }

  /** Per-probe rank count: for each probe value t, the number of points
    * strictly below t (`inclusive = false`, C(<t)) or at-or-below t
    * (`inclusive = true`, C(≤t)) — the 1-D order-statistics primitive
    * the interval counts are built from, exposed for composition
    * ([[overlapCount]] subtracts two of these). Same slab plan as
    * [[countInInterval]]: one range partition orders points and probes
    * together, a within-slab running sum plus [[Pack.exclusivePrefix]]
    * slab offsets make the count global with no single-task scan. The
    * sort key (__ts, __o) places a probe BEFORE same-value points for
    * strict counts and AFTER them for inclusive counts; sort-key ties
    * may split across range-partition boundaries, but identical keys
    * are interchangeable under the running sum, so C is exact anyway.
    * Every probe row survives (n_below can be 0); NULL values drop on
    * either side (the family's range-predicate contract).
    */
  def countBelow(
      points: DataFrame, valueCol: String,
      probes: DataFrame, probeCol: String, idCol: String,
      inclusive: Boolean): DataFrame = {
    val pr = probes.filter(col(probeCol).isNotNull)
      .select(col(idCol), col(probeCol).as("__ts"),
        lit(if (inclusive) 2L else 0L).as("__o"), lit(0L).as("__c"))
    val pts = points.filter(col(valueCol).isNotNull)
      .select(lit(null).cast(probes.schema(idCol).dataType).as(idCol),
        col(valueCol).as("__ts"), lit(1L).as("__o"), lit(1L).as("__c"))
    val slabbed = pts.unionByName(pr)
      .repartitionByRange(col("__ts"), col("__o"))
      .withColumn("__pid", spark_partition_id().cast("long"))
    val mat = Materialize(slabbed) // two consumers must agree on __pid
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("__ts"), col("__o"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val run = mat.withColumn("__run", coalesce(sum("__c").over(w), lit(0L)))
    val slabOff = Pack.exclusivePrefix(
      mat.groupBy("__pid").agg(sum("__c").as("__n")), "__pid", "__n",
      fanout = 1024)
    run.filter(col("__c") === 0)
      .join(slabOff.withColumnRenamed("off", "__off"), Seq("__pid"))
      .select(col(idCol), (col("__off") + col("__run")).as("n_below"))
  }

  /** Interval-OVERLAP count join — per probe interval, how many base
    * intervals intersect it (half-open on both sides: overlap iff
    * b.start < p.end AND b.end > p.start) WITHOUT materializing the
    * pair join. The two "miss" sets (b entirely after p, b entirely
    * before p) are disjoint for well-formed intervals, so
    * n_overlap = C_starts(< p.end) − C_ends(≤ p.start): two
    * [[countBelow]] passes (strict on base starts, inclusive on base
    * ends) and one probe-keyed join — six linear shuffles at ANY
    * overlap density, where the naive inequality join is O(n·m) pairs.
    * Probes overlapping nothing are dropped (the family's inner-join
    * contract). Both endpoint columns NULL-filter their row.
    */
  def overlapCount(
      base: DataFrame, bStart: String, bEnd: String,
      probes: DataFrame, pStart: String, pEnd: String,
      idCol: String): DataFrame = {
    val bv = base.filter(col(bStart).isNotNull && col(bEnd).isNotNull)
    val pv = probes.filter(col(pStart).isNotNull && col(pEnd).isNotNull)
    val nStarts = countBelow(bv.select(col(bStart).as("__v")), "__v",
      pv, pEnd, idCol, inclusive = false)
    val nEnds = countBelow(bv.select(col(bEnd).as("__v")), "__v",
      pv, pStart, idCol, inclusive = true)
    nStarts.withColumnRenamed("n_below", "__ns")
      .join(nEnds.withColumnRenamed("n_below", "__ne"), Seq(idCol))
      .select(col(idCol), (col("__ns") - col("__ne")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
  }

  /** Peak number of concurrently open intervals per group — the classic
    * ±1 endpoint sweep (max running sum over interval starts/ends),
    * distributed the same way as [[countInInterval]]: one range
    * partition on (group, ts, delta) orders each group's endpoint
    * stream across ordered slabs; the running sum inside a (group,
    * slab) window plus a slab-offset prefix (a bounded ≤ #partitions
    * frame, windowed directly) gives the global running concurrency,
    * and max(offset + within-slab max) is the peak. No window ever
    * spans more than one partition's rows, so a group 1000× denser
    * than the rest cannot recreate the single-task ordered scan.
    *
    * Half-open [start, end): ends sort BEFORE starts at equal ts
    * (delta −1 < +1), so an interval ending exactly when another
    * starts never counts as overlap.
    */
  def peakConcurrency(
      intervals: DataFrame, startCol: String, endCol: String,
      groupCol: String): DataFrame = {
    val deltas = intervals.select(col(groupCol), col(startCol).as("__ts"),
        lit(1L).as("__d"))
      .unionByName(intervals.select(col(groupCol), col(endCol).as("__ts"),
        lit(-1L).as("__d")))
    // NOT Materialize'd (r12, measured): unlike countInInterval — whose
    // slabbed frame feeds TWO separate consumers (the probe window and
    // the slab-offset aggregation) that must agree on __pid, so the
    // checkpoint pins one execution — this frame is consumed exactly
    // once (the slab-stats pass below), and __pid is the shuffle's own
    // reduce-partition index, stable across task retries within that
    // one execution. The checkpoint was a pure data-sized extra write:
    // the sf100 dense-group probe measured 143.1 s with it vs a 32.3 s
    // 10×-linear budget.
    val slabbed = deltas
      .repartitionByRange(col(groupCol), col("__ts"), col("__d"))
      .withColumn("__pid", spark_partition_id().cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol, "__pid").orderBy(col("__ts"), col("__d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val slabStats = slabbed.withColumn("__run", sum("__d").over(w))
      .groupBy(col(groupCol), col("__pid"))
      .agg(sum("__d").as("__tot"), max("__run").as("__mx"))
    // ≤ numPartitions rows per group: window over the slab-stats frame
    // is the bounded recursion floor, no exclusivePrefix level needed.
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    slabStats.withColumn("__off", coalesce(sum("__tot").over(wOff), lit(0L)))
      .groupBy(col(groupCol))
      .agg(max(col("__off") + col("__mx")).as("peak"))
  }

  /** Total covered time per group — the union length of a group's
    * intervals in epoch milliseconds ("busy time": utilization, SLA
    * coverage, time-under-load). Same distributed ±1 endpoint sweep as
    * [[peakConcurrency]]: a segment between consecutive endpoints is
    * covered iff the running interval count is positive, so
    * busy = Σ gap·[run > 0] over the globally ordered endpoint stream.
    * The stream spreads over range-ordered slabs; within-slab running
    * sums and leads compose with a ≤ #partitions slab frame (prefix
    * totals for the run offset, next-slab min ts for the boundary gap)
    * — no window ever spans more than one partition, so a dense group
    * cannot recreate the single-task ordered scan.
    *
    * The result is TIE-ORDER INVARIANT, which is what makes it
    * engine-exact: rows at equal ts contribute gap 0 except the last,
    * whose running count already includes every same-ts delta whatever
    * their internal order (sum is commutative) — so any (ts)-stable
    * sort in any engine, and even range-boundary tie splits across
    * slabs, produce the identical integer total.
    *
    * Like [[countInInterval]] the slabbed frame feeds TWO consumers
    * (the row window and the slab-stats agg) that must agree on __pid,
    * hence the Materialize. NULL endpoints drop their interval (the
    * range-predicate contract shared by the whole family).
    */
  def busyTime(
      intervals: DataFrame, startCol: String, endCol: String,
      groupCol: String): DataFrame = {
    val iv = intervals.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val deltas = iv.select(col(groupCol),
        unix_millis(col(startCol)).as("__ts"), lit(1L).as("__d"))
      .unionByName(iv.select(col(groupCol),
        unix_millis(col(endCol)).as("__ts"), lit(-1L).as("__d")))
    val slabbed = deltas
      .repartitionByRange(col(groupCol), col("__ts"), col("__d"))
      .withColumn("__pid", spark_partition_id().cast("long"))
    val mat = Materialize(slabbed)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol, "__pid").orderBy(col("__ts"), col("__d"))
    val wRun = wOrd.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rows = mat.withColumn("__run", sum("__d").over(wRun))
      .withColumn("__nxt", lead(col("__ts"), 1).over(wOrd))
    val slabStats = mat.groupBy(col(groupCol), col("__pid"))
      .agg(sum("__d").as("__tot"), min("__ts").as("__mn"))
    val wSlab = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__pid")
    val offs = slabStats
      .withColumn("__off", coalesce(sum("__tot").over(
        wSlab.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      // A group occupies CONTIGUOUS slabs under the range sort, so the
      // next slab-stats row in pid order is the slab holding the
      // group's next endpoint; null = the group's stream ends here
      // (its last row has run 0 anyway — balanced ±1).
      .withColumn("__nxtmn", lead(col("__mn"), 1).over(wSlab))
      .select(col(groupCol), col("__pid"), col("__off"), col("__nxtmn"))
    rows.join(broadcast(offs), Seq(groupCol, "__pid"))
      .withColumn("__gap", coalesce(col("__nxt"), col("__nxtmn")) - col("__ts"))
      .filter(col("__gap").isNotNull && (col("__off") + col("__run")) > 0)
      .groupBy(col(groupCol))
      .agg(sum("__gap").as("busy_ms"))
  }
}
