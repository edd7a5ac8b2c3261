package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar-grid geospatial primitives over integer micro-degree
  * coordinates — the spatial family the reference's data model implies
  * (configs/detenidos_aprehendidos.yaml:133-138 bounds `latitud`/
  * `longitud` to Ecuador's bounding box but the pandas pipeline never
  * exploits them): radius neighbor joins and density clustering over
  * incident coordinates.
  *
  * Everything is INTEGER arithmetic on micro-degrees (1e-6 deg), so
  * results replay bit-for-bit in any engine — no haversine
  * transcendentals whose libm rounding differs across runtimes. Distances
  * are planar (equirectangular): within a country-scale box the grid is a
  * CANDIDATE filter, and a caller needing great-circle meters applies its
  * own metric to the surviving pairs.
  *
  * Scale shape: the grid turns the quadratic all-pairs distance join into
  * an equi-join on cell id — the spatial analog of the LSH band join.
  * With cell size >= radius, the 3x3 neighborhood of a point's cell
  * provably covers every candidate within the radius (one bounded 9x
  * fan-out, no distance ever computed outside adjacent cells). Cluster
  * merging rides the same star-contraction components machinery as dedup
  * ([[DedupResolve]]), on the CELL graph — bounded by the grid, not the
  * corpus.
  */
object Geo {

  /** Max facility id, with an explicit empty-side guard (a bare
    * `getLong(0)` on `max` of an empty frame is an opaque NPE) and the
    * decimal-packing bound both argmin paths require. Runs one eager
    * scalar job at call time — the price of validating before building
    * the plan.
    */
  /** Largest coordinate magnitude either argmin path accepts: ±1e9
    * micro-degrees (±1000°, comfortably past any real lat/lon). The d2
    * bound the decimal pack relies on (d2 ≤ 2·(2e9)² = 8e18 <
    * Long.MaxValue ≈ 9.22e18) holds only under this cap — two in-range
    * coords of OPPOSITE sign give a delta up to 2·bound, so a 2e9 cap
    * (r8's value) left a hole: delta up to 4e9, square 1.6e19, a WRAPPED
    * (negative) d2 that silently wins every min. So the "any
    * micro-degree input" precondition is ENFORCED at the tight bound,
    * not assumed: the bounded facility side is checked eagerly in
    * [[checkedMaxFid]], the corpus-sized point side in-plan via
    * [[checkedCoord]].
    */
  private val CoordBoundE6 = 1000000000L

  private def checkedMaxFid(fac: DataFrame): Long = {
    val row = fac.agg(max(col("fid")),
      max(abs(col("f_lat"))), max(abs(col("f_lon")))).collect()(0)
    require(!row.isNullAt(0), "facility side must be non-empty")
    val maxFid = row.getLong(0)
    // d2 ≤ 2·(2·CoordBound)² = 8e18 under the coordinate cap (long-safe),
    // so the packed decimal d2·(maxFid+1)+fid stays ≤ 8e36 < 10^38 under
    // the id bound.
    require(0 <= maxFid && maxFid < 1000000000000000000L,
      s"facility ids must stay below 1e18, got max $maxFid")
    Seq(1 -> "f_lat", 2 -> "f_lon").foreach { case (i, n) =>
      require(row.getLong(i) <= CoordBoundE6,
        s"facility $n exceeds the ±${CoordBoundE6} micro-degree bound " +
          s"(got ${row.getLong(i)}) — long d2 arithmetic would overflow")
    }
    maxFid
  }

  /** In-plan coordinate-magnitude guard for the corpus-sized point side
    * (an eager driver scan there would cost a full extra pass): identity
    * for in-range values, `raise_error` otherwise. Lives inside the value
    * projection so column pruning can never drop it.
    */
  private def checkedCoord(c: Column, name: String): Column =
    when(abs(c) <= CoordBoundE6, c).otherwise(raise_error(concat(
      lit(s"$name exceeds the ±$CoordBoundE6 micro-degree bound: "),
      c.cast("string"))))

  /** Deterministic sha256-derived micro-degree coordinate in
    * [minE6, maxE6] — 48 bits of the digest mod the span, the same
    * portable derivation the LSH twins use, so an oracle replays it
    * exactly: `('0x' || substr(sha256(id || '|tag'), 1, 12))::BIGINT`.
    */
  def synthCoordE6(id: Column, tag: String, minE6: Long, maxE6: Long): Column =
    (lit(minE6) +
      conv(substring(sha2(concat(id.cast("string"), lit("|" + tag)), 256),
        1, 12), 16, 10).cast("long") % lit(maxE6 - minE6 + 1)).as(tag)

  /** Density-scaled grid resolution for [[nearestFacilityGrid]]: the
    * cell size that puts ~`targetPerCell` facilities in a cell, clamped
    * to [1000 µdeg, max span]. A FIXED cell size is a latent scale bug:
    * when both sides densify inside the same bbox (exactly what growing
    * a deployment does), per-cell facility occupancy grows linearly and
    * the 3×3-probe join's pair count grows as points × occupancy —
    * quadratic in density. The r9 sf100 probe measured it: 66.8× cost
    * for 10× data at a fixed 0.5° cell (1M facilities → ~1.7k/cell);
    * density-scaled, the same query is linear. One tiny count job over
    * the bounded facility side — the same price class as the eager
    * maxFid validation. Resolution affects ONLY cost: the ring
    * guarantee makes the argmin exact at any cell size (the brute-force
    * oracle hash-matches regardless), and sparse boxes just escalate
    * rings as before.
    */
  def autoCellE6(fac: DataFrame, latSpanE6: Long, lonSpanE6: Long,
      targetPerCell: Int = 32): Long = {
    require(latSpanE6 > 0 && lonSpanE6 > 0 && targetPerCell > 0)
    val n = math.max(1L, fac.count())
    val cell = math.sqrt(
      latSpanE6.toDouble * lonSpanE6.toDouble * targetPerCell / n)
    math.max(1000L, math.min(cell.toLong, math.max(latSpanE6, lonSpanE6)))
  }

  /** Attach integer grid-cell coordinates (cy, cx): floor division of the
    * min-shifted coordinate (shift first — operands stay non-negative, so
    * truncating and flooring division agree in every engine).
    */
  def withCells(pts: DataFrame, latMinE6: Long, lonMinE6: Long,
      cellE6: Long): DataFrame =
    pts
      .withColumn("cy", expr(s"(lat_e6 - (${latMinE6}L)) DIV ${cellE6}L"))
      .withColumn("cx", expr(s"(lon_e6 - (${lonMinE6}L)) DIV ${cellE6}L"))

  private def offsets: Column = array(
    (for (dy <- -1 to 1; dx <- -1 to 1)
      yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)

  /** Per-point count of other points within `radiusE6` (planar squared
    * distance on micro-degrees). `pts` must carry (id, lat_e6, lon_e6,
    * cy, cx) with cell size >= radiusE6 — then candidates live only in
    * the 3x3 neighborhood, which the probe side explodes (bounded 9x
    * fan-out on ONE side; the build side keeps one row per point). Every
    * point appears in the output, zero-neighbor points included.
    */
  def radiusNeighborCounts(pts: DataFrame, radiusE6: Long): DataFrame = {
    val probes = pts
      .select(col("id").as("id_a"), col("lat_e6").as("la"),
        col("lon_e6").as("oa"), col("cy"), col("cx"),
        explode(offsets).as("o"))
      .select(col("id_a"), col("la"), col("oa"),
        (col("cy") + col("o.dy")).as("py"), (col("cx") + col("o.dx")).as("px"))
    val build = pts.select(col("id").as("id_b"), col("lat_e6").as("lb"),
      col("lon_e6").as("ob"), col("cy").as("by"), col("cx").as("bx"))
    val r2 = radiusE6 * radiusE6
    val counts = probes.join(build,
        col("py") === col("by") && col("px") === col("bx") &&
        col("id_a") =!= col("id_b"))
      .filter((col("la") - col("lb")) * (col("la") - col("lb")) +
        (col("oa") - col("ob")) * (col("oa") - col("ob")) <= lit(r2))
      .groupBy(col("id_a")).agg(count(lit(1)).as("n_within"))
    pts.select(col("id"), col("lat_e6"), col("lon_e6"))
      .join(counts.withColumnRenamed("id_a", "id"), Seq("id"), "left")
      .select(col("id"), col("lat_e6"), col("lon_e6"),
        coalesce(col("n_within"), lit(0L)).as("n_within"))
  }

  /** Grid-density clustering (the DBSCAN shape on a grid): cells holding
    * >= minPts points are CORE; 8-adjacent core cells merge into one
    * cluster via the same star-contraction components the dedup resolver
    * runs — on the core-CELL graph, whose size is bounded by the grid
    * resolution, never by the corpus. Returns one row per cluster:
    * (cluster = min cell key, n_cells, n_points).
    */
  def gridClusters(pts: DataFrame, minPts: Long,
      keySpan: Long = 1000000L): DataFrame = {
    val core = pts.groupBy(col("cy"), col("cx"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPts)
      .withColumn("ck", col("cy") * keySpan + col("cx"))
    val probes = core
      .select(col("ck").as("id_a"), col("cy"), col("cx"),
        explode(offsets).as("o"))
      .select(col("id_a"), (col("cy") + col("o.dy")).as("py"),
        (col("cx") + col("o.dx")).as("px"))
    val adj = probes.join(
        core.select(col("ck").as("id_b"), col("cy").as("by"),
          col("cx").as("bx")),
        col("py") === col("by") && col("px") === col("bx") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val labels = DedupResolve.connectedComponents(adj)
      .withColumnRenamed("id", "ck")
    core.join(labels, Seq("ck"), "left")
      .select(coalesce(col("label"), col("ck")).as("cluster"), col("n"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
  }

  /** Nearest facility per point: the dimension side (facilities) is
    * bounded — broadcast it and take the argmin by lexicographic
    * (dist2, facility id) — tie-free, engine-exact. The corpus side
    * stays a linear scan with a map-side partial agg; no shuffle ever
    * carries more than one row per point.
    *
    * The argmin runs on ONE packed `decimal(38,0)`,
    * `d2 · (maxFid+1) + fid`, so the aggregate keeps a fixed-width
    * UnsafeRow buffer and stays in HashAggregate — `min(struct(d2,
    * fid))` has a struct buffer, which forces SortAggregate: a full
    * per-partition SORT of the points × facilities cross product
    * (measured 22.9 s vs 1.4 s at sf0.1, and quadratically worse with
    * scale). The r7 long packing (`d2 << facIdBits | fid`) capped
    * facility ids at 2^facIdBits — the sf10 probe broke it at 100k
    * facilities, and widening the bits shrank the representable d2
    * range below legitimate coordinate boxes. The decimal pack has no
    * such trade: d2 ≤ 2·(360e6)² for ANY micro-degree input and ids
    * below 1e18 (enforced) keep the product under 10^38 — exact, no
    * clamp, no null-argmin edge.
    */
  def nearestFacility(pts: DataFrame, fac: DataFrame): DataFrame = {
    val b = checkedMaxFid(fac) + 1
    val d2 =
      (col("lat_e6") - col("f_lat")) * (col("lat_e6") - col("f_lat")) +
        (col("lon_e6") - col("f_lon")) * (col("lon_e6") - col("f_lon"))
    val checkedPts = pts.select(col("id"),
      checkedCoord(col("lat_e6"), "lat_e6").as("lat_e6"),
      checkedCoord(col("lon_e6"), "lon_e6").as("lon_e6"))
    checkedPts.crossJoin(broadcast(fac))
      .select(col("id"), d2.as("d2"), col("fid"))
      .groupBy(col("id"))
      .agg(min(col("d2")).as("dist2"),
        min(col("d2").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * lit(b) + col("fid")).as("pk"))
      .select(col("id"), (col("pk") % lit(b)).cast("long").as("nearest"),
        col("dist2"))
  }

  /** EXACT nearest facility via grid ring search — the corpus-scale
    * path when the facility side is NOT broadcastable (millions of
    * facilities): both sides bucket to grid cells, each round is a
    * plain shuffle EQUI-JOIN of the unresolved points' probe cells
    * against the facility cells, and a point is FINAL once its best
    * candidate lies within `ring · cellE6` — any facility outside the
    * probed (2·ring+1)² block is strictly farther than that (the block
    * extends at least ring whole cells beyond the point's own cell in
    * every direction), so the found argmin is provably global. Rings
    * double (1, 2, 4, …): a point in a facility-dense region resolves
    * in round one with a 3×3 probe; empty-region stragglers escalate
    * geometrically, and the loop runs ≤ log₂(gridSpan) rounds of
    * ever-smaller frames (the [[DedupResolve]] contraction discipline —
    * each round's unresolved side is localCheckpointed via
    * [[Materialize]] to cut lineage). Points with no facility within
    * `maxRing` cells come back with nearest = null — the caller chose
    * the grid resolution; same (d2, fid) packed argmin (and therefore
    * identical tie-breaks and the same preconditions) as
    * [[nearestFacility]], which GeoSpec pins by equality on shared
    * inputs and the driver oracle hash-checks against the brute-force
    * SQL.
    *
    * Self-containment guard:
    *  - A facility cell holding more than `maxCellOccupancy` facilities
    *    (dense metro at coarse cellE6) is sub-split: facilities salt by
    *    `xxhash64(fid) mod ceil(n / maxCellOccupancy)` and the probe side
    *    explodes every salt of a hot cell (the split table is hot cells
    *    only — broadcastable), so no single join group ever exceeds
    *    ~maxCellOccupancy facilities regardless of how skewed the
    *    facility distribution is. Cold cells pay one broadcast lookup
    *    and a 1-element explode — plan shape unchanged. Exactness is
    *    untouched: salts partition a cell's facilities, and the probe
    *    covers all of them (GeoSpec plants a degenerate one-cell
    *    facility blob and pins equality with the broadcast path).
    */
  def nearestFacilityGrid(pts: DataFrame, fac: DataFrame,
      latMinE6: Long, lonMinE6: Long, cellE6: Long,
      maxRing: Int = 64,
      maxCellOccupancy: Int = 4096): DataFrame = {
    val b = checkedMaxFid(fac) + 1
    require(maxCellOccupancy > 0, "maxCellOccupancy must be positive")
    val fcells0 = Materialize(withCells(
        fac.select(col("fid").as("id"), col("f_lat").as("lat_e6"),
          col("f_lon").as("lon_e6")), latMinE6, lonMinE6, cellE6)
      .select(col("id").as("fid"), col("lat_e6").as("f_lat"),
        col("lon_e6").as("f_lon"), col("cy").as("by"), col("cx").as("bx")))
    // Hot-cell split counts: one aggregate over the facility side, kept
    // only where occupancy exceeds the cap — small by construction.
    val occ = Materialize(fcells0.groupBy(col("by"), col("bx"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCellOccupancy)
      .select(col("by"), col("bx"),
        expr(s"cast((n + ${maxCellOccupancy - 1}) DIV $maxCellOccupancy as int)")
          .as("nsplit")))
    val fcells = Materialize(fcells0
      .join(broadcast(occ), Seq("by", "bx"), "left")
      .withColumn("salt",
        pmod(xxhash64(col("fid")), coalesce(col("nsplit"), lit(1))).cast("int"))
      .drop("nsplit"))
    val d2 =
      (col("lat_e6") - col("f_lat")) * (col("lat_e6") - col("f_lat")) +
        (col("lon_e6") - col("f_lon")) * (col("lon_e6") - col("f_lon"))
    var remaining = Materialize(
      withCells(pts.select(col("id"),
          checkedCoord(col("lat_e6"), "lat_e6").as("lat_e6"),
          checkedCoord(col("lon_e6"), "lon_e6").as("lon_e6")),
        latMinE6, lonMinE6, cellE6))
    var resolved = Vector.empty[DataFrame]
    var ring = 1
    while (ring <= maxRing && !remaining.isEmpty) {
      // (2·ring+1)² probe block via two nested sequence-explodes — NOT a
      // literal offset array, whose (2·64+1)² = 16k-element constructor
      // would bloat the plan the way the 65k-literal In did. Re-probing
      // inner cells on escalation is deliberate: escalation reaches few
      // points, and annulus-only probing would force carrying per-point
      // candidate state across rounds.
      val probes = remaining
        .select(col("id"), col("lat_e6"), col("lon_e6"), col("cy"), col("cx"),
          explode(sequence(lit(-ring), lit(ring))).as("dy"))
        .select(col("id"), col("lat_e6"), col("lon_e6"),
          (col("cy") + col("dy")).as("by"), col("cx"),
          explode(sequence(lit(-ring), lit(ring))).as("dx"))
        .select(col("id"), col("lat_e6"), col("lon_e6"), col("by"),
          (col("cx") + col("dx")).as("bx"))
        .join(broadcast(occ), Seq("by", "bx"), "left")
        .select(col("id"), col("lat_e6"), col("lon_e6"), col("by"), col("bx"),
          explode(sequence(lit(0), coalesce(col("nsplit"), lit(1)) - 1))
            .as("salt"))
      // Size the ring join's exchange from the CURRENT unresolved-point
      // count (r13 — the r12 27x find made default, operator-side):
      // the probe side explodes (2·ring+1)² blocks per point, so at a
      // conf-sized fixed partition count a large point frame sorts/
      // spills pathologically (measured 129-258 s at 32 partitions vs
      // 9.6 s sized at sf10's 1.5M points). An explicit repartition on
      // the join keys pins the join's parallelism to ~5k points per
      // partition — the other side aligns to it, AQE never coalesces a
      // user-numbered repartition, and late rings (few survivors)
      // shrink back to the cores grain. The count is an O(1)-ish
      // action on the checkpointed frame.
      val nProbe = math.min(8192L, math.max(
        pts.sparkSession.sparkContext.defaultParallelism.toLong,
        remaining.count() / 5000L)).toInt
      val best = probes.repartition(nProbe, col("by"), col("bx"), col("salt"))
        .join(fcells, Seq("by", "bx", "salt"))
        .select(col("id"), d2.as("d2"), col("fid"))
        .groupBy(col("id"))
        .agg(min(col("d2")).as("dist2"),
          min(col("d2").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * lit(b) + col("fid")).as("pk"))
      // Resolve threshold (overflow-free via BigInt; d2 itself is a
      // long, so a ring whose guard exceeds Long.Max resolves all).
      val guard = {
        val rc = BigInt(ring) * BigInt(cellE6)
        lit((rc * rc).min(BigInt(Long.MaxValue)).toLong)
      }
      val joined = Materialize(remaining.join(best, Seq("id"), "left"))
      resolved = resolved :+ joined.filter(col("dist2") <= guard)
        .select(col("id"), (col("pk") % lit(b)).cast("long").as("nearest"),
          col("dist2"))
      remaining = Materialize(joined.filter(
          col("dist2").isNull || col("dist2") > guard)
        .select(col("id"), col("lat_e6"), col("lon_e6"), col("cy"), col("cx")))
      ring *= 2
    }
    val leftover = remaining.select(col("id"),
      lit(null).cast("long").as("nearest"), lit(null).cast("long").as("dist2"))
    (resolved :+ leftover).reduce(_ unionByName _)
  }
}
