package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Geo

class GeoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Small deterministic point set spanning cell boundaries: a tight pair
  // straddling a cell edge (grid must still find it via the 3x3 probe),
  // an isolated point, and a dense blob.
  private val pts = Seq(
    (1L, 99000L, 99000L),   // just below the (0,0)/(1,1) cell corner
    (2L, 101000L, 101000L), // just across it — dist ~2.8k, same pair
    (3L, 5000000L, 5000000L), // isolated
    (4L, 500000L, 500000L), (5L, 510000L, 505000L), (6L, 495000L, 520000L))

  private def ptsDf =
    Geo.withCells(pts.toDF("id", "lat_e6", "lon_e6"), 0L, 0L, cellE6 = 100000L)

  test("radiusNeighborCounts equals brute force, boundary pairs included") {
    val r = 100000L
    val got = Geo.radiusNeighborCounts(ptsDf, r)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    val brute = pts.map { case (i, la, lo) =>
      i -> pts.count { case (j, lb, ob) =>
        j != i && (la - lb) * (la - lb) + (lo - ob) * (lo - ob) <= r * r
      }.toLong
    }.toMap
    assert(got == brute)
    assert(got(1L) == 1L && got(3L) == 0L) // cross-cell pair found; isolate zero
  }

  test("gridClusters merges adjacent core cells, bounded by the grid") {
    // Two dense blobs, 3 cells apart (NOT adjacent), each spanning two
    // ADJACENT core cells -> exactly two clusters of 2 cells each.
    val blob = (off: Long, base: Long) => (0L until 6L).map(i =>
      (base + i, off + 50000L + (i % 3) * 1000L, off + 95000L + (i / 3) * 10000L))
    val d = Geo.withCells(
      (blob(0L, 100L) ++ blob(500000L, 200L)).toDF("id", "lat_e6", "lon_e6"),
      0L, 0L, cellE6 = 100000L)
    val got = Geo.gridClusters(d, minPts = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.length == 2)
    assert(got.forall { case (_, nCells, nPts) => nCells == 2 && nPts == 6 })
  }

  test("nearestFacility equals brute-force argmin with deterministic ties") {
    val fac = Seq((10L, 0L, 0L), (11L, 1000000L, 1000000L),
      (12L, 5000000L, 5000000L)).toDF("fid", "f_lat", "f_lon")
    val got = Geo.nearestFacility(pts.toDF("id", "lat_e6", "lon_e6"), fac)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = pts.map { case (i, la, lo) =>
      i -> Seq((10L, 0L, 0L), (11L, 1000000L, 1000000L),
          (12L, 5000000L, 5000000L))
        .map { case (f, fa, fo) =>
          ((la - fa) * (la - fa) + (lo - fo) * (lo - fo), f) }
        .min._2
    }.toMap
    assert(got == brute)
    assert(got(3L) == 12L)
  }

  test("nearestFacility packed argmin: exact ties break to the smaller fid") {
    // Point at the exact midpoint of two facilities — equal d2; the
    // lexicographic (d2, fid) contract keeps fid 20, not 21. A third
    // facility is strictly nearer for the second point.
    val fac = Seq((21L, 0L, 0L), (20L, 0L, 2000L), (22L, 5000L, 1000L))
      .toDF("fid", "f_lat", "f_lon")
    val p = Seq((1L, 0L, 1000L), (2L, 4800L, 1000L)).toDF("id", "lat_e6", "lon_e6")
    val got = Geo.nearestFacility(p, fac)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (20L, 1000000L))
    assert(got(2L) == (22L, 40000L))
  }

  test("nearestFacility handles wide facility ids exactly (decimal argmin)") {
    // The r7 long packing rejected fids past 2^14 — the sf10 probe hit
    // exactly that with 100k facilities. The decimal pack must stay
    // exact for wide ids AND wide coordinate boxes at once (the long
    // pack could not hold both), including the min-fid tie-break.
    val fac = Seq(
      (100000000000L, 0L, 0L), (99999L, 0L, 0L), // exact tie at origin
      (70000L, 179000000L, 85000000L)
    ).toDF("fid", "f_lat", "f_lon")
    val p = Seq(
      (1L, 1L, 0L),                       // nearest = the origin tie pair
      (2L, 178999999L, 85000001L)         // far corner of a world box
    ).toDF("id", "lat_e6", "lon_e6")
    val got = Geo.nearestFacility(p, fac)
      .select("id", "nearest", "dist2").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 99999L, 1L), (2L, 70000L, 2L)))
    // Ids past the decimal bound still fail loudly.
    val wide = Seq((1000000000000000000L, 0L, 0L)).toDF("fid", "f_lat", "f_lon")
    intercept[IllegalArgumentException] { Geo.nearestFacility(p, wide) }
  }

  test("nearestFacilityGrid equals the broadcast path, escalation included") {
    // 60 random points, 8 facilities clumped in one corner of a
    // 10M x 10M box with cell 200k: points far from the clump need
    // several ring doublings before the guarantee closes — the
    // escalation path is exercised, and the answers must still match
    // the broadcast argmin exactly (same packed (d2, fid) tie-break).
    val rnd = new scala.util.Random(31)
    val p = (1L to 60L).map(i =>
      (i, rnd.nextLong(10000000L), rnd.nextLong(10000000L)))
      .toDF("id", "lat_e6", "lon_e6")
    val fac = (0L until 8L).map(f =>
      (f, rnd.nextLong(400000L), rnd.nextLong(400000L)))
      .toDF("fid", "f_lat", "f_lon")
    val grid = Geo.nearestFacilityGrid(p, fac, 0L, 0L, cellE6 = 200000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bc = Geo.nearestFacility(p, fac)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(grid == bc)
  }

  test("nearestFacilityGrid sub-splits a degenerate hot facility cell") {
    // 5000 facilities planted in ONE grid cell (plus one decoy far away)
    // with maxCellOccupancy = 64: the hot cell must split into
    // ceil(5000/64) = 79 salted groups — no join group wider than the cap
    // — and the answers must still equal the broadcast argmin exactly,
    // including the packed (d2, fid) tie-break inside the hot cell.
    val rnd = new scala.util.Random(47)
    val fac = ((0L until 5000L).map(f =>
        (f, 10000L + rnd.nextLong(80000L), 10000L + rnd.nextLong(80000L))) :+
        (5001L, 9000000L, 9000000L))
      .toDF("fid", "f_lat", "f_lon")
    val p = (1L to 40L).map(i =>
      (i, rnd.nextLong(4000000L), rnd.nextLong(4000000L)))
      .toDF("id", "lat_e6", "lon_e6")
    val grid = Geo.nearestFacilityGrid(p, fac, 0L, 0L, cellE6 = 100000L,
        maxCellOccupancy = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bc = Geo.nearestFacility(p, fac)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(grid == bc)
  }

  test("nearestFacility rejects an empty facility side with a clear message") {
    val fac = Seq.empty[(Long, Long, Long)].toDF("fid", "f_lat", "f_lon")
    val p = Seq((1L, 0L, 0L)).toDF("id", "lat_e6", "lon_e6")
    val e = intercept[IllegalArgumentException] { Geo.nearestFacility(p, fac) }
    assert(e.getMessage.contains("non-empty"))
  }

  test("coordinate-magnitude bound is enforced on both sides") {
    // Deltas past ~3e9 micro-degrees overflow long d2 arithmetic and a
    // wrapped NEGATIVE d2 silently wins every argmin — so the documented
    // micro-degree precondition must be enforced, not assumed. Facility
    // side: eager (it is scanned for maxFid anyway). Point side: in-plan
    // raise_error (an eager driver pass over the corpus would cost a
    // full extra scan).
    val okFac = Seq((1L, 0L, 0L)).toDF("fid", "f_lat", "f_lon")
    val badFac = Seq((1L, 3000000000L, 0L)).toDF("fid", "f_lat", "f_lon")
    val okPts = Seq((1L, 100L, 100L)).toDF("id", "lat_e6", "lon_e6")
    val badPts = Seq((1L, 100L, -3000000000L)).toDF("id", "lat_e6", "lon_e6")
    val eFac = intercept[IllegalArgumentException] {
      Geo.nearestFacility(okPts, badFac)
    }
    assert(eFac.getMessage.contains("micro-degree"))
    val ePts = intercept[Exception] {
      Geo.nearestFacility(badPts, okFac).collect()
    }
    assert(ePts.getMessage != null)
    val ePtsGrid = intercept[Exception] {
      Geo.nearestFacilityGrid(badPts, okFac, 0L, 0L, cellE6 = 100000L).collect()
    }
    assert(ePtsGrid.getMessage != null)
    // In-range inputs are untouched (identity guard, no value change).
    val got = Geo.nearestFacility(okPts, okFac).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
    // The r9 hole: ±1.5e9 was IN range under the old 2e9 cap, yet two
    // opposite-sign coords at that magnitude give delta 3e9, d2 ≈ 9e18 —
    // wrapping Long and silently winning the argmin. The tightened 1e9
    // cap must fire on BOTH sides for such values.
    val holeFac = Seq((1L, 1500000000L, 0L)).toDF("fid", "f_lat", "f_lon")
    val holePts = Seq((1L, -1500000000L, 0L)).toDF("id", "lat_e6", "lon_e6")
    val eHoleFac = intercept[IllegalArgumentException] {
      Geo.nearestFacility(okPts, holeFac)
    }
    assert(eHoleFac.getMessage.contains("micro-degree"))
    val eHolePts = intercept[Exception] {
      Geo.nearestFacility(holePts, okFac).collect()
    }
    assert(eHolePts.getMessage != null)
  }

  test("autoCellE6 scales resolution with facility density; results unchanged") {
    // 10x the facilities in the same box -> cell shrinks ~sqrt(10), so
    // per-cell occupancy stays ~targetPerCell instead of growing 10x
    // (the fixed-cell quadratic-density trap the sf100 probe measured).
    def facs(n: Int) = (1 to n).map(i =>
      (i.toLong, (i * 37 % 1000) * 1000L, (i * 91 % 2000) * 1000L))
      .toDF("fid", "f_lat", "f_lon")
    val c1 = Geo.autoCellE6(facs(20), 1000000L, 2000000L)
    val c2 = Geo.autoCellE6(facs(200), 1000000L, 2000000L)
    assert(c2 < c1 && math.abs(c1 / c2.toDouble - math.sqrt(10)) < 0.5)
    // Different resolutions, identical answers (ring guarantee).
    val p = Seq((1L, 100000L, 100000L), (2L, 900000L, 1900000L))
      .toDF("id", "lat_e6", "lon_e6")
    val a = Geo.nearestFacilityGrid(p, facs(200), 0L, 0L, cellE6 = c2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Geo.nearestFacility(p, facs(200))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("nearestFacilityGrid: points beyond maxRing come back null") {
    val fac = Seq((1L, 0L, 0L)).toDF("fid", "f_lat", "f_lon")
    val p = Seq((1L, 100L, 100L), (2L, 9000000L, 9000000L))
      .toDF("id", "lat_e6", "lon_e6")
    // maxRing 2 with cell 100k reaches 200k: point 2 (≈12.7M away) is
    // out of range and must be explicit-null, never silently dropped.
    val got = Geo.nearestFacilityGrid(p, fac, 0L, 0L, cellE6 = 100000L,
        maxRing = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) == Some(1L) && got(2L) == None)
  }
}
