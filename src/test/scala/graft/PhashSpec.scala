package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class PhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ph(id: Long): Long =
    Multimodal.pHash(Multimodal.synthPatternPng(id)).get

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("brightness-only variants are Hamming-near-zero; bytes still differ") {
    // ids 0 and 3: same scene, different base brightness — a pure DC
    // shift, but Java2D's bilinear rescale rounds integer pixels, so a
    // few near-median bits may jitter. ≤ 6 is the measured envelope.
    assert(hamming(ph(0L), ph(3L)) <= 6)
    assert(!java.util.Arrays.equals(
      Multimodal.synthPatternPng(0L), Multimodal.synthPatternPng(3L)))
  }

  test("patch variants are Hamming-near; other scenes are far") {
    // ids 0 and 7: same scene, one 8×8 patch brightened.
    assert(hamming(ph(0L), ph(7L)) <= 10)
    // Different scenes should not sit within the near-dup threshold.
    val far = for (s <- 1L to 5L) yield hamming(ph(0L), ph(s * 10L))
    assert(far.forall(_ > 10), s"cross-scene distances too small: $far")
  }

  test("phashPairs finds every same-scene pair and no cross-scene pair") {
    val ids = (0L until 30L) // 3 scenes × 10 variants
    val media = ids.map(id => (id, Multimodal.synthPatternPng(id))).toDF("doc_id", "media")
    val pairs = Multimodal.phashPairs(media, "doc_id", "media", maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sameScene = for {
      a <- ids; b <- ids if a < b && a / 10 == b / 10
    } yield (a, b)
    assert(sameScene.toSet.subsetOf(pairs), "missed planted near-dups")
    assert(pairs.forall { case (a, b) => a / 10 == b / 10 },
      s"cross-scene false positives: ${pairs.filterNot { case (a, b) => a / 10 == b / 10 }}")
  }

  test("band geometry: 8 overlapping 16-bit wrapping windows, ≤3 flips guaranteed") {
    // Pin the key function itself on a recognizable bit pattern.
    val x = 0x0123456789abcdefL
    assert((0 until 8).map(Multimodal.phashBandKey(x, _)) ==
      Seq(0xcdefL, 0xabcdL, 0x89abL, 0x6789L, 0x4567L, 0x2345L, 0x0123L, 0xef01L))
    // Pigeonhole: any ≤3 flipped bits hit ≤6 of the 8 overlapping
    // windows, so one clean shared band ALWAYS remains. Exhaustive over
    // a spread of flip placements.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val base = rnd.nextLong()
      val flips = Seq.fill(3)(rnd.nextInt(64)).distinct
      val other = flips.foldLeft(base)((h, i) => h ^ (1L << i))
      assert((0 until 8).exists(b =>
        Multimodal.phashBandKey(base, b) == Multimodal.phashBandKey(other, b)),
        s"no clean band for flips=$flips")
    }
  }

  test("maxBucket drops flooded bands but keeps normal clusters") {
    // Flood: ids 0..4 carry the SAME image bytes (a constant image at
    // corpus scale) — identical pHash, so all 8 of their band buckets
    // reach size 5. With maxBucket = 4 the flooded buckets are dropped
    // (skew guard engaged — no pairs), while scene 1, planted at 3
    // variants, stays under the cap and still pairs up.
    val flood = (0L until 5L).map(id => (id, Multimodal.synthPatternPng(0L)))
    val scene = Seq(10L, 11L, 12L).map(id => (id, Multimodal.synthPatternPng(id)))
    val media = (flood ++ scene).toDF("doc_id", "media")
    val pairs = Multimodal.phashPairs(media, "doc_id", "media",
        maxHamming = 10, maxBucket = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.forall { case (a, b) => a >= 10L && b >= 10L },
      s"flooded-bucket pairs leaked through the cap: $pairs")
    assert(pairs == Set((10L, 11L), (10L, 12L), (11L, 12L)),
      s"under-cap scene pairs missing: $pairs")
  }

  test("pHash is None for undecodable bytes and deterministic for valid ones") {
    assert(Multimodal.pHash("not a png".getBytes).isEmpty)
    assert(Multimodal.pHash(Array.emptyByteArray).isEmpty)
    assert(ph(42L) == ph(42L))
  }
}
