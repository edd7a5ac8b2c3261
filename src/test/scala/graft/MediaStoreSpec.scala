package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaFeatureStore, Multimodal}

/** The decode-once feature store: one decode pass must publish features
  * bit-identical to every per-query decoder (that equality is what lets
  * the registered media queries read the store instead of bytes), and
  * the append path must never re-decode or rewrite existing items.
  */
class MediaStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = 0L until 40L

  private def synthMedia(idSeq: Seq[Long]) =
    idSeq.flatMap(id => Seq(
      ("png", id, Multimodal.synthPng(id)),
      ("pattern", id, Multimodal.synthPatternPng(id)),
      ("wav", id, Multimodal.synthWav(id)),
      ("video", id, Multimodal.synthVideo(id, 4))))
      .toDF("kind", "id", "media")

  private lazy val storePath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-mediastore").toString
    MediaFeatureStore.build(synthMedia(ids), p)
    p
  }
  private def store = MediaFeatureStore.load(spark, storePath)

  test("store image features equal the per-query decoder bit-for-bit") {
    val fromStore = store.filter(col("kind") === "png")
      .select("id", "byte_len", "content_hash", "width", "height",
        "format", "brightness")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val media = ids.map(id => (id, Multimodal.synthPng(id), "image/png"))
      .toDF("doc_id", "media", "mime")
    val direct = Multimodal.extractFeatures(media, "doc_id", "media", "mime")
      .select("id", "byte_len", "content_hash", "width", "height",
        "format", "brightness")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fromStore == direct)
  }

  test("store phash equals Multimodal.pHash for every pattern image") {
    val fromStore = store.filter(col("kind") === "pattern")
      .select("id", "phash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = ids.map(id =>
      id -> Multimodal.pHash(Multimodal.synthPatternPng(id)).get).toMap
    assert(fromStore == direct)
  }

  test("store audio features equal the per-query decoder") {
    val fromStore = store.filter(col("kind") === "wav")
      .select("id", "byte_len", "sample_rate", "channels", "n_frames",
        "duration_ms", "rms")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val media = ids.map(id => (id, Multimodal.synthWav(id)))
      .toDF("doc_id", "media")
    val direct = Multimodal.extractAudioFeatures(media, "doc_id", "media")
      .select("id", "byte_len", "sample_rate", "channels", "n_frames",
        "duration_ms", "rms")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fromStore == direct)
  }

  test("store frame features equal sampleVideoFrames") {
    val fromStore = store.filter(col("kind") === "video")
      .select(col("id"), explode(col("frames")).as("f"))
      .select(col("id"), col("f.frame_idx"), col("f.byte_off"),
        col("f.width"), col("f.height"), col("f.brightness"),
        col("f.n_frames"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap
    val media = ids.map(id => (id, Multimodal.synthVideo(id, 4)))
      .toDF("doc_id", "media")
    val direct = Multimodal.sampleVideoFrames(media, "doc_id", "media", 4)
      .select("id", "frame_idx", "byte_off", "width", "height",
        "brightness", "n_frames")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap
    assert(fromStore == direct)
  }

  test("append decodes only the new batch; existing rows stay untouched") {
    val p = java.nio.file.Files.createTempDirectory("graft-mediastore-app").toString
    MediaFeatureStore.build(synthMedia(0L until 10L), p)
    val before = MediaFeatureStore.load(spark, p)
      .filter(col("kind") === "pattern").orderBy("id")
      .collect().map(_.toSeq).toSeq
    // The append batch RE-OFFERS ids 0..9 with GARBAGE bytes: if append
    // decoded (or rewrote) existing items, their stored features would
    // change to stub values. Only ids 10..14 are new.
    val garbage = (0L until 10L).flatMap(id => Seq(
      ("png", id, Array[Byte](1, 2, 3)), ("pattern", id, Array[Byte](9)),
      ("wav", id, Array[Byte](0)), ("video", id, Array.empty[Byte])))
    val batch = (garbage ++ (10L until 15L).flatMap(id => Seq(
      ("png", id, Multimodal.synthPng(id)),
      ("pattern", id, Multimodal.synthPatternPng(id)),
      ("wav", id, Multimodal.synthWav(id)),
      ("video", id, Multimodal.synthVideo(id, 4)))))
      .toDF("kind", "id", "media")
    MediaFeatureStore.append(spark, batch, p)
    val after = MediaFeatureStore.load(spark, p)
    val unchanged = after.filter(col("kind") === "pattern" && col("id") < 10)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(unchanged == before, "existing rows must be byte-identical")
    val newPhash = after.filter(col("kind") === "pattern" && col("id") >= 10)
      .select("id", "phash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (10L until 15L).map(id =>
      id -> Multimodal.pHash(Multimodal.synthPatternPng(id)).get).toMap
    assert(newPhash == want, "new ids must carry real decoded features")
    assert(after.count() == before.size * 4 + 5 * 4)
  }

  test("kind-filtered reads prune partitions statically") {
    val plan = store.filter(col("kind") === "wav").queryExecution
      .executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("kind"),
      s"expected a partition filter on kind in:\n$plan")
  }
}
