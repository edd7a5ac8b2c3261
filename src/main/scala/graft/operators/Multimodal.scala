package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3): media as opaque `binary`
  * columns with typed metadata, batch feature extraction via
  * `mapPartitions` (the Scala analog of `mapInPandas` — per-partition
  * batching, stable schema in/out).
  *
  * The actual byte-decode (image/audio libs are not in this container) is
  * STUBBED behind `decodeStub`: a deterministic fake that derives pseudo
  * width/height/format from the bytes. Everything around it — schema,
  * encoders, partition batching, null handling — is real and tested; a
  * production deploy swaps `decodeStub` for a JNI/javacv call with the
  * same signature.
  */
object Multimodal {

  /** Input row: opaque media bytes + source metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Extracted features: what a real decoder would emit. */
  final case class MediaFeatures(
      id: Long,
      byte_len: Int,
      content_hash: Long,
      width: Int, // STUB: derived deterministically from bytes
      height: Int, // STUB
      format: String, // STUB
      brightness: Double) // STUB: mean byte value as a stand-in

  /** ======== STUB ========
    * Deterministic fake decode. Real implementation: decode `media` with an
    * imaging library and emit true dimensions/format/stats. Signature and
    * determinism contract (pure function of bytes) must be preserved.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String, Double) = {
    var h = 1125899906842597L // deterministic FNV-ish fold over the bytes
    var sum = 0L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); sum += (bytes(i) & 0xff); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val fmt = if (math.floorMod(h, 2) == 0L) "png" else "jpeg"
    val bright = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    (w, ht, fmt, bright)
  }

  /** Batch feature extraction: one decoder invocation pipeline per
    * partition (mirrors mapInPandas batch shape — amortizes decoder init).
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // Real decoders initialize native context here, once per partition.
      it.map { r =>
        val bytes = if (r.media == null) Array.empty[Byte] else r.media
        val (w, h, fmt, bright) = decodeStub(bytes)
        MediaFeatures(r.id, bytes.length,
          scala.util.hashing.MurmurHash3.bytesHash(bytes, 42).toLong, w, h, fmt, bright)
      }
    }
  }

  /** DataFrame-level wrapper: binary column in, feature columns out. */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String, mimeCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      col(mediaCol).cast("binary").as("media"),
      col(mimeCol).cast("string").as("mime")).as[MediaRow]
    extractFeatures(ds).toDF()
  }
}
