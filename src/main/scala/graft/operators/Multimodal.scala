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

  /** ======== STUB ========
    * Deterministic fake resize: a real implementation decodes, scales to
    * `maxDim` and re-encodes. The stub keeps the contract that matters to
    * the pipeline: output is a pure function of (bytes, maxDim), no larger
    * than the input, non-empty for non-empty input.
    */
  def resizeStub(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
    if (bytes.isEmpty) return bytes
    val keep = math.max(1, math.min(bytes.length, maxDim * 64))
    java.util.Arrays.copyOfRange(bytes, 0, keep)
  }

  /** Resized-media column: binary in → binary out, single narrow pass via
    * mapPartitions (decoder init amortized per partition).
    */
  def resize(df: DataFrame, idCol: String, mediaCol: String, mimeCol: String,
      maxDim: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(mediaCol).cast("binary").as("media"),
        col(mimeCol).cast("string").as("mime")).as[MediaRow]
      .mapPartitions(_.map(r =>
        MediaRow(r.id, resizeStub(Option(r.media).getOrElse(Array.empty), maxDim), r.mime)))
      .toDF()
  }

  final case class FrameFeatures(
      id: Long, frame_idx: Int, offset: Int, frame_hash: Long, brightness: Double)

  /** Frame sampling for video-like payloads: emit features for `nFrames`
    * evenly spaced positions per media item (1 row in → N rows out — the
    * batch shape a real ffmpeg-backed sampler has). Frame decode is
    * STUBBED as a windowed byte slice; offsets/batching/schema are real.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      nFrames: Int = 4): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(mediaCol).cast("binary").as("media"),
        lit("video/stub").as("mime")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = Option(r.media).getOrElse(Array.empty[Byte])
          if (bytes.isEmpty) Iterator.empty
          else (0 until nFrames).iterator.map { i =>
            val off = (bytes.length.toLong * i / nFrames).toInt
            val len = math.min(64, bytes.length - off)
            val window = java.util.Arrays.copyOfRange(bytes, off, off + len)
            val (_, _, _, bright) = {
              val d = decodeStub(window); d
            }
            FrameFeatures(r.id, i, off,
              scala.util.hashing.MurmurHash3.bytesHash(window, 42).toLong, bright)
          }
        }
      }.toDF()
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
