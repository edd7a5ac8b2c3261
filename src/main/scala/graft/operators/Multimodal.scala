package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3): media as opaque `binary`
  * columns with typed metadata, batch feature extraction via
  * `mapPartitions` (the Scala analog of `mapInPandas` — per-partition
  * batching, stable schema in/out).
  *
  * Image decode is REAL for the formats the JDK parses natively
  * (PNG/JPEG/BMP/GIF via javax.imageio, headless, zero extra deps):
  * true dimensions, magic-byte format sniffing, mean luminance over a
  * bounded sample grid, and a real nearest-box resize + PNG re-encode.
  * Bytes ImageIO cannot parse (video containers, audio — no codecs in
  * this container) fall back to `decodeStub`, a deterministic fake with
  * the same signature, so the pipeline shape is total either way; a
  * production deploy swaps the fallback for ffmpeg/JNI.
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

  /** Deterministic tiny PNG for an id — real, decodable media for tests
    * and driver queries without external data: dimensions and fill color
    * are pure functions of the id. */
  def synthPng(id: Long): Array[Byte] = {
    val w = 8 + math.floorMod(id, 16).toInt
    val h = 8 + math.floorMod(id / 16, 16).toInt
    val rgb = (id * 2654435761L).toInt & 0xffffff
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Magic-byte format sniff — cheaper and more honest than trusting the
    * mime column. */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0x89 && b(1) == 'P') "png"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else "unknown"

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF, headless):
    * (width, height, format, mean luminance). Luminance is Rec.601 over a
    * bounded ≤64×64 sample grid so a 100-megapixel scan costs the same as
    * a thumbnail. None when ImageIO can't parse the bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, String, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val sx = math.max(1, w / 64)
      val sy = math.max(1, h / 64)
      var sum = 0.0
      var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          n += 1
          x += sx
        }
        y += sy
      }
      Some((w, h, sniffFormat(bytes), if (n == 0) 0.0 else sum / n))
    }
  }

  /** ======== STUB (fallback) ========
    * Deterministic fake decode for bytes ImageIO cannot parse (video/
    * audio — no codecs offline). Signature and determinism contract
    * (pure function of bytes) match the real decoder.
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
      // Heavier decoders initialize native context here, once per partition.
      it.map { r =>
        val bytes = if (r.media == null) Array.empty[Byte] else r.media
        val (w, h, fmt, bright) =
          decodeImage(bytes).getOrElse(decodeStub(bytes))
        MediaFeatures(r.id, bytes.length,
          scala.util.hashing.MurmurHash3.bytesHash(bytes, 42).toLong, w, h, fmt, bright)
      }
    }
  }

  /** REAL image resize: decode with ImageIO, scale the long edge down to
    * `maxDim` (aspect preserved, bilinear), re-encode as PNG. Identity
    * when already within bounds; None when the bytes aren't a decodable
    * image (caller falls back to the stub).
    */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else if (math.max(img.getWidth, img.getHeight) <= maxDim) Some(bytes)
    else {
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val nw = math.max(1, math.round(img.getWidth * scale).toInt)
      val nh = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      Some(baos.toByteArray)
    }
  }

  /** ======== STUB (fallback) ========
    * Deterministic fake resize for undecodable bytes. Contract: pure
    * function of (bytes, maxDim), no larger than the input, non-empty
    * for non-empty input.
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
      .mapPartitions(_.map { r =>
        val bytes = Option(r.media).getOrElse(Array.empty[Byte])
        MediaRow(r.id,
          resizeImage(bytes, maxDim).getOrElse(resizeStub(bytes, maxDim)),
          r.mime)
      })
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
