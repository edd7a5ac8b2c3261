package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  // ImageIO's DEFAULT stream cache is disk-backed: every decode/encode
  // spins up a FileCache temp file and deletes it — at 32 decode threads
  // the kernel churn dominates (measured on the sf10 feature-store
  // build: 87% SYSTEM time, ~24 cores busy making no progress; the
  // whole build sat at temp-file syscalls, not pixels). All media here
  // arrives as byte arrays, so the memory cache is strictly better.
  // Object-initializer placement runs it once per executor JVM, before
  // the first decode on any thread that touches this object.
  javax.imageio.ImageIO.setUseCache(false)

  /** Forces object init (and with it the setUseCache config above) from
    * call sites that reach ImageIO before any other Multimodal member —
    * e.g. MediaFeatureStore's decode partitions. */
  private[operators] def ensureFastImageIO(): Unit = ()

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
    fillPng(w, h, (id * 2654435761L).toInt & 0xffffff)
  }

  private def fillPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic motion-PNG stream for an id: `nFrames` concatenated
    * still PNGs (the MJPEG-style "stream of stills" container shape, in
    * the codec the JDK parses). Frame dims and color are pure functions
    * of (id, frame index). */
  def synthVideo(id: Long, nFrames: Int = 4): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val w = 8 + math.floorMod(id + 3L * f, 16).toInt
      val h = 8 + math.floorMod(id / 16 + f, 16).toInt
      out.write(fillPng(w, h, ((id * 31 + f) * 2654435761L).toInt & 0xffffff))
      f += 1
    }
    out.toByteArray
  }

  /** REAL container parsing for a concatenated-PNG stream: walk the PNG
    * chunk grammar (8-byte signature, then length-typed chunks to IEND)
    * to find each frame's exact (offset, length) — no magic-byte guessing
    * inside compressed data. Empty when the bytes don't start with a
    * valid PNG. */
  def pngFrameOffsets(b: Array[Byte]): Seq[(Int, Int)] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def be32(p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 0
    var ok = true
    while (ok && off + 8 <= b.length) {
      if (!(0 until 8).forall(i => b(off + i) == sig(i))) ok = false
      else {
        var p = off + 8
        var end = -1
        while (end < 0 && p + 8 <= b.length) {
          val len = be32(p)
          val isEnd = b(p + 4) == 'I' && b(p + 5) == 'E' &&
            b(p + 6) == 'N' && b(p + 7) == 'D'
          val next = p + 12 + len
          if (next > b.length) { p = b.length + 8 } // truncated chunk
          else { if (isEnd) end = next.toInt else p = next.toInt }
        }
        if (end < 0) ok = false
        else { out += ((off, end - off)); off = end }
      }
    }
    out.toSeq
  }

  final case class VideoFrame(
      id: Long, frame_idx: Int, byte_off: Int, width: Int, height: Int,
      brightness: Double, n_frames: Int)

  /** REAL frame sampling for motion-PNG streams: parse the container,
    * take up to `maxFrames` evenly spaced frames, decode each with the
    * real ImageIO path (true dims + luminance). Streams that aren't a
    * PNG sequence (compressed video codecs) fall back to the stubbed
    * byte-window sampler [[sampleFrames]] contract — here surfaced as
    * zero rows so callers can route them separately. */
  def sampleVideoFrames(df: DataFrame, idCol: String, mediaCol: String,
      maxFrames: Int = 4): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(mediaCol).cast("binary").as("media"),
        lit("video/x-motion-png").as("mime")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = Option(r.media).getOrElse(Array.empty[Byte])
          val frames = pngFrameOffsets(bytes)
          if (frames.isEmpty) Iterator.empty
          else {
            val n = frames.length
            val take = math.min(maxFrames, n)
            (0 until take).iterator.map { i =>
              val fi = ((n.toLong * i) / take).toInt
              val (off, len) = frames(fi)
              val slice = java.util.Arrays.copyOfRange(bytes, off, off + len)
              val (w, h, _, bright) =
                decodeImage(slice).getOrElse(decodeStub(slice))
              VideoFrame(r.id, fi, off, w, h, bright, n)
            }
          }
        }
      }.toDF()
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
    else Some((img.getWidth, img.getHeight, sniffFormat(bytes),
      sampledLuminance(img)))
  }

  /** Mean luminance over a bounded sample grid (≤64×64 probes whatever
    * the image size) — shared by [[decodeImage]] and the decode-once
    * feature-store pass so both publish bit-identical brightness.
    */
  private[operators] def sampledLuminance(
      img: java.awt.image.BufferedImage): Double = {
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
    if (n == 0) 0.0 else sum / n
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

  /** Extracted audio features: what a real decoder emits for PCM audio. */
  final case class AudioFeatures(
      id: Long,
      byte_len: Int,
      content_hash: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms: Double) // root-mean-square amplitude in [0, 1]

  /** Deterministic PCM WAV for an id — real, decodable audio for tests
    * and driver queries without external data: frequency, duration and
    * amplitude are pure functions of the id. 16-bit mono, 8 kHz.
    */
  def synthWav(id: Long): Array[Byte] = {
    val rate = 8000
    val freq = 200 + math.floorMod(id, 800).toInt // 200..999 Hz
    val nSamples = rate / 10 + math.floorMod(id, 7).toInt * 100 // 0.1..0.175 s
    val amp = 0.25 + 0.5 * (math.floorMod(id, 11).toInt / 10.0) // 0.25..0.75
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767.0).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    def w32(v: Int): Unit = { // little-endian
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes); w32(36 + data.length); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1) /* PCM */ ; w16(1) /* mono */
    w32(rate); w32(rate * 2); w16(2); w16(16)
    out.write("data".getBytes); w32(data.length); out.write(data, 0, data.length)
    out.toByteArray
  }

  /** REAL audio decode via the JDK's javax.sound.sampled — PCM WAV/AIFF/AU
    * parse with zero external codecs: true sample rate, channel count,
    * frame count, duration, and RMS amplitude (16-bit little-endian path;
    * sampled with a bounded stride so an hour-long take costs like a
    * clip). None when the bytes aren't a parseable audio stream —
    * compressed containers (mp3/aac) fall back to the caller's stub.
    */
  // AudioFileReader SPIs resolved ONCE and with the MIDI readers
  // excluded: AudioSystem.getAudioInputStream funnels every call through
  // the synchronized JDK13Services provider lookup, and even with the
  // SPIs cached, SoftMidiAudioFileReader re-enters that global lock
  // (MidiSystem.getSequence) just to REJECT non-MIDI bytes — jstack
  // showed all 32 decode threads convoyed on the JSSecurityManager class
  // monitor, making audio decode NEGATIVE-scale (18.8k/s at 1 thread →
  // 9.2k/s at 32; the serialization floor of the whole sf10
  // feature-store build). The surviving readers (WAV/AIFF/AU header
  // parsers) are lock-free per call. Deliberate narrowing: MIDI bytes no
  // longer render through the desktop softsynth — they fall to
  // [[audioStub]] like every other exotic codec, which is the right
  // contract for a data pipeline anyway. Lazy: one init per JVM.
  private lazy val audioReaders: IndexedSeq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toIndexedSeq
      .filterNot(_.getClass.getName.contains("Midi"))
  }

  def decodeAudio(bytes: Array[Byte]): Option[AudioFeaturesRaw] = {
    if (bytes == null || bytes.length < 12) return None
    // Same provider-chain semantics as AudioSystem.getAudioInputStream
    // (first reader that accepts the stream wins; ByteArrayInputStream
    // supports the mark/reset the SPI contract requires), minus the
    // global lock.
    var in: javax.sound.sampled.AudioInputStream = null
    var i = 0
    while (in == null && i < audioReaders.length) {
      in =
        try audioReaders(i).getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      i += 1
    }
    if (in == null) return None
    try {
      val fmt = in.getFormat
      val nFrames = in.getFrameLength
      if (nFrames <= 0 || fmt.getSampleSizeInBits != 16) return None
      val frameSize = fmt.getFrameSize
      val rate = math.round(fmt.getSampleRate)
      val durationMs = math.round(nFrames.toDouble * 1000.0 / rate)
      // RMS over ≤ 65536 frames, stride-sampled — bounded work per row.
      val stride = math.max(1L, nFrames / 65536L)
      val buf = new Array[Byte](frameSize)
      var sumSq = 0.0
      var n = 0L
      var f = 0L
      var eof = false
      while (f < nFrames && !eof) {
        if (in.read(buf) != frameSize) eof = true
        else {
          if (f % stride == 0) {
            // first channel, 16-bit; WAV is little-endian, AIFF big-endian
            val s =
              if (fmt.isBigEndian) ((buf(0) << 8) | (buf(1) & 0xff)).toShort
              else ((buf(1) << 8) | (buf(0) & 0xff)).toShort
            val x = s / 32768.0
            sumSq += x * x
            n += 1
          }
          f += 1
        }
      }
      Some(AudioFeaturesRaw(rate.toInt, fmt.getChannels, nFrames, durationMs,
        if (n == 0) 0.0 else math.sqrt(sumSq / n)))
    } finally in.close()
  }

  final case class AudioFeaturesRaw(
      sampleRate: Int, channels: Int, nFrames: Long, durationMs: Long, rms: Double)

  /** ======== STUB (fallback) ========
    * Deterministic fake audio decode for undecodable bytes (compressed
    * codecs absent offline); same contract as [[decodeStub]].
    */
  def audioStub(bytes: Array[Byte]): AudioFeaturesRaw = {
    var h = 1125899906842597L
    var sum = 0L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); sum += (bytes(i) & 0xff); i += 1 }
    val rate = 8000 + math.floorMod(h, 5).toInt * 8000
    val frames = bytes.length.toLong.max(1L)
    AudioFeaturesRaw(rate, 1 + math.floorMod(h >> 3, 2).toInt, frames,
      math.round(frames * 1000.0 / rate),
      if (bytes.isEmpty) 0.0 else (sum.toDouble / bytes.length) / 255.0)
  }

  /** Batch audio feature extraction — same mapPartitions batch shape as
    * the image path; real decode for PCM, stub fallback for codecs.
    */
  def extractAudioFeatures(df: DataFrame, idCol: String,
      mediaCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(mediaCol).cast("binary").as("media"), lit("audio").as("mime"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val bytes = Option(r.media).getOrElse(Array.empty[Byte])
        val a = decodeAudio(bytes).getOrElse(audioStub(bytes))
        AudioFeatures(r.id, bytes.length,
          scala.util.hashing.MurmurHash3.bytesHash(bytes, 42).toLong,
          a.sampleRate, a.channels, a.nFrames, a.durationMs, a.rms)
      })
      .toDF()
  }

  final case class GateRow(id: Long, kind: String, dim_a: Long, dim_b: Long)

  /** Media admission gate: keep rows whose bytes REALLY decode — images
    * via ImageIO (kind "image", dims) or PCM audio via javax.sound
    * (kind "audio", rate + frames) — and drop everything else. Stateless
    * narrow mapPartitions, so the SAME call runs under readStream
    * (StreamingSpec proves stream == batch): the shape of a streaming
    * ingest fence that blocks corrupt/undecodable media before it costs
    * downstream GPU time.
    */
  def mediaGate(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(mediaCol).cast("binary").as("media"), lit("").as("mime"))
      .as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val bytes = Option(r.media).getOrElse(Array.empty[Byte])
        decodeImage(bytes) match {
          case Some((w, h, _, _)) => Iterator.single(GateRow(r.id, "image", w, h))
          case None => decodeAudio(bytes) match {
            case Some(a) =>
              Iterator.single(GateRow(r.id, "audio", a.sampleRate, a.nFrames))
            case None => Iterator.empty
          }
        }
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

  // ======== Perceptual hashing (image near-dup dedup) ========

  /** Deterministic TEXTURED PNG: linear gradient + diagonal stripes whose
    * parameters derive from `id / 10` (the "scene"), while `id % 10` only
    * shifts overall brightness (same-scene ids are near-duplicates that
    * differ byte-wise) and `id % 10 >= 5` nudges the stripe phase by one
    * pixel (a small perceptual perturbation). So each decade of ids is a
    * planted near-dup cluster for [[pHash]] to find — with pairwise
    * DIFFERENT content hashes, the case exact dedup cannot catch.
    */
  def synthPatternPng(id: Long): Array[Byte] = {
    val scene = id / 10
    val mix = scene * -7046029254386353131L + 0x9e3779b97f4a7c15L
    val dim = 48
    val gx = 1 + math.floorMod(mix, 5).toInt // gradient slopes
    val gy = 1 + math.floorMod(mix >> 8, 5).toInt
    val sf = 2 + math.floorMod(mix >> 16, 8).toInt // stripe frequency 2..9
    val dir = math.floorMod(mix >> 24, 4).toInt // stripe direction
    val sf2 = 3 + math.floorMod(mix >> 32, 4).toInt // overlay frequency
    val dir2 = math.floorMod(mix >> 40, 4).toInt
    val inv = math.floorMod(mix >> 44, 2) == 1L // stripe polarity
    // Variant-local knobs: base moves ONLY overall brightness (clip-free
    // by construction, so it shifts ONLY the DC coefficient — the hash
    // ignores it up to integer-rounding jitter in the bilinear rescale);
    // variants in the upper half additionally brighten one 8×8 patch by
    // a small amount — a localized perceptual change (few AC bits).
    val base = math.floorMod(id, 10).toInt * 3
    val patch = math.floorMod(id, 10) >= 5
    val px = 8 * (1 + math.floorMod(mix >> 48, 4).toInt)
    val py = 8 * (1 + math.floorMod(mix >> 52, 4).toInt)
    def coord(d: Int, x: Int, y: Int): Int = d match {
      case 0 => x
      case 1 => y
      case 2 => x + y
      case _ => x - y + dim - 1
    }
    val img = new java.awt.image.BufferedImage(dim, dim,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dim) {
      var x = 0
      while (x < dim) {
        val stripe =
          if ((math.floorMod(coord(dir, x, y) / sf, 2) == 0) != inv) 36 else 0
        val overlay =
          if (math.floorMod(coord(dir2, x, y) / sf2, 3) == 0) 24 else 0
        val patchV =
          if (patch && x >= px && x < px + 8 && y >= py && y < py + 8) 8 else 0
        def sm(seed: Long): Long = {
          var z = scene * 0x9e3779b97f4a7c15L + seed * 0xbf58476d1ce4e5b9L
          z ^= z >>> 27; z *= 0x94d049bb133111ebL
          z >>> 33
        }
        // Two per-scene random fields: a COARSE 8×8-block field (its
        // energy lands squarely in the hashed low-frequency band — this
        // is what makes distinct scenes hash far apart) and a fine
        // per-pixel dither (spreads the rest of the spectrum so
        // coefficients are well-separated around the median — without it
        // the stripes are spectrally sparse and any tiny perturbation
        // reorders the near-zero mass, flipping half the hash).
        val coarse = math.floorMod(sm((y / 8).toLong * 6 + x / 8), 40L).toInt
        val fine = math.floorMod(sm(1000L + y.toLong * dim + x), 16L).toInt
        // Max 27 + 36 + 24 + 8 + 39 + 15 + 78 = 227 < 255: never clips,
        // so `base` is a pure DC shift.
        val v = base + stripe + overlay + patchV + coarse + fine +
          (gx * x + gy * y) / 6
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** 63-bit DCT perceptual hash (pHash family: Zauner, "Implementation
    * and Benchmarking of Perceptual Image Hash Functions"): decode →
    * 32×32 bilinear grayscale → 2D DCT-II → low-frequency 8×8 block
    * minus the DC term → bit i = coefficient i > median. A constant
    * brightness shift moves ONLY the DC coefficient, so same-scene
    * brightness variants hash identically; small spatial perturbations
    * flip few bits (Hamming-near). Pure double arithmetic on decoded
    * pixels — deterministic for identical bytes. None for undecodable
    * bytes.
    */
  /** cos((2y+1)·u·π/64) for u < 8, y < 32 — the only DCT factors the
    * low-frequency 8×8 block ever reads. */
  private val dctCos: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, y) => math.cos((2 * y + 1) * u * math.Pi / 64))

  def pHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None else Some(pHashOf(img))
  }

  /** pHash over an ALREADY-DECODED image — the decode-once feature
    * store computes dims, luminance and pHash from one `ImageIO.read`;
    * [[pHash]] is the bytes-in wrapper. */
  private[operators] def pHashOf(img: java.awt.image.BufferedImage): Long = {
    val n = 32
    val scaled = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, n, n, null)
    } finally g.dispose()
    val gray = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val rgb = scaled.getRGB(x, y)
        gray(y)(x) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    // 2D DCT-II, low 8×8 block only (64 of 1024 coefficients), computed
    // SEPARABLY with a precomputed cosine table: rows first
    // (tmp[u][x] = Σ_y C[u][y]·gray[y][x], 8×32×32 mults), then columns
    // (dct[u][v] = Σ_x tmp[u][x]·C[v][x], 8×8×32) — ~10k multiplies and
    // zero cos() calls per image vs the naive form's 65k terms × 2
    // transcendental calls (measured 25 s → a few s for the sf0.1 dedup
    // query; this per-row kernel is the whole cost at corpus scale).
    val k = 8
    val tmp = Array.ofDim[Double](k, n)
    var u = 0
    while (u < k) {
      var x = 0
      while (x < n) {
        var sum = 0.0
        var yy = 0
        while (yy < n) {
          sum += dctCos(u)(yy) * gray(yy)(x)
          yy += 1
        }
        tmp(u)(x) = sum
        x += 1
      }
      u += 1
    }
    val dct = new Array[Double](k * k)
    u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        var sum = 0.0
        var xx = 0
        while (xx < n) {
          sum += tmp(u)(xx) * dctCos(v)(xx)
          xx += 1
        }
        dct(u * k + v) = sum
        v += 1
      }
      u += 1
    }
    val ac = dct.drop(1) // 63 AC coefficients; DC carries only brightness
    val sorted = ac.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var hash = 0L
    var i = 0
    while (i < 63) {
      if (ac(i) > median) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** LSH band geometry over a 64-bit hash: `windows` overlapping
    * windows of `windowBits` bits at wrapping offsets `step·b`
    * (step = 64/windows). Each bit lands in `cover = windowBits/step`
    * windows, so d flipped bits dirty ≤ cover·d windows and a clean
    * shared window is GUARANTEED while cover·d < windows, i.e.
    * d ≤ `guaranteedHamming`. Beyond that, recall is probabilistic
    * across the windows (PhashSpec pins a simulated floor).
    *
    * The dial (simulated recall for RANDOM d-flip placements):
    *   - default 16 windows × 12 bits (step 4, cover 3): guaranteed ≤5;
    *     d=6→0.997, d=8→0.94, d=10→0.79. Keyspace 2^12 — expected
    *     occupancy U/4096 per band for U DISTINCT hashes.
    *   - wide 8 windows × 16 bits (step 8, cover 2): guaranteed ≤3;
    *     d=4→0.987, d=6→0.80, d=10→0.30. Keyspace 2^16 — the choice
    *     for extreme distinct-hash cardinality (occupancy U/65536),
    *     trading high-d recall for 16× later `maxBucket` onset.
    * Either way candidate pairs are bounded by windows·U·maxBucket.
    */
  final case class BandGeometry(windows: Int, windowBits: Int) {
    require(64 % windows == 0, s"windows must divide 64: $windows")
    val step: Int = 64 / windows
    require(windowBits % step == 0 && windowBits <= 32,
      s"windowBits must be a multiple of step=$step and ≤32: $windowBits")
    val cover: Int = windowBits / step
    /** Largest d with a clean shared window guaranteed (cover·d < windows). */
    val guaranteedHamming: Int = (windows - 1) / cover
    private val mask = (1L << windowBits) - 1
    /** Band key `b` — JVM twin of [[keyCol]]; PhashSpec pins agreement. */
    def key(ph: Long, b: Int): Long = {
      val off = b * step
      ((ph >>> off) | (ph << (64 - off))) & mask
    }
    /** Column twin of [[key]] — THE expression the production band join
      * runs ((ph >>> off | ph << 64-off) & mask, a window wrapping past
      * bit 63; Java shift semantics (n mod 64) make the off=0 case
      * exact).
      */
    def keyCol(ph: Column, b: Int): Column = {
      val off = b * step
      shiftrightunsigned(ph, off)
        .bitwiseOR(shiftleft(ph, 64 - off))
        .bitwiseAND(lit(mask))
    }
  }

  /** Default geometry: 16 overlapping 12-bit windows — guaranteed
    * recall at Hamming ≤5, ~0.79 at the default maxHamming=10. */
  val defaultBands: BandGeometry = BandGeometry(16, 12)

  /** Wide-window geometry for extreme distinct-hash cardinality. */
  val wideBands: BandGeometry = BandGeometry(8, 16)

  /** Near-duplicate image pairs by pHash Hamming distance ≤ `maxHamming`.
    * The media column is decoded ONCE per row (mapPartitions, like every
    * decoder here); everything downstream runs on 64-bit keys only — see
    * [[phashPairsFromHashes]] for the candidate-generation geometry.
    */
  def phashPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 10, maxBucket: Int = 200): DataFrame = {
    import df.sparkSession.implicits._
    // Materialize: the hash frame feeds multiple consumers (exact-equal
    // grouping + both sides of the band self-join), and without it each
    // consumer re-runs the full decode + DCT pipeline (AQE exchange
    // reuse does not always fire across aliases) — the decode is the
    // dominant cost, so running it N times N-tuples the query.
    val hashed = graft.operators.Materialize(
      df.select(col(idCol).cast("long").as("id"),
          col(mediaCol).cast("binary").as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, m) => pHash(m).map(h => (id, h)) })
        .toDF("id", "ph"))
    phashPairsFromHashes(hashed, maxHamming, maxBucket, defaultBands)
  }

  /** Candidate generation + verification over a pre-hashed `(id, ph)`
    * frame — the unit the property specs drive directly (synthetic
    * hashes, no decode cost).
    *
    * Two paths, unioned:
    *
    * EXACT-EQUAL (Hamming 0): a direct `groupBy(ph)`. Groups of size
    * 2..`maxBucket` emit all pairs (occupancy-bounded self-join, ≤
    * N·maxBucket candidates); larger groups — a constant image repeated
    * a million times at corpus scale — emit STAR pairs to the min-id
    * representative instead: linear in group size, and downstream
    * component resolution (DedupResolve) sees the identical connected
    * components. Exact duplicates therefore can NEVER silently vanish,
    * which the pre-r7 band-only scheme allowed (a flooded bucket dropped
    * the whole group).
    *
    * BANDED (Hamming ≥ 1): overlapping wrapping windows per
    * [[BandGeometry]] (default 16×12-bit: guaranteed recall at ≤5
    * flips, simulated ~0.79 at d=10 for random placements — the dial
    * and its trade-offs live on the geometry's scaladoc) over the
    * DISTINCT hash values — one band row per distinct pHash, so
    * exact-duplicate floods contribute ONE unit of bucket occupancy
    * and cannot flood a band. Adversarial flip placements past the
    * guarantee (e.g. flips spaced to dirty every window) are
    * deterministically missed — callers needing a hard guarantee
    * should set `maxHamming ≤ geometry.guaranteedHamming`. `maxBucket`
    * drops degenerate buckets (≥ maxBucket DISTINCT hashes sharing a
    * window — a near-constant band region), same guard as the MinHash /
    * SimHash joins in TextDedup; candidate pairs are bounded by
    * windows·U·maxBucket regardless of input skew (PhashSpec asserts
    * the bound on a pathological corpus).
    *
    * Hash-level pairs rejoin to doc ids at the end; a hash pair with
    * m and n exact copies fans out to m·n doc pairs — inherent to the
    * all-pairs output contract, not to the candidate generation.
    */
  def phashPairsFromHashes(hashed: DataFrame,
      maxHamming: Int = 10, maxBucket: Int = 200,
      geometry: BandGeometry = defaultBands): DataFrame = {
    // ---- exact-equal path ------------------------------------------
    val groups = hashed.groupBy("ph")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("grp_n"))
    val withN = hashed.join(groups, Seq("ph"))
    val smallG = withN.filter(col("grp_n") > 1 && col("grp_n") <= maxBucket)
    val exactSmall = smallG.as("a").join(smallG.as("b"),
        col("a.ph") === col("b.ph") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(0L).as("hamming"))
    val exactLarge = withN
      .filter(col("grp_n") > maxBucket && col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"), lit(0L).as("hamming"))
    // ---- banded path over DISTINCT hashes --------------------------
    val uniq = graft.operators.Materialize(groups.select(col("ph")))
    val bands = uniq.select(col("ph"),
        explode(array((0 until geometry.windows).map(b =>
          struct(lit(b).as("b"), geometry.keyCol(col("ph"), b).as("key"))): _*)).as("bd"))
      .select(col("ph"), col("bd.b").as("b"), col("bd.key").as("key"))
    val bounded = bands.join(
      bands.groupBy("b", "key").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1 && col("bucket_n") <= maxBucket),
      Seq("b", "key"))
    val hashPairs = bounded.as("a").join(bounded.as("b"),
        col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
        col("a.ph") < col("b.ph"))
      .select(col("a.ph").as("ph_a"), col("b.ph").as("ph_b"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") =!= 0L && col("hamming") <= maxHamming)
    val banded = hashPairs
      .join(hashed.select(col("ph").as("ph_a"), col("id").as("ida")), Seq("ph_a"))
      .join(hashed.select(col("ph").as("ph_b"), col("id").as("idb")), Seq("ph_b"))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"), col("hamming"))
    exactSmall.unionByName(exactLarge).unionByName(banded)
  }
}
