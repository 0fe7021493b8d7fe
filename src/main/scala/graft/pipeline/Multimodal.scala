package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata structs. The Spark-side machinery — schema,
  * batch iteration, partition sizing, frame-sample explode — is real and
  * tested. IMAGES decode for real through `javax.imageio` (in the JDK:
  * PNG/JPEG/BMP/GIF — [[withImageMeta]], [[imageFeatures]],
  * [[resizedImage]]), WAV/AIFF/AU audio through `javax.sound`
  * ([[withAudioMeta]], [[audioFeatures]]), and multi-frame animated GIFs
  * through ImageIO's sequence reader ([[withAnimationMeta]],
  * [[gifFrameSample]] — real frame-accurate sampling). Only true video
  * codecs (h264/vp9; no ffmpeg in this container) remain STUBBED with
  * deterministic fakes behind the same plumbing — swap the `...Stub`
  * internals for real bindings in a production image.
  */
object Multimodal {

  /** Typed metadata carried alongside every multimodal binary column. */
  final case class MediaMeta(media_type: String, width: Int, height: Int,
      channels: Int, duration_ms: Long)

  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  /** Read any directory of files as (path, modificationTime, length,
    * content:binary) — the standard multimodal ingestion source. */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  /** Every stub-backed entry point routes through this loud gate: the
    * deterministic fakes exist to exercise the Spark-side plumbing
    * (schema, batching, explode shapes) where no codec library can, and
    * must never be mistaken for decoding — callers opt in with
    * `stub = true` or get pointed at the real path. */
  private def requireStub(stub: Boolean, method: String, real: String): Unit =
    require(stub,
      s"Multimodal.$method is STUB-backed (deterministic fake, no real " +
        s"decoding); pass stub = true to opt in, or use the real path: $real")

  // ------------------------------------------------------------ STUBS
  // Deterministic fakes: metadata derived from a stable hash of the bytes,
  // so tests are reproducible and the pipeline shape is real.

  /** STUB decode: in production this parses the container header. */
  private def decodeMetaStub(bytes: Array[Byte], mediaType: String): MediaMeta = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
    MediaMeta(mediaType, 64 + math.abs(h % 1920), 64 + math.abs((h >> 8) % 1080),
      3, (math.abs(h.toLong) % 600000L) + 1000L)
  }

  /** STUB feature extraction: 8 deterministic floats from byte statistics.
    * Production: a real embedding model over decoded pixels/samples. */
  private def featuresStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0f)
    val groups = bytes.grouped(math.max(1, bytes.length / 8)).take(8).toArray
    groups.padTo(8, Array.emptyByteArray)
      .map(g => if (g.isEmpty) 0f else g.map(_ & 0xFF).sum.toFloat / (g.length * 255f))
  }

  /** STUB resize: production re-encodes pixels; the fake truncates bytes
    * proportionally, preserving the batch/plumbing semantics. */
  private def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    if (bytes == null) null
    else bytes.take(math.max(16, math.min(bytes.length, w * h / 64)))

  // -------------------------------------------------- Spark-side plumbing

  private val decodeMetaUdf = udf((b: Array[Byte], mt: String) =>
    if (b == null) null else decodeMetaStub(b, mt))

  /** Attach decoded metadata struct to a binary column. STUB-backed:
    * requires the explicit `stub = true` opt-in; the real paths are
    * [[withImageMeta]], [[withAudioMeta]], [[withAnimationMeta]],
    * [[withVideoMeta]]. */
  def withMeta(df: DataFrame, binCol: String, mediaType: String,
      stub: Boolean = false): DataFrame = {
    requireStub(stub, "withMeta",
      "withImageMeta / withAudioMeta / withAnimationMeta / withVideoMeta")
    df.withColumn("meta", decodeMetaUdf(col(binCol), lit(mediaType)))
  }

  private val featuresUdf = udf((b: Array[Byte]) => featuresStub(b))

  /** Attach an embedding-like feature vector (array<float>).
    * STUB-backed (explicit opt-in); real paths: [[imageFeatures]],
    * [[audioFeatures]]. */
  def withFeatures(df: DataFrame, binCol: String,
      stub: Boolean = false): DataFrame = {
    requireStub(stub, "withFeatures", "imageFeatures / audioFeatures")
    df.withColumn("features", featuresUdf(col(binCol)))
  }

  private val resizeUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeStub(b, w, h))

  /** Resize/thumbnail a binary column. STUB-backed (explicit opt-in);
    * real path: [[resizedImage]]. */
  def resized(df: DataFrame, binCol: String, w: Int, h: Int,
      stub: Boolean = false): DataFrame = {
    requireStub(stub, "resized", "resizedImage")
    df.withColumn("resized", resizeUdf(col(binCol), lit(w), lit(h)))
  }

  /** Batched feature extraction — the Scala analog of a Pandas UDF over
    * `mapInPandas`: the expensive codec/model is initialized ONCE per
    * partition and rows are processed in `batchSize` groups (exactly why
    * mapInPandas exists — amortizing per-call setup over a batch). The
    * stub "model" is [[featuresStub]]; swap the `init`/`infer` pair for a
    * real decoder+model in production. Output schema = input + features. */
  def withFeaturesBatched(df: DataFrame, binCol: String,
      batchSize: Int = 64, stub: Boolean = false): DataFrame = {
    requireStub(stub, "withFeaturesBatched", "withImageFeaturesBatched")
    val schema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val out = df.mapPartitions { rows =>
      // per-partition init (production: load codec / model weights here)
      val infer: Array[Array[Byte]] => Array[Array[Float]] =
        batch => batch.map(featuresStub)
      rows.grouped(batchSize).flatMap { batch =>
        val feats = infer(batch.map(_.getAs[Array[Byte]](binIdx)).toArray)
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out
  }

  // ------------------------------------------------- REAL image decoding
  // javax.imageio ships with the JDK — no external libraries needed.

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** REAL image metadata: decode the container header + pixels via
    * ImageIO. Unparseable bytes yield null (route them to a trap/side
    * output upstream). duration_ms is 0 for stills. */
  private val imageMetaUdf = udf { (bytes: Array[Byte]) =>
    val img = readImage(bytes)
    if (img == null) null
    else MediaMeta("image", img.getWidth, img.getHeight,
      img.getColorModel.getNumComponents, 0L)
  }

  def withImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", imageMetaUdf(col(binCol)))

  /** REAL pixel features: [mean R, mean G, mean B, luminance mean,
    * luminance variance, aspect ratio, log10 area, edge-ness proxy
    * (mean |horizontal gradient|)] — deterministic, model-free, the shape
    * an embedding slot takes. */
  private def imageFeaturesOf(bytes: Array[Byte]): Array[Float] = {
    val img = readImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0; var grad = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      var prevLum = 0.0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        val lum = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += lum; sl2 += lum * lum
        if (x > 0) grad += math.abs(lum - prevLum)
        prevLum = lum
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val lumMean = sl / n
    Array(
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      (lumMean / 255.0).toFloat,
      (math.sqrt(math.max(0.0, sl2 / n - lumMean * lumMean)) / 255.0).toFloat,
      (w.toDouble / h).toFloat,
      math.log10(n).toFloat,
      (grad / math.max(1.0, (w - 1).toDouble * h) / 255.0).toFloat)
  }

  private val imageFeaturesUdf = udf((b: Array[Byte]) => imageFeaturesOf(b))

  def imageFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("features", imageFeaturesUdf(col(binCol)))

  /** 64-bit perceptual hash (the DCT pHash): luminance → 32×32
    * area-average downsample → separable 2D DCT-II → top-left 8×8
    * low-frequency block → bit = coefficient > median of the 64.
    * Stable under re-encoding, resizing, and mild photometric edits, so
    * near-duplicate images land within a few Hamming bits — feed the
    * (id, phash) table to [[graft.pipeline.Dedup.hammingCandidates]]
    * for corpus-scale image near-dup with the same block-bucket +
    * hot-bucket-guard machinery as text simhash. Deterministic pure-JVM
    * math (decode itself is JVM-only, so this family is spec-verified
    * rather than oracle-replayed — the COVERAGE.md multimodal
    * contract). Null for undecodable bytes. */
  private[graft] def pHashOf(bytes: Array[Byte]): java.lang.Long = {
    val img = readImage(bytes)
    if (img == null) return null
    val n = 32
    val w = img.getWidth; val h = img.getHeight
    val lum = Array.ofDim[Double](n, n)
    var cy = 0
    while (cy < n) {
      val y0 = cy * h / n; val y1 = math.max((cy + 1) * h / n, y0 + 1)
      var cx = 0
      while (cx < n) {
        val x0 = cx * w / n; val x1 = math.max((cx + 1) * w / n, x0 + 1)
        var s = 0.0; var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        lum(cy)(cx) = s / ((y1 - y0).toDouble * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    // separable DCT-II; only the first 8 output rows/cols are needed
    val cos = Array.tabulate(8, n)((k, x) =>
      math.cos(math.Pi * k * (2 * x + 1) / (2.0 * n)))
    val tmp = Array.ofDim[Double](8, n) // rows transformed
    var k = 0
    while (k < 8) {
      var x = 0
      while (x < n) {
        var s = 0.0; var j = 0
        while (j < n) { s += cos(k)(j) * lum(j)(x); j += 1 }
        tmp(k)(x) = s; x += 1
      }
      k += 1
    }
    val coeffs = new Array[Double](64)
    var ky = 0
    while (ky < 8) {
      var kx = 0
      while (kx < 8) {
        var s = 0.0; var j = 0
        while (j < n) { s += tmp(ky)(j) * cos(kx)(j); j += 1 }
        coeffs(ky * 8 + kx) = s; kx += 1
      }
      ky += 1
    }
    val sorted = coeffs.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L; var i = 0
    while (i < 64) {
      if (coeffs(i) > median) bits |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bits)
  }

  private val pHashUdf = udf((b: Array[Byte]) => pHashOf(b))

  /** Adds `phash` (64-bit DCT perceptual hash; null = undecodable). */
  def imagePHash(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("phash", pHashUdf(col(binCol)))

  /** REAL resize: decode → bilinear-scaled redraw → re-encode (png). */
  private val resizeImageUdf = udf { (bytes: Array[Byte], w: Int, h: Int) =>
    val img = readImage(bytes)
    if (img == null) null
    else {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  def resizedImage(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("resized", resizeImageUdf(col(binCol), lit(w), lit(h)))

  /** Batched REAL image features through the per-partition-init pattern
    * ([[withFeaturesBatched]]'s shape with the live decoder wired in). */
  def withImageFeaturesBatched(df: DataFrame, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition init point (production: model weights load here;
      // ImageIO itself is stateless)
      val infer: Array[Array[Byte]] => Array[Array[Float]] =
        batch => batch.map(imageFeaturesOf)
      rows.grouped(batchSize).flatMap { batch =>
        val feats = infer(batch.map(_.getAs[Array[Byte]](binIdx)).toArray)
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // -------------------------------------------- REAL audio decoding (WAV)
  // javax.sound.sampled ships with the JDK: WAV/AIFF/AU parse without any
  // audio device (stream decoding only — headless-safe).

  /** REAL audio metadata for WAV/AIFF/AU bytes: sample rate ride in
    * `width`, bits-per-sample in `height`, true channel count, duration
    * from frame length / frame rate. Unparseable bytes yield null. */
  private val audioMetaUdf = udf { (bytes: Array[Byte]) =>
    if (bytes == null || bytes.isEmpty) null
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val durMs =
          if (in.getFrameLength > 0 && f.getFrameRate > 0)
            (in.getFrameLength * 1000.0 / f.getFrameRate).toLong
          else 0L
        MediaMeta("audio", f.getSampleRate.toInt, f.getSampleSizeInBits,
          f.getChannels, durMs)
      } finally in.close()
    } catch { case _: Exception => null }
  }

  def withAudioMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", audioMetaUdf(col(binCol)))

  /** REAL PCM features for 16-bit WAV: [RMS level, mean, peak, zero
    * crossing rate, duration s, sample rate / 48k, channels, log10
    * frames] — deterministic signal statistics from the decoded samples. */
  private def audioFeaturesOf(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16) return null
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = raw.length / 2
        if (n == 0) return null
        var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
        var prev = 0.0
        var i = 0
        while (i < n) {
          val s = bb.getShort(i * 2) / 32768.0
          sum += s; sq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
          prev = s
          i += 1
        }
        val frames = n / f.getChannels
        Array(
          math.sqrt(sq / n).toFloat, (sum / n).toFloat, peak.toFloat,
          (zc.toDouble / n).toFloat,
          (frames / f.getFrameRate.toDouble).toFloat,
          (f.getSampleRate / 48000.0).toFloat,
          f.getChannels.toFloat,
          math.log10(math.max(1, frames).toDouble).toFloat)
      } finally in.close()
    } catch { case _: Exception => null }
  }

  private val audioFeaturesUdf = udf((b: Array[Byte]) => audioFeaturesOf(b))

  def audioFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("features", audioFeaturesUdf(col(binCol)))

  /** 64-bit audio fingerprint (the Haitsma–Kalker shape): mono
    * samples → 33 equal TIME segments × 2 energy bands (mean magnitude
    * = low band, mean first-difference magnitude = high band) → bit =
    * "this band's energy rises into the next segment". Gain-invariant
    * by construction (a positive gain scales both sides of every
    * comparison) and sample-rate-robust (segments are time-
    * proportional), so re-encoded / re-leveled / resampled copies of a
    * clip land within a few Hamming bits — feed the (id, afp) table to
    * [[graft.pipeline.Dedup.hammingCandidates]] for corpus-scale audio
    * near-dup, the same machinery as text simhash and image pHash.
    * Null for undecodable, non-16-bit, or <33-frame clips. */
  private[graft] def audioFingerprintOf(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16) return null
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val ch = f.getChannels
        val frames = raw.length / 2 / ch
        if (frames < 33) return null
        val mono = new Array[Double](frames)
        var i = 0
        while (i < frames) {
          var s = 0.0; var c = 0
          while (c < ch) { s += bb.getShort((i * ch + c) * 2) / 32768.0; c += 1 }
          mono(i) = s / ch
          i += 1
        }
        val segs = 33
        val lo = new Array[Double](segs); val hi = new Array[Double](segs)
        var g = 0
        while (g < segs) {
          val a = g * frames / segs
          val b = math.max((g + 1) * frames / segs, a + 1)
          var sl = 0.0; var sh = 0.0; var j = a
          while (j < b && j < frames) {
            sl += math.abs(mono(j))
            if (j > a) sh += math.abs(mono(j) - mono(j - 1))
            j += 1
          }
          lo(g) = sl / (b - a); hi(g) = sh / math.max(1, b - a - 1)
          g += 1
        }
        var bits = 0L
        var s2 = 0
        while (s2 < 32) {
          if (lo(s2 + 1) > lo(s2)) bits |= 1L << (2 * s2)
          if (hi(s2 + 1) > hi(s2)) bits |= 1L << (2 * s2 + 1)
          s2 += 1
        }
        java.lang.Long.valueOf(bits)
      } finally in.close()
    } catch { case _: Exception => null }
  }

  private val audioFpUdf = udf((b: Array[Byte]) => audioFingerprintOf(b))

  /** Adds `afp` (64-bit audio fingerprint; null = undecodable). */
  def audioFingerprint(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("afp", audioFpUdf(col(binCol)))

  // ------------------------- REAL animation decoding (multi-frame GIF)
  // ImageIO's GIF plugin (in the JDK) exposes every frame of an animated
  // GIF plus its per-frame GraphicControlExtension delay — the frame
  // sampling path is REAL end-to-end for this container. True video
  // codecs (h264/vp9) still need external bindings and stay stubbed.

  private def withGifReader[A](bytes: Array[Byte])(
      f: (javax.imageio.ImageReader, Int) => A): A = {
    if (bytes == null || bytes.isEmpty) return null.asInstanceOf[A]
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        // the no-reader return must still close iis (per-row UDF calls on
        // non-image bytes would otherwise accumulate stream/cache leaks)
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null.asInstanceOf[A]
        val reader = readers.next()
        reader.setInput(iis)
        try f(reader, reader.getNumImages(true))
        finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => null.asInstanceOf[A] }
  }

  /** REAL animation metadata: frame count rides in the `channels` slot,
    * first-frame dimensions in width/height, and duration_ms sums each
    * frame's GIF delay (centiseconds → ms). Unparseable bytes → null. */
  private val animMetaUdf = udf { (bytes: Array[Byte]) =>
    withGifReader(bytes) { (reader, n) =>
      val first = reader.read(0)
      var durMs = 0L
      var i = 0
      while (i < n) {
        val tree = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val gce = tree.getElementsByTagName("GraphicControlExtension")
        if (gce.getLength > 0) {
          val d = gce.item(0).asInstanceOf[org.w3c.dom.Element]
            .getAttribute("delayTime")
          if (d.nonEmpty) durMs += d.toLong * 10L
        }
        i += 1
      }
      MediaMeta("animation", first.getWidth, first.getHeight, n, durMs)
    }
  }

  def withAnimationMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", animMetaUdf(col(binCol)))

  /** REAL frame sampling over animated GIFs: one row per sampled frame,
    * each re-encoded as PNG with its true dimensions. Frames are the raw
    * stored patches (GIF inter-frame patches are not composited — fine
    * for dedup/feature use; compositing is a renderer concern). */
  private val gifFramesUdf = udf { (bytes: Array[Byte], everyNth: Int) =>
    withGifReader(bytes) { (reader, n) =>
      (0 until n by math.max(1, everyNth)).map { i =>
        val img = reader.read(i)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (i, bos.toByteArray, img.getWidth, img.getHeight)
      }
    }
  }

  def gifFrameSample(df: DataFrame, binCol: String, everyNthFrame: Int = 1): DataFrame =
    df.withColumn("_f", explode(gifFramesUdf(col(binCol), lit(everyNthFrame))))
      .select(df.columns.toIndexedSeq.map(col) :+ col("_f._1").as("frame_idx")
        :+ col("_f._2").as("frame_png") :+ col("_f._3").as("frame_w")
        :+ col("_f._4").as("frame_h"): _*)

  // ------------------- REAL video decoding (MJPEG-in-AVI, pure JVM)
  // AVI is RIFF: 'RIFF'<size>'AVI ' then LIST/plain chunks. The 'avih'
  // header (inside the 'hdrl' LIST) carries frame timing + dimensions;
  // MJPEG stores each video frame as an independent JPEG inside the
  // 'movi' LIST's '00dc'/'00db' chunks — which ImageIO's JDK JPEG
  // plugin decodes. So this one true video container is decodable with
  // zero external libraries; h264/vp9-class codecs remain the explicit
  // stub boundary (COVERAGE.md).

  private[graft] final case class AviInfo(usPerFrame: Long, totalFrames: Int,
      width: Int, height: Int, frames: IndexedSeq[(Int, Int)])

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF tree; null for anything that isn't a parseable AVI.
    * Package-visible so AviPropSpec can fuzz it directly (any byte
    * input must parse or return null — never throw). */
  private[graft] def parseAvi(bytes: Array[Byte]): AviInfo = {
    if (bytes == null || bytes.length < 12 ||
      fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return null
    try {
      var usPerFrame = 0L; var totalFrames = 0; var w = 0; var h = 0
      val frames = IndexedSeq.newBuilder[(Int, Int)]
      def walk(start: Int, end: Int, depth: Int): Unit = {
        // depth cap: real AVI nests ~3 deep (RIFF > hdrl/movi > rec );
        // an adversarial file of thousands of nested LIST headers would
        // otherwise StackOverflowError — an Error, NOT caught by the
        // Exception handler below, killing the task and breaking the
        // parse-or-null contract (AviPropSpec pins deep nesting)
        if (depth > 32) return
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(bytes, p)
          val size = u32le(bytes, p + 4).toInt
          val dataOff = p + 8
          // a u32 size >= 2^31 goes negative through toInt; without this
          // guard size = -8 would keep p stationary — an infinite loop on
          // adversarial bytes (AviPropSpec pins the case)
          if (size < 0) return
          if (dataOff + size > bytes.length) return // truncated: stop cleanly
          if (id == "LIST" || id == "RIFF") {
            walk(dataOff + 4, dataOff + size, depth + 1) // skip the 4-byte list type
          } else if (id == "avih" && size >= 40) {
            usPerFrame = u32le(bytes, dataOff)
            totalFrames = u32le(bytes, dataOff + 16).toInt
            w = u32le(bytes, dataOff + 32).toInt
            h = u32le(bytes, dataOff + 36).toInt
          } else if ((id.endsWith("dc") || id.endsWith("db")) &&
            id.take(2).forall(_.isDigit) && size > 0) {
            frames += ((dataOff, size))
          }
          p = dataOff + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, bytes.length, 0)
      val fr = frames.result()
      if (fr.isEmpty && totalFrames == 0) null
      else AviInfo(usPerFrame, if (totalFrames > 0) totalFrames else fr.length,
        w, h, fr)
    } catch { case _: Exception => null }
  }

  /** REAL video metadata for MJPEG-in-AVI: dimensions from the avih
    * header, frame count in the `channels` slot (the [[withAnimationMeta]]
    * convention), duration from frames × µs-per-frame. Non-AVI bytes →
    * null (trap upstream). */
  private val videoMetaUdf = udf { (bytes: Array[Byte]) =>
    val info = parseAvi(bytes)
    if (info == null) null
    else MediaMeta("video", info.width, info.height, info.frames.length,
      info.totalFrames.toLong * info.usPerFrame / 1000L)
  }

  def withVideoMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", videoMetaUdf(col(binCol)))

  /** REAL frame sampling over MJPEG-in-AVI: every Nth stored frame,
    * JPEG-decoded via ImageIO and re-encoded PNG with true dimensions —
    * the same output shape as [[gifFrameSample]], so downstream
    * dedup/feature stages are container-agnostic. */
  private val aviFramesUdf = udf { (bytes: Array[Byte], everyNth: Int) =>
    val info = parseAvi(bytes)
    if (info == null) null
    else (0 until info.frames.length by math.max(1, everyNth)).flatMap { i =>
      // a frame chunk holding truncated/non-JPEG bytes must skip, not
      // kill the job — ImageIO.read can THROW (not just return null) on
      // malformed JPEG streams, so the decode is Try-wrapped per frame
      scala.util.Try {
        val (off, len) = info.frames(i)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len))
        if (img == null) None
        else {
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Some((i, bos.toByteArray, img.getWidth, img.getHeight))
        }
      }.toOption.flatten
    }
  }

  def aviFrameSample(df: DataFrame, binCol: String, everyNthFrame: Int = 1): DataFrame =
    df.withColumn("_f", explode(aviFramesUdf(col(binCol), lit(everyNthFrame))))
      .select(df.columns.toIndexedSeq.map(col) :+ col("_f._1").as("frame_idx")
        :+ col("_f._2").as("frame_png") :+ col("_f._3").as("frame_w")
        :+ col("_f._4").as("frame_h"): _*)

  /** Per-frame perceptual hashes for a video column: sample every Nth
    * decoded MJPEG-in-AVI frame ([[aviFrameSample]], the real decoder)
    * and pHash each — one row per (id, frame_idx, phash). A video's
    * near-dup signature is its frame-hash multiset: re-encoded or
    * re-muxed copies share almost every frame hash (jaccard the sets,
    * or route these rows straight into
    * [[graft.pipeline.Dedup.hammingCandidates]] keyed on
    * (video, frame) to find frame-level matches across a corpus).
    * Completes the near-dup triad's video corner on the same Hamming
    * engine. Undecodable frames yield null phash rows (filter or trap
    * downstream). */
  def videoFramePHashes(df: DataFrame, binCol: String,
      everyNthFrame: Int = 1): DataFrame =
    aviFrameSample(df, binCol, everyNthFrame)
      .withColumn("phash", pHashUdf(col("frame_png")))
      .drop("frame_png", "frame_w", "frame_h")

  /** Frame sampling: one output row per sampled frame index — the explode
    * pattern a video pipeline needs. Frame extraction itself is the stub
    * (byte slice); the row multiplication, index bookkeeping, and even
    * partition-size behavior are the real thing. For a REAL container
    * path use [[aviFrameSample]] (MJPEG-in-AVI) or [[gifFrameSample]]. */
  def frameSample(df: DataFrame, binCol: String, everyNthFrame: Int,
      fps: Int = 30, stub: Boolean = false): DataFrame = {
    requireStub(stub, "frameSample", "aviFrameSample / gifFrameSample")
    val meta = decodeMetaUdf(col(binCol), lit("video"))
    val frameCount = (meta("duration_ms") / 1000.0 * fps).cast("int")
    val idx = explode(sequence(lit(0), greatest(frameCount - 1, lit(0)),
      lit(everyNthFrame)))
    val sliceUdf = udf((b: Array[Byte], i: Int) =>
      if (b == null || b.isEmpty) Array.emptyByteArray
      else { val off = i % math.max(1, b.length - 16); b.slice(off, off + 16) })
    df.withColumn("frame_idx", idx)
      .withColumn("frame", sliceUdf(col(binCol), col("frame_idx")))
  }
}
