package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata structs. The Spark-side machinery — schema,
  * batch iteration, partition sizing, frame-sample explode — is real and
  * tested; the codec calls themselves are STUBBED with deterministic fakes
  * (image/audio libraries are not in this container). Swap the `...Stub`
  * internals for real decoders (e.g. javax.imageio / ffmpeg bindings) in a
  * production image.
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

  /** Attach decoded metadata struct to a binary column. */
  def withMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("meta", decodeMetaUdf(col(binCol), lit(mediaType)))

  private val featuresUdf = udf((b: Array[Byte]) => featuresStub(b))

  /** Attach an embedding-like feature vector (array<float>). */
  def withFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("features", featuresUdf(col(binCol)))

  private val resizeUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeStub(b, w, h))

  /** Resize/thumbnail a binary image column. */
  def resized(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("resized", resizeUdf(col(binCol), lit(w), lit(h)))

  /** Batched feature extraction — the Scala analog of a Pandas UDF over
    * `mapInPandas`: the expensive codec/model is initialized ONCE per
    * partition and rows are processed in `batchSize` groups (exactly why
    * mapInPandas exists — amortizing per-call setup over a batch). The
    * stub "model" is [[featuresStub]]; swap the `init`/`infer` pair for a
    * real decoder+model in production. Output schema = input + features. */
  def withFeaturesBatched(df: DataFrame, binCol: String,
      batchSize: Int = 64): DataFrame = {
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

  /** Frame sampling: one output row per sampled frame index — the explode
    * pattern a video pipeline needs. Frame extraction itself is the stub
    * (byte slice); the row multiplication, index bookkeeping, and even
    * partition-size behavior are the real thing. */
  def frameSample(df: DataFrame, binCol: String, everyNthFrame: Int,
      fps: Int = 30): DataFrame = {
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
