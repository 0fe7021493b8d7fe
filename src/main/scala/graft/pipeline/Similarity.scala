package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  * Brute-force cosine top-k as the exact baseline; deterministic
  * random-hyperplane LSH bucketing as the 100 TB scale path (candidates
  * per bucket instead of the full cross product).
  * All arithmetic is Column expressions (`zip_with`/`aggregate`) — no UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns — HOF fallback; the knn paths
    * use the native codegen expression [[graft.functions.DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — HOF fallback (see [[graft.functions.CosineSim]]
    * for the codegen path used by the knn operators). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (greatest(norm(a), lit(1e-12)) * greatest(norm(b), lit(1e-12)))

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed in a long.
    * Plane components are deterministic in (plane, dim) via splitmix64 —
    * stable across runs and partitions (joinable bucket keys). Tight-loop
    * kernel (HOF lambdas are interpreted; see BASELINE.md). */
  private val hyperplaneKernel = udf((emb: Seq[Float], planes: Int) => {
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < emb.length) {
        // component in [-1, 1) from the top 53 bits of the mix
        val h = mix64(p.toLong * 0x9E3779B97F4A7C15L + i)
        proj += emb(i) * ((h >>> 11) * (1.0 / (1L << 52)) - 1.0)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  })

  def hyperplaneSignature(emb: Column, planes: Int = 12): Column =
    hyperplaneKernel(emb, lit(planes))

  /** Exact brute-force cosine top-k: every probe against every corpus row
    * (broadcast the probes — they are the small side), then window top-k.
    * This is the correctness baseline and the right plan when probes are
    * few: one pass over the corpus, no shuffle of the corpus itself. */
  def bruteForceKnn(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int = 10,
      corpusId: String = "vec_id",
      probeId: String = "probe_id",
      embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(embCol).as("c_emb"))
    val p = probes.select(col(probeId).as("probe_id"), col(embCol).as("p_emb"))
    val scored = c.crossJoin(broadcast(p))
      .withColumn("cosine", graft.functions.VectorExpressions.cosine(
        corpus.sparkSession, col("c_emb"), col("p_emb")))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: probes only compare against corpus
    * vectors sharing their hyperplane bucket (optionally ± multi-probe on
    * neighboring buckets via single-bit flips). The scale path: bucket
    * count grows with data, per-bucket work stays bounded. */
  def lshKnn(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int = 10,
      planes: Int = 8,
      multiProbeBits: Int = 1,
      corpusId: String = "vec_id",
      probeId: String = "probe_id",
      embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(embCol).as("c_emb"),
      hyperplaneSignature(col(embCol), planes).as("bucket"))
    val sig = hyperplaneSignature(col(embCol), planes)
    // multi-probe: original bucket plus single-bit flips
    val probeBuckets = array(
      (sig +: (0 until (if (multiProbeBits > 0) planes else 0))
        .map(b => sig.bitwiseXOR(shiftleft(lit(1L), b)))): _*)
    val p = probes.select(col(probeId).as("probe_id"), col(embCol).as("p_emb"),
      explode(probeBuckets).as("bucket"))
    val scored = c.join(p, "bucket")
      .withColumn("cosine", graft.functions.VectorExpressions.cosine(
        corpus.sparkSession, col("c_emb"), col("p_emb")))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "corpus_id", "cosine", "rank")
      .distinct()
  }

  /** IVF-style coarse quantization without a trained codebook: cells are
    * hyperplane buckets at two resolutions (coarse for routing, fine for
    * ranking) — a deterministic stand-in for k-means centroids that keeps
    * the same plan shape (route → per-cell scan → top-k). */
  def ivfKnn(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int = 10,
      coarsePlanes: Int = 6,
      corpusId: String = "vec_id",
      probeId: String = "probe_id",
      embCol: String = "embedding"): DataFrame =
    lshKnn(corpus, probes, k, coarsePlanes, multiProbeBits = 1,
      corpusId, probeId, embCol)
}
