package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB path: hash-partitioned group-bys, band-bucketed candidate
  * generation instead of all-pairs, and pure Column expressions end-to-end.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per exact content hash. One shuffle
    * on the 128-bit content hash; no window over the full data. */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    df.select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Exact dedup returning the surviving rows (all columns). */
  def exactRows(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Character shingles of length n as a distinct array (Column-only). */
  def charShingles(text: Column, n: Int = 5): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    array_distinct(
      transform(sequence(lit(0), greatest(length(norm) - n, lit(0))),
        i => norm.substr(i + 1, lit(n))))
  }

  /** Word shingles (w-grams) as a distinct array. */
  def wordShingles(text: Column, w: Int = 3): Column = {
    val toks = split(trim(lower(text)), "\\W+")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - w, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
  }

  /** MinHash signature: k independent permutation-minima via seeded
    * xxhash64 over the shingle set. Returns array<bigint> of length k. */
  def minhashSignature(shingles: Column, k: Int = 128): Column =
    array((0 until k).map(seed =>
      array_min(transform(shingles, s => xxhash64(s, lit(seed))))): _*)

  /** LSH banding: split the k-length signature into `bands` bands and hash
    * each; docs sharing any (band_idx, band_hash) are candidates.
    * Returns (idCol, band, band_hash) — one row per band. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    val sig = col(sigCol)
    val k = df.selectExpr(s"size($sigCol)").head().getInt(0)
    require(k % bands == 0, s"signature length $k not divisible by $bands bands")
    val r = k / bands
    val bandStructs = array((0 until bands).map(b =>
      struct(lit(b).as("band"), xxhash64(slice(sig, b * r + 1, r)).as("band_hash"))): _*)
    df.select(col(idCol), explode(bandStructs).as("b"))
      .select(col(idCol), col("b.band"), col("b.band_hash"))
  }

  /** MinHash+LSH near-dup candidate pairs: shingle → minhash → band →
    * bucket self-join. The self-join happens per (band, band_hash) bucket —
    * never all-pairs. Emits (id_a, id_b) with id_a < id_b, distinct. */
  def minhashCandidates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 64,
      bands: Int = 16,
      shingleWords: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol),
      minhashSignature(wordShingles(col(textCol), shingleWords), k).as("sig"))
    val banded = lshBands(sigs, idCol, "sig", bands)
    val l = banded.toDF("id_a", "band", "band_hash")
    val r = banded.toDF("id_b", "band", "band_hash")
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate pairs: join shingle sets
    * back in and compute |∩|/|∪| with array expressions. */
  def jaccardVerify(
      candidates: DataFrame, // (id_a, id_b)
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleWords: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      wordShingles(col(textCol), shingleWords).as("_sh"))
    candidates
      .join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over tokens: per-bit weighted sign sum of token hashes.
    * Column-only: for each bit, count tokens with that bit set vs total. */
  def simhash(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    val n = size(hashes)
    // bit b of the simhash = 1 iff #tokens with bit b set > n/2
    val bits = (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1L).cast("int"))
      when(cnt * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: bucket on rotated 16-bit blocks (docs
    * within Hamming distance d share at least one of 4 blocks for d ≤ 3),
    * verify exact Hamming distance within buckets. */
  def simhashCandidates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    val withSh = df.select(col(idCol), simhash(col(textCol)).as("sh"))
    val blocks = array((0 until 4).map(i =>
      struct(lit(i).as("blk"),
        shiftright(col("sh"), i * 16).bitwiseAND(0xFFFFL).as("blk_val"))): _*)
    val bucketed = withSh.select(col(idCol), col("sh"), explode(blocks).as("b"))
      .select(col(idCol), col("sh"), col("b.blk"), col("b.blk_val"))
    val l = bucketed.toDF("id_a", "sh_a", "blk", "blk_val")
    val r = bucketed.toDF("id_b", "sh_b", "blk", "blk_val")
    l.join(r, Seq("blk", "blk_val"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** Embedding cosine near-dup: LSH-bucket by random-hyperplane signs
    * (deterministic seeded planes), verify exact cosine within buckets. */
  def embeddingNearDup(
      df: DataFrame,
      embCol: String = "embedding",
      idCol: String = "vec_id",
      planes: Int = 12,
      threshold: Double = 0.95): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col(embCol), planes)
    val sigs = df.select(col(idCol), col(embCol), sigCol.as("bucket"))
    val l = sigs.toDF("id_a", "emb_a", "bucket")
    val r = sigs.toDF("id_b", "emb_b", "bucket")
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }
}
