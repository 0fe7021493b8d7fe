package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB pretraining
  * pipeline actually runs — heuristic quality gate → language gate →
  * near-dup dedup — as one operator. Each stage is the already-audited
  * primitive ([[TextAnalysis.qualityScore]], [[TextAnalysis.langId]],
  * [[Dedup.nearDupDedup]]), so the whole pipeline remains replicable by
  * the SQL oracle end-to-end.
  */
object Curate {

  /** Gate + dedup. Keeps documents that pass the length/punctuation/
    * stopword heuristics AND are predicted `lang`, then keeps one
    * representative per near-dup cluster. Returns (doc_id, lang, source). */
  def curate(
      docs: DataFrame,
      lang: String = "en",
      minChars: Long = 100L,
      maxPunctRatio: Double = 0.2,
      minStopwordRatio: Double = 0.01,
      jaccardThreshold: Double = 0.6): DataFrame = {
    val q = TextAnalysis.qualityScore(col("text"))
    // materialize the gate ONCE: the dedup stage references the gated
    // corpus several times (signatures, shingle sets, survivor assembly)
    // and the gate's language/quality expressions are the expensive part —
    // a stage boundary, exactly where a production pipeline persists
    val gated = docs
      .withColumn("_q", q)
      .withColumn("_lang", TextAnalysis.langId(col("text")))
      .filter(col("_q.n_chars") >= minChars &&
        col("_q.punct_ratio") <= maxPunctRatio &&
        col("_q.stopword_ratio") >= minStopwordRatio &&
        col("_lang") === lang)
      .drop("_q", "_lang")
      .transform(graft.Stage.materialize)
    Dedup.nearDupDedup(gated, threshold = jaccardThreshold)
      .select("doc_id", "lang", "source")
  }

  /** The round-7 "modern stack" composition: classifier quality gate →
    * bigram-LM fluency gate → exact dedup → deterministic
    * shuffle-to-shards. Every stage is hash-exact
    * ([[TextAnalysis.classifierScore]] logit fold,
    * [[TextAnalysis.lmGate]] quantized mean, md5 dedup,
    * [[TextAnalysis.shuffleShards]] layout), so the END-TO-END output —
    * which docs survive AND where each lands in the training order — is
    * replicated by the p48 oracle. Stage boundaries materialize where a
    * production run would persist: after the scalar gates (the LM gate
    * re-reads the gated corpus to train counts) and after dedup (the
    * shard window re-reads survivors). Returns
    * (doc_id, shard, pos, lm_score). */
  def curateModern(
      docs: DataFrame,
      clfWeights: Array[Double],
      clfBias: Double,
      lmThreshold: Double,
      shards: Int,
      seed: String = "curate"): DataFrame = {
    val gated = docs
      .withColumn("_c", TextAnalysis.classifierScore(col("text"), clfWeights, clfBias))
      .filter(col("_c.keep")).drop("_c")
      .transform(graft.Stage.materialize)
    val fluent = TextAnalysis.lmGate(gated)
      .filter(col("lm_score") >= lmThreshold)
      .select(col("doc_id"), col("lm_score"))
      .join(gated, "doc_id") // re-attach text for the dedup hash
    val unique = Dedup.exactRows(fluent)
      .transform(graft.Stage.materialize)
    TextAnalysis.shuffleShards(unique, shards, seed = seed)
      .select(col("doc_id"), col("shard"), col("pos"), col("lm_score"))
  }
}
