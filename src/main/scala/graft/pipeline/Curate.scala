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
}
