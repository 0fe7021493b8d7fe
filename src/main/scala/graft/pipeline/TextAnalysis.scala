package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Column expressions (codegen'd, no UDFs in the hot path) —
  * designed to run over O(100 TB) of documents.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count approximation: GPT-style pre-tokenizer regex —
    * words, numbers, punctuation runs — without a vocab. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:s|t|re|ve|m|ll|d)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"), lit(0)))

  /** Characters per token — a cheap fertility/quality proxy. */
  def charsPerToken(text: Column): Column =
    length(text).cast("double") / greatest(tokenCount(text), lit(1))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")

  /** Quality-score struct: length, token count, punctuation ratio, stopword
    * ratio, mean word length, uppercase ratio. Heuristics in the spirit of
    * C4/Gopher quality filtering. */
  def qualityScore(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val nTok = greatest(size(toks), lit(1))
    val stopHits = size(array_intersect(toks, array(stopwords.map(lit): _*)))
    struct(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      (length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        greatest(length(text), lit(1))).as("punct_ratio"),
      (stopHits.cast("double") / nTok).as("stopword_ratio"),
      ((length(text).cast("double") - size(toks) + 1) / nTok).as("mean_word_len"),
      (length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
        greatest(length(text), lit(1))).as("upper_ratio"))
  }

  private val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sie", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "una", "por", "con", "para"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "per", "non", "sono", "con"))

  /** n-gram/stopword-heuristic language ID: the language whose stopword set
    * hits the most tokens wins; ties and zero hits → "und" (undetermined).
    * Pure Column expression — scales linearly, no shuffle. */
  def langId(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\W+")
    val scored = langStopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(
        size(array_intersect(array_distinct(toks), array(sw.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Rolling-hash document fingerprint over normalized tokens —
    * whitespace/case-insensitive near-identity fingerprint. Polynomial
    * rolling hash mod 2^61-1 over md5-lower-64 token hashes (order
    * sensitive): acc ← (acc·1000003 + h61(tok)) mod M. Every step is
    * replicable in DuckDB (`list_reduce` over `md5_number_lower`), so the
    * oracle checks fingerprints bit-for-bit; see [[graft.pipeline.Md5]].
    * BigInt only guards the 61×20-bit product — ~100 tokens/doc, cold
    * path. `fingerprintFast` keeps the chained-xxhash64 Column variant. */
  def fingerprint(text: Column): Column = fingerprintKernel(text)

  private val fingerprintKernel = udf { (text: String) =>
    val md = Md5.newDigest()
    val M = BigInt(Md5.M61)
    var acc = BigInt(0)
    if (text != null)
      text.trim.toLowerCase.split("\\s+").foreach { t =>
        acc = (acc * 1000003 + BigInt(Md5.lower64(md, t) & Md5.M61)) % M
      }
    acc.toLong
  }

  /** Chained-xxhash64 fingerprint (pure Column expression, codegen'd) —
    * the throughput variant when oracle replication is not needed. */
  def fingerprintFast(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    aggregate(toks, lit(1125899906842597L), (acc, t) => xxhash64(acc, t))
  }

  /** Convenience: annotate a documents DataFrame with the full suite. */
  def annotate(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("token_count", tokenCount(t))
      .withColumn("bpeish_tokens", bpeishTokenCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
