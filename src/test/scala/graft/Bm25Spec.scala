package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** BM25 relevance + TF-IDF keywords: hand-computed quantized-rational
  * values (the same arithmetic the p64/p65 oracles replay in SQL),
  * model-reuse equivalence, and tie-break determinism. */
class Bm25Spec extends SparkTestBase {

  private def docs4 = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry apple"),
      (4L, "date")).toDF("doc_id", "text")
  }

  test("bm25Gate: hand-computed quantized values (N=4, S=10)") {
    // k1=6/5, b=3/4: tfq = floor(1e6·22·S·tf/(10·S·tf+3·S+9·dl·N)),
    // idfq = floor(1e6·(2N+1−2df)/(2df+1)); contribution tfq·idfq.
    val out = TextAnalysis.bm25Gate(docs4, Seq("apple", "date"))
    assertProduces(out, Seq(
      Seq(1L, 1L, BigDecimal(1301775000000L).bigDecimal), // apple tf=2 dl=3
      Seq(2L, 0L, null), // no query term present
      Seq(3L, 1L, BigDecimal(802919000000L).bigDecimal), // apple tf=1 dl=4
      Seq(4L, 1L, BigDecimal(3092368558233L).bigDecimal))) // date: idf 7/3
  }

  test("bm25Train + bm25Score equals the fused gate; model stats exact") {
    val m = TextAnalysis.bm25Train(docs4)
    assert(m.nDocs == 4L && m.totalTokens == 10L)
    val dfMap = m.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMap == Map("apple" -> 2L, "banana" -> 2L, "cherry" -> 2L,
      "date" -> 1L))
    val scored = TextAnalysis.bm25Score(m, docs4, Seq("apple", "date"))
    val gate = TextAnalysis.bm25Gate(docs4, Seq("apple", "date"))
    assertProduces(scored, gate.collect().toSeq.map(_.toSeq))
  }

  test("bm25Merge: training is a monoid over disjoint batches") {
    val a = docs4.filter(col("doc_id") <= 2L)
    val b = docs4.filter(col("doc_id") > 2L)
    val merged = TextAnalysis.bm25Merge(
      TextAnalysis.bm25Train(a), TextAnalysis.bm25Train(b))
    val full = TextAnalysis.bm25Train(docs4)
    assert(merged.nDocs == full.nDocs &&
      merged.totalTokens == full.totalTokens)
    assertProduces(merged.df, full.df.collect().toSeq.map(_.toSeq))
    // and scoring through the merged model is identical
    val q = Seq("apple", "date")
    assertProduces(TextAnalysis.bm25Score(merged, docs4, q),
      TextAnalysis.bm25Score(full, docs4, q).collect().toSeq.map(_.toSeq))
  }

  test("bm25Score: query terms are case-folded and deduped") {
    val m = TextAnalysis.bm25Train(docs4)
    val a = TextAnalysis.bm25Score(m, docs4, Seq("APPLE", "apple", "Date"))
    val b = TextAnalysis.bm25Score(m, docs4, Seq("apple", "date"))
    assertProduces(a, b.collect().toSeq.map(_.toSeq))
  }

  test("bm25: rarer term outranks a commoner term at equal tf/dl") {
    import spark.implicits._
    // "rare" appears in 1 doc, "common" in 3; probe docs have equal shape
    val corpus = Seq(
      (1L, "rare filler"), (2L, "common filler"), (3L, "common filler"),
      (4L, "common filler")).toDF("doc_id", "text")
    val m = TextAnalysis.bm25Train(corpus)
    val rel = TextAnalysis.bm25Score(m, corpus, Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    assert(rel(1L).compareTo(rel(2L)) > 0,
      s"rare-term doc should score higher: ${rel(1L)} vs ${rel(2L)}")
  }

  test("tfidfTopTerms: hand-computed scores, k bound, rank order") {
    import spark.implicits._
    val docs = Seq((1L, "a a b c"), (2L, "b c"), (3L, "c"))
      .toDF("doc_id", "text")
    // N=3: idfq(a)=2000000 (df1), idfq(b)=1333333 (df2), idfq(c)=1000000
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2)
    assertProduces(out, Seq(
      Seq(1L, 1L, "a", BigDecimal(4000000L).bigDecimal),
      Seq(1L, 2L, "b", BigDecimal(1333333L).bigDecimal),
      Seq(2L, 1L, "b", BigDecimal(1333333L).bigDecimal),
      Seq(2L, 2L, "c", BigDecimal(1000000L).bigDecimal),
      Seq(3L, 1L, "c", BigDecimal(1000000L).bigDecimal)))
  }

  test("tfidfTopTerms: score ties break by term ascending") {
    import spark.implicits._
    val docs = Seq((1L, "zeta alpha"), (2L, "zeta alpha")).toDF("doc_id", "text")
    val ranks = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .filter(col("doc_id") === 1L)
      .orderBy("rank").collect().map(_.getString(2)).toSeq
    assert(ranks == Seq("alpha", "zeta"))
  }

  test("tfidfTopTerms: empty-token docs yield no rows; k=1 truncates") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "   "), (3L, "!!!"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 1).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.length == 1 && out.head.getLong(1) == 1L)
  }
}
