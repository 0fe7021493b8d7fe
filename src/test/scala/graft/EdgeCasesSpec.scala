package graft

import graft.operators.Sketches
import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge inputs the synthetic test corpus never produces: null text,
  * empty corpora, single documents. A library operator must degrade to
  * empty/zero results — never throw, never emit phantom rows. */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val withNulls = Seq(
    (1L, "some real text here with several words to work on"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "   "),
    (5L, "some real text here with several words to work on") // dup of 1
  ).toDF("doc_id", "text")

  private lazy val empty = withNulls.filter(col("doc_id") < 0)

  test("dedup operators survive null/blank text") {
    // exact: null and blank hash like any value; dup pair 1/5 collapses
    val ex = Dedup.exact(withNulls)
    assert(ex.count() == 4)
    assert(Dedup.exactRows(withNulls).count() == 4)
    val cands = Dedup.minhashCandidates(withNulls, k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((1L, 5L))) // null/empty docs emit no signatures
    val survivors = Dedup.nearDupDedup(withNulls, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 3L, 4L))
    val stats = Dedup.duplicateSpanStats(withNulls, n = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(stats(2L) == (0L, 0L) && stats(3L) == (0L, 0L))
    assert(stats(1L)._2 > 0) // the duplicated doc is fully covered
    val excised = Dedup.exciseDuplicateSpans(withNulls, n = 6)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(excised(2L) == "" && excised(3L) == "")
    assert(excised(1L).nonEmpty && excised(5L).isEmpty) // canonical kept, copy excised
  }

  test("dedup operators survive an empty corpus") {
    assert(Dedup.exact(empty).count() == 0)
    assert(Dedup.minhashCandidates(empty).count() == 0)
    assert(Dedup.nearDupDedup(empty).count() == 0)
    assert(Dedup.duplicateSpanStats(empty).count() == 0)
    assert(Dedup.exciseDuplicateSpans(empty).count() == 0)
    assert(Dedup.incrementalCandidates(empty, empty).count() == 0)
    assert(Dedup.components(
      empty.select(col("doc_id").as("id_a"), col("doc_id").as("id_b"))).count() == 0)
    assert(Dedup.componentsStar(
      empty.select(col("doc_id").as("id_a"), col("doc_id").as("id_b"))).count() == 0)
  }

  test("incremental candidates with empty delta or empty corpus") {
    val corpus = withNulls.filter(col("doc_id") <= 4)
    val delta = withNulls.filter(col("doc_id") === 5)
    assert(Dedup.incrementalCandidates(corpus, empty).count() == 0)
    val onlyDelta = Dedup.incrementalCandidates(empty, withNulls)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(onlyDelta == Set((1L, 5L))) // delta-delta pairs still found
    val cross = Dedup.incrementalCandidates(corpus, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == Set((1L, 5L)))
  }

  test("embedding near-dup survives empty and null-embedding inputs") {
    import graft.pipeline.Similarity
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDup(emptyEmb).count() == 0)
    // null embeddings: signature kernel nulls out, bucket null joins to
    // nothing via the inner self-join — no pairs, no throw
    val someNull = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(someNull, planes = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // IVF split on a tiny corpus: fewer rows than cells — seed centroids
    // cap at |corpus|, self-match still rank 1
    val tiny = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cb = Similarity.kmeansCentroids(tiny, cells = 8)
    val knn = Similarity.ivfKnnWithIndex(Similarity.ivfIndex(tiny, cb), cb,
      tiny.select(col("vec_id").as("probe_id"), col("embedding")), k = 1, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knn == Set((1L, 1L), (2L, 2L)))
  }

  test("text analysis operators survive null/blank text and empty corpora") {
    val rr = TextAnalysis.rareTokenRatio(withNulls, minFreq = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(rr(2L) == (0L, 0.0) && rr(3L) == (0L, 0.0) && rr(4L) == (0L, 0.0))
    assert(TextAnalysis.rareTokenRatio(empty).count() == 0)
    val ch = TextAnalysis.chunkTokens(withNulls, size = 4, overlap = 1, minTokens = 2)
    assert(!ch.select("doc_id").as[Long].collect().exists(Set(2L, 3L, 4L)))
    assert(TextAnalysis.chunkTokens(empty).count() == 0)
    assert(TextAnalysis.mixtureWeights(
      empty.withColumn("source", lit("s"))).count() == 0)
    // canonicalizeUrl propagates null rather than throwing
    val u = Seq((1L, null.asInstanceOf[String])).toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).collect().head
    assert(u.isNullAt(0))
  }

  test("round-7 curation ops survive null/blank text and empty corpora") {
    import graft.pipeline.Bpe
    // LM gate: null/blank docs keep their row with no bigrams and a
    // null score; real text scores; empty corpus -> empty result
    val lm = TextAnalysis.lmGate(withNulls).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(lm(2L) == 0L && lm(3L) == 0L && lm(4L) == 0L && lm(1L) > 0L)
    assert(TextAnalysis.lmGate(empty).count() == 0)
    // a model trained on null-ridden docs still scores a clean batch
    val model = TextAnalysis.lmTrain(withNulls)
    assert(TextAnalysis.lmScore(model,
      Seq((9L, "some words")).toDF("doc_id", "text")).count() == 1)
    // shuffle-to-shards: nulls shard like any doc (hash of the id, not
    // the text); positions stay dense; empty corpus -> empty
    val sh = TextAnalysis.shuffleShards(withNulls, shards = 4).collect()
    assert(sh.length == 5)
    assert(TextAnalysis.shuffleShards(empty, shards = 4).count() == 0)
    intercept[IllegalArgumentException] {
      TextAnalysis.shuffleShards(withNulls, shards = 0) }
    // importance sampling: null weight never keeps; empty corpus ok
    val kept = TextAnalysis.importanceSample(
      withNulls, when(col("doc_id") === 2L, lit(null)).otherwise(lit(1.0)))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
    assert(TextAnalysis.importanceSample(empty, lit(1.0)).count() == 0)
    // BPE: null/blank text encodes to an empty token array; training on
    // null-ridden docs uses only the real tokens; empty corpus -> no merges
    val enc = withNulls.select(col("doc_id"),
        Bpe.encode(Seq("s" -> "o"), col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(2L).isEmpty && enc(3L).isEmpty && enc(4L).isEmpty)
    assert(enc(1L).contains("so"))
    assert(Bpe.train(withNulls, numMerges = 2).nonEmpty)
    assert(Bpe.train(empty, numMerges = 2).isEmpty)
  }

  test("sketches survive empty input and null hashes") {
    val sk = empty.agg(Sketches.kmv(Sketches.md5Hash61(col("text")), 8))
      .collect().head.getSeq[Long](0)
    assert(sk.isEmpty)
    val est = empty
      .agg(Sketches.kmvEstimate(Sketches.kmv(Sketches.md5Hash61(col("text")), 8), 8))
      .collect().head.getDouble(0)
    assert(est == 0.0)
    // null text hashes to null and is skipped, not counted
    val withNull = withNulls
      .agg(Sketches.kmv(Sketches.md5Hash61(col("text")), 8))
      .collect().head.getSeq[Long](0)
    assert(withNull.length == 3) // "", "   " -> "" after trim? distinct non-null texts
  }

  test("bm25/tfidf survive null/blank text and empty corpora") {
    // null/blank docs keep a row in the gate (n_hits 0, rel null)
    val gated = TextAnalysis.bm25Gate(withNulls, Seq("real", "words"))
    assert(gated.count() == 5)
    val noHit = gated.filter(col("doc_id").isin(2L, 3L, 4L)).collect()
    assert(noHit.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
    // empty corpus: model trains to (0 docs, 0 tokens), gate yields 0 rows
    val m0 = TextAnalysis.bm25Train(empty)
    assert(m0.nDocs == 0L && m0.totalTokens == 0L && m0.df.count() == 0L)
    assert(TextAnalysis.bm25Score(m0, empty, Seq("x")).count() == 0L)
    // scoring a NONEMPTY corpus with an empty-corpus model: no df rows,
    // so every doc comes back unscored rather than throwing
    val cold = TextAnalysis.bm25Score(m0, withNulls, Seq("real"))
    assert(cold.count() == 5 && cold.filter(col("n_hits") > 0).count() == 0)
    // query terms absent from the corpus: all rows, no hits
    val miss = TextAnalysis.bm25Gate(withNulls, Seq("zzz_nonexistent"))
    assert(miss.count() == 5 && miss.filter(col("n_hits") > 0).count() == 0)
    // tfidf: null/blank docs vanish; k beyond the distinct-term count
    // returns every term once, still rank-contiguous
    val top = TextAnalysis.tfidfTopTerms(withNulls, k = 1000)
    assert(top.filter(col("doc_id").isin(2L, 3L, 4L)).count() == 0)
    val perDoc = top.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(perDoc.nonEmpty && perDoc.forall(r => r.getLong(1) == r.getLong(2)))
    assert(TextAnalysis.tfidfTopTerms(empty, k = 3).count() == 0)
  }

  test("dataCard: exact metrics on a hand corpus, nulls counted as dups") {
    val card = TextAnalysis.dataCard(
      withNulls.withColumn("lang", lit("en")).withColumn("source",
        when(col("doc_id") <= 2L, "s1").otherwise("s2")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") == 5L && card("n_sources") == 2L &&
      card("n_langs") == 1L)
    // doc5 duplicates doc1; doc2's null text also counts (no content)
    assert(card("exact_dup_docs") == 2L)
    assert(card("total_tokens") == 20L) // 10 + 10 from the twin docs
    assert(card("mean_doc_tokens_q6") == 4000000L) // 20/5 at 1e6 quanta
  }

  test("cluster sampling and bloom decontamination survive degenerate shapes") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // more cells than the quota could ever need: quota larger than any
    // cell returns every vector exactly once
    val all = Similarity.clusterBalancedSample(emb, cells = 4,
      perCell = 1000000, seed = "e")
    assert(all.count() == emb.filter(col("embedding").isNotNull).count())
    // empty eval suite: nothing collides, train survives intact, and the
    // bloom path agrees with the broadcast path on the degenerate filter
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalEmpty = docs.filter(col("doc_id") < 0)
    assert(Dedup.decontaminate(docs, evalEmpty,
      broadcastEval = false).count() == docs.count())
  }
}
