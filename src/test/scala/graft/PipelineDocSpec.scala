package graft

import org.apache.spark.sql.functions._

/** docs/PIPELINE.md's recipes, compiled and executed verbatim — the
  * guide cannot rot while this suite is green. Each test is one doc
  * section; the code inside mirrors the fenced block 1:1 (inputs are
  * shrunk to keep the suite fast; the operators don't care). */
class PipelineDocSpec extends SparkTestBase {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").limit(80).cache()
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(64).cache()
  private lazy val events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet").limit(500).cache()

  private def freshRoot(tag: String): String = {
    val p = s"/tmp/graft_docspec_${tag}_${java.util.UUID.randomUUID()}"
    graft.streaming.Streams.deleteRecursivelyNoFollow(p)
    p
  }

  test("§1 quality gating + text analysis") {
    import graft.pipeline.TextAnalysis
    val annotated = TextAnalysis.annotate(docs)
    val gated = annotated
      .filter(col("quality.stopword_ratio") > 0.05 && col("lang_pred") === "en")
      .withColumn("text",
        TextAnalysis.piiScrub(TextAnalysis.normalizeText(col("text"))))
    assert(annotated.columns.contains("fingerprint"))
    assert(gated.count() <= annotated.count())
  }

  test("§2 deduplication") {
    import graft.pipeline.Dedup
    val exact = Dedup.exact(docs)
    val survivors = Dedup.nearDupDedup(docs, threshold = 0.8)
    val audit = Dedup.dedupAudit(docs, threshold = 0.8)
    val cands = Dedup.minhashCandidates(docs)
    val pairs = Dedup.jaccardVerify(cands, docs, threshold = 0.8)
    assert(exact.count() > 0 && survivors.count() > 0)
    assert(audit.count() == docs.count())
    assert(pairs.count() <= cands.count())
  }

  test("§3 decontamination") {
    import graft.pipeline.Dedup
    val evalDocs = docs.limit(5)
    val train = docs
    val report = Dedup.ngramOverlapReport(train, evalDocs, n = 8)
    val cleanN = Dedup.ngramDecontaminate(train, evalDocs, n = 8)
    val clean = Dedup.decontaminate(train, evalDocs, threshold = 0.8)
    val grams = Dedup.evalGramSet(evalDocs, n = 8)
    val reused = Dedup.ngramOverlapReport(train, grams, 8, "text", "doc_id")
    assert(report.count() == train.count() && reused.count() == train.count())
    assert(cleanN.count() < train.count()) // eval ⊆ train: hits guaranteed
    assert(clean.count() < train.count())
  }

  test("§4 similarity search / ANN") {
    import graft.pipeline.Similarity
    val probes = emb.limit(4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val exactKnn = Similarity.bruteForceKnn(emb, probes, k = 10)
    val approx = Similarity.ivfKnn(emb, probes, k = 10, cells = 4, nProbe = 2)
    val recall = Similarity.recallAtK(approx, exactKnn, k = 10)
    assert(exactKnn.count() == 4 * 10)
    assert(recall.count() == 4)
  }

  test("§5 similarity graph analytics") {
    import graft.pipeline.Graph
    val ranked = Graph.similarityRank(docs)
    val comms = Graph.similarityCommunities(docs)
    assert(ranked.count() == docs.count() && comms.count() == docs.count())
  }

  test("§6 tokenizers") {
    import graft.pipeline.{Bpe, Unigram}
    val merges = Bpe.train(docs, numMerges = 8)
    val withTokens = docs.select(col("doc_id"),
      Bpe.encode(merges, col("text")).as("pieces"))
    val vocab = Bpe.vocabulary(merges, docs)
    val ids = Bpe.encodeIds(merges, vocab, docs)
    val uni = Unigram.train(docs, vocabSize = 200)
    assert(merges.nonEmpty && withTokens.count() == docs.count())
    assert(ids.count() == docs.count() && vocab.count() > 0)
    assert(uni.count() > 0 && uni.count() <= 200)
  }

  test("§7 sampling, mixtures, packing") {
    import graft.pipeline.TextAnalysis
    val mix = TextAnalysis.mixtureSample(docs, Map("web" -> 2, "wiki" -> 1))
    val splits = TextAnalysis.stratifiedSplit(docs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val packed = TextAnalysis.packTokens(docs, budget = 2048)
    val shards = TextAnalysis.shuffleShards(docs, shards = 4)
    assert(mix.count() <= 3)
    assert(splits.count() == docs.count() && packed.count() == docs.count())
    assert(shards.select("shard").distinct().count() <= 4)
  }

  test("§8 sketches + profiling") {
    import graft.operators.{Check, Profile, Sketches}
    val distinct = docs.agg(Sketches.kmvEstimate(
      Sketches.kmv(Sketches.md5Hash61(col("text")), k = 256), k = 256))
    val profile = Profile.profile(docs, Seq("doc_id", "text"))
    val report = Check.check(docs,
      Seq(Check.NotNull("doc_id"), Check.InRange("doc_id", 0, 1e12)))
    assert(distinct.head().getDouble(0) > 0)
    assert(profile.count() == 2)
    assert(report.collect().forall(r =>
      r.getString(0) == "rows" || r.getLong(1) == 0L))
  }

  test("§9 dataset lifecycle") {
    import graft.operators.{Check, Publish}
    val root = freshRoot("lifecycle")
    try {
      val inDir = s"$root/in"; val outDir = s"$root/out"
      docs.repartition(8).write.parquet(inDir)
      Publish.compact(spark, inDir, outDir,
        targetBytes = 128L << 20, sortCols = Seq("doc_id"))
      val pubRoot = s"$root/pub"
      val r = Publish.publish(docs, pubRoot, version = 1L,
        Seq(Check.NotNull("doc_id")))
      val serving = Publish.current(spark, pubRoot)
      assert(r.published && serving.count() == docs.count())
      assert(Publish.expireVersions(spark, pubRoot, keepLast = 2).isEmpty)
      // streaming face: per-batch WAP + fold/expire retention
      val bRoot = s"$root/batches"
      assert(Publish.publishBatch(docs, bRoot, 0L, Seq(Check.NotNull("doc_id"))))
      val fold = Publish.foldBatches(spark, bRoot)
      assert(fold.published &&
        Publish.expireBatches(spark, bRoot) == Seq(0L))
      assert(Publish.readCommitted(spark, bRoot).get.count() == docs.count())
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("§10 snapshots + layout") {
    import graft.operators.Snapshot
    import graft.sources.ZOrder
    val cur = docs.withColumn("version", lit(0L))
    val delta = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("version", lit(1L))
    val next = Snapshot.upsert(cur, delta, Seq("doc_id"), "version")
    val changes = Snapshot.diff(cur, next, Seq("doc_id"))
    val hist = Snapshot.history(cur.unionByName(delta), Seq("doc_id"), "version")
    val laid = ZOrder.zorderBy(events, "user_id", "value", partitions = 16)
    assert(next.count() == docs.count())
    assert(changes.count() == delta.count())
    assert(hist.count() >= docs.count() && laid.count() == events.count())
  }
}
