package graft

import graft.dsl._
import graft.ops.Ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicate lineitem 10× (~6M rows) to /tmp and compare
  * per-row throughput against sf0.1 — the "would this survive a 100×
  * scale-up" sanity check, run manually per round. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = "/tmp/graft_scale/lineitem10x.parquet"
    if (!new java.io.File(big).exists()) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      (1 to 10).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .repartition(32).write.mode("overwrite").parquet(big)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warmup
    spark.read.parquet(big).count()

    def q1(src: String) = query("?f", "?s", "?sum", "?cnt")(
      parquet(src)("_", "_", "_", "_", "?q", "_", "_", "_", "?f", "?s", "_"),
      Ops.sumDec()("?q") :> "?sum", Ops.count() :> "?cnt")
    def topk(src: String) = query("?ok", "?top")(
      parquet(src)("?ok", "_", "_", "_", "_", "_", "_", "_", "_", "_", "?sd"),
      Ops.limit(2)("?sd") :> "?top").sorted("?sd")

    time("q1-style agg @600k")(q1("/root/testdata/sf0.1/lineitem.parquet").toDF(spark).count())
    time("q1-style agg @6M")(q1(big).toDF(spark).count())
    time("per-group top-k @600k")(topk("/root/testdata/sf0.1/lineitem.parquet").toDF(spark).count())
    time("per-group top-k @6M")(topk(big).toDF(spark).count())

    def topkHeap(src: String) = query("?ok", "?top")(
      parquet(src)("?ok", "_", "_", "_", "_", "_", "_", "_", "_", "_", "?sd"),
      Ops.limitHeap(2)("?sd") :> "?top").sorted("?sd")
    time("heap top-k @600k")(topkHeap("/root/testdata/sf0.1/lineitem.parquet").toDF(spark).count())
    time("heap top-k @6M")(topkHeap(big).toDF(spark).count())

    // adversarial shape for the window plan: 3 HUGE groups (2M rows each)
    // — the window must sort every row inside 3 partitions; the heap
    // aggregation keeps ≤2 per task per group
    def hugeGroupsWindow(src: String) = query("?f", "?top")(
      parquet(src)("_", "_", "_", "_", "_", "_", "_", "_", "?f", "_", "?sd"),
      Ops.limit(2)("?sd") :> "?top").sorted("?sd")
    def hugeGroupsHeap(src: String) = query("?f", "?top")(
      parquet(src)("_", "_", "_", "_", "_", "_", "_", "_", "?f", "_", "?sd"),
      Ops.limitHeap(2)("?sd") :> "?top").sorted("?sd")
    time("huge-group window top-k @6M")(hugeGroupsWindow(big).toDF(spark).count())
    time("huge-group heap top-k @6M")(hugeGroupsHeap(big).toDF(spark).count())
    time("huge-group salted top-k @6M") {
      query("?f", "?top")(
        parquet(big)("_", "_", "_", "_", "_", "_", "_", "_", "?f", "_", "?sd"),
        Ops.limitSalted(2, 32)("?sd") :> "?top").sorted("?sd").toDF(spark).count()
    }

    // near-dup dedup at 10x docs (50k): doc_ids offset per replica so the
    // replicas ARE mutual near-dups — candidate volume grows 10x too, the
    // adversarial direction for the band join
    val bigDocs = "/tmp/graft_scale/documents10x.parquet"
    if (!new java.io.File(bigDocs).exists()) {
      val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      (1 to 10).map(i => d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .repartition(32).write.mode("overwrite").parquet(bigDocs)
    }
    spark.read.parquet(bigDocs).count()
    time("neardup dedup @5k docs")(graft.pipeline.Dedup.nearDupDedup(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet"), threshold = 0.6).count())
    time("neardup dedup @50k docs")(graft.pipeline.Dedup.nearDupDedup(
      spark.read.parquet(bigDocs), threshold = 0.6).count())
    time("minhash candidates @50k docs")(graft.pipeline.Dedup.minhashCandidates(
      spark.read.parquet(bigDocs)).count())
    time("curate pipeline @5k docs")(graft.pipeline.Curate.curate(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")).count())
    time("curate pipeline @50k docs")(graft.pipeline.Curate.curate(
      spark.read.parquet(bigDocs)).count())

    // eager aggregation at 10× fact volume: lineitem replicated WITHOUT
    // offsetting orderkeys (~40 lineitems/order), so the per-orderkey
    // partial aggregation below the join shrinks the fact 40× before any
    // join input is built — the shape that wins when dims can't broadcast
    val bigSame = "/tmp/graft_scale/lineitem10x_samekeys.parquet"
    if (!new java.io.File(bigSame).exists()) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      (1 to 10).map(_ => li).reduce(_ unionAll _)
        .repartition(32).write.mode("overwrite").parquet(bigSame)
    }
    {
      val sf = "/root/testdata/sf0.1"
      def q3(li: String, withKeys: Boolean) = {
        def k(g: graft.logic.GenPred, vs: String*) =
          if (withKeys) uniqueOn(g, vs: _*) else g
        query("?seg", "?revenue", "?n")(
          k(parquet(s"$sf/customer.parquet")("?ck", "_", "_", "_", "?seg"), "?ck"),
          k(parquet(s"$sf/orders.parquet")("?ok", "?ck", "_", "_", "_", "_"), "?ok"),
          parquet(li)("?ok", "_", "_", "_", "_", "?ep", "?disc", "_", "_", "_", "_"),
          Ops.cmap(cs => cs(0) * (lit(1.0) - cs(1)))("?ep", "?disc") :> "?rev",
          Ops.sumDec(28, 8)("?rev") :> "?revenue",
          Ops.count() :> "?n")
      }
      time("q03 standard plan @6M fact")(q3(bigSame, withKeys = false).toDF(spark).count())
      time("q03 eager-agg plan @6M fact")(q3(bigSame, withKeys = true).toDF(spark).count())
    }

    // adversarial hot bucket: 10⁴ identical-boilerplate docs — uncapped,
    // each of the 16 band buckets would self-join to ~5·10⁷ pairs; the
    // guard emits 10⁴−1 star edges and the end-to-end dedup stays linear
    {
      import spark.implicits._
      val nBoiler = 10000
      val adversarial = (1 to nBoiler).map(i => (i.toLong,
        "subscribe to our newsletter for the latest updates and offers every week"))
        .toDF("doc_id", "text").repartition(32).localCheckpoint()
      time("adversarial boilerplate candidates @10k (capped)")(
        graft.pipeline.Dedup.minhashCandidates(adversarial, maxBucketSize = 256).count())
      time("adversarial boilerplate dedup @10k (capped)")(
        graft.pipeline.Dedup.nearDupDedup(adversarial, threshold = 0.8,
          maxBucketSize = 256).count())
    }

    // adversarial embedding hot bucket: 10⁴ identical embeddings (the
    // re-encoded-duplicate-image shape) — uncapped, one hyperplane bucket
    // would self-join to ~5·10⁷ pairs; the guard emits 10⁴−1 star edges
    {
      import spark.implicits._
      val one = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      val nVec = 10000
      val identical = (1 to nVec).map(i => (i.toLong, one))
        .toDF("vec_id", "embedding").repartition(32).localCheckpoint()
      time("adversarial embedding near-dup @10k identical (capped)")(
        graft.pipeline.Dedup.embeddingNearDup(identical, threshold = 0.999,
          maxBucketSize = 256).count())
      // SemDeDup hot cell: identical vectors make every centroid identical
      // and route all 10⁴ rows to cell 0 — the degenerate-cell worst case;
      // the guard must keep it linear (star edges), never a 5·10⁷ self-join
      val cb = graft.pipeline.Similarity.kmeansCentroids(identical, cells = 4, iters = 1)
      time("adversarial semantic dedup @10k identical (capped)")(
        graft.pipeline.Dedup.semanticDedup(identical, cb, threshold = 0.999,
          maxBucketSize = 256).count())
    }

    // round-3 curation operators at 10× docs: all should scale ~linearly
    {
      import graft.pipeline.TextAnalysis
      val bd = spark.read.parquet(bigDocs)
      // replicas offset doc_id by i*10^7: probe = the base-20 docs of
      // every replica (200 docs), corpus = the rest
      time("contamination @50k docs")(TextAnalysis.contamination(
        bd.filter(col("doc_id") % 10000000L >= 20),
        bd.filter(col("doc_id") % 10000000L < 20), n = 4).count())
      time("heavy hitters @50k docs")(graft.operators.FrequentItems.heavyHitters(
        bd.select(explode(split(col("text"), "\\s+")).as("tok")), "tok", 64).count())
      time("token packing @50k docs, 64 shards")(
        TextAnalysis.packTokens(bd, budget = 2048L, shards = 64).count())
      time("pii scrub @50k docs")(bd.select(
        TextAnalysis.piiScrub(col("text")).as("p")).filter(col("p.n_emails") >= 0).count())
    }

    // streaming secondary-sort buffer over HUGE groups (3 groups × 2M rows):
    // the group must stream through the buffer, never materialize — memory
    // stays flat, wall scales with the external sort
    def hugeBuffer(src: String) = {
      val firstLast = Ops.bufferSame(1) { it =>
        var first: Seq[Any] = null; var last: Seq[Any] = null
        while (it.hasNext) { val r = it.next(); if (first == null) first = r; last = r }
        if (first == null) Iterator.empty else Iterator(Seq(first.head), Seq(last.head))
      }
      query("?f", "?d")(
        parquet(src)("_", "_", "_", "_", "_", "_", "_", "_", "?f", "_", "?sd"),
        firstLast("?sd") :> "?d").sorted("?sd")
    }
    time("huge-group buffer @600k")(hugeBuffer("/root/testdata/sf0.1/lineitem.parquet").toDF(spark).count())
    time("huge-group buffer @6M")(hugeBuffer(big).toDF(spark).count())

    // round-4 operators at 10× volume: all linear plan shapes
    {
      import graft.pipeline.Dedup
      val sd = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val bd = spark.read.parquet(bigDocs)
      // span stats: gram stream is n× tokens; the replicas make every gram
      // globally duplicated (10 copies), the worst case for the join-back
      time("span-dedup stats @5k docs")(Dedup.duplicateSpanStats(sd, n = 6).count())
      time("span-dedup stats @50k docs")(Dedup.duplicateSpanStats(bd, n = 6).count())
      // incremental: last replica arrives as the delta against the other 9
      // — corpus×corpus pairs (the quadratic bulk) are never generated
      time("incremental candidates @45k corpus + 5k delta")(
        Dedup.incrementalCandidates(
          bd.filter(col("doc_id") < 100000000L),
          bd.filter(col("doc_id") >= 100000000L)).count())
      // KMV at 6M rows: the shuffle carries ≤ k longs per partition
      time("kmv distinct @6M rows")(spark.read.parquet(big)
        .groupBy("l_returnflag")
        .agg(graft.operators.Sketches.kmv(
          graft.operators.Sketches.md5Hash61(col("l_orderkey").cast("string")), 128))
        .count())
      // span excision and chunking at 10× docs: linear mapcat/join shapes
      time("span excision @50k docs")(Dedup.exciseDuplicateSpans(bd, n = 6).count())
      time("chunking @50k docs")(graft.pipeline.TextAnalysis.chunkTokens(
        bd, size = 16, overlap = 4, minTokens = 4).count())
      // bloom join at 6M fact rows vs a 20-supplier dim
      time("bloom-pruned join @6M fact")(
        graft.operators.BloomJoin.bloomJoin(
          spark.read.parquet(bigSame),
          spark.read.parquet("/root/testdata/sf0.1/supplier.parquet")
            .filter(col("s_nationkey") < 5)
            .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          Seq("l_suppkey")).count())
    }

    // incremental semantic pairs at 45k corpus + 5k delta (replicated
    // embeddings: every delta vector has 9 corpus twins, the adversarial
    // direction for pair volume): work is delta-proportional, the corpus
    // participates only through the persisted index + cell-stats rollup,
    // corpus×corpus is never generated
    {
      val bigEmb = "/tmp/graft_scale/embeddings10x.parquet"
      if (!new java.io.File(bigEmb).exists()) {
        val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .select("vec_id", "embedding")
        (1 to 10).map(i => e.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
          .reduce(_ unionAll _)
          .repartition(32).write.mode("overwrite").parquet(bigEmb)
      }
      val all = spark.read.parquet(bigEmb)
      val corpus = all.filter(col("vec_id") < 100000000L)
      val delta = all.filter(col("vec_id") >= 100000000L)
      val t0 = System.nanoTime()
      val cb = graft.pipeline.Similarity.kmeansCentroids(corpus, cells = 64, iters = 2)
      println(f"codebook train @45k vectors (64 cells, 2 iters): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val idxDir = "/tmp/graft_scale/ivf_index_45k.parquet"
      graft.pipeline.Similarity.ivfIndex(corpus, cb)
        .write.mode("overwrite").parquet(idxDir)
      val idx = spark.read.parquet(idxDir)
      val stats = graft.pipeline.Dedup.semanticCellStats(idx).localCheckpoint()
      time("incremental semantic pairs @45k corpus + 5k delta")(
        graft.pipeline.Dedup.incrementalSemanticPairs(idx, delta, cb,
          threshold = 0.999, corpusCellStats = Some(stats)).count())
    }

    // p06 drift A/B (round 6): VERDICT flagged p06_minhash_pairs at 1.26×
    // its baseline — is that the hot-bucket stats agg (the documented
    // skew-safety price) or the string band-key shuffle width (~80 chars
    // of rendered minhash values vs 8 bytes of xxhash64)? Four plans,
    // run twice each (cold + warm), sf0.1 docs — the p06 input.
    {
      import graft.pipeline.Dedup
      import org.apache.spark.sql.DataFrame
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def banded() = Dedup.bandedSignatures(docs, "text", "doc_id", 64, 16, 3)
      def hashKeys(b: DataFrame) =
        b.withColumn("band_key", xxhash64(col("band"), col("band_key")))
      def pairsOf(b: DataFrame, guard: Boolean): Long = {
        val bb = b.transform(graft.Stage.materialize)
        val base = if (guard) {
          val oversize = bb.groupBy("band", "band_key")
            .agg(count(lit(1)).as("_bsz"), min(col("doc_id")).as("_hub"))
            .filter(col("_bsz") > 4096)
          val flagged = bb.join(broadcast(oversize), Seq("band", "band_key"), "left_outer")
          val small = flagged.filter(col("_bsz").isNull)
            .select(col("doc_id"), col("band"), col("band_key"))
          val l = small.toDF("id_a", "band", "band_key")
          val r = small.toDF("id_b", "band", "band_key")
          val pairs = l.join(r, Seq("band", "band_key"))
            .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
          val stars = flagged.filter(col("_bsz").isNotNull && col("doc_id") =!= col("_hub"))
            .select(col("_hub").as("id_a"), col("doc_id").as("id_b"))
          pairs.unionAll(stars)
        } else {
          val l = bb.select(col("doc_id").as("id_a"), col("band"), col("band_key"))
          val r = bb.select(col("doc_id").as("id_b"), col("band"), col("band_key"))
          l.join(r, Seq("band", "band_key"))
            .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
        }
        base.distinct().count()
      }
      for (round <- 1 to 2) {
        time(s"p06 A/B guarded string keys (shipped) r$round")(pairsOf(banded(), guard = true))
        time(s"p06 A/B unguarded string keys r$round")(pairsOf(banded(), guard = false))
        time(s"p06 A/B guarded xxhash64 keys r$round")(pairsOf(hashKeys(banded()), guard = true))
        time(s"p06 A/B unguarded xxhash64 keys r$round")(pairsOf(hashKeys(banded()), guard = false))
      }
    }

    // streaming LSH hot bucket at the FULL default cap (4096): batch 1
    // fills one bucket to the cap (clique emission — the one-time n²/2
    // cost the cap bounds), batch 2 sends 4096 over-cap arrivals (each a
    // binary-search miss + one star edge; the old linear contains() made
    // this 4096×4096 ≈ 16M comparisons), batch 3 re-delivers the members
    // (binary-search hits, zero output). Noop sink — pair volume must not
    // accumulate on the driver.
    {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val boiler = "subscribe to our newsletter for the latest updates and offers"
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val cands = graft.streaming.Streams.streamingMinhashCandidates(
        in.toDF().toDF("doc_id", "text"), k = 16, bands = 1, maxBucketSize = 4096)
      val q = cands.toDF().writeStream.format("noop").outputMode("append").start()
      def feed(label: String, ids: Range): Unit = {
        val t0 = System.nanoTime()
        in.addData(ids.map(i => (i.toLong, boiler)))
        q.processAllAvailable()
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      feed("streaming hot bucket: fill to cap 4096 (clique)", 1 to 4096)
      feed("streaming hot bucket: 4096 over-cap arrivals (star)", 4097 to 8192)
      feed("streaming hot bucket: re-deliver 4096 members (no-op)", 1 to 4096)
      q.stop()
    }

    // quantization tiers @50k vectors (round 6): the same 64 probes
    // through raw floats (brute force), SQ8 codes (4× smaller scan), and
    // IVFADC (cell-routed byte codes — the only sub-linear scan). Corpus
    // = sf0.1 embeddings replicated 10× with id offsets.
    {
      import graft.pipeline.Similarity
      val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding")
      val corpus = (0 until 10).map(i =>
          emb0.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _).transform(graft.Stage.materialize)
      val n = corpus.count()
      val probes = emb0.filter(col("vec_id") < 64)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      time(s"brute-force knn raw floats @$n x 64 probes")(
        Similarity.bruteForceKnn(corpus, probes, k = 10).count())
      val t0 = System.nanoTime()
      val (mins, maxs) = Similarity.sqTrain(corpus)
      println(f"sqTrain one-pass extrema @$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val sqDir = "/tmp/graft_scale/sq_index_50k.parquet"
      Similarity.sqIndex(corpus, mins, maxs).write.mode("overwrite").parquet(sqDir)
      val sqIdx = spark.read.parquet(sqDir)
      time(s"SQ8 knn over int8 codes @$n x 64 probes")(
        Similarity.sqKnn(sqIdx, mins, maxs, probes, k = 10).count())
      val t1 = System.nanoTime()
      val cb = Similarity.kmeansCentroids(corpus, cells = 64, iters = 1)
      val books = Similarity.ivfPqTrain(corpus, cb, m = 8, codes = 16, iters = 1)
      println(f"IVFADC train (64 cells + residual books) @$n: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      val pqDir = "/tmp/graft_scale/ivfpq_index_50k.parquet"
      Similarity.ivfPqIndex(corpus, cb, books).write.mode("overwrite").parquet(pqDir)
      val pqIdx = spark.read.parquet(pqDir)
      time(s"IVFADC knn nProbe=8/64 @$n x 64 probes")(
        Similarity.ivfPqKnn(pqIdx, cb, books, probes, k = 10, nProbe = 8).count())

      // heap vs window knn tail (round 7): shuffle VOLUME is what the
      // heap plan bounds (≤k rows per probe per task vs every scored
      // row) — measure bytes written to shuffle, not just wall time.
      // Local mode has no network, so the byte ratio IS the result; the
      // wall-clock trade matches the TopK study (window wins local CPU).
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              shuffleBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        })
      def measureShuffle(label: String)(f: => Long): Unit = {
        Thread.sleep(1000) // drain prior listener events
        shuffleBytes.set(0L)
        val t0 = System.nanoTime(); val rows = f
        Thread.sleep(1000) // listener bus is async
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          f"shuffle write ${shuffleBytes.get / 1024.0 / 1024.0}%.2f MiB ($rows rows)")
      }
      measureShuffle(s"window knn tail @$n x 64 probes")(
        Similarity.bruteForceKnn(corpus, probes, k = 10).count())
      measureShuffle(s"heap knn tail @$n x 64 probes")(
        Similarity.bruteForceKnn(corpus, probes, k = 10, heap = true).count())
    }

    // round-7 curation additions @1x (5k docs) vs @10x (50k docs):
    // lmGate is two type-table joins + explode (expect ~linear); the
    // shuffle-shards window vs write-path shows the no-window saving;
    // BPE training cost follows the word-TYPE table (sub-linear in
    // docs), not the corpus — the design claim, measured.
    {
      import graft.pipeline.{Bpe, TextAnalysis}
      val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val d10 = spark.read.parquet(bigDocs)
      time("lmGate (train+score) @5k docs")(TextAnalysis.lmGate(d1).count())
      time("lmGate (train+score) @50k docs")(TextAnalysis.lmGate(d10).count())
      time("knGate (train+score) @50k docs")(TextAnalysis.knGate(d10).count())
      time("similarityRank 5 iters @50k docs")(
        graft.pipeline.Graph.similarityRank(d10, iters = 5).count())
      time("curateModern end-to-end @50k docs")(
        graft.pipeline.Curate.curateModern(d10,
          Array(0.001, 0.01, -8.0, 6.0, 0.2, -4.0), clfBias = -2.0,
          lmThreshold = 0.02, shards = 16).count())
      time("shuffleShards window @50k")(
        TextAnalysis.shuffleShards(d10, shards = 64).count())
      time("shuffleForWrite (no window) @50k")(
        TextAnalysis.shuffleForWrite(d10, shards = 64).count())
      time("importanceSample @50k")(
        TextAnalysis.importanceSample(d10, lit(0.5)).count())
      // round-7 additions: line dedup is linear explode+count+join;
      // triangles/LPA ride the candidate graph (edge volume dominates
      // at 10× docs — 121× pairs per the replica structure)
      time("dedupLines minDocs=2 @50k docs")(
        graft.pipeline.Dedup.dedupLines(d10, minDocs = 2).count())
      time("similarityTriangles @50k docs")(
        graft.pipeline.Graph.similarityTriangles(d10).count())
      time("similarityCommunities 4 rounds @50k docs")(
        graft.pipeline.Graph.similarityCommunities(d10).count())
      def nTypes(df: org.apache.spark.sql.DataFrame) = Bpe.wordTypes(df).count()
      println(s"word types: @5k=${nTypes(d1)} @50k=${nTypes(d10)}")
      time("bpe train 8 merges @5k docs")(Bpe.train(d1, 8).length.toLong)
      time("bpe train 8 merges @50k docs")(Bpe.train(d10, 8).length.toLong)
      time("bpe encode @50k docs") {
        val m = Bpe.train(d1, 8)
        d10.select(size(Bpe.encode(m, col("text"))).as("n")).agg(sum("n")).count()
      }
    }

    // round-8: skew-join probe lives in SkewProfile (30M-row hot key,
    // broadcast defeated): warm plain 11.4 s vs salted 3.5 s.

    // round-8 snapshot/layout ops @6M rows (10x lineitem): zorderBy is
    // stats + one range exchange + in-partition sort; upsert is one
    // max_by hash agg; diff is one full-outer join — all single-shuffle
    // shapes that scale with the data, no windows, no driver loops.
    {
      import graft.operators.Snapshot
      import graft.sources.ZOrder
      val li = spark.read.parquet(big)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      time("zorderBy (okey x suppkey) @6M")(
        ZOrder.zorderBy(li, "l_orderkey", "l_suppkey", 32).count())
      val snap = li.withColumn("version", lit(0L))
        .withColumn("deleted", lit(false)).localCheckpoint()
      val delta = snap.filter(col("l_orderkey") % 10 === 0)
        .withColumn("version", lit(1L))
        .withColumn("deleted", col("l_orderkey") % 170 === 0)
      time("snapshot upsert @6M + 0.6M delta")(
        Snapshot.upsert(snap, delta, Seq("l_orderkey", "l_suppkey"),
          "version", Some("deleted")).count())
      val neu = snap.filter(col("l_orderkey") % 13 =!= 0)
      time("snapshot diff @6M vs 5.5M")(
        Snapshot.diff(snap, neu, Seq("l_orderkey", "l_suppkey")).count())
    }

    // round-9: the remaining round-8 ops at 10x — resample (post-guard),
    // sessionize, RANGE-frame window, CUBE. Shapes: all one-shuffle keyed
    // windows/aggs whose per-key work is span-bounded, so 10x keys at
    // constant per-key size should scale ~linearly.
    {
      import graft.operators.{Resample, Sessionize}
      import org.apache.spark.sql.expressions.Window
      // keyed sparse time series: K keys x 120 observations, every 3rd
      // slot present -> grid ~3x the input rows (output-proportional)
      def series(keys: Int) = spark.range(keys * 120L).select(
        (col("id") % keys).as("k"),
        (call_function("div", col("id"), lit(keys.toLong)) * 30L
          + (col("id") % 7) * 10L).as("t"),
        (col("id") % 100).cast("double").as("v")).localCheckpoint()
      val s1 = series(5000); val s10 = series(50000)
      time("resample gridFill @600k obs")(
        Resample.gridFill(s1, "k", "t", "v", step = 10L).count())
      time("resample gridFill @6M obs")(
        Resample.gridFill(s10, "k", "t", "v", step = 10L).count())
      time("sessionize @600k events")(
        Sessionize.sessions(s1, "k", "t", gap = 25L).count())
      time("sessionize @6M events")(
        Sessionize.sessions(s10, "k", "t", gap = 25L).count())
      def rangeWin(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy("k").orderBy(col("t")).rangeBetween(-300L, 0L)
        df.withColumn("n_win", count(lit(1)).over(w))
          .withColumn("win_min", min(col("v")).over(w))
      }
      time("RANGE-frame window @600k")(rangeWin(s1).count())
      time("RANGE-frame window @6M")(rangeWin(s10).count())
      def cubeShape(src: String) = spark.read.parquet(src)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), sum("l_quantity").as("s"), count(lit(1)).as("c"))
      time("CUBE @600k")(cubeShape("/root/testdata/sf0.1/lineitem.parquet").count())
      time("CUBE @6M")(cubeShape(big).count())
    }

    // round-9: batched BPE training — driver ROUNDS (and Spark jobs) drop
    // ~M-fold at the same merge count; the per-round counting job is the
    // same shape either way, so wall-clock follows rounds.
    {
      import graft.pipeline.Bpe
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val jobs = new java.util.concurrent.atomic.AtomicLong(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        })
      def jobCount(label: String)(f: => Long): Unit = {
        Thread.sleep(500); jobs.set(0)
        val t0 = System.nanoTime(); val n = f
        Thread.sleep(500)
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          f"${jobs.get} driver jobs ($n merges)")
      }
      jobCount("bpe train 100 merges sequential (M=1)")(
        Bpe.train(docs, 100, minPairFreq = 1L).length.toLong)
      jobCount("bpe train 100 merges batched (M=25)")(
        Bpe.train(docs, 100, minPairFreq = 1L, batchMerges = 25).length.toLong)
    }

    // unigram trainer (round 10): like BPE, training must be word-TYPE-
    // table-bound — 10× replicated docs change type counts, not the
    // type table, so seed + EM rounds should be FLAT across the
    // replication while the corpus-side tokenization scales linearly.
    {
      import graft.pipeline.Unigram
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val docs10 = (1 to 10).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .transform(graft.Stage.materialize)
      time("unigram train (seed+2 EM) @5k docs")(
        Unigram.train(docs, vocabSize = 2000, rounds = 2).count())
      time("unigram train (seed+2 EM) @50k docs")(
        Unigram.train(docs10, vocabSize = 2000, rounds = 2).count())
      val model = Unigram.vocabSeq(Unigram.train(docs, vocabSize = 2000, rounds = 1))
      time("unigram encode @5k docs")(
        docs.select(Unigram.encode(model, col("text"))).count())
      time("unigram encode @50k docs")(
        docs10.select(Unigram.encode(model, col("text"))).count())
    }

    // candidate-graph tap (round 10): p51/p54/p55 each regenerate the
    // MinHash edges — the dominant cost of every graph analytic. With
    // writeCandidates the corpus is paired ONCE; rank + triangles +
    // communities then read the persisted edge table. Expectation:
    // tap total ≈ one pairing + three cheap analytics, vs inline total
    // ≈ three pairings; results bit-identical either way.
    {
      import graft.pipeline.{Dedup, Graph}
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val nodes = docs.select(col("doc_id").as("id"))
      time("graph inline: rank (pairs regenerated)")(
        Graph.similarityRank(docs).count())
      time("graph inline: triangles (pairs regenerated)")(
        Graph.similarityTriangles(docs).count())
      time("graph inline: communities (pairs regenerated)")(
        Graph.similarityCommunities(docs).count())
      val tap = "/tmp/graft_scale/candidates.parquet"
      time("graph tap: writeCandidates (pair once)") {
        Dedup.writeCandidates(docs, tap); 1L
      }
      val pairs = Dedup.candidatesTap(spark, tap)
      time("graph tap: rank")(Graph.rankFromPairs(pairs, nodes).count())
      time("graph tap: triangles")(Graph.triangleCounts(pairs, nodes).count())
      time("graph tap: communities")(Graph.communitiesFromPairs(pairs, nodes).count())
      val drift =
        Graph.rankFromPairs(pairs, nodes)
          .exceptAll(Graph.similarityRank(docs).toDF("id", "rank")).count() +
        Graph.communitiesFromPairs(pairs, nodes)
          .exceptAll(Graph.similarityCommunities(docs).toDF("id", "community")).count() +
        Graph.triangleCounts(pairs, nodes)
          .exceptAll(Graph.similarityTriangles(docs)
            .toDF("id", "degree", "n_triangles", "clustering")).count()
      println(s"graph tap vs inline differing rows (must be 0): $drift")
      assert(drift == 0L, "persisted-tap graph analytics drifted from inline")
    }

    // ngram decontamination + containment (round 10): the ngram report
    // is ONE narrow kernel pass against a broadcast sorted gram array —
    // zero shuffles, so 10× docs should cost ~10× scan, nothing
    // super-linear. Containment rides the df-capped inverted shingle
    // index: 10×-replicated docs form 10-member exact-dup families, so
    // candidates grow ~linearly in family edges (each doc pairs with its
    // ~9 copies), never quadratically in the corpus.
    {
      import graft.pipeline.Dedup
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val docs10 = (1 to 10).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .transform(graft.Stage.materialize)
      val evalSlice = docs.filter(col("source").isin("src0", "src1"))
      time("ngram report @5k docs (broadcast, 1 narrow pass)")(
        Dedup.ngramOverlapReport(docs, evalSlice, n = 6).count())
      time("ngram report @50k docs (broadcast, 1 narrow pass)")(
        Dedup.ngramOverlapReport(docs10, evalSlice, n = 6).count())
      time("containment cand+verify @5k docs")(
        Dedup.containmentVerify(
          Dedup.containmentCandidates(docs, m = 8, maxDocFreq = 64),
          docs, threshold = 0.8).count())
      time("containment cand+verify @50k docs (10-member dup families)")(
        Dedup.containmentVerify(
          Dedup.containmentCandidates(docs10, m = 8, maxDocFreq = 64),
          docs10, threshold = 0.8).count())
      // incremental containment: the 50k-doc index is built ONCE; a
      // delta batch then costs delta×collisions — 10× the delta should
      // be ~10× the probe work, with the corpus never re-shingled.
      val idx = Dedup.shingleIndex(docs10).transform(graft.Stage.materialize)
      time("shingleIndex build @50k docs")(idx.count())
      time("incr containment: 500-doc delta vs 50k index")(
        Dedup.incrementalContainment(idx, docs.limit(500), threshold = 0.8,
          m = 8, maxDocFreq = 64, minProbeHits = 6).count())
      time("incr containment: 5k-doc delta vs 50k index")(
        Dedup.incrementalContainment(idx, docs, threshold = 0.8,
          m = 8, maxDocFreq = 64, minProbeHits = 6).count())
    }

    // profiler + expectations (round 10): both are one-pass
    // aggregations — 10× the rows should be ~scan-bound.
    {
      import graft.operators.{Check, Profile}
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val li10 = spark.read.parquet(big)
      val cols = Seq("l_orderkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_linestatus")
      time("profile 6 cols @600k")(Profile.profile(li, cols).count())
      time("profile 6 cols @6M")(Profile.profile(li10, cols).count())
      val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      def checks(df: org.apache.spark.sql.DataFrame) = Check.check(df, Seq(
        Check.NotNull("l_quantity"),
        Check.Unique(Seq("l_orderkey", "l_linenumber")),
        Check.InRange("l_discount", 0.0, 0.05),
        Check.RefIn("l_orderkey", orders, "o_orderkey")))
      time("check 4 constraints @600k")(checks(li).count())
      time("check 4 constraints @6M")(checks(li10).count())
    }
    spark.stop()
  }
}
