package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("windowed aggregation with watermark (event time)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.windowedAgg(df, "ts", "10 minutes", "5 minutes",
      groupCols = Seq("event_type"),
      aggs = Seq(count(lit(1)).as("cnt"), sum("value").as("sum_v")))
    val q = Streams.toMemory(agg, "win_agg", "complete")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:${m}%02d:00")
    in.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_agg").collect()
    assert(rows.length == 2) // two 5-min windows
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("cnt") == 2 && click.getAs[Double]("sum_v") == 3.0)
    q.stop()
  }

  test("stream-stream interval join within event-time bounds") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val errs = MemoryStream[(java.sql.Timestamp, Long, String)]
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("cts", "uid", "click"),
      errs.toDF().toDF("ets", "uid", "err"),
      Seq("uid"), "cts", "ets", watermark = "1 hour",
      before = "0 seconds", after = "10 minutes")
    val q = Streams.toMemory(joined.select("uid", "click", "err"), "ij_out", "append")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:${m}%02d:00")
    clicks.addData((ts(0), 1L, "c1"), (ts(30), 1L, "c2"), (ts(5), 2L, "c3"))
    errs.addData((ts(4), 1L, "e1"),   // 4 min after c1 -> joins c1 only
      (ts(31), 1L, "e2"),             // joins c2 only (31 > 0+10)
      (ts(4), 2L, "e3"),              // BEFORE c3 -> excluded (before=0)
      (ts(20), 3L, "e4"))             // no such key
    q.processAllAvailable()
    val got = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "c1", "e1"), (1L, "c2", "e2")))
    q.stop()
  }

  test("streaming upsert: latest version per key, batch-parity end state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Boolean, String)]
    val out = Streams.streamingUpsert(in.toDS())
    val q = Streams.toMemory(out.toDF().toDF("k", "version", "deleted", "v"),
      "ups_out", "update")
    in.addData(("a", 0L, false, "a0"), ("b", 0L, false, "b0"))
    q.processAllAvailable()
    in.addData(("a", 2L, false, "a2"), ("b", 1L, true, "xx"),
      ("a", 1L, false, "stale"))
    q.processAllAvailable()
    // the key's final state = its max-version emission (each batch emits
    // the running winner, so the highest version IS the latest emission)
    val last = spark.table("ups_out").groupBy("k")
      .agg(max_by(struct(col("version"), col("deleted"), col("v")),
        col("version")).as("w"))
      .select(col("k"), col("w.*"))
    val st = last.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(st("a") == ((2L, false, "a2")), st.toString) // stale v1 lost to v2
    assert(st("b") == ((1L, true, "xx"))) // tombstone wins, flagged
    // batch parity: survivors after dropping tombstones = Snapshot.upsert
    val allRows = Seq(("a", 0L, false, "a0"), ("b", 0L, false, "b0"),
      ("a", 2L, false, "a2"), ("b", 1L, true, "xx"), ("a", 1L, false, "stale"))
    val batch = graft.operators.Snapshot.upsert(
      allRows.take(2).toDF("k", "version", "deleted", "v"),
      allRows.drop(2).toDF("k", "version", "deleted", "v"),
      Seq("k"), "version", Some("deleted"))
      .select("k", "v").as[(String, String)].collect().toMap
    val streamSurvivors = st.collect { case (k, (_, false, v)) => k -> v }
    assert(streamSurvivors == batch)
    q.stop()
  }

  test("streaming upsert: equal-version ties are deterministic in-batch, later batch wins across") {
    implicit val sqlCtx = spark.sqlContext
    // same row SET in two different orders must yield the same winner —
    // the per-group iterator order after the shuffle is not arrival
    // order, so the tie-break is (deleted desc, payload desc), not order
    def run(name: String, batch1: Seq[(String, Long, Boolean, String)],
        batch2: Seq[(String, Long, Boolean, String)]): Map[String, (Long, Boolean, String)] = {
      val in = MemoryStream[(String, Long, Boolean, String)]
      val q = Streams.toMemory(Streams.streamingUpsert(in.toDS()).toDF()
        .toDF("k", "version", "deleted", "v"), name, "update")
      in.addData(batch1: _*); q.processAllAvailable()
      if (batch2.nonEmpty) { in.addData(batch2: _*); q.processAllAvailable() }
      val st = spark.table(name).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2), r.getString(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      q.stop(); st
    }
    val rows = Seq(("a", 5L, false, "p1"), ("a", 5L, false, "p2"))
    assert(run("tie1", rows, Nil)("a") == ((5L, false, "p2")))
    assert(run("tie2", rows.reverse, Nil)("a") == ((5L, false, "p2")))
    // tombstone beats live at equal version regardless of payload order
    val tomb = Seq(("a", 5L, true, "aaa"), ("a", 5L, false, "zzz"))
    assert(run("tie3", tomb, Nil)("a") == ((5L, true, "aaa")))
    assert(run("tie4", tomb.reverse, Nil)("a") == ((5L, true, "aaa")))
    // across batches: equal version in a LATER batch replaces state even
    // when the deterministic order ranks it lower
    assert(run("tie5", Seq(("a", 5L, false, "zzz")),
      Seq(("a", 5L, false, "aaa")))("a") == ((5L, false, "aaa")))
    // null payload vs the literal string "null": must NOT conflate —
    // the string orders above null, both insertion orders agree
    val nulls = Seq(("a", 5L, false, null: String), ("a", 5L, false, "null"))
    assert(run("tie6", nulls, Nil)("a") == ((5L, false, "null")))
    assert(run("tie7", nulls.reverse, Nil)("a") == ((5L, false, "null")))
  }

  test("streaming dedup within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val deduped = Streams.streamingDedup(df, "ts", "1 hour", Seq("event_id"))
    val q = Streams.toMemory(deduped, "dedup_out", "append")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:${m}%02d:00")
    in.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L), (ts(3), 2L), (ts(4), 3L))
    q.processAllAvailable()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L)))
    q.stop()
  }

  test("curation ops run on streams: PII scrub + contamination vs static probes") {
    import graft.pipeline.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("doc_id", "text")
    // stateless column ops apply to streams as-is; the contamination
    // probe side is a STATIC broadcast joined against the stream
    val probes = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val probeGrams = broadcast(probes.select(
      explode(TextAnalysis.wordNgrams(col("text"), 4)).as("_gram")).distinct())
    val enriched = df
      .withColumn("pii", TextAnalysis.piiScrub(col("text")))
      .select(col("doc_id"), col("pii.n_emails").as("n_emails"),
        col("pii.scrubbed").as("scrubbed"),
        explode(TextAnalysis.wordNgrams(col("text"), 4)).as("_gram"))
      .join(probeGrams, Seq("_gram"), "left_semi")
    val q = Streams.toMemory(enriched, "curation_stream", "append")
    in.addData(
      (1L, "alpha beta gamma delta epsilon something else entirely here"),
      (2L, "totally unrelated text reach me at a.b@c.com for details"))
    q.processAllAvailable()
    val rows = spark.table("curation_stream").collect()
    // doc 1 shares the 4-gram "alpha beta gamma delta" (+1 more) with the probe
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("doc_id") == 1L))
    q.stop()
    // and the scrub fired on the stream: run doc 2 through a plain batch
    // of the same expression to confirm semantics carried over
    val scrubbed = Seq((2L, "reach me at a.b@c.com now")).toDF("doc_id", "text")
      .select(TextAnalysis.piiScrub(col("text")).as("p")).select("p.*").head
    assert(scrubbed.getAs[Int]("n_emails") == 1 &&
      scrubbed.getAs[String]("scrubbed") == "reach me at <EMAIL> now")
    // the classifier gate is pure Column arithmetic, so it streams too:
    // same docs, same model, same keeps as batch
    val in2 = MemoryStream[(Long, String)]
    val w = Array(0.001, 0.01, -8.0, 6.0, 0.2, -4.0)
    val gated = in2.toDF().toDF("doc_id", "text")
      .withColumn("_c", TextAnalysis.classifierScore(col("text"), w, bias = -2.0))
      .select(col("doc_id"), col("_c.keep").as("keep"))
    val q2 = Streams.toMemory(gated, "clf_stream", "append")
    val batchDocs = Seq(
      (1L, "the cat sat on the mat and it was a good day for all of them"),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"))
    in2.addData(batchDocs: _*)
    q2.processAllAvailable()
    val streamKeeps = spark.table("clf_stream").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val batchKeeps = batchDocs.toDF("doc_id", "text")
      .withColumn("_c", TextAnalysis.classifierScore(col("text"), w, bias = -2.0))
      .select(col("doc_id"), col("_c.keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(streamKeeps == batchKeeps)
    q2.stop()
    // importanceSample is a stateless md5-threshold filter, so it
    // streams as-is: same keeps as batch, decision-for-decision
    val in3 = MemoryStream[(Long, String)]
    val sampled = TextAnalysis.importanceSample(
      in3.toDF().toDF("doc_id", "text"), lit(0.5), seed = "st")
    val q3 = Streams.toMemory(sampled, "dsir_stream", "append")
    val manyDocs = (1L to 200L).map(i => (i, s"doc $i"))
    in3.addData(manyDocs: _*)
    q3.processAllAvailable()
    val streamIds = spark.table("dsir_stream").collect().map(_.getLong(0)).toSet
    val batchIds = TextAnalysis.importanceSample(
        manyDocs.toDF("doc_id", "text"), lit(0.5), seed = "st")
      .collect().map(_.getLong(0)).toSet
    assert(streamIds == batchIds && streamIds.nonEmpty)
    q3.stop()
  }

  test("streaming near-dup suppression via simhash within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val kept = Streams.streamingNearDup(df, "ts", "1 hour")
    val q = Streams.toMemory(kept, "neardup_out", "append")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:${m}%02d:00")
    val a = "the quick brown fox jumps over the lazy dog again and again"
    in.addData(
      (ts(0), 1L, a),
      (ts(1), 2L, a.replace("lazy", "LAZY")), // case-only change → same simhash
      (ts(2), 3L, "an entirely different document about spark aggregation"))
    q.processAllAvailable()
    val ids = spark.table("neardup_out").select("doc_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 3L)), s"got ${ids.toSeq}")
    q.stop()
  }

  test("closed-session emission via flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val closed = Streams.sessionizeClosed(in.toDS(), gap = 30000L)
    val q = closed.writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    in.addData((1L, 1000L), (1L, 5000L))
    q.processAllAvailable()
    assert(spark.table("closed_sessions").count() == 0) // still open
    // gap exceeded → first session closes, new one opens
    in.addData((1L, 100000L))
    q.processAllAvailable()
    val s = spark.table("closed_sessions").as[Streams.SessionOut].collect()
    assert(s.length == 1 && s.head.startMs == 1000L &&
      s.head.endMs == 5000L && s.head.events == 2L)
    q.stop()
  }

  test("sessionization with custom state (mapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, ts_ms)
    val sessions = Streams.sessionize(in.toDS(), gap = 30000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    in.addData((1L, 1000L), (1L, 5000L), (2L, 2000L))
    q.processAllAvailable()
    val s1 = spark.table("sessions").as[Streams.SessionOut].collect()
      .find(_.key == 1L).get
    assert(s1.events == 2L && s1.startMs == 1000L && s1.endMs == 5000L)
    // gap exceeded → new session for user 1
    in.addData((1L, 100000L))
    q.processAllAvailable()
    val s2 = spark.table("sessions").as[Streams.SessionOut].collect()
      .filter(_.key == 1L).maxBy(_.endMs)
    assert(s2.events == 1L && s2.startMs == 100000L)
    q.stop()
  }

  test("streaming minhash candidates: batch parity and capped-bucket star edges") {
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, a),
      (2L, a.replace("today", "tonight")), // near-dup of 1
      (3L, "completely different content about spark query engines and shuffles"),
      (4L, a), // exact dup of 1
      (5L, "unrelated text mentioning databases and columnar storage formats here"))
    // batch truth
    val batch = graft.pipeline.Dedup.minhashCandidates(
      docs.toDF("doc_id", "text"), k = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // stream the same docs across two micro-batches
    val in = MemoryStream[(Long, String)]
    val cands = Streams.streamingMinhashCandidates(
      in.toDF().toDF("doc_id", "text"), k = 64, bands = 32)
    val q = Streams.toMemory(cands.toDF().toDF("id_a", "id_b"), "stream_cands", "append")
    in.addData(docs.take(2): _*)
    q.processAllAvailable()
    in.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("stream_cands").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    q.stop()

    // capped bucket: 50 identical docs through cap 8 → state stays at 8
    // members; later arrivals emit exactly one star edge to the hub (doc 1)
    val in2 = MemoryStream[(Long, String)]
    val capped = Streams.streamingMinhashCandidates(
      in2.toDF().toDF("doc_id", "text"), k = 64, bands = 16, maxBucketSize = 8)
    val q2 = Streams.toMemory(capped.toDF().toDF("id_a", "id_b"), "stream_capped", "append")
    in2.addData((1 to 50).map(i => (i.toLong, a)): _*)
    q2.processAllAvailable()
    val pairs = spark.table("stream_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // clique among the first 8 arrivals + star edges 1->(9..50): all docs
    // land in one connected component and pair volume is linear, not n^2
    assert((9 to 50).forall(i => pairs.contains((1L, i.toLong))))
    assert(pairs.size == 8 * 7 / 2 + 42, s"expected linear pair volume, got ${pairs.size}")
    // re-delivery semantics (VERDICT r6 #6): an under-cap member
    // re-delivered later is deduped against the stored members; an
    // over-cap id inside the bounded emitted-edge window (the first
    // `cap` over-cap ids per bucket — 9..16 here) is deduped against
    // the emitted set in the same state value — neither emits anything
    val before = spark.table("stream_capped").count()
    in2.addData((2L, a))
    q2.processAllAvailable()
    assert(spark.table("stream_capped").count() == before,
      "under-cap re-delivery must emit nothing")
    in2.addData((9L, a))
    q2.processAllAvailable()
    assert(spark.table("stream_capped").count() == before,
      "remembered over-cap re-delivery must emit nothing (edge already emitted)")
    // past the emitted window (id 50 arrived after the set filled at 8)
    // the operator falls back to re-emitting — bounded state, idempotent
    // under the downstream dedup, NEVER suppression of a first-time edge
    in2.addData((50L, a))
    q2.processAllAvailable()
    val after = spark.table("stream_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(after.length == before + 16,
      s"past-window re-delivery re-emits one star edge per band, got ${after.length - before}")
    assert(after.count(_ == (1L, 50L)) == 32, "re-emitted edges are copies of the star edge")
    q2.stop()
  }

  test("streaming embedding candidates: batch parity and capped star edges") {
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    // batch truth: the unverified bucket-pair tier = embeddingNearDup with
    // the threshold disabled (cosine >= -1 keeps every within-bucket pair)
    val batch = graft.pipeline.Dedup.embeddingNearDup(emb, planes = 4, threshold = -1.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val in = MemoryStream[(Long, Seq[Float])]
    val cands = Streams.streamingEmbeddingCandidates(
      in.toDF().toDF("vec_id", "embedding"), planes = 4)
    val q = Streams.toMemory(cands.toDF().toDF("id_a", "id_b"), "stream_emb", "append")
    in.addData(rows.take(20): _*)
    q.processAllAvailable()
    in.addData(rows.drop(20): _*)
    q.processAllAvailable()
    val streamed = spark.table("stream_emb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream ${streamed.size} pairs != batch ${batch.size}")
    q.stop()

    // capped: identical vectors share one signature bucket; past cap 8
    // every arrival star-links to the min-id member
    val one = rows.head._2
    val in2 = MemoryStream[(Long, Seq[Float])]
    val capped = Streams.streamingEmbeddingCandidates(
      in2.toDF().toDF("vec_id", "embedding"), planes = 4, maxBucketSize = 8)
    val q2 = Streams.toMemory(capped.toDF().toDF("id_a", "id_b"), "stream_emb_capped", "append")
    in2.addData((1 to 40).map(i => (i.toLong, one)): _*)
    q2.processAllAvailable()
    val pairs = spark.table("stream_emb_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((9 to 40).forall(i => pairs.contains((1L, i.toLong))))
    assert(pairs.size == 8 * 7 / 2 + 32, s"expected linear pair volume, got ${pairs.size}")
    q2.stop()
  }

  test("streaming KMV distinct: bounded state, monoid-equal to batch") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val in = MemoryStream[(String, Long)]
    val out = Streams.streamingKmvDistinct(in.toDS(), k)
    val q = Streams.toMemory(out.toDF().toDF("key", "n_seen", "sk_size", "est"), "kmv_out")
    def h(s: String): Long = {
      // the same md5-lower-61 the batch kmv consumes
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s.getBytes("UTF-8"))
      var x = 0L; var i = 15
      while (i >= 8) { x = (x << 8) | (d(i) & 0xFFL); i -= 1 }
      x & ((1L << 61) - 1)
    }
    val batch1 = (1 to 5).map(i => ("a", h(s"v$i")))
    val batch2 = (3 to 20).map(i => ("a", h(s"v$i"))) :+ (("b", h("only")))
    in.addData(batch1: _*)
    q.processAllAvailable()
    in.addData(batch2: _*)
    q.processAllAvailable()
    val rows = spark.table("kmv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // latest update per key = max n_seen (the SketchState contract),
    // no reliance on memory-sink row order
    val aFinal = rows.filter(_._1 == "a").maxBy(_._2)
    val bFinal = rows.filter(_._1 == "b").maxBy(_._2)
    assert(aFinal._2 == (batch1.size + batch2.size - 1).toLong,
      "n_seen must count every processed row for the key")
    assert(aFinal._3 == k, "state must cap at k entries (20 distinct seen)")
    assert(bFinal == ("b", 1L, 1L, 1.0))
    // monoid property: streaming end-state estimate == batch kmv estimate
    // over the union of all rows for key a
    val batchEst = (1 to 20).map(i => h(s"v$i")).toDF("h")
      .agg(Sketches.kmvEstimate(Sketches.kmv(col("h"), k), k))
      .collect().head.getDouble(0)
    assert(aFinal._4 == batchEst)
    q.stop()
  }

  test("streaming CMS: end state equals the batch sketch per key") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(("k1", "a"), ("k1", "a"), ("k1", "b"), ("k2", "x"))
    val b2 = Seq(("k1", "a"), ("k2", "x"), ("k2", "y"), ("k1", null))
    val in = MemoryStream[(String, String)]
    val out = Streams.streamingCms(in.toDS(), depth = 2, width = 8)
    val q = out.toDF("key", "n_seen", "sk").writeStream.format("memory")
      .queryName("cms_stream").outputMode("update").start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    q.stop()
    val fin = spark.table("cms_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._2)._3 } // latest = max n_seen
    val batch = (b1 ++ b2).filter(_._2 != null).toDF("key", "v")
      .groupBy("key").agg(Sketches.cms(col("v"), 2, 8).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(fin == batch)
    // and the estimates come out right through the shared kernel
    val estA = Seq(("k1", batch("k1"))).toDF("key", "sk")
      .select(Sketches.cmsEstimate(col("sk"), lit("a"), 2, 8))
      .collect().head.getLong(0)
    assert(estA >= 3L)
  }

  test("streaming funnel: multi-batch frontier matches the batch funnel") {
    import graft.operators.Funnel
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val batch1 = Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 10L, "view"), (3L, 5L, "click")) // 3 never enters
    val batch2 = Seq((1L, 30L, "purchase"), (2L, 200L, "click"),
      (2L, 210L, "purchase")) // 2's click outside the 100-us window
    val in = MemoryStream[(Long, Long, String)]
    val out = Streams.streamingFunnel(
      in.toDF().toDF("user_id", "us", "event_type"), steps,
      maxSpan = Some(100L), tsCol = "us")
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    in.addData(batch1); q.processAllAvailable()
    in.addData(batch2); q.processAllAvailable()
    q.stop()
    // last emitted row per key = the final frontier
    val fin = spark.table("funnel_stream").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getSeq[Long](2))))
      .groupBy(_._1).map { case (kk, rows) =>
        kk -> rows.map(_._2).maxBy(_._1) }
    val all = (batch1 ++ batch2).toDF("user_id", "us", "event_type")
    val batch = Funnel.funnel(all, steps, tsCol = "us",
      maxSpan = Some(lit(100L))).collect()
      .map { r =>
        val ts = (2 to 4).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i)))
        r.getLong(0) -> ((r.getInt(1), ts))
      }.toMap
    assert(fin == batch, s"\nstream: $fin\n batch: $batch")
    assert(fin(1L)._1 == 3 && fin(2L)._1 == 1)
  }

  test("cluster assignment streams statelessly with batch parity") {
    import graft.pipeline.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ctr = Similarity.kmeansCentroids(emb, cells = 4, iters = 0)
    val probe = emb.orderBy("vec_id").limit(5)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val in = MemoryStream[(Long, Seq[Float])]
    val assigned = Similarity.clusterAssign(
      in.toDF().toDF("vec_id", "embedding"), ctr)
    val q = Streams.toMemory(assigned, "cluster_stream", "append")
    in.addData(probe.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("cluster_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = Similarity.clusterAssign(emb, ctr)
      .filter(col("vec_id").isin(probe.map(_._1).toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch && streamed.size == 5)
    q.stop()
  }

  test("streaming BM25 gate: exact batch parity on real corpus docs") {
    import graft.pipeline.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = TextAnalysis.bm25Train(corpus)
    val terms = Seq("spark", "window", "stream", "merge")
    val probe = corpus.orderBy("doc_id").limit(6)
      .select("doc_id", "text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val gated = Streams.streamingBm25Gate(
      in.toDF().toDF("doc_id", "text"), model, terms)
    val q = Streams.toMemory(gated, "bm25_stream", "append")
    in.addData(probe.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("bm25_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getDecimal(2)).map(_.toBigInteger))).toSet
    val ids = probe.map(_._1).toSet
    val batch = TextAnalysis.bm25Score(model, corpus, terms)
      .filter(col("doc_id").isin(ids.toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getDecimal(2)).map(_.toBigInteger))).toSet
    assert(streamed == batch, s"\nstream: $streamed\n batch: $batch")
    assert(streamed.exists(_._2 > 0L), "probe should include docs with hits")
    q.stop()
  }

  test("streaming check: cumulative expectations totals, batch parity on the union") {
    import graft.operators.Check._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val cons = Seq(NotNull("v"), InRange("v", 0.0, 10.0), RefIn("k", dim, "k"))
    val in = MemoryStream[(Long, Option[Double])]
    val checked = Streams.streamingCheck(in.toDF().toDF("k", "v"), cons)
    val q = Streams.toMemory(checked, "check_stream", "complete")
    def table() = spark.table("check_stream").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b1 = Seq((1L, Option(5.0)), (9L, Option(-1.0)), (3L, None: Option[Double]))
    in.addData(b1)
    q.processAllAvailable()
    assert(table() == Map("rows" -> 3L, "not_null(v)" -> 1L,
      "in_range(v,0.0,10.0)" -> 1L, "ref_in(k->k)" -> 1L), s"got ${table()}")
    val b2 = Seq((2L, Option(20.0)), (1L, Option(5.0)))
    in.addData(b2)
    q.processAllAvailable()
    val cum = table()
    val batch = graft.operators.Check.check((b1 ++ b2).toDF("k", "v"), cons)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum == batch, s"\nstream: $cum\n batch: $batch")
    q.stop()
    // unique needs cross-batch key state -> rejected with direction
    intercept[IllegalArgumentException] {
      Streams.streamingCheck(in.toDF().toDF("k", "v"), Seq(Unique(Seq("k"))))
    }
  }

  test("streaming ngram contamination report: exact batch parity, stateless") {
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalSlice = corpus.filter(col("source").isin("src0", "src1"))
    val train = corpus.filter(!col("source").isin("src0", "src1"))
    val grams = Dedup.evalGramSet(evalSlice, n = 6)
    val probe = train.orderBy("doc_id").limit(8)
      .select("doc_id", "text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val rep = Streams.streamingNgramReport(
      in.toDF().toDF("doc_id", "text"), grams, n = 6)
    val q = Streams.toMemory(rep, "ngram_stream", "append")
    in.addData(probe.toIndexedSeq)
    q.processAllAvailable()
    def asSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val streamed = asSet(spark.table("ngram_stream").collect())
    val batch = asSet(Dedup.ngramOverlapReport(train, evalSlice, n = 6)
      .filter(col("doc_id").isin(probe.map(_._1).toSeq: _*)).collect())
    assert(streamed == batch, s"\nstream: $streamed\n batch: $batch")
    // a second delivery of the same rows re-emits identically: stateless
    in.addData(probe.toIndexedSeq)
    q.processAllAvailable()
    assert(asSet(spark.table("ngram_stream").collect()) == batch)
    q.stop()
  }
}
