package graft

import graft.operators.{Check, Publish}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** [[graft.operators.Publish]] — small-file compaction and
  * write-audit-publish — plus the [[Dedup.dedupAudit]] / survivor-set
  * identity p94 relies on. */
class PublishSpec extends SparkTestBase {

  private def freshRoot(tag: String): String = {
    val p = s"/tmp/graft_test_${tag}_${java.util.UUID.randomUUID()}"
    graft.streaming.Streams.deleteRecursivelyNoFollow(p)
    p
  }

  import spark.implicits._

  test("compact: lossless rewrite, measured file sizing, range clustering") {
    val root = freshRoot("compact")
    try {
      val df = (1L to 4000L).map(i => (i, s"row$i")).toDF("k", "v")
      df.repartition(32).write.parquet(s"$root/in")
      assert(Publish.dataFiles(spark, s"$root/in").size == 32)
      val bytes = Publish.dataFiles(spark, s"$root/in").map(_._2).sum
      val rep = Publish.compact(spark, s"$root/in", s"$root/out",
        targetBytes = (bytes + 3) / 4, sortCols = Seq("k"))
      assert(rep.filesIn == 32 && rep.bytesIn == bytes)
      assert(rep.filesOut == 4, s"expected 4 output files, got $rep")
      // content multiset unchanged
      assertProduces(spark.read.parquet(s"$root/out"),
        df.collect().toSeq.map(_.toSeq))
      // range mode: per-file key ranges must not overlap
      val ranges = spark.read.parquet(s"$root/out")
        .groupBy(input_file_name()).agg(min("k"), max("k"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      ranges.iterator.sliding(2).withPartial(false).foreach(w =>
        assert(w(0)._2 <= w(1)._1, s"overlapping file ranges: ${ranges.toSeq}"))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("compact: round-robin mode balances without a sort key") {
    val root = freshRoot("compact_rr")
    try {
      (1L to 1000L).toDF("k").repartition(16).write.parquet(s"$root/in")
      val bytes = Publish.dataFiles(spark, s"$root/in").map(_._2).sum
      val rep = Publish.compact(spark, s"$root/in", s"$root/out",
        targetBytes = (bytes + 1) / 2)
      assert(rep.filesOut == 2)
      assert(spark.read.parquet(s"$root/out").count() == 1000)
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("publish: versions promote atomically; current serves the latest") {
    val root = freshRoot("pub")
    try {
      assert(Publish.currentVersion(spark, root).isEmpty)
      intercept[RuntimeException](Publish.current(spark, root))
      val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      val r1 = Publish.publish(v1, root, 1L, Seq(Check.Unique(Seq("k"))))
      assert(r1.published && r1.rows == 2)
      assert(Publish.currentVersion(spark, root).contains(1L))
      val v2 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v")
      assert(Publish.publish(v2, root, 2L).published)
      assertProduces(Publish.current(spark, root),
        Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("publish: failed audit rejects, cleans staging, keeps prior version serving") {
    val root = freshRoot("pub_fail")
    try {
      val v1 = Seq((1L, "a")).toDF("k", "v")
      assert(Publish.publish(v1, root, 1L).published)
      val bad = Seq[(Option[Long], String)](
        (Some(2L), "x"), (Some(2L), "y"), (None, "z")).toDF("k", "v")
      val r = Publish.publish(bad, root, 2L,
        Seq(Check.NotNull("k"), Check.Unique(Seq("k"))))
      assert(!r.published)
      assert(r.violations.map(_._1).toSet ==
        Set("not_null(k)", "unique(k)"), r.violationsOrEmpty)
      assert(!new java.io.File(s"$root/v2").exists())
      assert(!new java.io.File(s"$root/_tmp/staging_v2").exists())
      assert(Publish.currentVersion(spark, root).contains(1L))
      assertProduces(Publish.current(spark, root), Seq(Seq(1L, "a")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("publish: row-count expectation is part of the audit") {
    val root = freshRoot("pub_rows")
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      val r = Publish.publish(df, root, 1L, expectRows = Some(3L))
      assert(!r.published && r.rows == 2)
      assert(r.violations.exists(_._1.startsWith("row_count(")))
      assert(Publish.publish(df, root, 1L, expectRows = Some(2L)).published)
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("publish: versions are strictly increasing — history never rewrites") {
    val root = freshRoot("pub_mono")
    try {
      val df = Seq((1L, "a")).toDF("k", "v")
      assert(Publish.publish(df, root, 5L).published)
      intercept[IllegalArgumentException](Publish.publish(df, root, 5L))
      intercept[IllegalArgumentException](Publish.publish(df, root, 4L))
      assert(Publish.currentVersion(spark, root).contains(5L))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("expireVersions: keeps the newest N and always the served version") {
    val root = freshRoot("pub_expire")
    try {
      (1L to 4L).foreach { v =>
        assert(Publish.publish(Seq((v, s"v$v")).toDF("k", "v"), root, v).published)
      }
      val expired = Publish.expireVersions(spark, root, keepLast = 2)
      assert(expired == Seq(1L, 2L), s"expired $expired")
      assert(!new java.io.File(s"$root/v1").exists())
      assert(!new java.io.File(s"$root/v2").exists())
      assert(new java.io.File(s"$root/v3").exists())
      assertProduces(Publish.current(spark, root), Seq(Seq(4L, "v4")))
      // crashed-staging debris below the current version is cleaned
      new java.io.File(s"$root/_tmp/staging_v2").mkdirs()
      assert(Publish.expireVersions(spark, root, keepLast = 2).isEmpty)
      assert(!new java.io.File(s"$root/_tmp/staging_v2").exists())
      // keepLast never deletes the served version even if out of window
      intercept[IllegalArgumentException](
        Publish.expireVersions(spark, root, keepLast = 0))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("expireVersions: marker-less debris never counts toward keepLast; deleted below cur, untouched above") {
    val root = freshRoot("pub_debris")
    try {
      (1L to 3L).foreach { v =>
        assert(Publish.publish(Seq((v, s"v$v")).toDF("k", "v"), root, v).published)
      }
      // v2 loses its marker: the debris of a crash mid-promote. It must
      // be deleted outright and NOT occupy a keepLast slot — counting it
      // would silently shrink committed-version retention to {v3} alone.
      assert(new java.io.File(s"$root/v2/_COMMITTED").delete())
      // a marker-less dir ABOVE cur may be a LIVE publish between its
      // rename and marker PUT — retention must leave it alone
      new java.io.File(s"$root/v9").mkdirs()
      val expired = Publish.expireVersions(spark, root, keepLast = 2)
      assert(expired == Seq(2L), s"expired $expired")
      assert(new java.io.File(s"$root/v1/_COMMITTED").exists(),
        "v1 is within keepLast=2 of the COMMITTED versions {1,3}")
      assert(!new java.io.File(s"$root/v2").exists(), "debris deleted")
      assert(new java.io.File(s"$root/v3/_COMMITTED").exists())
      assert(new java.io.File(s"$root/v9").exists(),
        "marker-less dir above cur could be a live publish")
      assertProduces(Publish.current(spark, root), Seq(Seq(3L, "v3")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("crash matrix / re-fold post-publish (pre-manifest-swap): expireBatches never deletes the version the manifest references") {
    val root = freshRoot("crash_refold")
    try {
      // establish a real fold first: manifest foldedVersion = Some(M)
      assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), root, 0L))
      val rep1 = Publish.foldBatches(spark, root, targetBytes = 1L << 20)
      assert(rep1.published)
      assert(Publish.expireBatches(spark, root) == Seq(0L))
      val vM = rep1.version
      // a later batch, then a RE-FOLD that crashes between its marker
      // commit and its manifest swap: currentVersion now resolves the
      // orphan-committed v{N} while _MANIFEST still names v{M}
      assert(Publish.publishBatch(Seq((2L, "b")).toDF("k", "v"), root, 1L))
      intercept[RuntimeException](Publish.foldBatchesImpl(
        spark, root, 1L << 20, Nil, crash("published")))
      val man = Publish.readManifest(spark, root).get
      assert(man.foldedVersion.contains(vM), "manifest still names the old fold")
      assert(Publish.currentVersion(spark, root).exists(_ > vM),
        "the orphan fold version IS marker-committed")
      // the dangerous call: expiry with keepLast=1 would have deleted
      // v{M} (only cur survives) and left readCommitted dangling
      Publish.expireBatches(spark, root): Unit
      assert(new java.io.File(s"$root/v$vM").exists(),
        "the manifest-referenced version must survive expiry")
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b")))
      // re-run converges and the orphan chain vacuums
      val rep2 = Publish.foldBatches(spark, root, targetBytes = 1L << 20)
      assert(rep2.published)
      assert(Publish.expireBatches(spark, root) == Seq(1L))
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("foldBatches: a batch committed MID-FOLD (heal racing the swap) stays visible — the verified swap lists it, no heal needed") {
    val root = freshRoot("fold_midbatch")
    try {
      assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), root, 0L))
      // inject a real mid-fold commit: the hook fires at "published" —
      // after the fold's version committed, BEFORE its manifest swap.
      // publishBatch runs healManifest (the unlocked read-modify-write
      // the swap races); the verified swap must then land foldedVersion
      // AND list the new batch, not blank it until the next heal.
      val midFold: String => Unit = {
        case "published" =>
          assert(Publish.publishBatch(
            Seq((9L, "z")).toDF("k", "v"), root, 7L))
        case _ => ()
      }
      val rep = Publish.foldBatchesImpl(spark, root, 1L << 20, Nil, midFold)
      assert(rep.published && rep.foldedThrough == 0L)
      val man = Publish.readManifest(spark, root).get
      assert(man == Publish.BatchManifest(Some(rep.version), 0L, Seq(7L)),
        s"swap must fold in the mid-fold batch: $man")
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(9L, "z")))
      // and the mid-fold batch keeps committing forward normally
      assert(Publish.expireBatches(spark, root) == Seq(0L))
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(9L, "z")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  /** One staged parquet file with a controlled mtime — the file source
    * replays in mtime order, so slice k is exactly micro-batch k. */
  private def stageSlice(dir: String, df: org.apache.spark.sql.DataFrame,
      mtime: Long): Unit = {
    val p = java.nio.file.Files.createTempDirectory("graft_pub_stage")
    df.coalesce(1).write.mode("overwrite").parquet(p.toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val part = p.toFile.listFiles().filter(_.getName.startsWith("part-")).head
    val dst = java.nio.file.Paths.get(dir, part.getName)
    java.nio.file.Files.move(part.toPath, dst)
    dst.toFile.setLastModified(mtime): Unit
    graft.streaming.Streams.deleteRecursivelyNoFollow(p.toString)
  }

  test("publishBatch: manifest commits, marker carries integrity; idempotent per id; dirty batch invisible") {
    val root = freshRoot("pub_batch")
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      assert(Publish.publishBatch(df, root, 0L))
      assert(Publish.publishBatch(df, root, 0L)) // re-delivery: no-op commit
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b"))) // committed ONCE, not doubled
      val dirty = Seq[(Option[Long], String)]((None, "z")).toDF("k", "v")
      assert(!Publish.publishBatch(dirty, root, 1L, Seq(Check.NotNull("k"))))
      assert(!new java.io.File(s"$root/batch=1").exists())
      assert(!new java.io.File(s"$root/_tmp/batch_1").exists())
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b")))
      // an uncommitted leftover dir (crashed attempt) is replaced
      new java.io.File(s"$root/batch=2").mkdirs()
      assert(Publish.publishBatch(Seq((3L, "c")).toDF("k", "v"), root, 2L))
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("streamingPublish: per-micro-batch gate — dirty batches dropped whole") {
    val root = freshRoot("spub")
    try {
      val stage = s"$root/stage"
      // 4 slices = 4 micro-batches; slice 2 carries a null key → its
      // WHOLE batch must be dropped, the stream continues
      val slices = Seq(
        Seq[(Option[Long], String)]((Some(1L), "a"), (Some(2L), "b")),
        Seq[(Option[Long], String)]((Some(3L), "c")),
        Seq[(Option[Long], String)]((Some(4L), "d"), (None, "poison")),
        Seq[(Option[Long], String)]((Some(5L), "e")))
      slices.zipWithIndex.foreach { case (rows, k) =>
        stageSlice(stage, rows.toDF("k", "v"), (k + 1L) * 1000L)
      }
      val src = spark.readStream.schema("k LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(stage)
      graft.streaming.Streams.streamingPublish(
        src, s"$root/pub", s"$root/ckpt", Seq(Check.NotNull("k")))
      assertProduces(Publish.readCommitted(spark, s"$root/pub").get,
        Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(5L, "e")))
      val batchDirs = new java.io.File(s"$root/pub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
      assert(batchDirs.length == 3, s"expected 3 committed dirs, got ${batchDirs.toSeq}")
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("streamingPublish: restart from checkpoint commits each batch exactly once") {
    val root = freshRoot("spub_restart")
    try {
      val stage = s"$root/stage"
      def run(): Unit = {
        val src = spark.readStream.schema("k LONG, v STRING")
          .option("maxFilesPerTrigger", 1).parquet(stage)
        graft.streaming.Streams.streamingPublish(
          src, s"$root/pub", s"$root/ckpt", Seq(Check.NotNull("k")))
        ()
      }
      // generation 1: two clean slices
      stageSlice(stage, Seq((1L, "a")).toDF("k", "v"), 1000L)
      stageSlice(stage, Seq((2L, "b")).toDF("k", "v"), 2000L)
      run()
      assertProduces(Publish.readCommitted(spark, s"$root/pub").get,
        Seq(Seq(1L, "a"), Seq(2L, "b")))
      // generation 2: restart over late-arriving slices, one dirty
      stageSlice(stage,
        Seq[(Option[Long], String)]((None, "poison")).toDF("k", "v"), 3000L)
      stageSlice(stage, Seq((3L, "c")).toDF("k", "v"), 4000L)
      run()
      // gen-1 batches not re-committed (no doubling), dirty batch
      // dropped, late clean batch committed
      assertProduces(Publish.readCommitted(spark, s"$root/pub").get,
        Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
      val committed = new java.io.File(s"$root/pub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
      assert(committed.length == 3, s"expected 3 committed dirs, got ${committed.toSeq}")
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  // ---- streaming-root retention: fold + expire + manifest ----------

  private def crash(at: String): String => Unit =
    step => if (step == at) throw new RuntimeException(s"injected crash at $at")

  test("foldBatches/expireBatches: committed batches fold into one version, dirs expire, re-delivery stays a no-op") {
    val root = freshRoot("fold")
    try {
      val b = Seq(
        Seq((1L, "a"), (2L, "b")), Seq((3L, "c")), Seq((4L, "d")))
      b.zipWithIndex.foreach { case (rows, i) =>
        assert(Publish.publishBatch(rows.toDF("k", "v"), root, i.toLong))
      }
      // dirty batch 3 rejected — must not appear in the fold
      assert(!Publish.publishBatch(
        Seq[(Option[Long], String)]((None, "poison")).toDF("k", "v"),
        root, 3L, Seq(Check.NotNull("k"))))
      val all = Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d"))
      assertProduces(Publish.readCommitted(spark, root).get, all)

      val rep = Publish.foldBatches(spark, root, targetBytes = 1L << 20,
        constraints = Seq(Check.NotNull("k")))
      assert(rep.published && rep.batchesFolded == Seq(0L, 1L, 2L))
      assert(rep.foldedThrough == 2L && rep.rows == 4L)
      val man = Publish.readManifest(spark, root).get
      assert(man == Publish.BatchManifest(Some(rep.version), 2L, Nil))
      // fold is non-destructive; the view is unchanged either way
      assertProduces(Publish.readCommitted(spark, root).get, all)
      val expired = Publish.expireBatches(spark, root)
      assert(expired == Seq(0L, 1L, 2L), s"expired $expired")
      (0 to 2).foreach(i =>
        assert(!new java.io.File(s"$root/batch=$i").exists()))
      assertProduces(Publish.readCommitted(spark, root).get, all)
      // re-delivery of a folded-and-expired id: no-op, dir NOT recreated
      assert(Publish.publishBatch(b.head.toDF("k", "v"), root, 0L))
      assert(!new java.io.File(s"$root/batch=0").exists())
      assertProduces(Publish.readCommitted(spark, root).get, all)
      // life goes on: a post-fold batch commits beside the fold
      assert(Publish.publishBatch(Seq((5L, "e")).toDF("k", "v"), root, 4L))
      assertProduces(Publish.readCommitted(spark, root).get,
        all :+ Seq(5L, "e"))
      // second fold absorbs the fold + the new batch; old version vacuumed
      val rep2 = Publish.foldBatches(spark, root, targetBytes = 1L << 20)
      assert(rep2.published && rep2.batchesFolded == Seq(4L) &&
        rep2.foldedThrough == 4L && rep2.rows == 5L)
      assert(Publish.expireBatches(spark, root) == Seq(4L))
      assert(!new java.io.File(s"$root/v${rep.version}").exists(),
        "superseded fold version must be vacuumed")
      assertProduces(Publish.readCommitted(spark, root).get,
        all :+ Seq(5L, "e"))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("foldBatches: failed audit leaves manifest, batches, and view untouched") {
    val root = freshRoot("fold_fail")
    try {
      assert(Publish.publishBatch(
        Seq[(Option[Long], String)]((Some(1L), "a"), (None, "z"))
          .toDF("k", "v"), root, 0L))
      val before = Publish.readManifest(spark, root).get
      val rep = Publish.foldBatches(spark, root,
        constraints = Seq(Check.NotNull("k")))
      assert(!rep.published && rep.violations.nonEmpty)
      assert(Publish.readManifest(spark, root).get == before)
      assert(Publish.expireBatches(spark, root).isEmpty)
      assert(Publish.readCommitted(spark, root).get.count() == 2)
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("expireVersions: legacy history survives the marker-protocol migration; protect shields debris") {
    val root = freshRoot("pub_migrate")
    try {
      (1L to 5L).foreach { v =>
        assert(Publish.publish(Seq((v, s"v$v")).toDF("k", "v"), root, v).published)
      }
      // strip every marker: the root now looks exactly like one written
      // before the marker protocol existed (pointer still names v5)
      (1L to 5L).foreach { v =>
        assert(new java.io.File(s"$root/v$v/_COMMITTED").delete())
      }
      // first marker-protocol publish on the migrated root
      assert(Publish.publish(Seq((6L, "v6")).toDF("k", "v"), root, 6L).published)
      // v1..v5 predate the first marker -> committed HISTORY, not
      // debris: retention is plain keepLast (the pre-fix code deleted
      // all five as "provably crash debris", ignoring keepLast AND
      // protect)
      val expired = Publish.expireVersions(spark, root, keepLast = 3,
        protect = Set(3L))
      assert(expired == Seq(1L, 2L), s"expired $expired")
      Seq(3L, 4L, 5L, 6L).foreach(v =>
        assert(new java.io.File(s"$root/v$v").exists(), s"v$v must survive"))
      assertProduces(Publish.current(spark, root), Seq(Seq(6L, "v6")))
      // post-migration debris (marker-less at/above the first marker,
      // below cur) is still deleted -- unless protect names it
      assert(Publish.publish(Seq((7L, "v7")).toDF("k", "v"), root, 7L).published)
      assert(Publish.publish(Seq((8L, "v8")).toDF("k", "v"), root, 8L).published)
      assert(new java.io.File(s"$root/v7/_COMMITTED").delete())
      assert(!Publish.expireVersions(spark, root, keepLast = 10,
        protect = Set(7L)).contains(7L), "protected debris must survive")
      assert(new java.io.File(s"$root/v7").exists())
      assert(Publish.expireVersions(spark, root, keepLast = 10)
        .contains(7L), "unprotected post-migration debris is deleted")
      assert(!new java.io.File(s"$root/v7").exists())
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("readCommitted: legacy root without a manifest falls back to the marker listing") {
    val root = freshRoot("legacy")
    try {
      assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), root, 0L))
      // simulate a pre-manifest root
      assert(new java.io.File(s"$root/_MANIFEST").delete())
      assertProduces(Publish.readCommitted(spark, root).get, Seq(Seq(1L, "a")))
      // the next commit heals the manifest from the markers
      assert(Publish.publishBatch(Seq((2L, "b")).toDF("k", "v"), root, 1L))
      assert(Publish.readManifest(spark, root).get.batches == Seq(0L, 1L))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  // ---- crash-point matrix: reader-visible state is always exactly ----
  // ---- old-or-new, and recovery (re-run or expire) converges      ----

  test("crash matrix / publish post-stage: old version serves; re-run and expire both recover") {
    val root = freshRoot("crash_pub_stage")
    try {
      assert(Publish.publish(Seq((1L, "a")).toDF("k", "v"), root, 1L).published)
      val v2 = Seq((2L, "b")).toDF("k", "v")
      intercept[RuntimeException](
        Publish.publishImpl(v2, root, 2L, Nil, None, crash("staged")))
      // reader-visible state: exactly the old version
      assert(Publish.currentVersion(spark, root).contains(1L))
      assertProduces(Publish.current(spark, root), Seq(Seq(1L, "a")))
      assert(new java.io.File(s"$root/_tmp/staging_v2").exists())
      // recovery path A: re-run replaces the stale staging and commits
      assert(Publish.publish(v2, root, 2L).published)
      assertProduces(Publish.current(spark, root), Seq(Seq(2L, "b")))
      // recovery path B: expire vacuums staging debris below current
      intercept[RuntimeException](
        Publish.publishImpl(v2, root, 3L, Nil, None, crash("staged")))
      assert(Publish.publish(Seq((3L, "c")).toDF("k", "v"), root, 4L).published)
      Publish.expireVersions(spark, root, keepLast = 10)
      assert(!new java.io.File(s"$root/_tmp/staging_v3").exists())
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("crash matrix / publish post-audit and post-rename (pre-pointer-swap): pointer commits, orphan version is replaced on re-run") {
    val root = freshRoot("crash_pub_rename")
    try {
      assert(Publish.publish(Seq((1L, "a")).toDF("k", "v"), root, 1L).published)
      val v2 = Seq((2L, "b")).toDF("k", "v")
      intercept[RuntimeException](
        Publish.publishImpl(v2, root, 2L, Nil, None, crash("audited")))
      assert(Publish.currentVersion(spark, root).contains(1L))
      assert(Publish.publish(v2, root, 2L).published)
      // crash AFTER the v3 dir renames but BEFORE the pointer swap:
      // v3 exists on disk yet is provably uncommitted (pointer = commit)
      val v3 = Seq((3L, "c")).toDF("k", "v")
      intercept[RuntimeException](
        Publish.publishImpl(v3, root, 3L, Nil, None, crash("renamed")))
      assert(new java.io.File(s"$root/v3").exists())
      assert(Publish.currentVersion(spark, root).contains(2L),
        "reader must still see the old version after a torn publish")
      assertProduces(Publish.current(spark, root), Seq(Seq(2L, "b")))
      // re-run converges: the orphan dir is debris, replaced wholesale
      val r = Publish.publish(Seq((3L, "C")).toDF("k", "v"), root, 3L)
      assert(r.published)
      assertProduces(Publish.current(spark, root), Seq(Seq(3L, "C")))
      // first-publish torn swap: same story with no prior version
      val root2 = freshRoot("crash_pub_first")
      try {
        intercept[RuntimeException](Publish.publishImpl(
          Seq((9L, "x")).toDF("k", "v"), root2, 1L, Nil, None, crash("renamed")))
        assert(Publish.currentVersion(spark, root2).isEmpty)
        assert(Publish.publish(Seq((9L, "x")).toDF("k", "v"), root2, 1L).published)
        assertProduces(Publish.current(spark, root2), Seq(Seq(9L, "x")))
      } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root2)
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("crash matrix / publishBatch post-rename (pre-marker): batch invisible; re-delivery commits it") {
    val root = freshRoot("crash_batch_rename")
    try {
      assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), root, 0L))
      val b1 = Seq((2L, "b")).toDF("k", "v")
      intercept[RuntimeException](
        Publish.publishBatchImpl(b1, root, 1L, Nil, crash("renamed")))
      // dir exists but carries no marker → not visible anywhere
      assert(new java.io.File(s"$root/batch=1").exists())
      assert(!new java.io.File(s"$root/batch=1/_COMMITTED").exists())
      assertProduces(Publish.readCommitted(spark, root).get, Seq(Seq(1L, "a")))
      // re-delivery replaces the crashed dir and commits exactly once
      assert(Publish.publishBatch(b1, root, 1L))
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("crash matrix / publishBatch post-marker (pre-manifest): heals on re-delivery or next commit, never doubles") {
    val root = freshRoot("crash_batch_marker")
    try {
      assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), root, 0L))
      val b1 = Seq((2L, "b")).toDF("k", "v")
      intercept[RuntimeException](
        Publish.publishBatchImpl(b1, root, 1L, Nil, crash("marked")))
      // marker is down, manifest line is not: durable but not yet visible
      assert(new java.io.File(s"$root/batch=1/_COMMITTED").exists())
      assert(Publish.readManifest(spark, root).get.batches == Seq(0L))
      // heal path A: re-delivery of the same id repairs the manifest
      assert(Publish.publishBatch(b1, root, 1L))
      assert(Publish.readManifest(spark, root).get.batches == Seq(0L, 1L))
      assertProduces(Publish.readCommitted(spark, root).get,
        Seq(Seq(1L, "a"), Seq(2L, "b"))) // committed ONCE, not doubled
      // heal path B: a crash before ANY heal is repaired by the next batch
      intercept[RuntimeException](Publish.publishBatchImpl(
        Seq((3L, "c")).toDF("k", "v"), root, 2L, Nil, crash("marked")))
      assert(Publish.publishBatch(Seq((4L, "d")).toDF("k", "v"), root, 3L))
      assert(Publish.readManifest(spark, root).get.batches ==
        Seq(0L, 1L, 2L, 3L))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("crash matrix / foldBatches post-publish (pre-manifest-swap): readers keep the old view; re-run converges") {
    val root = freshRoot("crash_fold")
    try {
      assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), root, 0L))
      assert(Publish.publishBatch(Seq((2L, "b")).toDF("k", "v"), root, 1L))
      val all = Seq(Seq(1L, "a"), Seq(2L, "b"))
      intercept[RuntimeException](Publish.foldBatchesImpl(
        spark, root, 1L << 20, Nil, crash("published")))
      // the fold's version published but the manifest never swapped:
      // readers still resolve the batch view — the exact old state
      val man = Publish.readManifest(spark, root).get
      assert(man.foldedVersion.isEmpty && man.batches == Seq(0L, 1L))
      assertProduces(Publish.readCommitted(spark, root).get, all)
      assert(Publish.expireBatches(spark, root).isEmpty,
        "expire must not touch batches the manifest still references")
      // re-run converges: folds again at the next version, then expiry
      // vacuums both the orphan version and the folded dirs
      val rep = Publish.foldBatchesImpl(spark, root, 1L << 20, Nil, Publish.noHook)
      assert(rep.published && rep.foldedThrough == 1L)
      assert(Publish.expireBatches(spark, root) == Seq(0L, 1L))
      assert(!new java.io.File(s"$root/v${rep.version - 1}").exists(),
        "orphan fold version must be vacuumed by expiry")
      assertProduces(Publish.readCommitted(spark, root).get, all)
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("compact: stages then promotes — outDir never half-written; overlap with inDir refused") {
    val root = freshRoot("compact_stage")
    try {
      (1L to 100L).toDF("k").repartition(4).write.parquet(s"$root/in")
      // in-place / nested rewrites are refused in both directions
      intercept[IllegalArgumentException](
        Publish.compact(spark, s"$root/in", s"$root/in", 1L << 20))
      intercept[IllegalArgumentException](
        Publish.compact(spark, s"$root/in", s"$root/in/sub", 1L << 20))
      intercept[IllegalArgumentException](
        Publish.compact(spark, s"$root/in", root, 1L << 20))
      // a leftover staging dir from a crashed run is replaced on re-run
      new java.io.File(s"$root/_tmp_compact_out").mkdirs()
      val rep = Publish.compact(spark, s"$root/in", s"$root/out", 1L << 20)
      assert(rep.filesOut >= 1)
      assert(!new java.io.File(s"$root/_tmp_compact_out").exists(),
        "staging dir must be promoted away")
      assert(spark.read.parquet(s"$root/out").count() == 100)
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  // ---- object-store commit contract: no atomic rename assumed --------

  private def writeFile(path: String, content: String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), content): Unit
  }

  private def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  test("object-store contract: a half-copied version dir (torn non-atomic rename) is invisible and replaced on re-run") {
    val root = freshRoot("torn_rename")
    try {
      assert(Publish.publish(Seq((1L, "a")).toDF("k", "v"), root, 1L).published)
      // simulate an S3-class copy+delete promote dying mid-copy: v2
      // exists with a partial data file and NO _COMMITTED marker
      writeFile(s"$root/v2/part-00000.parquet", "partial garbage")
      assert(Publish.currentVersion(spark, root).contains(1L),
        "readers must never resolve a marker-less version dir")
      assertProduces(Publish.current(spark, root), Seq(Seq(1L, "a")))
      // the re-run replaces the debris wholesale and commits
      assert(Publish.publish(Seq((2L, "b")).toDF("k", "v"), root, 2L).published)
      assertProduces(Publish.current(spark, root), Seq(Seq(2L, "b")))
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("object-store contract: stale, torn, or missing pointer neither hides nor tears the committed view; healPointer repairs it") {
    val root = freshRoot("ptr")
    try {
      assert(Publish.publish(Seq((1L, "a")).toDF("k", "v"), root, 1L).published)
      assert(Publish.publish(Seq((2L, "b")).toDF("k", "v"), root, 2L).published)
      // missing pointer: the marker scan still resolves v2
      assert(new java.io.File(s"$root/_LATEST").delete())
      assert(Publish.currentVersion(spark, root).contains(2L))
      // torn pointer (half-written garbage on a non-atomic store)
      writeFile(s"$root/_LATEST", "garbage bytes")
      assert(Publish.currentVersion(spark, root).contains(2L))
      // stale pointer (crash between marker and refresh): markers win
      writeFile(s"$root/_LATEST", "1")
      assert(Publish.currentVersion(spark, root).contains(2L),
        "a committed version must not be hidden by a stale advisory pointer")
      assertProduces(Publish.current(spark, root), Seq(Seq(2L, "b")))
      assert(Publish.healPointer(spark, root).contains(2L))
      assert(readFile(s"$root/_LATEST").trim == "2")
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("crash matrix / publish post-marker (pre-pointer-refresh): the version IS committed and visible; same-version re-publish fails loudly") {
    val root = freshRoot("crash_committed")
    try {
      assert(Publish.publish(Seq((1L, "a")).toDF("k", "v"), root, 1L).published)
      intercept[RuntimeException](Publish.publishImpl(
        Seq((2L, "b")).toDF("k", "v"), root, 2L, Nil, None, crash("committed")))
      // the advisory pointer still names v1, but the marker committed v2
      assert(readFile(s"$root/_LATEST").trim == "1")
      assert(Publish.currentVersion(spark, root).contains(2L))
      assertProduces(Publish.current(spark, root), Seq(Seq(2L, "b")))
      // v2 is committed, so re-publishing it is the history-rewrite bug
      intercept[IllegalArgumentException](
        Publish.publish(Seq((9L, "x")).toDF("k", "v"), root, 2L))
      // life goes on: the next publish lands above it and refreshes
      assert(Publish.publish(Seq((3L, "c")).toDF("k", "v"), root, 3L).published)
      assert(readFile(s"$root/_LATEST").trim == "3")
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  // ---- writer lease ---------------------------------------------------

  test("writer lease: a live foreign _LOCK blocks publish and foldBatches loudly; an expired one is taken over; the lease is released after commit") {
    val root = freshRoot("lease")
    try {
      assert(Publish.publish(Seq((1L, "a")).toDF("k", "v"), root, 1L).published)
      assert(!new java.io.File(s"$root/_LOCK").exists(),
        "the lease must be released after a successful publish")
      writeFile(s"$root/_LOCK",
        s"someone-else ${System.currentTimeMillis() + 600000}")
      val e = intercept[RuntimeException](
        Publish.publish(Seq((2L, "b")).toDF("k", "v"), root, 2L))
      assert(e.getMessage.contains("another writer holds the lease"))
      assert(Publish.currentVersion(spark, root).contains(1L))
      // an expired lease is a crashed holder's debris: taken over
      writeFile(s"$root/_LOCK",
        s"dead-writer ${System.currentTimeMillis() - 1000}")
      assert(Publish.publish(Seq((2L, "b")).toDF("k", "v"), root, 2L).published)
      assert(!new java.io.File(s"$root/_LOCK").exists())
      // foldBatches honors the same lease
      val broot = freshRoot("lease_fold")
      try {
        assert(Publish.publishBatch(Seq((1L, "a")).toDF("k", "v"), broot, 0L))
        writeFile(s"$broot/_LOCK",
          s"someone-else ${System.currentTimeMillis() + 600000}")
        val ef = intercept[RuntimeException](Publish.foldBatches(spark, broot))
        assert(ef.getMessage.contains("another writer holds the lease"))
      } finally graft.streaming.Streams.deleteRecursivelyNoFollow(broot)
      // a failing publish releases the lease too (crash injection)
      intercept[RuntimeException](Publish.publishImpl(
        Seq((3L, "c")).toDF("k", "v"), root, 3L, Nil, None, crash("staged")))
      assert(!new java.io.File(s"$root/_LOCK").exists(),
        "the lease must be released on a crashed publish")
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("writer lease: two drivers racing publish on one root — exactly one commits, the loser fails loudly") {
    val root = freshRoot("lease_race")
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val racers = Seq(
        Seq((1L, "a")).toDF("k", "v"), Seq((2L, "b")).toDF("k", "v"))
        .map(d => Future(scala.util.Try(Publish.publish(d, root, 1L))))
      val rs = Await.result(Future.sequence(racers), 300.seconds)
      assert(rs.count(r => r.isSuccess && r.get.published) == 1,
        s"exactly one racer must publish: $rs")
      assert(rs.count(_.isFailure) == 1,
        s"the losing racer must fail loudly (lease or version check): $rs")
      assert(Publish.currentVersion(spark, root).contains(1L))
      assert(!new java.io.File(s"$root/_LOCK").exists())
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  // ---- manifest-recorded sizes ---------------------------------------

  test("manifest sizes: batch bytes recorded at commit; fold sizes itself from the manifest, not per-batch listings") {
    val root = freshRoot("sizes")
    try {
      (0 to 4).foreach { i =>
        assert(Publish.publishBatch(
          Seq((i.toLong, s"v$i")).toDF("k", "v"), root, i.toLong))
      }
      val (sizes, folded0) = Publish.readManifestSizes(spark, root)
      assert(sizes.keySet == (0L to 4L).map(identity).toSet && folded0.isEmpty)
      sizes.foreach { case (id, b) =>
        assert(b == Publish.dataFiles(spark, s"$root/batch=$id").map(_._2).sum,
          s"manifest bytes for batch $id must equal the listing")
      }
      Publish.listingCalls.set(0L)
      val rep = Publish.foldBatches(spark, root, targetBytes = 1L << 20)
      assert(rep.published)
      val calls = Publish.listingCalls.get.longValue
      assert(calls <= 2,
        s"fold must size from the manifest, not O(batches) listings (saw $calls dataFiles calls)")
      // the fold recorded its own bytes for the NEXT fold's sizing
      val (_, fb) = Publish.readManifestSizes(spark, root)
      assert(fb.contains(
        Publish.dataFiles(spark, s"$root/v${rep.version}").map(_._2).sum))
      assert(Publish.publishBatch(Seq((9L, "z")).toDF("k", "v"), root, 9L))
      Publish.listingCalls.set(0L)
      assert(Publish.foldBatches(spark, root, targetBytes = 1L << 20).published)
      assert(Publish.listingCalls.get.longValue <= 2,
        "second fold must read the previous fold's bytes from the manifest")
    } finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)
  }

  test("dedupAudit: `kept` is exactly the nearDupDedup survivor set; sizes add up") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val audit = Dedup.dedupAudit(docs, threshold = 0.6).cache()
    val survivors = Dedup.nearDupDedup(docs, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    val kept = audit.filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(kept == survivors,
      s"audit kept ${kept.size} != survivors ${survivors.size}")
    // every document appears exactly once; cluster sizes match membership
    assert(audit.count() == docs.count())
    val sizeOk = audit.filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id").agg(
        count(lit(1)).as("n"), first("cluster_size").as("sz"),
        countDistinct("cluster_size").as("nsz"))
      .filter(col("n") =!= col("sz") || col("nsz") =!= 1)
    assert(sizeOk.isEmpty, "cluster_size must equal the member count")
    audit.unpersist()
  }
}
