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

  test("publishBatch: marker is the commit point; idempotent per id; dirty batch invisible") {
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
