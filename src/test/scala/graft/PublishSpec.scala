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
