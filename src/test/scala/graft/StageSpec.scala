package graft

import graft.pipeline.{Curate, Dedup}
import org.apache.spark.sql.functions._

/** The checkpoint-mode switch: every library stage boundary must produce
  * identical results under local (executor-block) and reliable (durable
  * storage) materialization — the cluster-survivability path VERDICT r2
  * asked for. */
class StageSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def withMode[A](mode: String, dir: String = "")(f: => A): A = {
    val prevMode = spark.conf.get(Stage.ModeKey, "local")
    val prevDir = spark.conf.get(Stage.DirKey, "")
    try {
      spark.conf.set(Stage.ModeKey, mode)
      if (dir.nonEmpty) spark.conf.set(Stage.DirKey, dir)
      f
    } finally {
      spark.conf.set(Stage.ModeKey, prevMode)
      spark.conf.set(Stage.DirKey, prevDir)
    }
  }

  test("near-dup dedup identical under local and reliable modes") {
    def survivors = Dedup.nearDupDedup(docs, threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val local = withMode("local")(survivors)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val reliableParquet = withMode("reliable", tmp)(survivors)
    assert(local == reliableParquet, "parquet-boundary mode diverged")
    // parquet stage files actually landed under the configured dir
    assert(new java.io.File(tmp).listFiles().exists(_.getName.startsWith("stage_")))
    // checkpoint-dir variant: setCheckpointDir routes through df.checkpoint()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      val reliableCkpt = withMode("reliable")(survivors)
      assert(local == reliableCkpt, "rdd-checkpoint mode diverged")
      assert(new java.io.File(ckpt).listFiles().nonEmpty)
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("curation pipeline identical under both modes") {
    def curated = Curate.curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val local = withMode("local")(curated)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage2").toString
    val reliable = withMode("reliable", tmp)(curated)
    assert(local == reliable)
  }

  test("dsl checkpointed generator works in reliable mode") {
    import graft.dsl._
    import graft.ops.Ops
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage3").toString
    withMode("reliable", tmp) {
      val src = mem(Seq(Seq("a", 1L), Seq("a", 2L), Seq("b", 3L)))("?k", "?v")
      val mid = checkpointed(src)
      assertProduces(
        query("?k", "?sum")(mid, Ops.sum("?v") :> "?sum"),
        Seq(Seq("a", 3L), Seq("b", 3L)))
    }
  }

  test("local mode honors the storage-level knob and stays result-identical") {
    def survivors = Dedup.nearDupDedup(docs, threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val default = withMode("local")(survivors)
    for (lvl <- Seq("DISK_ONLY", "MEMORY_AND_DISK_SER")) {
      spark.conf.set(Stage.LocalLevelKey, lvl)
      try assert(withMode("local")(survivors) == default, s"$lvl diverged")
      finally spark.conf.unset(Stage.LocalLevelKey)
    }
    // a bogus level fails loudly at the boundary, not deep in a job
    spark.conf.set(Stage.LocalLevelKey, "NOT_A_LEVEL")
    try assertThrows[IllegalArgumentException](
      Stage.materialize(docs.limit(1)))
    finally spark.conf.unset(Stage.LocalLevelKey)
  }

  test("unknown mode fails loudly; reliable without a dir fails loudly") {
    val df = Seq((1L, "x")).toDF("id", "t")
    withMode("nonsense") {
      assertThrows[IllegalArgumentException](Stage.materialize(df))
    }
    withMode("reliable") {
      assertThrows[IllegalArgumentException](Stage.materialize(df))
    }
  }
}
