package graft

import graft.operators.{Check, Publish}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the dataset-lifecycle ops (run manually per round,
  * results recorded in BASELINE.md): compaction and write-audit-publish
  * cost at sf0.01 vs sf0.1 (10× rows). The claims under test:
  *  - compact is one distributed rewrite job — cost tracks BYTES, the
  *    driver-side listing is metadata-only;
  *  - publish's audit folds the row count and every single-scan
  *    constraint (not_null, in_range) into ONE aggregation over the
  *    staged files — with the constraints below the audit is exactly
  *    one scan (key-level unique/ref_in constraints would add one job
  *    each) — so audit overhead stays a small multiple of the stage
  *    write at any scale. */
object PublishProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = "/tmp/graft_publish_probe"
    graft.streaming.Streams.deleteRecursivelyNoFollow(root)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    Seq("sf0.01", "sf0.1").foreach { sf =>
      val li = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
      li.count() // warm the file index
      val frag = s"$root/${sf}_frag"
      t(s"[$sf] fragment 64-way write")(
        li.repartition(64).write.mode("overwrite").parquet(frag))
      val bytes = Publish.dataFiles(spark, frag).map(_._2).sum
      val rep = t(s"[$sf] compact 64 files -> target bytes/8")(
        Publish.compact(spark, frag, s"$root/${sf}_cmp",
          targetBytes = (bytes + 7) / 8, sortCols = Seq("l_orderkey")))
      println(s"[$sf] compact report: filesIn=${rep.filesIn} bytesIn=${rep.bytesIn} " +
        s"filesOut=${rep.filesOut} bytesOut=${rep.bytesOut}")

      val pubRoot = s"$root/${sf}_pub"
      val df = li.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      val r1 = t(s"[$sf] publish v1 (stage+audit+promote, 2 constraints)")(
        Publish.publish(df, pubRoot, 1L,
          Seq(Check.NotNull("l_orderkey"),
            Check.InRange("l_quantity", 0, 100))))
      println(s"[$sf] publish: rows=${r1.rows} published=${r1.published}")
      t(s"[$sf] stage-only write (the publish floor)")(
        df.write.mode("overwrite").parquet(s"$root/${sf}_floor"))
    }

    // fold sizing: manifest-recorded bytes vs per-batch listings. At
    // cluster scale each dataFiles call is a recursive LIST round trip
    // against the store — the manifest path removes the O(batches) term
    // (VERDICT r13 item #8).
    Seq(("manifest-sized", true), ("legacy (sizes stripped)", false))
      .foreach { case (label, keepSizes) =>
        val froot = s"$root/fold_$keepSizes"
        (0L until 20L).foreach(i => Publish.publishBatch(
          spark.range(i * 50, i * 50 + 50).toDF("k"), froot, i))
        if (!keepSizes) // legacy root: heal rebuilds the manifest without sizes
          new java.io.File(s"$froot/_MANIFEST").delete(): Unit
        Publish.listingCalls.set(0L)
        t(s"fold 20 batches [$label]")(
          Publish.foldBatches(spark, froot, 8L << 20))
        println(s"fold dataFiles listings [$label]: ${Publish.listingCalls.get}")
      }
    graft.streaming.Streams.deleteRecursivelyNoFollow(root)
    spark.stop()
  }
}
