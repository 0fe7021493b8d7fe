package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-wise wall-clock profile of the near-dup dedup pipeline at sf0.1:
  * `sbt "Test/runMain graft.DedupProfile"`. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val cands = time("candidates (count)") {
      val c = Dedup.minhashCandidates(docs, k = 64, bands = 16).localCheckpoint()
      println("  pairs: " + c.count()); c
    }
    val verified = time("jaccard verify (count)") {
      val v = Dedup.jaccardVerify(cands, docs, threshold = 0.6).localCheckpoint()
      println("  edges: " + v.count()); v
    }
    val comp = time("components (count)") {
      val c = Dedup.components(verified.select("id_a", "id_b"))
      println("  labels: " + c.count()); c
    }
    time("full nearDupDedup") {
      println("  survivors: " + Dedup.nearDupDedup(docs, threshold = 0.6).count())
    }
    spark.stop()
  }
}
