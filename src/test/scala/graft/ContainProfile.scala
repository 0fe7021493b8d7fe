package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession

/** Stage-wise profile of the containment pipeline at sf0.1:
  * `sbt "Test/runMain graft.ContainProfile"`. */
object ContainProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count() // warm

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    for ((dfCap, hmin) <- Seq((64, 1), (64, 6), (64, 7))) {
      val cands = time(s"candidates dfCap=$dfCap hmin=$hmin (count)") {
        val c = Dedup.containmentCandidates(docs, m = 8, maxDocFreq = dfCap,
          minProbeHits = hmin).localCheckpoint()
        println("  pairs: " + c.count()); c
      }
      time(s"verify dfCap=$dfCap hmin=$hmin (count)") {
        println("  kept: " +
          Dedup.containmentVerify(cands, docs, threshold = 0.8).count())
      }
    }
    spark.stop()
  }
}
