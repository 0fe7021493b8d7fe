package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sh = time("shingles") {
      val d = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("_sh"))
      d.count(); d
    }
    val sigs = time("minhash k=64") {
      val d = sh.select(col("doc_id"), Dedup.minhashSignature(col("_sh"), 64).as("sig"))
      d.count(); d
    }
    val cached = sigs.cache()
    time("sigs materialize")(cached.count())
    val banded = time("banding") {
      val b = Dedup.lshBands(cached, "doc_id", "sig", 16, sigLen = 64)
      b.count(); b
    }
    time("bucket stats") {
      banded.groupBy("band", "band_hash").count()
        .agg(max("count").as("max_bucket"), avg("count").as("avg_bucket"),
          count(lit(1)).as("n_buckets")).show()
    }
    val l = banded.toDF("id_a", "band", "band_hash")
    val r = banded.toDF("id_b", "band", "band_hash")
    time("bucket join") {
      println("joined pairs: " +
        l.join(r, Seq("band", "band_hash")).filter(col("id_a") < col("id_b")).count())
    }
    spark.stop()
  }
}
