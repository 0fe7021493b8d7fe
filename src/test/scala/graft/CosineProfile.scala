package graft

import graft.functions.VectorExpressions
import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CosineProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    emb.count()
    val probes = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb")).cache()
    probes.count()
    val pairs = emb.crossJoin(broadcast(probes)) // 5000 x 200 = 1M pairs

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(pairs.count())
    time("HOF zip_with/aggregate cosine, 1M pairs") {
      pairs.select(sum(Similarity.cosine(col("embedding"), col("p_emb")))).show()
    }
    time("native codegen CosineSim, 1M pairs") {
      pairs.select(sum(VectorExpressions.cosine(spark, col("embedding"), col("p_emb")))).show()
    }
    spark.stop()
  }
}
