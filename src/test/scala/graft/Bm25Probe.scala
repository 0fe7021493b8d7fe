package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** 10×-volume probe for BM25 + TF-IDF: sf0.1 documents (5k docs)
  * vs a 100×-replicated corpus (500k docs) — verifies both ops scale
  * linearly in corpus tokens with no driver loops beyond the two
  * bm25Train scalars. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = "/tmp/graft_scale/documents100x.parquet"
    if (!new java.io.File(big).exists()) {
      (0 until 100).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _).repartition(32).write.mode("overwrite").parquet(big)
    }
    val bigDocs = spark.read.parquet(big)
    bigDocs.count() // warmup page cache
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val q = Seq("spark", "window", "stream", "merge")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      t("bm25Gate @5k")(TextAnalysis.bm25Gate(docs, q).count())
      t("bm25Gate @500k")(TextAnalysis.bm25Gate(bigDocs, q).count())
      t("tfidfTopTerms(3) @5k")(TextAnalysis.tfidfTopTerms(docs, 3).count())
      t("tfidfTopTerms(3) @500k")(TextAnalysis.tfidfTopTerms(bigDocs, 3).count())
    }
    spark.stop()
  }
}
