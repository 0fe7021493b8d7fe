package graft

import graft.dsl._
import graft.ops.Ops
import org.apache.spark.sql.SparkSession

/** Manual smoke driver: runs real queries through the public DSL against
  * the driver-generated parquet testdata. `sbt "Test/runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // TPC-H-ish pricing summary through the DSL (join-free agg)
    val q1 = query("?l_returnflag", "?l_linestatus", "?sum_qty", "?cnt")(
      parquet(s"$sf/lineitem.parquet")(
        "_", "_", "_", "_", "?l_quantity", "_", "_", "_",
        "?l_returnflag", "?l_linestatus", "_"),
      Ops.sum("?l_quantity") :> "?sum_qty",
      Ops.count() :> "?cnt")
    println("== q1 pricing summary ==")
    q1.toDF(spark).show()

    // join + agg: order count per customer market segment
    val q3 = query("?c_mktsegment", "?orders")(
      parquet(s"$sf/customer.parquet")("?ck", "_", "_", "_", "?c_mktsegment"),
      parquet(s"$sf/orders.parquet")("_", "?ck", "_", "_", "_", "_"),
      Ops.count() :> "?orders")
    println("== q3 orders per segment ==")
    q3.toDF(spark).show()
    println("== q3 physical plan ==")
    q3.toDF(spark).explain("formatted")

    // pipeline operators over the real documents/embeddings tables
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Dedup, Similarity, TextAnalysis}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    println("== exact-dedup summary (top dup groups) ==")
    Dedup.exact(docs).orderBy(col("dup_count").desc).show(3)
    println("== minhash near-dup candidates on documents ==")
    println("candidate pairs: " + Dedup.minhashCandidates(docs, k = 64, bands = 32).count())
    println("== text analysis sample ==")
    TextAnalysis.annotate(docs.limit(3))
      .select("doc_id", "lang", "lang_pred", "token_count", "bpeish_tokens", "fingerprint")
      .show(3, truncate = false)
    println("== brute-force knn (3 probes) ==")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Similarity.bruteForceKnn(emb,
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("probe_id"), col("embedding")),
      k = 3).show()
    spark.stop()
  }
}
