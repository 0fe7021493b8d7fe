package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of p57 decontaminate (local tuning only). */
object DecontProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(!col("source").isin("src0", "src1"))
    val eval_ = docs.filter(col("source").isin("src0", "src1"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val bt = Dedup.bandedSignatures(train)
      t("bt count")(println("  bt=" + bt.count()))
      val be = Dedup.bandedSignatures(eval_)
        .select(col("doc_id").as("eval_id"), col("band"), col("band_key"))
      t("be count")(println("  be=" + be.count()))
      val cands = bt.join(broadcast(be), Seq("band", "band_key"))
        .select(col("doc_id").as("train_id"), col("eval_id")).distinct()
      t("cands count")(println("  cands=" + cands.count()))
      t("full p57")(println("  surv=" +
        Dedup.decontaminate(train, eval_, threshold = 0.8).count()))
    }
    spark.stop()
  }
}
