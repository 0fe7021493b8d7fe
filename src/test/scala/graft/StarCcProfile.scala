package graft
import org.apache.spark.sql.SparkSession
object StarCcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()
    // warm both paths once at sf0.01 to normalize JIT
    val small = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    graft.pipeline.Dedup.nearDupDedup(small, threshold = 0.6).count()
    graft.pipeline.Dedup.nearDupDedup(small, threshold = 0.6, ccAlgorithm = "star").count()
    time("nearDupDedup label @sf0.1")(
      graft.pipeline.Dedup.nearDupDedup(docs, threshold = 0.6).count())
    time("nearDupDedup star @sf0.1")(
      graft.pipeline.Dedup.nearDupDedup(docs, threshold = 0.6, ccAlgorithm = "star").count())
    spark.stop()
  }
}
