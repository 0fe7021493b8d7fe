package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q40's cold time go? Times each stage of the bloom join
  * separately, twice, in one JVM — run manually while tuning. */
object BloomProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val supplier = spark.read.parquet(s"$sf/supplier.parquet")
    val dim = supplier.filter(col("s_nationkey") < 13)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("scan only")(lineitem.count())
      time("build filter")(
        BloomJoin.buildFilter(dim.select("l_suppkey"), Seq("l_suppkey")).count())
      val filt = BloomJoin.buildFilter(dim.select("l_suppkey"), Seq("l_suppkey"))
      time("prune")(BloomJoin.prune(lineitem, Seq("l_suppkey"), filt).count())
      time("full bloomJoin + agg")(
        BloomJoin.bloomJoin(lineitem, dim, Seq("l_suppkey"))
          .groupBy("s_nationkey").count().count())
      time("plain join + agg")(
        lineitem.join(dim, Seq("l_suppkey"))
          .groupBy("s_nationkey").count().count())
    }
    spark.stop()
  }
}
