package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join profile: one viral key holding 30M of 30.3M fact rows, shuffle
  * join forced (broadcast off). Plain sort-merge lands the hot key in ONE
  * reducer; salting bounds any task at ~hot/16 (local tuning only). */
object SkewProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[skew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val fact = spark.range(30000000L).select(lit(1L).as("k"), col("id").as("v"))
      .unionAll(spark.range(300000L).select(
        (col("id") % 1000L + 2L).as("k"), col("id").as("v")))
      .repartition(32).localCheckpoint()
    val dim = spark.range(1001L).select(col("id").as("k"), (col("id") * 7L).as("w"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("plain shuffle join, 1 hot key @30.3M")(
        fact.join(dim, Seq("k")).agg(sum("w")).count())
      time("salted join (16 salts) @30.3M")(
        SkewJoin.saltedJoin(fact, dim, Seq("k"), salts = 16,
          hotKeyThreshold = 100000L).agg(sum("w")).count())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      time("plain join + AQE @30.3M")(
        fact.join(dim, Seq("k")).agg(sum("w")).count())
      time("salted join + AQE @30.3M")(
        SkewJoin.saltedJoin(fact, dim, Seq("k"), salts = 16,
          hotKeyThreshold = 100000L).agg(sum("w")).count())
    }
    // persisted stats tap: counting pass paid once at write, every later
    // join reads the tiny stats table instead of re-scanning 30M rows
    val statsDir = java.nio.file.Files.createTempDirectory("skew_stats").toString
    time("writeKeyStats (one-time counting pass) @30.3M")(
      { SkewJoin.writeKeyStats(fact, Seq("k"), statsDir); 1L })
    val hot = SkewJoin.hotFromStats(spark, statsDir, Seq("k"), 100000L)
    time("salted join via stats tap (no counting pass) @30.3M")(
      SkewJoin.saltedJoin(fact, dim, Seq("k"), salts = 16,
        hot = Some(hot), saltBy = Seq("v")).agg(sum("w")).count())
    spark.stop()
  }
}
