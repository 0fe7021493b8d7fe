package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Volume probe for the funnel/retention family: sf0.1 events
  * (~100k rows) vs a 100×-replicated stream — both ops must scale in
  * the event count with key-carried parallelism (min-cascade /
  * dedupe-first shapes, no whole-table windows). */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev0 = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    // the SparkEntry.tsUs contract: long nanos, NTZ, or LTZ timestamps
    val tsCol = ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col("ts"))
    }
    val base = ev0.select(col("user_id"), tsCol.as("us"), col("event_type"))
    val big = "/tmp/graft_scale/events100x.parquet"
    if (!new java.io.File(big).exists()) {
      (0 until 100).map(i =>
        base.withColumn("user_id", col("user_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _).repartition(32).write.mode("overwrite").parquet(big)
    }
    val bigEv = spark.read.parquet(big)
    bigEv.count() // warm page cache
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val steps = Seq("view", "click", "purchase")
    val span = Some(lit(604800000000L))
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      t("funnel @100k")(Funnel.funnel(base, steps, tsCol = "us", maxSpan = span).count())
      t("funnel @10M")(Funnel.funnel(bigEv, steps, tsCol = "us", maxSpan = span).count())
      t("retention @100k")(Funnel.retention(base, 604800000000L, tsCol = "us").count())
      t("retention @10M")(Funnel.retention(bigEv, 604800000000L, tsCol = "us").count())
    }
    spark.stop()
  }
}
