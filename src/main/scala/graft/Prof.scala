package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: min-of-N timings for selected SparkEntry queries
  * (local tuning only — the driver's Bench stays single-shot). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",")
      .map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val sel =
      if (names.isEmpty) SparkEntry.queries.toSeq
      else names.flatMap(n => SparkEntry.queries.get(n).map(n -> _)).toSeq
    var total = 0.0
    sel.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      total += times.min
      println(f"[prof] $name%-24s min=${times.min}%.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    println(f"[prof] TOTAL(min) $total%.2f s")
    spark.stop()
  }
}
