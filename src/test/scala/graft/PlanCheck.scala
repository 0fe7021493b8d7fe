package graft

import org.apache.spark.sql.SparkSession

/** Prints the physical plans of the heaviest SparkEntry queries at a given
  * scale factor — the `.explain` iteration loop the build guide asks for. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = args.drop(1) match {
      case Array() => Seq("q03_join_agg", "q18_buffer_first", "q27_except")
      case rest => rest.toSeq
    }
    targets.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
