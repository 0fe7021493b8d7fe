package graft

import org.apache.spark.sql.SparkSession

/** Print the physical plan of a driver-contract query at a given sf:
  * `sbt "Test/runMain graft.PlanPeek q03_join_agg"`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q03_join_agg")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sf)
    df.explain("formatted")
    spark.stop()
  }
}
