package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan-evidence artifact of an optimization round (plans/rN/<q>.txt).
  * Usage: runMain graft.Plans <outDir> [q1,q2,...]  (default: all).
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Plans <outDir> [q1,q2,...]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val names = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          // stage-boundary queries (localCheckpoint / scratch taps) must
          // EXECUTE their upstream stages before the final frame can even
          // be planned, so building the frame is the dump, not a dry run
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val w = new java.io.PrintWriter(new java.io.File(outDir, s"$n.txt"))
          try w.write(plan) finally w.close()
          println(s"[plans] wrote $n (${plan.length} chars)")
        case None => println(s"[plans] UNKNOWN query $n — skipped")
      }
    }
    spark.stop()
  }
}
