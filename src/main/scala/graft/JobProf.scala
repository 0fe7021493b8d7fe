package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-level decomposition of one declared query (local tuning only):
  * runs the query once warm, then once timed with a listener that prints
  * every job's wall duration, task time, and the callsite that scheduled
  * it — the "which of the 30 jobs inside p51 costs the time" view the
  * aggregate bench can't give. Usage:
  *   SPARK_GRAFT_ONLY=p51_similarity_rank runMain graft.JobProf */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "p51_similarity_rank")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // same conf-override contract as Bench/Verify (profiling A/Bs)
    sys.env.get("SPARK_GRAFT_CONF").foreach { raw =>
      val sep = if (raw.contains(';')) ';' else ','
      raw.split(sep).map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty => builder.config(k, v)
          case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
        }
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.jobId, (je.time - t0) / 1e3, site))
        }
      }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain: wait (bounded) until every started job has ended, so a
      // straggler job is neither dropped nor attributed to the next
      // query's rows (ADVICE r17)
      var waited = 0
      while (!starts.isEmpty && waited < 100) { Thread.sleep(100); waited += 1 }
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      starts.clear()
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._1)
      println(f"[jobprof] $n wall=$wall%.2f s, ${all.size} jobs, " +
        f"sum=${all.map(_._2).sum}%.2f s")
      all.foreach { case (id, d, site) =>
        println(f"[jobprof]   job $id%3d ${d}%6.3f s  $site")
      }
      rows.clear()
    }
    spark.stop()
  }
}
