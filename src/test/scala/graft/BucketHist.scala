package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: LSH bucket-size distribution of a corpus, the
  * near-cap salting's task structure, and the executed plan of the
  * candidate query — run manually when a straggler probe flags the
  * candidate stage (`Test/runMain graft.BucketHist <sfDir>`). */
object BucketHist {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10skew"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b = pipeline.Dedup.bandedSignatures(docs, "text", "doc_id", 64, 16, 3)
    val sizes = b.groupBy("band", "band_key").count()
    val hist = sizes.select(
      when(col("count") === 1, "a_1")
        .when(col("count") <= 32, "b_2-32")
        .when(col("count") <= 256, "c_33-256")
        .when(col("count") <= 1024, "d_257-1024")
        .when(col("count") <= 2048, "e_1025-2048")
        .when(col("count") <= 4096, "f_2049-4096")
        .otherwise("g_over_cap").as("cls"),
      col("count"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_buckets"), sum("count").as("rows"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs"),
        max("count").as("max_size"))
      .orderBy("cls")
    hist.collect().foreach(r => println(
      f"${r.getString(0)}%-12s buckets=${r.getLong(1)}%9d rows=${r.getLong(2)}%10d pairs=${r.getDouble(3)}%14.0f max=${r.getLong(4)}%7d"))
    // the salted range in detail: per-bucket nb and per-task pair bound
    val salted = sizes.filter(col("count") > 1024 && col("count") <= 4096)
      .withColumn("nb", ceil(col("count") / lit(1024.0)))
      .withColumn("tasks", (col("nb") * (col("nb") + 1) / 2).cast("long"))
    val agg = salted.agg(count(lit(1)), sum("tasks"), max("count")).collect()(0)
    println(s"salted buckets=${agg.get(0)} join-tasks=${agg.get(1)} max=${agg.get(2)}")
    salted.orderBy(desc("count")).limit(10).collect().foreach(r =>
      println(s"  band=${r.get(0)} size=${r.get(2)} nb=${r.get(3)}"))
    // now run the candidate query itself with a FULL stage dump + the
    // executed plan, to locate the straggler stage precisely
    if (args.length > 1 && args(1) == "run") {
      import org.apache.spark.scheduler._
      val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long, String)]()
      val durs = scala.collection.mutable.HashMap[Int, scala.collection.mutable.ArrayBuffer[Long]]()
      val tasks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)]()
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
          if (t.taskInfo != null) {
            durs.getOrElseUpdate(t.stageId,
              scala.collection.mutable.ArrayBuffer[Long]()) += t.taskInfo.duration
            val m = t.taskMetrics
            tasks += ((t.stageId, t.taskInfo.index, t.taskInfo.duration,
              if (m != null) m.shuffleReadMetrics.totalBytesRead else -1L,
              if (m != null) m.outputMetrics.recordsWritten +
                m.shuffleWriteMetrics.recordsWritten else -1L))
          }
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
          val m = s.stageInfo.taskMetrics
          val d = durs.getOrElse(s.stageInfo.stageId,
            scala.collection.mutable.ArrayBuffer[Long]()).sorted
          stages += ((s.stageInfo.stageId, s.stageInfo.numTasks,
            if (d.nonEmpty) d.last else 0L,
            if (d.nonEmpty) d(d.length / 2) else 0L,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            s.stageInfo.name.take(60)))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val pairs = pipeline.Dedup.minhashCandidates(docs)
      val n = pairs.count()
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(listener)
      println(s"pairs=$n")
      stages.sortBy(-_._3).foreach { case (id, nt, mx, md, rd, wr, nm) =>
        println(f"stage $id%4d tasks=$nt%4d max=${mx / 1000.0}%7.2fs med=${md / 1000.0}%7.2fs rd=${rd >> 20}%6dMB wr=${wr >> 20}%6dMB  $nm")
      }
      val hot = stages.maxBy(_._3)._1
      println(s"-- top tasks of hot stage $hot (idx, dur_s, shuf_rd_MB, recs_out):")
      tasks.filter(_._1 == hot).sortBy(-_._3).take(8).foreach {
        case (_, i, d, rd, rw) =>
          println(f"  task $i%4d ${d / 1000.0}%7.2fs rd=${rd >> 20}%6dMB out=$rw%12d")
      }
      println("-- executed plan:")
      println(pairs.queryExecution.executedPlan.toString.take(8000))
    }
  }
}
