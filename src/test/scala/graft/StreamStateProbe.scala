package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming STATE-SCALE probe (VERDICT r10 item 7): the streaming twins
  * are parity-verified in StreamingSpec but state was never
  * volume-probed. This main drives [[Streams.streamingKmvDistinct]] and
  * [[Streams.streamingMinhashCandidates]] under the RocksDB state store
  * at 10×/100× key counts and prints per-scale: state rows, state bytes
  * (provider-reported), bytes/key, and input rows/sec — the numbers
  * BASELINE.md records, with the documented per-key bounds to check
  * against (KMV: ≤ k longs/key; LSH buckets: ≤ 2·cap+1 longs/bucket).
  *
  *   sbt "Test/runMain graft.StreamStateProbe"
  */
object StreamStateProbe {

  private def stateStats(q: StreamingQuery): (Long, Long) = {
    val so = q.lastProgress.stateOperators
    if (so.isEmpty) (0L, 0L)
    else (so.map(_.numRowsTotal).sum, so.map(_.memoryUsedBytes).sum)
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ---------------- KMV running distinct (k=64: bound 64 longs/key)
    println("== streamingKmvDistinct (k=64, RocksDB) ==")
    for (keys <- Seq(3000, 30000, 300000)) {
      val in = MemoryStream[(String, Long)]
      val q = Streams.toMemory(
        Streams.streamingKmvDistinct(in.toDS(), k = 64).toDF(
          "k", "n_seen", "sk", "est"), s"kmv_$keys", "update")
      val valuesPerKey = 10
      val rounds = 2
      var rows = 0L
      val t0 = System.nanoTime()
      for (r <- 0 until rounds) {
        val batch = (0 until keys).flatMap(i =>
          (0 until valuesPerKey).map(v =>
            (s"key$i", graft.pipeline.Md5.lower64(
              java.security.MessageDigest.getInstance("MD5"),
              s"v:$i:$r:$v"))))
        in.addData(batch)
        q.processAllAvailable()
        rows += batch.size
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val (stRows, stBytes) = stateStats(q)
      println(f"keys=$keys%7d rows=$rows%8d  ${rows / secs}%9.0f rows/s  " +
        f"stateRows=$stRows%8d stateBytes=$stBytes%11d  bytes/key=${
          if (stRows == 0) 0.0 else stBytes.toDouble / stRows}%8.1f")
      q.stop()
    }

    // -------- LSH bucket candidates (bands=16, cap from corpus: bound
    // 2*cap+1 longs/bucket; synthetic 12-token docs over a 400-word vocab)
    println("== streamingMinhashCandidates (k=64, bands=16, RocksDB) ==")
    for (docs <- Seq(1000, 10000, 50000)) {
      val in = MemoryStream[(Long, String)]
      val df = in.toDF().toDF("doc_id", "text")
      val q = Streams.toMemory(
        Streams.streamingMinhashCandidates(df, maxBucketSize = 64)
          .toDF("a", "b"), s"mh_$docs", "append")
      val rnd = new scala.util.Random(7)
      val vocab = Vector.tabulate(400)(i => s"w$i")
      val batch = (0 until docs).map { i =>
        (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val t0 = System.nanoTime()
      in.addData(batch)
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val (stRows, stBytes) = stateStats(q)
      println(f"docs=$docs%6d  ${docs / secs}%8.0f docs/s  " +
        f"stateRows(buckets)=$stRows%8d stateBytes=$stBytes%11d  bytes/bucket=${
          if (stRows == 0) 0.0 else stBytes.toDouble / stRows}%8.1f")
      q.stop()
    }
    spark.stop()
  }
}
