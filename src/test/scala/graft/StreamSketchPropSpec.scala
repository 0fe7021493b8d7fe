package graft

import graft.streaming.Streams
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Random-split parity for the sketch-typed stream state: for random
  * (key, value) rows split into random micro-batches, each key's FINAL
  * streaming state (the max-n_seen emission — the SketchState contract)
  * must equal the batch aggregator's sketch over the same rows,
  * regardless of where the batch boundaries fell or how keys interleave.
  * This is the generative version of StreamingSpec's two example cases,
  * and what licenses p88/p89's oracle reuse: the monoid fold makes batch
  * boundaries unobservable in the end state. */
class StreamSketchPropSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(881289L)

  private def md5h(s: String): Long =
    graft.pipeline.Md5.lower64(
      java.security.MessageDigest.getInstance("MD5"), s) & ((1L << 61) - 1)

  private def randomSplit[A](rows: Seq[A], parts: Int): Seq[Seq[A]] = {
    val cuts = Seq.fill(rows.size)(rnd.nextInt(parts)).sorted
    rows.zip(cuts).groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._1))
  }

  test("streaming KMV final state == batch sketch for random rows and random splits") {
    implicit val sqlCtx = spark.sqlContext
    for (caseId <- 0 until 8) {
      val k = Seq(2, 4, 8, 16)(rnd.nextInt(4))
      val keys = (0 until 1 + rnd.nextInt(4)).map(i => s"g$i")
      val rows = (0 until 30 + rnd.nextInt(120)).map { _ =>
        (keys(rnd.nextInt(keys.size)), md5h(s"v${rnd.nextInt(40)}"))
      }
      val in = MemoryStream[(String, Long)]
      val q = Streams.toMemory(
        Streams.streamingKmvDistinct(in.toDS(), k)
          .toDF("key", "n_seen", "sk_size", "est"), s"kmv_prop_$caseId")
      randomSplit(rows, 1 + rnd.nextInt(5)).foreach { b =>
        if (b.nonEmpty) { in.addData(b: _*); q.processAllAvailable() }
      }
      q.stop()
      val fin = spark.table(s"kmv_prop_$caseId").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).map { case (key, es) => key -> es.maxBy(_._2) }
      val batch = rows.toDF("key", "h").groupBy("key")
        .agg(size(Sketches.kmv(col("h"), k)).cast("long").as("sz"),
          Sketches.kmvEstimate(Sketches.kmv(col("h"), k), k).as("est"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
        .toMap
      assert(fin.keySet == batch.keySet, s"case $caseId: key sets differ")
      fin.foreach { case (key, (_, n, sz, est)) =>
        val (bsz, best, bn) = batch(key)
        assert(n == bn, s"case $caseId/$key: n_seen $n != row count $bn")
        assert(sz == bsz, s"case $caseId/$key: size $sz != batch $bsz")
        assert(est == best, s"case $caseId/$key: estimate $est != batch $best")
      }
    }
  }

  test("streaming CMS shard-sum == one global batch sketch for random rows and splits") {
    implicit val sqlCtx = spark.sqlContext
    for (caseId <- 0 until 5) {
      val (depth, width) = (2 + rnd.nextInt(2), Seq(8, 16, 32)(rnd.nextInt(3)))
      val shards = 1 + rnd.nextInt(5)
      val rows = (0 until 40 + rnd.nextInt(150)).map { _ =>
        val v = s"tok${rnd.nextInt(25)}"
        ((math.abs(v.hashCode) % shards).toString, v)
      }
      val in = MemoryStream[(String, String)]
      val q = Streams.toMemory(
        Streams.streamingCms(in.toDS(), depth, width)
          .toDF("shard", "n_seen", "cells"), s"cms_prop_$caseId")
      randomSplit(rows, 1 + rnd.nextInt(5)).foreach { b =>
        if (b.nonEmpty) { in.addData(b: _*); q.processAllAvailable() }
      }
      q.stop()
      val merged = spark.table(s"cms_prop_$caseId").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .groupBy(_._1).values
        .map(_.maxBy(_._2)._3) // final sketch per shard
        .foldLeft(Seq.fill(depth * width)(0L)) { (acc, sk) =>
          acc.zip(sk).map { case (a, b) => a + b } // CMS monoid
        }
      val global = rows.map(_._2).toDF("v")
        .agg(Sketches.cms(col("v"), depth, width).as("sk"))
        .collect().head.getSeq[Long](0)
      assert(merged == global,
        s"case $caseId: shard-sum sketch != global batch sketch")
    }
  }
}
