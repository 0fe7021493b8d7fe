package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Count-min sketch: overestimate guarantee, exactness when the width
  * dominates the vocabulary, merge monoid vs single-pass, null
  * handling, and partition-independence. */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val stream = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
    Seq.fill(5)("c") ++ Seq("d")).map(Tuple1(_))

  test("estimate >= exact for every value; exact at generous width") {
    val df = stream.toDF("v")
    val sk = df.agg(Sketches.cms(col("v"), 4, 512).as("sk"))
    val est = df.distinct().crossJoin(sk)
      .select(col("v"), Sketches.cmsEstimate(col("sk"), col("v"), 4, 512))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 50L, "b" -> 20L, "c" -> 5L, "d" -> 1L)
    exact.foreach { case (v, n) => assert(est(v) >= n, s"$v: ${est(v)} < $n") }
    // 4 values in 512 cells: collisions are essentially impossible and
    // the sketch is exact
    assert(est == exact)
  }

  test("overestimate-only under forced collisions (width 2)") {
    val df = stream.toDF("v")
    val sk = df.agg(Sketches.cms(col("v"), 2, 2).as("sk"))
    val est = df.distinct().crossJoin(sk)
      .select(col("v"), Sketches.cmsEstimate(col("sk"), col("v"), 2, 2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 50L, "b" -> 20L, "c" -> 5L, "d" -> 1L)
    exact.foreach { case (v, n) => assert(est(v) >= n) }
    // total mass bound: every estimate <= stream length
    assert(est.values.forall(_ <= 76L))
  }

  test("merge monoid: split-stream merge equals the single-pass sketch") {
    val (l, r) = stream.splitAt(30)
    val skAll = stream.toDF("v").agg(Sketches.cms(col("v")).as("sk"))
    val skL = l.toDF("v").agg(Sketches.cms(col("v")).as("skl"))
    val skR = r.toDF("v").agg(Sketches.cms(col("v")).as("skr"))
    val merged = skL.crossJoin(skR)
      .select(Sketches.cmsMerge(col("skl"), col("skr")).as("sk"))
    assert(merged.collect().head.getSeq[Long](0) ==
      skAll.collect().head.getSeq[Long](0))
  }

  test("nulls don't count; partition count doesn't change the sketch") {
    val withNulls = (stream.map(_._1) ++ Seq(null, null)).map(Tuple1(_)).toDF("v")
    val a = withNulls.repartition(13).agg(Sketches.cms(col("v")).as("sk"))
      .collect().head.getSeq[Long](0)
    val b = stream.toDF("v").coalesce(1).agg(Sketches.cms(col("v")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(a == b)
    assert(a.sum == 4L * 76L) // every non-null value lands in 4 cells
  }
}
