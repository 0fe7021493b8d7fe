package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** bit-by-bit reference interleave */
  private def refZ(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit reference on random 16-bit pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (0, 65535), (65535, 0))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a").cast("long"), col("b").cast("long")))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (a, b) => refZ(a, b) })
  }

  test("bucket16 stays within [0, 65535] and is monotone") {
    val df = spark.range(100000L).select((col("id") * 379L).as("v"))
    val st = df.agg(min("v").as("mn"), max("v").as("mx"))
    val buckets = df.crossJoin(broadcast(st))
      .select(ZOrder.bucket16(col("v"), col("mn"), col("mx")).as("b"),
        col("v"))
    val Array(mn, mx) = buckets.agg(min("b"), max("b")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(mn == 0L && mx <= 65535L)
    // monotone: bucket ordering never inverts value ordering
    val inversions = buckets
      .withColumn("pb", lag("b", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("v")))
      .filter(col("pb") > col("b")).count()
    assert(inversions == 0)
  }

  test("edge shapes: constant column, negative values, single row") {
    // constant column: every bucket 0, layout degrades to the other column
    val const = (1 to 100).map(i => (5L, i.toLong)).toDF("a", "b")
    assert(ZOrder.zorderBy(const, "a", "b", 4).count() == 100)
    // negative values: c - min stays non-negative, kernel in range
    val neg = (-50 to 49).map(i => (i.toLong, (-i).toLong)).toDF("a", "b")
    val st = neg.agg(min("a").as("mn"), max("a").as("mx"))
    val bounds = neg.crossJoin(broadcast(st))
      .select(ZOrder.bucket16(col("a"), col("mn"), col("mx")).as("k"))
      .agg(min("k"), max("k")).collect()(0)
    assert(bounds.getLong(0) == 0L && bounds.getLong(1) <= 65535L)
    assert(ZOrder.zorderBy(neg, "a", "b", 4).count() == 100)
    assert(ZOrder.zorderBy(Seq((1L, 2L)).toDF("a", "b"), "a", "b", 4).count() == 1)
  }

  test("span overflowing Long fails loudly instead of wrapping z-values") {
    // min < 0 <= max with span > Long.MaxValue: mx - mn wraps negative,
    // which would silently destroy clustering — must raise, naming the column
    val wide = Seq((Long.MinValue + 5L, 1L), (Long.MaxValue - 5L, 2L)).toDF("a", "b")
    val e = intercept[Exception] { ZOrder.zorderBy(wide, "a", "b", 2).count() }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    val all = msgs(e).mkString(" | ")
    assert(all.contains("column a") && all.contains("Long.MaxValue"), s"wrong error: $all")
    // mixed-sign spans that FIT in a Long stay usable (no false positive)
    val ok = Seq((-3000000000L, 1L), (3000000000L, 2L)).toDF("a", "b")
    assert(ZOrder.zorderBy(ok, "a", "b", 2).count() == 2)
  }

  test("zorderBy preserves the row multiset") {
    val df = (1 to 5000).map(i => (i % 97, i % 61, s"r$i")).toDF("a", "b", "s")
    val z = ZOrder.zorderBy(df, "a", "b", 8)
    assert(z.schema == df.schema)
    assert(z.unionAll(df).groupBy("a", "b", "s").count()
      .filter(col("count") =!= 2).count() == 0)
    assert(z.count() == 5000)
  }

  test("written z-order layout actually SKIPS row groups on the second column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = spark.range(65536L).select(
      (col("id") % 256L).as("a"), (col("id") / 256L).cast("long").as("b"))
    ZOrder.zorderBy(grid, "a", "b", 16).write.mode("overwrite")
      .parquet(s"$dir/zorder")
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/bya")
    // filter on b ONLY: the a-sorted layout has full-span b stats in every
    // file, so parquet can skip nothing; the z-ordered layout reads only
    // the row groups whose b-range covers the predicate
    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("b") === 5L)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val viaZ = scannedRows(s"$dir/zorder")
    val viaA = scannedRows(s"$dir/bya")
    assert(viaA >= 65536L / 2, s"a-sorted layout should scan ~everything, got $viaA")
    assert(viaZ * 3 < viaA, s"z-order must skip most row groups: $viaZ vs $viaA")
  }

  test("z-order layout tightens per-partition spans on BOTH columns") {
    // 256x256 uniform grid; 16 range partitions
    val grid = spark.range(65536L).select(
      (col("id") % 256L).as("a"), (col("id") / 256L).cast("long").as("b"))
    def spans(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(avg("sa"), avg("sb")).collect()(0)
    val z = spans(ZOrder.zorderBy(grid, "a", "b", 16))
    val bySingleCol = spans(grid.repartitionByRange(16, col("a")))
    // single-column sort: a is tight but b spans the full 255
    assert(bySingleCol.getDouble(1) > 200.0)
    // z-order: BOTH columns well under half the global span
    assert(z.getDouble(0) < 128.0, s"a span ${z.getDouble(0)}")
    assert(z.getDouble(1) < 128.0, s"b span ${z.getDouble(1)}")
  }
}
