package graft

import graft.dsl._
import graft.ops.Ops

/** The bounded-buffer top-k aggregation (operators.TopK) must reproduce
  * the window-rank plan's results on the reference limit corpus
  * (api_test.clj:721-783) and on real data. */
class TopKSpec extends SparkTestBase {

  private val pair = Seq(Seq("a", 1L), Seq("a", 3L), Seq("a", 2L), Seq("a", 4L),
    Seq("b", 1L), Seq("b", 6L), Seq("b", 7L), Seq("c", 0L))
  private def p(fields: Any*) = mem(pair)(fields: _*)

  test("heap limit reproduces the reference limit block") {
    assertProduces(
      query("?n2")(p("_", "?n"), Ops.limitHeap(2)("?n") :> "?n2").sorted("?n"),
      Seq(Seq(0L), Seq(1L)))
    assertProduces(
      query("?n2")(p("_", "?n"), Ops.limitHeap(3)("?n") :> "?n2").sorted("?n"),
      Seq(Seq(0L), Seq(1L), Seq(1L)))
    assertProduces(
      query("?n2", "?r")(p("_", "?n"),
        Ops.limitRankHeap(3)("?n") :> ("?n2", "?r")).sorted("?n"),
      Seq(Seq(0L, 1L), Seq(1L, 2L), Seq(1L, 3L)))
    assertProduces(
      query("?n2")(p("_", "?n"),
        Ops.limitHeap(2)("?n") :> "?n2").sorted("?n").reversed,
      Seq(Seq(6L), Seq(7L)))
    assertProduces(
      query("?n2", "?r")(p("_", "?n"),
        Ops.limitRankHeap(2)("?n") :> ("?n2", "?r")).sorted("?n").reversed,
      Seq(Seq(6L, 2L), Seq(7L, 1L)))
    assertProduces(
      query("?l2", "?n2")(p("?l", "?n"),
        Ops.limitHeap(2)("?l", "?n") :> ("?l2", "?n2")).sorted("?l", "?n").reversed,
      Seq(Seq("c", 0L), Seq("b", 7L)))
    // ?l in output → per-group top 2
    assertProduces(
      query("?l", "?n2")(p("?l", "?n"),
        Ops.limitHeap(2)("?n") :> "?n2").sorted("?n"),
      Seq(Seq("a", 1L), Seq("a", 2L), Seq("b", 1L), Seq("b", 6L), Seq("c", 0L)))
  }

  test("heap top-k orders decimal and timestamp sort keys correctly") {
    // the former putKey fallback ranked decimals/timestamps by an arbitrary
    // equality encoding — heap top-k silently diverged from the window plan
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType),
      StructField("price", DecimalType(12, 2)),
      StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def d(s: String) = new java.math.BigDecimal(s).setScale(2)
    val rows = Seq(
      Row("a", d("10.00"), ts("2024-01-03 00:00:00")),
      Row("a", d("9.99"), ts("2024-01-01 00:00:00")),
      Row("a", d("100.10"), ts("2024-01-02 00:00:00")),
      Row("a", d("-2.50"), ts("2023-12-31 23:59:59")),
      Row("b", d("7.00"), ts("2024-02-01 00:00:00")),
      Row("b", d("70.00"), ts("2024-01-15 00:00:00")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    // ascending by decimal: numeric order, not encoding-byte order
    val byPrice = graft.operators.TopK.topK(df, Seq("g"), 2,
      Seq(col("price")), Seq("price" -> col("price")))
      .collect().map(r => (r.getString(0), r.getDecimal(1).toPlainString)).toSet
    assert(byPrice == Set(("a", "-2.50"), ("a", "9.99"), ("b", "7.00"), ("b", "70.00")),
      s"got $byPrice")
    // descending by timestamp: chronological order
    val byTs = graft.operators.TopK.topK(df, Seq("g"), 1,
      Seq(col("ts")), Seq("ts" -> col("ts")), desc = true)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString)).toSet
    assert(byTs == Set(("a", "2024-01-03 00:00:00.0"), ("b", "2024-02-01 00:00:00.0")),
      s"got $byTs")
  }

  test("heap limit equals the window plan on real data (orders top-3 per customer)") {
    val d = "/root/testdata/sf0.001"
    def q(limit: graft.logic.LimitAgg) =
      query("?o_custkey", "?top_orderkey", "?top_price")(
        source(s => s.read.parquet(s"$d/orders.parquet"))(
          "?ok", "?o_custkey", "_", "?price", "_", "_"),
        limit("?ok", "?price") :> ("?top_orderkey", "?top_price"))
        .sorted("?price", "?ok").reversed
    val window = q(Ops.limit(3)).toDF(spark).collect().map(_.toSeq).toSet
    val heap = q(Ops.limitHeap(3)).toDF(spark).collect().map(_.toSeq).toSet
    assert(window == heap, s"window ${window.size} vs heap ${heap.size}")
    assert(heap.nonEmpty)
  }
}
