package graft

import graft.dsl._
import graft.ops.Ops
import org.apache.spark.sql.{Encoder, Encoders, functions => F}
import org.apache.spark.sql.expressions.Aggregator

/** Set ops + custom monoid Aggregator (defparallelagg surface,
  * logic/def.clj:107,137-164 → Spark Aggregator[IN,BUF,OUT]). */
class SetOpsUdafSpec extends SparkTestBase {

  test("intersect and except generator transforms (SURVEY §2.9)") {
    val a = mem(Seq(Seq(1L), Seq(2L), Seq(3L)))(Seq("?n"): _*)
    val b = mem(Seq(Seq(2L), Seq(3L), Seq(4L)))(Seq("?n"): _*)
    assertProduces(query("?n")(intersect(a, b)), Seq(Seq(2L), Seq(3L)))
    assertProduces(query("?n")(except(a, b)), Seq(Seq(1L)))
  }

  test("fields helpers: identity/discard/rename/insert/debug") {
    val df = memDF(spark, Seq(Seq("a", 1L))).toDF("k", "v")
    val out = fields.insert(
      fields.rename(fields.identity(df, Seq("v"), Seq("v2")), Seq("k"), Seq("key")),
      "tag" -> "x")
    assert(out.columns.toSeq == Seq("key", "v", "v2", "tag"))
    assert(fields.discard(out, "v2", "tag").columns.toSeq == Seq("key", "v"))
  }

  /** defparallelagg example: geometric-mean via (sum-of-logs, count)
    * monoid — init per row, associative combine, present — exactly the
    * ParallelAggregator contract; Spark runs it with map-side partials. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = math.exp(b._1 / math.max(b._2, 1L))
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("custom parallel aggregator through the DSL (defparallelagg)") {
    val geomean = Ops.cagg(cs => F.udaf(GeoMean).apply(cs.head))
    val rows = Seq(Seq("a", 2.0), Seq("a", 8.0), Seq("b", 3.0))
    assertProduces(
      query("?k", "?gm")(
        mem(rows)(Seq("?k", "?x"): _*),
        geomean("?x") :> "?gm"),
      Seq(Seq("a", 4.0), Seq("b", 3.0000000000000004)))
  }

  test("custom aggregator mixes with builtins in one pass") {
    val geomean = Ops.cagg(cs => F.udaf(GeoMean).apply(cs.head))
    val rows = Seq(Seq("a", 2.0), Seq("a", 8.0))
    assertProduces(
      query("?k", "?gm", "?cnt", "?sum")(
        mem(rows)(Seq("?k", "?x"): _*),
        geomean("?x") :> "?gm",
        Ops.count() :> "?cnt",
        Ops.sum("?x") :> "?sum"),
      Seq(Seq("a", 4.0, 2L, 10.0)))
  }
}
