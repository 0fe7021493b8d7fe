package graft

import graft.dsl._
import graft.logic.AnyColumn
import graft.ops.Ops

/** Untyped/heterogeneous column parity (reference
  * api_test.clj:617-628 mixed String/Long/Double with runtime dispatch,
  * :636-645 vector payload reduced with +, :785-790 nested map get-in). */
class AnyColumnSpec extends SparkTestBase {

  test("codec round-trips and canonical equality") {
    val vals = Seq(null, 5L, 5, 3.14, "abc", true,
      Vector(1L, 2L, Vector(3L)), Map("a" -> Map("b" -> 2L)))
    vals.foreach { v =>
      val rt = AnyColumn.decode(AnyColumn.encode(v))
      val expect = v match {
        case i: Int => i.toLong
        case s: Seq[_] => s.toVector
        case x => x
      }
      assert(rt == expect, s"round-trip of $v gave $rt")
    }
    // canonical: Int 5 and Long 5 encode identically (Clojure = semantics)
    assert(AnyColumn.encode(5).sameElements(AnyColumn.encode(5L)))
    assert(AnyColumn.encode(Map("a" -> 1L, "b" -> 2L))
      .sameElements(AnyColumn.encode(Map("b" -> 2L, "a" -> 1L))))
  }

  test("cross-type ordering: sortKey interleaves numerics, ranks types") {
    // the round-1 gap: equality-encoding bytes don't order; sortKeyBytes do
    val vals: Seq[Any] = Seq("b", 2.5, null, 10L, true, -3.5, 1L, "a", false,
      2L, 1e300, Long.MaxValue, Double.NaN, Vector(1L))
    val sorted = vals.sortWith((a, b) => AnyColumn.compare(a, b) < 0)
    val expected: Seq[Any] = Seq(null, false, true, -3.5, 1L, 2L, 2.5, 10L,
      Long.MaxValue, 1e300, Double.NaN, "a", "b", Vector(1L))
    def eq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Double, y: Double) => x.equals(y) // NaN == NaN here
      case _ => a == b
    }
    assert(sorted.zip(expected).forall { case (a, b) => eq(a, b) }, s"got $sorted")
    // numerically equal long/double are a deterministic near-tie, not equal
    assert(AnyColumn.compare(1L, 1.0) != 0)
    assert(AnyColumn.compare(1.0, 1L) == -AnyColumn.compare(1L, 1.0))
    // Spark-side: sorting an encoded mixed column by the sortKey op
    val df = spark.createDataFrame(
      vals.map(v => Tuple1(AnyColumn.encode(v))))
      .toDF("v")
    import org.apache.spark.sql.functions.col
    val keyed = df.withColumn("k", AnyColumn.sortKey.f(Seq(col("v"))).head)
    val back = keyed.orderBy("k").collect()
      .map(r => AnyColumn.decode(r.getAs[Array[Byte]]("v"))).toSeq
    assert(back.zip(expected).forall { case (a, b) => eq(a, b) }, s"got $back")
  }

  test("mixed String/Long/Double column with runtime-class dispatch (api_test.clj:617-628)") {
    // reference: multimethod on runtime class → stringify differently
    val src = Seq(Seq[Any]("word."), Seq[Any](1L), Seq[Any](1.0))
    val describe = AnyColumn.mapAny {
      case s: String => s"str:$s"
      case l: Long => s"int:$l"
      case d: Double => s"float:$d"
      case other => s"?:$other"
    }
    val decoded = AnyColumn.decodeAs[String](_.asInstanceOf[String])
    assertProduces(
      query("?out")(
        mem(src)(Seq("?v"): _*),
        describe("?v") :> "?tagged",
        decoded("?tagged") :> "?out"),
      Seq(Seq("str:word."), Seq("int:1"), Seq("float:1.0")))
  }

  test("nested map payload: get-in (api_test.clj:785-790)") {
    val src = Seq(Seq[Any](Map("a" -> Map("b" -> 2L))), Seq[Any](Map("a" -> Map("c" -> 3L))))
    val getIn = AnyColumn.decodeAs[java.lang.Long] { v =>
      v.asInstanceOf[Map[Any, Any]].get("a")
        .flatMap(_.asInstanceOf[Map[Any, Any]].get("b"))
        .map(x => java.lang.Long.valueOf(x.asInstanceOf[Long])).orNull
    }
    assertProduces(
      query("?p", "!b")(
        mem(src.zipWithIndex.map { case (r, i) => Seq[Any](s"p$i") ++ r })(
          Seq("?p", "?m"): _*),
        getIn("?m") :> "!b"),
      Seq(Seq("p0", 2L), Seq("p1", null)))
  }

  test("vector-valued field reduced with + (api_test.clj:636-645)") {
    // homogeneous vectors infer a REAL array<bigint> column (typed fast
    // path) — the reduction is a typed op, no Any codec involved
    val src = Seq(Seq[Any](Vector(3L, 2L, 4L, 1L)), Seq[Any](Vector(1L, 9L)))
    val sumVec = Ops.mapFn[Seq[Long], Long](_.sum)
    assertProduces(
      query("?sum")(
        mem(src)(Seq("?v"): _*),
        sumVec("?v") :> "?sum"),
      Seq(Seq(10L), Seq(10L)))

    // heterogeneous vectors (mixed element types) take the codec path
    val mixed = Seq(Seq[Any](Vector(3L, "x")), Seq[Any](Vector(1L, 9L)))
    val count = AnyColumn.decodeAs[Long](v => v.asInstanceOf[Vector[Any]].size.toLong)
    assertProduces(
      query("?n")(mem(mixed)(Seq("?v"): _*), count("?v") :> "?n"),
      Seq(Seq(2L), Seq(2L)))
  }

  test("mixed column supports distinct/groupBy through canonical bytes") {
    val src = Seq(Seq[Any](1L), Seq[Any](1), Seq[Any]("x"), Seq[Any]("x"), Seq[Any](2.5))
    val df = query("?v", "?cnt")(
      mem(src)(Seq("?v"): _*),
      Ops.count() :> "?cnt").toDF(spark)
    val counts = df.collect().map(r => AnyColumn.decode(r.getAs[Array[Byte]](0)) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, "x" -> 2L, 2.5 -> 1L))
  }
}
