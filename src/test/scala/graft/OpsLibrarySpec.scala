package graft

import graft.dsl._
import graft.ops.Ops
import org.apache.spark.sql.types._

/** Op-library and outer-join edge-case corpus (the §7.4.1 acceptance
  * block, api_test.clj:277-394, plus HOF/composition ops :396-418). */
class OpsLibrarySpec extends SparkTestBase {

  def intsG = mem(Playground.integer) _

  test("negate / all / any composition (logic/ops.clj:14-62)") {
    assertProduces(
      query("?n")(intsG(Seq("?n")), Ops.negate(Ops.even)("?n")),
      Seq(Seq(-1L), Seq(1L), Seq(3L), Seq(5L), Seq(7L), Seq(9L)))
    assertProduces(
      query("?n")(intsG(Seq("?n")), Ops.all(Ops.even, Ops.partialF(Ops.lt, 0))("?n")),
      Seq(Seq(2L), Seq(4L), Seq(6L), Seq(8L))) // even AND > 0 (0 < n)
    assertProduces(
      query("?n")(intsG(Seq("?n")),
        Ops.any(Ops.partialF(Ops.gt, 1), Ops.partialF(Ops.lt, 8))("?n")),
      Seq(Seq(-1L), Seq(0L), Seq(9L))) // 1 > n OR 8 < n
  }

  test("comp / juxt / each / partial HOF ops (logic/ops.clj:64-150)") {
    val double = Ops.cmap(cs => cs.head * 2)
    val inc = Ops.inc
    assertProduces( // comp: inc then double
      query("?r")(mem(Seq(Seq(3L)))(Seq("?n"): _*), Ops.comp(double, inc)("?n") :> "?r"),
      Seq(Seq(8L)))
    assertProduces( // juxt: both at once
      query("?a", "?b")(mem(Seq(Seq(3L)))(Seq("?n"): _*),
        Ops.juxt(double, inc)("?n") :> ("?a", "?b")),
      Seq(Seq(6L, 4L)))
    assertProduces( // each: op applied per input var
      query("?a", "?b")(mem(Seq(Seq(3L, 5L)))(Seq("?x", "?y"): _*),
        Ops.each(inc)("?x", "?y") :> ("?a", "?b")),
      Seq(Seq(4L, 6L)))
    assertProduces( // partial: leading constants (hof-add, api_test.clj:396-418)
      query("?r")(mem(Seq(Seq(3L)))(Seq("?n"): _*),
        Ops.partial(Ops.plus, 10L)("?n") :> "?r"),
      Seq(Seq(13L)))
  }

  test("re-parse regex extraction (logic/ops.clj:154-158)") {
    assertProduces(
      query("?m")(
        mem(Seq(Seq("a1 b2 c3")))(Seq("?s"): _*),
        Ops.reParse("[a-z]\\d")("?s") :> "?m"),
      Seq(Seq("a1"), Seq("b2"), Seq("c3")))
    assertProduces( // capture groups → multiple outputs per match
      query("?letter", "?digit")(
        mem(Seq(Seq("a1 b2")))(Seq("?s"): _*),
        Ops.reParseGroups("([a-z])(\\d)", 2)("?s") :> ("?letter", "?digit")),
      Seq(Seq("a", "1"), Seq("b", "2")))
  }

  test("aggregatefn: sequential fold (evens-vs-odds, api_test.clj:172-179)") {
    val evensOdds = Ops.aggregateFn[(Long, Long)](2, Seq(LongType, LongType))(
      (0L, 0L))(
      (acc, row) => if (row.head.asInstanceOf[Long] % 2 == 0) (acc._1 + 1, acc._2)
      else (acc._1, acc._2 + 1))(
      acc => Seq(acc._1, acc._2))
    assertProduces(
      query("?evens", "?odds")(intsG(Seq("?n")), evensOdds("?n") :> ("?evens", "?odds")),
      Seq(Seq(5L, 6L)))
  }

  test("sequential aggregatefn MIXES with parallel aggs (api_test.clj:181-191)") {
    val num = Seq(Seq("a", 1L), Seq("a", 2L), Seq("a", 5L), Seq("c", 6L),
      Seq("d", 9L), Seq("a", 12L), Seq("c", 16L), Seq("e", 16L))
    val evensVsOdds = Ops.aggregateFn[Long](1, Seq(LongType))(0L)(
      (acc, row) => if (row.head.asInstanceOf[Long] % 2 == 0) acc + 1 else acc - 1)(
      acc => Seq(acc))
    assertProduces(
      query("?a", "?c", "?e", "?s")(
        mem(num)("?a", "?n"),
        Ops.count() :> "?c",
        Ops.sum("?n") :> "?s",
        evensVsOdds("?n") :> "?e"),
      Seq(Seq("a", 4L, 0L, 20L), Seq("c", 2L, 2L, 22L),
        Seq("d", 1L, -1L, 9L), Seq("e", 1L, 1L, 16L)))
  }

  test("bufferiter-style pairwise over sorted group (api_test.clj:453-468)") {
    // partition 2 1 over a sorted group ≈ lag: emit (prev, cur) pairs
    val pairwise = Ops.bufferSame(2) { it =>
      var prev: Option[Seq[Any]] = None
      it.flatMap { cur =>
        val out = prev.map(p => Seq(p.head, cur.head))
        prev = Some(cur)
        out.iterator
      }
    }
    assertProduces(
      query("?k", "?from", "?to")(
        mem(Seq(Seq("k", 1L), Seq("k", 3L), Seq("k", 2L)))(Seq("?k", "?n"): _*),
        pairwise("?n", "?n") :> ("?from", "?to")).sorted("?n"),
      Seq(Seq("k", 1L, 2L), Seq("k", 2L, 3L)))
  }

  test("multi-output parallel agg (api_test.clj:537-565) — n-ary sum/min/max") {
    assertProduces(
      query("?sa", "?sb", "?mina", "?maxb")(
        mem(Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))(Seq("?a", "?b"): _*),
        Ops.sum("?a", "?b") :> ("?sa", "?sb"),
        Ops.min("?a") :> "?mina",
        Ops.max("?b") :> "?maxb"),
      Seq(Seq(6L, 60L, 1L, 30L)))
  }

  test("!count counts non-nulls only (api_test.clj:294-300)") {
    val data = Seq(Seq("a", 1L), Seq("a", null), Seq("b", 2L))
    assertProduces(
      query("?k", "?nc", "?c")(
        mem(data)(Seq("?k", "!v"): _*),
        Ops.countNotNull("!v") :> "?nc",
        Ops.count() :> "?c"),
      Seq(Seq("a", 1L, 2L), Seq("b", 1L, 1L)))
  }

  test("outer-join acceptance: !! with op on the nullable side filtered out") {
    // persons + their follows count, including zero-followers via !count
    assertProduces(
      query("?p", "?cnt")(
        mem(Playground.person)(Seq("?p"): _*),
        mem(Playground.follows)(Seq("?p", "!!fd"): _*),
        Ops.countNotNull("!!fd") :> "?cnt"),
      Seq(Seq("alice", 3L), Seq("bob", 3L), Seq("chris", 0L), Seq("david", 2L),
        Seq("emily", 4L), Seq("george", 1L), Seq("gary", 0L), Seq("harold", 1L),
        Seq("kumar", 0L), Seq("luanne", 2L)))
  }

  test("three-tail join: friends-of-friends age pairs (api_test.clj:71-84)") {
    val ageMap = Playground.age.map(r => r(0) -> r(1).asInstanceOf[Long]).toMap
    val expected = Playground.follows.collect {
      case Seq(p1: String, p2: String)
          if ageMap.contains(p1) && ageMap.contains(p2) && ageMap(p2) < ageMap(p1) =>
        Seq[Any](p1, p2, ageMap(p1), ageMap(p2))
    }
    assertProduces(
      query("?p1", "?p2", "?a1", "?a2")(
        mem(Playground.follows)(Seq("?p1", "?p2"): _*),
        mem(Playground.age)(Seq("?p1", "?a1"): _*),
        mem(Playground.age)(Seq("?p2", "?a2"): _*),
        Ops.lt("?a2", "?a1")),
      expected)
  }

  test("fixed-sample returns exactly n deterministic rows (ops.clj:255-269)") {
    val g = fixedSample(mem(Playground.age)(Seq("?p", "?a"): _*), 4)
    val r1 = query("?p", "?a")(g).toDF(spark).collect().map(_.toSeq).toSet
    val r2 = query("?p", "?a")(g).toDF(spark).collect().map(_.toSeq).toSet
    assert(r1.size == 4 && r1 == r2) // seeded → deterministic
  }

  test("salted top-k equals unsalted top-k (skew-safe plan)") {
    def topk(op: graft.logic.LimitAgg) =
      query("?f", "?top", "?r")(
        mem(Playground.follows)(Seq("?f", "?fd"): _*),
        op.copy(withRank = true)("?fd") :> ("?top", "?r")).sorted("?fd")
        .toDF(spark).collect().map(_.toSeq).toSet
    assert(topk(Ops.limitSalted(2, salt = 4)) == topk(Ops.limit(2)))
  }

  test("sample generator transform") {
    val g = sample(mem(Playground.integer)(Seq("?n"): _*), 0.5, seed = 7L)
    val n = query("?n")(g).toDF(spark).count()
    assert(n > 0 && n < 11)
  }
}
