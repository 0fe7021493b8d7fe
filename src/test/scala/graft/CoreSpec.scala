package graft

import graft.dsl._
import graft.ops.Ops
import graft.logic.Vars
import org.apache.spark.sql.types._

/** Port of the reference semantic corpus's core cases
  * (test/cascalog/api_test.clj — cites inline). */
class CoreSpec extends SparkTestBase {

  def ageG = mem(Playground.age) _
  def genderG = mem(Playground.gender) _
  def personG = mem(Playground.person) _
  def followsG = mem(Playground.follows) _

  test("projection + filter (api_test.clj:86-91)") {
    assertProduces(
      query("?person")(ageG(Seq("?person", "?age")), Ops.lt("?age", 30)),
      Seq(Seq("alice"), Seq("david"), Seq("emily"), Seq("gary"), Seq("kumar")))
  }

  test("map op with output binding") {
    assertProduces(
      query("?person", "?double-age")(
        ageG(Seq("?person", "?age")),
        Ops.times("?age", 2) :> "?double-age",
        Ops.lt("?age", 27)),
      Seq(Seq("david", 50L), Seq("emily", 50L)))
  }

  test("inner join via shared var (api_test.clj:71-84)") {
    assertProduces(
      query("?person", "?age", "?gender")(
        ageG(Seq("?person", "?age")),
        genderG(Seq("?person", "?gender")),
        Ops.lt("?age", 28)),
      Seq(Seq("david", 25L, "m"), Seq("emily", 25L, "f")))
  }

  test("left outer join via !! (api_test.clj:277-308)") {
    assertProduces(
      query("?person", "!!followed")(
        personG(Seq("?person")),
        followsG(Seq("?person", "!!followed"))),
      Playground.follows.map(r => Seq(r(0), r(1))) ++
        Seq(Seq("chris", null), Seq("gary", null), Seq("kumar", null)))
  }

  test("full outer join via !! on both sides (api_test.clj:353-394)") {
    val expected =
      (for {
        Seq(p, a) <- Playground.age
        Seq(p2, g) <- Playground.gender if p2 == p
      } yield Seq(p, a, g)) ++
        Seq(Seq("kumar", 27L, null), Seq("harold", null, "m"))
    assertProduces(
      query("?person", "!!age", "!!gender")(
        GenPredOps.unground(ageG(Seq("?person", "!!age"))),
        genderG(Seq("?person", "!!gender"))),
      expected)
  }
  // helper kept trivial: a GenPred with !! fields is already unground
  object GenPredOps { def unground(g: graft.logic.GenPred) = g }

  test("implicit equality through duplicate vars (api_test.clj:218-245)") {
    assertProduces(
      query("?n")(mem(Playground.numPair)(Seq("?n", "?n"): _*)),
      Seq(Seq(0L), Seq(1L), Seq(4L)))
  }

  test("constant as implicit input filter (api_test.clj:593-608)") {
    assertProduces(
      query("?person")(ageG(Seq("?person", 25))),
      Seq(Seq("david"), Seq("emily")))
  }

  test("constant in output position filters op result") {
    assertProduces(
      query("?n")(
        mem(Playground.integer)(Seq("?n"): _*),
        Ops.times("?n", 2) :> 4),
      Seq(Seq(2L)))
  }

  test("function guard in output position (api_test.clj:577-591)") {
    // (* ?n 3 :> even?) — keep rows where the op RESULT satisfies the guard
    assertProduces(
      query("?n")(
        mem(Playground.integer)(Seq("?n"): _*),
        Ops.times("?n", 3) :> Ops.even),
      Seq(Seq(-1L), Seq(0L), Seq(1L), Seq(2L), Seq(3L), Seq(4L), Seq(5L),
        Seq(6L), Seq(7L), Seq(8L), Seq(9L))
        .filter(r => (r.head.asInstanceOf[Long] * 3) % 2 == 0))
  }

  test("op output colliding with bound var = implicit equality (api_test.clj:816-828)") {
    // (num-pair ?a ?b) (+ ?a 1 :> ?b) → rows where b = a + 1
    assertProduces(
      query("?a", "?b")(
        mem(Playground.numPair)(Seq("?a", "?b"): _*),
        Ops.plus("?a", 1L) :> "?b"),
      Playground.numPair.filter(r =>
        r(1).asInstanceOf[Long] == r(0).asInstanceOf[Long] + 1))
  }

  test("filter with output capture (api_test.clj:670-694)") {
    assertProduces(
      query("?n", "?lt5")(
        mem(Seq(Seq(1L), Seq(7L)))(Seq("?n"): _*),
        Ops.lt("?n", 5L) :> "?lt5"),
      Seq(Seq(1L, true), Seq(7L, false)))
  }

  test("existence semi and anti joins (api_secondary_test.clj:115-188)") {
    assertProduces(
      query("?p")(personG(Seq("?p")), exists(followsG(Seq("?p", "_")))),
      Seq(Seq("alice"), Seq("bob"), Seq("david"), Seq("emily"),
        Seq("george"), Seq("harold"), Seq("luanne")))
    assertProduces(
      query("?p")(personG(Seq("?p")), absent(followsG(Seq("?p", "_")))),
      Seq(Seq("chris"), Seq("gary"), Seq("kumar")))
  }

  test("existence boolean capture") {
    assertProduces(
      query("?p", "?follows-any")(
        personG(Seq("?p")),
        existsAs(followsG(Seq("?p", "_")), "?follows-any")),
      Seq(Seq("alice", true), Seq("bob", true), Seq("david", true),
        Seq("emily", true), Seq("george", true), Seq("harold", true),
        Seq("luanne", true), Seq("chris", false), Seq("gary", false),
        Seq("kumar", false)))
  }

  test("multi-aggregator single pass (api_test.clj:137-191)") {
    assertProduces(
      query("?gender", "?cnt", "?sum", "?avg")(
        ageG(Seq("?person", "?age")),
        genderG(Seq("?person", "?gender")),
        Ops.count() :> "?cnt",
        Ops.sum("?age") :> "?sum",
        Ops.avg("?age") :> "?avg"),
      Seq(Seq("f", 3L, 89L, 89.0 / 3), Seq("m", 5L, 157L, 157.0 / 5)))
  }

  test("global aggregation (no group fields)") {
    assertProduces(
      query("?cnt", "?max")(
        ageG(Seq("_", "?age")), Ops.count() :> "?cnt", Ops.max("?age") :> "?max"),
      Seq(Seq(9L, 40L)))
  }

  test("wordcount via mapcat (api_test.clj:124-135)") {
    val expected = Playground.sentence
      .flatMap(_.head.toString.split("\\s+", -1))
      .groupBy(identity).map { case (w, ws) => Seq[Any](w, ws.size.toLong) }.toSeq
    assertProduces(
      query("?word", "?cnt")(
        mem(Playground.sentence)(Seq("?line"): _*),
        Ops.split()("?line") :> "?word",
        Ops.count() :> "?cnt"),
      expected)
  }

  test("buffer with secondary sort: latest value wins (dirty-ages)") {
    val lastAge = Ops.bufferFn(1, Seq(LongType)) { it =>
      var last: Seq[Any] = null
      while (it.hasNext) last = it.next()
      Iterator.single(Seq(last.head))
    }
    assertProduces(
      query("?name", "?age")(
        mem(Playground.dirtyAges)(Seq("?ts", "?name", "?a"): _*),
        lastAge("?a") :> "?age").sorted("?ts"),
      Seq(Seq("alice", 19L), Seq("bob", 30L), Seq("harry", 46L)))
  }

  test("limit per group with sort (api_test.clj:721-783)") {
    assertProduces(
      query("?f", "?top")(
        followsG(Seq("?f", "?fd")),
        Ops.limit(1)("?fd") :> "?top").sorted("?fd"),
      Seq(Seq("alice", "bob"), Seq("bob", "david"), Seq("david", "alice"),
        Seq("emily", "alice"), Seq("george", "gary"), Seq("harold", "bob"),
        Seq("luanne", "gary")))
  }

  test("limit-rank (api_test.clj:755-783)") {
    assertProduces(
      query("?f", "?top", "?rank")(
        followsG(Seq("?f", "?fd")),
        Ops.limitRank(2)("?fd") :> ("?top", "?rank")).sorted("?fd"),
      Seq(Seq("alice", "bob", 1L), Seq("alice", "david", 2L),
        Seq("bob", "david", 1L), Seq("bob", "george", 2L),
        Seq("david", "alice", 1L), Seq("david", "luanne", 2L),
        Seq("emily", "alice", 1L), Seq("emily", "bob", 2L),
        Seq("george", "gary", 1L), Seq("harold", "bob", 1L),
        Seq("luanne", "gary", 1L), Seq("luanne", "harold", 2L)))
  }

  test(":distinct option (api_test.clj / duprows)") {
    assertProduces(
      query("?a", "?b", "?c")(mem(Playground.duprows)(Seq("?a", "?b", "?c"): _*)).distinct,
      Seq(Seq(1L, 2L, 3L), Seq(1L, 2L, 5L), Seq(1L, 3L, 6L),
        Seq(2L, 5L, 7L), Seq(2L, 2L, 2L)))
  }

  test("subquery as generator (api_test.clj:193-216)") {
    val young = query("?person", "?age")(
      ageG(Seq("?person", "?age")), Ops.lt("?age", 30))
    assertProduces(
      query("?person", "?gender")(
        young("?person", "_"),
        genderG(Seq("?person", "?gender"))),
      Seq(Seq("alice", "f"), Seq("david", "m"), Seq("emily", "f"),
        Seq("gary", "m")))
  }

  test("combine and union (cascading_api_test.clj:226-260)") {
    val a = mem(Seq(Seq(1L), Seq(2L)))(Seq("?n"): _*)
    val b = mem(Seq(Seq(2L), Seq(3L)))(Seq("?n"): _*)
    assertProduces(query("?n")(combine(a, b)),
      Seq(Seq(1L), Seq(2L), Seq(2L), Seq(3L)))
    assertProduces(query("?n")(union(a, b)),
      Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("nullable ! keeps nulls, ? filters (api_test.clj:43-52)") {
    val data = Seq(Seq("n", 24L), Seq("m", null), Seq("q", 31L))
    assertProduces(query("?p", "!a")(mem(data)(Seq("?p", "!a"): _*)),
      Seq(Seq("n", 24L), Seq("m", null), Seq("q", 31L)))
    assertProduces(query("?p", "?a")(mem(data)(Seq("?p", "?a"): _*)),
      Seq(Seq("n", 24L), Seq("q", 31L)))
  }

  test("cross join (api.clj:63-64)") {
    val a = mem(Seq(Seq(1L), Seq(2L)))(Seq("?a"): _*)
    val b = mem(Seq(Seq("x"), Seq("y")))(Seq("?b"): _*)
    assertProduces(query("?a", "?b")(a, b),
      Seq(Seq(1L, "x"), Seq(1L, "y"), Seq(2L, "x"), Seq(2L, "y")))
  }

  test("ops over aggregator outputs") {
    assertProduces(
      query("?gender", "?double-cnt")(
        genderG(Seq("_", "?gender")),
        Ops.count() :> "?cnt",
        Ops.times("?cnt", 2) :> "?double-cnt"),
      Seq(Seq("f", 6L), Seq("m", 12L)))
  }

  test("validation: sort without aggregator throws") {
    assertThrows[IllegalArgumentException] {
      query("?p")(personG(Seq("?p"))).sorted("?p").toDF(spark)
    }
  }

  test("zero-input op appends to every row (api_test.clj:22-34 test-no-input)") {
    val nums = Seq(Seq(1L), Seq(2L), Seq(3L))
    val mkOne = Ops.cmap(_ => org.apache.spark.sql.functions.lit(1L))
    assertProduces(
      query("?n", "?n2")(mem(nums)(Seq("?n"): _*), mkOne() :> "?n2"),
      Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L)))
    // second generator shares no vars → cross join, zero-input op intact
    assertProduces(
      query("?n", "?n3")(
        mem(nums)(Seq("?n"): _*), mkOne() :> "?n2", mem(nums)(Seq("?n3"): _*)),
      for { n <- 1L to 3L; n3 <- 1L to 3L } yield Seq(n, n3))
  }

  test("function guard in generator binding position (api_test.clj:577-591)") {
    // (pairs odd? ?b): the guard filters the first source column; combined
    // with the output-position guard (* ?b 3 :> even?)
    val pairs = Seq(Seq(1L, 2L), Seq(2L, 4L), Seq(3L, 3L))
    val odd = Ops.filterFn((n: Long) => n % 2 == 1)
    val even = Ops.filterFn((n: Long) => n % 2 == 0)
    assertProduces(
      query("?b")(
        mem(pairs)(odd, "?b"),
        Ops.times("?b", 3) :> even),
      Seq(Seq(2L)))
  }

  test("multi-rule composition: shared subqueries, nil? on nullable (api_test.clj:193-216)") {
    val age = Seq(Seq("n", 24L), Seq("c", 40L), Seq("j", 23L), Seq("g", 50L))
    val interest = Seq(Seq("n", "bb", null), Seq("n", "fb", 20L),
      Seq("g", "ck", 30L), Seq("j", "nz", 10L), Seq("j", "hk", 1L),
      Seq("jj", "ee", null))
    val follows = Seq(Seq("n", "j"), Seq("j", "n"), Seq("j", "a"),
      Seq("n", "a"), Seq("g", "q"))
    val manyFollow = query("?p")(
      mem(follows)("?p", "_"),
      Ops.count() :> "?c",
      Ops.gt("?c", 1L))
    // the SAME subquery bound twice with different vars in one query
    val activeFollows = query("?p", "?p2")(
      manyFollow("?p"), manyFollow("?p2"), mem(follows)("?p", "?p2"))
    val unknownInterest = query("?p")(
      mem(age)("?p", "?a"),
      mem(interest)("?p", "_", "!i"),
      Ops.pred1(_.isNull)("!i"))
    val weirdFollows = query("?p", "?p2")(
      activeFollows("?p", "?p2"), unknownInterest("?p2"))
    assertProduces(activeFollows, Seq(Seq("n", "j"), Seq("j", "n")))
    assertProduces(unknownInterest, Seq(Seq("n")))
    assertProduces(weirdFollows, Seq(Seq("j", "n")))
  }

  test("self-join of the same generator (cascading_api_test.clj:147-162)") {
    val src = Seq(Seq("a"))
    assertProduces(
      query("!a")(mem(src)(Seq("!a"): _*), mem(src)(Seq("!a"): _*)),
      Seq(Seq("a")))
    // mutual follows: same source joined against itself with swapped vars
    val follows = Seq(Seq("a", "b"), Seq("b", "a"), Seq("a", "c"))
    assertProduces(
      query("?p", "?p2")(
        mem(follows)("?p", "?p2"), mem(follows)("?p2", "?p")),
      Seq(Seq("a", "b"), Seq("b", "a")))
  }

  test("complex mixed outer join: two unground tails, composite keys (api_test.clj:310-323)") {
    val age = Seq(Seq("a", 20L), Seq("b", 30L), Seq("c", 27L), Seq("d", 40L))
    val rec1 = Seq(Seq("a", 1L, 2L), Seq("b", 30L, 16L), Seq("e", 3L, 4L))
    val rec2 = Seq(Seq("a", 20L, 6L), Seq("c", 27L, 25L), Seq("c", 1L, 11L),
      Seq("f", 30L, 1L), Seq("b", 100L, 16L))
    assertProduces(
      query("?p", "?a", "!!f1", "!!f2", "!!f3")(
        mem(age)("?p", "?a"),
        mem(rec1)("?p", "!!f1", "!!f2"),
        mem(rec2)("?p", "?a", "!!f3")), // joins on BOTH ?p and ?a
      Seq(Seq("a", 20L, 1L, 2L, 6L), Seq("c", 27L, null, null, 25L),
        Seq("d", 40L, null, null, null), Seq("b", 30L, 30L, 16L, null)))
  }

  test("ungrounding validation errors (api_test.clj:325-351)") {
    val age = Seq(Seq("a", 20L), Seq("b", 30L))
    val rec1 = Seq(Seq("a", 1L, 2L))
    // each unground var can only appear in one generator
    assertThrows[IllegalArgumentException] {
      query("!!a", "?c")(
        mem(age)("!!a", "?b"), mem(rec1)("!!a", "?f1", "?f2"),
        Ops.minus("?b", 2L) :> "?c").toDF(spark)
    }
    // ungrounding vars have to spring from a generator, not an op
    assertThrows[IllegalArgumentException] {
      query("!!a", "!!c")(
        mem(age)("!!a", "?b"), Ops.minus("?b", 2L) :> "!!c").toDF(spark)
    }
    // no ungrounding vars in generators-as-sets
    assertThrows[IllegalArgumentException] {
      query("!!a")(
        mem(age)("!!a", "?b"),
        dsl.exists(mem(rec1)("!!a", "_", "_"))).toDF(spark)
    }
    assertThrows[IllegalArgumentException] {
      query("?a", "!!c")(
        mem(age)("?a", "?b"),
        existsAs(mem(rec1)("?a", "_", "_"), "!!c")).toDF(spark)
    }
  }

  test("unjoinable: unground tail with non-join ground field throws (parse.clj:394-407)") {
    // B shares only ?y, but its ?g would go null on unmatched rows — the
    // reference refuses to plan this ("Unable to join predicates together")
    val a = Seq(Seq(1L, 2L))
    val b = Seq(Seq(2L, 3L, 4L))
    assertThrows[IllegalArgumentException] {
      query("?y", "?g", "!!z")(
        mem(a)("?x", "?y"), mem(b)("?y", "!!z", "?g")).toDF(spark)
    }
  }

  test("dead-operation pruning (parse.clj:640-682, parse_test.clj:50-129)") {
    val pairs = Seq(Seq(1L, 2L), Seq(2L, 4L))
    val boom = Ops.mapFn((n: Long) => {
      throw new RuntimeException("pruned ops must never run"); n
    })
    // unused op output → op pruned → the throwing fn never executes
    assertProduces(
      query("?minus")(
        mem(pairs)("?a", "?b"),
        Ops.minus("?b", "?a") :> "?minus",
        boom("?a") :> "?plus"),
      Seq(Seq(1L), Seq(2L)))
    // chained dead ops both pruned
    assertProduces(
      query("?minus")(
        mem(pairs)("?a", "?b"),
        Ops.minus("?b", "?a") :> "?minus",
        boom("?a") :> "?plus",
        boom("?plus") :> "?incplus"),
      Seq(Seq(1L), Seq(2L)))
    // a pruned op's ?-output null filter must not apply either: nullMap
    // yields null for a=2 → with pruning both rows still survive
    val nullMap = Ops.mapFn((n: Long) =>
      if (n == 2L) None else Some(n): Option[Long])
    assertProduces(
      query("?minus")(
        mem(pairs)("?a", "?b"),
        Ops.minus("?b", "?a") :> "?minus",
        nullMap("?a") :> "?maybe"),
      Seq(Seq(1L), Seq(2L)))
    // NOT pruned when consumed by a filter downstream: plus survives and
    // the even filter actually drops the (1,2) row (1+2=3)
    val even = Ops.filterFn((n: Long) => n % 2 == 0)
    assertProduces(
      query("?minus")(
        mem(pairs)("?a", "?b"),
        Ops.minus("?b", "?a") :> "?minus",
        Ops.plus("?b", "?a") :> "?plus",
        even("?plus")),
      Seq(Seq(2L)))
  }

  test("mapop with no outputs filters on truthiness (api_test.clj:690-694)") {
    val src = Seq(Seq(1L), Seq(2L))
    val evenMap = Ops.mapFn((n: Long) => n % 2 == 0) // boolean result
    assertProduces(
      query("?x")(mem(src)(Seq("?x"): _*), evenMap("?x")),
      Seq(Seq(2L)))
    // non-boolean result: nil is falsy, any value (incl. 0) truthy
    val nilForOdd = Ops.mapFn((n: Long) =>
      if (n % 2 == 1) None else Some(0L): Option[Long])
    assertProduces(
      query("?x")(mem(src)(Seq("?x"): _*), nilForOdd("?x")),
      Seq(Seq(2L)))
  }

  test("op output colliding with own input chains equalities (api_test.clj:218-245)") {
    val nums = Seq(Seq(1L, 1L), Seq(0L, 0L), Seq(1L, 2L), Seq(3L, 7L),
      Seq(8L, 64L), Seq(7L, 1L), Seq(2L, 4L), Seq(6L, 6L))
    // (* ?n ?n :> ?n2) against bound ?n2: implicit equality n*n == n2
    assertProduces(
      query("?n", "?n2")(
        mem(nums)("?n", "?n2"), Ops.times("?n", "?n") :> "?n2"),
      Seq(Seq(1L, 1L), Seq(0L, 0L), Seq(8L, 64L), Seq(2L, 4L)))
    // chained self-collisions: n*n == n AND n+n == n → only 0
    assertProduces(
      query("?n")(
        mem(nums)("?n", "?n"),
        Ops.times("?n", "?n") :> "?n",
        Ops.plus("?n", "?n") :> "?n"),
      Seq(Seq(0L)))
  }

  test("bloated all-nullable join with :distinct (api_test.clj:104-122)") {
    val gender = Seq(Seq("n", "male"), Seq("j", "male"), Seq("a", null), Seq("z", "female"))
    val interest = Seq(Seq("n", "bball"), Seq("n", "dl"), Seq("j", "tennis"),
      Seq("z", "stuff"), Seq("a", "shoes"))
    val friends = Seq(Seq("n", "j"), Seq("n", "m"), Seq("n", "a"),
      Seq("j", "a"), Seq("a", "z"), Seq("z", "a"))
    val age = Seq(Seq("z", 20L), Seq("a", 10L), Seq("n", 15L))
    assertProduces(
      query("!p", "!interest", "!age", "!gender")(
        mem(friends)("!p", "_"),
        mem(age)("!p", "!age"),
        mem(interest)("!p", "!interest"),
        mem(gender)("!p", "!gender")).distinct,
      Seq(Seq("n", "bball", 15L, "male"), Seq("n", "dl", 15L, "male"),
        Seq("a", "shoes", 10L, null), Seq("z", "stuff", 20L, "female")))
  }

  test("limit / limit-rank full parity block (api_test.clj:721-783)") {
    val pair = Seq(Seq("a", 1L), Seq("a", 3L), Seq("a", 2L), Seq("a", 4L),
      Seq("b", 1L), Seq("b", 6L), Seq("b", 7L), Seq("c", 0L))
    def p(fields: Any*) = mem(pair)(fields: _*)
    // global pass-through buffer over the sorted whole
    val nothingBuf = Ops.bufferSame(1)(identity)
    assertProduces(
      query("?n2")(p("_", "?n"), nothingBuf("?n") :> "?n2").sorted("?n"),
      Seq(Seq(0L), Seq(1L), Seq(1L), Seq(2L), Seq(3L), Seq(4L), Seq(6L), Seq(7L)))
    // global limit 2 ascending
    assertProduces(
      query("?n2")(p("_", "?n"), Ops.limit(2)("?n") :> "?n2").sorted("?n"),
      Seq(Seq(0L), Seq(1L)))
    // global limit-rank 5, two sort fields
    assertProduces(
      query("?n2", "?r")(p("?l", "?n"),
        Ops.limitRank(5)("?n") :> ("?n2", "?r")).sorted("?l", "?n"),
      Seq(Seq(1L, 1L), Seq(2L, 2L), Seq(3L, 3L), Seq(4L, 4L), Seq(1L, 5L)))
    // reverse, two in/out fields
    assertProduces(
      query("?l2", "?n2")(p("?l", "?n"),
        Ops.limit(2)("?l", "?n") :> ("?l2", "?n2")).sorted("?l", "?n").reversed,
      Seq(Seq("c", 0L), Seq("b", 7L)))
    // global limit 3 keeps the duplicate 1
    assertProduces(
      query("?n2")(p("_", "?n"), Ops.limit(3)("?n") :> "?n2").sorted("?n"),
      Seq(Seq(0L), Seq(1L), Seq(1L)))
    // limit-rank 3 ascending
    assertProduces(
      query("?n2", "?r")(p("_", "?n"),
        Ops.limitRank(3)("?n") :> ("?n2", "?r")).sorted("?n"),
      Seq(Seq(0L, 1L), Seq(1L, 2L), Seq(1L, 3L)))
    // reverse limit 2
    assertProduces(
      query("?n2")(p("_", "?n"),
        Ops.limit(2)("?n") :> "?n2").sorted("?n").reversed,
      Seq(Seq(6L), Seq(7L)))
    // reverse limit-rank 2
    assertProduces(
      query("?n2", "?r")(p("_", "?n"),
        Ops.limitRank(2)("?n") :> ("?n2", "?r")).sorted("?n").reversed,
      Seq(Seq(6L, 2L), Seq(7L, 1L)))
    // ?l in the output → PER-GROUP limit 2
    assertProduces(
      query("?l", "?n2")(p("?l", "?n"),
        Ops.limit(2)("?n") :> "?n2").sorted("?n"),
      Seq(Seq("a", 1L), Seq("a", 2L), Seq("b", 1L), Seq("b", 6L), Seq("c", 0L)))
  }

  test("midje-style checkers: produces-some / prefix / suffix") {
    val src = mem(Seq(Seq(3L), Seq(1L), Seq(2L)))(Seq("?n"): _*)
    val sortedQ = query("?n2")(src,
      Ops.bufferSame(1)(identity)("?n") :> "?n2").sorted("?n").toDF(spark)
    assertProducesSome(sortedQ, Seq(Seq(2L)))
    assertProducesPrefix(sortedQ.orderBy("n2"), Seq(Seq(1L), Seq(2L)))
    assertProducesSuffix(sortedQ.orderBy("n2"), Seq(Seq(3L)))
  }

  test("multi-query parallel run-to-memory (api_test.clj:804-814)") {
    val data = Seq(Seq("ben", 35L), Seq("jerry", 41L))
    val under40 = query("?name", "?age")(
      mem(data)("?name", "?age"), Ops.lt("?age", 40L))
    val under50 = query("?name", "?age")(
      mem(data)("?name", "?age"), Ops.lt("?age", 50L))
    val Seq(a, b) = runToMemory(spark, Seq(under40, under50))
    assert(bag(a) == bag(Seq(Seq("ben", 35L))))
    assert(bag(b) == bag(data))
  }

  test("empty generator yields empty result (api_test.clj:36-40)") {
    assertProduces(query("?a")(mem(Seq.empty)(Seq("?a"): _*)), Seq.empty)
    // and through a join: empty ⋈ nonempty = empty
    assertProduces(
      query("?a", "?b")(
        mem(Seq.empty)(Seq("?a"): _*),
        mem(Seq(Seq("x", "y")))(Seq("?a", "?b"): _*)),
      Seq.empty)
  }
}
