package graft

import graft.dsl._
import graft.japi.JApi
import graft.ops.Ops
import java.util.{Arrays => JA}

/** Planner validation errors (reference `thrown?<-` surface,
  * logic/parse.clj:104-154) + the Java-friendly API facade. */
class ValidationJapiSpec extends SparkTestBase {

  test("validation: unbound output var") {
    val e = intercept[IllegalArgumentException] {
      query("?p", "?nope")(mem(Playground.person)(Seq("?p"): _*)).toDF(spark)
    }
    assert(e.getMessage.contains("?nope"))
  }

  test("validation: buffer cannot mix with aggregators (parse.clj:131-139)") {
    val buf = Ops.bufferSame(1)(it => it.take(1))
    assertThrows[IllegalArgumentException] {
      query("?p", "?a", "?c")(
        mem(Playground.age)(Seq("?p", "?x"): _*),
        buf("?x") :> "?a",
        Ops.count() :> "?c").toDF(spark)
    }
  }

  test("validation: multiple buffers rejected") {
    val buf = Ops.bufferSame(1)(it => it.take(1))
    assertThrows[IllegalArgumentException] {
      query("?p", "?a", "?b")(
        mem(Playground.age)(Seq("?p", "?x"): _*),
        buf("?x") :> "?a",
        buf("?x") :> "?b").toDF(spark)
    }
  }

  test("validation: op with unsatisfiable inputs") {
    assertThrows[RuntimeException] {
      query("?p")(
        mem(Playground.person)(Seq("?p"): _*),
        Ops.lt("?unbound", 3)).toDF(spark)
    }
  }

  test("java api: generator + filter + aggregation (jcascalog_test.clj)") {
    val age = memDF(spark, Playground.age)
    val q = JApi.subquery(JA.asList("?cnt"))
      .generator(age, JA.asList("?person", "?age"))
      .op(JApi.lt(), JA.asList("?age", Int.box(30)))
      .op(JApi.count(), JA.asList(), JA.asList("?cnt"))
      .build()
    val rows = JApi.run(spark, q).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 5L)
  }

  // ---- jcascalog parity block (reference jcascalog_test.clj, mirrored
  // case-by-case; Api.java:39-131, Option.java, PredicateMacro*.java)

  import graft.japi.{JOption, JPredicate, JPredicateMacro}

  private def letterRows: java.util.List[java.util.List[Object]] =
    JA.asList(
      JA.asList[Object]("a", Int.box(1)), JA.asList[Object]("a", Int.box(2)),
      JA.asList[Object]("b", Int.box(10)), JA.asList[Object]("c", Int.box(3)),
      JA.asList[Object]("b", Int.box(2)), JA.asList[Object]("a", Int.box(6)))

  test("jcascalog test-vanilla: map op + agg, filter, DISTINCT option") {
    // (?letter ?doublesum): multiply by 2, sum -> a 18, b 24, c 6
    val q = JApi.subquery(JA.asList("?letter", "?doublesum"))
      .mem(letterRows, JA.asList("?letter", "?v"))
      .op(JApi.times(), JA.asList("?v", Int.box(2)), JA.asList("?double"))
      .op(JApi.sum(), JA.asList("?double"), JA.asList("?doublesum"))
      .build()
    val got = JApi.run(spark, q).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 18L), ("b", 24L), ("c", 6L)))
    // equality filter -> a a a
    val qf = JApi.subquery(JA.asList("?letter"))
      .mem(letterRows, JA.asList("?letter", "_"))
      .op(Ops.eqv, JA.asList("?letter", "a"))
      .build()
    assert(JApi.run(spark, qf).collect().map(_.getString(0)).toSeq
      == Seq("a", "a", "a"))
    // + Option/DISTINCT -> a
    val qd = JApi.subquery(JA.asList("?letter"))
      .mem(letterRows, JA.asList("?letter", "_"))
      .op(Ops.eqv, JA.asList("?letter", "a"))
      .option(JOption.DISTINCT)
      .build()
    assert(JApi.run(spark, qd).collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("jcascalog test-java-predicate-macro: reified macro with gen vars") {
    val myAvg = new JPredicateMacro {
      def getPredicates(in: java.util.List[Object], out: java.util.List[Object])
          : java.util.List[JPredicate] = {
        val c = JApi.genNullableVar(); val s = JApi.genNullableVar()
        JA.asList(
          new JPredicate(JApi.count(), JA.asList(), JA.asList(c)),
          new JPredicate(JApi.sum(), JA.asList(in.get(0)), JA.asList(s)),
          new JPredicate(JApi.div(), JA.asList[Object](s, c), JA.asList(out.get(0).asInstanceOf[String])))
      }
    }
    val nums: java.util.List[java.util.List[Object]] =
      JA.asList(JA.asList[Object](Int.box(1)), JA.asList[Object](Int.box(2)),
        JA.asList[Object](Int.box(3)), JA.asList[Object](Int.box(4)),
        JA.asList[Object](Int.box(5)))
    val q = JApi.subquery(JA.asList("?avg"))
      .mem(nums, JA.asList("?v"))
      .macroOp(myAvg, JA.asList[Object]("?v"), JA.asList("?avg"))
      .build()
    val rows = JApi.run(spark, q).collect()
    assert(rows.length == 1 && rows(0).getDouble(0) == 3.0)
  }

  test("jcascalog test-java-predicate-macro-template: hygienic renames") {
    val myAvgTemplate = JApi.macroTemplate(JA.asList("?v"))
      .out(JA.asList("?avg"))
      .predicate(JApi.count(), JA.asList(), JA.asList("?count"))
      .predicate(JApi.sum(), JA.asList[Object]("?v"), JA.asList("?sum"))
      .predicate(JApi.div(), JA.asList[Object]("?sum", "?count"), JA.asList("?avg"))
      .build()
    val nums: java.util.List[java.util.List[Object]] =
      JA.asList(JA.asList[Object](Int.box(1)), JA.asList[Object](Int.box(2)),
        JA.asList[Object](Int.box(3)), JA.asList[Object](Int.box(4)),
        JA.asList[Object](Int.box(5)))
    // caller binds the source var as ?sum to try to confuse the template —
    // the template's internal ?sum must be renamed, not captured
    val q = JApi.subquery(JA.asList("?avg"))
      .mem(nums, JA.asList("?sum"))
      .macroOp(myAvgTemplate, JA.asList[Object]("?sum"), JA.asList("?avg"))
      .build()
    val rows = JApi.run(spark, q).collect()
    assert(rows.length == 1 && rows(0).getDouble(0) == 3.0)
  }

  test("jcascalog test-first-n: sorted head as a generator + constant filter") {
    val data: java.util.List[java.util.List[Object]] =
      JA.asList(JA.asList[Object]("a", Int.box(1)), JA.asList[Object]("a", Int.box(1)),
        JA.asList[Object]("b", Int.box(1)), JA.asList[Object]("c", Int.box(1)),
        JA.asList[Object]("c", Int.box(1)), JA.asList[Object]("a", Int.box(1)),
        JA.asList[Object]("d", Int.box(1)))
    val counts = JApi.subquery(JA.asList("?l", "?count"))
      .mem(data, JA.asList("?l", "_"))
      .op(JApi.count(), JA.asList(), JA.asList("?count"))
      .build()
    val firstn = JApi.firstN(counts, 2, JA.asList("?count"), true,
      JA.asList[Object]("?l", Long.box(2L)))
    val q = JApi.subquery(JA.asList("?l")).gen(firstn).build()
    assert(JApi.run(spark, q).collect().map(_.getString(0)).toSeq == Seq("c"))
  }

  test("jcascalog test-java-each: 1-in-1-out op across N fields") {
    val data: java.util.List[java.util.List[Object]] =
      JA.asList(JA.asList[Object](Int.box(1), Int.box(2), Int.box(3)),
        JA.asList[Object](Int.box(4), Int.box(5), Int.box(6)))
    val q = JApi.subquery(JA.asList("?x", "?y", "?z"))
      .mem(data, JA.asList("?a", "?b", "?c"))
      .op(JApi.each(Ops.mapFn((v: Int) => v * 10)),
        JA.asList[Object]("?a", "?b", "?c"), JA.asList("?x", "?y", "?z"))
      .build()
    val got = JApi.run(spark, q).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((10, 20, 30), (40, 50, 60)))
    // the reference case proper: each(Sum) over N columns = N parallel
    // AGGREGATORS in one pass -> [5 7 9] (jcascalog_test.clj test-java-each)
    val agg = JApi.subquery(JA.asList("?x", "?y", "?z"))
      .mem(data, JA.asList("?a", "?b", "?c"))
      .opEach(JApi.sum(), JA.asList[Object]("?a", "?b", "?c"),
        JA.asList("?x", "?y", "?z"))
      .build()
    val rows = JApi.run(spark, agg).collect()
    assert(rows.length == 1 &&
      (rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2)) == ((5L, 7L, 9L)))
  }

  test("jcascalog Api.union / Api.combine over generators") {
    val a = memDF(spark, Seq(Seq("x"), Seq("y")))
    val b = memDF(spark, Seq(Seq("y"), Seq("z")))
    val ga = graft.logic.GenPred(_ => a, Seq("?s"))
    val gb = graft.logic.GenPred(_ => b, Seq("?s"))
    val u = JApi.subquery(JA.asList("?s"))
      .gen(JApi.union(JA.asList(ga, gb))).build()
    assert(JApi.run(spark, u).collect().map(_.getString(0)).toSet
      == Set("x", "y", "z"))
    assert(JApi.run(spark, u).count() == 3) // deduped
    val c = JApi.subquery(JA.asList("?s"))
      .gen(JApi.combine(JA.asList(ga, gb))).build()
    assert(JApi.run(spark, c).count() == 4) // concatenated
  }

  test("jcascalog Option.SORT + REVERSE drive a sorted buffer from Java") {
    val age = memDF(spark, Playground.age)
    // buffer emits the group's first tuple under the query's sort —
    // with SORT ?age REVERSE this is each person's max age row shape
    val firstOf = Ops.bufferSame(1) { it =>
      if (it.hasNext) Iterator.single(Seq(it.next().head)) else Iterator.empty
    }
    val q = JApi.subquery(JA.asList("?person", "?oldest"))
      .generator(age, JA.asList("?person", "?age"))
      .op(firstOf, JA.asList[Object]("?age"), JA.asList("?oldest"))
      .option(JOption.SORT, JA.asList("?age"))
      .option(JOption.REVERSE)
      .option(JOption.REDUCERS, Int.box(2))
      .build()
    val got = JApi.run(spark, q).collect()
      .map(r => (r.getString(0), r.get(1))).toMap
    val expect = Playground.age.groupBy(_.head).map { case (p, rows) =>
      p -> rows.map(v => String.valueOf(v(1)).toLong).max
    }
    assert(got.size == expect.size && expect.forall { case (p, m) =>
      String.valueOf(got(p.asInstanceOf[String])).toLong == m
    })
  }

  test("jcascalog Option.TRAP diverts failing tuples from Java") {
    val rows: java.util.List[java.util.List[Object]] =
      JA.asList(JA.asList[Object]("1"), JA.asList[Object]("boom"),
        JA.asList[Object]("3"))
    val trapped = new java.util.concurrent.atomic.AtomicLong(0)
    val sink: java.util.function.Consumer[org.apache.spark.sql.DataFrame] =
      df => trapped.addAndGet(df.count())
    val q = JApi.subquery(JA.asList("?n"))
      .mem(rows, JA.asList("?s"))
      .trappedOp(s => String.valueOf(s.toInt * 2), JA.asList[Object]("?s"),
        JA.asList("?n"))
      .option(JOption.TRAP, sink)
      .build()
    val clean = JApi.run(spark, q).collect().map(_.getString(0)).toSet
    assert(clean == Set("2", "6"), clean.toString)
    assert(trapped.get() == 1L, s"trap sink saw ${trapped.get()} rows")
  }

  test("jcascalog taps: execute to parquet, hfsSeqfile round-trip, stdout") {
    val dir = java.nio.file.Files.createTempDirectory("japi_tap").toString + "/out"
    val q = JApi.subquery(JA.asList("?letter", "?n"))
      .mem(letterRows, JA.asList("?letter", "?v"))
      .op(JApi.count(), JA.asList(), JA.asList("?n"))
      .build()
    JApi.execute(spark, q, dir)
    val back = JApi.subquery(JA.asList("?l"))
      .gen(JApi.hfsSeqfile(dir, JA.asList("?l", "?cnt")))
      .build()
    assert(JApi.run(spark, back).count() == 3)
    assert(JApi.numOutFields(q) == 2)
    assert(JApi.getOutFields(spark, q) == JA.asList("letter", "n"))
    JApi.stdout(spark, q) // must not throw
  }
}
