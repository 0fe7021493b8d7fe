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
}
