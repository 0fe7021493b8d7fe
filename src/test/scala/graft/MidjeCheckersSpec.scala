package graft

import graft.dsl._
import graft.ops.Ops

/** The reference's checker battery ported
  * (midje-cascalog/test/midje/cascalog_test.clj:70-103): the sum query
  * over src = [[1 2] [1 3] [3 4] [3 6] [5 2] [5 9]] driven through every
  * checker mode. Ordered modes run the query `.sorted` so the collected
  * order is defined, which is also the reference's stated use case for
  * `:in-order` ("helpful in cases where output is sorted"). */
class MidjeCheckersSpec extends SparkTestBase {

  private val src = Seq(
    Seq(1L, 2L), Seq(1L, 3L),
    Seq(3L, 4L), Seq(3L, 6L),
    Seq(5L, 2L), Seq(5L, 9L))

  private def sumQuery = query("?x", "?sum")(
    mem(src)(Seq("?x", "?y"): _*),
    Ops.sum("?y") :> "?sum")

  test("produces: proper sums in either order (cascalog_test.clj:78-80)") {
    assertProduces(sumQuery, Seq(Seq(3L, 10L), Seq(1L, 5L), Seq(5L, 11L)))
    assertProduces(sumQuery, Seq(Seq(1L, 5L), Seq(3L, 10L), Seq(5L, 11L)))
  }

  test("produces :in-order on a sorted query (cascalog_test.clj:82-86)") {
    val sorted = sumQuery.sorted("?x").toDF(spark)
    assertProducesInOrder(sorted, Seq(Seq(1L, 5L), Seq(3L, 10L), Seq(5L, 11L)))
    // wrong order must fail
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertProducesInOrder(sorted, Seq(Seq(3L, 10L), Seq(5L, 11L), Seq(1L, 5L)))
    }
  }

  test("produces-some: subset, subsequence, contiguity (cascalog_test.clj:88-96)") {
    val q = sumQuery.toDF(spark)
    // unordered subset: any order of a subset passes
    assertProducesSome(q, Seq(Seq(5L, 11L), Seq(1L, 5L)))
    val sorted = sumQuery.sorted("?x").toDF(spark)
    // :in-order — ordering matters, gaps are fine
    assertProducesSome(sorted, Seq(Seq(1L, 5L), Seq(5L, 11L)), inOrder = true)
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertProducesSome(sorted, Seq(Seq(5L, 11L), Seq(1L, 5L)), inOrder = true)
    }
    // :in-order :no-gaps — gapped tuples fail, adjacent pass
    assertProducesSome(sorted, Seq(Seq(1L, 5L), Seq(3L, 10L)),
      inOrder = true, noGaps = true)
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertProducesSome(sorted, Seq(Seq(1L, 5L), Seq(5L, 11L)),
        inOrder = true, noGaps = true)
    }
  }

  test("produces-prefix / produces-suffix (cascalog_test.clj:98-103)") {
    val sorted = sumQuery.sorted("?x").toDF(spark)
    assertProducesPrefix(sorted, Seq(Seq(1L, 5L)))
    val sorted2 = sumQuery.sorted("?x").toDF(spark)
    assertProducesPrefix(sorted2, Seq(Seq(1L, 5L), Seq(3L, 10L)))
    val sorted3 = sumQuery.sorted("?x").toDF(spark)
    assertProducesSuffix(sorted3, Seq(Seq(5L, 11L)))
  }

  test("memory sources produce themselves (cascalog.clj:20-21)") {
    assertProduces(
      query("?a")(mem(Seq(Seq(1L)))(Seq("?a"): _*)),
      Seq(Seq(1L)))
  }
}
