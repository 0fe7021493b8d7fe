package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  lazy val events = Seq(
    (1L, 0L), (1L, 10L), (1L, 20L),   // session 1 (gaps <= 10)
    (1L, 31L),                        // gap 11 > 10 -> session 2
    (1L, 41L), (2L, 100L), (2L, 200L) // key 2: gap 100 > 10 -> two sessions
  ).toDF("k", "t")

  test("gap-inclusive assignment: diff == gap stays in session") {
    val got = Sessionize.assign(events, "k", "t", gap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) == 1 && got((1L, 10L)) == 1 && got((1L, 20L)) == 1)
    assert(got((1L, 31L)) == 2 && got((1L, 41L)) == 2)
    assert(got((2L, 100L)) == 1 && got((2L, 200L)) == 2)
  }

  test("sessions rollup matches assignment aggregation") {
    val s = Sessionize.sessions(events, "k", "t", gap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(s((1L, 1L)) == ((3L, 0L, 20L)))
    assert(s((1L, 2L)) == ((2L, 31L, 41L)))
    assert(s((2L, 1L)) == ((1L, 100L, 100L)))
    assert(s((2L, 2L)) == ((1L, 200L, 200L)))
  }

  test("deterministic under equal timestamps with a tie-break") {
    val dup = Seq((1L, 5L, "a"), (1L, 5L, "b"), (1L, 30L, "c")).toDF("k", "t", "id")
    val a = Sessionize.assign(dup, "k", "t", 10L, Seq(col("id")))
      .orderBy("id").select("session_id").as[Long].collect().toSeq
    assert(a == Seq(1L, 1L, 2L))
  }
}
