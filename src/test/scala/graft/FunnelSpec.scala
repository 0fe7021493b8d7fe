package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** Funnel semantics on hand-built event sequences: strict-after step
  * ordering, the conversion window anchored at step 1, stalls, equal-
  * timestamp ties, and the cumulative stage summary. */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "us", "event_type")

  private val steps = Seq("a", "b", "c")

  test("full conversion, stalls, and out-of-order steps") {
    val events = ev(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // full funnel
      (2L, 10L, "a"), (2L, 20L, "b"),                 // stalls at 2
      (3L, 10L, "a"),                                 // stalls at 1
      (4L, 20L, "b"), (4L, 30L, "c"),                 // never entered
      (5L, 10L, "b"), (5L, 20L, "a"), (5L, 30L, "c")) // b BEFORE a: stage 1? no — c after a
    val out = Funnel.funnel(events, steps, tsCol = "us")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), (2 to 4).map(i => if (r.isNullAt(i)) null else r.getLong(i)))).toMap
    assert(out(1L) == ((3, Seq(10L, 20L, 30L))))
    assert(out(2L) == ((2, Seq(10L, 20L, null))))
    assert(out(3L) == ((1, Seq(10L, null, null))))
    assert(!out.contains(4L)) // no step-1 event: not an entrant
    // user 5: a at 20; the only b is at 10 (before a) so the funnel
    // stalls at stage 1 even though a c exists later
    assert(out(5L) == ((1, Seq(20L, null, null))))
  }

  test("strict-after ordering: equal timestamps do not advance") {
    val events = ev((1L, 10L, "a"), (1L, 10L, "b"), (1L, 11L, "b"))
    val out = Funnel.funnel(events, Seq("a", "b"), tsCol = "us").collect().head
    assert(out.getInt(1) == 2 && out.getLong(3) == 11L) // picks the later b
  }

  test("earliest-match greediness and repeated steps") {
    // two a's: the funnel anchors at the EARLIEST a (5), so the b at 8
    // counts even though it precedes the second a
    val events = ev((1L, 5L, "a"), (1L, 12L, "a"), (1L, 8L, "b"))
    val out = Funnel.funnel(events, Seq("a", "b"), tsCol = "us").collect().head
    assert(out.getLong(2) == 5L && out.getLong(3) == 8L)
  }

  test("conversion window is anchored at step 1") {
    val events = ev(
      (1L, 0L, "a"), (1L, 50L, "b"), (1L, 120L, "c"),  // c outside window
      (2L, 0L, "a"), (2L, 99L, "b"), (2L, 100L, "c"))  // c exactly at bound
    val out = Funnel.funnel(events, steps, tsCol = "us",
      maxSpan = Some(lit(100L)))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 2) // 120 > 0 + 100
    assert(out(2L) == 3) // inclusive bound
  }

  test("funnelStages: cumulative reached-at-least counts") {
    val events = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "a"), (4L, 1L, "a"))
    val st = Funnel.funnelStages(Funnel.funnel(events, steps, tsCol = "us"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(st(1) == ((2L, 4L)) && st(2) == ((1L, 2L)) && st(3) == ((1L, 1L)))
  }

  test("retention: cohorts by first bucket, offsets deduped within bucket") {
    val events = Seq(
      (1L, 5L), (1L, 7L), (1L, 15L), (1L, 35L), // cohort 0, active 0,1,3
      (2L, 12L), (2L, 19L),                     // cohort 1, active 1 (deduped)
      (3L, 9L), (3L, 9L)                        // cohort 0, active 0
    ).toDF("user_id", "us")
    val got = Funnel.retention(events, bucket = 10L, tsCol = "us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("single-step funnel and null timestamps") {
    val events = Seq((1L, Some(10L), "a"), (2L, None, "a"))
      .toDF("user_id", "us", "event_type")
    val out = Funnel.funnel(events, Seq("a"), tsCol = "us").collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getInt(1) == 1)
  }
}
