package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  lazy val snap = Seq(
    (1L, "a0", 0L, false), (2L, "b0", 0L, false), (3L, "c0", 0L, false),
    (4L, "d5", 5L, false)).toDF("k", "v", "version", "deleted")

  test("upsert applies updates, inserts, and tombstone deletes") {
    val delta = Seq(
      (2L, "b1", 1L, false),  // update
      (5L, "e1", 1L, false),  // insert
      (3L, "xx", 1L, true),   // delete
      (4L, "d1", 1L, false))  // STALE update: snapshot already at v5
      .toDF("k", "v", "version", "deleted")
    val out = Snapshot.upsert(snap, delta, Seq("k"), "version",
      tombstoneCol = Some("deleted"))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a0", 2L -> "b1", 4L -> "d5", 5L -> "e1"))
  }

  test("equal versions resolve delta-wins; chained merges compose") {
    val d1 = Seq((1L, "a1", 0L, false)).toDF("k", "v", "version", "deleted")
    val once = Snapshot.upsert(snap, d1, Seq("k"), "version", Some("deleted"))
    assert(once.filter($"k" === 1L).select("v").as[String].head() == "a1")
    // delete then re-insert at a later version across two merges
    val d2 = Seq((1L, "zz", 2L, true)).toDF("k", "v", "version", "deleted")
    val d3 = Seq((1L, "a3", 3L, false)).toDF("k", "v", "version", "deleted")
    val fin = Snapshot.upsert(
      Snapshot.upsert(once, d2, Seq("k"), "version", Some("deleted")),
      d3, Seq("k"), "version", Some("deleted"))
    assert(fin.filter($"k" === 1L).select("v").as[String].head() == "a3")
  }

  test("merge plans as partial+final aggregation, not a window sort") {
    val delta = Seq((2L, "b1", 1L, false)).toDF("k", "v", "version", "deleted")
    val plan = Snapshot.upsert(snap, delta, Seq("k"), "version")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), plan)
    assert(!plan.contains("Window"), "upsert must not plan a window sort")
  }

  test("diff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, null.asInstanceOf[String], 4.0)).toDF("k", "v", "x")
    val neu = Seq((2L, "b", 2.0), (3L, "C", 3.0),
      (4L, null.asInstanceOf[String], 4.0), (5L, "e", 5.0)).toDF("k", "v", "x")
    val d = Snapshot.diff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    // 1 removed, 3 changed, 5 added; 2 and 4 (null==null payload) dropped
    assert(d == Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }

  test("schema mismatch fails loudly") {
    assertThrows[IllegalArgumentException] {
      Snapshot.upsert(snap, snap.drop("v"), Seq("k"), "version")
    }
  }
}
