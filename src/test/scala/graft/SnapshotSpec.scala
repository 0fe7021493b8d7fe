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

  test("diff over bucketed snapshots plans with NO shuffle exchange") {
    // the 100 TB repeated-diff path: corpus versions written bucketed on
    // the key -> each audit is a co-located full-outer join, no shuffle
    import graft.sources.Taps
    val v1 = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val v2 = (3 to 305).map(i => (i.toLong, if (i % 7 == 0) "CH" else s"v$i"))
      .toDF("k", "v")
    Taps.bucketSink(v1, "t_snap_v1", Seq("k"), 4, sortCols = Seq("k"))
    Taps.bucketSink(v2, "t_snap_v2", Seq("k"), 4, sortCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = Snapshot.diff(spark.table("t_snap_v1"), spark.table("t_snap_v2"),
        Seq("k"))
      val byChange = d.groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byChange("added") == 5 && byChange("removed") == 2)
      assert(byChange("changed") == (3 to 300).count(_ % 7 == 0))
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed diff should be shuffle-free, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("edge shapes: empty delta, empty snapshot, all-tombstone delta") {
    val empty = snap.limit(0)
    assert(Snapshot.upsert(snap, empty, Seq("k"), "version", Some("deleted"))
      .count() == snap.count())
    assert(Snapshot.upsert(empty, snap, Seq("k"), "version", Some("deleted"))
      .count() == snap.count())
    val allDel = snap.withColumn("deleted", lit(true))
      .withColumn("version", lit(99L))
    assert(Snapshot.upsert(snap, allDel, Seq("k"), "version", Some("deleted"))
      .count() == 0)
    assert(Snapshot.diff(snap, snap, Seq("k")).count() == 0)
    assert(Snapshot.diff(empty, snap, Seq("k"))
      .filter($"change" === "added").count() == snap.count())
  }

  test("randomized: upsert equals the per-key max-(version, delta-wins) model") {
    val rnd = new scala.util.Random(8)
    for (it <- 1 to 10) {
      def side(src: Int) = {
        // unique (key, version) within a side — the documented invariant
        val pairs = rnd.shuffle(
          (for (k <- 0 to rnd.nextInt(8); v <- 0 to rnd.nextInt(5)) yield (k, v))
            .toList).take(1 + rnd.nextInt(20))
        pairs.map { case (k, v) =>
          (k.toLong, s"$src:$k:$v", v.toLong, rnd.nextDouble() < 0.2)
        }
      }
      val s0 = side(0); val s1 = side(1)
      val model = (s0.map(r => (r._1, r._3, 0, r._2, r._4)) ++
        s1.map(r => (r._1, r._3, 1, r._2, r._4)))
        .groupBy(_._1).map { case (k, rows) =>
          val w = rows.maxBy(r => (r._2, r._3)); (k, w._4, w._5)
        }.filterNot(_._3).map(w => w._1 -> w._2).toMap
      val got = Snapshot.upsert(
        s0.toDF("k", "v", "version", "deleted"),
        s1.toDF("k", "v", "version", "deleted"),
        Seq("k"), "version", Some("deleted"))
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(got == model, s"iter $it")
    }
  }

  test("schema mismatch fails loudly") {
    assertThrows[IllegalArgumentException] {
      Snapshot.upsert(snap, snap.drop("v"), Seq("k"), "version")
    }
  }

  test("history: runs collapse, change-backs split, valid_to chains") {
    val versions = Seq(
      (1L, "A", 0L), (1L, "A", 1L), (1L, "B", 2L), (1L, "A", 3L), // A->B->A
      (2L, "X", 0L), (2L, "X", 5L), (2L, "X", 9L),                // never changes
      (3L, "P", 7L)                                               // single version
    ).toDF("k", "v", "version")
    val h = Snapshot.history(versions, Seq("k"), "version")
    val got = h.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got == Set(
      (1L, "A", 0L, 2L), (1L, "B", 2L, 3L), (1L, "A", 3L, null),
      (2L, "X", 0L, null),
      (3L, "P", 7L, null)))
    // intervals chain: every non-current valid_to is the next valid_from
    // and exactly one current row per key
    val byKey = got.groupBy(_._1)
    assert(byKey.values.forall(_.count(_._4 == null) == 1))
  }

  test("history: multi-column payloads compare null-safely") {
    val versions = Seq(
      (1L, Some("a"), Some(10L), 0L),
      (1L, None, Some(10L), 1L),      // a -> null IS a change
      (1L, None, Some(10L), 2L),      // null == null: collapses
      (1L, Some("a"), Some(10L), 3L)
    ).toDF("k", "s", "n", "version")
    val h = Snapshot.history(versions, Seq("k"), "version")
    assert(h.count() == 3)
    assert(h.filter(col("valid_to").isNull).count() == 1)
  }
}
