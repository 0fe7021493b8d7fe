package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("grid covers min..max per key; gaps forward-filled and flagged") {
    val obs = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 45L, 9.0),
      (2L, 100L, 5.0)).toDF("k", "t", "v")
    val out = Resample.gridFill(obs, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getBoolean(2)))).toMap
    // key 1: slots 1..4; slot 1 holds max(1.0, 2.0); slots 2,3 ffilled
    assert(out((1L, 1L)) == ((2.0, true)))
    assert(out((1L, 2L)) == ((2.0, false)))
    assert(out((1L, 3L)) == ((2.0, false)))
    assert(out((1L, 4L)) == ((9.0, true)))
    // key 2: single slot, no gaps
    assert(out((2L, 10L)) == ((5.0, true)))
    assert(out.size == 5)
  }

  test("edge shapes: empty input, single observation, negative times") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    assert(Resample.gridFill(empty, "k", "t", "v", 10L).count() == 0)
    val one = Seq((1L, 7L, 2.5)).toDF("k", "t", "v")
    val o = Resample.gridFill(one, "k", "t", "v", 10L).collect()
    assert(o.length == 1 && o(0).getDouble(3) == 2.5 && o(0).getBoolean(2))
    // negative times: Spark `div` and DuckDB `//` both TRUNCATE toward
    // zero ((-15) div 10 = -1 on each), so slot assignment stays
    // engine-consistent below zero too
    val neg = Seq((1L, -15L, 1.0), (1L, 15L, 2.0)).toDF("k", "t", "v")
    val n = Resample.gridFill(neg, "k", "t", "v", 10L)
    assert(n.count() >= 3 && n.filter($"observed").count() == 2)
  }

  test("outlier span fails loudly, naming the key — not an opaque explode") {
    // one epoch-0 row against a modern-epoch key: span/step is ~170M
    // slots, far past the default guard — must raise a message naming
    // the key, not Spark's sequence-length error or an OOM
    val outlier = Seq((7L, 0L, 1.0), (7L, 1700000000000L, 2.0)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.gridFill(outlier, "k", "t", "v", step = 1000L).count()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    val all = msgs(e).mkString(" | ")
    assert(all.contains("maxSlotsPerKey"), s"wrong error: $all")
    assert(all.contains("key 7"), s"error must name the key: $all")
    // explicit cap override keeps wide-but-intended grids usable
    val wide = Resample.gridFill(outlier, "k", "t", "v",
      step = 100000000000L, maxSlotsPerKey = 100L)
    assert(wide.count() == 18)
  }

  test("all-NULL timestamps drop the key quietly; overflowing spans fail loudly") {
    // a key whose every timestamp is NULL has NULL bounds — it must be
    // DROPPED (the pre-guard behavior for dirty rows), not raise
    val dirty = Seq((1L, Some(10L), 1.0), (1L, Some(20L), 2.0),
      (2L, None, 9.0)).toDF("k", "t", "v")
    val out = Resample.gridFill(dirty, "k", "t", "v", step = 10L)
    assert(out.select("k").distinct().as[Long].collect().toSet == Set(1L))
    // mixed-sign span overflowing Long: try_subtract goes NULL and the
    // guard raises the named error — NOT Spark's opaque ANSI overflow
    val huge = Seq((3L, Long.MinValue + 10L, 1.0), (3L, Long.MaxValue - 10L, 2.0))
      .toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.gridFill(huge, "k", "t", "v", step = 1L).count()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    val all = msgs(e).mkString(" | ")
    assert(all.contains("maxSlotsPerKey") && all.contains(">Long.MaxValue"),
      s"wrong error: $all")
  }

  test("no gaps -> pure snap; duplicates in a slot reduce by max") {
    val obs = Seq((1L, 0L, 3.0), (1L, 1L, 1.0), (1L, 12L, 7.0)).toDF("k", "t", "v")
    val out = Resample.gridFill(obs, "k", "t", "v", step = 10L)
      .orderBy("slot").select("value", "observed")
      .as[(Double, Boolean)].collect().toSeq
    assert(out == Seq((3.0, true), (7.0, true)))
  }
}
