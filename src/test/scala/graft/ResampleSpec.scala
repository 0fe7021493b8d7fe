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

  test("no gaps -> pure snap; duplicates in a slot reduce by max") {
    val obs = Seq((1L, 0L, 3.0), (1L, 1L, 1.0), (1L, 12L, 7.0)).toDF("k", "t", "v")
    val out = Resample.gridFill(obs, "k", "t", "v", step = 10L)
      .orderBy("slot").select("value", "observed")
      .as[(Double, Boolean)].collect().toSeq
    assert(out == Seq((3.0, true), (7.0, true)))
  }
}
