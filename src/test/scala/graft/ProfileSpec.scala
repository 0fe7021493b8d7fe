package graft

import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: hand-computed metrics, null handling, type routing") {
    val df = Seq(
      (1L, Option(2.5), Option("b")),
      (2L, None: Option[Double], Option("a")),
      (3L, Option(1.5), None: Option[String]),
      (3L, Option(2.5), Option("a"))
    ).toDF("k", "v", "s")
    val p = graft.operators.Profile.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 3.0 &&
      k.isNullAt(6) && k.isNullAt(7))
    val v = p("v")
    assert(v.getLong(1) == 4 && v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 1.5 && v.getDouble(5) == 2.5)
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    // unsupported column type raises up front, not mid-job
    intercept[IllegalArgumentException] {
      graft.operators.Profile.profile(
        df.withColumn("arr", array(col("k"))), Seq("arr"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.profile(df, Seq("nope"))
    }
  }

  test("profile: all-null column and one-row frame") {
    val df = Seq((1L, None: Option[String])).toDF("k", "s")
    val p = graft.operators.Profile.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 0 &&
      p("s").isNullAt(6) && p("s").isNullAt(7))
    assert(p("k").getLong(3) == 1 && p("k").getDouble(4) == 1.0)
  }
}
