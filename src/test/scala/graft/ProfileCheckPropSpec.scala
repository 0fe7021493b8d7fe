package graft

import graft.operators.{Check, Profile}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Differential checks for the profiler and the constraint layer
  * against plain in-memory folds over randomized frames with nulls,
  * duplicate keys, and out-of-range values. */
object ProfileCheckPropSpec extends Properties("Profile/Check") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestBase.session

  private val rowGen: Gen[(Long, Option[Double], Option[String])] = for {
    k <- Gen.choose(1L, 5L)
    v <- Gen.option(Gen.oneOf(-2.0, 0.0, 1.5, 7.25, 11.0))
    s <- Gen.option(Gen.oneOf("a", "bb", "ccc"))
  } yield (k, v, s)

  private val frameGen: Gen[List[(Long, Option[Double], Option[String])]] =
    Gen.nonEmptyListOf(rowGen)

  property("profile matches an in-memory fold") = forAll(frameGen) { rows =>
    val sqlc = spark
    import sqlc.implicits._
    val df = rows.toDF("k", "v", "s")
    val got = Profile.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ks = rows.map(_._1)
    val vs = rows.flatMap(_._2)
    val ss = rows.flatMap(_._3)
    val kOk = {
      val r = got("k")
      r.getLong(1) == rows.size && r.getLong(2) == 0 &&
        r.getLong(3) == ks.distinct.size &&
        r.getDouble(4) == ks.min.toDouble && r.getDouble(5) == ks.max.toDouble
    }
    val vOk = {
      val r = got("v")
      r.getLong(2) == rows.count(_._2.isEmpty) &&
        r.getLong(3) == vs.distinct.size &&
        (vs.isEmpty && r.isNullAt(4) ||
          vs.nonEmpty && r.getDouble(4) == vs.min && r.getDouble(5) == vs.max)
    }
    val sOk = {
      val r = got("s")
      r.getLong(2) == rows.count(_._3.isEmpty) &&
        r.getLong(3) == ss.distinct.size &&
        (ss.isEmpty && r.isNullAt(6) ||
          ss.nonEmpty && r.getString(6) == ss.min && r.getString(7) == ss.max)
    }
    kOk && vOk && sOk
  }

  property("check matches an in-memory fold") = forAll(frameGen) { rows =>
    val sqlc = spark
    import sqlc.implicits._
    val df = rows.toDF("k", "v", "s")
    val dim = List(1L, 2L, 3L).toDF("k")
    val got = Check.check(df, Seq(
        Check.NotNull("v"), Check.Unique(Seq("k")),
        Check.InRange("v", 0.0, 10.0), Check.RefIn("k", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dupRows = rows.groupBy(_._1).values.filter(_.size > 1).map(_.size).sum
    got("rows") == rows.size &&
      got("not_null(v)") == rows.count(_._2.isEmpty) &&
      got("unique(k)") == dupRows &&
      got("in_range(v,0.0,10.0)") ==
        rows.count(_._2.exists(x => x < 0.0 || x > 10.0)) &&
      got("ref_in(k->k)") == rows.count(r => r._1 > 3L)
  }
}
