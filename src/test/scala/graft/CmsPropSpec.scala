package graft

import graft.operators.Sketches
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM property checks for the count-min kernel (the cell math
  * both the Aggregator and the streaming twin fold with): the
  * overestimate guarantee against exact counts, total-mass
  * conservation, and the merge monoid laws — for random streams and
  * random (depth, width) geometries. No Spark; CmsSpec pins the
  * distributed paths to this arithmetic. */
object CmsPropSpec extends Properties("Sketches.cms") {

  private val geomGen = for {
    depth <- Gen.choose(1, 6)
    width <- Gen.choose(1, 64)
  } yield (depth, width)

  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf((1 to 12).map(i => s"v$i")))

  private def sketch(vals: Seq[String], depth: Int, width: Int): Array[Long] = {
    val buf = new Array[Long](depth * width)
    vals.foreach { v =>
      var i = 0
      while (i < depth) {
        buf(i * width + Sketches.cmsCell(v, i, width)) += 1L; i += 1
      }
    }
    buf
  }

  private def estimate(sk: Array[Long], v: String, depth: Int, width: Int): Long =
    (0 until depth).map(i => sk(i * width + Sketches.cmsCell(v, i, width))).min

  property("estimate >= exact count for every value, any geometry") =
    forAll(geomGen, streamGen) { case ((d, w), vals) =>
      val sk = sketch(vals, d, w)
      val exact = vals.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (v, n) => estimate(sk, v, d, w) >= n }
    }

  property("total mass = depth * stream length (conservation)") =
    forAll(geomGen, streamGen) { case ((d, w), vals) =>
      sketch(vals, d, w).sum == d.toLong * vals.length
    }

  property("merge is the elementwise-sum monoid: split == whole, " +
      "commutative, empty is identity") =
    forAll(geomGen, streamGen, Gen.choose(0, 100)) { case ((d, w), vals, cut) =>
      val (a, b) = vals.splitAt(cut min vals.length)
      val whole = sketch(vals, d, w).toSeq
      val merged = sketch(a, d, w).zip(sketch(b, d, w)).map(t => t._1 + t._2).toSeq
      val swapped = sketch(b, d, w).zip(sketch(a, d, w)).map(t => t._1 + t._2).toSeq
      val withEmpty = sketch(vals, d, w)
        .zip(new Array[Long](d * w)).map(t => t._1 + t._2).toSeq
      merged == whole && swapped == whole && withEmpty == whole
    }

  property("estimate error bounded by stream length (the trivial cap)") =
    forAll(geomGen, streamGen) { case ((d, w), vals) =>
      val sk = sketch(vals, d, w)
      vals.distinct.forall(v => estimate(sk, v, d, w) <= vals.length.toLong)
    }
}
