package graft

import graft.operators.Sketches
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the KMV kernel: fold and merge must agree with the
  * trivial reference implementation (sorted distinct take-k) for every
  * input and split — this is what makes the sketch partition-invariant
  * and the streaming state equal to the batch aggregate. */
object KmvPropSpec extends Properties("Sketches.kmv") {

  private val kGen = Gen.choose(2, 64)
  private val hashGen = Gen.oneOf(
    Gen.choose(0L, Sketches.M61 - 1),
    Gen.choose(0L, 16L)) // small domain forces duplicate handling
  private val hashesGen = Gen.listOf(hashGen)

  private def reference(vals: Seq[Long], k: Int): Seq[Long] =
    vals.distinct.sorted.take(k)

  private def fold(vals: Seq[Long], k: Int): Array[Long] =
    vals.foldLeft(Array.emptyLongArray)((b, h) => Sketches.insertHash(b, h, k))

  property("insert fold == sorted distinct take k") = forAll(hashesGen, kGen) { (hs, k) =>
    fold(hs, k).toSeq == reference(hs, k)
  }

  property("merge of any split == fold of whole") =
    forAll(hashesGen, hashesGen, kGen) { (a, b, k) =>
      Sketches.mergeSketches(fold(a, k), fold(b, k), k).toSeq == reference(a ++ b, k)
    }

  property("merge is commutative and idempotent") =
    forAll(hashesGen, hashesGen, kGen) { (a, b, k) =>
      val sa = fold(a, k); val sb = fold(b, k)
      val ab = Sketches.mergeSketches(sa, sb, k).toSeq
      ab == Sketches.mergeSketches(sb, sa, k).toSeq &&
        Sketches.mergeSketches(sa, sa, k).toSeq == sa.toSeq
    }

  property("estimate is exact below k") = forAll(hashesGen, kGen) { (hs, k) =>
    val distinct = hs.distinct.size
    (distinct >= k) || Sketches.estimateFrom(fold(hs, k), k) == distinct.toDouble
  }
}
