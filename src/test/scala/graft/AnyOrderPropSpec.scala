package graft

import graft.logic.AnyColumn
import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property checks for the AnyColumn total order: the sort key must be a
  * genuine total order (antisymmetric, transitive under sampling),
  * consistent with numeric order across Long/Double and with string
  * order, and the codec must round-trip whatever the order ranks. */
object AnyOrderPropSpec extends Properties("AnyColumn.order") {

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Arbitrary.arbitrary[Boolean].map(b => b: Any),
    Arbitrary.arbitrary[Long].map(l => l: Any),
    Arbitrary.arbitrary[Double].map(d => d: Any),
    Gen.alphaNumStr.map(s => s: Any))

  private def sgn(i: Int): Int = Integer.signum(i)

  property("antisymmetric") = forAll(scalarGen, scalarGen) { (a, b) =>
    sgn(AnyColumn.compare(a, b)) == -sgn(AnyColumn.compare(b, a))
  }

  property("transitive (sampled)") = forAll(scalarGen, scalarGen, scalarGen) { (a, b, c) =>
    val Seq(x, y, z) = Seq(a, b, c).sortWith((p, q) => AnyColumn.compare(p, q) < 0)
    AnyColumn.compare(x, z) <= 0 &&
      AnyColumn.compare(x, y) <= 0 && AnyColumn.compare(y, z) <= 0
  }

  property("numeric consistency across Long/Double") =
    forAll(Gen.chooseNum(-1000000L, 1000000L), Arbitrary.arbitrary[Double]) { (l, d) =>
      !d.isNaN ==> {
        val cmp = sgn(AnyColumn.compare(l, d))
        val num = java.lang.Double.compare(l.toDouble, d)
        // exact numeric ties are a deterministic near-tie, not equality
        if (num != 0) cmp == sgn(num) else cmp != 0
      }
    }

  property("string order == code point order") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      sgn(AnyColumn.compare(a, b)) == sgn(Integer.signum(a.compareTo(b)))
    }

  property("codec round-trips scalars") = forAll(scalarGen) { v =>
    AnyColumn.decode(AnyColumn.encode(v)) == v || (
      // ints normalize to long; NaN round-trips to NaN
      v match {
        case d: Double if d.isNaN =>
          AnyColumn.decode(AnyColumn.encode(v)).asInstanceOf[Double].isNaN
        case _ => false
      })
  }
}
