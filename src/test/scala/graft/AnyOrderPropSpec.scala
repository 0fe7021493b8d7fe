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

  // ------------------------------------------------ decimals / temporals

  private val decGen: Gen[java.math.BigDecimal] = for {
    unscaled <- Arbitrary.arbitrary[Long]
    scale <- Gen.chooseNum(-5, 12)
  } yield java.math.BigDecimal.valueOf(unscaled, scale)

  property("decimal order == compareTo (exact, not double-rounded)") =
    forAll(decGen, decGen) { (a, b) =>
      val cmp = sgn(AnyColumn.compare(a, b))
      val num = sgn(a.compareTo(b))
      // compareTo == 0 covers different-scale equals (1.0 vs 1.00): the
      // stripped encoding makes them identical too
      cmp == num
    }

  property("decimal vs long orders numerically") =
    forAll(decGen, Gen.chooseNum(-1000000L, 1000000L)) { (d, l) =>
      val num = sgn(d.compareTo(java.math.BigDecimal.valueOf(l)))
      val cmp = sgn(AnyColumn.compare(d, l))
      if (num != 0) cmp == num else cmp != 0 // equal value = deterministic near-tie
    }

  property("decimal prefix mantissas rank correctly on both signs") = {
    val cases = Seq(
      (new java.math.BigDecimal("1.2"), new java.math.BigDecimal("1.23"), -1),
      (new java.math.BigDecimal("-1.23"), new java.math.BigDecimal("-1.2"), -1),
      (new java.math.BigDecimal("0.001"), new java.math.BigDecimal("0.01"), -1),
      (new java.math.BigDecimal("10"), new java.math.BigDecimal("9.99"), 1),
      (new java.math.BigDecimal("-10"), new java.math.BigDecimal("-9.99"), -1),
      (new java.math.BigDecimal("1E+100"), new java.math.BigDecimal("9.9E+99"), 1))
    cases.forall { case (a, b, want) => sgn(AnyColumn.compare(a, b)) == want }
  }

  private val tsGen: Gen[java.sql.Timestamp] = for {
    sec <- Gen.chooseNum(-62135596800L, 253402300799L) // years 1..9999
    nano <- Gen.chooseNum(0, 999999999)
  } yield {
    val t = new java.sql.Timestamp(sec * 1000L)
    t.setNanos(nano)
    t
  }

  private val instGen: Gen[java.time.Instant] = for {
    sec <- Gen.chooseNum(-62135596800L, 253402300799L)
    nano <- Gen.chooseNum(0, 999999999)
  } yield java.time.Instant.ofEpochSecond(sec, nano.toLong)

  property("timestamp order is chronological (incl. nanos, pre-1970)") =
    forAll(tsGen, tsGen) { (a, b) =>
      sgn(AnyColumn.compare(a, b)) == sgn(a.compareTo(b))
    }

  property("instant order is chronological") =
    forAll(instGen, instGen) { (a, b) =>
      sgn(AnyColumn.compare(a, b)) == sgn(a.compareTo(b))
    }

  property("timestamp vs instant orders by time when unequal") =
    forAll(tsGen, instGen) { (t, i) =>
      val ts = java.lang.Math.floorDiv(t.getTime, 1000L)
      val num = sgn(java.lang.Long.compare(ts, i.getEpochSecond)) match {
        case 0 => sgn(Integer.compare(t.getNanos, i.getNano))
        case s => s
      }
      val cmp = sgn(AnyColumn.compare(t, i))
      if (num != 0) cmp == num else cmp != 0 // same instant: kind-byte near-tie
    }

  property("date order matches localdate order on the same day") = {
    val cases = Seq("1969-07-20", "1970-01-01", "2024-02-29", "2026-08-12")
    val dates = cases.map(java.time.LocalDate.parse)
    dates.zip(dates.tail).forall { case (a, b) =>
      AnyColumn.compare(a, b) < 0 &&
        AnyColumn.compare(java.sql.Date.valueOf(a), java.sql.Date.valueOf(b)) < 0
    }
  }

  property("byte arrays order unsigned-lexicographically") =
    forAll(Gen.listOf(Arbitrary.arbitrary[Byte]), Gen.listOf(Arbitrary.arbitrary[Byte])) {
      (a, b) =>
        val x = a.toArray; val y = b.toArray
        sgn(AnyColumn.compare(x, y)) ==
          sgn(java.util.Arrays.compareUnsigned(x, y))
    }
}

/** The TopK compound key must order tuples exactly lexicographically under
  * unsigned byte comparison — including component keys that contain 0x00
  * (strings with U+0000) where a bare separator used to let the next
  * component bleed into the comparison. */
object CompoundKeyPropSpec extends Properties("TopK.compoundKey") {
  import graft.operators.TopK

  private def sgn(i: Int): Int = Integer.signum(i)

  private val nulStr: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.const(0.toChar), Gen.oneOf('a', 'b'))).map(_.mkString)

  private val component: Gen[Any] = Gen.oneOf(
    nulStr.map(s => s: Any),
    Gen.chooseNum(-3L, 3L).map(l => l: Any),
    Gen.const(null),
    Gen.oneOf(new java.math.BigDecimal("1.5"), new java.math.BigDecimal("-2")).map(d => d: Any))

  private val tuple: Gen[List[Any]] = Gen.listOfN(2, component)

  private def lex(a: Seq[Any], b: Seq[Any]): Int =
    a.zip(b).iterator.map { case (x, y) => sgn(AnyColumn.compare(x, y)) }
      .find(_ != 0).getOrElse(0)

  property("byte order == lexicographic component order") =
    forAll(tuple, tuple) { (a, b) =>
      sgn(java.util.Arrays.compareUnsigned(
        TopK.compoundKey(a, desc = false), TopK.compoundKey(b, desc = false))) == lex(a, b)
    }

  property("desc inverts the order") =
    forAll(tuple, tuple) { (a, b) =>
      sgn(java.util.Arrays.compareUnsigned(
        TopK.compoundKey(a, desc = true), TopK.compoundKey(b, desc = true))) == -lex(a, b)
    }

  property("prefix NUL regression: (\"a\",hi) < (\"a\\u0000\",lo)") = {
    val k1 = TopK.compoundKey(Seq("a", 99L), desc = false)
    val k2 = TopK.compoundKey(Seq("a" + 0.toChar, -99L), desc = false)
    java.util.Arrays.compareUnsigned(k1, k2) < 0
  }
}
