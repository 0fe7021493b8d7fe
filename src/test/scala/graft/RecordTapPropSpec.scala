package graft

import graft.sources.{Proto, Thrift}
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip properties for the wire-format record taps: whatever the
  * writer half encodes, the declared-spec decoder must reproduce —
  * across random field values, ids, and orders. (Decoders run directly
  * here — the Spark column path is covered by Proto/ThriftSpec.) */
object RecordTapPropSpec extends Properties("record-taps") {

  private val str: Gen[String] = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)

  property("proto scalars round-trip at any field id") =
    forAll(Gen.chooseNum(1, 536870911), Arbitrary.arbitrary[Long],
      str, Arbitrary.arbitrary[Double], Arbitrary.arbitrary[Boolean]) {
      (idBase, l, s, d, b) =>
        val ids = (0 until 4).map(i => ((idBase + i - 1) % 536870911) + 1)
        if (ids.distinct.length < 4) true
        else {
          val spec = Seq(
            Proto.Field(ids(0), "l", LongType), Proto.Field(ids(1), "s", StringType),
            Proto.Field(ids(2), "d", DoubleType), Proto.Field(ids(3), "b", BooleanType))
          val msg = Proto.encode(Seq(ids(0) -> l, ids(1) -> s, ids(2) -> d, ids(3) -> b))
          val row = Proto.decodeMessage(msg, 0, msg.length, spec, Proto.schemaOf(spec))
          row.getAs[Long]("l") == l && row.getAs[String]("s") == s &&
            (row.getAs[Double]("d") == d ||
              (d.isNaN && row.getAs[Double]("d").isNaN)) &&
            row.getAs[Boolean]("b") == b
        }
    }

  property("proto repeated longs round-trip") =
    forAll(Gen.listOf(Arbitrary.arbitrary[Long])) { xs =>
      val spec = Seq(Proto.Field(3, "xs", ArrayType(LongType)))
      val msg = Proto.encode(Seq(3 -> xs))
      val row = Proto.decodeMessage(msg, 0, msg.length, spec, Proto.schemaOf(spec))
      val got = row.getAs[Seq[Any]]("xs")
      if (xs.isEmpty) got == null // absent repeated field decodes as null
      else got.map(_.asInstanceOf[Long]) == xs
    }

  property("thrift scalars + list round-trip") =
    forAll(Arbitrary.arbitrary[Long], str, Arbitrary.arbitrary[Double],
      Gen.listOf(str)) { (l, s, d, xs) =>
      val spec = Seq(
        Thrift.Field(1, "l", LongType), Thrift.Field(2, "s", StringType),
        Thrift.Field(3, "d", DoubleType), Thrift.Field(4, "xs", ArrayType(StringType)))
      val msg = Thrift.encode(Seq(1 -> l, 2 -> s, 3 -> d,
        4 -> (if (xs.isEmpty) null else xs)))
      val row = Thrift.decodeStruct2(msg, spec)
      row.getAs[Long]("l") == l && row.getAs[String]("s") == s &&
        (row.getAs[Double]("d") == d || (d.isNaN && row.getAs[Double]("d").isNaN)) && {
          val got = row.getAs[Seq[Any]]("xs")
          if (xs.isEmpty) got == null else got.map(_.asInstanceOf[String]) == xs
        }
    }

  property("lenient mode nulls garbage instead of throwing") =
    forAll(Gen.nonEmptyListOf(Arbitrary.arbitrary[Byte])) { junk =>
      // decoding random bytes must either produce SOME row or throw —
      // never corrupt silently past the buffer; the lenient column path
      // maps the throw to null (covered in Proto/ThriftSpec); here we
      // just require no pathological hang/corruption
      val spec = Seq(Proto.Field(1, "l", LongType))
      try { Proto.decodeMessage(junk.toArray, 0, junk.length, spec, Proto.schemaOf(spec)); true }
      catch { case _: Exception => true }
    }

  property("mutated VALID records decode-or-throw, never hang or over-read") =
    forAll(Arbitrary.arbitrary[Long], str, Gen.chooseNum(0, 10000),
      Gen.chooseNum(0, 255)) { (l, s, posSeed, value) =>
      // single-byte corruption of well-formed records is the realistic
      // 100 TB failure mode; a corrupted length prefix used to REWIND
      // the cursor (negative toInt) into an infinite decode loop —
      // completion of this property IS the regression test
      val pSpec = Seq(Proto.Field(1, "l", LongType), Proto.Field(2, "s", StringType))
      val pMsg = Proto.encode(Seq(1 -> l, 2 -> s))
      pMsg(posSeed % pMsg.length) = value.toByte
      val protoOk =
        try { Proto.decodeMessage(pMsg, 0, pMsg.length, pSpec, Proto.schemaOf(pSpec)); true }
        catch { case _: Exception => true }
      val tSpec = Seq(Thrift.Field(1, "l", LongType), Thrift.Field(2, "s", StringType))
      val tMsg = Thrift.encode(Seq(1 -> l, 2 -> s))
      tMsg(posSeed % tMsg.length) = value.toByte
      val thriftOk =
        try { Thrift.decodeStruct2(tMsg, tSpec); true }
        catch { case _: Exception => true }
      protoOk && thriftOk
    }
}
