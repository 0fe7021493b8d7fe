package graft

import graft.sources.Thrift
import graft.sources.Thrift.{Field, Msg}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Thrift TBinaryProtocol record tap (second half of the cascalog-lzo
  * record-source family, lzo.clj:17-36). */
class ThriftSpec extends SparkTestBase {
  import spark.implicits._

  test("scalars round-trip; unknown and type-mismatched fields skip") {
    val spec = Seq(
      Field(1, "id", LongType),
      Field(2, "name", StringType),
      Field(3, "score", DoubleType),
      Field(4, "flag", BooleanType),
      Field(5, "small", ShortType),
      Field(6, "mid", IntegerType))
    val msg = Thrift.encode(Seq(
      1 -> 42L, 2 -> "hello", 3 -> -2.5, 4 -> true,
      9 -> "unknown field", // skipped: not in spec
      5 -> 7.toShort, 6 -> 123456))
    val out = Thrift.parse(Seq(Tuple1(msg)).toDF("bin"), "bin", spec).collect().head
    assert(out.getAs[Long]("id") == 42L)
    assert(out.getAs[String]("name") == "hello")
    assert(out.getAs[Double]("score") == -2.5)
    assert(out.getAs[Boolean]("flag"))
    assert(out.getAs[Short]("small") == 7)
    assert(out.getAs[Int]("mid") == 123456)
    // field present with a DIFFERENT type than declared: skipped, null out
    val bad = Thrift.encode(Seq(1 -> "not a long"))
    val badRow = Thrift.parse(Seq(Tuple1(bad)).toDF("bin"), "bin",
      Seq(Field(1, "id", LongType))).collect().head
    assert(badRow.isNullAt(badRow.fieldIndex("id")))
  }

  test("adversarial deep STRUCT nesting in a skipped field nulls leniently") {
    // hand-craft a record whose UNKNOWN field claims 2000 nested structs:
    // data-driven skip recursion must hit the depth cap (a catchable
    // IllegalArgumentException), not StackOverflowError — lenient mode
    // then nulls the record instead of killing the task
    val bos = new java.io.ByteArrayOutputStream()
    def i8(v: Int): Unit = bos.write(v)
    def i16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    i8(12); i16(99) // field id 99 (unknown), type STRUCT
    (1 to 2000).foreach { _ => i8(12); i16(1) } // 2000 nested struct headers
    (1 to 2001).foreach(_ => i8(0)) // matching STOPs
    i8(0) // outer STOP
    val evil = bos.toByteArray
    val spec = Seq(Field(1, "id", LongType))
    val row = Thrift.parse(Seq(Tuple1(evil)).toDF("bin"), "bin", spec,
      lenient = true).collect().head
    assert(row.isNullAt(row.fieldIndex("id")))
    // strict mode: a plain exception, not an Error
    val e = intercept[Exception] {
      Thrift.parse(Seq(Tuple1(evil)).toDF("bin"), "bin", spec).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(e).mkString(" | ").contains("nesting exceeds"))
  }

  test("lists, maps, nested structs") {
    val nestedType = Thrift.nested(
      Field(1, "lat", DoubleType), Field(2, "lon", DoubleType))
    val spec = Seq(
      Field(1, "tags", ArrayType(StringType)),
      Field(2, "counts", MapType(StringType, LongType)),
      Field(3, "loc", nestedType),
      Field(4, "raw", BinaryType))
    val msg = Thrift.encode(Seq(
      1 -> Seq("a", "bb", "ccc"),
      2 -> Map("x" -> 1L, "y" -> 2L),
      3 -> Msg(Seq(1 -> 1.5, 2 -> -2.5)),
      4 -> Array[Byte](1, 0, -1)))
    val out = Thrift.parse(Seq(Tuple1(msg)).toDF("bin"), "bin", spec).collect().head
    assert(out.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "bb", "ccc"))
    assert(out.getAs[scala.collection.Map[String, Long]]("counts").toMap ==
      Map("x" -> 1L, "y" -> 2L))
    val loc = out.getAs[org.apache.spark.sql.Row]("loc")
    assert(loc.getAs[Double]("lat") == 1.5 && loc.getAs[Double]("lon") == -2.5)
    assert(out.getAs[Array[Byte]]("raw").toSeq == Seq[Byte](1, 0, -1))
  }

  test("tap shape: aggregate over decoded thrift records") {
    val rows = (1L to 4L).map(i => Tuple1(Thrift.encode(Seq(
      1 -> i, 2 -> (if (i % 2 == 0) "even" else "odd"), 3 -> (i * 0.5)))))
    val df = rows.toDF("bin")
    val spec = Seq(Field(1, "id", LongType), Field(2, "parity", StringType),
      Field(3, "half", DoubleType))
    val agg = Thrift.parse(df, "bin", spec)
      .groupBy("parity").agg(sum("half").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(agg == Map("odd" -> 2.0, "even" -> 3.0))
  }
}
