package graft

import graft.sources.Proto
import graft.sources.Proto.Field
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Protobuf record tap (cascalog-lzo gap: lzo.clj:17-36 record sources):
  * wire-format round trips through the Spark column kernel. */
class ProtoSpec extends SparkTestBase {
  import spark.implicits._

  test("scalar fields round-trip, unknown fields are skipped") {
    val spec = Seq(
      Field(1, "id", LongType),
      Field(2, "name", StringType),
      Field(3, "score", DoubleType),
      Field(4, "active", BooleanType),
      Field(6, "ratio", FloatType))
    val msg = Proto.encode(Seq(
      1 -> 42L, 2 -> "hello", 3 -> 2.5, 4 -> true,
      5 -> "UNKNOWN FIELD (skipped)", 7 -> 99L, // not in spec
      6 -> 1.25f))
    val df = Seq(Tuple1(msg)).toDF("bin")
    val out = Proto.parse(df, "bin", spec).collect().head
    assert(out.getAs[Long]("id") == 42L)
    assert(out.getAs[String]("name") == "hello")
    assert(out.getAs[Double]("score") == 2.5)
    assert(out.getAs[Boolean]("active"))
    assert(out.getAs[Float]("ratio") == 1.25f)
    // negative int64 rides the canonical 10-byte varint
    val neg = Proto.encode(Seq(1 -> -7L))
    val negRow = Proto.parse(Seq(Tuple1(neg)).toDF("bin"), "bin",
      Seq(Field(1, "id", LongType))).collect().head
    assert(negRow.getAs[Long]("id") == -7L)
  }

  test("repeated (expanded and packed) and nested messages") {
    val nestedType = Proto.nested(
      Field(1, "lat", DoubleType), Field(2, "lon", DoubleType))
    val spec = Seq(
      Field(1, "tags", ArrayType(StringType)),
      Field(2, "counts", ArrayType(LongType)),
      Field(3, "loc", nestedType))
    val msg = Proto.encode(Seq(
      1 -> Seq("a", "b", "c"),
      2 -> Seq(1L, 2L, 3L),
      3 -> Seq(1 -> 1.5, 2 -> (-2.5))))
    val out = Proto.parse(Seq(Tuple1(msg)).toDF("bin"), "bin", spec).collect().head
    assert(out.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b", "c"))
    assert(out.getAs[scala.collection.Seq[Long]]("counts").toSeq == Seq(1L, 2L, 3L))
    val loc = out.getAs[org.apache.spark.sql.Row]("loc")
    assert(loc.getAs[Double]("lat") == 1.5 && loc.getAs[Double]("lon") == -2.5)

    // packed repeated: one length-delimited run of varints (wire type 2)
    // — hand-build tag 2|wt2 then the packed payload
    val packed = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write((2 << 3) | 2) // field 2, length-delimited
      bos.write(3)            // 3 bytes follow
      bos.write(1); bos.write(2); bos.write(3)
      bos.toByteArray
    }
    val pout = Proto.parse(Seq(Tuple1(packed)).toDF("bin"), "bin",
      Seq(Field(2, "counts", ArrayType(LongType)))).collect().head
    assert(pout.getAs[scala.collection.Seq[Long]]("counts").toSeq == Seq(1L, 2L, 3L))
  }

  test("tap shape: binary records through a query, missing fields null") {
    val rows = (1L to 5L).map(i =>
      Tuple1(Proto.encode(Seq(1 -> i, 2 -> s"doc$i", 3 -> (i * 1.5)))))
    val empty = Tuple1(Proto.encode(Seq(1 -> 99L))) // name/score absent
    val df = (rows :+ empty).toDF("bin")
    val spec = Seq(Field(1, "id", LongType), Field(2, "name", StringType),
      Field(3, "score", DoubleType))
    val parsed = Proto.parse(df, "bin", spec)
    assert(parsed.filter(col("name").isNull).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(99L))
    assert(parsed.agg(sum("score")).head.getDouble(0) == (1 to 5).map(_ * 1.5).sum)
  }

  test("lenient mode nulls malformed records; strict mode fails the task") {
    val spec = Seq(Field(1, "id", LongType))
    val good = Proto.encode(Seq(1 -> 5L))
    val bad = Array[Byte](0x0A.toByte, 0x7F.toByte) // length-delim promising 127 bytes
    val df = Seq(Tuple1(good), Tuple1(bad)).toDF("bin")
    val lenientRows = Proto.parse(df, "bin", spec, lenient = true)
      .select("id").collect().map(r => Option(r.get(0)))
    assert(lenientRows.count(_.isDefined) == 1 && lenientRows.count(_.isEmpty) == 1)
    assertThrows[org.apache.spark.SparkException] {
      Proto.parse(df, "bin", spec).select("id").collect()
    }
    // thrift too
    val tSpec = Seq(graft.sources.Thrift.Field(1, "id", LongType))
    val tGood = graft.sources.Thrift.encode(Seq(1 -> 5L))
    val tBad = Array[Byte](11, 0, 1, 0x7F) // string field promising a huge blob
    val tdf = Seq(Tuple1(tGood), Tuple1(tBad)).toDF("bin")
    val tRows = graft.sources.Thrift.parse(tdf, "bin", tSpec, lenient = true)
      .select("id").collect().map(r => Option(r.get(0)))
    assert(tRows.count(_.isDefined) == 1 && tRows.count(_.isEmpty) == 1)
  }

  test("kryo tag round-trips nested opaque objects (chill, carbonite parity)") {
    import graft.logic.AnyColumn
    import ProtoSpec.Point
    val objs: Seq[Any] = Seq(
      Point(3, "p"),
      List(Point(1, "a"), Point(2, "b")),
      Map(1 -> List(2L, 3L)),
      (1, "two", 3.0))
    objs.foreach { o =>
      assert(AnyColumn.decode(AnyColumn.encode(o)) == o, s"round-trip of $o")
    }
    // sort keys still rank opaque objects after everything typed
    assert(AnyColumn.compare("zzz", Point(1, "a")) < 0)
  }
}

object ProtoSpec {
  // top-level so Kryo serializes the value, not a captured test engine
  final case class Point(x: Int, label: String)
}
