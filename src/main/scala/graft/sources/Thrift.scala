package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Thrift record taps — the second half of the reference's compressed
  * record-source family (cascalog-lzo/src/cascalog/lzo.clj:17-36 reads
  * LZO thrift records). Like [[Proto]], the container ships no thrift
  * runtime, so this decodes the TBinaryProtocol struct encoding directly
  * from a declared field spec: field headers (type byte + big-endian i16
  * id), STOP-terminated structs, big-endian scalars, length-prefixed
  * strings, lists/sets/maps, nested structs — unknown fields skipped
  * recursively by type, per any thrift reader's contract.
  */
object Thrift {

  // TBinaryProtocol type ids
  private val STOP = 0
  private val BOOL = 2
  private val BYTE = 3
  private val DOUBLE = 4
  private val I16 = 6
  private val I32 = 8
  private val I64 = 10
  private val STRING = 11
  private val STRUCT = 12
  private val MAP = 13
  private val SET = 14
  private val LIST = 15

  /** One declared field: thrift field id → column name + Spark type.
    * LongType=i64, IntegerType=i32, ShortType=i16, ByteType=i8,
    * BooleanType, DoubleType, StringType, BinaryType,
    * ArrayType(elem) = list/set, MapType(k, v), StructType = nested
    * (build with [[nested]] so ids ride the metadata). */
  final case class Field(id: Int, name: String, dataType: DataType)

  def schemaOf(spec: Seq[Field]): StructType =
    StructType(spec.map(f => StructField(f.name, f.dataType, nullable = true)))

  /** Nested-struct type with thrift ids attached as metadata. */
  def nested(fields: Field*): StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = true,
      metadata = new MetadataBuilder().putLong("thid", f.id.toLong).build())))

  private def structSpec(st: StructType): Seq[Field] =
    st.fields.toSeq.map { sf =>
      require(sf.metadata.contains("thid"),
        s"nested field ${sf.name} needs a thid metadata (use Thrift.nested)")
      Field(sf.metadata.getLong("thid").toInt, sf.name, sf.dataType)
    }

  private def typeIdFor(dt: DataType): Int = dt match {
    case BooleanType => BOOL
    case ByteType => BYTE
    case DoubleType => DOUBLE
    case ShortType => I16
    case IntegerType => I32
    case LongType => I64
    case StringType | BinaryType => STRING
    case _: StructType => STRUCT
    case _: MapType => MAP
    case _: ArrayType => LIST
    case other => throw new IllegalArgumentException(s"unsupported thrift type $other")
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def i8(): Int = { val v = bytes(pos); pos += 1; v.toInt }
    def i16(): Int = { val v = ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF); pos += 2; v.toShort.toInt }
    def i32(): Int = {
      var v = 0
      var i = 0
      while (i < 4) { v = (v << 8) | (bytes(pos + i) & 0xFF); i += 1 }
      pos += 4
      v
    }
    def i64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(pos + i) & 0xFFL); i += 1 }
      pos += 8
      v
    }
    def blob(): Array[Byte] = {
      val n = i32()
      // negative or past-the-end lengths: fail loudly (copyOfRange would
      // throw on negative but silently ZERO-PAD past the end)
      if (n < 0 || pos + n > bytes.length) throw new IllegalArgumentException(
        s"malformed thrift length $n at $pos (record size ${bytes.length})")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def skip(tpe: Int): Unit = skip(tpe, 0)

    /** `depth` bounds DATA-driven nesting: unlike readValue (whose
      * recursion follows the caller's finite spec), skip recurses on
      * whatever the bytes claim — corrupt/adversarial records nesting
      * STRUCT headers thousands deep would StackOverflowError, an Error
      * the `lenient` Exception handler cannot catch (it would kill the
      * task, not null the record). 256 is far past any real schema. */
    private def skip(tpe: Int, depth: Int): Unit = {
      if (depth > 256) throw new IllegalArgumentException(
        "thrift skip: nesting exceeds 256 levels — malformed record")
      tpe match {
        case BOOL | BYTE => pos += 1
        case I16 => pos += 2
        case I32 => pos += 4
        case DOUBLE | I64 => pos += 8
        case STRING =>
          // two steps: `pos += i32()` reads the OLD pos before i32 advances
          // it; negative n would REWIND the cursor into an infinite loop
          val n = i32()
          if (n < 0) throw new IllegalArgumentException(
            s"malformed thrift string length $n at $pos")
          pos += n
        case STRUCT =>
          var t = i8()
          while (t != STOP) { i16(); skip(t, depth + 1); t = i8() }
        case MAP =>
          val kt = i8(); val vt = i8(); val n = i32()
          var i = 0
          while (i < n) { skip(kt, depth + 1); skip(vt, depth + 1); i += 1 }
        case SET | LIST =>
          val et = i8(); val n = i32()
          var i = 0
          while (i < n) { skip(et, depth + 1); i += 1 }
        case other => throw new IllegalArgumentException(s"cannot skip thrift type $other")
      }
    }
  }

  private def readValue(r: Reader, tpe: Int, dt: DataType): Any = (dt, tpe) match {
    case (BooleanType, BOOL) => r.i8() != 0
    case (ByteType, BYTE) => r.i8().toByte
    case (DoubleType, DOUBLE) => java.lang.Double.longBitsToDouble(r.i64())
    case (ShortType, I16) => r.i16().toShort
    case (IntegerType, I32) => r.i32()
    case (LongType, I64) => r.i64()
    case (StringType, STRING) =>
      new String(r.blob(), java.nio.charset.StandardCharsets.UTF_8)
    case (BinaryType, STRING) => r.blob()
    case (st: StructType, STRUCT) => decodeStruct(r, structSpec(st), st)
    case (MapType(kdt, vdt, _), MAP) =>
      val kt = r.i8(); val vt = r.i8(); val n = r.i32()
      val b = scala.collection.mutable.LinkedHashMap[Any, Any]()
      var i = 0
      while (i < n) { b(readValue(r, kt, kdt)) = readValue(r, vt, vdt); i += 1 }
      b.toMap
    case (ArrayType(edt, _), SET | LIST) =>
      val et = r.i8(); val n = r.i32()
      val b = new Array[Any](n)
      var i = 0
      while (i < n) { b(i) = readValue(r, et, edt); i += 1 }
      b.toSeq
    case (dt2, t) => throw new IllegalArgumentException(
      s"field of type $dt2 met thrift type $t")
  }

  private def decodeStruct(r: Reader, spec: Seq[Field], schema: StructType): Row = {
    val byId = spec.zipWithIndex.map { case (f, i) => f.id -> ((f, i)) }.toMap
    val values = new Array[Any](spec.length)
    var t = r.i8()
    while (t != STOP) {
      val id = r.i16()
      byId.get(id) match {
        case Some((f, i)) if typeIdFor(f.dataType) == t =>
          values(i) = readValue(r, t, f.dataType)
        case _ => r.skip(t) // unknown id or unexpected type: skip by wire type
      }
      t = r.i8()
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values, schema)
  }

  private[graft] def decodeStruct2(bytes: Array[Byte], spec: Seq[Field]): Row =
    decodeStruct(new Reader(bytes), spec, schemaOf(spec))

  /** Column op: binary thrift struct → typed struct column. `lenient`
    * nulls malformed records instead of failing the task. */
  def fromThrift(bin: Column, spec: Seq[Field], lenient: Boolean = false): Column = {
    val schema = schemaOf(spec)
    val u = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        if (b == null) null
        else if (lenient)
          try decodeStruct(new Reader(b), spec, schema)
          catch { case _: Exception => null }
        else decodeStruct(new Reader(b), spec, schema)
    }, schema)
    u(bin)
  }

  /** Record tap: decode `binCol` and flatten declared fields to columns. */
  def parse(df: DataFrame, binCol: String, spec: Seq[Field],
      lenient: Boolean = false): DataFrame = {
    val tmp = "_thrift"
    val withStruct = df.withColumn(tmp, fromThrift(col(binCol), spec, lenient))
    spec.foldLeft(withStruct) { (d, f) =>
      d.withColumn(f.name, col(s"$tmp.${f.name}"))
    }.drop(tmp)
  }

  // ---------------------------------------------- encoding (writer side)

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def i8(v: Int): Unit = out.write(v)
    def i16(v: Int): Unit = { out.write((v >>> 8) & 0xFF); out.write(v & 0xFF) }
    def i32(v: Int): Unit = { var i = 3; while (i >= 0) { out.write((v >>> (8 * i)) & 0xFF); i -= 1 } }
    def i64(v: Long): Unit = { var i = 7; while (i >= 0) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 } }
    def blob(b: Array[Byte]): Unit = { i32(b.length); out.write(b) }
  }

  /** Encode (field id, value) pairs as a TBinaryProtocol struct — the
    * writer half, driving round-trip specs. Values: Boolean, Byte, Short,
    * Int, Long, Double, String, Array[Byte], Seq[Any] (list),
    * Map[Any, Any], Seq[(Int, Any)] via [[Msg]] for nested structs. */
  final case class Msg(fields: Seq[(Int, Any)])

  def encode(values: Seq[(Int, Any)]): Array[Byte] = {
    val w = new Writer
    writeStruct(w, values)
    w.out.toByteArray
  }

  private def typeOf(v: Any): Int = v match {
    case _: Boolean => BOOL
    case _: Byte => BYTE
    case _: Double => DOUBLE
    case _: Short => I16
    case _: Int => I32
    case _: Long => I64
    case _: String | _: Array[Byte] => STRING
    case _: Msg => STRUCT
    case _: Map[_, _] => MAP
    case _: Seq[_] => LIST
    case other => throw new IllegalArgumentException(s"cannot encode $other")
  }

  private def writeValue(w: Writer, v: Any): Unit = v match {
    case b: Boolean => w.i8(if (b) 1 else 0)
    case b: Byte => w.i8(b.toInt)
    case d: Double => w.i64(java.lang.Double.doubleToLongBits(d))
    case s: Short => w.i16(s.toInt)
    case i: Int => w.i32(i)
    case l: Long => w.i64(l)
    case s: String => w.blob(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case b: Array[Byte] => w.blob(b)
    case m: Msg => writeStruct(w, m.fields)
    case m: Map[_, _] =>
      require(m.nonEmpty, "cannot infer element types of an empty map")
      w.i8(typeOf(m.head._1)); w.i8(typeOf(m.head._2)); w.i32(m.size)
      m.foreach { case (k, v2) => writeValue(w, k); writeValue(w, v2) }
    case s: Seq[_] =>
      require(s.nonEmpty, "cannot infer element type of an empty list")
      w.i8(typeOf(s.head)); w.i32(s.size)
      s.foreach(writeValue(w, _))
    case other => throw new IllegalArgumentException(s"cannot encode $other")
  }

  private def writeStruct(w: Writer, fields: Seq[(Int, Any)]): Unit = {
    fields.foreach { case (id, v) =>
      if (v != null) { w.i8(typeOf(v)); w.i16(id); writeValue(w, v) }
    }
    w.i8(STOP)
  }
}
