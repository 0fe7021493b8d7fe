package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Protobuf record taps (reference cascalog-lzo/src/cascalog/lzo.clj:17-36:
  * LZO-compressed protobuf/thrift record sources). The container has no
  * protobuf runtime or spark-protobuf connector (zero egress), so this is
  * a self-contained implementation of the protobuf WIRE FORMAT — varints,
  * fixed32/64, length-delimited, repeated (expanded and packed), nested
  * messages — driven by a declared field spec instead of a compiled
  * descriptor. Binary records (from `binaryFile`, sequence files, or any
  * binary column; compression is the source codec's concern) decode to a
  * typed struct column in one UDF kernel.
  *
  * Wire types: 0 varint (int/long/bool), 1 fixed64 (double), 2
  * length-delimited (string/bytes/nested/packed), 5 fixed32 (float).
  * Unknown fields are skipped by wire type, like any protobuf reader.
  */
object Proto {

  /** One declared field: protobuf field number → column name + type.
    * Supported types: LongType, IntegerType, BooleanType (varint),
    * DoubleType (fixed64), FloatType (fixed32), StringType, BinaryType
    * (length-delimited), StructType (nested message),
    * ArrayType(any of those) (repeated; packed accepted for numerics). */
  final case class Field(number: Int, name: String, dataType: DataType)

  def schemaOf(spec: Seq[Field]): StructType =
    StructType(spec.map(f => StructField(f.name, f.dataType, nullable = true)))

  // ------------------------------------------------------------- decoding

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        val b = bytes(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readFixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    def readFixed32(): Int = {
      var v = 0
      var i = 0
      while (i < 4) { v |= (bytes(pos + i) & 0xFF) << (8 * i); i += 1 }
      pos += 4
      v
    }
    /** Guarded length prefix: a corrupt/adversarial varint that is
      * negative (or points past the record) must raise a catchable
      * error — `pos += negative` REWINDS the cursor, and decodeMessage's
      * outer while(hasMore) would re-read the same tag forever (a hung
      * task, worse than a failed one). Arrays.copyOfRange would also
      * silently ZERO-PAD reads past the end rather than failing. */
    def readLen(): Int = {
      val n = readVarint()
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(
        s"malformed length $n at $pos (record end $end)")
      n.toInt
    }
    def readBytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // two steps: `pos += readLen()` reads the length BEFORE advancing
        val len = readLen()
        pos += len
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def scalarFromVarint(v: Long, dt: DataType): Any = dt match {
    case LongType => v
    case IntegerType => v.toInt
    case BooleanType => v != 0L
    case other => throw new IllegalArgumentException(s"varint field bound to $other")
  }

  private def readScalar(r: Reader, wireType: Int, dt: DataType): Any = (dt, wireType) match {
    case (LongType | IntegerType | BooleanType, 0) => scalarFromVarint(r.readVarint(), dt)
    case (DoubleType, 1) => java.lang.Double.longBitsToDouble(r.readFixed64())
    case (FloatType, 5) => java.lang.Float.intBitsToFloat(r.readFixed32())
    case (StringType, 2) =>
      new String(r.readBytes(r.readLen()), java.nio.charset.StandardCharsets.UTF_8)
    case (BinaryType, 2) => r.readBytes(r.readLen())
    case (dt2, wt) => throw new IllegalArgumentException(
      s"field of type $dt2 met wire type $wt (nested structs are handled by decodeMessage)")
  }

  /** Decode one message against a spec. Repeated fields accumulate in
    * declaration order; packed numeric arrays (wire type 2) unpack. Last
    * value wins for non-repeated duplicates, per protobuf semantics. */
  private[graft] def decodeMessage(bytes: Array[Byte], start: Int, end: Int,
      spec: Seq[Field], specSchema: StructType): Row = {
    val byNumber = spec.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
    val values = new Array[Any](spec.length)
    val repeats = new Array[scala.collection.mutable.ArrayBuffer[Any]](spec.length)
    val r = new Reader(bytes, start, end)
    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNo = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      byNumber.get(fieldNo) match {
        case None => r.skip(wireType)
        case Some((f, i)) =>
          f.dataType match {
            case ArrayType(elem, _) =>
              if (repeats(i) == null) repeats(i) = scala.collection.mutable.ArrayBuffer[Any]()
              val packable = elem match {
                case LongType | IntegerType | BooleanType | DoubleType | FloatType => true
                case _ => false
              }
              if (wireType == 2 && packable) {
                // packed: length-prefixed run of scalars
                val len = r.readLen()
                val stop = r.pos + len
                val ewt = elem match {
                  case DoubleType => 1
                  case FloatType => 5
                  case _ => 0
                }
                while (r.pos < stop) repeats(i) += readScalar(r, ewt, elem)
              } else elem match {
                case st: StructType =>
                  val len = r.readLen()
                  val stop = r.pos + len
                  val subSpec = structSpec(st)
                  repeats(i) += decodeMessage(bytes, r.pos, stop, subSpec, st)
                  r.pos = stop
                case _ => repeats(i) += readScalar(r, wireType, elem)
              }
            case st: StructType =>
              val len = r.readLen()
              val stop = r.pos + len
              values(i) = decodeMessage(bytes, r.pos, stop, structSpec(st), st)
              r.pos = stop
            case dt => values(i) = readScalar(r, wireType, dt)
          }
      }
    }
    spec.indices.foreach { i =>
      if (repeats(i) != null) values(i) = repeats(i).toSeq
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values, specSchema)
  }

  /** Nested StructTypes carry their field numbers in the metadata key
    * "pbnum" (set by [[nested]]); field order is the declaration order. */
  private def structSpec(st: StructType): Seq[Field] =
    st.fields.toSeq.map { sf =>
      require(sf.metadata.contains("pbnum"),
        s"nested field ${sf.name} needs a pbnum metadata (use Proto.nested)")
      Field(sf.metadata.getLong("pbnum").toInt, sf.name, sf.dataType)
    }

  /** Build a nested-message StructType with protobuf numbers attached. */
  def nested(fields: Field*): StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = true,
      metadata = new MetadataBuilder().putLong("pbnum", f.number.toLong).build())))

  /** Column op: binary protobuf message → typed struct. `lenient` turns
    * malformed records into nulls (route them to a trap/side output)
    * instead of failing the task — what a production tap over dirty data
    * needs. */
  def fromProto(bin: Column, spec: Seq[Field], lenient: Boolean = false): Column = {
    val schema = schemaOf(spec)
    val u = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        if (b == null) null
        else if (lenient)
          try decodeMessage(b, 0, b.length, spec, schema)
          catch { case _: Exception => null }
        else decodeMessage(b, 0, b.length, spec, schema)
    }, schema)
    u(bin)
  }

  /** Record tap: decode `binCol` and flatten the declared fields into
    * top-level columns (the cascalog-lzo protobuf-tap surface). */
  def parse(df: DataFrame, binCol: String, spec: Seq[Field],
      lenient: Boolean = false): DataFrame = {
    val tmp = "_proto"
    val withStruct = df.withColumn(tmp, fromProto(col(binCol), spec, lenient))
    spec.foldLeft(withStruct) { (d, f) =>
      d.withColumn(f.name, col(s"$tmp.${f.name}"))
    }.drop(tmp)
  }

  // ---------------------------------------------- encoding (writer side)

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def writeTag(fieldNo: Int, wireType: Int): Unit =
      writeVarint((fieldNo.toLong << 3) | wireType)
    def writeFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def writeFixed32(v: Int): Unit = {
      var i = 0
      while (i < 4) { out.write((v >>> (8 * i)) & 0xFF); i += 1 }
    }
    def writeBytes(b: Array[Byte]): Unit = { writeVarint(b.length.toLong); out.write(b) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Encode (field number, value) pairs to wire format — the writer half
    * of the tap, also what round-trip specs drive. Values: Long/Int/
    * Boolean (varint), Double (fixed64), Float (fixed32), String/
    * Array[Byte] (length-delimited), Seq[(Int, Any)] (nested message),
    * and Seq[Any] of the above for repeated fields (expanded encoding). */
  def encode(values: Seq[(Int, Any)]): Array[Byte] = {
    val w = new Writer
    def one(no: Int, v: Any): Unit = v match {
      case l: Long => w.writeTag(no, 0); w.writeVarint(l)
      case i: Int => w.writeTag(no, 0); w.writeVarint(i.toLong)
      case b: Boolean => w.writeTag(no, 0); w.writeVarint(if (b) 1L else 0L)
      case d: Double => w.writeTag(no, 1); w.writeFixed64(java.lang.Double.doubleToLongBits(d))
      case f: Float => w.writeTag(no, 5); w.writeFixed32(java.lang.Float.floatToIntBits(f))
      case s: String =>
        w.writeTag(no, 2); w.writeBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case b: Array[Byte] => w.writeTag(no, 2); w.writeBytes(b)
      case nested: Seq[_] if nested.forall(_.isInstanceOf[(_, _)]) && nested.nonEmpty =>
        w.writeTag(no, 2)
        w.writeBytes(encode(nested.asInstanceOf[Seq[(Int, Any)]]))
      case repeated: Seq[_] => repeated.foreach(one(no, _))
      case null => ()
      case other => throw new IllegalArgumentException(s"cannot encode $other")
    }
    values.foreach { case (no, v) => one(no, v) }
    w.toBytes
  }
}
