package graft.logic

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions.udf

/** Mixed-type column fallback (SURVEY §7.4.4). The reference has no type
  * system — one column may hold String/Long/Double/nested values
  * (api_test.clj:617-628,636-645,785-790; Kryo-serialized tuples,
  * cascading/conf.clj:86-94). Spark wants schemas, so heterogeneous
  * columns ride as a CANONICAL tagged binary encoding: equality on the
  * bytes == semantic equality on the values (integral widths unified to
  * long, float widths to double), which makes joins/group-bys/distinct on
  * mixed columns work through the normal binary machinery. Ops decode →
  * arbitrary Scala fn → re-encode. Isolated here so the typed fast path
  * never pays for it.
  */
object AnyColumn {

  // --------------------------------------------------------------- codec

  private def put(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(0)
    case b: Boolean => out.writeByte(4); out.writeBoolean(b)
    case n: Byte => put(out, n.toLong)
    case n: Short => put(out, n.toLong)
    case n: Int => put(out, n.toLong)
    case n: Long => out.writeByte(1); out.writeLong(n)
    case n: Float => put(out, n.toDouble)
    case n: Double => out.writeByte(2); out.writeDouble(n)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeByte(3); out.writeInt(b.length); out.write(b)
    case s: Seq[_] =>
      out.writeByte(5); out.writeInt(s.size); s.foreach(put(out, _))
    case m: Map[_, _] =>
      // canonical: entries sorted by encoded key bytes
      val entries = m.toSeq.map { case (k, v2) => (encode(k), encode(v2)) }
        .sortBy(_._1.toSeq.map(b => b & 0xFF).mkString(","))
      out.writeByte(6); out.writeInt(entries.size)
      entries.foreach { case (k, v2) =>
        out.writeInt(k.length); out.write(k); out.writeInt(v2.length); out.write(v2)
      }
    case other =>
      // opaque objects ride Kryo (chill's Scala instantiator — the same
      // registration stack the reference uses via carbonite,
      // cascading/conf.clj:86-94); ~5-10× leaner than ObjectOutputStream
      val b = kryoPool.toBytesWithClass(other)
      out.writeByte(7); out.writeInt(b.length); out.write(b)
  }

  private lazy val kryoPool: com.twitter.chill.KryoPool =
    com.twitter.chill.ScalaKryoInstantiator.defaultPool

  def encode(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    put(out, v); out.flush()
    bos.toByteArray
  }

  private def get(in: java.io.DataInputStream): Any = in.readByte() match {
    case 0 => null
    case 1 => in.readLong()
    case 2 => in.readDouble()
    case 3 =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    case 4 => in.readBoolean()
    case 5 =>
      val n = in.readInt(); (0 until n).map(_ => get(in)).toVector
    case 6 =>
      val n = in.readInt()
      (0 until n).map { _ =>
        val k = new Array[Byte](in.readInt()); in.readFully(k)
        val v = new Array[Byte](in.readInt()); in.readFully(v)
        decode(k) -> decode(v)
      }.toMap
    case 7 =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      kryoPool.fromBytes(b)
  }

  def decode(bytes: Array[Byte]): Any =
    if (bytes == null) null
    else get(new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))

  // ------------------------------------------------------------ ordering

  /** `l` as big-endian bytes whose unsigned lexicographic order equals
    * signed numeric order (sign bit flipped). */
  private def putSortableLong(out: DataOutputStream, l: Long): Unit =
    out.writeLong(l ^ Long.MinValue)

  /** IEEE-754 total-order trick: negative doubles flip all bits, positives
    * flip the sign bit — unsigned byte order == numeric order, NaN last. */
  private def putSortableDouble(out: DataOutputStream, d: Double): Unit = {
    val bits = java.lang.Double.doubleToLongBits(d)
    out.writeLong(if (bits < 0) ~bits else bits | Long.MinValue)
  }

  /** Order-preserving arbitrary-precision decimal (OrderedBytes-style):
    * sign byte, sign-adjusted sortable exponent, then mantissa digits+1
    * (complemented for negatives) with a terminator that ranks a prefix
    * mantissa correctly on either sign. */
  private def putSortableDecimal(out: DataOutputStream, d0: java.math.BigDecimal): Unit = {
    val d = d0.stripTrailingZeros()
    val signum = d.signum()
    out.writeByte(signum + 1) // 0 = negative, 1 = zero, 2 = positive
    if (signum != 0) {
      val digits = d.unscaledValue().abs().toString
      val adjExp = d.precision() - d.scale() // digits left of the point
      putSortableLong(out, if (signum > 0) adjExp.toLong else -adjExp.toLong)
      if (signum > 0) {
        digits.foreach(c => out.writeByte(c - '0' + 1)) // 1..10
        out.writeByte(0) // terminator < any digit byte: prefix sorts first
      } else {
        digits.foreach(c => out.writeByte(0xFF - (c - '0' + 1)))
        out.writeByte(0xFF) // terminator > any complemented digit
      }
    }
  }

  /** Temporal values order chronologically via (epoch seconds, nanos);
    * the kind byte only breaks exact cross-type ties deterministically. */
  private def putSortableTemporal(out: DataOutputStream, sec: Long, nano: Int,
      kind: Int): Unit = {
    putSortableLong(out, sec)
    out.writeInt(nano) // 0..999999999: plain BE int is order-preserving
    out.writeByte(kind)
  }

  private def putKey(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(0)
    case b: Boolean => out.writeByte(1); out.writeByte(if (b) 1 else 0)
    case n: Byte => putKey(out, n.toLong)
    case n: Short => putKey(out, n.toLong)
    case n: Int => putKey(out, n.toLong)
    case n: Long =>
      // numerics of any width share tag 2 and order by DOUBLE value
      // first (so 1L < 1.5 < 2L), exact encoding as tiebreak: kind byte 0 =
      // double, 1 = long, 2 = decimal (1L vs 1.0 is a near-tie broken
      // deterministically; integral magnitudes beyond 2^53 still order
      // exactly via the long-bits tiebreak)
      out.writeByte(2); putSortableDouble(out, n.toDouble)
      out.writeByte(1); putSortableLong(out, n)
    case n: Float => putKey(out, n.toDouble)
    case n: Double =>
      out.writeByte(2); putSortableDouble(out, n)
      out.writeByte(0); putSortableLong(out, java.lang.Double.doubleToLongBits(n))
    case n: java.math.BigDecimal =>
      // same numeric family: double approximation primary, exact decimal
      // tiebreak — two decimals only reach the tiebreak when they round to
      // the same double, and there it orders them exactly
      out.writeByte(2); putSortableDouble(out, n.doubleValue())
      out.writeByte(2); putSortableDecimal(out, n)
    case n: scala.math.BigDecimal => putKey(out, n.bigDecimal)
    case n: java.math.BigInteger => putKey(out, new java.math.BigDecimal(n))
    case n: scala.math.BigInt => putKey(out, new java.math.BigDecimal(n.bigInteger))
    case s: String =>
      // UTF-8 byte order == code-point order; no length prefix (a prefix
      // string sorts first under unsigned byte comparison, as it should)
      out.writeByte(3); out.write(s.getBytes(StandardCharsets.UTF_8))
    case t: java.sql.Timestamp =>
      out.writeByte(4)
      putSortableTemporal(out, Math.floorDiv(t.getTime, 1000L), t.getNanos, 1)
    case t: java.sql.Date =>
      out.writeByte(4)
      putSortableTemporal(out, Math.floorDiv(t.getTime, 1000L),
        (Math.floorMod(t.getTime, 1000L) * 1000000L).toInt, 0)
    case t: java.time.LocalDate =>
      out.writeByte(4)
      putSortableTemporal(out, t.toEpochDay * 86400L, 0, 2)
    case t: java.time.LocalDateTime =>
      out.writeByte(4)
      putSortableTemporal(out, t.toEpochSecond(java.time.ZoneOffset.UTC), t.getNano, 3)
    case t: java.time.Instant =>
      out.writeByte(4)
      putSortableTemporal(out, t.getEpochSecond, t.getNano, 4)
    case b: Array[Byte] =>
      out.writeByte(5); out.write(b) // unsigned lexicographic, like strings
    case other =>
      // composites: stable-but-arbitrary order via the equality encoding
      out.writeByte(6); out.write(encode(other))
  }

  /** Order-preserving binary sort key: unsigned lexicographic comparison of
    * `sortKeyBytes(a)` vs `sortKeyBytes(b)` is a total order that ranks
    * null < booleans < numerics (longs, doubles, decimals interleaved by
    * value) < strings (code-point order) < temporals (chronological) <
    * byte arrays < composites. Spark compares BinaryType
    * unsigned-lexicographically, so sorting on this key orders mixed
    * columns correctly (closing the round-1 "byte equality only" gap). */
  def sortKeyBytes(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    putKey(out, v); out.flush()
    bos.toByteArray
  }

  /** Scala-side comparator consistent with [[sortKeyBytes]]. */
  def compare(a: Any, b: Any): Int = {
    val x = sortKeyBytes(a); val y = sortKeyBytes(b)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Sort-key op over an encoded Any column (decode → order-preserving
    * key); feed the result to `:sort` / orderBy. */
  val sortKey: ColumnMap = {
    val u = udf((b: Array[Byte]) => sortKeyBytes(decode(b)))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }

  // ----------------------------------------------------------------- ops

  /** mapfn over decoded values: arbitrary Scala Any → Any. */
  def mapAny(f: Any => Any): ColumnMap = {
    val u = udf((b: Array[Byte]) => encode(f(decode(b))))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }

  def mapAny2(f: (Any, Any) => Any): ColumnMap = {
    val u = udf((a: Array[Byte], b: Array[Byte]) => encode(f(decode(a), decode(b))))
    ColumnMap(2 - 1, cs => Seq(u(cs(0), cs(1))))
  }

  /** filterfn over a decoded value. */
  def filterAny(f: Any => Boolean): ColumnFilter = {
    val u = udf((b: Array[Byte]) => f(decode(b)))
    ColumnFilter(cs => u(cs.head))
  }

  /** Decode to a typed column when the query narrows the type back down
    * (e.g. all surviving values are longs). */
  def decodeAs[T: scala.reflect.runtime.universe.TypeTag](f: Any => T): ColumnMap = {
    val u = udf((b: Array[Byte]) => f(decode(b)))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }

  /** Encode a typed column into the Any representation (for union with a
    * mixed column) — concrete variants per source type. */
  val encodeLong: ColumnMap = {
    val u = udf((v: java.lang.Long) => encode(if (v == null) null else v.longValue()))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }
  val encodeDouble: ColumnMap = {
    val u = udf((v: java.lang.Double) => encode(if (v == null) null else v.doubleValue()))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }
  val encodeString: ColumnMap = {
    val u = udf((v: String) => encode(v))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }
}
