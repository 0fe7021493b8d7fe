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
      val bos = new ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(other); oos.close()
      val b = bos.toByteArray
      out.writeByte(7); out.writeInt(b.length); out.write(b)
  }

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
      new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b)).readObject()
  }

  def decode(bytes: Array[Byte]): Any =
    if (bytes == null) null
    else get(new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))

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
