package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.pipeline.Md5

/** Mergeable distinct-count sketches.
  *
  * KMV (k-minimum-values, Bar-Yossef et al.): keep the k smallest DISTINCT
  * hashes of the values; with θ = kth-min / M the estimate is (k-1)/θ.
  * Two properties make it the right sketch here:
  *
  *  - the buffer is a bounded monoid (merge = merge-sort two sorted arrays,
  *    keep k), so it rides Spark's partial aggregation — map-side combine
  *    reduces each partition to ≤ k longs before the shuffle, exactly like
  *    `approx_count_distinct`'s HLL buffer;
  *  - unlike HLL, the sketch is EXACT given the hash function: an
  *    independent engine sorting the same md5-derived hashes produces the
  *    same k minima bit-for-bit, so estimates are cross-engine checkable
  *    (DuckDB: the hashes with `row_number() OVER (ORDER BY hv) <= k`).
  */
object Sketches {

  /** Hash domain modulus (2^61-1): hashes are uniform in [0, M61). */
  val M61: Long = (1L << 61) - 1

  private val md5Kernel = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(Md5.lower64(Md5.newDigest(), s) & Md5.M61)
  }

  /** md5-lower-64 & (2^61-1) of a string — the cross-engine-exact value
    * hash (DuckDB: `md5_number_lower(s) & 2305843009213693951`). */
  def md5Hash61(c: Column): Column = md5Kernel(c)

  /** Fold one hash into a sorted ≤ k sketch (shared by the aggregator and
    * the streaming state fold in [[graft.streaming.Streams]]). */
  private[graft] def insertHash(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    if (buf.length == k && v >= buf(buf.length - 1)) return buf // fast path
    val idx = java.util.Arrays.binarySearch(buf, v)
    if (idx >= 0) return buf // already present
    val ins = -idx - 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  /** Estimate from a sketch ARRAY (driver/state-side twin of
    * [[kmvEstimate]]). */
  private[graft] def estimateFrom(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble
    else (k - 1).toDouble * M61.toDouble / sk(k - 1).toDouble

  /** KMV aggregator: sorted array of the ≤ k smallest distinct hashes. */
  private class KmvAgg(k: Int) extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
      if (h == null) buf else insertHash(buf, h.longValue(), k)

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = mergeSketches(a, b, k)

    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV sketch of a 61-bit hash column: `array<bigint>`, the ≤ k smallest
    * distinct hashes, sorted ascending. Feed [[md5Hash61]] (or any uniform
    * [0, M61) hash) as the input. */
  def kmv(hash: Column, k: Int): Column = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    udaf(new KmvAgg(k), Encoders.LONG).apply(hash)
  }

  /** Distinct-count estimate from a [[kmv]] sketch: exact size when the
    * sketch is not full (fewer than k distinct values seen), else
    * (k-1) * M61 / kth-min. Deterministic double arithmetic — the oracle
    * computes the identical expression. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(M61.toDouble) /
        element_at(sketch, k).cast("double"))

  /** Merge two sorted ≤ k sketches — the monoid operation (one pass,
    * duplicates collapse, keep k). */
  private[graft] def mergeSketches(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    if (a.isEmpty) return if (b.length <= k) b else java.util.Arrays.copyOf(b, k)
    if (b.isEmpty) return if (a.length <= k) a else java.util.Arrays.copyOf(a, k)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      out(n) = take
      n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private val unionKernel = udf { (a: Seq[Long], b: Seq[Long], k: Int) =>
    mergeSketches(Option(a).map(_.toArray).getOrElse(Array.emptyLongArray),
      Option(b).map(_.toArray).getOrElse(Array.emptyLongArray), k)
  }

  /** Union of two [[kmv]] sketches — the same monoid merge the aggregator
    * uses, exposed for combining sketches of different datasets (e.g. two
    * crawls' vocabularies). Estimate the union size with [[kmvEstimate]]. */
  def kmvUnion(a: Column, b: Column, k: Int): Column = unionKernel(a, b, lit(k))

  private val intersectKernel = udf { (sa: Seq[Long], sb: Seq[Long], k: Int) =>
    val a = Option(sa).map(_.toArray).getOrElse(Array.emptyLongArray)
    val b = Option(sb).map(_.toArray).getOrElse(Array.emptyLongArray)
    val u = mergeSketches(a, b, k)
    val bs = b.toSet
    if (u.length < k) {
      // union not full → both sketches hold their COMPLETE distinct hash
      // sets and the intersection is exact
      a.count(bs.contains).toDouble
    } else {
      // Beyer et al. K-min-values set estimate: the union sketch estimates
      // |A ∪ B| as (k-1)·M/θ with θ = its kth-min; the Jaccard fraction is
      // c/k over the k union minima, giving |A ∩ B| ≈ (c/k)·(k-1)·M/θ —
      // the same (k-1) convention as kmvEstimate, so union and
      // intersection estimates are internally consistent
      val theta = u(u.length - 1)
      val c = a.count(h => h <= theta && bs.contains(h))
      c.toDouble * (k - 1).toDouble / k.toDouble * M61.toDouble / theta.toDouble
    }
  }

  /** Intersection-size estimate from two [[kmv]] sketches (Beyer et al.'s
    * K-min-values set operations): count the common hashes among the union
    * sketch's k minima, take c/k as the Jaccard estimate, and scale by the
    * union's (k-1)·M/θ size estimate. Exact when the union sketch is not
    * full. Deterministic — the oracle recomputes the identical integers
    * and the one double expression. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column =
    intersectKernel(a, b, lit(k))

  // ----------------------------------------------------------- count-min

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` rows of
    * `width` counters; a value increments one md5-chosen cell per row
    * and its estimate is the MIN over its cells — always an
    * overestimate, off by at most (stream length)/width with high
    * probability. The KMV design arguments carry over verbatim: the
    * buffer is a bounded monoid (elementwise add) so map-side combine
    * reduces each partition to depth·width longs before the shuffle,
    * and the md5-derived row hashes make every counter — not just the
    * estimate — cross-engine exact (DuckDB replays cell assignment as
    * `(md5_number_lower('cms' || i || ':' || v) & M61) % width`).
    * Frequency estimation over streams too wide for an exact group-by:
    * at 100 TB the exact (token, count) table is itself corpus-sized,
    * the sketch is depth·width longs wherever it travels. */
  private[graft] def cmsCell(value: String, row: Int, width: Int): Int =
    ((Md5.lower64(Md5.newDigest(), s"cms$row:$value") & Md5.M61) % width).toInt

  private class CmsAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(buf: Array[Long], v: String): Array[Long] = {
      if (v != null) {
        var i = 0
        while (i < depth) { buf(i * width + cmsCell(v, i, width)) += 1L; i += 1 }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate a string column into a count-min sketch
    * (`array<bigint>` of depth·width counters; nulls don't count). */
  def cms(value: Column, depth: Int = 4, width: Int = 512): Column = {
    require(depth >= 1 && width >= 1,
      s"cms: depth/width must be positive, got $depth/$width")
    val agg = udaf(new CmsAgg(depth, width), ExpressionEncoder[String]())
    agg(value)
  }

  private val cmsEstKernel = udf {
    (sk: Seq[Long], v: String, depth: Int, width: Int) =>
      require(sk.length == depth * width,
        s"cmsEstimate: sketch has ${sk.length} counters, expected " +
          s"depth*width = ${depth * width} — pass the SAME (depth, width) " +
          "the sketch was built with")
      if (v == null) null.asInstanceOf[java.lang.Long]
      else {
        var best = Long.MaxValue
        var i = 0
        while (i < depth) {
          val c = sk(i * width + cmsCell(v, i, width))
          if (c < best) best = c
          i += 1
        }
        java.lang.Long.valueOf(best)
      }
  }

  /** Point estimate of a value's frequency from a [[cms]] sketch:
    * min over the value's depth cells — `estimate >= true count`
    * always (CmsSpec pins it). */
  def cmsEstimate(sketch: Column, value: Column,
      depth: Int = 4, width: Int = 512): Column =
    cmsEstKernel(sketch, value, lit(depth), lit(width))

  /** Merge two sketches of identical shape (elementwise add — the
    * monoid the aggregator itself folds with). A COUNTER-COUNT mismatch
    * raises instead of the silent null-padding zip_with would produce;
    * null sketches pass through as null. The flat counter array carries
    * no (depth, width) metadata, so two sketches whose dimensions
    * differ but multiply to the same count (e.g. 2×8 vs 4×4) are NOT
    * detectable here — same (depth, width) remains the caller's
    * invariant, as with [[cmsEstimate]]'s parameters. */
  def cmsMerge(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null))
      .when(size(a) === size(b), zip_with(a, b, (x, y) => x + y))
      .otherwise(raise_error(format_string(
        "cmsMerge: counter counts differ (%d vs %d) — sketches must be " +
          "built with the same (depth, width); equal-product transposed " +
          "shapes cannot be detected from the flat array",
        size(a), size(b))))
}
