package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-column data skipping — the
  * write-side twin of predicate pushdown. Parquet prunes row groups by
  * min/max stats; a table sorted by one column has tight stats on that
  * column only. Interleaving the bits of two normalized key columns and
  * range-partitioning + sorting on the interleave gives every file tight
  * min/max spans on BOTH columns (~sqrt(P) of the global range each at P
  * partitions), so selective filters on either column skip most of a
  * 100 TB table's files instead of scanning them.
  *
  * All arithmetic is integer-exact (integral div, shifts, masks) so the
  * z-value kernel replicates bit-for-bit in the DuckDB oracle (p58); no
  * doubles, no rounding boundaries.
  *
  * The layout itself is invisible to a row-level oracle, so p58 checks
  * the clustering MATH: an explicit ntile(P) bucketing over the total
  * z-order (deterministic tie-broken) with per-bucket min/max spans.
  * Production writes go through [[zorderBy]], which swaps the global
  * ntile sort for `repartitionByRange` — sampled range boundaries, no
  * single-reducer sort — plus `sortWithinPartitions` for row-group-level
  * stats tightness. */
object ZOrder {

  /** Spread the low 16 bits of `c` (must be in [0, 65535]) to the even
    * bit positions of a 32-bit value — the classic mask-ladder Morton
    * spread, branch-free and codegen-friendly. */
  def spread16(c: Column): Column = {
    val x1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Interleave two 16-bit bucket ids: a in even bits, b in odd bits. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Map an integral column with known [mn, mx] onto [0, 65535] with
    * integer cell division — exact in Spark and DuckDB alike (`div` /
    * `//`), no float boundary drift. Cell width (span div 65536) + 1
    * keeps the quotient ≤ 65535 for any span that fits in a signed
    * Long. Spans that DON'T fit (mn < 0 ≤ mx with mx − mn overflowing —
    * the column covers more than half the 64-bit range) would corrupt the
    * clustering (or, under ANSI mode, throw an opaque mid-job overflow);
    * [[zorderBy]] rejects them loudly on the stats row before any
    * per-row work. */
  def bucket16(c: Column, mn: Column, mx: Column): Column = {
    val cell = call_function("div", mx - mn, lit(65536L)) + lit(1L)
    call_function("div", c - mn, cell)
  }

  /** Overflow guard for [[bucket16]]'s span arithmetic, applied to the
    * single stats row: a mixed-sign span that wraps Long means the column
    * covers >2⁶³ distinct values — clustering on it is degenerate and the
    * wrapped z-values would be silently wrong, so fail loudly instead. */
  private def checkedMax(mn: Column, mx: Column, name: String): Column =
    // try_subtract: NULL exactly when mx - mn overflows (ANSI mode would
    // throw Spark's opaque ARITHMETIC_OVERFLOW before a sign check ran)
    when(mx.isNotNull && mn.isNotNull && try_subtract(mx, mn).isNull,
      raise_error(lit(s"ZOrder.zorderBy: column $name spans more than " +
        "Long.MaxValue (min<0, max>=0, span overflows) — z-ordering a " +
        "near-full-range column is degenerate; pre-bucket it first"))
        .cast("long"))
      .otherwise(mx)

  /** Z-order `df` by two integral columns: one stats pass for min/max
    * (single-row broadcast), bucket + interleave, then range-partition
    * and sort on the z-value. Returns the input rows unchanged, laid out
    * for writing (`.write.parquet` preserves partition order, so file
    * and row-group min/max stats come out tight on both columns). */
  def zorderBy(df: DataFrame, colA: String, colB: String,
      partitions: Int): DataFrame = {
    require(partitions > 0, s"partitions must be positive, got $partitions")
    val a = col(colA).cast("long"); val b = col(colB).cast("long")
    val st = df.agg(min(a).as("_mna"), max(a).as("_mxa"),
        min(b).as("_mnb"), max(b).as("_mxb"))
      .select(col("_mna"), checkedMax(col("_mna"), col("_mxa"), colA).as("_mxa"),
        col("_mnb"), checkedMax(col("_mnb"), col("_mxb"), colB).as("_mxb"))
    df.crossJoin(broadcast(st))
      .withColumn("_zv", zValue(
        bucket16(a, col("_mna"), col("_mxa")),
        bucket16(b, col("_mnb"), col("_mxb"))))
      .repartitionByRange(partitions, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_mna", "_mxa", "_mnb", "_mxb", "_zv")
  }
}
