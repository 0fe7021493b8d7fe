package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — an operator Spark's built-ins lack (and the
  * reference never had: it is equi-join only, SURVEY §2.4). For each left
  * row, attach the single closest right row within the same key —
  * backward (greatest `rightTime` ≤ `leftTime`, the default) or forward
  * (smallest `rightTime` ≥ `leftTime`) — optionally within a numeric
  * `tolerance`; unmatched left rows keep nulls (LEFT semantics).
  *
  * Realized by COMPOSITION, not a custom physical operator (tier (a) of
  * the extension ladder): union both sides tagged, one window pass of
  * `last(payload, ignoreNulls)` over (key) ordered by (time, side) — the
  * right row rides forward to every left row it matches. ONE shuffle on
  * the key, sorted once, no per-row probing; at 100 TB this is the plan a
  * range/as-of join should have. Right rows sort BEFORE left rows at the
  * same timestamp, so the match is inclusive (ts ≥ ts / ts ≤ ts).
  */
object AsOf {

  /** @param key        equi columns present on both sides
    * @param leftTime   left ordering column name
    * @param rightTime  right ordering column name
    * @param direction  "backward" (most recent right at-or-before) or
    *                   "forward" (earliest right at-or-after)
    * @param tolerance  max |leftTime − matched rightTime| (numeric time
    *                   columns); farther matches become nulls
    * @return left columns + the right side's non-key columns (nullable) */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val leftOnly = left.columns.filterNot(key.contains).toSeq
    val payloadCols = right.columns.filterNot(key.contains).toSeq
    val payloadSchema = StructType(payloadCols.map(c => right.schema(c)))
    val leftSchema = left.schema

    val l = left.select(
      key.map(col) ++ leftOnly.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(payloadSchema).as("_rp")): _*)
    // null-time right rows would sort FIRST under asc (nulls-first) order
    // and ride forward as a spurious "most recent" match; as-of semantics
    // (ts >= ts never true on null) say they match nothing — drop them.
    // Null-time LEFT rows need no filter: they also sort first, see no
    // preceding real right row, and correctly keep a null match.
    val r = right.filter(col(rightTime).isNotNull).select(
      key.map(col) ++ leftOnly.map(c =>
        lit(null).cast(leftSchema(c).dataType).as(c)) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        struct(payloadCols.map(col): _*).as("_rp")): _*)

    // backward scans time ascending; forward scans descending so the
    // EARLIEST at-or-after right row is the last one seen. Null left
    // times sort first either way (asc default / desc_nulls_first): they
    // see no real right row and correctly keep a null match.
    val timeOrder =
      if (direction == "backward") col("_t").asc else col("_t").desc_nulls_first
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(timeOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionAll(r)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
    val bounded = tolerance.fold(matched) { tol =>
      matched.withColumn("_m",
        when(abs(col("_t") - col("_m").getField(rightTime)) <= tol, col("_m")))
    }
    bounded
      .filter(col("_side") === 1)
      .select(key.map(col) ++ leftOnly.map(col) ++
        payloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }
}
