package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval/range join — the other classic operator Spark's
  * built-ins lack (a naive `a.t BETWEEN b.lo AND b.hi` condition plans as
  * a broadcast nested loop or cartesian). Intervals are exploded into
  * fixed-width bins and points join on (key, bin) BEFORE the exact
  * containment filter — an equi-join shuffle instead of an all-pairs
  * comparison, the same binning strategy production range-join
  * optimizers use. Each (point, interval) pair can meet in at most one
  * bin (the point's own), so no post-join dedup is needed.
  *
  * `binWidth` tunes shuffle fan-out: intervals explode into
  * `len/binWidth + 1` rows; points stay single-row. Pick it near the
  * typical interval length.
  */
object RangeJoin {

  /** Inner join of `points` (with `timeCol`) against `intervals` (with
    * `[loCol, hiCol]`, inclusive) on equal `key` and containment. Output:
    * point columns + the interval's non-key columns. */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: Seq[String],
      timeCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(timeCol) / binWidth))
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(iv, key :+ "_bin")
      .filter(col(timeCol) >= col(loCol) && col(timeCol) <= col(hiCol))
      .drop("_bin")
  }
}
