package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gap-based session assignment as two window
  * passes over one (key, time) sort: lag flags session starts, a running
  * sum numbers them. The batch twin of `streaming.Streams.sessionize`
  * (same gap semantics, no state store needed when the data is at rest).
  *
  * One shuffle on the key; sessions are numbered 1..n per key in time
  * order, deterministically (`tieBreak` totals the order for equal
  * timestamps — pass the event id). At 100 TB keys are many and
  * independent, so the per-key window parallelizes like any keyed
  * aggregation. */
object Sessionize {

  /** Assign `session_id` (1-based per key) to every row. */
  def assign(df: DataFrame, keyCol: String, timeCol: String, gap: Long,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc +: tieBreak.map(_.asc): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_new_s",
        when(lag(col(timeCol), 1).over(w).isNull ||
          col(timeCol) - lag(col(timeCol), 1).over(w) > gap, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new_s")).over(run))
      .drop("_new_s")
  }

  /** Per-session rollup: event count and start/end times. */
  def sessions(df: DataFrame, keyCol: String, timeCol: String, gap: Long,
      tieBreak: Seq[Column] = Nil): DataFrame =
    assign(df, keyCol, timeCol, gap, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as(s"start_$timeCol"),
        max(col(timeCol)).as(s"end_$timeCol"))
}
