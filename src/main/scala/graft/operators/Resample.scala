package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: snap observations to a fixed-step grid per
  * key, materialize every slot between the key's first and last
  * observation, and forward-fill the gaps — the relational form of
  * "resample + ffill". Slots with no observation carry the latest
  * preceding value and `observed = false`.
  *
  * Shapes: one agg for per-key bounds, one agg for per-slot values
  * (both map-side combinable), a `sequence`-explode for the grid (rows
  * proportional to the OUTPUT, not to pairs), and one window pass for
  * the fill. Grid length per key is bounded by (span / step); keys are
  * many and independent, so the per-key window parallelizes. The
  * per-slot reducer is `max` — deterministic under duplicate
  * observations of a slot (order-free), and exactly replayable in SQL. */
object Resample {

  def gridFill(df: DataFrame, keyCol: String, timeCol: String,
      valCol: String, step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val slot = call_function("div", col(timeCol), lit(step))
    val obs = df.select(col(keyCol), slot.as("slot"), col(valCol))
      .groupBy(col(keyCol), col("slot"))
      .agg(max(col(valCol)).as("_v"))
    val grid = df.select(col(keyCol), slot.as("_s"))
      .groupBy(col(keyCol))
      .agg(min(col("_s")).as("_lo"), max(col("_s")).as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("slot"))
    val w = Window.partitionBy(keyCol).orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "slot"), "left_outer")
      .withColumn("observed", col("_v").isNotNull)
      .withColumn("value", last(col("_v"), ignoreNulls = true).over(w))
      .drop("_v")
  }
}
