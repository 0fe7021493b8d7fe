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
  * observations of a slot (order-free), and exactly replayable in SQL.
  *
  * Guard: the grid for one key is a single `sequence(lo, hi)` array, so
  * an outlier timestamp (an epoch-0 row against a 2026 corpus, say)
  * would silently request a multi-billion-slot array — Spark's opaque
  * array-length error at best, an OOM'd task at worst. `maxSlotsPerKey`
  * bounds the per-key span BEFORE the explode with a loud,
  * key-naming `raise_error` — a per-row codegen'd check on the
  * already-computed bounds row, costing no extra job. */
object Resample {

  def gridFill(df: DataFrame, keyCol: String, timeCol: String,
      valCol: String, step: Long,
      maxSlotsPerKey: Long = 10000000L): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    require(maxSlotsPerKey > 0, s"maxSlotsPerKey must be positive, got $maxSlotsPerKey")
    val slot = call_function("div", col(timeCol), lit(step))
    val obs = df.select(col(keyCol), slot.as("slot"), col(valCol))
      .groupBy(col(keyCol), col("slot"))
      .agg(max(col(valCol)).as("_v"))
    // guarded hi: rows live in slot space (span already divided by step),
    // so slots = hi - lo + 1; the error message names the offending key
    // and its span so the bad row is findable without a re-run.
    // Null bounds (a key whose every timestamp is NULL) pass through —
    // sequence(NULL, NULL) is NULL and explode drops the key, the
    // pre-guard behavior for dirty rows. The span uses try_subtract:
    // a plain `_hi - _lo` would itself throw Spark's opaque ANSI
    // ARITHMETIC_OVERFLOW on a mixed-sign span (the exact error this
    // guard replaces), and try_subtract's NULL-on-overflow falls to the
    // raise_error branch — overflowing spans fail loudly too.
    val span = try_subtract(col("_hi"), col("_lo"))
    val guardedHi = when(col("_hi").isNull || span < lit(maxSlotsPerKey), col("_hi"))
      .otherwise(raise_error(format_string(
        s"Resample.gridFill: key %s spans %s slots at step $step " +
          s"(> maxSlotsPerKey $maxSlotsPerKey) — likely a corrupted " +
          "timestamp; filter the outlier or raise maxSlotsPerKey",
        col(keyCol).cast("string"),
        coalesce(try_add(span, lit(1L)).cast("string"), lit(">Long.MaxValue"))))
        .cast("long"))
    val grid = df.select(col(keyCol), slot.as("_s"))
      .groupBy(col(keyCol))
      .agg(min(col("_s")).as("_lo"), max(col("_s")).as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), guardedHi)).as("slot"))
    val w = Window.partitionBy(keyCol).orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "slot"), "left_outer")
      .withColumn("observed", col("_v").isNotNull)
      .withColumn("value", last(col("_v"), ignoreNulls = true).over(w))
      .drop("_v")
  }
}
