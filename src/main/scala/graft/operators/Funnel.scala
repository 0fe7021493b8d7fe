package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each key, the
  * earliest completion time of each step STRICTLY AFTER the previous
  * step — the product-analytics funnel, equally the ordered-stage
  * progress check for multi-stage ingest pipelines.
  *
  * Pure relational min-cascade: step i's events (a type-filtered slice
  * of the stream) join the step-(i−1) frontier on the key and take a
  * per-key MIN — one shuffle per step over the SLICE, never a whole-
  * table window and never a per-key event-list materialization, so a
  * key with millions of events costs the same as one with ten
  * (aggregation is map-side combined; the frontier is key-sized).
  * Greedy-earliest matching is the standard funnel semantics: taking
  * the earliest completion of each step never excludes a later
  * completion of the next one.
  *
  * `maxSpan` (optional) bounds the whole funnel: every step must land
  * within `ts₁ + maxSpan` (conversion-window semantics, anchored at
  * the step-1 time like the analytics tools define it). The time
  * column only needs ordering — and `+ maxSpan` when a span is given —
  * so epoch-micros longs and native timestamps both work.
  *
  * Returns one row per key that completed step 1: the 1-based furthest
  * `stage` reached and `ts_1..ts_k` completion times (null after the
  * funnel stalls). Keys that never fired step 1 are absent (a funnel
  * reports entrants, not the population; left-join the key universe to
  * add zero-stage rows). */
object Funnel {

  def funnel(
      events: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      maxSpan: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel: steps must be distinct, got $steps")
    // one corpus scan: non-step events (usually the vast majority) drop
    // before anything else, and the funnel-sized remainder materializes
    // so the per-step slices below re-read it, not the corpus
    val ev = events.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
        col(typeCol).as("_e"))
      .filter(col("_t").isNotNull && col("_e").isInCollection(steps))
      .transform(if (steps.length > 1) graft.Stage.materialize else identity)
    var out = ev.filter(col("_e") === steps.head)
      .groupBy("_k").agg(min(col("_t")).as("ts_1"))
    for (i <- 2 to steps.length) {
      val prev = s"ts_${i - 1}"
      val frontierCols =
        if (i == 2) out.select(col("_k"), col("ts_1"))
        else out.select(col("_k"), col(prev), col("ts_1"))
      val deadline = maxSpan.fold(lit(true))(sp => col("_t") <= col("ts_1") + sp)
      val ti = ev.filter(col("_e") === steps(i - 1))
        .join(frontierCols, Seq("_k"))
        .filter(col("_t") > col(prev) && deadline)
        .groupBy("_k").agg(min(col("_t")).as(s"ts_$i"))
      out = out.join(ti, Seq("_k"), "left_outer")
    }
    // ts_i non-null implies ts_{i-1} non-null, so ascending overwrite
    // leaves the highest completed stage
    val stage = (2 to steps.length).foldLeft(lit(1)) { (acc, i) =>
      when(col(s"ts_$i").isNotNull, lit(i)).otherwise(acc)
    }
    out.select(col("_k").as(keyCol) +: stage.as("stage") +:
      (1 to steps.length).map(i => col(s"ts_$i")): _*)
  }

  /** Cohort retention matrix: keys cohorted by their FIRST event's
    * time bucket; a cell (cohort, offset) counts the keys of that
    * cohort active `offset` buckets later — the classic retention
    * triangle, and equally the recurring-contributor curve for a
    * corpus (sources still shipping documents N weeks after first
    * seen).
    *
    * Shape: (key, bucket) pairs dedupe FIRST (map-side-combinable
    * distinct — the event stream collapses to at most keys×buckets
    * before anything joins), the key-sized cohort table derives from
    * the same pairs with a min, and one equi-join + count finishes.
    * Hot keys collapse in the combine; nothing is windowed. Offsets
    * are complete per key by construction (0 always present). */
  def retention(
      events: DataFrame,
      bucket: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(bucket > 0, s"retention: bucket must be positive, got $bucket")
    // integral div (the Resample slot idiom), NOT floor(a/b): double
    // division of large epoch values can land within an ulp of the
    // next integer and disagree with the oracle's `//`.
    // Plan note: a one-shuffle collect_set variant (per-key bucket sets,
    // cohort = array_min) was measured 1.7× SLOWER at 10M rows — the
    // object-hash aggregate loses more than the saved exchanges of this
    // all-codegen plan, whose three shuffles run on progressively
    // smaller data (deduped pairs → key-sized → bucket²-sized).
    val pairs = events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("_k"),
        call_function("div", col(tsCol), lit(bucket)).as("_b"))
      .distinct()
      .transform(graft.Stage.materialize) // cohorts + join both read it
    val cohorts = pairs.groupBy("_k").agg(min(col("_b")).as("cohort"))
    pairs.join(cohorts, Seq("_k"))
      .groupBy(col("cohort"), (col("_b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Stage-population summary of [[funnel]]: entrants per furthest
    * stage plus the classic cumulative conversion counts (how many
    * reached AT LEAST stage i). One aggregation over the key-sized
    * funnel table; the window runs over the stage-count-sized summary
    * (single tiny partition by construction). */
  def funnelStages(funnelOut: DataFrame): DataFrame = {
    val reached = funnelOut.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("stage").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    reached.withColumn("n_reached_at_least", sum(col("n_keys")).over(w))
  }
}
