package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot maintenance — the MERGE/upsert half of running a
  * living corpus (recrawls, re-annotations, takedown deletes) without a
  * table format: `upsert(snapshot, delta)` keeps, per key, the row with
  * the highest (version, delta-wins) order and drops keys whose winning
  * row is a tombstone.
  *
  * One hash aggregation on the key — `max_by` over the full row struct —
  * so the merge is a single shuffle with map-side partial combine (each
  * task forwards at most one candidate row per key), not a window sort.
  * At 100 TB: write the result partitioned/bucketed by the same key and
  * successive deltas merge against co-located files.
  *
  * Determinism contract: (key, version) is unique within each input —
  * the usual snapshot invariant. Equal versions across inputs resolve
  * delta-wins; the oracle replays the same (version DESC, src DESC)
  * order. */
object Snapshot {

  def upsert(
      snapshot: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      versionCol: String,
      tombstoneCol: Option[String] = None): DataFrame = {
    val cols = snapshot.columns
    require(delta.columns.sorted.sameElements(cols.sorted),
      s"snapshot/delta schemas differ: ${cols.mkString(",")} vs ${delta.columns.mkString(",")}")
    val u = snapshot.withColumn("_src", lit(0))
      .unionByName(delta.withColumn("_src", lit(1)))
    val payload = struct((cols :+ "_src").map(col): _*)
    val latest = u.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(col(versionCol), col("_src"))).as("_row"))
      .select(col("_row.*"))
      .drop("_src")
    tombstoneCol.map(t => latest.filter(!col(t))).getOrElse(latest)
  }

  /** Row-level diff of two keyed snapshots — the audit half of snapshot
    * maintenance: which keys were added, removed, or changed between two
    * corpus versions. One full-outer shuffle join on the key; payloads
    * compare column-by-column with null-safe equality (no engine-private
    * hash, so the oracle replays it as `IS NOT DISTINCT FROM`).
    * Unchanged keys are dropped — at 100 TB the diff is change-sized,
    * not corpus-sized, the moment it leaves the join. */
  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    require(neu.columns.sorted.sameElements(old.columns.sorted),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val payload = old.columns.filterNot(keys.contains).sorted
    val o = old.select(keys.map(col) ++
      Seq(lit(true).as("_po"), struct(payload.map(col): _*).as("_o")): _*)
    val n = neu.select(keys.map(col) ++
      Seq(lit(true).as("_pn"), struct(payload.map(col): _*).as("_n")): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("_po").isNull, lit("added"))
          .when(col("_pn").isNull, lit("removed"))
          .when(!(col("_o") <=> col("_n")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** SCD2 history: versioned rows → validity intervals per key, with
    * consecutive versions carrying an UNCHANGED payload collapsed into
    * one interval — the type-2 slowly-changing-dimension table, and
    * the document-version-history view of a living corpus (when did
    * this doc's text actually change, ignoring no-op recrawls).
    *
    * Shape: one keyed window pass marks change points (null-safe
    * payload vs lag), a running sum numbers the runs, a (key, run)
    * aggregation takes each run's first version, and a second key-sized
    * window leads the next run's start — all per-key work, keys carry
    * the parallelism, nothing global. `valid_to` null = current row.
    * Determinism contract: (key, version) unique (the [[upsert]]
    * invariant). */
  def history(rows: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payloadCols = rows.columns.filterNot(c =>
      keys.contains(c) || c == versionCol).sorted
    require(payloadCols.nonEmpty,
      "history: need at least one payload column besides keys + version")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    val payload = struct(payloadCols.map(col): _*)
    val marked = rows
      .withColumn("_chg",
        when(payload <=> lag(payload, 1).over(w), lit(0)).otherwise(lit(1)))
      .withColumn("_run", sum(col("_chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = marked.groupBy((keys.map(col) :+ col("_run")): _*)
      .agg(min(col(versionCol)).as("valid_from"),
        min_by(payload, col(versionCol)).as("_p"))
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select(keys.map(col) ++ payloadCols.map(c => col(s"_p.$c").as(c)) ++
        Seq(col("valid_from"), col("valid_to")): _*)
  }
}
