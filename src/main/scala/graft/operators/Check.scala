package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the "expectations"
  * layer a production ingest runs beside [[Profile]] (dbt tests / Great
  * Expectations shape, relationally): each constraint lowers to one
  * aggregation or anti-join and the results union into a tiny
  * (check_name, value) report, with a `rows` row carrying the total so
  * ratios are computable from the report alone.
  *
  * Violation semantics (each deterministic and SQL-replayable):
  *  - not_null: rows where the column is null.
  *  - unique: rows PARTICIPATING in a duplicated key (sum of group
  *    sizes over groups larger than 1 — "how many rows are implicated",
  *    not "how many groups").
  *  - in_range: non-null values outside [lo, hi] (nulls are not range
  *    violations; declare NotNull separately).
  *  - ref_in: non-null keys with no match in the dimension (null FKs
  *    are not violations — SQL's NOT IN semantics made explicit).
  *
  * At 100 TB each check is one shuffle-light pass (not_null/in_range
  * are map-side folds; unique is one hash aggregation on the key;
  * ref_in is an anti-join that AQE broadcasts for dimension-sized
  * right sides), and checks run as independent jobs. */
object Check {

  sealed trait Constraint { def name: String }
  final case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }
  final case class Unique(cols: Seq[String]) extends Constraint {
    require(cols.nonEmpty, "unique needs at least one column")
    def name = s"unique(${cols.mkString(",")})"
  }
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    require(lo <= hi, s"in_range needs lo <= hi, got [$lo, $hi]")
    def name = s"in_range($col,$lo,$hi)"
  }
  final case class RefIn(col: String, dim: DataFrame, dimCol: String) extends Constraint {
    // the dimension column is part of the name so two RefIn constraints
    // on the same fact column against different dimensions stay
    // distinguishable in the report
    def name = s"ref_in($col->$dimCol)"
  }

  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check needs at least one constraint")
    val rows = df.agg(count(lit(1)).as("value"))
      .select(lit("rows").as("check_name"), col("value"))
    val reports = constraints.map {
      case c @ NotNull(cn) =>
        df.agg((count(lit(1)) - count(col(cn))).as("value"))
          .select(lit(c.name).as("check_name"), col("value"))
      case c @ Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_c"))
          .filter(col("_c") > 1)
          .agg(coalesce(sum(col("_c")), lit(0L)).as("value"))
          .select(lit(c.name).as("check_name"), col("value"))
      case c @ InRange(cn, lo, hi) =>
        df.agg(coalesce(sum(
            when(col(cn).isNotNull && (col(cn) < lo || col(cn) > hi), 1L)
              .otherwise(0L)), lit(0L)).as("value"))
          .select(lit(c.name).as("check_name"), col("value"))
      case c @ RefIn(cn, dim, dimCol) =>
        df.filter(col(cn).isNotNull)
          .join(dim.select(col(dimCol).as(cn)).distinct(), Seq(cn), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit(c.name).as("check_name"), col("value"))
    }
    reports.foldLeft(rows)(_ unionAll _)
  }
}
