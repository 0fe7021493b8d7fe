package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the "expectations"
  * layer a production ingest runs beside [[Profile]] (dbt tests / Great
  * Expectations shape, relationally): constraints lower to aggregations
  * or anti-joins and the results union into a tiny (check_name, value)
  * report, with a `rows` row carrying the total so ratios are
  * computable from the report alone.
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
  * At 100 TB the row count and every map-side-foldable constraint
  * (not_null, in_range) FUSE into one aggregation — a single scan of
  * the data no matter how many such constraints are declared. Only the
  * key-level constraints cost their own job: unique is one hash
  * aggregation on the key; ref_in is an anti-join that AQE broadcasts
  * for dimension-sized right sides. */
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

  /** The violation count as one map-side-foldable aggregate expression,
    * for constraints that need only a scan (no shuffle on a key). */
  private def scanAgg(c: Constraint): Option[Column] = c match {
    case NotNull(cn) =>
      Some(coalesce(sum(when(col(cn).isNull, 1L).otherwise(0L)), lit(0L)))
    case InRange(cn, lo, hi) =>
      Some(coalesce(sum(
        when(col(cn).isNotNull && (col(cn) < lo || col(cn) > hi), 1L)
          .otherwise(0L)), lit(0L)))
    case _ => None
  }

  /** One aggregation over `df` computing every (name, expr) pair, then
    * unpivoted to (check_name, value) rows in declaration order — the
    * single-scan fusion. */
  private def fusedReport(df: DataFrame, pairs: Seq[(String, Column)]): DataFrame = {
    val aggCols = pairs.zipWithIndex.map { case ((_, c), i) =>
      c.cast("long").as(s"_v$i")
    }
    val kvs = pairs.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("check_name"), col(s"_v$i").as("value"))
    }
    df.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.check_name"), col("kv.value"))
  }

  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check needs at least one constraint")
    // fold the `rows` total and every consecutive run of single-scan
    // constraints into one aggregation each (usually: one job total);
    // key-level constraints flush the run and contribute their own job,
    // preserving the report's declaration order
    val segments = Seq.newBuilder[DataFrame]
    val pending = Seq.newBuilder[(String, Column)]
    var pendingN = 1
    pending += ("rows" -> count(lit(1)))
    def flush(): Unit = if (pendingN > 0) {
      segments += fusedReport(df, pending.result())
      pending.clear(); pendingN = 0
    }
    constraints.foreach { c =>
      scanAgg(c) match {
        case Some(expr) => pending += (c.name -> expr); pendingN += 1
        case None =>
          flush()
          segments += (c match {
            case u @ Unique(cols) =>
              df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_c"))
                .filter(col("_c") > 1)
                .agg(coalesce(sum(col("_c")), lit(0L)).as("value"))
                .select(lit(u.name).as("check_name"), col("value"))
            case r @ RefIn(cn, dim, dimCol) =>
              df.filter(col(cn).isNotNull)
                .join(dim.select(col(dimCol).as(cn)).distinct(), Seq(cn), "left_anti")
                .agg(count(lit(1)).as("value"))
                .select(lit(r.name).as("check_name"), col("value"))
            case other => sys.error(s"unhandled constraint $other")
          })
      }
    }
    flush()
    segments.result().reduce(_ unionAll _)
  }
}
