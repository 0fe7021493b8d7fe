package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass relational column profiler — the ANALYZE/data-quality
  * primitive an ingest pipeline runs before anything else: per column,
  * row count, null count, EXACT distinct count, and min/max. All
  * metrics ride ONE aggregation over one scan (the multiple
  * COUNT(DISTINCT)s lower to Catalyst's expand rewrite with map-side
  * combine — the p69 data-card shape); the long (column, metrics)
  * output is a driver-tiny unpivot of that single row.
  *
  * Cross-engine presentation contract (the hash-stable gate rules):
  * numeric columns present min/max as DOUBLE in `min_num`/`max_num`
  * (comparison happens in the native type first), string columns in
  * `min_str`/`max_str`; the other pair is null. Only numeric and string
  * columns are supported — anything else (struct/array/binary) raises,
  * since its min/max rendering is engine-specific. Distinct counts
  * exclude nulls (both engines' COUNT(DISTINCT) contract).
  *
  * At 100 TB: one scan, no shuffle beyond the expand aggregation,
  * output rows = number of profiled columns. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"profile columns must be distinct, got $cols") // dup aliases would
    // otherwise fail analysis mid-plan with AMBIGUOUS_REFERENCE
    val schema = df.schema
    cols.foreach { c =>
      require(schema.fieldNames.contains(c), s"no such column: $c")
      schema(c).dataType match {
        case _: NumericType | _: StringType => ()
        case dt => throw new IllegalArgumentException(
          s"profile supports numeric and string columns; $c is ${dt.simpleString}")
      }
    }
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        count_distinct(col(c)).as(s"_dist_$c"),
        (if (isNum(c)) min(col(c)).cast("double") else min(col(c)))
          .as(s"_min_$c"),
        (if (isNum(c)) max(col(c)).cast("double") else max(col(c)))
          .as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_dist_$c").as("n_distinct"),
        (if (isNum(c)) col(s"_min_$c") else lit(null).cast("double"))
          .as("min_num"),
        (if (isNum(c)) col(s"_max_$c") else lit(null).cast("double"))
          .as("max_num"),
        (if (isNum(c)) lit(null).cast("string") else col(s"_min_$c"))
          .as("min_str"),
        (if (isNum(c)) lit(null).cast("string") else col(s"_max_$c"))
          .as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select("_r.*")
  }
}
