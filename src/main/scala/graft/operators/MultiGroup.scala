package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** multigroup (reference cascading/operations.clj:550-569 +
  * MultiGroupBy.java:42-195): cogroup N inputs on a shared key and run ONE
  * multibuffer over all N group-iterators.
  *
  * Spark realization: per-input `collect_list(struct(...))` group-by, full
  * outer join of the grouped lists on the key, then a partition-local pass
  * applying the multibuffer. Per-key group materialization mirrors the
  * reference (its spillable tuple list, MultiGroupBy.java:51-53 — Spark
  * spills the shuffle, the per-key lists must fit in memory, same
  * contract).
  */
object MultiGroup {

  /** @param f (key values, per-input row groups) → output tuples */
  def multigroup(
      inputs: Seq[DataFrame],
      keys: Seq[String],
      outNames: Seq[String],
      outTypes: Seq[DataType])(
      f: (Seq[Any], Seq[Seq[Row]]) => Iterator[Seq[Any]]): DataFrame = {
    require(inputs.nonEmpty)
    val spark = inputs.head.sparkSession

    val grouped = inputs.zipWithIndex.map { case (df, i) =>
      val valueCols = df.columns.filterNot(keys.contains)
      df.groupBy(keys.map(col): _*)
        .agg(collect_list(struct(valueCols.map(col): _*)).as(s"_g$i"))
    }
    val joined = grouped.reduce((a, b) => a.join(b, keys, "full_outer"))

    val n = inputs.size
    val nKey = keys.size
    val outSchema = StructType(
      keys.zipWithIndex.map { case (k, i) =>
        StructField(k, joined.schema(i).dataType, nullable = true)
      } ++ outNames.zip(outTypes).map { case (nm, dt) =>
        StructField(nm, dt, nullable = true)
      })

    val rdd = joined.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val key = (0 until nKey).map(r.get)
        val groups = (0 until n).map { i =>
          val raw = r.get(nKey + i)
          if (raw == null) Seq.empty[Row]
          else raw.asInstanceOf[scala.collection.Seq[Row]].toSeq
        }
        f(key, groups).map(tuple => Row.fromSeq(key ++ tuple))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
