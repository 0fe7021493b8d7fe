package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** multigroup (reference cascading/operations.clj:550-569 +
  * MultiGroupBy.java:42-195): cogroup N inputs on a shared key and run ONE
  * multibuffer over all N group-iterators.
  *
  * Spark realization stays in the Dataset layer end-to-end: the inputs are
  * tagged and unioned (one nullable payload struct per input), grouped with
  * `groupByKey`, and the multibuffer runs inside `flatMapSortedGroups`
  * with a secondary sort on the tag — Spark's sort-based aggregation
  * streams each key's rows through the function, so groups are never
  * materialized by the engine (no `collect_list`, no RDD scan boundary).
  * A multibuffer that drains the per-input iterators in input order is
  * memory-flat even for multi-million-row groups; out-of-order access
  * transparently buffers only the rows it skips (the reference's spillable
  * tuple-list contract, MultiGroupBy.java:51-53, materialized everything).
  *
  * Grouping note: keys cogroup by VALUE equality — two inputs with a null
  * key land in the same group (MapReduce cogroup semantics, matching the
  * reference), not the SQL-join convention of the previous
  * `collect_list` + full-outer-join realization where null keys never met.
  */
object MultiGroup {

  /** Streaming multibuffer: one LAZY iterator per input.
    * @param f (key values, per-input row iterators) → output tuples */
  def multigroupStream(
      inputs: Seq[DataFrame],
      keys: Seq[String],
      outNames: Seq[String],
      outTypes: Seq[DataType])(
      f: (Seq[Any], Seq[Iterator[Row]]) => Iterator[Seq[Any]]): DataFrame = {
    require(inputs.nonEmpty)
    val n = inputs.size
    val nKey = keys.size
    val keySchema = StructType(keys.map(k => StructField(
      k, inputs.head.schema(k).dataType, nullable = true)))
    val payloadSchemas = inputs.map { df =>
      val vs = df.schema.filterNot(fd => keys.contains(fd.name))
      if (vs.isEmpty) StructType(Seq(StructField("_empty", IntegerType))) else StructType(vs)
    }
    val tagged = inputs.zipWithIndex.map { case (df, i) =>
      val valueCols = df.columns.filterNot(keys.contains)
      val payload =
        if (valueCols.isEmpty) struct(lit(0).as("_empty"))
        else struct(valueCols.toIndexedSeq.map(col): _*)
      df.select(
        keys.zipWithIndex.map { case (k, ki) =>
          col(k).cast(keySchema(ki).dataType).as(k) } ++
          Seq(lit(i).as("_tag")) ++
          payloadSchemas.zipWithIndex.map { case (ps, j) =>
            (if (j == i) payload else lit(null).cast(ps)).as(s"_p$j")
          }: _*)
    }
    val all = tagged.reduce(_ unionByName _)
    val outSchema = StructType(
      keySchema.fields ++
        outNames.zip(outTypes).map { case (nm, dt) =>
          StructField(nm, dt, nullable = true) })
    val grouped = all.groupByKey((r: Row) =>
      Row.fromSeq((0 until nKey).map(r.get)))(Encoders.row(keySchema))
    grouped.flatMapSortedGroups(col("_tag")) { (key: Row, it: Iterator[Row]) =>
      val keyVals = key.toSeq
      val cursor = new TagCursor(it, n, nKey)
      f(keyVals, cursor.iterators).map(t => Row.fromSeq(keyVals ++ t))
    }(Encoders.row(outSchema)).toDF()
  }

  /** Materialized-group contract (the reference's own): per-input Seqs.
    * Delegates to the streaming core, draining iterators in input order. */
  def multigroup(
      inputs: Seq[DataFrame],
      keys: Seq[String],
      outNames: Seq[String],
      outTypes: Seq[DataType])(
      f: (Seq[Any], Seq[Seq[Row]]) => Iterator[Seq[Any]]): DataFrame =
    multigroupStream(inputs, keys, outNames, outTypes) { (key, its) =>
      f(key, its.map(_.toSeq))
    }

  /** Shared cursor over one tag-sorted group stream handing out per-input
    * iterators. In-order consumption never buffers; pulling input j while
    * input i < j is undrained buffers i's remaining rows as they are
    * skipped past. */
  private final class TagCursor(base: Iterator[Row], n: Int, nKey: Int) {
    private val pending =
      Array.fill(n)(new scala.collection.mutable.ArrayDeque[Row]())
    private val it = base.buffered

    private def payloadOf(r: Row): Row = r.getStruct(nKey + 1 + r.getInt(nKey))

    val iterators: Seq[Iterator[Row]] = (0 until n).map { t =>
      new Iterator[Row] {
        def hasNext: Boolean = {
          if (pending(t).nonEmpty) true
          else {
            // rows are tag-sorted: park earlier tags, stop at later ones
            // (none of t can follow them) — so probing input t never
            // drags later inputs' rows into memory
            var found = false
            while (!found && it.hasNext && it.head.getInt(nKey) <= t) {
              val tag = it.head.getInt(nKey)
              if (tag == t) found = true
              else { pending(tag).append(payloadOf(it.head)); it.next() }
            }
            found
          }
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException(s"input $t drained")
          if (pending(t).nonEmpty) pending(t).removeHead()
          else payloadOf(it.next())
        }
      }
    }
  }
}
