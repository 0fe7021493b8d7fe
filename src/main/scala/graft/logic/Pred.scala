package graft.logic

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Predicates — the parsed query IR, mirroring the reference's
  * RawPredicate/RawSubquery (cascalog-core/src/clj/cascalog/logic/predicate.clj:35-42).
  */
sealed trait Pred

/** A generator: any tuple source bound positionally to logic vars
  * (reference generator dispatch, logic/platform.clj:45-60). `fields` may
  * contain vars, wildcards, duplicate vars (implicit equality,
  * logic/parse.clj:308-336) and constants (implicit equality filter,
  * logic/parse.clj:565-589). `small` hints a broadcast-able side.
  * `uniqueSets` declares candidate keys (each a set of bound vars whose
  * values are unique per row) — key metadata the eager-aggregation rewrite
  * needs to prove a join is a lookup. */
final case class GenPred(
    load: SparkSession => DataFrame,
    fields: Seq[Any],
    small: Boolean = false,
    uniqueSets: Seq[Set[String]] = Nil
) extends Pred

/** Operation application: op over input items (vars or constants) binding
  * output items (vars, constants → equality, or `_`). */
final case class OpPred(op: Op, in: Seq[Any], out: Seq[Any]) extends Pred

/** Generator-as-set / existence predicate (reference ExistenceNode,
  * logic/parse.clj:194-199; CascalogJoiner.java:57-86). `flag`:
  *  - `true`  → semi-join (keep rows with a match)
  *  - `false` → anti-join (keep rows without a match)
  *  - a var   → capture the did-it-match boolean, ≤1 row per key
  */
final case class ExistsPred(gen: GenPred, flag: Any) extends Pred

/** Per-query options (reference logic/options.clj). `:spill-threshold` is
  * accepted and ignored — Spark spills automatically. `trap` receives the
  * DataFrame of failing tuples (reference :trap tap, logic/options.clj:56).
  */
final case class QueryOptions(
    sort: Seq[String] = Nil,
    reverse: Boolean = false,
    distinct: Boolean = false,
    reducers: Option[Int] = None,
    name: Option[String] = None,
    spillThreshold: Option[Int] = None,
    trap: Option[DataFrame => Unit] = None
)

/** A parsed subquery: declared output fields + predicates + options
  * (reference RawSubquery). Compile with [[graft.planner.Planner]]. */
final case class Query(
    outFields: Seq[Any],
    preds: Seq[Pred],
    options: QueryOptions = QueryOptions()
) {

  def withOptions(o: QueryOptions): Query = copy(options = o)
  def sorted(vars: String*): Query = copy(options = options.copy(sort = vars))
  def reversed: Query = copy(options = options.copy(reverse = true))
  def distinct: Query = copy(options = options.copy(distinct = true))
  def named(n: String): Query = copy(options = options.copy(name = Some(n)))
  def reducers(n: Int): Query = copy(options = options.copy(reducers = Some(n)))
  /** :trap — failing tuples of trapped ops are diverted here and the job
    * continues (reference trap taps, cascading/platform.clj:311-318). */
  def withTrap(sink: DataFrame => Unit): Query =
    copy(options = options.copy(trap = Some(sink)))

  /** Compile and run: columns are the out fields with sigils stripped. */
  def toDF(spark: SparkSession): DataFrame =
    graft.planner.Planner.compile(spark, this)

  /** Explain: the query's predicate tree plus Catalyst's formatted
    * physical plan (reference explain surface; SURVEY §7.2). */
  def explain(spark: SparkSession): Unit = {
    println(describe)
    toDF(spark).explain("formatted")
  }

  /** Human-readable predicate listing (the logical node-tree view). */
  def describe: String = {
    val ps = preds.map {
      case GenPred(_, fields, small, _) =>
        s"  generator(${fields.mkString(", ")})${if (small) " [broadcast]" else ""}"
      case OpPred(op, in, out) =>
        val o = if (out.isEmpty) "" else s" :> ${out.mkString(", ")}"
        s"  ${op.getClass.getSimpleName}(${in.mkString(", ")})$o"
      case ExistsPred(g, flag) =>
        s"  exists[$flag](${g.fields.mkString(", ")})"
    }
    val opts = Seq(
      if (options.sort.nonEmpty)
        Some(s"sort=${options.sort.mkString(",")}${if (options.reverse) " desc" else ""}")
      else None,
      if (options.distinct) Some("distinct") else None,
      options.reducers.map(r => s"reducers=$r"),
      options.trap.map(_ => "trap")).flatten
    s"query(${outFields.mkString(", ")})" +
      (if (opts.nonEmpty) opts.mkString(" [", " ", "]") else "") +
      "\n" + ps.mkString("\n")
  }

  /** Use this subquery as a generator in an outer query (reference:
    * subqueries are first-class generators, api_test.clj:193-216). */
  def apply(fields: Any*): GenPred =
    GenPred(spark => toDF(spark), fields)
}
