package graft.japi

import graft.dsl
import graft.logic.{GenPred, Op, OpPred, Pred, Query, QueryOptions, Vars}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.{List => JList}
import scala.jdk.CollectionConverters._

/** Query option keywords, Java-facing (reference jcascalog Option.java:
  * SORT / REVERSE / TRAP / DISTINCT; REDUCERS rides along from the
  * Scala DSL's option set). Used with [[JApi.SubqueryBuilder.option]]
  * in the keyword-argument style of the reference:
  * `.option(JOption.SORT, List.of("?count")).option(JOption.REVERSE)`. */
object JOption extends Enumeration {
  val SORT, REVERSE, TRAP, DISTINCT, REDUCERS = Value
}

/** A single predicate as data — op + input fields + output fields
  * (reference jcascalog Predicate.java). Used by [[JPredicateMacro]]
  * implementations to return their expansion. */
final class JPredicate(val op: Op, val in: JList[Object], val out: JList[String]) {
  def this(op: Op, in: JList[Object]) = this(op, in, java.util.Collections.emptyList[String]())
}

/** Java-implementable predicate macro (reference jcascalog
  * PredicateMacro.java): given the caller's actual in/out field names,
  * return the predicates to splice into the query. Use
  * [[JApi.genNullableVar]] for hygienic intermediates. */
trait JPredicateMacro {
  def getPredicates(in: JList[Object], out: JList[Object]): JList[JPredicate]
}

/** Java-friendly facade (reference jcascalog module: Api/Subquery/
  * Predicate/Option/PredicateMacroTemplate over the same engine,
  * jcascalog_test.clj). No varargs overloading games, no implicits —
  * plain lists, builder style:
  *
  * {{{
  * Query q = JApi.subquery(List.of("?person"))
  *     .generator(df, List.of("?person", "?age"))
  *     .op(JApi.lt(), List.of("?age", 30))
  *     .option(JOption.DISTINCT)
  *     .build();
  * JApi.run(spark, q);
  * }}}
  */
object JApi {

  final class SubqueryBuilder(out: JList[String]) {
    private val preds = scala.collection.mutable.ArrayBuffer[dsl.PredLike]()
    private var opts = QueryOptions()

    def generator(df: DataFrame, fields: JList[String]): SubqueryBuilder = {
      preds += dsl.PredOf(GenPred(_ => df, fields.asScala.toSeq))
      this
    }

    /** Use a prebuilt generator (a tap, [[JApi.union]]/[[JApi.combine]]
      * output, [[JApi.firstN]] output, or a subquery-as-generator from
      * [[JApi.generatorOf]]). */
    def gen(g: GenPred): SubqueryBuilder = {
      preds += dsl.PredOf(g)
      this
    }

    /** In-memory rows as a generator (the reference's plain-vector
      * generators in jcascalog_test.clj). */
    def mem(rows: JList[JList[Object]], fields: JList[String]): SubqueryBuilder =
      gen(dsl.mem(rows.asScala.toSeq.map(_.asScala.toSeq))(
        fields.asScala.toSeq: _*))

    def parquet(path: String, fields: JList[String]): SubqueryBuilder =
      gen(dsl.parquet(path)(fields.asScala.toSeq: _*))

    /** Text-line tap as a generator (reference Api.hfsTextline). */
    def textline(path: String, fields: JList[String]): SubqueryBuilder =
      gen(graft.sources.Taps.textline(path)(fields.asScala.toSeq: _*))

    /** Delimited tap (reference hfs-delimited). */
    def delimited(path: String, sep: String, header: Boolean,
        fields: JList[String]): SubqueryBuilder =
      gen(graft.sources.Taps.delimited(path, sep, header)(
        fields.asScala.toSeq: _*))

    /** Filter predicate (no outputs). */
    def op(o: Op, in: JList[Object]): SubqueryBuilder = {
      preds += dsl.PredOf(OpPred(o, in.asScala.toSeq, Nil))
      this
    }

    /** Operation with outputs (the `:>` form). */
    def op(o: Op, in: JList[Object], outFields: JList[String]): SubqueryBuilder = {
      preds += dsl.PredOf(OpPred(o, in.asScala.toSeq, outFields.asScala.toSeq))
      this
    }

    /** Apply a 1-in-1-out op to EACH listed field (reference Api.each,
      * logic/ops.clj:106-128): expands to one predicate per (in, out)
      * pair, so it works for MAP ops and AGGREGATORS alike — the
      * reference's `each(Sum)` over N columns becomes N parallel
      * aggregators in one grouping pass, exactly as the Scala DSL
      * plans N separate agg predicates. */
    def opEach(o: Op, in: JList[Object], outFields: JList[String]): SubqueryBuilder = {
      require(in.size == outFields.size,
        s"each needs one output per input, got ${in.size} in / ${outFields.size} out")
      in.asScala.zip(outFields.asScala).foreach { case (i, out) =>
        preds += dsl.PredOf(OpPred(o, Seq(i), Seq(out)))
      }
      this
    }

    /** Predicate-macro call (reference: a PredicateMacro used like any
      * op in a Subquery). Expanded hygienically at build(). */
    def macroOp(m: dsl.PredMacro, in: JList[Object],
        outFields: JList[String]): SubqueryBuilder = {
      preds += dsl.MacroCall(m,
        in.asScala.toSeq, outFields.asScala.toSeq)
      this
    }

    def macroOp(m: JPredicateMacro, in: JList[Object],
        outFields: JList[String]): SubqueryBuilder =
      macroOp(fromJavaMacro(m), in, outFields)

    def exists(df: DataFrame, fields: JList[String]): SubqueryBuilder = {
      preds += dsl.PredOf(
        graft.logic.ExistsPred(GenPred(_ => df, fields.asScala.toSeq), true))
      this
    }

    /** Trapped op (string-to-string, the common parse-fn shape): rows
      * where `f` throws are diverted to the query's TRAP sink and the
      * job continues (reference trap taps; Java face of
      * `dsl.trapped`). Pair with `.option(JOption.TRAP, sink)`. */
    def trappedOp(f: java.util.function.Function[String, String],
        in: JList[Object], outFields: JList[String]): SubqueryBuilder = {
      val sf: String => String = a => f.apply(a)
      preds += dsl.PredOf(OpPred(graft.operators.Trap.trapFn(sf),
        in.asScala.toSeq,
        outFields.asScala.toSeq :+ Vars.genTrapVar()))
      this
    }

    /** Flag options: REVERSE, DISTINCT (reference Option keywords used
      * as bare predicates). */
    def option(o: JOption.Value): SubqueryBuilder = o match {
      case JOption.REVERSE => opts = opts.copy(reverse = true); this
      case JOption.DISTINCT => opts = opts.copy(distinct = true); this
      case other => throw new IllegalArgumentException(
        s"option $other requires a value; use option(o, value)")
    }

    /** Valued options: SORT (List of vars), TRAP (Consumer<DataFrame>
      * sink), REDUCERS (Integer). */
    def option(o: JOption.Value, value: Object): SubqueryBuilder = o match {
      case JOption.SORT =>
        opts = opts.copy(
          sort = value.asInstanceOf[JList[String]].asScala.toSeq); this
      case JOption.TRAP =>
        val sink = value.asInstanceOf[java.util.function.Consumer[DataFrame]]
        opts = opts.copy(trap = Some(df => sink.accept(df))); this
      case JOption.REDUCERS =>
        opts = opts.copy(reducers = Some(value.asInstanceOf[Number].intValue())); this
      case JOption.REVERSE | JOption.DISTINCT => option(o)
    }

    def build(): Query =
      dsl.query(out.asScala.toSeq: _*)(preds.toSeq: _*).withOptions(opts)
  }

  def subquery(outFields: JList[String]): SubqueryBuilder =
    new SubqueryBuilder(outFields)

  def run(spark: SparkSession, q: Query): DataFrame = q.toDF(spark)

  // --------------------------------------- generator algebra + taps
  // (reference Api.java:102-114 union/combine, 39-51 taps, 121-131
  // field introspection)

  /** A compiled subquery as a generator with the given fields —
    * subqueries are first-class generators (reference
    * api_test.clj:193-216; Java face of `q(...)`). */
  def generatorOf(q: Query, fields: JList[Object]): GenPred =
    q(fields.asScala.toSeq: _*)

  /** Union with dedupe (reference Api.union). */
  def union(gens: JList[GenPred]): GenPred =
    dsl.union(gens.asScala.toSeq: _*)

  /** Concatenation without dedupe (reference Api.combine). */
  def combine(gens: JList[GenPred]): GenPred =
    dsl.combine(gens.asScala.toSeq: _*)

  /** Sorted head of a subquery (reference Api.firstN + FirstNArgs). */
  def firstN(q: Query, n: Int, sort: JList[String], reverse: Boolean,
      fields: JList[Object]): GenPred =
    dsl.firstN(q, n, sort.asScala.toSeq, reverse)(fields.asScala.toSeq: _*)

  /** Apply a 1-in-1-out op across N fields (reference Api.each). */
  def each(o: Op): Op = o match {
    case cm: graft.logic.ColumnMap => graft.ops.Ops.each(cm)
    case other => throw new IllegalArgumentException(
      s"each requires a column-map op, got ${other.getClass.getSimpleName}")
  }

  /** Text-line tap, usable as source (gen) or via [[sinkTextline]]. */
  def hfsTextline(path: String, fields: JList[String]): GenPred =
    graft.sources.Taps.textline(path)(fields.asScala.toSeq: _*)

  /** Parquet tap — the native tuple format (reference hfsSeqfile). */
  def hfsSeqfile(path: String, fields: JList[String]): GenPred =
    dsl.parquet(path)(fields.asScala.toSeq: _*)

  /** Execute a query into a parquet sink (reference Api.execute with an
    * hfs-seqfile tap). */
  def execute(spark: SparkSession, q: Query, path: String): Unit =
    run(spark, q).write.mode("overwrite").parquet(path)

  /** Execute into a text-line sink (tab-joined, reference textline). */
  def sinkTextline(spark: SparkSession, q: Query, path: String): Unit = {
    import org.apache.spark.sql.functions.{concat_ws, col}
    val df = run(spark, q)
    df.select(concat_ws("\t", df.columns.map(col): _*).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Execute to stdout (reference Api.StdoutTap + execute). */
  def stdout(spark: SparkSession, q: Query): Unit =
    graft.sources.Taps.stdout(run(spark, q))

  def getOutFields(spark: SparkSession, q: Query): JList[String] =
    run(spark, q).columns.toSeq.asJava

  def numOutFields(q: Query): Int = q.outFields.length

  /** Fresh nullable var for hygienic macro intermediates (reference
    * Api.genNullableVar). */
  def genNullableVar(): String = "!" + Vars.gen().drop(1)

  // ------------------------------------------------ predicate macros
  // (reference PredicateMacro.java / PredicateMacroTemplate.java)

  private def fromJavaMacro(m: JPredicateMacro): dsl.PredMacro =
    (in, out) =>
      m.getPredicates(in.map(_.asInstanceOf[Object]).asJava,
          out.map(_.asInstanceOf[Object]).asJava)
        .asScala.toSeq.map(p =>
          dsl.PredOf(OpPred(p.op, p.in.asScala.toSeq, p.out.asScala.toSeq)))

  /** Template-style macro builder (reference PredicateMacroTemplate):
    * declare template in/out field names, list predicates over them;
    * at expansion the template names map to the caller's actual vars
    * and every OTHER var in the template gets a fresh generated name —
    * so a caller var that happens to collide with a template
    * intermediate (the "?sum confusion" case in jcascalog_test.clj)
    * cannot capture it. */
  final class MacroTemplate(inF: Seq[String], outF: Seq[String]) {
    private val tpreds =
      scala.collection.mutable.ArrayBuffer[(Op, Seq[Any], Seq[String])]()

    def predicate(o: Op, in: JList[Object]): MacroTemplate = {
      tpreds += ((o, in.asScala.toSeq, Nil)); this
    }
    def predicate(o: Op, in: JList[Object], out: JList[String]): MacroTemplate = {
      tpreds += ((o, in.asScala.toSeq, out.asScala.toSeq)); this
    }

    def build(): dsl.PredMacro = {
      val frozen = tpreds.toSeq
      (actualIn, actualOut) => {
        require(actualIn.length == inF.length && actualOut.length == outF.length,
          s"macro arity mismatch: template (${inF.length} -> ${outF.length}), " +
            s"call (${actualIn.length} -> ${actualOut.length})")
        val mapping = scala.collection.mutable.Map[String, Any](
          (inF zip actualIn) ++ (outF zip actualOut): _*)
        def sub(v: Any): Any = v match {
          case s: String if Vars.isVar(s) =>
            mapping.getOrElseUpdate(s, Vars.gen())
          case other => other
        }
        frozen.map { case (o, in, out) =>
          dsl.PredOf(OpPred(o, in.map(sub), out.map(sub)))
        }
      }
    }
  }

  final class MacroTemplateBuilder(inF: JList[String]) {
    def out(outF: JList[String]): MacroTemplate =
      new MacroTemplate(inF.asScala.toSeq, outF.asScala.toSeq)
  }

  def macroTemplate(inFields: JList[String]): MacroTemplateBuilder =
    new MacroTemplateBuilder(inFields)

  /** The shipped op library, reachable without Scala-object syntax
    * (jcascalog.op.{Sum, Count, ...} analog). */
  def count(): Op = graft.ops.Ops.count
  def sum(): Op = graft.ops.Ops.sum
  def min(): Op = graft.ops.Ops.min
  def max(): Op = graft.ops.Ops.max
  def avg(): Op = graft.ops.Ops.avg
  def distinctCount(): Op = graft.ops.Ops.distinctCount
  def limit(n: Int): Op = graft.ops.Ops.limit(n)
  def limitRank(n: Int): Op = graft.ops.Ops.limitRank(n)
  def lt(): Op = graft.ops.Ops.lt
  def lte(): Op = graft.ops.Ops.lte
  def gt(): Op = graft.ops.Ops.gt
  def gte(): Op = graft.ops.Ops.gte
  def plus(): Op = graft.ops.Ops.plus
  def minus(): Op = graft.ops.Ops.minus
  def times(): Op = graft.ops.Ops.times
  def div(): Op = graft.ops.Ops.div
  def limitHeap(n: Int): Op = graft.ops.Ops.limitHeap(n)
  def limitSalted(n: Int, salt: Int): Op = graft.ops.Ops.limitSalted(n, salt)

  // ---------------------------------------------------- pipeline facade

  def curate(docs: DataFrame, lang: String): DataFrame =
    graft.pipeline.Curate.curate(docs, lang)
  def nearDupDedup(docs: DataFrame, threshold: Double): DataFrame =
    graft.pipeline.Dedup.nearDupDedup(docs, threshold = threshold)
  def bruteForceKnn(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    graft.pipeline.Similarity.bruteForceKnn(corpus, probes, k)
  def ivfKnn(corpus: DataFrame, probes: DataFrame, k: Int, cells: Int, nProbe: Int): DataFrame =
    graft.pipeline.Similarity.ivfKnn(corpus, probes, k, cells, nProbe)
  def bucketSink(df: DataFrame, table: String, keys: JList[String], buckets: Int): Unit =
    graft.sources.Taps.bucketSink(df, table, keys.asScala.toSeq, buckets)
}
