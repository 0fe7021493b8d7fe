package graft

import graft.logic._
import graft.ops.{Ops => O}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

import scala.collection.mutable

/** Differential-fuzzing harness for the planner: a tiny query-spec ADT, a
  * dual-implementation op catalog (Spark `Op` + in-memory model function),
  * and a brute-force tuple evaluator implementing the reference query
  * semantics (SURVEY §1.3, §2.3-2.6) over `Seq[Map[var, Any]]` with SQL
  * three-valued null handling.
  *
  * The evaluator mirrors the reference's ALGORITHMIC decision points —
  * greedy maximal-shared-vars merge order with the OR-groundness rule
  * (logic/parse.clj:389-464,523-533), fixed-point op application with
  * filters first (parse.clj:375-385), dead-op pruning (parse.clj:640-682)
  * — because outer-join results and op timing legitimately depend on
  * them. Execution, however, is nested-loop scans over in-memory tuples
  * sharing no code with the Spark planner: any divergence is a bug in one
  * of the two.
  */
object PlannerFuzz {

  // ------------------------------------------------------------- spec ADT

  /** Generator-position spec: a raw in-memory relation, a
    * combine/union merge of raw relations, a nested subquery, or a
    * semantics-preserving checkpoint/cache wrapper. `outerFields` is
    * the field pattern the OUTER query sees — for merges and wrappers
    * that is the head's bound-var list (dsl.combine / dsl.checkpointed
    * re-expose bound vars, not the raw pattern). */
  sealed trait GenLike {
    def outerFields: Vector[Any]
    def small: Boolean
  }

  /** `uniqueKeys`: declared candidate keys (sound by construction — the
    * builder writes distinct values into the key column). Declaring one
    * arms the planner's eager-aggregation rewrite, which the model never
    * performs: the rewrite must be output-invisible or the differential
    * fails. */
  final case class GenSpec(fields: Vector[Any], rows: Seq[Vector[Any]], small: Boolean,
      uniqueKeys: Seq[Set[String]] = Nil) extends GenLike {
    def outerFields: Vector[Any] = fields
  }

  private def boundVarsOf(fields: Vector[Any]): Vector[String] =
    fields.collect {
      case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => v
    }.distinct

  /** combine (dedupe=false) / union (dedupe=true) of raw generators:
    * each sub binds its OWN pattern (constants, dups, null filters),
    * then rows merge POSITIONALLY under the head's bound-var names (the
    * reference's Cascading GroupBy-merge semantics — fields are the
    * head's, api.clj:178-192). The builder guarantees equal bound
    * arity across subs. */
  final case class MergeSpec(subs: Vector[GenSpec], dedupe: Boolean) extends GenLike {
    def small: Boolean = false
    def outerFields: Vector[Any] = boundVarsOf(subs.head.fields).map(v => v: Any)
  }

  /** Subquery as generator: the inner query's result relation binds
    * positionally under the outer pattern (TailStruct-as-generator). */
  final case class NestedSpec(q: QSpec, fields: Vector[Any], small: Boolean)
      extends GenLike {
    def outerFields: Vector[Any] = fields
  }

  /** intersect (except=false) / except (except=true) of two generators
    * (raw or merged): SQL set-op semantics — DISTINCT result, null-safe
    * tuple equality, positional matching under the left side's bound
    * vars. Beyond-reference ops (SURVEY §2.9), free on Spark. */
  final case class IntersectSpec(a: GenLike, b: GenLike, except: Boolean)
      extends GenLike {
    def small: Boolean = false
    def outerFields: Vector[Any] = boundVarsOf(a.outerFields).map(v => v: Any)
  }

  /** checkpointed (mode=1) / cached (mode=2) wrapper over ANY generator
    * shape (raw, merge, set-op): must be output-invisible — the model
    * evaluates the inner generator unchanged (the wrapper re-exposes
    * bound vars, whose re-binding in the planner is idempotent). */
  final case class WrapSpec(inner: GenLike, mode: Int) extends GenLike {
    def small: Boolean = inner.small
    def outerFields: Vector[Any] = boundVarsOf(inner.outerFields).map(v => v: Any)
  }

  final case class OpSpec(name: String, in: Vector[Any], out: Vector[Any])
  final case class ExistsSpec(gen: GenSpec, flag: Any)
  final case class QSpec(
      gens: Vector[GenLike],
      ops: Vector[OpSpec],
      aggs: Vector[OpSpec],
      exs: Vector[ExistsSpec],
      out: Vector[Any],
      distinct: Boolean,
      sort: Vector[String] = Vector.empty,
      reverse: Boolean = false) {
    def describe: String = {
      def fld(xs: Seq[Any]) = xs.map {
        case null => "null"
        case s: String => s
        case c => s"const($c)"
      }.mkString(", ")
      def genStr(g: GenLike, pad: String): String = g match {
        case g: GenSpec =>
          s"${pad}gen(${fld(g.fields)})${if (g.small) " [tiny]" else ""} rows=${g.rows.map(r => r.map(v => if (v == null) "ø" else v).mkString("(", ",", ")")).mkString("")}"
        case m: MergeSpec =>
          s"$pad${if (m.dedupe) "union" else "combine"}(${fld(m.outerFields)}) of\n" +
            m.subs.map(genStr(_, pad + "  ")).mkString("\n")
        case n: NestedSpec =>
          s"${pad}nested(${fld(n.fields)})${if (n.small) " [tiny]" else ""} <<\n" +
            n.q.describe.linesIterator.map(pad + "  " + _).mkString("\n") + s"\n$pad>>"
        case w: WrapSpec =>
          s"$pad${if (w.mode == 1) "checkpointed" else "cached"}:\n${genStr(w.inner, pad + "  ")}"
        case i: IntersectSpec =>
          s"$pad${if (i.except) "except" else "intersect"}(${fld(i.outerFields)}) of\n" +
            Seq(i.a, i.b).map(genStr(_, pad + "  ")).mkString("\n")
      }
      val gs = gens.map(genStr(_, "  "))
      val es = exs.map(e =>
        s"  exists[${e.flag}](${fld(e.gen.fields)}) rows=${e.gen.rows.map(r => r.map(v => if (v == null) "ø" else v).mkString("(", ",", ")")).mkString("")}")
      val os = (ops ++ aggs).map(o => s"  ${o.name}(${fld(o.in)}) :> ${fld(o.out)}")
      val opts = (if (distinct) Seq("distinct") else Nil) ++
        (if (sort.nonEmpty) Seq(s"sort=${sort.mkString(",")}${if (reverse) " desc" else ""}") else Nil)
      s"query(${fld(out)})${if (opts.nonEmpty) opts.mkString(" [", " ", "]") else ""}\n" +
        (gs ++ es ++ os).mkString("\n")
    }
  }

  // ----------------------------------------- op catalog (dual implementation)

  /** Model conventions: values are java-boxed Long / Boolean / null.
    * MMap.model returns the value (null allowed); MFilter.model returns a
    * java.lang.Boolean (null = SQL unknown); MMapcat.model returns the
    * element list (empty = no rows — Spark's null array explodes to
    * nothing, so null-producing mapcats return Nil). MAgg.model folds the
    * group's input-value rows to the single output value. */
  sealed trait MOp
  final case class MMap(arity: Int, spark: ColumnMap, model: Seq[Any] => Any) extends MOp
  final case class MFilter(arity: Int, spark: ColumnFilter, model: Seq[Any] => java.lang.Boolean) extends MOp
  final case class MMapcat(arity: Int, spark: ColumnMapcat, model: Seq[Any] => Seq[Any]) extends MOp
  final case class MAgg(arity: Int, spark: Op, isSeq: Boolean, model: Seq[Seq[Any]] => Any) extends MOp

  private def lv(x: Any): Long = x.asInstanceOf[Long]
  private def anyNull(vs: Seq[Any]): Boolean = vs.exists(_ == null)
  private def jb(b: Boolean): java.lang.Boolean = java.lang.Boolean.valueOf(b)

  val scalarOps: Map[String, MOp] = Map(
    "plus2" -> MMap(2, O.plus, vs => if (anyNull(vs)) null else (lv(vs(0)) + lv(vs(1))): Any),
    "times2" -> MMap(2, O.times, vs => if (anyNull(vs)) null else (lv(vs(0)) * lv(vs(1))): Any),
    "inc" -> MMap(1, O.inc, vs => if (anyNull(vs)) null else (lv(vs(0)) + 1L): Any),
    "gt" -> MFilter(2, O.gt, vs => if (anyNull(vs)) null else jb(lv(vs(0)) > lv(vs(1)))),
    "lt" -> MFilter(2, O.lt, vs => if (anyNull(vs)) null else jb(lv(vs(0)) < lv(vs(1)))),
    "even" -> MFilter(1, O.even, vs => if (anyNull(vs)) null else jb(lv(vs(0)) % 2 == 0)),
    "eqv" -> MFilter(2, O.eqv, vs => jb(vs(0) == vs(1))), // null-safe, never unknown
    "notNull" -> MFilter(1, O.notNull, vs => jb(vs(0) != null)),
    // trapped op: throws on even inputs (diverted at the planner's
    // pre-aggregation trap point), passes x+1 otherwise; null input
    // skips the primitive-typed UDF (null result, NO error — the row
    // survives with a null output and no null filter, skipNullFilter
    // semantics). The model mirrors via the (value, err) pair protocol.
    "trapOdd" -> MMap(1,
      graft.operators.Trap.trapFn((x: Long) =>
        if (x % 2 == 0) throw new IllegalArgumentException(s"even $x")
        else x + 1L),
      vs =>
        if (vs(0) == null) (null, null)
        else if (lv(vs(0)) % 2 == 0) (null, "err")
        else ((lv(vs(0)) + 1L): Any, null)),
    "dup2" -> MMapcat(1, ColumnMapcat(1, cs => F.array_repeat(cs.head, 2)),
      vs => Seq(vs(0), vs(0))),
    "seqTo" -> MMapcat(1, ColumnMapcat(1, cs => F.sequence(F.lit(0L), cs.head)),
      vs =>
        if (vs(0) == null) Seq.empty
        else {
          val x = lv(vs(0))
          (if (x >= 0) 0L to x else 0L to x by -1).map(v => v: Any)
        })
  )

  /** Sequential-fold sum (aggregatefn path): order-independent, same
    * result contract as `sum` but executed through the sorted-group
    * streaming pass and the unit-join re-assembly. */
  private val seqSum: SeqAggOp =
    O.aggregateFn[(Long, Long)](1, Seq(LongType))((0L, 0L))((acc, row) =>
      row.head match {
        case null => acc
        case x => (acc._1 + 1L, acc._2 + x.asInstanceOf[Long])
      })(acc => Seq(if (acc._1 == 0L) null else acc._2))

  private def sumModel(rows: Seq[Seq[Any]]): Any = {
    val vs = rows.map(_.head).filter(_ != null)
    if (vs.isEmpty) null else (vs.map(lv).sum: Any)
  }

  val aggOps: Map[String, MAgg] = Map(
    "count" -> MAgg(0, O.count, isSeq = false, rows => rows.size.toLong),
    "sum" -> MAgg(1, O.sum, isSeq = false, sumModel),
    "min" -> MAgg(1, O.min, isSeq = false, rows => {
      val vs = rows.map(_.head).filter(_ != null)
      if (vs.isEmpty) null else (vs.map(lv).min: Any)
    }),
    "max" -> MAgg(1, O.max, isSeq = false, rows => {
      val vs = rows.map(_.head).filter(_ != null)
      if (vs.isEmpty) null else (vs.map(lv).max: Any)
    }),
    "ncount" -> MAgg(1, O.countNotNull, isSeq = false,
      rows => rows.count(_.head != null).toLong),
    "dcount" -> MAgg(1, O.distinctCount, isSeq = false,
      rows => rows.map(_.head).filter(_ != null).distinct.size.toLong),
    "ssum" -> MAgg(1, seqSum, isSeq = true, sumModel)
  )

  // --------------------------------------------------- Spark query builder

  private def schemaFor(arity: Int): StructType =
    StructType((0 until arity).map(i => StructField(s"c$i", LongType, nullable = true)))

  def toDF(spark: SparkSession, g: GenSpec): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    g.rows.foreach(r => rows.add(Row.fromSeq(r)))
    spark.createDataFrame(rows, schemaFor(g.fields.length))
  }

  /** Deterministic value ordering shared by the fuzz buffer and the
    * model: asc = nulls first (Spark asc default), desc = nulls last
    * (Spark desc default). */
  def sortVals(vs: Seq[Any], desc: Boolean): Vector[Any] = {
    val (nulls, nonNull) = vs.partition(_ == null)
    val sorted = nonNull.map(_.asInstanceOf[Long]).sorted
    if (desc) (sorted.reverse.map(v => v: Any) ++ nulls).toVector
    else (nulls ++ sorted.map(v => v: Any)).toVector
  }

  /** "buf" — an order-INSENSITIVE whole-group buffer (sorts its input
    * values internally, nulls first), so its output is deterministic
    * regardless of arrival order while still exercising the
    * bufferAggregate streaming machinery end to end.
    * "lim-variant-n" — the limit family over a single passthrough
    * column (output multiset deterministic under rank ties because tied
    * rows carry equal values). */
  private def buildAggOp(name: String): Op = name match {
    case "buf" =>
      graft.ops.Ops.bufferFn(1, Seq(LongType)) { it =>
        sortVals(it.map(_.head).toVector, desc = false).map(v => Seq(v)).iterator
      }
    case n if n.startsWith("lim-") =>
      val Array(_, variant, k) = n.split("-")
      val kk = k.toInt
      variant match {
        case "plain" => graft.ops.Ops.limit(kk)
        case "rank" => graft.ops.Ops.limitRank(kk)
        case "salt" => graft.ops.Ops.limitSalted(kk, salt = 4)
        case "heap" => graft.ops.Ops.limitHeap(kk)
        case "rankheap" => graft.ops.Ops.limitRankHeap(kk)
        case other => sys.error(other)
      }
    case n => aggOps(n).spark
  }

  def toGenPred(g: GenLike): GenPred = g match {
    case gs: GenSpec =>
      GenPred(s => toDF(s, gs), gs.fields, small = gs.small, uniqueSets = gs.uniqueKeys)
    case ms: MergeSpec =>
      val preds = ms.subs.map(toGenPred)
      if (ms.dedupe) dsl.union(preds: _*) else dsl.combine(preds: _*)
    case ns: NestedSpec =>
      GenPred(s => toQuery(ns.q).toDF(s), ns.fields, small = ns.small)
    case ws: WrapSpec =>
      if (ws.mode == 1) dsl.checkpointed(toGenPred(ws.inner))
      else dsl.cached(toGenPred(ws.inner))
    case is: IntersectSpec =>
      val (pa, pb) = (toGenPred(is.a), toGenPred(is.b))
      if (is.except) dsl.except(pa, pb) else dsl.intersect(pa, pb)
  }

  def toQuery(q: QSpec): Query = {
    val gens: Seq[Pred] = q.gens.map(toGenPred)
    val exs: Seq[Pred] = q.exs.map(e =>
      ExistsPred(GenPred(s => toDF(s, e.gen), e.gen.fields, small = e.gen.small), e.flag))
    def sparkOp(name: String): Op = scalarOps(name) match {
      case MMap(_, op, _) => op
      case MFilter(_, op, _) => op
      case MMapcat(_, op, _) => op
      case _ => sys.error(name)
    }
    val ops: Seq[Pred] = q.ops.map(o => OpPred(sparkOp(o.name), o.in, o.out))
    val aggs: Seq[Pred] = q.aggs.map(o => OpPred(buildAggOp(o.name), o.in, o.out))
    Query(q.out, gens ++ exs ++ ops ++ aggs,
      QueryOptions(sort = q.sort, reverse = q.reverse, distinct = q.distinct))
  }

  // ------------------------------------------------ predmacro pull-through

  private val pmFresh = new java.util.concurrent.atomic.AtomicLong(0)

  /** Sigil-preserving fresh name — the hygiene rename a macro applies to
    * its internal vars. Trap vars keep the reserved prefix (the planner
    * recognizes trapped ops BY the var name, Vars.TrapPrefix). */
  private def freshLike(v: String): String = {
    val n = pmFresh.incrementAndGet()
    if (Vars.isTrapVar(v)) s"${Vars.TrapPrefix}Pm$n"
    else if (v.startsWith("!!")) s"!!__pm$n"
    else if (v.startsWith("!")) s"!__pm$n"
    else s"?__pm$n"
  }

  private def opFor(name: String): Op =
    if (scalarOps.contains(name)) scalarOps(name) match {
      case MMap(_, op, _) => op
      case MFilter(_, op, _) => op
      case MMapcat(_, op, _) => op
      case _ => sys.error(name)
    } else buildAggOp(name)

  /** [[toQuery]] with the op/agg predicates at `wrap` indices (into
    * `q.ops ++ q.aggs`) pulled through a SYNTHETIC predicate macro:
    * macro params are the slice's externally-visible vars, internal
    * vars are hygienically renamed at expansion time, and with `nest`
    * the slice's second half expands through a SECOND macro level
    * (recursive expansion, logic/parse.clj:94-102). Expansion is pure
    * AST→AST, so the result must be output-identical to [[toQuery]] —
    * any divergence is an expansion/hygiene bug. */
  def toQueryWithMacro(q: QSpec, wrap: Set[Int], nest: Boolean): Query = {
    import graft.dsl.{MacroCall, PredMacro, PredOf, PredLike}
    val all = q.ops ++ q.aggs
    val inside = all.zipWithIndex.collect { case (o, i) if wrap(i) => o }
    val outside = all.zipWithIndex.collect { case (o, i) if !wrap(i) => o }
    def vars(xs: Seq[Any]): Seq[String] = xs.collect {
      case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => v
    }
    val externalVars: Set[String] =
      (vars(outside.flatMap(o => o.in ++ o.out)) ++
        vars(q.gens.flatMap(_.outerFields)) ++
        vars(q.exs.flatMap(e => e.gen.fields :+ e.flag)) ++
        vars(q.out) ++ q.sort).toSet
    val insideVars = vars(inside.flatMap(o => o.in ++ o.out)).distinct
    val macroIns = vars(inside.flatMap(_.in)).distinct.filter(externalVars)
    val macroOuts = vars(inside.flatMap(_.out)).distinct.filter(externalVars)

    def predOf(o: OpSpec, sub: Map[String, String]): PredLike = {
      def s(x: Any): Any = x match {
        case v: String if sub.contains(v) => sub(v)
        case other => other
      }
      PredOf(OpPred(opFor(o.name), o.in.map(s), o.out.map(s)))
    }

    val m: PredMacro = (inActual, outActual) => {
      val paramSub = (macroIns.zip(inActual.map(_.toString)) ++
        macroOuts.zip(outActual.map(_.toString))).toMap
      val sub = paramSub ++ insideVars.filterNot(externalVars)
        .map(v => v -> freshLike(v)).toMap
      if (nest && inside.size >= 2) {
        val (a, b) = inside.splitAt(inside.size / 2)
        // second level: b's (already-substituted) vars pass through a
        // nested MacroCall as identity params — exercises recursion
        val bVars = vars(b.flatMap(o => o.in ++ o.out)).distinct.map(sub)
        val inner: PredMacro = (_, _) => b.map(predOf(_, sub))
        a.map(predOf(_, sub)) :+ MacroCall(inner, bVars, Nil)
      } else inside.map(predOf(_, sub))
    }

    val gens: Seq[PredLike] = q.gens.map(g => PredOf(toGenPred(g)))
    val exs: Seq[PredLike] = q.exs.map(e => PredOf(
      ExistsPred(GenPred(s => toDF(s, e.gen), e.gen.fields, small = e.gen.small), e.flag)))
    val outsidePreds: Seq[PredLike] = outside.map(predOf(_, Map.empty))
    graft.dsl.query(q.out: _*)(
      (gens ++ exs ++ outsidePreds :+ MacroCall(m, macroIns, macroOuts)): _*)
      .withOptions(QueryOptions(sort = q.sort, reverse = q.reverse,
        distinct = q.distinct))
  }

  // --------------------------------------------- brute-force tuple evaluator

  final case class Unplannable(msg: String) extends Exception(msg)

  final case class MTail(rows: Seq[Map[String, Any]], fields: Vector[String],
      groundOverride: Option[Boolean] = None) {
    def isGround: Boolean = groundOverride.getOrElse(fields.forall(Vars.isGroundVar))
  }

  /** null-safe equality (`<=>`): null == null, boxed values by equals. */
  private def nse(a: Any, b: Any): Boolean = a == b

  def modelRun(q: QSpec): Either[String, Seq[Seq[Any]]] =
    try Right(modelEval(q)) catch {
      case Unplannable(m) => Left(m)
    }

  private def modelEval(q: QSpec): Seq[Seq[Any]] = {
    def outVars(o: OpSpec) = o.out.collect { case v: String if Vars.isVar(v) => v }
    def inVars(o: OpSpec) = o.in.collect { case v: String if Vars.isVar(v) => v }

    // ungrounding-var validation (parse.clj:113-129): springs from exactly
    // one generator, never an op output, never in a generator-as-set
    // (merge/wrap/nested generators expose their OUTER fields here —
    // sub-pattern and inner-query vars are renamed/projected away)
    q.gens.flatMap(_.outerFields).collect { case v: String if Vars.isUnground(v) => v }
      .groupBy(identity).foreach { case (v, occ) =>
        if (occ.size > 1) throw Unplannable(s"ungrounding var $v in multiple generators")
      }
    (q.ops ++ q.aggs).foreach(_.out.foreach {
      case v: String if Vars.isUnground(v) =>
        throw Unplannable(s"ungrounding var $v from an operation")
      case _ => ()
    })
    q.exs.foreach(e => (e.gen.fields :+ e.flag).foreach {
      case v: String if Vars.isUnground(v) =>
        throw Unplannable(s"ungrounding var $v in a generator-as-set")
      case _ => ()
    })

    // dead-op pruning (mirrors Planner.compile / parse.clj:640-682),
    // disabled wholesale when any predicate has zero inputs
    val kept: Vector[OpSpec] =
      if ((q.ops ++ q.aggs).exists(_.in.isEmpty)) q.ops
      else {
        def effectful(o: OpSpec): Boolean =
          o.out.isEmpty || o.out.exists {
            case v: String if Vars.isVar(v) => Vars.isTrapVar(v)
            case _ => true // constant in output = implicit filter
          }
        val dupOut = (q.ops ++ q.aggs).flatMap(outVars).groupBy(identity)
          .collect { case (v, occ) if occ.size > 1 => v }.toSet
        val base: Set[String] =
          q.out.collect { case v: String if Vars.isVar(v) => v }.toSet ++
            q.gens.flatMap(_.outerFields).collect { case v: String if Vars.isVar(v) => v } ++
            q.exs.flatMap(e => e.gen.fields :+ e.flag)
              .collect { case v: String if Vars.isVar(v) => v } ++
            q.ops.filter(_.out.isEmpty).flatMap(inVars) ++
            q.aggs.flatMap(inVars) ++ dupOut ++
            q.sort // :sort fields must exist at the grouping, so their producers are live
        var keptNow = q.ops
        var stable = false
        while (!stable) {
          val necessary = base ++ keptNow.flatMap(inVars)
          val next = q.ops.filter(o => effectful(o) || outVars(o).exists(necessary))
          stable = next == keptNow
          keptNow = next
        }
        keptNow
      }

    val ops = mutable.ArrayBuffer(kept: _*)

    // 1. bind generators, per-tail fixed point
    var tails = mutable.ArrayBuffer(q.gens.map(bindGenLike): _*)
    tails = tails.map(t => fixedPoint(t, ops))

    // 2. greedy maximal-shared-vars merge with the joinable? restriction
    def joinable(t: MTail, jf: Set[String]): Boolean =
      jf.subsetOf(t.fields.toSet) &&
        (t.isGround || t.fields.filterNot(jf).forall(Vars.isUnground))
    while (tails.size > 1) {
      val pairs = for { i <- tails.indices; j <- tails.indices if i < j }
        yield (i, j, tails(i).fields.toSet.intersect(tails(j).fields.toSet))
      val candidates = pairs.filter { case (i, j, s) =>
        s.nonEmpty && joinable(tails(i), s) && joinable(tails(j), s)
      }
      val (i, j, shared) =
        if (candidates.nonEmpty) candidates.maxBy(_._3.size)
        else pairs.find { case (a, b, s) =>
          s.isEmpty && tails(a).isGround && tails(b).isGround
        }.getOrElse(throw Unplannable("unable to join predicates together"))
      val joined = joinPair(tails(i), tails(j), shared.toVector.sorted)
      val rest = tails.zipWithIndex.collect { case (t, k) if k != i && k != j => t }
      tails = mutable.ArrayBuffer(fixedPoint(joined, ops)) ++ rest
    }
    var t0 = tails.head

    // 3. existence joins, then ops that needed them
    q.exs.foreach { e => t0 = applyExists(t0, e) }
    t0 = fixedPoint(t0, ops)

    // 3.5 trap diversion: rows with any non-null trap var are diverted
    // (dropped — the fuzz runs with no trap sink) BEFORE aggregation
    val trapFields = t0.fields.filter(Vars.isTrapVar)
    if (trapFields.nonEmpty) {
      t0 = MTail(
        t0.rows.filter(r => trapFields.forall(v => r(v) == null))
          .map(r => r -- trapFields),
        t0.fields.filterNot(trapFields.contains), t0.groundOverride)
    }

    // 4. grouping/aggregation, then ops over aggregator outputs
    if (q.aggs.nonEmpty) {
      t0 = aggregate(t0, q.aggs, q)
      t0 = fixedPoint(t0, ops)
    }

    if (ops.nonEmpty) throw Unplannable("ops with unsatisfiable inputs")

    // 5. final projection (+ distinct when no aggregators)
    q.out.foreach {
      case v: String if Vars.isVar(v) =>
        if (!t0.fields.contains(v)) throw Unplannable(s"output var $v is not bound")
      case _ => ()
    }
    var rows = t0.rows.map(r => q.out.map {
      case v: String if Vars.isVar(v) => r(v)
      case c => c
    }: Seq[Any])
    if (q.distinct && q.aggs.isEmpty) rows = rows.distinct
    rows
  }

  private def bindGenLike(g: GenLike): MTail = g match {
    case gs: GenSpec => bindGen(gs)
    case ms: MergeSpec =>
      // each sub binds its own pattern; rows merge positionally under
      // the head's bound names; dedupe = distinct on the bound tuple;
      // the planner then re-binds the merged generator over those names
      // (re-applying `?` null filters to rows another sub let through)
      val bound = ms.subs.map(bindGen)
      val h = boundVarsOf(ms.subs.head.fields)
      bound.foreach(b =>
        if (b.fields.length != h.length)
          throw Unplannable("combine bound-arity mismatch"))
      var tuples = bound.flatMap(b => b.rows.map(r => b.fields.map(r(_))))
      if (ms.dedupe) tuples = tuples.distinct
      bindGen(GenSpec(h.map(v => v: Any), tuples.map(_.toVector), small = false))
    case ns: NestedSpec =>
      bindGen(GenSpec(ns.fields, modelEval(ns.q).map(_.toVector), small = ns.small))
    case ws: WrapSpec =>
      // checkpoint/cache are output-invisible; re-binding the bound-var
      // projection is idempotent (null filters already applied)
      bindGenLike(ws.inner)
    case is: IntersectSpec =>
      // SQL set-op: distinct tuples, null-safe equality, positional
      val a = bindGenLike(is.a)
      val b = bindGenLike(is.b)
      if (a.fields.length != b.fields.length)
        throw Unplannable("set-op bound-arity mismatch")
      val at = a.rows.map(r => a.fields.map(r(_))).distinct
      val bt = b.rows.map(r => b.fields.map(r(_))).toSet
      val tuples = if (is.except) at.filterNot(bt) else at.filter(bt)
      bindGen(GenSpec(boundVarsOf(is.a.outerFields).map(v => v: Any),
        tuples.map(_.toVector), small = false))
  }

  private def bindGen(g: GenSpec): MTail = {
    val first = mutable.LinkedHashMap[String, Int]()
    val constFilters = mutable.ArrayBuffer[(Int, Any)]()
    val dupFilters = mutable.ArrayBuffer[(Int, Int)]()
    g.fields.zipWithIndex.foreach { case (item, i) =>
      item match {
        case w: String if Vars.isWildcard(w) => ()
        case v: String if Vars.isVar(v) =>
          first.get(v) match {
            case Some(i0) => dupFilters += ((i, i0))
            case None => first(v) = i
          }
        case c => constFilters += ((i, c))
      }
    }
    val rows = g.rows.filter { r =>
      dupFilters.forall { case (i, i0) => nse(r(i), r(i0)) } &&
        constFilters.forall { case (i, c) => nse(r(i), c) }
    }
    val bound = first.keys.toVector
    var out = rows.map(r => first.map { case (v, i) => v -> r(i) }.toMap)
    bound.filter(Vars.isNonNullable).foreach { v =>
      out = out.filter(_(v) != null)
    }
    MTail(out, bound)
  }

  private def ready(t: MTail, o: OpSpec): Boolean = o.in.forall {
    case v: String if Vars.isVar(v) => t.fields.contains(v)
    case _ => true
  }

  private def isPlainFilter(o: OpSpec): Boolean =
    scalarOps(o.name).isInstanceOf[MFilter] && o.out.isEmpty

  private def fixedPoint(t0: MTail, ops: mutable.ArrayBuffer[OpSpec]): MTail = {
    var t = t0
    var progress = true
    while (progress) {
      progress = false
      val rdy = ops.filter(o => ready(t, o)).sortBy(o => if (isPlainFilter(o)) 0 else 1)
      rdy.headOption.foreach { o =>
        t = applyOp(t, o)
        ops -= o
        progress = true
      }
    }
    t
  }

  private def inVals(r: Map[String, Any], in: Seq[Any]): Seq[Any] = in.map {
    case v: String if Vars.isVar(v) => r(v)
    case c => c
  }

  /** bindOutputs semantics: wildcards discarded, fresh vars bind (`?` gets
    * a null filter — skipped for trapped ops, whose failed rows must
    * survive to the diversion point), bound vars / constants become
    * `<=>` filters. */
  private def bindOut(t: MTail, rowsWithVals: Seq[(Map[String, Any], Seq[Any])],
      outs: Seq[Any], skipNullFilter: Boolean = false): MTail = {
    var fields = t.fields
    var rows = rowsWithVals
    outs.zipWithIndex.foreach { case (o, k) =>
      o match {
        case w: String if Vars.isWildcard(w) => ()
        case v: String if Vars.isVar(v) && !fields.contains(v) =>
          rows = rows.map { case (r, vals) => (r + (v -> vals(k)), vals) }
          if (Vars.isNonNullable(v) && !skipNullFilter)
            rows = rows.filter(_._1(v) != null)
          fields :+= v
        case v: String if Vars.isVar(v) =>
          rows = rows.filter { case (r, vals) => nse(r(v), vals(k)) }
        case c =>
          rows = rows.filter { case (_, vals) => nse(vals(k), c) }
      }
    }
    MTail(rows.map(_._1), fields, t.groundOverride)
  }

  private def applyOp(t: MTail, o: OpSpec): MTail = scalarOps(o.name) match {
    case MMap(_, _, f) if o.out.isEmpty =>
      // mapop-as-filter truthiness: non-boolean results are truthy iff
      // non-null (our map catalog is all Long-valued)
      MTail(t.rows.filter(r => f(inVals(r, o.in)) != null), t.fields, t.groundOverride)
    case MMap(_, _, f) if o.out.exists {
        case s: String => Vars.isTrapVar(s); case _ => false } =>
      // trapped op: model fn returns (value, error); failed rows survive
      // binding (skipNullFilter) until the pre-aggregation diversion
      bindOut(t, t.rows.map { r =>
        val (v, e) = f(inVals(r, o.in)).asInstanceOf[(Any, Any)]
        (r, Seq(v, e))
      }, o.out, skipNullFilter = true)
    case MMap(_, _, f) =>
      bindOut(t, t.rows.map(r => (r, Seq(f(inVals(r, o.in))))), o.out)
    case MFilter(_, _, f) if o.out.isEmpty =>
      MTail(t.rows.filter { r =>
        val b = f(inVals(r, o.in)); b != null && b.booleanValue
      }, t.fields, t.groundOverride)
    case MFilter(_, _, f) =>
      bindOut(t, t.rows.map(r => (r, Seq(f(inVals(r, o.in)): Any))), o.out)
    case MMapcat(_, _, f) =>
      val expanded = t.rows.flatMap(r =>
        f(inVals(r, o.in)).map(e => (r, Seq(e))))
      bindOut(t, expanded, o.out)
    case _: MAgg => throw Unplannable(s"aggregator ${o.name} as scalar op")
  }

  /** Binary join: null-unsafe key equality (SQL join semantics — null keys
    * never match), join type from OR-groundness, using-columns key
    * coalescing (unmatched right rows keep their own key values). */
  private def joinPair(lt: MTail, rt: MTail, shared: Vector[String]): MTail = {
    val ground = Some(lt.isGround || rt.isGround)
    if (shared.isEmpty)
      return MTail(for { a <- lt.rows; b <- rt.rows } yield a ++ b,
        lt.fields ++ rt.fields, ground)
    def keyMatch(a: Map[String, Any], b: Map[String, Any]): Boolean =
      shared.forall(v => a(v) != null && b(v) != null && a(v) == b(v))
    val rOnly = rt.fields.filterNot(shared.contains)
    val lOnly = lt.fields.filterNot(shared.contains)
    val matches = for { a <- lt.rows; b <- rt.rows if keyMatch(a, b) }
      yield a ++ rOnly.map(v => v -> b(v)).toMap
    lazy val lUn = lt.rows.filter(a => !rt.rows.exists(b => keyMatch(a, b)))
      .map(a => a ++ rOnly.map(v => v -> (null: Any)).toMap)
    lazy val rUn = rt.rows.filter(b => !lt.rows.exists(a => keyMatch(a, b)))
      .map(b => lOnly.map(v => v -> (null: Any)).toMap ++ b)
    val rows = (lt.isGround, rt.isGround) match {
      case (true, true) => matches
      case (true, false) => matches ++ lUn
      case (false, true) => matches ++ rUn
      case (false, false) => matches ++ lUn ++ rUn
    }
    MTail(rows, lt.fields ++ rOnly, ground)
  }

  private def applyExists(t: MTail, e: ExistsSpec): MTail = {
    val g = bindGen(e.gen)
    val shared = t.fields.filter(g.fields.contains)
    if (shared.isEmpty) throw Unplannable("existence predicate shares no vars with the query")
    def m(a: Map[String, Any]): Boolean =
      g.rows.exists(b => shared.forall(v => a(v) != null && b(v) != null && a(v) == b(v)))
    e.flag match {
      case true => MTail(t.rows.filter(m), t.fields, t.groundOverride)
      case false => MTail(t.rows.filterNot(m), t.fields, t.groundOverride)
      case v: String if Vars.isVar(v) =>
        MTail(t.rows.map(r => r + (v -> (m(r): Any))), t.fields :+ v, t.groundOverride)
      case other => throw Unplannable(s"bad existence flag: $other")
    }
  }

  /** Grouping node: group by the out-fields vars that survive to the tail
    * and are not aggregator outputs (null-safe grouping). ColumnAggs run
    * as one unit (global agg on empty input = one row); each sequential
    * fold is its own unit (streaming pass: empty input = no rows); units
    * re-join on the group keys with `<=>`. */
  private def aggregate(t: MTail, aggs: Vector[OpSpec], q: QSpec): MTail = {
    val aggOutVars = aggs.flatMap(_.out).collect {
      case v: String if Vars.isVar(v) => v
    }.toSet
    val groupVars = q.out.collect {
      case v: String if Vars.isVar(v) && t.fields.contains(v) && !aggOutVars(v) => v
    }.distinct.toVector

    def groupsOf(alwaysGlobalRow: Boolean): Seq[(Vector[Any], Seq[Map[String, Any]])] =
      if (groupVars.isEmpty) {
        if (t.rows.isEmpty && !alwaysGlobalRow) Seq.empty
        else Seq((Vector.empty, t.rows))
      } else t.rows.groupBy(r => groupVars.map(r(_))).toSeq

    // buffer mode: the single whole-group buffer streams each group
    // (the fuzz buffer sorts internally, so arrival order is moot)
    if (aggs.head.name == "buf") {
      val o = aggs.head
      val withVals = groupsOf(alwaysGlobalRow = false).flatMap { case (k, rs) =>
        val km = groupVars.zip(k).toMap
        sortVals(rs.map(r => inVals(r, o.in).head), desc = false)
          .map(v => (km, Seq(v): Seq[Any]))
      }
      return bindOut(MTail(Nil, groupVars), withVals, o.out)
    }
    // limit mode: per-group top-n of the single passthrough column,
    // ordered by it (asc nulls-first / desc nulls-last per :reverse);
    // the engine tail keeps every pre-agg field, but only group vars and
    // bound outs are observable through the projection (the spec builder
    // restricts limit outs to fresh vars), so the model carries just those
    if (aggs.head.name.startsWith("lim-")) {
      val o = aggs.head
      val Array(_, variant, kStr) = o.name.split("-")
      val n = kStr.toInt
      val withRank = variant == "rank" || variant == "rankheap"
      val desc = q.reverse && q.sort.nonEmpty
      val withVals = groupsOf(alwaysGlobalRow = false).flatMap { case (k, rs) =>
        val km = groupVars.zip(k).toMap
        sortVals(rs.map(r => inVals(r, o.in).head), desc).take(n).zipWithIndex
          .map { case (v, i) =>
            (km, (Seq(v) ++ (if (withRank) Seq((i + 1).toLong: Any) else Nil)): Seq[Any])
          }
      }
      return bindOut(MTail(Nil, groupVars), withVals, o.out)
    }

    val (seqAggs, colAggs) = aggs.partition(a => aggOps(a.name).isSeq)

    def evalColUnit(us: Seq[OpSpec]): (Seq[Map[String, Any]], Vector[String]) = {
      var fields = groupVars
      val rows = groupsOf(alwaysGlobalRow = true).flatMap { case (k, rs) =>
        var m = groupVars.zip(k).toMap
        var keep = true
        us.foreach { o =>
          val value = aggOps(o.name).model(rs.map(r => inVals(r, o.in)))
          o.out.head match {
            case w: String if Vars.isWildcard(w) => ()
            case v: String if Vars.isVar(v) => m += (v -> value)
            case c => if (!nse(value, c)) keep = false
          }
        }
        if (keep) Some(m) else None
      }
      us.foreach(_.out.head match {
        case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => fields :+= v
        case _ => ()
      })
      (rows, fields)
    }

    def evalSeqUnit(o: OpSpec): (Seq[Map[String, Any]], Vector[String]) = {
      val withVals = groupsOf(alwaysGlobalRow = false).map { case (k, rs) =>
        (groupVars.zip(k).toMap,
          Seq(aggOps(o.name).model(rs.map(r => inVals(r, o.in)))))
      }
      val bound = bindOut(MTail(Nil, groupVars), withVals, o.out)
      (bound.rows, bound.fields)
    }

    val units: Seq[(Seq[Map[String, Any]], Vector[String])] =
      (if (colAggs.nonEmpty) Seq(evalColUnit(colAggs)) else Nil) ++
        seqAggs.map(evalSeqUnit)

    val (rows, fields) = units.reduce { (a, b) =>
      if (groupVars.isEmpty)
        (for { x <- a._1; y <- b._1 } yield x ++ y, a._2 ++ b._2)
      else {
        val bOnly = b._2.filterNot(groupVars.contains)
        (for { x <- a._1; y <- b._1 if groupVars.forall(v => nse(x(v), y(v))) }
          yield x ++ bOnly.map(v => v -> y(v)).toMap,
          a._2 ++ bOnly)
      }
    }
    MTail(rows, fields)
  }

}
