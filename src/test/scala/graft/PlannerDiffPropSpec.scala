package graft

import graft.logic.Vars
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import scala.util.Random

/** Generative planner-differential fuzzing: random small queries across
  * the semantic cross-product the example corpus only samples —
  * groundness (`?`/`!`/`!!`) × join shape (inner/outer/cross/exists) ×
  * implicit equality (duplicate vars, constants in input and output
  * position) × op timing (pre-join / post-join / post-agg, filters-first,
  * dead-op pruning) × aggregation mix (parallel units, sequential-fold
  * units, HAVING constants) × `:distinct` — each case checked against the
  * brute-force tuple evaluator in [[PlannerFuzz]].
  *
  * Query specs are built imperatively from a scalacheck-provided seed, so
  * every failure reproduces from the printed seed + spec. */
object PlannerDiffPropSpec extends Properties("Planner.differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(500))

  private lazy val spark = SparkTestBase.session

  import PlannerFuzz._

  private val groundPool = Vector("?a", "?b", "?c", "?d")
  private val nullablePool = Vector("!m", "!n")
  private val ungroundPool = Vector("!!u", "!!v")
  private val mapOutPool = Vector("?p", "?q", "!w")
  private val boolOutPool = Vector("?f1", "!f2")
  private val aggOutPool = Vector("?x1", "?x2", "!x3")
  private val flagPool = Vector("?e1", "!e2")

  private val mapNames = Vector("plus2", "times2", "inc", "dup2", "seqTo")
  private val filterNames = Vector("gt", "lt", "even", "eqv", "notNull")
  private val aggNames = Vector("count", "sum", "min", "max", "ncount", "dcount", "ssum")

  def buildSpec(r: Random): QSpec = buildSpec(r, depth = 0, longOnly = false)

  /** `depth` bounds generator nesting (nested subqueries and merges only
    * at depth 0); `longOnly` restricts the output list to Long-valued
    * items so a nested query's relation binds into the outer query's
    * all-Long op catalog. */
  private def buildSpec(r: Random, depth: Int, longOnly: Boolean): QSpec = {
    def pick[T](xs: Seq[T]): T = xs(r.nextInt(xs.size))

    // --- generators
    val nGens = 1 + r.nextInt(3)
    var usedUnground = Set.empty[String]
    def buildRawGen(): GenSpec = {
      val arity = 1 + r.nextInt(3)
      val fields = Vector.fill[Any](arity) {
        val d = r.nextInt(20)
        val freeUg = ungroundPool.filterNot(usedUnground)
        if (d < 11) pick(groundPool)
        else if (d < 14) pick(nullablePool)
        else if (d < 16 && freeUg.nonEmpty) {
          val v = pick(freeUg); usedUnground += v; v
        } else if (d < 18) (r.nextInt(3).toLong: Any)
        else "_"
      }
      val rows = Seq.fill(r.nextInt(7))(Vector.fill[Any](arity)(
        if (r.nextInt(10) < 2) null else (r.nextInt(4).toLong: Any)))
      // occasionally declare a sound unique key (distinct values written
      // into the key column) — arms the eager-aggregation rewrite
      val keyCands = fields.zipWithIndex.collect {
        case (v: String, i) if Vars.isVar(v) && !Vars.isWildcard(v) &&
          !Vars.isUnground(v) && fields.count(_ == v) == 1 => (v, i)
      }
      if (keyCands.nonEmpty && r.nextInt(10) < 3) {
        val (v, i) = pick(keyCands)
        GenSpec(fields,
          rows.zipWithIndex.map { case (row, k) => row.updated(i, k.toLong: Any) },
          small = r.nextInt(10) < 3, uniqueKeys = Seq(Set(v)))
      } else GenSpec(fields, rows, small = r.nextInt(10) < 3)
    }
    // a merge sub beyond the head: its own pattern (constants, dups,
    // wildcards, its own null markers) but exactly `k` distinct bound
    // vars so the positional union is well-formed
    def buildMergeSub(k: Int): GenSpec = {
      val varPool = r.shuffle((groundPool ++ nullablePool).toList)
      val vars = varPool.take(k)
      var pat = r.shuffle(
        vars.map(v => v: Any) ++ Vector.fill(r.nextInt(2)) {
          if (r.nextBoolean()) (r.nextInt(3).toLong: Any) else ("_": Any)
        }).toVector
      if (vars.nonEmpty && r.nextInt(10) < 3) pat = pat :+ (pick(vars): Any)
      val rows = Seq.fill(r.nextInt(7))(Vector.fill[Any](pat.length)(
        if (r.nextInt(10) < 2) null else (r.nextInt(4).toLong: Any)))
      GenSpec(pat, rows, small = false)
    }
    def boundArity(g: GenSpec): Int = g.fields.collect {
      case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => v
    }.distinct.size
    def buildGenLike(): GenLike = {
      val d = if (depth == 0) r.nextInt(100) else 100
      if (d < 10) {
        // combine/union merge; head must bind at least one var
        val head = buildRawGen()
        val k = head.fields.collect {
          case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => v
        }.distinct.size
        if (k == 0) head
        else MergeSpec(head +: Vector.fill(1 + r.nextInt(2))(buildMergeSub(k)),
          dedupe = r.nextInt(10) < 4)
      } else if (d < 18) {
        // nested subquery bound under a fresh outer pattern
        val inner = buildSpec(r, depth + 1, longOnly = true)
        val pat = Vector.tabulate[Any](inner.out.length) { _ =>
          val dd = r.nextInt(10)
          if (dd < 6) pick(groundPool)
          else if (dd < 8) pick(nullablePool)
          else if (dd < 9) (r.nextInt(4).toLong: Any)
          else "_"
        }
        NestedSpec(inner, pat, small = r.nextInt(10) < 3)
      } else if (d < 24) {
        // intersect/except set-op against an arity-matched right side,
        // which may itself be a merge (set-op over a union)
        val head = buildRawGen()
        val k = boundArity(head)
        if (k == 0) head
        else {
          val right: GenLike =
            if (r.nextInt(10) < 3)
              MergeSpec(Vector.fill(2)(buildMergeSub(k)), dedupe = r.nextInt(10) < 4)
            else buildMergeSub(k)
          IntersectSpec(head, right, except = r.nextInt(10) < 5)
        }
      } else if (d < 32) {
        // semantics-preserving checkpoint/cache wrapper — over a raw
        // generator, a merge, or a set-op (lineage truncation must be
        // output-invisible for every generator shape)
        val inner: GenLike = r.nextInt(10) match {
          case 0 | 1 =>
            val head = buildRawGen()
            val k = boundArity(head)
            if (k == 0) head
            else MergeSpec(head +: Vector(buildMergeSub(k)), dedupe = r.nextBoolean())
          case 2 =>
            val head = buildRawGen()
            val k = boundArity(head)
            if (k == 0) head
            else IntersectSpec(head, buildMergeSub(k), except = r.nextBoolean())
          case _ => buildRawGen()
        }
        if (inner.outerFields.exists {
            case v: String => Vars.isVar(v) && !Vars.isWildcard(v)
            case _ => false })
          WrapSpec(inner, mode = 1 + r.nextInt(2))
        else inner
      } else buildRawGen()
    }
    val gens = Vector.fill(nGens)(buildGenLike())
    val genVars = gens.flatMap(_.outerFields).collect {
      case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => v
    }.distinct

    // --- scalar ops; inputs from already-bound Long vars (+ constants)
    var longVars = genVars.filterNot(Vars.isWildcard) // all gen vars are Longs
    var boolVars = Vector.empty[String]
    var trapSeq = 0
    val nOps = r.nextInt(3)
    val ops = Vector.fill(nOps) {
      if (longVars.isEmpty) OpSpec("notNull", Vector(pick(groundPool)), Vector.empty)
      else if (r.nextInt(10) < 2) {
        // trapped op: even inputs divert pre-aggregation, odd pass x+1
        trapSeq += 1
        val in = if (r.nextInt(10) < 2) (r.nextInt(4).toLong: Any) else pick(longVars)
        val out = pick(mapOutPool)
        if (!longVars.contains(out)) longVars :+= out
        OpSpec("trapOdd", Vector(in), Vector(out, s"!__trapF$trapSeq"))
      } else {
        def inItem(): Any =
          if (r.nextInt(10) < 2) (r.nextInt(4).toLong: Any) else pick(longVars)
        val name = if (r.nextInt(10) < 6) pick(mapNames) else pick(filterNames)
        scalarOps(name) match {
          case m: MMap =>
            val in = Vector.fill[Any](m.arity)(inItem())
            val out: Vector[Any] = r.nextInt(10) match {
              case 0 | 1 | 2 | 3 | 4 | 5 =>
                val v = pick(mapOutPool)
                if (!longVars.contains(v)) longVars :+= v
                Vector(v)
              case 6 => Vector(pick(longVars)) // implicit equality
              case 7 => Vector(r.nextInt(4).toLong: Any) // constant guard
              case 8 => Vector("_")
              case _ => Vector.empty // truthiness filter
            }
            OpSpec(name, in, out)
          case mc: MMapcat =>
            val in = Vector.fill[Any](mc.arity)(inItem())
            val out: Vector[Any] = r.nextInt(10) match {
              case 0 | 1 | 2 | 3 | 4 | 5 | 6 =>
                val v = pick(mapOutPool)
                if (!longVars.contains(v)) longVars :+= v
                Vector(v)
              case 7 => Vector(pick(longVars))
              case 8 => Vector(r.nextInt(4).toLong: Any)
              case _ => Vector("_")
            }
            OpSpec(name, in, out)
          case f: MFilter =>
            val in = Vector.fill[Any](f.arity)(inItem())
            val out: Vector[Any] =
              if (r.nextInt(10) < 7) Vector.empty
              else {
                val v = pick(boolOutPool)
                if (!boolVars.contains(v)) boolVars :+= v
                Vector(v)
              }
            OpSpec(name, in, out)
          case _ => sys.error(name)
        }
      }
    }

    // --- aggregators: none / column+sequential mix / single buffer /
    // single limit-family op (buffer-exclusive per the planner rules)
    var usedAggOuts = Vector.empty[String]
    val aggMode =
      if (longVars.isEmpty) 0
      else r.nextInt(100) match {
        case d if d < 55 => 0 // none
        case d if d < 80 => 1 // col/seq mix
        case d if d < 90 => 2 // buffer
        case _ => 3 // limit family
      }
    var sortVar: Option[String] = None
    var sortRev = false
    val nAggs = if (aggMode == 1) 1 + r.nextInt(2) else 0
    val bufAggs: Vector[OpSpec] =
      if (aggMode == 2) {
        val in = pick(longVars)
        val out = pick(aggOutPool)
        usedAggOuts :+= out
        if (r.nextInt(10) < 4) { sortVar = Some(pick(longVars)); sortRev = r.nextInt(10) < 3 }
        Vector(OpSpec("buf", Vector(in), Vector(out)))
      } else if (aggMode == 3) {
        val in = pick(longVars)
        val variant = pick(Seq("plain", "rank", "salt", "heap", "rankheap"))
        val n = 1 + r.nextInt(3)
        val outs: Vector[Any] =
          if (variant == "rank" || variant == "rankheap") {
            val Seq(a, b) = aggOutPool.take(2).toSeq
            usedAggOuts ++= Seq(a, b); Vector(a, b)
          } else {
            val v = pick(aggOutPool); usedAggOuts :+= v; Vector(v)
          }
        // sort, when present, must be the passthrough column itself so
        // rank ties carry equal values (deterministic output multiset)
        if (r.nextInt(10) < 6) { sortVar = Some(in); sortRev = r.nextInt(10) < 4 }
        Vector(OpSpec(s"lim-$variant-$n", Vector(in), outs))
      } else Vector.empty
    val aggs = bufAggs ++ Vector.fill(nAggs) {
      val name = pick(aggNames)
      val arity = aggOps(name).arity
      val in = Vector.fill[Any](arity)(
        if (r.nextInt(10) < 1) (r.nextInt(4).toLong: Any) else pick(longVars))
      val freshOuts = aggOutPool.filterNot(usedAggOuts.contains)
      val rebindable = genVars.filterNot(usedAggOuts.contains)
      val out: Vector[Any] =
        if (r.nextInt(10) < 2) Vector(r.nextInt(4).toLong: Any) // HAVING
        else if (r.nextInt(10) < 2 && rebindable.nonEmpty)
          Vector(pick(rebindable)) // rebind a gen var as the agg output
        else if (freshOuts.nonEmpty) Vector(pick(freshOuts))
        else Vector(r.nextInt(4).toLong: Any)
      out.foreach { case v: String if Vars.isVar(v) => usedAggOuts :+= v; case _ => () }
      OpSpec(name, in, out)
    }
    val aggOutVars = aggs.flatMap(_.out).collect {
      case v: String if Vars.isVar(v) => v
    }

    // post-agg scalar op over an aggregator output, occasionally
    val postAggOps =
      if (aggOutVars.nonEmpty && r.nextInt(10) < 3) {
        val v = aggOutVars(r.nextInt(aggOutVars.size))
        val ov = pick(mapOutPool.filterNot(aggOutVars.contains))
        Vector(OpSpec("inc", Vector(v), Vector(ov)))
      } else Vector.empty
    val postAggOutVars = postAggOps.flatMap(_.out).collect {
      case v: String if Vars.isVar(v) => v
    }

    // --- existence predicates
    var flagVars = Vector.empty[String]
    val exs =
      if (r.nextInt(10) < 3 && genVars.nonEmpty) {
        val arity = 1 + r.nextInt(2)
        val groundGenVars = genVars.filterNot(Vars.isUnground)
        val fields = Vector.fill[Any](arity) {
          val d = r.nextInt(10)
          if (d < 6 && groundGenVars.nonEmpty) pick(groundGenVars)
          else if (d < 8) pick(groundPool)
          else (r.nextInt(3).toLong: Any)
        }
        val rows = Seq.fill(r.nextInt(5))(Vector.fill[Any](arity)(
          if (r.nextInt(10) < 2) null else (r.nextInt(4).toLong: Any)))
        val flag: Any = r.nextInt(3) match {
          case 0 => true
          case 1 => false
          case _ => val v = pick(flagPool); flagVars :+= v; v
        }
        Vector(ExistsSpec(GenSpec(fields, rows, small = r.nextInt(10) < 3), flag))
      } else Vector.empty

    // --- output fields (Long-valued only when this is a nested query —
    // the outer query's op catalog is all-Long)
    val candidates =
      (genVars ++ longVars ++ aggOutVars ++ postAggOutVars ++
        (if (longOnly) Vector.empty else boolVars ++ flagVars))
        .distinct.filterNot(Vars.isWildcard)
    val out: Vector[Any] =
      if (candidates.isEmpty) Vector(r.nextInt(4).toLong: Any)
      else {
        val nOut = 1 + r.nextInt(math.min(4, candidates.size))
        val outVars = r.shuffle(candidates.toList).take(nOut).toVector
        if (r.nextInt(10) < 2) outVars :+ (r.nextInt(4).toLong: Any)
        else outVars
      }

    QSpec(gens, ops ++ postAggOps, aggs, exs, out,
      distinct = r.nextInt(10) < 2,
      sort = sortVar.toVector, reverse = sortRev)
  }

  private def norm(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.map {
      case null => "ø"
      case b: Boolean => if (b) "T" else "F"
      case b: java.lang.Boolean => if (b) "T" else "F"
      case x => x.toString
    }.mkString("|")).sorted

  /** Vacuity guard: the generator-shape dimensions (merge, union-dedupe,
    * nested subquery, checkpoint/cache wrap) must actually occur in the
    * seed space, or the differential silently stops covering them. */
  property("fuzz dimensions are exercised") = {
    var m = 0; var dd = 0; var n = 0; var w = 0; var ix = 0; var ex = 0
    var wc = 0; var sm = 0 // composite: wrap-over-composite, set-op w/ merge side
    (1 to 1000).foreach { i =>
      buildSpec(new Random(i.toLong)).gens.foreach {
        case ms: MergeSpec => m += 1; if (ms.dedupe) dd += 1
        case _: NestedSpec => n += 1
        case ws: WrapSpec =>
          w += 1; if (!ws.inner.isInstanceOf[GenSpec]) wc += 1
        case is: IntersectSpec =>
          if (is.except) ex += 1 else ix += 1
          if (!is.b.isInstanceOf[GenSpec]) sm += 1
        case _: GenSpec => ()
      }
    }
    (m >= 20 && dd >= 5 && n >= 20 && w >= 20 && ix >= 10 && ex >= 10 &&
      wc >= 5 && sm >= 5) :|
      s"shape counts over 1000 seeds: merge=$m dedupe=$dd nested=$n wrap=$w intersect=$ix except=$ex wrapComposite=$wc setOpMergeSide=$sm"
  }

  /** Vacuity guard for the pull-through property: most seeds must
    * produce a non-empty wrap set, and the wrapped slices must contain
    * both internal vars (the hygiene-rename path) and aggregators
    * (macros emitting aggregation predicates, the avgMacro shape). */
  property("macro fuzz wraps real slices") = {
    var wrapped = 0; var withAgg = 0; var withInternal = 0
    (1 to 1000).foreach { i =>
      val r = new Random(i.toLong)
      val spec = buildSpec(r)
      val nAll = spec.ops.size + spec.aggs.size
      val wrap = (0 until nAll).filter(_ => r.nextInt(10) < 6).toSet
      if (wrap.nonEmpty) {
        wrapped += 1
        val all = spec.ops ++ spec.aggs
        val inside = all.zipWithIndex.collect { case (o, j) if wrap(j) => o }
        if (wrap.exists(_ >= spec.ops.size)) withAgg += 1
        val outside = all.zipWithIndex.collect { case (o, j) if !wrap(j) => o }
        val ext = (outside.flatMap(o => o.in ++ o.out) ++
          spec.gens.flatMap(_.outerFields) ++ spec.out ++ spec.sort)
          .collect { case v: String if Vars.isVar(v) => v }.toSet
        if (inside.flatMap(o => o.in ++ o.out)
            .collect { case v: String if Vars.isVar(v) && !Vars.isWildcard(v) => v }
            .exists(v => !ext(v))) withInternal += 1
      }
    }
    (wrapped >= 400 && withAgg >= 100 && withInternal >= 50) :|
      s"over 1000 seeds: wrapped=$wrapped withAgg=$withAgg withInternal=$withInternal"
  }

  /** Predmacro pull-through: a random subset of each spec's op/agg
    * predicates rides through a synthetic predicate macro (internal
    * vars hygienically renamed; half the cases add a second, nested
    * macro level) — expansion is pure AST→AST, so output must be
    * identical to the un-macroed query. This sweeps the expansion +
    * hygiene machinery across the full generator space instead of the
    * two shipped example macros (avg/variance, p25/q25). */
  property("predmacro pull-through is output-invariant") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { seed =>
      val r = new Random(seed)
      val spec = buildSpec(r)
      val nAll = spec.ops.size + spec.aggs.size
      val wrap = (0 until nAll).filter(_ => r.nextInt(10) < 6).toSet
      if (wrap.isEmpty) Prop.passed
      else {
        val nest = r.nextBoolean()
        def run(q: => graft.logic.Query): Either[String, Seq[Seq[Any]]] =
          try Right(q.toDF(spark).collect().toSeq.map(_.toSeq))
          catch {
            case e: IllegalArgumentException => Left(String.valueOf(e.getMessage))
            case e: RuntimeException => Left(String.valueOf(e.getMessage))
          }
        (run(toQuery(spec)), run(toQueryWithMacro(spec, wrap, nest))) match {
          case (Left(_), Left(_)) => Prop.passed
          case (Right(a), Right(b)) =>
            (norm(a) == norm(b)) :|
              s"seed=$seed wrap=$wrap nest=$nest\n${spec.describe}\nplain: ${norm(a)}\nmacro: ${norm(b)}"
          case (pl, mc) =>
            false :| s"seed=$seed wrap=$wrap nest=$nest\n${spec.describe}\nplain=$pl\nmacro=$mc"
        }
      }
    }

  property("spark plan == brute-force evaluator") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { seed =>
      val spec = buildSpec(new Random(seed))
      val model = PlannerFuzz.modelRun(spec)
      val engine: Either[String, Seq[Seq[Any]]] =
        try Right(toQuery(spec).toDF(spark).collect().toSeq.map(_.toSeq))
        catch {
          case e: IllegalArgumentException => Left(s"engine: ${e.getMessage}")
          case e: RuntimeException => Left(s"engine: ${e.getMessage}")
        }
      (model, engine) match {
        case (Left(_), Left(_)) => Prop.passed
        case (Right(m), Right(g)) =>
          (norm(m) == norm(g)) :|
            s"seed=$seed\n${spec.describe}\nmodel: ${norm(m)}\nengine: ${norm(g)}"
        case (Left(why), Right(g)) =>
          false :| s"seed=$seed\n${spec.describe}\nmodel unplannable ($why) but engine returned ${norm(g)}"
        case (Right(m), Left(why)) =>
          false :| s"seed=$seed\n${spec.describe}\nengine failed ($why) but model returned ${norm(m)}"
      }
    }
}
