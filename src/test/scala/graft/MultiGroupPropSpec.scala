package graft

import graft.operators.MultiGroup
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import scala.util.Random

/** Differential fuzz of multigroup/cogroup (reference
  * MultiGroupBy.java:42-195 semantics): random inputs (1-3 relations,
  * 1-2 key columns, nullable keys and values, keys missing from some
  * inputs, empty relations, payload-less key-only inputs — the
  * `_empty`-struct tagging path) cogrouped by VALUE equality — null keys
  * land in one group, MapReduce-style — with the multibuffer draining
  * the per-input iterators in a RANDOM order each case (out-of-order
  * access exercises the TagCursor parking path; in-order the streaming
  * path). Checked against a brute-force model that groups tuples in
  * memory. The example corpus (q31, MacroMultigroupPlanSpec) covers
  * the API; this sweeps the semantic corners. */
object MultiGroupPropSpec extends Properties("MultiGroup.differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_MG_FUZZ_CASES").map(_.toInt).getOrElse(60))

  private lazy val spark = SparkTestBase.session

  private def lOrNull(r: Random, nullPct: Int, lo: Int, hi: Int): Any =
    if (r.nextInt(100) < nullPct) null
    else (lo + r.nextInt(hi - lo + 1)).toLong

  /** The multibuffer under test, shared by engine and model: one
    * summary row per group (v0 = null) plus one row per input-0 value
    * (nulls first, ascending — deterministic), each carrying every
    * input's (count, null-skipping sum). */
  private def emit(nIn: Int, perInput: IndexedSeq[Seq[Any]]): Seq[Seq[Any]] = {
    val stats = (0 until nIn).flatMap { i =>
      val vs = perInput(i)
      val nn = vs.filter(_ != null).map(_.asInstanceOf[Long])
      Seq(vs.size.toLong, if (nn.isEmpty) null else nn.sum)
    }
    val v0sorted = PlannerFuzz.sortVals(perInput(0), desc = false)
    (null +: v0sorted).map(v => (v: Any) +: stats.map(x => x: Any))
  }

  private def norm(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.map {
      case null => "ø"
      case x => x.toString
    }.mkString("|")).sorted

  property("random cogroups == in-memory model (random drain order)") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { seed =>
      val r = new Random(seed)
      val nIn = 1 + r.nextInt(3)
      val nKey = 1 + r.nextInt(2)
      val keyCols = (0 until nKey).map(i => s"k$i")
      // row fan: small key range forces collisions; 15% null keys makes
      // the null-group semantics load-bearing in most cases
      // ~1 in 5 inputs is PAYLOAD-LESS (key columns only — the tap whose
      // rows just witness the key): the engine carries its `_empty`
      // struct; both sides read its row values as null
      val hasVal = Vector.fill(nIn)(r.nextInt(10) < 8)
      val inputRows: IndexedSeq[Seq[Seq[Any]]] = (0 until nIn).map { _ =>
        Seq.fill(r.nextInt(8))(
          (0 until nKey).map(_ => lOrNull(r, 15, 0, 2)) :+ lOrNull(r, 20, 0, 4))
      }
      val dfs = inputRows.zipWithIndex.map { case (rows, i) =>
        val schema = StructType(
          keyCols.map(k => StructField(k, LongType, nullable = true)) ++
            (if (hasVal(i)) Seq(StructField("v", LongType, nullable = true))
             else Nil))
        val jl = new java.util.ArrayList[Row]()
        rows.foreach(t => jl.add(Row.fromSeq(
          if (hasVal(i)) t else t.take(nKey))))
        spark.createDataFrame(jl, schema)
      }
      val perm = r.shuffle((0 until nIn).toList)
      val outNames = "v0" +: (0 until nIn).flatMap(i => Seq(s"cnt$i", s"sum$i"))
      val outTypes = Vector.fill(outNames.size)(LongType: DataType)
      val nInL = nIn // avoid capturing the Random in the closure
      val permL = perm
      val hvL = hasVal
      val engine = MultiGroup.multigroupStream(
        dfs, keyCols, outNames, outTypes) { (_, its) =>
        val drained = Array.fill[Seq[Any]](nInL)(null)
        permL.foreach(i => drained(i) =
          its(i).map(row => if (hvL(i)) row.get(0) else null).toSeq)
        emit(nInL, drained.toIndexedSeq).iterator
      }.collect().toSeq.map(_.toSeq)

      // model: group by key-tuple value equality across all inputs
      val keys = inputRows.flatten.map(_.take(nKey)).distinct
      val model = keys.flatMap { kv =>
        val perInput = (0 until nIn).map { i =>
          val rs = inputRows(i).filter(_.take(nKey) == kv)
          if (hasVal(i)) rs.map(_.last) else rs.map(_ => null)
        }
        emit(nIn, perInput).map(kv ++ _)
      }
      (norm(model) == norm(engine)) :|
        s"seed=$seed nIn=$nIn nKey=$nKey perm=$perm\nmodel:  ${norm(model)}\nengine: ${norm(engine)}"
    }
}
