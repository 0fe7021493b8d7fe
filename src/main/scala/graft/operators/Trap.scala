package graft.operators

import scala.language.reflectiveCalls

import graft.logic.ColumnMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Taps.Sink

import scala.reflect.runtime.universe.TypeTag
import scala.util.{Failure, Success, Try}

/** Trap semantics (reference trap taps: cascading/platform.clj:311-318,
  * tests cascading_api_test.clj:112-224): tuples whose operation throws are
  * diverted to a trap sink and the job continues.
  *
  * Spark has no native equivalent, so the op is Try-wrapped: it emits
  * (result, error-message) and [[divert]] splits the flow — failing tuples
  * go to the trap sink, clean tuples continue. One computation, no
  * job-killing exceptions, same observable semantics as the reference.
  */
object Trap {

  /** Wrap a 1-arg Scala fn into a trapped op: outputs (result, !error).
    * Bind the error to a nullable var (`!e`) — clean rows carry null. */
  def trapFn[A: TypeTag, R: TypeTag](f: A => R): ColumnMap = {
    val u = udf((a: A) => Try(f(a)) match {
      case Success(r) => (Option(r), Option.empty[String])
      case Failure(e) => (Option.empty[R], Some(s"${e.getClass.getName}: ${e.getMessage}"))
    })
    ColumnMap(2, cs => { val s = u(cs.head); Seq(s("_1"), s("_2")) })
  }

  def trapFn2[A: TypeTag, B: TypeTag, R: TypeTag](f: (A, B) => R): ColumnMap = {
    val u = udf((a: A, b: B) => Try(f(a, b)) match {
      case Success(r) => (Option(r), Option.empty[String])
      case Failure(e) => (Option.empty[R], Some(s"${e.getClass.getName}: ${e.getMessage}"))
    })
    ColumnMap(2, cs => { val s = u(cs(0), cs(1)); Seq(s("_1"), s("_2")) })
  }

  /** Split a trapped flow: rows with a non-null error column are written to
    * the trap sink (if any); the clean remainder is returned. */
  def divert(df: DataFrame, errCol: String, trap: Option[Sink]): DataFrame = {
    val err = col(errCol)
    trap.foreach(_.write(df.filter(err.isNotNull)))
    df.filter(err.isNull).drop(errCol)
  }
}

/** prepfn (reference cascading/def.clj:6-33): an op with a per-executor
  * prepare step (expensive init — a model, a connection — done once per
  * JVM, not per tuple). */
object Prep {
  def prepFn[P, A: TypeTag, R: TypeTag](prepare: () => P)(f: (P, A) => R): ColumnMap = {
    val holder = new Serializable {
      @transient lazy val prepared: P = prepare()
    }
    val u = udf((a: A) => f(holder.prepared, a))
    ColumnMap(1, cs => Seq(u(cs.head)))
  }
}

/** Stats counters (reference cascading/stats.clj:49-65,102-151 — Hadoop
  * counters + :stats-fn): Spark LongAccumulators with a StatsMap-shaped
  * snapshot. Ops call `inc!`-style from inside UDFs. */
class Stats(spark: org.apache.spark.sql.SparkSession) extends Serializable {
  private val accs =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.util.LongAccumulator]()

  def counter(group: String, name: String): org.apache.spark.util.LongAccumulator = {
    val key = s"$group/$name"
    accs.computeIfAbsent(key, k => {
      val a = spark.sparkContext.longAccumulator(k)
      a
    })
  }

  /** Wrap a map fn so each invocation increments the counter (inc!). */
  def counted[A: TypeTag, R: TypeTag](group: String, name: String)(f: A => R): ColumnMap = {
    val acc = counter(group, name)
    val u = udf((a: A) => { acc.add(1L); f(a) })
    ColumnMap(1, cs => Seq(u(cs.head)))
  }

  /** StatsMap snapshot: {group/name → value} (stats.clj:102-117). */
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    accs.asScala.map { case (k, v) => k -> v.value.longValue() }.toMap
  }
}
