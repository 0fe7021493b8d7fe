package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.functions._

import graft.pipeline.Graph

/** VERDICT r15 #5/#7: pins the `spark.graft.broadcastNodeLimit`
  * CROSSOVER itself at the plan level (below the limit the iteration
  * join must broadcast; above it the plan must degrade to sort-merge —
  * with bit-identical results on both sides), and the `nNodes`
  * known-count threading (a caller-supplied count must eliminate the
  * analytic's own count job, at equal output). */
class GraphCrossoverSpec extends SparkTestBase {
  import spark.implicits._

  private def graph() = {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (2L, 6L))
      .toDF("id_a", "id_b")
    val nodes = (1L to 6L).toDF("id")
    (pairs, nodes, Graph.symmetrize(pairs))
  }

  /** Run `thunk` with executed-plan descriptions captured (the graph
    * iterations execute inside Stage.materialize, so join shapes are
    * only visible in the plans that RUN — same capture idiom as
    * BloomJoinSpec). Polls the async listener bus until the expected
    * marker verdict is stable. */
  private def plansOf[A](thunk: => A): (A, Seq[String]) = {
    val plans = new ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit =
        event match {
          case e: SparkListenerSQLExecutionStart =>
            plans.add(e.physicalPlanDescription)
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = thunk
      // listener delivery is async: wait until the count stops moving
      var last = -1
      var stable = 0
      var tries = 0
      while (stable < 3 && tries < 60) {
        val n = plans.size
        if (n == last) stable += 1 else { stable = 0; last = n }
        Thread.sleep(100); tries += 1
      }
      (a, plans.toArray(Array.empty[String]).toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Jobs launched by `thunk` (poll-stable, same async caveat). */
  private def jobsOf[A](thunk: => A): (A, Int) = {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = thunk
      var last = -1
      var stable = 0
      var tries = 0
      while (stable < 3 && tries < 60) {
        val n = jobs.get
        if (n == last) stable += 1 else { stable = 0; last = n }
        Thread.sleep(100); tries += 1
      }
      (a, jobs.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Disable Spark's own size-based auto-broadcast so the ONLY possible
    * BroadcastHashJoin is the one `broadcastNodeLimit` hints — the plan
    * assertion then reads the crossover directly. */
  private def withConf[A](limit: Long)(thunk: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.broadcastNodeLimit", limit.toString)
    try thunk
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.broadcastNodeLimit")
    }
  }

  private def bhj(plans: Seq[String]): Int =
    plans.count(_.contains("BroadcastHashJoin"))

  test("pageRankInt crossover: broadcast below the limit, SMJ above, " +
      "bit-identical results") {
    val (_, nodes, edges) = graph()
    def run() = Graph.pageRankInt(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (under, underPlans) = withConf(limit = 100L)(plansOf(run()))
    val (over, overPlans) = withConf(limit = 5L)(plansOf(run()))
    assert(bhj(underPlans) > 0,
      s"limit 100 > 6 nodes: the contribution join must broadcast; " +
        s"plans:\n${underPlans.mkString("\n---\n")}")
    assert(bhj(overPlans) == 0,
      "limit 5 < 6 nodes: every join must degrade to sort-merge " +
        s"(got ${bhj(overPlans)} BroadcastHashJoin)")
    assert(overPlans.exists(_.contains("SortMergeJoin")),
      "above-limit path should contain SortMergeJoin")
    assert(under == over, s"crossover must be result-neutral: $under vs $over")
  }

  test("labelPropagate crossover: plan flips at the limit, results equal") {
    val (_, nodes, edges) = graph()
    def run() = Graph.labelPropagate(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (under, underPlans) = withConf(limit = 100L)(plansOf(run()))
    val (over, overPlans) = withConf(limit = 5L)(plansOf(run()))
    assert(bhj(underPlans) > 0, "vote join must broadcast under the limit")
    assert(bhj(overPlans) == 0, "vote join must sort-merge above the limit")
    assert(under == over, s"crossover must be result-neutral: $under vs $over")
  }

  test("triangleCounts crossover: orientation joins flip at the limit, " +
      "results equal") {
    val (pairs, nodes, _) = graph()
    def run() = Graph.triangleCounts(pairs, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (under, underPlans) = withConf(limit = 100L)(plansOf(run()))
    val (over, overPlans) = withConf(limit = 5L)(plansOf(run()))
    assert(bhj(underPlans) > 0, "degree joins must broadcast under the limit")
    assert(bhj(overPlans) == 0, "degree joins must sort-merge above the limit")
    assert(under == over, s"crossover must be result-neutral: $under vs $over")
  }

  test("nNodes threading: a caller-supplied count removes the analytic's " +
      "count job, output unchanged") {
    val (pairs, nodes, edges) = graph()
    // LPA: n is ONLY used for the broadcast decision
    val (a1, j1) = jobsOf(Graph.labelPropagate(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val (a2, j2) = jobsOf(
      Graph.labelPropagate(edges, nodes, iters = 2, nNodes = Some(6L))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(a1 == a2, s"nNodes must not change LPA output: $a1 vs $a2")
    assert(j2 < j1,
      s"known count must remove the count job(s) (AQE splits a count " +
        s"into 2): $j1 -> $j2")
    // triangles: likewise broadcast-decision-only
    val (t1, tj1) = jobsOf(Graph.triangleCounts(pairs, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    val (t2, tj2) = jobsOf(
      Graph.triangleCounts(pairs, nodes, nNodes = Some(6L))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    assert(t1 == t2, s"nNodes must not change triangle output: $t1 vs $t2")
    assert(tj2 < tj1,
      s"known count must remove the count job(s): $tj1 -> $tj2")
    // pageRank needs n for the base-rank divisor too — a WRONG supplied
    // count would change ranks, so parity here proves the value is used
    val (r1, rj1) = jobsOf(Graph.pageRankInt(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val (r2, rj2) = jobsOf(
      Graph.pageRankInt(edges, nodes, iters = 2, nNodes = Some(6L))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(r1 == r2, s"nNodes must not change rank output: $r1 vs $r2")
    assert(rj2 < rj1,
      s"known count must remove the count job(s): $rj1 -> $rj2")
  }

  test("checkpointInterval: fewer eager jobs at wider intervals, " +
      "bit-identical ranks and labels at every interval") {
    val (_, nodes, edges) = graph()
    def withInterval[A](k: Int)(thunk: => A): A = {
      spark.conf.set("spark.graft.graph.checkpointInterval", k.toString)
      try thunk finally spark.conf.unset("spark.graft.graph.checkpointInterval")
    }
    def ranks() = Graph.pageRankInt(edges, nodes, iters = 5, nNodes = Some(6L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def labels() = Graph.labelPropagate(edges, nodes, iters = 4, nNodes = Some(6L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (r1, rj1) = jobsOf(withInterval(1)(ranks()))
    val (r2, rj2) = jobsOf(withInterval(2)(ranks()))
    val (r5, _) = jobsOf(withInterval(5)(ranks()))
    assert(r1 == r2 && r2 == r5,
      s"checkpoint interval must be result-neutral: $r1 / $r2 / $r5")
    assert(rj2 < rj1,
      s"interval 2 must launch fewer jobs than per-iteration boundaries: " +
        s"$rj1 -> $rj2")
    val (l1, lj1) = jobsOf(withInterval(1)(labels()))
    val (l2, lj2) = jobsOf(withInterval(2)(labels()))
    val (l4, _) = jobsOf(withInterval(4)(labels()))
    assert(l1 == l2 && l2 == l4,
      s"LPA checkpoint interval must be result-neutral: $l1 / $l2 / $l4")
    assert(lj2 < lj1,
      s"interval 2 must launch fewer LPA jobs: $lj1 -> $lj2")
  }
}
