package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Generative fuzz of the checkpoint workflow (graft.plans.Workflow —
  * reference checkpoint.clj semantics): random DAGs, a random step that
  * fails on its FIRST execution, random parallelism. Properties checked
  * per case, across a failing run and a resuming re-run:
  *
  *  1. dependency order — no step's body starts before every dep's body
  *     finished (sequence numbers from a global counter);
  *  2. failure containment — no transitive dependent of the failed step
  *     ever executes in the failing run;
  *  3. token durability — every step that succeeded in run 1 is skipped
  *     by run 2 (exactly one body execution across both runs; the failed
  *     step exactly two); after run 2 all tokens exist and all results
  *     are Success.
  *
  * This is driver-side orchestration only — no SparkSession needed — so
  * hundreds of random DAGs are cheap. The q49 gate query pins one DAG's
  * results through the oracle; this spec pins the SCHEDULER contract the
  * example can't sweep. */
class WorkflowPropSpec extends AnyFunSuite {

  // one suite root, recursively deleted at the end of the test —
  // File.deleteOnExit cannot remove non-empty dirs, so 300 populated
  // checkpoint dirs would otherwise leak per run
  private val suiteRoot = Files.createTempDirectory("graft_wf_fuzz").toString

  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally graft.streaming.Streams.deleteRecursivelyNoFollow(suiteRoot)

  test("random DAGs: dependency order, failure containment, token resume (300 cases)") {
    val rnd = new scala.util.Random(20260815L)
    for (caseId <- 0 until 300) {
      val n = 3 + rnd.nextInt(5) // 3..7 steps
      val names = (0 until n).map(i => s"s$i")
      // edges only to lower indices => always a DAG
      val deps: Map[String, Seq[String]] = names.zipWithIndex.map { case (s, i) =>
        s -> (0 until i).filter(_ => rnd.nextBoolean()).map(j => s"s$j")
      }.toMap
      val failing = names(rnd.nextInt(n))
      val transitiveDependents: Set[String] = {
        var out = Set(failing)
        var grew = true
        while (grew) {
          val next = names.filter(s => deps(s).exists(out)).toSet ++ out
          grew = next.size > out.size; out = next
        }
        out - failing
      }

      val seq = new AtomicInteger(0)
      val startSeq = new ConcurrentHashMap[String, Integer]()
      val endSeq = new ConcurrentHashMap[String, Integer]()
      val execs = new ConcurrentHashMap[String, AtomicInteger]()
      val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

      def mkWf(): graft.plans.Workflow = {
        val wf = new graft.plans.Workflow(dir)
        names.foreach { s =>
          wf.step(s)(deps(s): _*) { tmp =>
            execs.computeIfAbsent(s, _ => new AtomicInteger).incrementAndGet()
            startSeq.putIfAbsent(s, Int.box(seq.incrementAndGet()))
            require(Files.isDirectory(Paths.get(tmp)), s"tmp dir missing for $s")
            if (s == failing && failedOnce.compareAndSet(false, true))
              throw new RuntimeException(s"injected failure in $s")
            endSeq.put(s, Int.box(seq.incrementAndGet()))
          }
        }
        wf
      }
      lazy val dir = s"$suiteRoot/case$caseId"

      val r1 = mkWf().run(parallelism = 1 + rnd.nextInt(4))
      assert(!r1(failing).isSuccess, s"case $caseId: injected failure not reported")
      transitiveDependents.foreach { s =>
        assert(execs.getOrDefault(s, new AtomicInteger).get == 0,
          s"case $caseId: dependent $s of failed $failing executed in run 1")
      }

      // every step that RAN to success in run 1 must hold a token; the
      // failure stops launching, so independent steps not yet launched
      // may legitimately wait for run 2 — tokens == successful runs,
      // not "everything off the failure path"
      val ranInRun1 = names.filter(s =>
        execs.getOrDefault(s, new AtomicInteger).get > 0).toSet
      val wf2 = mkWf()
      assert(wf2.completed == ranInRun1 - failing,
        s"case $caseId: tokens ${wf2.completed} != run-1 successes ${ranInRun1 - failing}")
      val r2 = wf2.run(parallelism = 1 + rnd.nextInt(4))
      assert(r2.values.forall(_.isSuccess), s"case $caseId: resume failed: $r2")
      names.foreach { s =>
        val expected = if (s == failing) 2 else 1
        assert(execs.get(s).get == expected,
          s"case $caseId: step $s ran ${execs.get(s).get}x, expected $expected")
        assert(Files.exists(Paths.get(dir, s"$s.token")),
          s"case $caseId: missing token for $s after resume")
      }
      // dependency order: a step starts only after each dep ended
      names.foreach { s =>
        deps(s).foreach { d =>
          assert(startSeq.get(s).intValue > endSeq.get(d).intValue,
            s"case $caseId: $s started before dep $d finished")
        }
      }
    }
  }
}
