package graft.plans

import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentHashMap, Executors, Semaphore, TimeUnit}
import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** Workflow checkpointing (reference cascalog-checkpoint,
  * src/cascalog/checkpoint.clj:26-114): a driver-side DAG of named steps
  * with dependencies, token marker files for resume-on-failure, per-step
  * tmp dirs, and bounded parallel execution. This is batch orchestration of
  * Spark actions — NOT Structured Streaming (the reference has no
  * streaming; see SURVEY §2.10).
  *
  * {{{
  * val wf = new Workflow("/tmp/ck")
  * wf.step("extract")() { tmp => ... spark action ... }
  * wf.step("transform")("extract") { tmp => ... }
  * wf.run(parallelism = 4)   // re-running skips completed steps
  * }}}
  */
final class Workflow(checkpointDir: String) {

  final case class Step(name: String, deps: Seq[String], body: String => Unit)

  private val steps = mutable.LinkedHashMap[String, Step]()

  def step(name: String)(deps: String*)(body: String => Unit): this.type = {
    require(!steps.contains(name), s"duplicate step $name")
    steps(name) = Step(name, deps, body)
    this
  }

  private def tokenPath(name: String) = Paths.get(checkpointDir, s"$name.token")
  private def tmpDir(name: String) = Paths.get(checkpointDir, "tmp", name).toString

  /** Steps already completed in a previous run (token file present). */
  def completed: Set[String] =
    steps.keySet.filter(n => Files.exists(tokenPath(n))).toSet

  /** Run the DAG: topological, `parallelism`-bounded (reference
    * semaphore, checkpoint.clj:70-90), skipping token-marked steps.
    * On any failure, the remaining dependents are not started; completed
    * tokens survive so the next run resumes. */
  def run(parallelism: Int = 4): Map[String, Try[Unit]] = {
    Files.createDirectories(Paths.get(checkpointDir, "tmp"))
    steps.values.foreach(s => s.deps.foreach(d =>
      require(steps.contains(d), s"step ${s.name} depends on undefined $d")))

    val results = new ConcurrentHashMap[String, Try[Unit]]()
    val done = new ConcurrentHashMap[String, Boolean]()
    completed.foreach { n => done.put(n, true); results.put(n, Success(())) }

    val sem = new Semaphore(parallelism)
    val pool = Executors.newCachedThreadPool()
    val lock = new Object
    var failed = false

    def ready: Seq[Step] = lock.synchronized {
      steps.values.toSeq.filter(s =>
        !done.containsKey(s.name) && !results.containsKey(s.name) &&
          s.deps.forall(d => done.getOrDefault(d, false)))
    }

    def launch(s: Step): Unit = {
      results.put(s.name, Failure(new IllegalStateException("running")))
      pool.submit(new Runnable {
        def run(): Unit = {
          sem.acquire()
          val r = Try {
            Files.createDirectories(Paths.get(tmpDir(s.name)))
            s.body(tmpDir(s.name))
            Files.createDirectories(tokenPath(s.name).getParent)
            Files.writeString(tokenPath(s.name), java.time.Instant.now().toString)
            ()
          }
          sem.release()
          lock.synchronized {
            results.put(s.name, r)
            r match {
              case Success(_) => done.put(s.name, true)
              case Failure(_) => failed = true
            }
            lock.notifyAll()
          }
        }
      })
    }

    lock.synchronized {
      while (!failed && done.size < steps.size) {
        val r = ready
        r.foreach(launch)
        if (done.size < steps.size) lock.wait(200)
        if (failed) ()
      }
    }
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.HOURS)
    import scala.jdk.CollectionConverters._
    results.asScala.toMap
  }

  /** Drop all tokens — next run executes everything. */
  def reset(): Unit =
    steps.keySet.foreach(n => Files.deleteIfExists(tokenPath(n)))
}
