package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r14 #6: an environment death (disk full, OOM) must classify
  * into a self-describing artifact instead of an unparseable crash. */
class EnvFailureSpec extends AnyFunSuite {

  test("classifyEnvFailure: ENOSPC anywhere in the cause chain") {
    val t = new RuntimeException("job aborted",
      new java.io.IOException("wrap",
        new java.nio.file.FileSystemException(
          "/root/repo/target/streams", null, "No space left on device")))
    val c = Bench.classifyEnvFailure(t)
    assert(c.exists(_.startsWith("ENOSPC:")), s"got $c")
  }

  test("classifyEnvFailure: OOM by type and by Spark's acquire-memory message") {
    assert(Bench.classifyEnvFailure(
      new RuntimeException("x", new OutOfMemoryError("Java heap space")))
      .exists(_.startsWith("OOM:")))
    assert(Bench.classifyEnvFailure(new RuntimeException(
      "[UNABLE_TO_ACQUIRE_MEMORY] Unable to acquire 65536 bytes"))
      .exists(_.startsWith("OOM:")))
  }

  test("classifyEnvFailure: a plain defect is NOT classified — it must stay a loud crash") {
    assert(Bench.classifyEnvFailure(
      new IllegalStateException("planner bug: unbound var ?x")).isEmpty)
    assert(Bench.classifyEnvFailure(
      new RuntimeException("a", new RuntimeException("b"))).isEmpty)
  }

  test("classifyEnvFailure: a cause CYCLE terminates") {
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(Bench.classifyEnvFailure(a).isEmpty)
  }

  test("preflightDisk: passes on a healthy disk, fails with culprits at an absurd floor") {
    assert(Bench.preflightDisk().isEmpty)
    val msg = Bench.preflightDisk(minFreeGb = 1e6)
    assert(msg.exists(m => m.contains("ENOSPC preflight") &&
      m.contains("duckdb_spill")), s"got $msg")
  }
}
