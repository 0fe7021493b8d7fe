package graft

/** Exercises exactly what the driver runs: entry() smoke (rows>0 at
  * sf0.001) and every queries() entry executing without error. */
class DriverContractSpec extends SparkTestBase {

  test("entry: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, "/root/testdata/sf0.001").count()
        if (n == 0 && name != "q07_anti_join") Some(s"$name: 0 rows") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query is oracle-keyed except the by-design RNG exception") {
    // q23's Bernoulli sample is engine-RNG-specific (rows-only by
    // design, VERDICT r4+). Anything else missing here means a new
    // query shipped without its correctness gate.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == Set("q23_sample"), s"queries without oracle: $unoracled")
  }
}
