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

  test("no query presents a DecimalType output column") {
    // The driver's hash layer stringifies decimals differently per
    // engine (pandas Decimal vs DuckDB's decimal→float64 fetchdf) —
    // the p64/p65 round-9 failure class. Exact decimal arithmetic is
    // fine INSIDE a query; the presented schema must be primitive
    // (cast to string/bigint/double at the query boundary).
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, "/root/testdata/sf0.001").schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("streamingBatchPlans and the streaming gate queries cover each other") {
    // PlanLintSpec lints these batch-applied transforms IN PLACE OF the
    // gate query for each key — a key without a gate query would be a
    // lint entry shadowing nothing, and a "_stream" gate query WITHOUT an
    // entry would fall through to executing the stream inside the lint
    // and handing it an empty memory-sink plan (a vacuous lint row)
    val missing = SparkEntry.streamingBatchPlans.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"streaming batch plan without query: $missing")
    val unlinted = SparkEntry.queries.keySet.filter(_.contains("_stream")) --
      SparkEntry.streamingBatchPlans.keySet
    assert(unlinted.isEmpty, s"streaming gate query without a batch lint plan: $unlinted")
  }

  test("every query is oracle-keyed except the by-design RNG exception") {
    // q23's Bernoulli sample is engine-RNG-specific (rows-only by
    // design, VERDICT r4+). Anything else missing here means a new
    // query shipped without its correctness gate.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == Set("q23_sample"), s"queries without oracle: $unoracled")
    // ...and every by-design rows-only query carries its statistical
    // contract (Verify writes it as <name>.contract.json): the two sets
    // must be EQUAL — a new unoracled query without a contract, or a
    // contract shadowing an oracled query, both fail here
    assert(SparkEntry.statContracts.keySet == unoracled,
      s"statContracts must cover exactly the unoracled set: " +
        s"${SparkEntry.statContracts.keySet} vs $unoracled")
    // ...and the dump-time contract oracles (Verify merges them into
    // oracle_sql.json so the driver's compare checks the contract in
    // DuckDB) must target exactly that same set — a contract oracle for
    // an already-oracled query would shadow its real oracle
    assert(SparkEntry.contractOracleSql("/dump").keySet == unoracled,
      s"contractOracleSql must cover exactly the unoracled set: " +
        s"${SparkEntry.contractOracleSql("/dump").keySet} vs $unoracled")
  }

  test("contract oracle SQL embeds the dump dir it is authored for") {
    val sql = SparkEntry.contractOracleSql("/some/out")("q23_sample")
    assert(sql.contains("read_parquet('/some/out/q23_sample/*.parquet')"),
      s"contract oracle must read the dumped sample back:\n$sql")
    // the checks must reference the SOURCE table independently — an
    // oracle that only echoes the dump would be a tautology, not a check
    assert(sql.contains("FROM lineitem"), "contract oracle must recompute from the source table")
    assert(sql.contains("sqrt"), "contract oracle must carry the binomial bound")
  }

  test("q23 sample: deterministic at fixed seed, rows a subset of the source, fraction inside the binomial bound") {
    // the lone rows-only query gets a statistical contract instead of a
    // hash: (1) the engine's Bernoulli RNG is seeded, so two runs on the
    // same data and partitioning return the SAME rows; (2) every sampled
    // row exists in the source; (3) the sampled count sits within 5σ of
    // fraction·n (binomial) — a wrong-fraction or wrong-source
    // regression trips this long before a human would notice
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q23_sample")
    val run1 = q(spark, d).collect().map(_.toSeq).toSeq
    val run2 = q(spark, d).collect().map(_.toSeq).toSeq
    assert(run1 == run2, "fixed-seed sample must be run-to-run identical")
    val srcRows = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber").collect().map(_.toSeq)
    val src = srcRows.toSet
    assert(run1.forall(src.contains), "sampled rows must come from the source")
    // n = true row count (the generated data carries duplicate pairs, so
    // the distinct set undercounts the Bernoulli trials)
    val n = srcRows.length.toDouble
    val expect = 0.1 * n
    val sigma = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(run1.size - expect) <= 5 * sigma,
      s"sampled ${run1.size} of $n rows — outside 5σ of the 10% Bernoulli bound")
  }
}
