package graft

import graft.dsl._
import graft.ops.Ops
import graft.operators.{Prep, Stats, Trap}
import graft.plans.Workflow
import graft.sources.Taps
import java.nio.file.Files
import org.apache.spark.sql.functions._

class TapsAndOpsSpec extends SparkTestBase {

  def tmp(): String = Files.createTempDirectory("graft").toString

  test("sink modes, template sink, delimited round-trip (tap.clj)") {
    val dir = tmp()
    val rows = Seq(Seq("a", 1L), Seq("b", 2L), Seq("a", 3L))

    // parquet replace + keep
    Taps.fillTap(spark, Taps.parquetSink(s"$dir/p"), rows)
    assert(Taps.sinkTuples(spark, "parquet", s"$dir/p").size == 3)
    assertThrows[Exception] { // :keep errors when output exists
      Taps.fillTap(spark, Taps.parquetSink(s"$dir/p", mode = "keep"), rows)
    }
    // :update appends
    Taps.fillTap(spark, Taps.parquetSink(s"$dir/p", mode = "update"), rows)
    assert(Taps.sinkTuples(spark, "parquet", s"$dir/p").size == 6)
    // pluck-tuple (tap.clj:262-268): one tuple, Option-wrapped
    assert(Taps.pluckTuple(spark, "parquet", s"$dir/p").exists(_.length == 2))

    // delimited round-trip with header
    Taps.csvSink(s"$dir/c", sep = "|", header = true)
      .write(memDF(spark, rows).toDF("k", "v"))
    val back = Taps.delimited(s"$dir/c", sep = "|", header = true)("?k", "?v")
    assertProduces(query("?k", "?v")(back), rows)

    // template (partitioned) sink: one directory per key value
    Taps.templateSink(s"$dir/t", Seq("k")).write(memDF(spark, rows).toDF("k", "v"))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/t/k=a")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/t/k=b")))

    // textline source round-trip
    Taps.textSink(s"$dir/x").write(memDF(spark, Seq(Seq("hello"), Seq("world"))).toDF("value"))
    assertProduces(query("?line")(Taps.textline(s"$dir/x")("?line")),
      Seq(Seq("hello"), Seq("world")))

    // wholefile: one tuple per file (binaryFile schema: path, time, len, content)
    val files = Taps.wholefile(s"$dir/x", "*.txt")("?path", "_", "_", "_")
    assert(query("?path")(files).toDF(spark).count() >= 1)

    // Writable SequenceFile round-trip (hfs-wrtseqfile)
    Taps.wrtseqfileSink(memDF(spark, Seq(Seq("k1", "v1"), Seq("k2", "v2"))), s"$dir/sq")
    assertProduces(query("?k", "?v")(Taps.wrtseqfile(s"$dir/sq")("?k", "?v")),
      Seq(Seq("k1", "v1"), Seq("k2", "v2")))

    // JSONL round-trip: inferred schema, explicit DDL, and schemaFrom
    Taps.jsonlSink(s"$dir/j")
      .write(memDF(spark, rows).toDF("k", "v"))
    assertProduces(query("?k", "?v")(Taps.jsonl(s"$dir/j")("?k", "?v")), rows)
    assertProduces(
      query("?k", "?v")(
        Taps.jsonl(s"$dir/j", schemaDDL = "k STRING, v BIGINT")("?k", "?v")),
      rows)
    assertProduces(
      query("?k", "?v")(
        Taps.jsonl(s"$dir/j", schemaFrom = s"$dir/j")("?k", "?v")),
      rows)
    // compressed sink still reads back through the same tap
    Taps.jsonlSink(s"$dir/jz", compression = Some("gzip"))
      .write(memDF(spark, rows).toDF("k", "v"))
    assertProduces(query("?k", "?v")(Taps.jsonl(s"$dir/jz")("?k", "?v")), rows)
  }

  test("orc round-trips through the generic hfs tap (columnar alt-format)") {
    val dir = tmp()
    val rows = Seq(Seq("a", 1L), Seq("b", 2L), Seq("c", 3L))
    memDF(spark, rows).toDF("k", "v").write.orc(s"$dir/o")
    assertProduces(query("?k", "?v")(Taps.hfs("orc", s"$dir/o")("?k", "?v")), rows)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = spark.read.orc(s"$dir/o").filter(col("v") > 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,1)]"), plan)
  }

  test("schema evolution: mergeSchema unions columns across parquet drops") {
    val dir = tmp()
    memDF(spark, Seq(Seq("a", 1L))).toDF("k", "v").write.parquet(s"$dir/e/d1")
    memDF(spark, Seq(Seq("b", 2L, "extra"))).toDF("k", "v", "w")
      .write.parquet(s"$dir/e/d2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/e/*")
    assert(merged.columns.sorted.toSeq == Seq("k", "v", "w"))
    val rows = merged.collect().map(r =>
      (r.getAs[String]("k"), r.getAs[Long]("v"), r.getAs[String]("w"))).toSet
    assert(rows == Set(("a", 1L, null), ("b", 2L, "extra")))
  }

  test("bucketed tables: co-located equi-join with NO shuffle exchange") {
    // the 100 TB recurring-join path: both sides bucketed on the key with
    // the same bucket count -> later joins need no Exchange at all
    val rows = (1 to 200).map(i => (i.toLong, s"v$i"))
    Taps.bucketSink(spark.createDataFrame(rows).toDF("k", "va"),
      "t_bk_a", Seq("k"), 4, sortCols = Seq("k"))
    Taps.bucketSink(spark.createDataFrame(rows.map { case (k, v) => (k, v.toUpperCase) })
      .toDF("k", "vb"), "t_bk_b", Seq("k"), 4, sortCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = graft.dsl.query("?k", "?va", "?vb")(
        Taps.bucketTap("t_bk_a")("?k", "?va"),
        Taps.bucketTap("t_bk_b")("?k", "?vb")).toDF(spark)
      assert(j.count() === 200)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join: backward match, inclusive ties, unmatched lefts null") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 15L, 9.9))
      .toDF("k", "qt", "px")
    val trades = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 1L))
      .toDF("k", "tt")
    val j = graft.operators.AsOf.asofJoin(trades, quotes,
      key = Seq("k"), leftTime = "tt", rightTime = "qt")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(j == Set(
      (1L, 5L, null),   // before any quote
      (1L, 10L, 1.0),   // inclusive: quote AT trade time matches
      (1L, 25L, 2.0),   // latest preceding
      (2L, 14L, null),  // key 2's quote is later
      (3L, 1L, null)))  // key never quoted
  }

  test("range join: inclusive bounds, multi-bin intervals, no duplicate pairs") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 30L, "a"), (1L, 25L, 26L, "b"), (2L, 0L, 100L, "c"))
      .toDF("k", "lo", "hi", "tag")
    val points = Seq((1L, 10L), (1L, 30L), (1L, 31L), (1L, 25L), (2L, 55L), (3L, 5L))
      .toDF("k", "t")
    // binWidth 7 forces every interval across multiple bins
    val j = graft.operators.RangeJoin.rangeJoin(points, intervals,
      key = Seq("k"), timeCol = "t", loCol = "lo", hiCol = "hi", binWidth = 7L)
      .select("k", "t", "tag").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(j.toSet == Set(
      (1L, 10L, "a"), (1L, 30L, "a"), // inclusive at both bounds
      (1L, 25L, "a"), (1L, 25L, "b"), // overlapping intervals both match
      (2L, 55L, "c")))
    assert(j.length == j.toSet.size, "no duplicate pairs from binning")
  }

  test("trap: failing tuples diverted, job continues (cascading_api_test.clj:163-224)") {
    val dir = tmp()
    val boom = Trap.trapFn[Long, Long](n =>
      if (n % 2 == 1) throw new IllegalArgumentException(s"odd: $n") else n * 10)
    val df = query("?n", "!res", "!err")(
      mem(Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L)))(Seq("?n"): _*),
      boom("?n") :> ("!res", "!err")).toDF(spark)
    val clean = Trap.divert(df, "err", Some(Taps.parquetSink(s"$dir/trap")))
    assert(clean.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 20L), (4L, 40L)))
    val trapped = Taps.sinkTuples(spark, "parquet", s"$dir/trap")
    assert(trapped.map(_.head).toSet == Set(1L, 3L))
    assert(trapped.forall(_.last.toString.contains("odd:")))
  }

  test("prepfn: per-executor prepare runs once per JVM (cascading/def.clj:6-33)") {
    val op = Prep.prepFn[String, Long, String](
      () => { TapsAndOpsSpec.prepCount.incrementAndGet(); "model-v1" })(
      (model, n) => s"$model:$n")
    assertProduces(
      query("?out")(
        mem(Seq(Seq(1L), Seq(2L), Seq(3L)))(Seq("?n"): _*),
        op("?n") :> "?out"),
      Seq(Seq("model-v1:1"), Seq("model-v1:2"), Seq("model-v1:3")))
    // local[4] single JVM → exactly one prepare regardless of tuple count
    assert(TapsAndOpsSpec.prepCount.get() == 1)
  }

  test("stats counters: inc! from inside ops (cascading/stats.clj)") {
    val stats = new Stats(spark)
    val op = stats.counted[Long, Long]("graft", "tuples-seen")(_ * 2)
    query("?d")(
      mem(Seq(Seq(1L), Seq(2L), Seq(3L)))(Seq("?n"): _*),
      op("?n") :> "?d").toDF(spark).collect()
    assert(stats.snapshot("graft/tuples-seen") == 3L)
  }

  test("checkpoint workflow: DAG order, resume skips done steps") {
    val dir = tmp()
    val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def wf() = {
      val w = new Workflow(dir)
      w.step("a")() { _ => log.add("a") }
      w.step("b")("a") { _ => log.add("b") }
      w.step("c")("a") { _ => log.add("c") }
      w.step("d")("b", "c") { _ => log.add("d") }
      w
    }
    val r1 = wf().run(parallelism = 2)
    assert(r1.values.forall(_.isSuccess))
    assert(log.indexOf("a") < log.indexOf("b") && log.indexOf("b") < log.indexOf("d"))
    assert(log.indexOf("c") < log.indexOf("d"))
    log.clear()
    wf().run(parallelism = 2) // all tokens present → nothing re-runs
    assert(log.isEmpty)
  }

  test("checkpoint workflow: failure blocks dependents, resume re-runs failed") {
    val dir = tmp()
    val ran = new java.util.concurrent.CopyOnWriteArrayList[String]()
    var fail = true
    def wf() = {
      val w = new Workflow(dir)
      w.step("ok")() { _ => ran.add("ok") }
      w.step("flaky")("ok") { _ => ran.add("flaky"); if (fail) sys.error("boom") }
      w.step("after")("flaky") { _ => ran.add("after") }
      w
    }
    val r1 = wf().run()
    assert(r1("flaky").isFailure && !r1.contains("after"))
    fail = false
    val r2 = wf().run()
    assert(r2("flaky").isSuccess && r2("after").isSuccess)
    assert(ran.toArray.count(_ == "ok") == 1) // ok not re-run
  }
}

object TapsAndOpsSpec {
  val prepCount = new java.util.concurrent.atomic.AtomicInteger(0)
}
