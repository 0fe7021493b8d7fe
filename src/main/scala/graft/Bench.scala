package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Headline benchmark: JSON lines the driver records as BENCH_rN.
  *
  * Methodology (matches BASELINE.md's round-4 re-record so numbers are
  * comparable across rounds BY CONSTRUCTION): run the full suite once as
  * an untimed warmup — whole-stage-codegen compilation, file-index and
  * JIT costs land there, not on whichever query first touches a plan
  * shape — then report the per-query MIN over two timed passes in the
  * same JVM. Single-shot numbers swung 1.4× round-over-round on host/JIT
  * noise alone (VERDICT r4 found 12 spurious >2× entries); min-of-2 after
  * a full warmup measures the plans.
  *
  * Host calibration (VERDICT r6 item #1): the shared host's effective
  * CPU speed drifts up to ~1.6× between sessions with no code change —
  * two rounds of judge time went to re-running queries to separate host
  * drift from plan regressions. So the suite times a fixed SCAN-BOUND
  * canary — q19_cross_join + q23_sample, the two pure-parquet-scan
  * queries VERDICT r6 itself used as controls — warm, immediately before
  * and after the timed passes, and emits
  * `"host_cal":[start, end, 0.53]` in the headline: the two measurements
  * bracket the run (drift WITHIN the run shows as start≠end) and 0.53 is
  * the BASELINE.md-recorded steady sum for the same pair (0.32 + 0.21),
  * so per-query ratios normalize as `t / (measured/0.53) / baseline`
  * WITHOUT anyone re-running queries.
  *
  * Output layout (VERDICT r5 finding #1): the driver's stdout capture
  * keeps only the LAST exactly-2000 chars of raw sbt stdout — which also
  * retains sbt's trailing "[success] Total time: ..." epilogue (~80
  * chars) AND, before build.sbt's `run / outputStrategy := StdoutOutput`,
  * prefixed every forked println with "[info] " (why no BENCH_rN
  * headline ever parsed, rounds 1-5: the intact r1 line was
  * "[info] {...}", not JSON). So: full-precision first-run and steady
  * maps print FIRST as auxiliary lines (the session log keeps them; the
  * steady line carries the "timing" methodology tag at its END so the
  * window slice before the headline shows it), and the LAST line is a
  * compact headline — seconds at ≤2 significant-ish decimals (see
  * fmtC), sf basename, query keys shortened to their unique qNN/pNN
  * prefix (87 full names alone overflow the window; full names stay on
  * the aux lines) — sized so headline + epilogue fit the 2000-char
  * window whole; if a host-slow round still inflates it past the
  * budget, the formatter tightens one notch at a time before printing.
  * Field order puts "errors" BEFORE "queries" so if an error message
  * ever inflates the line past the window, truncation eats the head,
  * never the steady map at the end. The short `"t":"w2"` tag keeps the
  * methodology readable from the recorded headline alone (ADVICE r6);
  * the long-form tag still rides the aux line. A FAILED query
  * contributes its error message and NO time anywhere (VERDICT r6
  * finding #2): times-to-exception are not measurements, so the query
  * is simply absent from first_run/steady and the totals. */
object Bench {
  /** Scan-bound host canary + its BASELINE.md-recorded warm constant
    * (q19_cross_join 0.32 s + q23_sample 0.21 s, the round-4 re-record
    * table). Changing either side requires re-recording the other. */
  private val CanaryQueries = Seq("q19_cross_join", "q23_sample")
  private val CanaryBaselineSec = 0.53
  /** Headline byte budget: 2000-char driver window minus the ~80-char
    * sbt epilogue, with slack (bench-output forensics, BASELINE.md). */
  private val HeadlineBudget = 1920

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=p11,p17 runs a subset (local profiling; driver unsets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None => SparkEntry.queries
    }
    // A failing query must not report a healthy time (VERDICT r5 #3) and
    // must not leak its time-to-exception into the maps or totals either
    // (VERDICT r6 #2): on error, record the message and return None.
    val errors = mutable.LinkedHashMap.empty[String, String]
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case t: Throwable =>
          errors(name) = (t.getClass.getSimpleName + ": " + String.valueOf(t.getMessage)).take(120)
          None
      }
    }
    // the canary runs OUTSIDE any SPARK_GRAFT_ONLY subset so host_cal is
    // always comparable; one untimed pass first guarantees it is warm
    // even when the subset excluded q19/q23 from the warmup
    def canary(label: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        CanaryQueries.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case t: Throwable =>
          errors(label) = (t.getClass.getSimpleName + ": " + String.valueOf(t.getMessage)).take(120)
          None
      }
    }
    // pass 0: warmup — also the honest "cold driver" number, reported
    val firstRun = selected.flatMap { case (name, fn) =>
      timeOne(name, fn).map(name -> _)
    }
    // two untimed warm-throughs, results discarded: one still caught
    // residual JIT in subset runs (measured 1.03 vs 0.54 warm)
    canary("host_cal_warm"); canary("host_cal_warm")
    val calStart = canary("host_cal_start")
    // passes 1..N: steady state, min per query. Clamp to >=1 — 0 passes
    // would leave the steady map empty after paying for the warmup
    // (ADVICE r5); non-numeric falls back to the default.
    val timedPasses = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_PASSES").flatMap(_.toIntOption).getOrElse(2))
    val steady = (1 to timedPasses).foldLeft(Map.empty[String, Double]) { (acc, _) =>
      selected.foldLeft(acc) { case (a, (name, fn)) =>
        timeOne(name, fn) match {
          case Some(t) => a.updated(name, math.min(t, a.getOrElse(name, Double.MaxValue)))
          case None => a
        }
      }
    }
    val calEnd = canary("host_cal_end")
    // a query absent from steady (failed every timed pass) is absent
    // from the results and the total — its errors entry is the record
    val results = selected.keys.flatMap(n => steady.get(n).map(n -> _)).toSeq
    def fmt(v: Double, decimals: Int): String =
      s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
    // headline seconds: 0 decimals at >=100, 1 decimal at >=cut, 2
    // below; trailing zeros stripped ("0.30"->"0.3", "2.0"->"2"). The
    // default cut 0.3 bounds rounding error at <=17% of the value; the
    // full-precision aux lines carry 3 decimals regardless. Value width
    // is bounded at 5 chars below 1000 s; non-finite or negative input
    // (cannot occur for elapsed times — defensive per ADVICE r6) prints
    // "0" instead of unbounded %.0f output.
    def fmtC(v: Double, cut: Double): String = {
      if (!java.lang.Double.isFinite(v) || v < 0) "0"
      else {
        val s = fmt(v, if (v >= 100) 0 else if (v >= cut) 1 else 2)
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
      }
    }
    def jsonMap(m: Iterable[(String, Double)], decimals: Int): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v, decimals) }.mkString("{", ",", "}")
    def jsonStrMap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"" }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val firstTotal = firstRun.values.sum
    val calFull = Seq(calStart, calEnd).flatten
    // auxiliary full-precision lines first: truncation may eat these.
    // The methodology tag rides at the END of the steady aux line so it
    // can survive in whatever window slice precedes the headline.
    // (tag derives from the actual pass count so an SPARK_GRAFT_BENCH_PASSES
    // override cannot mislabel the methodology)
    println(s"""{"first_run":${jsonMap(firstRun, 3)},"first_run_total":${fmt(firstTotal, 3)},"sf":"$sfDir"}""")
    println(s"""{"steady_full":${jsonMap(results, 3)},"steady_total":${fmt(total, 3)},"host_cal_full":[${calFull.map(fmt(_, 3)).mkString(",")}],"sf":"$sfDir","timing":"min_warm$timedPasses","errors":${jsonStrMap(errors)}}""")
    // headline LAST and compact: headline + sbt's "[success] ..."
    // epilogue (~80 chars) must fit the driver's 2000-char tail window
    // together, or the headline's head gets cut and the JSON never
    // parses. The empty errors map lives on the aux line; it joins the
    // headline only when there is something to report.
    val sfName = new java.io.File(sfDir).getName
    // Headline query keys are the unique qNN/pNN prefix ("p16", "q01"):
    // at 87 queries the full names alone (~24 chars each) overflow the
    // 2000-char capture window at ANY precision, and the suite keeps
    // growing. Full names ride the full-precision aux lines; BASELINE.md
    // documents the key scheme. A prefix that ever collided would fall
    // back to the full name (correct, if over-budget — visible, never
    // ambiguous).
    val shortKey: String => String = {
      val pref = results.map { case (n, _) => n -> n.takeWhile(_ != '_') }.toMap
      val counts = pref.values.groupBy(identity).map { case (k, v) => k -> v.size }
      n => if (counts.getOrElse(pref(n), 0) == 1) pref(n) else n
    }
    def headline(cut: Double): String = {
      def jm(m: Iterable[(String, Double)]): String =
        m.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmtC(v, cut) }.mkString("{", ",", "}")
      val errField = if (errors.isEmpty) "" else s""""errors":${jsonStrMap(errors)},"""
      val calField =
        if (calFull.size < 2) ""
        else {
          // 2 decimals always (cut=10): the calibration ratio needs them
          val cs = (calFull :+ CanaryBaselineSec).map(fmtC(_, 10.0)).mkString(",")
          s""""host_cal":[$cs],"""
        }
      s"""{"metric":"total","value":${fmtC(total, cut)},"unit":"sec","t":"w$timedPasses",$calField$errField"sf":"$sfName","queries":${jm(results)}}"""
    }
    // tighten precision a notch at a time if a host-slow round (or an
    // errors map) would push the headline past the capture window
    val line = Seq(0.3, 0.095, 0.0).view.map(headline)
      .find(_.length <= HeadlineBudget)
      .getOrElse(headline(0.0))
    println(line)
    spark.stop()
  }
}
