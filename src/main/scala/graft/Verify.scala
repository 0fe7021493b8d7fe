package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // environment guard (VERDICT r14 #1/#6): a disk-full round turned
    // the correctness artifact into an empty {} that read as "no
    // queries". Fail BEFORE Spark starts when the disk can't host the
    // run, and classify any mid-run environment death into
    // outDir/env_failure.json so the artifact self-describes as
    // "environment, rerun me" instead of silently zeroing the round.
    def envFail(msg: String): Nothing = {
      System.err.println(s"[verify] ENVIRONMENT FAILURE: $msg")
      try {
        new java.io.File(outDir).mkdirs()
        Files.writeString(Paths.get(s"$outDir/env_failure.json"),
          s"""{"env_failure": "${Bench.jsonEsc(msg).take(300)}"}""")
      } catch { case _: Throwable => () }
      sys.exit(2)
    }
    Bench.preflightDisk().foreach(envFail)
    try runAll(sfDir, outDir)
    catch {
      case t: Throwable =>
        Bench.classifyEnvFailure(t) match {
          case Some(kind) => envFail(kind)
          case None => throw t // a real defect must stay a loud crash
        }
    }
  }

  private def runAll(sfDir: String, outDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs for cross-checks, e.g. disabling whole-stage codegen to
    // exercise the interpreted path of custom expressions:
    // SPARK_GRAFT_CONF="spark.sql.codegen.wholeStage=false,..."
    // Entries split on ';' when present (for values that contain commas,
    // e.g. extraJavaOptions), else on ','; malformed entries fail loudly.
    sys.env.get("SPARK_GRAFT_CONF").foreach { raw =>
      val sep = if (raw.contains(';')) ';' else ','
      raw.split(sep).map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty => builder.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not key=value (separate entries with ';' or ',')")
        }
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (comma-separated names); the driver never
    // sets it, so the contract run always dumps every query
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSet
    val sel = if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    sel.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // an ENVIRONMENT death (disk full, OOM) must stop the run and
        // classify — swallowing it per-query would burn an hour failing
        // 150 more times and still produce a misleading artifact
        if (Bench.classifyEnvFailure(e).isDefined) throw e
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // contract oracles join the map at write time: their SQL reads the
    // dumped parquet (absolute path) and recomputes the statistical
    // contract in DuckDB, so the by-design rows-only queries (q23's
    // Bernoulli sample) become CHECKED cells in the driver's compare
    // instead of `no_oracle` nulls (VERDICT r16 #3)
    val absOut = new java.io.File(outDir).getAbsolutePath
    val json = (SparkEntry.oracleSql ++ SparkEntry.contractOracleSql(absOut))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // statistical contracts for the by-design rows-only queries: run the
    // named distributed checks and write <name>.contract.json, so the
    // correctness artifact self-describes the gate instead of `no_oracle`
    SparkEntry.statContracts
      .filter { case (n, _) => sel.contains(n) }
      .foreach { case (name, fn) =>
        val (status, checks) =
          try {
            val cs = fn(spark, sfDir)
            (if (cs.forall(_._2)) "stat_contract_ok" else "stat_contract_FAILED", cs)
          } catch { case e: Throwable =>
            ("stat_contract_ERROR", Seq(("contract_ran", false,
              String.valueOf(e.getMessage).take(200))))
          }
        val body = checks.map { case (n2, ok, detail) =>
          s"""{"name": ${q(n2)}, "ok": $ok, "detail": ${q(detail)}}"""
        }.mkString("[", ",", "]")
        Files.writeString(Paths.get(s"$outDir/$name.contract.json"),
          s"""{"contract": ${q(status)}, "checks": $body}""")
      }
    spark.stop()
  }
}
