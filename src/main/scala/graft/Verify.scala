package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    val json = SparkEntry.oracleSql
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
