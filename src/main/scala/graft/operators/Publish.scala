package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset lifecycle at rest: small-file compaction and
  * write-audit-publish — the two maintenance operations a corpus that is
  * WRITTEN continuously (recrawl deltas, annotation passes, dedup
  * rewrites) needs beside the query operators.
  *
  * Both speak the Hadoop FileSystem API, so "directory" means the same
  * thing it does on a cluster (HDFS rename is atomic; on object stores
  * the [[publish]] pointer file IS the atomic commit — the same
  * metadata-pointer idea table formats use, reduced to one file).
  *
  * At 100 TB:
  *  - [[compact]] is one distributed read→exchange→write per run; the
  *    file listing is driver-side METADATA (names + lengths only, no
  *    data), and the output file count is sized from measured input
  *    bytes, not guessed. Range mode keeps a sort key clustered so
  *    min/max footer pruning survives the rewrite.
  *  - [[publish]] stages the full write OFF the serving path, audits the
  *    staged files themselves (constraints run on what readers would
  *    see, not on the DataFrame that produced it), and promotes by one
  *    rename + one pointer swap — readers never observe a half-written
  *    version, and a failed audit leaves the previous version serving.
  */
object Publish {

  final case class CompactReport(
      filesIn: Long, bytesIn: Long, filesOut: Long, bytesOut: Long)

  final case class PublishReport(
      version: Long, published: Boolean, rows: Long,
      violations: Seq[(String, Long)]) {
    def violationsOrEmpty: String =
      violations.map { case (n, v) => s"$n=$v" }.mkString(",")
  }

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files under `dir` (recursive), ignoring underscore/dot-prefixed
    * metadata (_SUCCESS, _manifest, .crc) — the same visibility rule
    * Spark's readers apply. */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val f = fs(spark, dir)
    val it = f.listFiles(new Path(dir), true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
        out += ((st.getPath.toString, st.getLen))
    }
    out.result()
  }

  /** Rewrite the parquet dataset at `inDir` into ceil(bytes/target)
    * files at `outDir`. With `sortCols`, rows range-partition + sort on
    * the key (compaction preserves clustering, so footer min/max pruning
    * on that key keeps working); without, round-robin (uniform file
    * sizes, no skew exposure). Returns measured in/out listings. The
    * rewrite is one job: size estimation reads NO data, only the
    * listing. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCols: Seq[String] = Nil): CompactReport = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val in = dataFiles(spark, inDir)
    require(in.nonEmpty, s"compact: no data files under $inDir")
    val bytesIn = in.map(_._2).sum
    val nOut = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.isEmpty) df.repartition(nOut)
      else df.repartitionByRange(nOut, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    shaped.write.mode("overwrite").parquet(outDir)
    val out = dataFiles(spark, outDir)
    CompactReport(in.size, bytesIn, out.size, out.map(_._2).sum)
  }

  private def pointer(root: String) = new Path(root, "_LATEST")

  /** Highest published version, from the pointer file (None before the
    * first publish). One metadata read — what a reader pays to locate
    * the current version. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = pointer(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        Some(s.toLong)
      } finally in.close()
    }
  }

  /** The currently-published dataset. Throws if nothing has been
    * published — "no version yet" must not read as "empty corpus". */
  def current(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"publish root $root has no published version"))
    spark.read.parquet(s"$root/v$v")
  }

  /** Per-micro-batch write-audit-COMMIT — the streaming face of the
    * publish pattern ([[graft.streaming.Streams.streamingPublish]]
    * drives it from `foreachBatch`): the batch stages under
    * `root/_tmp/batch_{id}`, the STAGED FILES are audited, and a clean
    * batch promotes to `root/batch={id}` with a `_COMMITTED` marker
    * written LAST — readers ([[readCommitted]]) union exactly the
    * marked dirs, so a half-written or failed batch is never visible.
    * A dirty batch's staging is deleted and the batch skipped: the
    * served corpus never sees it.
    *
    * Idempotent per batch id (foreachBatch re-delivers a batch after a
    * restart): an already-committed id returns true without rewriting;
    * an uncommitted leftover dir from a crashed attempt is replaced.
    * Returns whether the batch is committed. */
  def publishBatch(df: DataFrame, root: String, batchId: Long,
      constraints: Seq[Check.Constraint] = Nil): Boolean = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val finalPath = new Path(root, s"batch=$batchId")
    val marker = new Path(finalPath, "_COMMITTED")
    if (f.exists(marker)) return true
    if (f.exists(finalPath)) f.delete(finalPath, true) // crashed, uncommitted
    val stagingPath = new Path(root, s"_tmp/batch_$batchId")
    if (f.exists(stagingPath)) f.delete(stagingPath, true)
    df.write.mode("error").parquet(stagingPath.toString)
    val clean = constraints.isEmpty || {
      val staged = spark.read.parquet(stagingPath.toString)
      !Check.check(staged, constraints).collect()
        .exists(r => r.getString(0) != "rows" && r.getLong(1) > 0)
    }
    if (!clean) { f.delete(stagingPath, true); false }
    else {
      require(f.rename(stagingPath, finalPath),
        s"rename $stagingPath -> $finalPath failed")
      f.create(marker, true).close() // marker LAST: commit point
      true
    }
  }

  /** Retention for a [[publish]] root (vacuum): delete published
    * versions older than the newest `keepLast`, never the currently
    * served one. Returns the deleted version numbers. Staging leftovers
    * under `_tmp/` older than the current version are cleaned too (a
    * crashed publish's debris). Driver-side metadata listing + one
    * recursive delete per expired version — no data read.
    *
    * The pointer is the safety contract: [[current]] resolves through
    * `_LATEST`, so expiring v1..vN-k can never break a reader that
    * re-resolves; a reader holding a file handle into an expired
    * version is the same snapshot-expiry contract every table format
    * has (retention must exceed the longest query). */
  def expireVersions(spark: SparkSession, root: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, root)
    val cur = currentVersion(spark, root).getOrElse(
      sys.error(s"publish root $root has no published version"))
    val versions = f.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.drop(1).toLong).sorted
    val expire = versions.dropRight(keepLast).filter(_ != cur)
    expire.foreach(v => f.delete(new Path(root, s"v$v"), true))
    val tmp = new Path(root, "_tmp")
    if (f.exists(tmp)) f.listStatus(tmp).toSeq
      .filter(st => st.getPath.getName.matches("staging_v\\d+") &&
        st.getPath.getName.stripPrefix("staging_v").toLong < cur)
      .foreach(st => f.delete(st.getPath, true))
    expire
  }

  /** The committed batches of a [[publishBatch]] root, as one dataset.
    * Lists `batch=*` dirs bearing the `_COMMITTED` marker (driver-side
    * metadata only) and reads exactly those. Returns None when nothing
    * has committed yet (distinct from an empty committed batch). */
  def readCommitted(spark: SparkSession, root: String): Option[DataFrame] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return None
    val dirs = f.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch=") &&
        f.exists(new Path(st.getPath, "_COMMITTED")))
      .map(_.getPath.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*))
  }

  /** Write-audit-publish. Stages `df` under `root/_tmp/staging_v{version}`,
    * re-reads the STAGED FILES and audits them ([[Check]] constraints +
    * optional exact row-count expectation), then either promotes
    * (rename to `root/v{version}`, pointer swap — after which
    * [[current]] serves this version) or deletes the staging dir and
    * reports the violations, leaving the previous version serving.
    *
    * Versions are strictly increasing: publishing at or below the
    * current version fails loudly rather than silently rewriting
    * history (a re-run with the same version is a pipeline bug, not an
    * idempotent no-op — the staged bytes could differ).
    *
    * The audit reads the staged parquet, so it covers the full
    * write-path (encoders, codecs, schema) — not just the logical plan
    * that produced the data. */
  def publish(df: DataFrame, root: String, version: Long,
      constraints: Seq[Check.Constraint] = Nil,
      expectRows: Option[Long] = None): PublishReport = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    currentVersion(spark, root).foreach { cur =>
      require(version > cur,
        s"publish version $version <= current $cur at $root (versions are strictly increasing)")
    }
    // staged under the underscore-hidden `_tmp/` (a root-level glob never
    // sees it) with a non-hidden LEAF name (the audit's direct read sees
    // every staged file, no hidden-path fallback involved)
    val stagingPath = new Path(root, s"_tmp/staging_v$version")
    val finalPath = new Path(root, s"v$version")
    require(!f.exists(finalPath),
      s"publish target $finalPath already exists (unpublished leftover? clean it explicitly)")
    if (f.exists(stagingPath)) f.delete(stagingPath, true)
    df.write.mode("error").parquet(stagingPath.toString)

    val staged = spark.read.parquet(stagingPath.toString)
    val report =
      if (constraints.isEmpty)
        staged.agg(count(lit(1)).as("value"))
          .select(lit("rows").as("check_name"), col("value"))
      else Check.check(staged, constraints)
    val rep = report.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val rows = rep.collectFirst { case ("rows", n) => n }.getOrElse(0L)
    val violations =
      rep.filter { case (n, v) => n != "rows" && v > 0 } ++
        expectRows.collect {
          case want if want != rows => (s"row_count(want=$want)", rows)
        }

    if (violations.nonEmpty) {
      f.delete(stagingPath, true)
      PublishReport(version, published = false, rows, violations)
    } else {
      require(f.rename(stagingPath, finalPath),
        s"rename $stagingPath -> $finalPath failed")
      // pointer swap: write-then-rename so readers see the old pointer
      // or the new one, never a torn file
      val tmp = new Path(root, s"_LATEST.tmp$version")
      val out = f.create(tmp, true)
      try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      val ptr = pointer(root)
      if (f.exists(ptr)) f.delete(ptr, false)
      require(f.rename(tmp, ptr), s"pointer swap to $ptr failed")
      PublishReport(version, published = true, rows, Nil)
    }
  }
}
