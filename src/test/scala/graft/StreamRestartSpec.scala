package graft

import org.apache.spark.sql.functions._

/** Checkpoint RECOVERY: the gate's replay harness drains a stream in one
  * AvailableNow run, but a production stream is stopped and restarted —
  * state must reload from the checkpoint and the sink must stay
  * exactly-once across the boundary. This spec splits the staged files
  * into two generations, runs a file-sink query to completion on the
  * first, then REUSES the same checkpoint + sink for a second run over
  * the late-arriving files, and requires the combined output to equal
  * the one-shot run bit-for-bit — for a watermarked window aggregation
  * (p83's shape: the watermark must persist across the restart, or
  * already-emitted windows would re-emit) and flatMapGroupsWithState
  * sessions (p85's shape:
  * open sessions must carry across the restart in state). */
class StreamRestartSpec extends SparkTestBase {
  import spark.implicits._

  private val pid = java.lang.ProcessHandle.current().pid()
  private val root = s"/tmp/graft_restart_spec_$pid"

  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally graft.streaming.Streams.deleteRecursivelyNoFollow(root)

  /** One staged parquet file with a controlled mtime — the file source
    * replays in modification-time order, so generation 2's file arrives
    * strictly after generation 1's. Shared by all four tests. */
  private def stageDf(dir: String, df: org.apache.spark.sql.DataFrame,
      mtime: Long): Unit = {
    val p = java.nio.file.Files.createTempDirectory("graft_restart_stage")
    df.coalesce(1).write.mode("overwrite").parquet(p.toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val part = p.toFile.listFiles().filter(_.getName.startsWith("part-")).head
    val dst = java.nio.file.Paths.get(dir, part.getName)
    java.nio.file.Files.move(part.toPath, dst)
    dst.toFile.setLastModified(mtime): Unit
    graft.streaming.Streams.deleteRecursivelyNoFollow(p.toString)
  }

  /** Events: 3 users × sessions split so that a session and a window
    * STRADDLE the generation boundary — the restart must resume both. */
  private def events: Seq[(Long, Long)] = // (user, epoch seconds)
    for (u <- 1L to 3L; base <- Seq(0L, 5000L, 100000L, 105000L, 500000L);
         off <- 0L until 3L) yield (u, base + off * 60L + u)

  private def stage(dir: String, rows: Seq[(Long, Long)], mtime: Long): Unit =
    stageDf(dir, rows.toDF("user_id", "sec"), mtime)

  private def runToSink(srcDir: String, ckpt: String, out: String,
      schema: String = "user_id LONG, sec LONG")(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = f(src).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def windowAgg(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ets", timestamp_seconds(col("sec")))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("user_id"), col("cnt"))

  private def sessions(df: org.apache.spark.sql.DataFrame) =
    graft.streaming.Streams.sessionizeClosed(
        df.select(col("user_id"), (col("sec") * 1000000L).as("us"))
          .as[(Long, Long)], gap = 1800000000L) // 30 min in µs
      .toDF("user_id", "start_us", "end_us", "n_events")

  /** MULTISET of output rows (sorted Seq, not Set): a restart bug that
    * re-emits gen-1 rows must fail the equality, not be collapsed away. */
  private def collected(path: String): Seq[Seq[Any]] =
    spark.read.parquet(path).collect().toSeq.map(_.toSeq)
      .sortBy(_.mkString("|"))

  test("watermarked window agg: restart from checkpoint == one-shot run") {
    val ordered = events.sortBy(_._2)
    val (gen1, gen2) = ordered.splitAt(ordered.length / 2)
    // generation boundary cuts event time mid-window: the restart
    // reloads the watermark and partial window state from the checkpoint
    stage(s"$root/w/src", gen1, 1000L)
    runToSink(s"$root/w/src", s"$root/w/ckpt", s"$root/w/out")(windowAgg)
    val afterGen1 = collected(s"$root/w/out")
    stage(s"$root/w/src", gen2, 2000L)
    runToSink(s"$root/w/src", s"$root/w/ckpt", s"$root/w/out")(windowAgg)
    val restarted = collected(s"$root/w/out")

    stage(s"$root/w1/src", gen1, 1000L)
    stage(s"$root/w1/src", gen2, 2000L)
    runToSink(s"$root/w1/src", s"$root/w1/ckpt", s"$root/w1/out")(windowAgg)
    val oneShot = collected(s"$root/w1/out")

    assert(restarted == oneShot,
      s"restart diverged: ${restarted.diff(oneShot)} vs ${oneShot.diff(restarted)}")
    assert((afterGen1 diff restarted).isEmpty, // multiset containment
      "restart re-emitted or lost gen-1 windows")
    assert(restarted.size > afterGen1.size, "gen 2 emitted nothing — vacuous test")
  }

  test("flatMapGroupsWithState sessions: restart from checkpoint == one-shot run") {
    val ordered = events.sortBy(_._2)
    val (gen1, gen2) = ordered.splitAt(ordered.length / 2)
    stage(s"$root/s/src", gen1, 1000L)
    runToSink(s"$root/s/src", s"$root/s/ckpt", s"$root/s/out")(sessions)
    stage(s"$root/s/src", gen2, 2000L)
    runToSink(s"$root/s/src", s"$root/s/ckpt", s"$root/s/out")(sessions)
    val restarted = collected(s"$root/s/out")

    stage(s"$root/s1/src", gen1, 1000L)
    stage(s"$root/s1/src", gen2, 2000L)
    runToSink(s"$root/s1/src", s"$root/s1/ckpt", s"$root/s1/out")(sessions)
    val oneShot = collected(s"$root/s1/out")

    assert(restarted == oneShot,
      s"restart diverged: ${restarted.diff(oneShot)} vs ${oneShot.diff(restarted)}")
    assert(restarted.nonEmpty, "no sessions closed — vacuous test")
  }

  test("mapGroupsWithState sketch state: restart from checkpoint == batch sketch") {
    // p88's SketchState shape across a REAL restart: the product-encoded
    // (n, cells) state must reload from the checkpoint so the second
    // generation folds on top of the first, not from empty. Update-mode
    // output goes through foreachBatch into parquet; the final emission
    // per key (max n_seen) must equal the batch KMV over ALL rows.
    import graft.operators.Sketches
    val rows = (0L until 80L).map(i =>
      (s"g${i % 3}", (i * 2654435761L) % 1000003L))
    val (gen1, gen2) = rows.splitAt(40)
    def kmvRun(srcDir: String, ckpt: String, out: String): Unit = {
      val src = spark.readStream.schema("k STRING, h LONG")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = graft.streaming.Streams.streamingKmvDistinct(
          src.as[(String, Long)], k = 8)
        .toDF("k", "n", "sz", "est")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def stageKmv(dir: String, rs: Seq[(String, Long)], mtime: Long): Unit =
      stageDf(dir, rs.toDF("k", "h"), mtime)
    stageKmv(s"$root/k/src", gen1, 1000L)
    kmvRun(s"$root/k/src", s"$root/k/ckpt", s"$root/k/out")
    stageKmv(s"$root/k/src", gen2, 2000L)
    kmvRun(s"$root/k/src", s"$root/k/ckpt", s"$root/k/out")
    val fin = spark.read.parquet(s"$root/k/out")
      .groupBy("k")
      .agg(max_by(struct(col("sz"), col("est")), col("n")).as("w"),
        max(col("n")).as("n"))
      .collect().map(r => (r.getString(0),
        r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val batch = rows.toDF("k", "h").groupBy("k")
      .agg(size(Sketches.kmv(col("h"), 8)).cast("long").as("sz"),
        Sketches.kmvEstimate(Sketches.kmv(col("h"), 8), 8).as("est"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(fin == batch,
      s"sketch state across restart diverged:\n$fin\nvs batch\n$batch")
  }

  test("stream-stream interval join: restart from checkpoint == one-shot run") {
    // the symmetric hash join's buffered-row state AND watermark must
    // reload: left rows arriving before the restart must still match
    // right rows arriving after it
    val rows: Seq[(String, Long, Long)] =
      (for (u <- 1L to 3L; i <- 0L until 20L)
        yield ((if (i % 3 == 0) "L" else "R"), u, i * 600L + u)).sortBy(_._3)
    val (gen1, gen2) = rows.splitAt(rows.length / 2)
    val boundary = gen2.head._3
    def stage3(dir: String, rs: Seq[(String, Long, Long)], mtime: Long): Unit =
      stageDf(dir, rs.toDF("side", "user_id", "sec"), mtime)
    def joined(df: org.apache.spark.sql.DataFrame) = {
      val ts = df.withColumn("ets", timestamp_seconds(col("sec")))
      val l = ts.filter(col("side") === "L")
        .select(col("user_id"), col("ets").as("l_ts"))
      val r = ts.filter(col("side") === "R")
        .select(col("user_id"), col("ets").as("r_ts"))
      graft.streaming.Streams.intervalJoin(l, r, Seq("user_id"),
          "l_ts", "r_ts", watermark = "1 hour",
          before = "0 seconds", after = "30 minutes")
        .select(col("user_id"), unix_seconds(col("l_ts")).as("l_sec"),
          unix_seconds(col("r_ts")).as("r_sec"))
    }
    val sch = "side STRING, user_id LONG, sec LONG"
    stage3(s"$root/j/src", gen1, 1000L)
    runToSink(s"$root/j/src", s"$root/j/ckpt", s"$root/j/out", sch)(joined)
    stage3(s"$root/j/src", gen2, 2000L)
    runToSink(s"$root/j/src", s"$root/j/ckpt", s"$root/j/out", sch)(joined)
    val restarted = collected(s"$root/j/out")

    stage3(s"$root/j1/src", gen1, 1000L)
    stage3(s"$root/j1/src", gen2, 2000L)
    runToSink(s"$root/j1/src", s"$root/j1/ckpt", s"$root/j1/out", sch)(joined)
    val oneShot = collected(s"$root/j1/out")

    assert(restarted == oneShot,
      s"restart diverged: ${restarted.diff(oneShot)} vs ${oneShot.diff(restarted)}")
    // the carry proof: at least one pair joins across the generation
    // boundary (left buffered before the restart, right arriving after)
    assert(restarted.exists(r =>
        r(1).asInstanceOf[Long] < boundary && r(2).asInstanceOf[Long] >= boundary),
      s"no cross-boundary pair (boundary=$boundary) — state carry untested")
  }
}
