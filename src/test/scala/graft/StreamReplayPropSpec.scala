package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz over [[graft.streaming.Streams.replayAsStream]]'s
  * ordered staging: random row sets (heavy ties, spans narrower than the
  * split count, random key cardinalities), random split counts — every
  * case must reproduce the Scala-computed watermark-cutoff oracle. The
  * deterministic battery in StreamReplaySpec pins named shapes; this
  * spec walks the space between them with a seeded RNG (fully
  * reproducible, no wall-clock dependence).
  *
  * Event times stay non-negative on purpose: Spark's event-time
  * watermark starts at epoch 0 and only advances, so PRE-1970 event
  * times are all behind the initial watermark (late-dropped from the
  * second micro-batch on) — a Spark watermark contract boundary, not a
  * harness property. Watermarked replays of pre-1970 data are outside
  * the harness's contract. */
class StreamReplayPropSpec extends SparkTestBase {

  private val scratched = scala.collection.mutable.Buffer[String]()

  private def scratch(tag: String) = {
    val p = s"/tmp/graft_replay_prop_${tag}_${java.lang.ProcessHandle.current().pid()}"
    scratched.synchronized { scratched += p }
    p
  }

  override def afterAll(): Unit = {
    scratched.foreach(graft.streaming.Streams.deleteRecursivelyNoFollow)
    super.afterAll()
  }

  test("random ordered replays reproduce the watermark-cutoff oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x6772616674L) // seeded: reproducible
    val delaySec = 600L
    val winSec = 3600L
    var nonEmptyOutputs = 0
    for (c <- 0 until 24) {
      val n = 1 + rnd.nextInt(120)
      // spans range from 1 second (every row in one slice regardless of
      // parts) to ~23 days; bases spread over ~31 years from epoch 0
      val base = math.abs(rnd.nextLong()) % 1000000000L
      val span = 1L + (math.abs(rnd.nextLong()) % 2000000L)
      val secs = Vector.fill(n)(base + math.abs(rnd.nextLong()) % span)
      val keys = Vector.fill(n)(rnd.nextInt(1 + rnd.nextInt(9)).toLong)
      val parts = 1 + rnd.nextInt(7)
      val df = keys.zip(secs).toDF("k", "sec")
        .withColumn("ets", timestamp_seconds(col("sec")))
        .repartition(1 + rnd.nextInt(6))
      val out = graft.streaming.Streams.replayAsStream(
        df, scratch(s"c$c"), parts, "append", orderedBy = Some("ets")) { src =>
        src.withWatermark("ets", s"$delaySec seconds")
          .groupBy(col("k"), window(col("ets"), s"$winSec seconds"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("k"), unix_micros(col("window.start")).as("ws_us"),
            col("cnt"))
      }.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted
      // oracle: a (k, window) emits iff window_end <= floor_ms(max) - delay;
      // floorDiv handles negative epochs (window starts floor toward -inf)
      val wmUs = Math.floorDiv(secs.max * 1000000L, 1000L) * 1000L -
        delaySec * 1000000L
      val expected = keys.zip(secs)
        .map { case (k, t) =>
          (k, Math.floorDiv(t * 1000000L, winSec * 1000000L) * winSec * 1000000L)
        }
        .filter { case (_, ws) => ws + winSec * 1000000L <= wmUs }
        .groupBy(identity).map { case ((k, ws), g) => (k, ws, g.size.toLong) }
        .toSeq.sorted
      assert(out == expected,
        s"case $c diverged: n=$n parts=$parts base=$base span=$span")
      if (expected.nonEmpty) nonEmptyOutputs += 1
    }
    // vacuity guard: the generator must actually produce emitting cases
    assert(nonEmptyOutputs >= 8, s"only $nonEmptyOutputs non-empty cases")
  }
}
