package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a compact bit-array filter over the
  * build side's join keys, semi-filter the probe side BEFORE its shuffle,
  * then run the exact join.
  *
  * At 100 TB the win is shuffle bytes: when the build side is selective,
  * the probe side's exchange shrinks by the filter's selectivity while the
  * final join keeps the result exact — bloom false positives only cost
  * wasted shuffle, never wrong rows. Spark's own runtime bloom filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) cover the
  * planner-visible cases; this is the library-level form for build sides
  * the optimizer can't see through (checkpointed stages, computed dims,
  * filters reused across several probe-side jobs).
  *
  * Everything stays IN THE PLAN: the filter is a one-row DataFrame built
  * with map-side-combinable aggregation (explode positions → distinct →
  * per-word `bit_or` masks → dense `array<bigint>`), broadcast and tested
  * with pure Catalyst expressions per probe row — no driver collect, no
  * UDFs.
  */
object BloomJoin {

  // both hashes pre-modded into [0, numBits): i·h2 then stays far below
  // Long.MaxValue for any sane numHashes (ANSI mode would reject raw
  // xxhash64 values in the double-hashing arithmetic)
  private def h1(keyCols: Seq[String], numBits: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(numBits.toLong))
  private def h2(keyCols: Seq[String], numBits: Int): Column =
    pmod(xxhash64(lit(0x9747b28cL) +: keyCols.map(col): _*), lit(numBits.toLong))

  /** One-pass dense bloom build: each partition folds its rows' bit
    * positions into a local word array (the partial), partials OR together
    * word-wise (the merge) — Spark's own BloomFilterAggregate shape. ONE
    * exchange of ≤ words longs per partition, no explode/regroup/densify
    * stages: the previous explode → bit_or-per-word → collect_list → UDF
    * pipeline planned two extra stages and paid for their codegen on every
    * cold run. Buffer is numBits/8 bytes per partition (128 KiB at the
    * 2^20 default) — size numBits to the executor, not the data. */
  private class BloomAgg(words: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](words)
    def reduce(buf: Array[Long], positions: Array[Long]): Array[Long] = {
      if (positions != null) {
        var i = 0
        while (i < positions.length) {
          val p = positions(i)
          buf((p >>> 6).toInt) |= 1L << (p & 63L).toInt
          i += 1
        }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the bloom filter over `keys`' `keyCols` as a one-row DataFrame
    * with a single `_bloom array<bigint>` column of ceil(numBits/64)
    * words. Double hashing: position_i = (h1 + i·h2) mod numBits. */
  def buildFilter(
      keys: DataFrame,
      keyCols: Seq[String],
      numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val words = (numBits + 63) / 64
    val pos = array((0 until numHashes).map(i =>
      pmod(h1(keyCols, numBits) + lit(i.toLong) * h2(keyCols, numBits),
        lit(numBits.toLong))): _*)
    val agg = udaf(new BloomAgg(words),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    keys.select(pos.as("_p")).agg(agg(col("_p")).as("_bloom"))
  }

  /** Keep only probe rows whose keys pass the bloom filter (supersets the
    * rows that actually join; never drops a joining row).
    *
    * The filter rides in as a SCALAR SUBQUERY consumed by ONE native
    * expression ([[graft.functions.BloomMightContain]]): Catalyst executes
    * the one-row build plan once and embeds the word array as a literal in
    * the probe stage's codegen, and the membership loop runs fused with an
    * early exit. Two earlier forms measured slower at sf0.1: a
    * crossJoin(broadcast(...)) dragged the KB–MB array through every probe
    * row's joined output (~6× warm), and numHashes AND'ed SQL conjuncts
    * each re-referenced the subquery — 10 subquery sites in the plan. This
    * is the execution shape of Spark's own runtime bloom filters
    * (BloomFilterMightContain over a ScalarSubquery build), for our
    * cross-engine-checkable filter layout. */
  def prune(
      probe: DataFrame,
      keyCols: Seq[String],
      bloom: DataFrame,
      numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    val check = graft.functions.BloomExpressions.mightContain(
      probe.sparkSession, bloom.scalar(),
      h1(keyCols, numBits), h2(keyCols, numBits), numBits.toLong, numHashes)
    probe.where(check)
  }

  /** Join types for which dropping non-matching FACT (left) rows cannot
    * change the result: every fact row the join would emit must match a
    * dim key, so a superset filter on dim keys is result-preserving.
    * left_outer/full_outer keep unmatched fact rows and left_anti returns
    * exactly the rows the bloom removes — pruning those would be wrong. */
  private val pruneSafeJoinTypes =
    Set("inner", "left_semi", "leftsemi", "semi", "right", "right_outer", "rightouter")

  /** Exact equi-join with the probe (fact) side bloom-pruned before its
    * shuffle. `keyCols` must exist on both sides (rename the dim's keys
    * first, as with any using-columns join). For join types where pruning
    * the fact side could drop result rows (left/full outer, left_anti),
    * falls back to the plain join — still exact, just unpruned. */
  def bloomJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      numBits: Int = 1 << 20,
      numHashes: Int = 5,
      joinType: String = "inner"): DataFrame = {
    val normalized = joinType.toLowerCase.replace("_", "")
    if (!pruneSafeJoinTypes.map(_.replace("_", "")).contains(normalized)) {
      fact.join(dim, keyCols, joinType)
    } else {
      val filt = buildFilter(dim.select(keyCols.map(col): _*), keyCols, numBits, numHashes)
      prune(fact, keyCols, filt, numBits, numHashes).join(dim, keyCols, joinType)
    }
  }
}
