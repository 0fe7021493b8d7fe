package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate heavy hitters via MISRA-GRIES summaries — the hot-key /
  * boilerplate-token detector for corpora where a full groupBy-count
  * would shuffle the entire item universe (10¹² distinct n-grams at
  * 100 TB). The summary is a TRUE partial aggregation: every task keeps
  * at most k counters; map-side summaries merge associatively (sum
  * counters, subtract the (k+1)-th largest, drop ≤0), so the shuffle
  * carries ≤ k·tasks counters total.
  *
  * Guarantees (classic MG): every item with true count > n/k survives in
  * the summary, and each reported count is within n/k of truth. The
  * candidate SET beyond the guaranteed members depends on merge order, so
  * [[heavyHitters]] finishes with an exact count of the ≤k candidates
  * (a broadcast semi-join — the long tail never shuffles) and filters by
  * the true threshold: the result is exactly
  * `{item : true_count(item) > n/k}`, deterministic and independently
  * checkable (the DuckDB oracle recomputes it as GROUP BY + HAVING).
  */
object FrequentItems {

  final case class MGSummary(counts: Map[String, Long], n: Long)

  /** Product-encoded buffer (NOT `Encoders.kryo` over a mutable map:
    * Kryo's field serializer on Scala collections is flaky under the
    * whole-suite bench JVM — one EXPRESSION_ENCODING_FAILED observed at
    * sf0.1 — while the buffer only ever crosses the wire as a partial
    * state, where a plain Catalyst map encodes fine). The map stays
    * immutable: it holds ≤ k entries, so per-row persistent updates are
    * O(1) amortized at MG's k≤64 working set. */
  final case class MGBuf(counts: Map[String, Long], n: Long)

  private final class MGAgg(k: Int) extends Aggregator[String, MGBuf, MGSummary] {

    def zero: MGBuf = MGBuf(Map.empty, 0L)

    def reduce(b: MGBuf, item: String): MGBuf = {
      if (item == null) return MGBuf(b.counts, b.n + 1)
      b.counts.get(item) match {
        case Some(c) => MGBuf(b.counts.updated(item, c + 1), b.n + 1)
        case None if b.counts.size < k => MGBuf(b.counts.updated(item, 1L), b.n + 1)
        case None =>
          // decrement-all step; drop zeros
          MGBuf(b.counts.flatMap { case (it, c) =>
            if (c == 1) None else Some(it -> (c - 1))
          }, b.n + 1)
      }
    }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      var m = a.counts
      b.counts.foreach { case (it, c) => m = m.updated(it, m.getOrElse(it, 0L) + c) }
      if (m.size > k) {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        m = m.flatMap { case (it, c) =>
          if (c - cut <= 0) None else Some(it -> (c - cut))
        }
      }
      MGBuf(m, a.n + b.n)
    }

    def finish(b: MGBuf): MGSummary = MGSummary(b.counts, b.n)

    def bufferEncoder = Encoders.product[MGBuf]
    def outputEncoder = Encoders.product[MGSummary]
  }

  /** One-pass MG summary of `itemCol`: ≤ k (item, lower-bound count)
    * candidates plus the total item count n. Approximate by design —
    * use [[heavyHitters]] for the exact thresholded set. */
  def summary(df: DataFrame, itemCol: String, k: Int): MGSummary = {
    require(k >= 1)
    val agg = udaf(new MGAgg(k), Encoders.STRING)
    val row = df.select(agg(col(itemCol).cast("string")).as("s"))
      .select("s.counts", "s.n").head()
    MGSummary(row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  /** Exact heavy hitters `{item : count(item) > n/k}` in two passes:
    * MG candidates (one partial agg, ≤k counters shuffled), then an
    * exact count of candidates only (the long tail is semi-joined away
    * before the shuffle). Driver holds only the ≤k candidate strings —
    * the same KB-scale materialization as a k-means codebook. */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val s = summary(df, itemCol, k)
    val threshold = s.n / k
    val candDf = broadcast(
      spark.createDataset(s.counts.keys.toSeq)(Encoders.STRING).toDF(itemCol))
    df.join(candDf, Seq(itemCol), "left_semi")
      .groupBy(itemCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
  }
}
