package graft

import graft.dsl._
import graft.ops.{Ops => O}

/** Generative trap-diversion property (reference :trap semantics,
  * cascading_api_test.clj:112-224; oracle-keyed example = q48): for a
  * random input, a random failure predicate inside a trapped op, an
  * optional PRE-FILTER, and an optional aggregation, the trap sink and
  * the query output must PARTITION the filtered input exactly:
  *
  *  - trapped rows == rows that pass the filter AND fail the op, as a
  *    multiset — exactly-once diversion, and filters-first semantics
  *    (rows the filter drops are never offered to the op, so they are
  *    never trapped);
  *  - survivors == the query over pass-and-succeed rows;
  *  - with aggregation, diversion happens BEFORE grouping (the counts
  *    see only surviving rows — q48's contract, here swept randomly).
  */
class TrapPropSpec extends SparkTestBase {

  test("random trap queries: trap + survivors partition the input (120 cases)") {
    val rnd = new scala.util.Random(4815162342L)
    for (caseId <- 0 until 120) {
      val n = 10 + rnd.nextInt(50)
      val rows: Seq[(Long, Long)] =
        Seq.fill(n)((rnd.nextInt(8).toLong, rnd.nextInt(40).toLong))
      val m = 2 + rnd.nextInt(4)
      val r = rnd.nextInt(m)
      val useFilter = rnd.nextBoolean()
      val cut = 5L + rnd.nextInt(30)
      val agg = rnd.nextBoolean()

      def fails(v: Long): Boolean = v % m == r
      val f: Long => Long = v =>
        if (fails(v)) throw new IllegalStateException(s"boom $v") else v + 7

      val data = rows.map(t => Seq[Any](t._1, t._2))
      var trapDf: org.apache.spark.sql.DataFrame = null
      // predicates are first-class values — assemble the random shape once
      val preds: Seq[PredLike] =
        Seq[PredLike](mem(data)(Seq("?k", "?v"): _*)) ++
          (if (useFilter) Seq[PredLike](O.lt("?v", cut)) else Nil) ++
          Seq[PredLike](trapped(f, "?v") :> "?o") ++
          (if (agg) Seq[PredLike](O.count() :> "?cnt") else Nil)
      val outs: Seq[Any] = if (agg) Seq("?k", "?cnt") else Seq("?k", "?o")
      val q = query(outs: _*)(preds: _*).withTrap(df => trapDf = df)

      val out = q.toDF(spark).collect()
      val kept = rows.filter(t => !useFilter || t._2 < cut)
      val expTrapped = kept.filter(t => fails(t._2)).sorted
      val gotTrapped =
        if (trapDf == null) Seq.empty
        else trapDf.select("k", "v").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      assert(gotTrapped == expTrapped,
        s"case $caseId (m=$m r=$r filter=$useFilter cut=$cut agg=$agg): " +
          s"trapped $gotTrapped != expected $expTrapped")

      val survivors = kept.filterNot(t => fails(t._2))
      if (agg) {
        val expected = survivors.groupBy(_._1)
          .map { case (k, ts) => (k, ts.size.toLong) }.toSeq.sorted
        val got = out.map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        assert(got == expected,
          s"case $caseId: aggregated survivors $got != $expected")
      } else {
        val expected = survivors.map(t => (t._1, t._2 + 7)).sorted
        val got = out.map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        assert(got == expected,
          s"case $caseId: survivors $got != $expected")
      }
    }
  }
}
