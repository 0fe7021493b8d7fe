package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  // 1000 rows of hot key 7, a sprinkle of cold keys; right has multi-row
  // keys so per-row multiplicity must survive salting exactly
  lazy val fact = ((1 to 1000).map(i => (java.lang.Long.valueOf(7L), s"h$i")) ++
    (1 to 50).map(i => (java.lang.Long.valueOf(i.toLong % 5), s"c$i")) ++
    Seq((null: java.lang.Long, "n1"), (java.lang.Long.valueOf(99L), "lonely")))
    .toDF("k", "v")
  lazy val dim = Seq((7L, "hot-a"), (7L, "hot-b"), (0L, "zero"), (1L, "one"),
    (2L, "two"), (42L, "unmatched")).toDF("k", "w")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("salted inner/left_outer/left_semi/left_anti equal the plain joins") {
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), jt,
        salts = 4, hotKeyThreshold = 100)
      val plain = fact.join(dim, Seq("k"), jt)
      assert(canon(salted) == canon(plain), s"join type $jt diverged")
      assert(plain.count() > 0)
    }
  }

  test("hot key rows actually spread over multiple salts") {
    val hot = SkewJoin.hotKeys(fact, Seq("k"), 100)
    assert(canon(hot) == Seq("7"))
    // the operator's own salt expressions (saltBasis/saltExpr), not a replica
    val spread = fact.filter(col("k") === 7)
      .withColumn("_salt",
        SkewJoin.saltExpr(SkewJoin.saltBasis(fact.columns, Seq("v")), 4))
      .select("_salt").distinct().count()
    assert(spread > 1, "1000 distinct rows must land in >1 of 4 salts")
  }

  test("IDENTICAL rows of a hot key still spread (key-only projection)") {
    // the ADVICE-r8 failure case: a pure content hash sends all 1000
    // identical rows to ONE salt, recreating the skew — the default
    // basis mixes in a positional id so duplicates spread too
    val keyOnly = fact.select("k").filter(col("k") === 7) // 1000 identical rows
    val spread = keyOnly
      .withColumn("_salt",
        SkewJoin.saltExpr(SkewJoin.saltBasis(keyOnly.columns, Seq.empty), 4))
      .select("_salt").distinct().count()
    assert(spread > 1, "1000 identical rows must land in >1 of 4 salts")
    // and the join result through the operator stays exact on duplicates
    val salted = SkewJoin.saltedJoin(keyOnly, dim, Seq("k"), "inner",
      salts = 4, hotKeyThreshold = 100)
    assert(canon(salted) == canon(keyOnly.join(dim, Seq("k"))))
    // caller-named unique column: pure row function, also spreads
    val byCol = fact.filter(col("k") === 7)
      .withColumn("_salt",
        SkewJoin.saltExpr(SkewJoin.saltBasis(fact.columns, Seq("v")), 4))
      .select("_salt").distinct().count()
    assert(byCol > 1)
  }

  test("persisted key-stats tap: hot set without re-scanning the input") {
    val dir = java.nio.file.Files.createTempDirectory("graft_keystats").toString
    SkewJoin.writeKeyStats(fact, Seq("k"), dir)
    val hot = SkewJoin.hotFromStats(spark, dir, Seq("k"), 100)
    assert(canon(hot) == Seq("7"))
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), "inner",
      salts = 4, hot = Some(hot), saltBy = Seq("v"))
    assert(canon(salted) == canon(fact.join(dim, Seq("k"))))
    // the counting pass over `fact` is skipped: the salted plan reads the
    // stats parquet, and no count aggregate (hotKeys' signature) appears —
    // the only remaining Aggregate is the tiny dedup over the stats tap
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("parquet"), plan.takeRight(500))
    assert(!plan.contains("count(1)"), "stats tap must replace the counting pass")
  }

  test("caller-provided hot set skips detection and stays exact") {
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), "inner",
      salts = 8, hot = Some(Seq(Tuple1(7L)).toDF("k")))
    assert(canon(salted) == canon(fact.join(dim, Seq("k"))))
  }

  test("right/full outer join types are rejected") {
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "cross"))
      assertThrows[IllegalArgumentException] {
        SkewJoin.saltedJoin(fact, dim, Seq("k"), jt)
      }
  }

  test("randomized: salted == plain for every join type, shape, and salt count") {
    val rnd = new scala.util.Random(8)
    for (it <- 1 to 8) {
      val nKeys = 1 + rnd.nextInt(6)
      val hot = rnd.nextInt(nKeys).toLong
      val l = (1 to 30 + rnd.nextInt(200)).map { i =>
        val k = if (rnd.nextDouble() < 0.6) hot else rnd.nextInt(nKeys).toLong
        (java.lang.Long.valueOf(k), s"l$i")
      } ++ (if (rnd.nextBoolean()) Seq((null: java.lang.Long, "ln")) else Nil)
      val r = (1 to 1 + rnd.nextInt(12)).map { i =>
        (java.lang.Long.valueOf(rnd.nextInt(nKeys + 2).toLong), s"r$i")
      }
      val lf = l.toDF("k", "v"); val rf = r.toDF("k", "w")
      val salts = 2 + rnd.nextInt(7)
      val thr = 1L + rnd.nextInt(40)
      for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
        val s = SkewJoin.saltedJoin(lf, rf, Seq("k"), jt, salts, thr)
        assert(canon(s) == canon(lf.join(rf, Seq("k"), jt)),
          s"iter $it jt=$jt salts=$salts thr=$thr")
      }
    }
  }

  test("edge shapes: empty sides, all-hot, salts exceeding rows") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val one = Seq((1L, "x")).toDF("k", "v")
    assert(SkewJoin.saltedJoin(empty, dim.withColumnRenamed("w", "v"),
      Seq("k"), "inner", 4, 1).count() == 0)
    assert(SkewJoin.saltedJoin(fact, empty.withColumnRenamed("v", "w"),
      Seq("k"), "left_outer", 4, 100).count() == fact.count())
    // every key hot (threshold 0), salts >> rows: still exact
    val s = SkewJoin.saltedJoin(one, dim, Seq("k"), "inner",
      salts = 64, hotKeyThreshold = 0)
    assert(canon(s) == canon(one.join(dim, Seq("k"))))
  }

  test("null keys never match and survive left_outer exactly once") {
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), "left_outer",
      salts = 4, hotKeyThreshold = 100)
    assert(salted.filter(col("k").isNull).count() == 1)
    assert(salted.filter(col("k").isNull && col("w").isNotNull).count() == 0)
  }
}
