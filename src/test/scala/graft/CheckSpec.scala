package graft

class CheckSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Check._

  test("check: hand-computed violations for every constraint type") {
    val df = Seq(
      (1L, Option(5.0), Option("a")),
      (1L, Option(20.0), Option("b")), // duplicated key 1: 2 rows implicated
      (2L, None: Option[Double], Option("c")), // null v (NOT a range violation)
      (3L, Option(-1.0), None: Option[String]) // below range; k=3 not in dim
    ).toDF("k", "v", "s")
    val dim = Seq(1L, 2L).toDF("k")
    val rep = check(df, Seq(
        NotNull("v"), Unique(Seq("k")), InRange("v", 0.0, 10.0),
        RefIn("k", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("rows") == 4)
    assert(rep("not_null(v)") == 1)
    assert(rep("unique(k)") == 2, s"rows implicated, not group count: $rep")
    assert(rep("in_range(v,0.0,10.0)") == 2, s"20.0 and -1.0: $rep")
    assert(rep("ref_in(k->k)") == 1, s"k=3 has no dim match: $rep")
    // all-clean frame reports zeros (and the empty-groups coalesce holds)
    val clean = check(dim, Seq(NotNull("k"), Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean == Map("rows" -> 2L, "not_null(k)" -> 0L, "unique(k)" -> 0L))
  }

  test("check: null FKs are not ref violations; invalid configs raise") {
    val df = Seq((Option(1L), "x"), (None: Option[Long], "y"), (Option(9L), "z"))
      .toDF("k", "s")
    val dim = Seq(1L).toDF("k")
    val rep = check(df, Seq(RefIn("k", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("ref_in(k->k)") == 1, s"only k=9 violates (null passes): $rep")
    intercept[IllegalArgumentException](InRange("k", 5.0, 1.0))
    intercept[IllegalArgumentException](Unique(Nil))
    intercept[IllegalArgumentException](check(df, Nil))
  }
}
