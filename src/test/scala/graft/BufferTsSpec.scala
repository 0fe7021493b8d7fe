package graft

import graft.dsl._
import graft.ops.Ops
import org.apache.spark.sql.types._

class BufferTsSpec extends SparkTestBase {
  test("buffer passes timestamp values through") {
    val d = "/root/testdata/sf0.001"
    val firstDate = Ops.bufferSame(1) { it =>
      if (it.hasNext) Iterator.single(Seq(it.next().head)) else Iterator.empty
    }
    val df = query("?o_custkey", "?first_date")(
      source(s => s.read.parquet(s"$d/orders.parquet"))(
        "_", "?o_custkey", "_", "_", "?od", "_"),
      firstDate("?od") :> "?first_date").sorted("?od").toDF(spark)
    val rows = df.collect()
    assert(rows.length > 100)
    println("sample: " + rows.take(3).mkString(", "))
  }
}
