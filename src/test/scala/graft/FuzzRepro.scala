package graft

import scala.util.Random

/** Scratch reproducer: rebuild a failing PlannerDiffPropSpec seed and
  * print model vs engine. Usage: Test/runMain graft.FuzzRepro <seed> */
object FuzzRepro {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val spark = SparkTestBase.session
    val spec = PlannerDiffPropSpec.buildSpec(new Random(seed))
    println(spec.describe)
    val model = PlannerFuzz.modelRun(spec)
    println(s"model: $model")
    val engine =
      try Right(PlannerFuzz.toQuery(spec).toDF(spark).collect().toSeq.map(_.toSeq))
      catch { case e: Exception => Left(e.toString) }
    println(s"engine: $engine")
    spark.stop()
  }
}
