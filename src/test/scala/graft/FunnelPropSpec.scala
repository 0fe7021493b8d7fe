package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Differential funnel checks: the distributed min-cascade vs a plain
  * in-memory fold over randomized event streams, plus the no-window
  * monotonicity law (adding events never lowers a key's stage). Spark
  * trials are expensive, so trial counts are tuned down — the value is
  * the adversarial shapes scalacheck finds (equal timestamps, steps
  * before anchors, empty keys), not volume. */
object FunnelPropSpec extends Properties("Funnel.funnel") {

  // each trial runs Spark jobs; 15 adversarial shapes beat 100 cheap ones
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestBase.session
  private val steps = Seq("a", "b", "c")

  /** Reference model: earliest step-1 anchor, then per later step the
    * earliest event strictly after the previous step (and within the
    * anchor's window when bounded). */
  private def model(events: Seq[(Long, Long, String)],
      span: Option[Long]): Map[Long, List[Long]] =
    events.groupBy(_._1).flatMap { case (k, evs) =>
      val byStep = steps.map(s => evs.filter(_._3 == s).map(_._2).sorted)
      byStep.head.headOption.map { t1 =>
        var ts = List(t1) // head = latest completed step, last = anchor
        var done = false
        byStep.tail.foreach { cand =>
          if (!done) {
            cand.find(t => t > ts.head &&
              span.forall(sp => t <= ts.last + sp)) match {
              case Some(t) => ts = t :: ts
              case None => done = true
            }
          }
        }
        k -> ts.reverse
      }
    }.toMap

  private val eventsGen: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 40L)
      e <- Gen.oneOf("a", "b", "c", "x")
    } yield (k, t, e))

  private def run(events: Seq[(Long, Long, String)],
      span: Option[Long]): Map[Long, List[Long]] = {
    import spark.implicits._
    Funnel.funnel(events.toDF("user_id", "us", "event_type"), steps,
        tsCol = "us", maxSpan = span.map(lit(_)))
      .collect().map { r =>
        r.getLong(0) -> (2 to 4).toList
          .flatMap(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
  }

  property("equals the in-memory model, with and without a window") =
    forAll(eventsGen, Gen.option(Gen.choose(1L, 25L))) { (events, span) =>
      run(events, span) == model(events, span)
    }

  property("without a window, adding events never lowers a stage") =
    forAll(eventsGen, eventsGen) { (base, extra) =>
      val before = run(base, None).view.mapValues(_.length).toMap
      val after = run(base ++ extra, None).view.mapValues(_.length).toMap
      before.forall { case (k, st) => after.getOrElse(k, 0) >= st }
    }
}
