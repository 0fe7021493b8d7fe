package graft

import graft.pipeline.TextAnalysis
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the quantized-rational BM25 kernels
  * ([[TextAnalysis.bm25Tfq]] / [[TextAnalysis.bm25Idfq]] — the exact
  * double ops the Column expressions compile to and the streaming gate
  * runs): range bounds, the k1+1 saturation ceiling, monotonicity in
  * tf / dl / df, and idf positivity. No Spark session — these are the
  * pure functions the distributed paths close over. */
object Bm25PropSpec extends Properties("TextAnalysis.bm25q") {

  // a consistent corpus shape: n docs, one doc of length dl holding the
  // term tf times, total corpus tokens s >= dl, df in [1, n]
  private val shapeGen: Gen[(Long, Long, Long, Long, Long)] = for {
    n <- Gen.choose(1L, 1000000L)
    dl <- Gen.choose(1L, 100000L)
    tf <- Gen.choose(1L, dl)
    extra <- Gen.choose(0L, 10000000L)
    df <- Gen.choose(1L, n)
  } yield (n, dl, tf, dl + extra * (n min 1000L), df)

  property("tfq in (0, 2.2e6]: positive and under the k1+1 ceiling") =
    forAll(shapeGen) { case (n, dl, tf, s, _) =>
      val v = TextAnalysis.bm25Tfq(tf, dl, s, n)
      v > 0L && v <= 2200000L
    }

  property("tfq is monotone nondecreasing in tf") =
    forAll(shapeGen) { case (n, dl, tf, s, _) =>
      tf >= dl || TextAnalysis.bm25Tfq(tf, dl, s, n) <=
        TextAnalysis.bm25Tfq(tf + 1, dl, s, n)
    }

  property("tfq is nonincreasing in dl (longer docs dilute)") =
    forAll(shapeGen) { case (n, dl, tf, s, _) =>
      TextAnalysis.bm25Tfq(tf, dl, s, n) >=
        TextAnalysis.bm25Tfq(tf, dl + 1, s + 1, n)
    }

  property("idfq is nonnegative and nonincreasing in df") =
    forAll(shapeGen) { case (n, _, _, _, df) =>
      val v = TextAnalysis.bm25Idfq(df, n)
      v >= 0L && (df >= n || v >= TextAnalysis.bm25Idfq(df + 1, n))
    }

  property("idfq of a unique term (df=1) dominates every other df") =
    forAll(shapeGen) { case (n, _, _, _, df) =>
      TextAnalysis.bm25Idfq(1L, n) >= TextAnalysis.bm25Idfq(df, n)
    }

  property("tfq saturates: doubling tf never doubles the score") =
    forAll(shapeGen) { case (n, dl, tf, s, _) =>
      // concavity of A·tf/(B·tf+C) through the origin gives r(2tf) <=
      // 2·r(tf) exactly; quantization can add at most one floor quantum
      TextAnalysis.bm25Tfq(2 * tf, dl, s, n) <=
        2 * TextAnalysis.bm25Tfq(tf, dl, s, n) + 1
    }
}
