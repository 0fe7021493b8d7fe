package graft

import graft.pipeline.Similarity
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the SQ8 quantization kernel (the pure functions
  * [[Similarity.sqEncode]] / [[Similarity.sqDeqTable]] that the sqIndex
  * UDF and the sqKnn scoring table are built from): codes stay in the
  * byte range for ANY input, bin-midpoint reconstruction error is
  * bounded by half a bin for in-range values, encoding is monotone in
  * the value, and degenerate (constant) dimensions behave. No Spark
  * session — the kernel is what the distributed paths close over. */
object QuantizationPropSpec extends Properties("Similarity.sq8") {

  private val dimGen = Gen.choose(1, 8)
  private val valGen = Gen.choose(-1e6f, 1e6f)
  // a corpus column per dim: 2..24 finite floats
  private def corpusGen(dims: Int): Gen[List[List[Float]]] =
    Gen.listOfN(dims, Gen.choose(2, 24).flatMap(n => Gen.listOfN(n, valGen)))

  private def bounds(cols: List[List[Float]]): (Array[Double], Array[Double]) =
    (cols.map(_.min.toDouble).toArray, cols.map(_.max.toDouble).toArray)

  property("codes are always bytes, even for out-of-range probes") =
    forAll(dimGen.flatMap(corpusGen), Gen.listOf(valGen)) { (cols, noise) =>
      val (mins, maxs) = bounds(cols)
      // probe each dim with arbitrary values, not just corpus members
      val probe = mins.indices.map(i =>
        noise.lift(i).getOrElse(cols(i).head)).toSeq
      Similarity.sqEncode(mins, maxs, probe).forall(c => c >= 0 && c <= 255)
    }

  property("bin-midpoint error <= span/510 (+fp) for in-range values") =
    forAll(dimGen.flatMap(corpusGen)) { cols =>
      val (mins, maxs) = bounds(cols)
      val dq = Similarity.sqDeqTable(mins, maxs)
      // every corpus value is in [min, max] by construction
      cols.indices.forall { i =>
        cols(i).forall { v =>
          val code = Similarity.sqEncode(mins, maxs,
            Array.tabulate(mins.length)(j => cols(j).head.toFloat).updated(i, v).toSeq)(i)
          val span = maxs(i) - mins(i)
          val bound = span / 510.0 * (1 + 1e-9) + 1e-9
          math.abs(v.toDouble - dq(i)(code)) <= bound
        }
      }
    }

  property("encoding is monotone in the value") =
    forAll(dimGen.flatMap(corpusGen), valGen, valGen) { (cols, a, b) =>
      val (mins, maxs) = bounds(cols)
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      def codeAt(v: Float): Int = Similarity.sqEncode(mins, maxs,
        Array.tabulate(mins.length)(j => cols(j).head.toFloat).updated(0, v).toSeq)(0)
      codeAt(lo) <= codeAt(hi)
    }

  property("constant dim: code 0, dequantizes exactly to the constant") =
    forAll(valGen, Gen.choose(0, 255)) { (v, anyCode) =>
      val mins = Array(v.toDouble); val maxs = Array(v.toDouble)
      Similarity.sqEncode(mins, maxs, Seq(v))(0) == 0 &&
        Similarity.sqDeqTable(mins, maxs)(0)(anyCode) == v.toDouble
    }
}
