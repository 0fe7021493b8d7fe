package graft

import graft.pipeline.Unigram
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the unigram Viterbi kernel — the pure function
  * both training's E-step and encoding close over. No Spark session. */
object UnigramPropSpec extends Properties("Unigram.viterbi") {

  private val wordGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  // vocab: all single chars (coverage) plus a random subset of the
  // word's substrings, scores in [1, 1e18]
  private val caseGen: Gen[(String, Map[String, Long])] = for {
    w <- wordGen
    subs = (for {
      i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)
    } yield w.substring(i, i + l)).distinct
    picked <- Gen.someOf(subs.filter(_.length > 1))
    scores <- Gen.listOfN(picked.size + 3,
      Gen.choose(1L, Unigram.Scale))
  } yield {
    val pieces = Seq("a", "b", "c") ++ picked
    (w, pieces.zip(scores).toMap)
  }

  property("coverage: pieces always concatenate back to the word") =
    forAll(caseGen) { case (w, scores) =>
      Unigram.viterbi(w, scores, 4).mkString == w
    }

  property("determinism: same inputs, same segmentation") =
    forAll(caseGen) { case (w, scores) =>
      Unigram.viterbi(w, scores, 4).sameElements(Unigram.viterbi(w, scores, 4))
    }

  property("optimality: product matches brute-force max over all segmentations") =
    forAll(caseGen) { case (w, scores) =>
      def prob(p: String): Double =
        scores.get(p).map(_.toDouble * 1e-18)
          .getOrElse(if (p.length == 1) 1e-18 else 0.0)
      // enumerate every segmentation with pieces <= 4 chars
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(4, s.length)).flatMap(l =>
          segs(s.substring(l)).map(s.substring(0, l) +: _))
      val best = segs(w).map(_.map(prob).product).max
      val got = Unigram.viterbi(w, scores, 4).map(prob).product
      got == best
    }

  property("tie policy: among max-product segmentations, piece count is minimal") =
    forAll(caseGen) { case (w, scores) =>
      def prob(p: String): Double =
        scores.get(p).map(_.toDouble * 1e-18)
          .getOrElse(if (p.length == 1) 1e-18 else 0.0)
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(4, s.length)).flatMap(l =>
          segs(s.substring(l)).map(s.substring(0, l) +: _))
      val all = segs(w).map(seg => (seg.map(prob).product, seg.length))
      val best = all.map(_._1).max
      val minPieces = all.filter(_._1 == best).map(_._2).min
      val got = Unigram.viterbi(w, scores, 4)
      got.map(prob).product == best && got.length == minPieces
    }

  property("unknown chars segment as themselves without failing") =
    forAll(wordGen) { w =>
      val out = Unigram.viterbi(w, Map.empty[String, Long], 4)
      out.mkString == w && out.forall(_.length == 1)
    }
}
