package graft

import graft.pipeline.Bpe
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the BPE merge kernel — the single left-to-right
  * non-overlapping pass both training and encoding fold over. The
  * properties are what make a merge list a TOKENIZER: merging never
  * loses or reorders characters, a pass leaves no (a, b) adjacency
  * behind (with nonempty symbols a+b can equal neither a nor b, so a
  * merge cannot recreate its own pair), and a second pass is a no-op. */
object BpePropSpec extends Properties("Bpe.mergePass") {

  private val symGen = Gen.choose(1, 3)
    .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val symsGen = Gen.listOf(symGen).map(_.toArray)
  // bias pairs toward symbols actually present so merges fire often
  private def pairGen(syms: Array[String]): Gen[(String, String)] =
    if (syms.length >= 2)
      Gen.oneOf(
        Gen.choose(0, syms.length - 2).map(i => (syms(i), syms(i + 1))),
        Gen.zip(symGen, symGen))
    else Gen.zip(symGen, symGen)

  property("concatenation invariant: merging never alters the character stream") =
    forAll(symsGen.flatMap(s => pairGen(s).map(p => (s, p)))) { case (s, (a, b)) =>
      Bpe.mergePass(s, a, b).mkString == s.mkString
    }

  property("no adjacent (a, b) survives a pass") =
    forAll(symsGen.flatMap(s => pairGen(s).map(p => (s, p)))) { case (s, (a, b)) =>
      val out = Bpe.mergePass(s, a, b)
      !out.iterator.sliding(2).withPartial(false)
        .exists(w => w.head == a && w(1) == b)
    }

  property("a second pass is a no-op") =
    forAll(symsGen.flatMap(s => pairGen(s).map(p => (s, p)))) { case (s, (a, b)) =>
      val once = Bpe.mergePass(s, a, b)
      Bpe.mergePass(once, a, b).sameElements(once)
    }

  property("merge count: length shrinks by exactly the a+b symbols created") =
    forAll(symsGen.flatMap(s => pairGen(s).map(p => (s, p)))) { case (s, (a, b)) =>
      val out = Bpe.mergePass(s, a, b)
      // pre-existing a+b SYMBOLS are never consumed (only the (a, b)
      // PAIR merges), so created = count delta; each merge shrinks the
      // array by one
      s.length - out.length == out.count(_ == a + b) - s.count(_ == a + b)
    }
}
