package graft

import graft.functions.BloomMightContain
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the bloom membership kernel against a trivial
  * reference bit set: inserted keys are ALWAYS found (the no-false-
  * negative contract pruning correctness rests on), and any probe agrees
  * with the reference word-array test exactly — for every (numBits,
  * numHashes) geometry. Pure-JVM via the expression's interpreted eval;
  * the codegen path is pinned to it by BloomJoinSpec's parity test. */
object BloomPropSpec extends Properties("BloomJoin.mightContain") {

  private val geomGen = for {
    words <- Gen.choose(1, 64)
    numHashes <- Gen.choose(1, 8)
  } yield (words * 64, numHashes)

  // a key is its two pre-modded hashes (the operator mods before probing)
  private def keyGen(numBits: Int): Gen[(Long, Long)] = for {
    h1 <- Gen.choose(0L, numBits - 1L)
    h2 <- Gen.choose(0L, numBits - 1L)
  } yield (h1, h2)

  private def positions(h1: Long, h2: Long, numBits: Int, numHashes: Int): Seq[Long] =
    (0 until numHashes).map(i => (h1 + i.toLong * h2) % numBits)

  private def build(keys: Seq[(Long, Long)], numBits: Int, numHashes: Int): Array[Long] = {
    val bits = new Array[Long]((numBits + 63) / 64)
    keys.flatMap { case (h1, h2) => positions(h1, h2, numBits, numHashes) }
      .foreach(p => bits((p >>> 6).toInt) |= 1L << (p & 63L).toInt)
    bits
  }

  private def evalCheck(bits: Array[Long], h1: Long, h2: Long,
      numBits: Int, numHashes: Int): Boolean =
    BloomMightContain(Seq(
      Literal.create(bits, ArrayType(LongType)),
      Literal(h1), Literal(h2),
      Literal(numBits.toLong), Literal(numHashes)))
      .eval(null).asInstanceOf[Boolean]

  property("no false negatives: every inserted key passes") =
    forAll(geomGen) { case (numBits, numHashes) =>
      forAll(Gen.listOf(keyGen(numBits))) { keys =>
        val bits = build(keys, numBits, numHashes)
        keys.forall { case (h1, h2) => evalCheck(bits, h1, h2, numBits, numHashes) }
      }
    }

  property("any probe agrees with the reference bit test") =
    forAll(geomGen) { case (numBits, numHashes) =>
      forAll(Gen.listOf(keyGen(numBits)), keyGen(numBits)) { (keys, probe) =>
        val bits = build(keys, numBits, numHashes)
        val (h1, h2) = probe
        val reference = positions(h1, h2, numBits, numHashes).forall(p =>
          ((bits((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L)
        evalCheck(bits, h1, h2, numBits, numHashes) == reference
      }
    }

  property("null inputs evaluate to null, never throw") =
    forAll(geomGen) { case (numBits, numHashes) =>
      BloomMightContain(Seq(
        Literal.create(null, ArrayType(LongType)),
        Literal(0L), Literal(0L),
        Literal(numBits.toLong), Literal(numHashes))).eval(null) == null
    }
}
