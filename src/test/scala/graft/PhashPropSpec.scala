package graft

import graft.pipeline.Multimodal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM properties of the image pHash kernel over randomized
  * images: determinism, EXACT invariance under the lossless PNG
  * round-trip (decode → re-encode preserves pixels, so the hash must
  * not move a single bit), and rough bit balance from the median
  * threshold. */
object PhashPropSpec extends Properties("Multimodal.pHash") {

  private def render(side: Int, seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(seed) // seeded: scalacheck owns the seed
    // random low-frequency mixture + pixel noise
    val amps = Array.fill(4)(rnd.nextDouble() * 60)
    val fx = Array.fill(4)(1 + rnd.nextInt(5))
    val fy = Array.fill(4)(1 + rnd.nextInt(5))
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        var acc = 127.0
        var k = 0
        while (k < 4) {
          acc += amps(k) * math.sin(2 * math.Pi * fx(k) * x / side + k) *
            math.cos(2 * math.Pi * fy(k) * y / side + 2 * k)
          k += 1
        }
        acc += rnd.nextInt(21) - 10
        val v = acc.toInt.max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val caseGen = for {
    side <- Gen.choose(8, 96)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (side, seed)

  property("deterministic on identical bytes") = forAll(caseGen) {
    case (side, seed) =>
      val b = png(render(side, seed))
      Multimodal.pHashOf(b) == Multimodal.pHashOf(b)
  }

  property("EXACTLY invariant under a lossless png round-trip") =
    forAll(caseGen) { case (side, seed) =>
      val b = png(render(side, seed))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      Multimodal.pHashOf(b) == Multimodal.pHashOf(png(img))
    }

  property("median threshold keeps bit counts away from the rails") =
    forAll(caseGen) { case (side, seed) =>
      val bits = java.lang.Long.bitCount(
        Multimodal.pHashOf(png(render(side, seed))).longValue)
      bits >= 8 && bits <= 56
    }
}
