package graft

import graft.pipeline.Multimodal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz properties for the MJPEG-in-AVI RIFF walker: decoders facing
  * 100 TB of crawled bytes must treat ANY input as data, so the parser's
  * contract is parse-or-null — never a throw, never an over-read. The
  * generators cover arbitrary garbage, truncations/mutations of a valid
  * file (the realistic corruption model), and adversarial chunk sizes. */
object AviPropSpec extends Properties("avi-parser") {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  private def list(listType: String, inner: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ inner)

  /** A minimal valid AVI with `n` fake (non-JPEG) frame payloads. */
  private def validAvi(n: Int, usPerFrame: Long, w: Int, h: Int): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(n) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val frames =
      if (n == 0) Array.empty[Byte]
      else (0 until n).map(i => chunk("00dc", Array.fill(8 + i % 3)(i.toByte)))
        .reduce(_ ++ _)
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih)) ++ list("movi", frames)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  property("arbitrary bytes parse or return null, never throw") =
    forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        Multimodal.parseAvi(bytes) // throw = property failure
        true
    }

  property("valid AVIs parse with exact header fields and frame count") =
    forAll(Gen.chooseNum(0, 24), Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(1, 4096), Gen.chooseNum(1, 4096)) { (n, us, w, h) =>
      val info = Multimodal.parseAvi(validAvi(n, us, w, h))
      if (n == 0) info == null // no frames, no total -> not a usable AVI
      else info != null && info.frames.length == n && info.usPerFrame == us &&
        info.width == w && info.height == h && info.totalFrames == n
    }

  property("truncating a valid AVI anywhere parses-or-nulls and never over-reads") =
    forAll(Gen.chooseNum(1, 12), Gen.chooseNum(0.0, 1.0)) { (n, frac) =>
      val full = validAvi(n, 40000L, 320, 240)
      val cut = full.take((full.length * frac).toInt)
      val info = Multimodal.parseAvi(cut)
      // every recorded frame span must lie inside the truncated buffer
      info == null || info.frames.forall { case (off, len) =>
        off >= 0 && len > 0 && off + len <= cut.length
      }
    }

  property("single-byte mutations parse-or-null with in-bounds frame spans") =
    forAll(Gen.chooseNum(1, 8), Gen.chooseNum(0, 10000), Gen.chooseNum(0, 255)) {
      (n, posSeed, value) =>
        val bytes = validAvi(n, 40000L, 64, 48)
        val mutated = bytes.clone()
        mutated(posSeed % bytes.length) = value.toByte
        val info = Multimodal.parseAvi(mutated)
        info == null || info.frames.forall { case (off, len) =>
          off >= 0 && len > 0 && off + len <= mutated.length
        }
    }

  property("deeply nested LIST chunks return null, no StackOverflowError") =
    forAll(Gen.chooseNum(1, 20000)) { depth =>
      // RIFF('AVI ') wrapping `depth` nested LISTs: recursion must cap,
      // not blow the JVM stack (an Error would escape the Exception
      // handler and kill the Spark task)
      val innermost = Array.fill(4)(9.toByte)
      val nested = (1 to depth).foldLeft(innermost)((inner, _) => list("aaaa", inner))
      val body = "AVI ".getBytes("US-ASCII") ++ nested
      val bytes = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
      Multimodal.parseAvi(bytes) == null // no frames, no header
    }

  property("adversarial chunk sizes (negative/huge as u32) cannot over-read") =
    forAll(Gen.oneOf(Gen.chooseNum(0L, 0xFFFFFFFFL),
      // the non-advancing sizes: -8 as u32 keeps the cursor stationary
      // without the negative-size guard (infinite loop), and its even
      // neighbors walk the cursor backward — pin them explicitly
      Gen.oneOf(0xFFFFFFF8L, 0xFFFFFFF6L, 0xFFFFFFFAL, 0x80000000L))) { evilSize =>
      val body = "AVI ".getBytes("US-ASCII") ++
        "evil".getBytes("US-ASCII") ++ le32(evilSize) ++ Array.fill(16)(7.toByte)
      val bytes = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
      Multimodal.parseAvi(bytes) == null // no frames, no header -> null
    }
}
