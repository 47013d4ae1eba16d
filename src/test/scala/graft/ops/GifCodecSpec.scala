package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GifCodec

/** The GIF LZW coder: container round-trips, the raw code stream against a
  * hand-derived sequence (KwKwK case), dictionary reset on large inputs, and
  * fail-soft on adversarial headers.
  */
class GifCodecSpec extends AnyFunSuite {

  /** Deterministic pseudo-random bytes (LCG) — no RNG state in the suite. */
  private def bytes(n: Int, seed: Long): Array[Byte] = {
    var x = seed
    Array.fill(n) { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33).toByte }
  }

  private def roundtrip(payload: Array[Byte]): Unit = {
    val g = GifCodec.encode(payload)
    val (w, h, px) = GifCodec.decodePixels(g)
      .getOrElse(fail(s"decode failed for payload len ${payload.length}"))
    assert(w == 16)
    assert(h == math.max(1, (payload.length + 15) / 16))
    val expected = java.util.Arrays.copyOf(payload, w * h)
    assert(java.util.Arrays.equals(px, expected),
      s"pixel mismatch at len ${payload.length}")
  }

  test("container round-trip across payload shapes") {
    roundtrip(Array.emptyByteArray)                    // all-zero single row
    roundtrip(Array[Byte](42))                         // single pixel + padding
    roundtrip("hello gif world, hello gif world".getBytes("UTF-8"))
    roundtrip(Array.fill[Byte](1000)(97))              // max-repetition: KwKwK chains
    roundtrip((0 until 256).map(_.toByte).toArray)     // every index once
    roundtrip(bytes(257, 7))                           // non-row-aligned tail
  }

  test("dictionary reset: inputs past 4096 entries still round-trip") {
    // ~12k random bytes create >4096 distinct 2-grams, forcing the encoder's
    // CLEAR + reset path and the decoder's mid-stream dictionary rebuild
    roundtrip(bytes(12288, 99))
    // repetitive-then-random stresses reset with long chains in the table
    roundtrip(Array.fill[Byte](2048)(7) ++ bytes(8192, 5))
  }

  test("raw LZW stream matches the hand-derived code sequence (KwKwK)") {
    // "aaaa" (a=97): CLEAR, 97, 258 (the code being defined = KwKwK), 97, EOI
    val enc = GifCodec.lzwEncode(Array[Byte](97, 97, 97, 97))
    def codes(data: Array[Byte], widths: Seq[Int]): Seq[Int] = {
      var acc = 0L; var nbits = 0; var pos = 0
      widths.map { w =>
        while (nbits < w) { acc |= (data(pos) & 0xffL) << nbits; nbits += 8; pos += 1 }
        val c = (acc & ((1L << w) - 1)).toInt; acc >>= w; nbits -= w; c
      }
    }
    assert(codes(enc, Seq(9, 9, 9, 9, 9)) == Seq(256, 97, 258, 97, 257))
    val dec = GifCodec.lzwDecode(enc, 8, 100).get
    assert(dec.toSeq == Seq[Byte](97, 97, 97, 97))
  }

  test("malformed streams and adversarial headers fail soft") {
    // code referencing a dictionary entry that cannot exist yet
    val bad = {
      // CLEAR(256), then 300 — far beyond next (258)
      var acc = 0L; var nbits = 0
      val out = new java.io.ByteArrayOutputStream()
      for (c <- Seq(256, 300)) {
        acc |= c.toLong << nbits; nbits += 9
        while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      if (nbits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
    assert(GifCodec.lzwDecode(bad, 8, 100).isEmpty)
    // truncated stream: bits run out before EOI
    val ok = GifCodec.lzwEncode(bytes(64, 3))
    assert(GifCodec.lzwDecode(ok.take(2), 8, 10000).isEmpty)
    // header-declared dimensions far beyond the decode budget: the 64 MiB
    // cap rejects before allocation (65535 × 65535 ≈ 4.3 G pixels)
    val big = GifCodec.encode(Array[Byte](1, 2, 3))
    big(6) = 0xff.toByte; big(7) = 0xff.toByte
    big(8) = 0xff.toByte; big(9) = 0xff.toByte
    assert(GifCodec.decodePixels(big).isEmpty)
  }
}
