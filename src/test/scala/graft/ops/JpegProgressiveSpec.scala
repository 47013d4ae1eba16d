package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JpegCodec

/** The progressive (SOF2) JPEG path: four-scan successive approximation
  * must reconstruct the EXACT coefficient array the encoder started from —
  * pinned bit-for-bit on the flat layout (the q170 oracle's exactness
  * trick) and cross-validated against an independent IDCT on rich content
  * that exercises every G.1.2.3 refinement path (newly-nonzero codes,
  * correction bits appended after EOBn, EOB-covered blocks, runs spanning
  * the 16-block chunking).
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private val payload =
    (0 until 64).map(i => ((i * 31 + 7) % 256).toByte).toArray

  test("flat progressive roundtrip is bit-exact (DC first + refinement)") {
    val (w, h, px) = JpegProgressive.decodeProgressivePixels(
      JpegProgressive.encodeProgressive(payload)).get
    assert(w === 32 && h === payload.length / 4 * 8)
    // every 8×8 block is flat at the payload byte value
    for (b <- payload.indices) {
      val x0 = (b % 4) * 8; val y0 = (b / 4) * 8
      for (y <- 0 until 8; x <- 0 until 8)
        assert((px((y0 + y) * w + (x0 + x)) & 0xff) === (payload(b) & 0xff),
          s"block $b pixel ($x,$y)")
    }
  }

  test("odd DC values survive the Al=1 split (shift + refinement bit)") {
    // bytes straddling even/odd and the negative-dc range
    val p2 = Array[Byte](0, 1, 2, 127.toByte, 128.toByte, 129.toByte,
      254.toByte, 255.toByte)
    val (_, _, px) = JpegProgressive.decodeProgressivePixels(
      JpegProgressive.encodeProgressive(p2)).get
    for (b <- p2.indices)
      assert((px((b / 4) * 8 * 32 + (b % 4) * 8) & 0xff) === (p2(b) & 0xff))
  }

  test("rich progressive decode matches an independent IDCT of the known coefficients") {
    // coefficient set per block: dc = v-128 (q 8), c1 = (v mod 64)-32 (q 1)
    // — v mod 64 spans 0..63, so c1 covers negative, -1/+1 (newly-nonzero
    // in the refinement scan), 0 (EOB), and |c1| >= 2 (correction bits)
    val rich = (0 until 256).map(_.toByte).toArray
    val (w, _, px) = JpegProgressive.decodeProgressivePixels(
      JpegProgressive.encodeProgressiveRich(rich)).get
    val cos = Array.tabulate(8, 8)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    val cn = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)
    for (b <- rich.indices) {
      val v = rich(b) & 0xff
      val coef = new Array[Int](64)
      coef(0) = (v - 128) * 8
      coef(1) = ((v % 64) - 32) * 1
      // the decoder's separable IDCT, replicated operation-for-operation
      val tmp = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var acc = 0.0
        for (u <- 0 until 8) acc += cn(u) * coef(y * 8 + u) * cos(u)(x)
        tmp(y * 8 + x) = 0.5 * acc
      }
      val x0 = (b % 4) * 8; val y0 = (b / 4) * 8
      for (y <- 0 until 8; x <- 0 until 8) {
        var acc = 0.0
        for (vv <- 0 until 8) acc += cn(vv) * tmp(vv * 8 + x) * cos(vv)(y)
        val expect = math.max(0L, math.min(255L, math.round(0.5 * acc + 128.0)))
        assert((px((y0 + y) * w + (x0 + x)) & 0xff) === expect.toInt,
          s"block $b (v=$v, c1=${(v % 64) - 32}) pixel ($x,$y)")
      }
    }
  }

  test("baseline decoder rejects progressive and vice versa") {
    assert(JpegCodec.decodePixels(JpegProgressive.encodeProgressive(payload)).isEmpty)
    assert(JpegProgressive.decodeProgressivePixels(JpegCodec.encode(payload)).isEmpty)
  }
}
