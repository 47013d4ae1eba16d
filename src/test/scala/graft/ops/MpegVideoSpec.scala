package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the MPEG-1-syntax video codec: every decoded quadrant must
  * match the closed-form model (each quadrant pins a distinct mechanism —
  * skipped-MB carry, intra DC prediction, motion-compensated prediction
  * plus dequantized residual, and the differential-MV displaced copy),
  * malformed containers must be rejected, and the chroma path must decode
  * to its coded value.
  */
class MpegVideoSpec extends AnyFunSuite {

  private def quad(py: Array[Byte], w: Int, qx: Int, qy: Int): Set[Int] =
    (0 until 16).flatMap(y => (0 until 16).map(x =>
      py((qy * 16 + y) * w + qx * 16 + x) & 0xff)).toSet

  test("decode matches the closed-form model on a planted payload") {
    // bytes chosen to exercise: positive and negative residual levels, the
    // L=0 -> 1 substitution, clamping at 0, and multi-frame copy chains
    val payload = new Array[Byte](40) // 5 frames
    payload(0) = 100 // s: static value
    payload(8) = 200.toByte // f1: b=200, raw=(200&63)-32=8 -> L=8
    payload(16) = 32 // f2: raw=(32&63)-32=0 -> L=1
    payload(24) = 5 // f3: raw=5-32=-27 -> L=-27
    payload(32) = 250.toByte // f4: raw=(250&63)-32=26
    val (w, h, ys, _) = MpegVideoCodec.decodeFrames(
      MpegVideoCodec.encode(payload)).get
    assert(w == 32 && h == 32 && ys.length == 5)
    val s = 100
    def model(f: Int): (Int, Int, Int, Int) = {
      if (f == 0) (s, s, s, s)
      else {
        val b = payload(8 * f) & 0xff
        val raw = (b & 63) - 32
        val l = if (raw == 0) 1 else raw
        val mc = math.max(0, math.min(255, s + 2 * l + Integer.signum(l)))
        val copy = if (f == 1) s else payload(8 * (f - 1)) & 0xff
        (b, s, mc, copy)
      }
    }
    for (f <- 0 until 5) {
      val (q0, q1, q2, q3) = model(f)
      // each quadrant must be FLAT at the model value — a non-flat
      // quadrant means MC/IDCT leakage, not just a wrong mean
      assert(quad(ys(f), w, 0, 0) == Set(q0), s"frame $f refresh")
      assert(quad(ys(f), w, 1, 0) == Set(q1), s"frame $f static carry")
      assert(quad(ys(f), w, 0, 1) == Set(q2), s"frame $f mc+residual")
      assert(quad(ys(f), w, 1, 1) == Set(q3), s"frame $f displaced copy")
    }
  }

  test("chroma decodes flat 128 through its own DC predictor and MC path") {
    val payload = Array.tabulate(24)(i => ((i * 37 + 11) % 256).toByte)
    val (_, _, _, cbs) = MpegVideoCodec.decodeFrames(
      MpegVideoCodec.encode(payload)).get
    cbs.foreach(cb => assert(cb.forall(b => (b & 0xff) == 128)))
  }

  test("clamp boundaries: residuals saturate at 0 and 255") {
    // s=0 with a negative residual must clamp at 0; s=255 with positive at 255
    val lo = new Array[Byte](16)
    lo(0) = 0; lo(8) = 0 // raw=-32 -> L=-32 -> delta=-65 -> clamp 0
    val (w1, _, ys1, _) = MpegVideoCodec.decodeFrames(
      MpegVideoCodec.encode(lo)).get
    assert(quad(ys1(1), w1, 0, 1) == Set(0))
    val hi = new Array[Byte](16)
    hi(0) = 255.toByte; hi(8) = 63 // raw=31 -> delta=+63 -> 255+63 clamp
    val (w2, _, ys2, _) = MpegVideoCodec.decodeFrames(
      MpegVideoCodec.encode(hi)).get
    assert(quad(ys2(1), w2, 0, 1) == Set(255))
  }

  test("malformed containers are rejected, not misdecoded") {
    val good = MpegVideoCodec.encode(Array.tabulate(16)(_.toByte))
    assert(MpegVideoCodec.decodeFrames(good).isDefined)
    // no sequence header
    assert(MpegVideoCodec.decodeFrames(good.drop(8)).isEmpty)
    // dimensions not macroblock-aligned: patch width 32 -> 33
    val badW = good.clone()
    badW(5) = ((badW(5) & 0xf0) | 0x02).toByte // width high bits
    assert(MpegVideoCodec.decodeFrames(badW).isEmpty ||
      MpegVideoCodec.decodeFrames(badW).get._1 == 32)
    // truncation mid-picture
    assert(MpegVideoCodec.decodeFrames(good.take(good.length / 2)).isEmpty)
    // empty
    assert(MpegVideoCodec.decodeFrames(Array.emptyByteArray).isEmpty)
  }

  test("single-frame payloads produce exactly the I picture") {
    val p = Array[Byte](42, 1, 2, 3)
    val (_, _, ys, _) = MpegVideoCodec.decodeFrames(
      MpegVideoCodec.encode(p)).get
    assert(ys.length == 1)
    assert(ys(0).forall(b => (b & 0xff) == 42))
  }
}
