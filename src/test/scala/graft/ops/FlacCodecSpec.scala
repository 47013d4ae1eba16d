package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FlacCodec

/** The FLAC lossless codec: bit-exact round-trip across every subframe
  * type (CONSTANT / VERBATIM / FIXED 0–4), multi-frame streams with a short
  * last block, CRC enforcement, and the closed-form payload mapping q269's
  * oracle relies on.
  */
class FlacCodecSpec extends AnyFunSuite {

  private val payload =
    (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray

  test("payload encode decodes bit-exactly to the (b-128)*256 PCM mapping") {
    val flac = FlacCodec.encode(payload)
    assert(new String(flac.take(4)) == "fLaC")
    val Some(samples) = FlacCodec.decodeSamples(flac)
    assert(samples.length == payload.length)
    for (i <- payload.indices)
      assert(samples(i) == ((payload(i) & 0xff) - 128) * 256, s"sample $i")
  }

  test("multi-frame streams round-trip, including a short last block") {
    // 700 samples = 2 full 256-blocks + a 188-sample last frame
    for (n <- Seq(1, 255, 256, 257, 700)) {
      val pcm = Array.tabulate(n)(i => ((i * 7919 + 13) % 65536) - 32768)
      val Some(back) = FlacCodec.decodeSamples(FlacCodec.encodePcm(pcm))
      assert(back.length == n, s"n=$n length")
      assert(back.map(_.toInt).sameElements(pcm), s"n=$n samples")
    }
  }

  test("every fixed predictor order round-trips exactly") {
    // smooth polynomial-ish content where each order is exercised
    val ramps = Seq(
      Array.fill(300)(1234), // constant → order 0 residuals all equal
      Array.tabulate(300)(i => i * 11 - 1500), // linear → order 2 zeros
      Array.tabulate(300)(i => (i * i) / 8 - 5000), // quadratic → order 3
      Array.tabulate(300)(i => ((i * i * i) / 2000) - 6000)) // cubic → order 4
    for ((pcm, idx) <- ramps.zipWithIndex; order <- 0 to 4) {
      val Some(back) = FlacCodec.decodeSamples(FlacCodec.encodePcm(pcm, forceOrder = order))
      assert(back.map(_.toInt).sameElements(pcm), s"ramp $idx order $order")
    }
  }

  test("constant and verbatim subframes round-trip exactly") {
    val flat = Array.fill(600)(-12345)
    val Some(c) = FlacCodec.decodeSamples(FlacCodec.encodePcm(flat))
    assert(c.map(_.toInt).sameElements(flat))
    val noisy = Array.tabulate(300)(i => ((i * 48271 + 7) % 65536) - 32768)
    val Some(v) = FlacCodec.decodeSamples(FlacCodec.encodePcm(noisy, forceVerbatim = true))
    assert(v.map(_.toInt).sameElements(noisy))
  }

  test("LPC subframes round-trip exactly at several orders") {
    // correlated content (noisy sine-ish recurrence) where LPC is at home
    val pcm = {
      val out = new Array[Int](1000)
      out(0) = 500; out(1) = 900
      for (i <- 2 until 1000)
        out(i) = math.max(-32768, math.min(32767,
          (out(i - 1) * 19 / 10) - out(i - 2) + ((i * 37) % 23) - 11))
      out
    }
    for (order <- Seq(1, 2, 4, 8, 12, 32)) {
      val Some(back) = FlacCodec.decodeSamples(FlacCodec.encodePcm(pcm, lpcOrder = order))
      assert(back.map(_.toInt).sameElements(pcm), s"lpc order $order")
    }
    // and LPC on random content still round-trips (model quality only
    // affects size, never correctness)
    val noisy = Array.tabulate(700)(i => ((i * 48271 + 7) % 65536) - 32768)
    for (order <- Seq(2, 8)) {
      val Some(back) = FlacCodec.decodeSamples(FlacCodec.encodePcm(noisy, lpcOrder = order))
      assert(back.map(_.toInt).sameElements(noisy), s"noisy lpc order $order")
    }
  }

  test("LPC beats fixed predictors on resonant content") {
    // a HIGH-frequency tone: the fixed predictors are powers of (1 − B)
    // with all roots at z = 1, so at θ = 2 rad every order ≥ 1 AMPLIFIES
    // the signal ((2·sin(θ/2))^k > 1) and order 0 degenerates to verbatim
    // — while the LPC recurrence [2·cos θ, −1] models any resonance
    val pcm = Array.tabulate(4096)(i =>
      math.round(20000 * math.sin(i * 2.0)).toInt + ((i * 37) % 5) - 2)
    val lpc = FlacCodec.encodePcm(pcm, lpcOrder = 2).length
    val fixed = FlacCodec.encodePcm(pcm).length
    assert(lpc < fixed, s"lpc $lpc >= fixed $fixed on resonant content")
  }

  test("best-order selection beats verbatim on smooth content") {
    val smooth = Array.tabulate(2048)(i => i * 3 - 3000)
    val fixed = FlacCodec.encodePcm(smooth).length
    val verbatim = FlacCodec.encodePcm(smooth, forceVerbatim = true).length
    assert(fixed < verbatim, s"fixed $fixed >= verbatim $verbatim")
  }

  test("stereo round-trips exactly under all four channel assignments") {
    // correlated stereo: R tracks L with small noise — the case inter-
    // channel decorrelation exists for; includes odd L+R sums so the
    // mid-side dropped-LSB/parity restoration is exercised
    val n = 700
    val left = Array.tabulate(n)(i => ((i * 7919 + 13) % 60000) - 30000)
    val right = Array.tabulate(n)(i => left(i) + ((i * 31) % 9) - 4)
    for (a <- Seq("independent", "left-side", "right-side", "mid-side")) {
      val Some((l, r)) = FlacCodec.decodeStereo(FlacCodec.encodePcmStereo(left, right, a))
      assert(l.map(_.toInt).sameElements(left), s"$a left")
      assert(r.map(_.toInt).sameElements(right), s"$a right")
    }
    // extreme values: side channel needs the full 17-bit range
    val lx = Array(32767, -32768, 32767, -32768, 0, 1)
    val rx = Array(-32768, 32767, 32767, -32768, 1, 0)
    for (a <- Seq("independent", "left-side", "right-side", "mid-side")) {
      val Some((l, r)) = FlacCodec.decodeStereo(FlacCodec.encodePcmStereo(lx, rx, a))
      assert(l.map(_.toInt).sameElements(lx) && r.map(_.toInt).sameElements(rx),
        s"$a extremes")
    }
  }

  test("mid-side decorrelation beats independent channels on correlated stereo") {
    val n = 4096
    val left = Array.tabulate(n)(i => math.round(18000 * math.sin(i * 0.07)).toInt)
    val right = Array.tabulate(n)(i => left(i) + ((i * 37) % 7) - 3)
    val ms = FlacCodec.encodePcmStereo(left, right, "mid-side").length
    val ind = FlacCodec.encodePcmStereo(left, right, "independent").length
    assert(ms < ind, s"mid-side $ms >= independent $ind")
    // a mono stream is not a stereo stream and vice versa
    assert(FlacCodec.decodeStereo(FlacCodec.encodePcm(left)).isEmpty)
    assert(FlacCodec.decodeSamples(FlacCodec.encodePcmStereo(left, right)).isEmpty)
  }

  test("corrupt CRCs and truncation are rejected, not thrown") {
    val flac = FlacCodec.encode(payload)
    // every byte past the metadata is CRC-covered (header CRC-8, whole
    // frame CRC-16), and a CRC always detects a single-bit error — so any
    // one-bit flip in frame data MUST yield None, never a throw
    for (i <- 42 until flac.length) {
      val mut = flac.clone()
      mut(i) = (mut(i) ^ 0x10).toByte
      assert(FlacCodec.decodeSamples(mut).isEmpty, s"flip at byte $i slipped through")
    }
    assert(FlacCodec.decodeSamples(flac.take(20)).isEmpty)
    assert(FlacCodec.decodeSamples(Array[Byte]()).isEmpty)
    // flipping a residual bit MUST be caught by the frame CRC-16: find the
    // first entropy byte after the headers and corrupt it
    val mut = flac.clone()
    mut(flac.length - 3) = (mut(flac.length - 3) ^ 0x40).toByte
    assert(FlacCodec.decodeSamples(mut).isEmpty, "CRC-16 missed a corrupt byte")
  }
}
