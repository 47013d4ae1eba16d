package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MpegAudioCodec._

/** Pins for the MPEG-1 audio codec (Layers I/II). Because the codec is
  * lossy BY DESIGN and the prototype window is derived rather than
  * transcribed (see the MpegAudioCodec scaladoc boundary note), these
  * tests carry the bit-level correctness burden the q277 oracle cannot:
  * filterbank near-PR quality and the exact 481-sample delay, band
  * selectivity, requantization closed forms, scalefactor/scfsi and
  * grouping coverage, CRC rejection, conformance guards, and determinism.
  */
class MpegAudioSpec extends AnyFunSuite {

  private def textLike(n: Int, seed: Int = 42): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)((97 + rnd.nextInt(26)).toByte)
  }

  private def whiteish(n: Int, seed: Int = 7): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  /** audio-like PCM from bytes: the q277 one-pole shaping */
  private def pcmOf(payload: Array[Byte]): Array[Short] = {
    val pcm = new Array[Short](math.max(1, payload.length))
    var acc = 0.0
    var i = 0
    while (i < payload.length) {
      acc = 0.85 * acc + 0.45 * (((payload(i) & 0xff) - 128) * 256)
      val v = StrictMath.rint(acc)
      pcm(i) = (if (v > 32767) 32767 else if (v < -32768) -32768 else v.toInt).toShort
      i += 1
    }
    pcm
  }

  private def tone(n: Int, freq: Double, amp: Double = 20000): Array[Short] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freq / 48000 * i)).toShort)

  // -------------------------------------------------------------------
  // prototype window + filterbank
  // -------------------------------------------------------------------

  test("prototype: 512 taps, symmetric about 256, ~unit cascade gain") {
    assert(Prototype.length == 512)
    for (n <- 1 until 256)
      assert(Prototype(256 - n) == Prototype(256 + n),
        s"asymmetry at ±$n") // exact: the generator re-symmetrizes
    // sum = 2.0 is the 64x-normalized unit-gain condition (alpha = 64^2)
    assert(math.abs(Prototype.sum - 2.0) < 0.01)
  }

  test("filterbank round-trip: >= 75 dB SNR at exactly the 481-sample delay") {
    val n = 16384
    val in = Array.tabulate(n)(i =>
      0.7 * math.sin(2 * math.Pi * 0.013 * i) +
        0.2 * math.sin(2 * math.Pi * 0.171 * i + 0.5) +
        0.1 * math.sin(2 * math.Pi * 0.43 * i + 1.1))
    val ana = new Analysis
    val syn = new Synthesis
    val out = new Array[Double](n)
    var t = 0
    while (t + 32 <= n) {
      val pcm = syn.feed(ana.feed(in, t))
      System.arraycopy(pcm, 0, out, t, 32)
      t += 32
    }
    def snrAt(d: Int): Double = {
      var sig = 0.0
      var err = 0.0
      var i = 600
      while (i + d < n - 64) {
        val e = in(i) - out(i + d)
        sig += in(i) * in(i); err += e * e
        i += 1
      }
      10 * math.log10(sig / math.max(err, 1e-300))
    }
    val snr481 = snrAt(CodecDelay)
    assert(snr481 > 75.0, s"round-trip SNR $snr481 dB")
    // 481 is THE delay: one sample off collapses reconstruction
    assert(snrAt(CodecDelay - 1) < 20.0 && snrAt(CodecDelay + 1) < 20.0)
  }

  test("band selectivity: a band-centered tone lands in its own subband") {
    for (k <- Seq(0, 3, 13, 31)) {
      val f = (k + 0.5) * 48000.0 / 64.0 // center of subband k
      val in = Array.tabulate(4096)(i => math.sin(2 * math.Pi * f / 48000 * i))
      val ana = new Analysis
      val energy = new Array[Double](32)
      var t = 0
      while (t + 32 <= in.length) {
        val sb = ana.feed(in, t)
        if (t > 512) { // past filter warm-up
          var i = 0
          while (i < 32) { energy(i) += sb(i) * sb(i); i += 1 }
        }
        t += 32
      }
      val total = energy.sum
      assert(energy(k) / total > 0.95,
        s"band $k holds ${energy(k) / total} of the energy")
    }
  }

  // -------------------------------------------------------------------
  // requantization closed forms
  // -------------------------------------------------------------------

  test("requantization: exact reconstruction levels per the spec constants") {
    // 3-level grouped: codes {0,1,2} -> {-2/3, 0, 2/3}
    val q3 = QuantBySteps(3)
    assert(dequantize(0, q3) == -2.0 / 3 && dequantize(1, q3) == 0.0 &&
      dequantize(2, q3) == 2.0 / 3)
    // 15-level: midtread, step 2/15 * 16/15-expanded, code 7 = exactly 0
    val q15 = QuantBySteps(15)
    assert(dequantize(7, q15) == 0.0)
    assert(math.abs(dequantize(14, q15) - 14.0 / 15) < 1e-15)
    assert(math.abs(dequantize(0, q15) + 14.0 / 15) < 1e-15)
    // quantize is the inverse on reconstruction levels, and code 7 wins 0
    for (c <- 0 until 15) assert(quantize(dequantize(c, q15), q15) == c)
    assert(quantize(0.0, q15) == 7)
    // 65535-level C/D match the formula C = 2^nb/steps, D = 2^(1-nb)
    val q16 = QuantBySteps(65535)
    assert(q16.nb == 16 && q16.c == 65536.0 / 65535 && q16.d == math.pow(2, -15))
  }

  test("scalefactor table: 2*2^(-i/3), exact powers of two at i % 3 == 0") {
    assert(ScaleFactors.length == 63)
    assert(ScaleFactors(0) == 2.0 && ScaleFactors(3) == 1.0 &&
      ScaleFactors(6) == 0.5 && ScaleFactors(30) == math.pow(2, -9))
    for (i <- 1 until 63) assert(ScaleFactors(i) < ScaleFactors(i - 1))
  }

  // -------------------------------------------------------------------
  // Layer II end-to-end
  // -------------------------------------------------------------------

  test("L2 round-trip: decode succeeds, checksums agree, fidelity by content") {
    for ((payload, minSnr) <- Seq(
        (textLike(2000), 30.0), (whiteish(3000), 15.0))) {
      val pcm = pcmOf(payload)
      val (bytes, encSum) = encodeL2WithSum(pcm)
      val (dec, decSum) = decodeSamplesWithSum(bytes).get
      assert(decSum == encSum, "side-info/code checksum mismatch")
      assert(dec.length == bytes.length / 576 * 1152)
      val snr = snrDb(pcm, dec)
      assert(snr > minSnr, s"L2 SNR $snr dB")
    }
    // a tone is the codec's best case: most bits to one subband
    val t = tone(8192, 440.0)
    assert(snrDb(t, decodeSamples(encodeL2(t)).get) > 55.0)
  }

  test("L2 at 56 kbps: grouped quantizers genuinely used; scfsi shares on steady content") {
    // low rate forces the 3/5/9-level grouped quantizers
    val (bytes, encSum) = encodeL2WithSum(pcmOf(whiteish(4000)), bitrateIndex = 3)
    val (quant, _) = l2SideInfo(bytes).get
    val groupedBands = quant.getOrElse(3, 0) + quant.getOrElse(5, 0) + quant.getOrElse(9, 0)
    assert(groupedBands > 0, s"no grouped quantizer used at 56 kbps: $quant")
    val (_, decSum) = decodeSamplesWithSum(bytes).get
    assert(decSum == encSum)
    // steady tone -> equal scalefactors across parts -> scfsi 2 (share all)
    val (tb, _) = encodeL2WithSum(tone(4096, 440.0))
    val (_, scfsi) = l2SideInfo(tb).get
    assert(scfsi.getOrElse(2, 0) > 0, s"no scfsi sharing on steady content: $scfsi")
    // noise bursts vary the per-part peaks -> some bands transmit all three
    val burst = Array.tabulate[Short](4608)(i =>
      if ((i / 384) % 2 == 0) (math.sin(i * 0.7) * 18000).toShort else 0)
    val (bb, _) = encodeL2WithSum(burst)
    val (_, scfsiB) = l2SideInfo(bb).get
    assert(scfsiB.getOrElse(0, 0) > 0, s"no 3-scalefactor band on bursty content: $scfsiB")
  }

  test("L2 conformance guard: mono above 192 kbps is rejected (stereo-only combos)") {
    intercept[IllegalArgumentException](encodeL2(tone(1152, 440.0), bitrateIndex = 11))
    intercept[IllegalArgumentException](encodeL2(tone(1152, 440.0), bitrateIndex = 14))
    // below the B.2a regime (B.2c/d tables unimplemented) also rejected
    intercept[IllegalArgumentException](encodeL2(tone(1152, 440.0), bitrateIndex = 2))
  }

  test("L2 frame geometry: 3 bytes per kbps at 48 kHz, header fields as declared") {
    val bytes = encodeL2(tone(1152, 440.0)) // 1152 + 481 -> 2 frames
    assert(bytes.length == 2 * 576)
    // header: sync, MPEG-1, Layer II, CRC on, 192k, 48 kHz, mono
    assert((bytes(0) & 0xff) == 0xff && ((bytes(1) >> 5) & 7) == 7)
    assert(((bytes(1) >> 3) & 1) == 1 && ((bytes(1) >> 1) & 3) == 2 && (bytes(1) & 1) == 0)
    assert(((bytes(2) >> 4) & 0xf) == 10 && ((bytes(2) >> 2) & 3) == 1)
    assert(((bytes(3) >> 6) & 3) == 3)
  }

  // -------------------------------------------------------------------
  // Layer I end-to-end
  // -------------------------------------------------------------------

  test("L1 round-trip: 448 kbps, high fidelity, checksums agree") {
    for (payload <- Seq(textLike(2000), whiteish(3000), Array[Byte](42))) {
      val pcm = pcmOf(payload)
      val (bytes, encSum) = encodeL1WithSum(pcm)
      val (dec, decSum) = decodeSamplesWithSum(bytes).get
      assert(decSum == encSum)
      assert(dec.length == bytes.length / 448 * 384)
      val snr = snrDb(pcm, dec)
      assert(snr > 40.0, s"L1 SNR $snr dB")
    }
    assert(snrDb(tone(8192, 440.0), decodeSamples(encodeL1(tone(8192, 440.0))).get) > 75.0)
  }

  test("L1 forbidden allocation code 15 is rejected") {
    val bytes = encodeL1(tone(768, 440.0))
    // overwrite subband 0's 4-bit alloc (bits 48..51) with 15, re-patch CRC
    val mut = bytes.clone()
    mut(6) = (mut(6) | 0xf0).toByte
    // recompute the CRC so ONLY the forbidden code can be the rejection cause
    var crc = crc16(mut, 16, 16)
    crc = crc16(mut, 48, 128, crc)
    mut(4) = ((crc >> 8) & 0xff).toByte
    mut(5) = (crc & 0xff).toByte
    assert(decodeSamples(mut).isEmpty)
  }

  // -------------------------------------------------------------------
  // robustness + determinism
  // -------------------------------------------------------------------

  test("CRC: a flipped bit in the protected side info rejects the frame") {
    val bytes = encodeL2(pcmOf(textLike(1000)))
    val mut = bytes.clone()
    mut(6) = (mut(6) ^ 0x10).toByte // inside the bit-allocation field
    assert(decodeSamples(mut).isEmpty)
  }

  test("sample-region corruption is NOT CRC-covered (spec coverage) but stays fail-soft") {
    val bytes = encodeL2(pcmOf(textLike(1000)))
    // flip a bit deep in the sample data of frame 0: decode either succeeds
    // (different audio) or rejects (range check) — never throws
    val mut = bytes.clone()
    mut(400) = (mut(400) ^ 0x08).toByte
    decodeSamples(mut) // must not throw
  }

  test("trailing garbage after the last frame rejects the stream") {
    val bytes = encodeL2(pcmOf(textLike(500)))
    assert(decodeSamples(bytes :+ 0x00.toByte).isEmpty)
    assert(decodeSamples(bytes ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("determinism: identical bytes and checksums across encodes") {
    val pcm = pcmOf(whiteish(2500))
    val (a, sa) = encodeL2WithSum(pcm)
    val (b, sb) = encodeL2WithSum(pcm)
    assert(java.util.Arrays.equals(a, b) && sa == sb)
    val (c, sc) = encodeL1WithSum(pcm)
    val (d, sd) = encodeL1WithSum(pcm)
    assert(java.util.Arrays.equals(c, d) && sc == sd)
  }

  test("empty/silent input: single zero sample, silent frames, exact zeros back") {
    val (bytes, encSum) = encodeL2WithSum(Array.empty[Short])
    val (dec, decSum) = decodeSamplesWithSum(bytes).get
    assert(decSum == encSum)
    assert(dec.forall(_ == 0), "silence must decode to exact zeros (no allocation)")
    assert(snrDb(Array[Short](0), dec) == 150.0) // the sig==0, err==0 branch
  }
}
