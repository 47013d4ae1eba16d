package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Layer III-class hybrid filterbank codec: end-to-end
  * reconstruction SNR through analysis → MDCT → quantize → Huffman →
  * decode → synthesis, bitstream checksum parity, frame geometry, the
  * rate loop's budget invariant, and malformed-stream rejection.
  */
class MpegL3Spec extends AnyFunSuite {

  /** The q277 program-material model: one-pole shaped byte stream. */
  private def shaped(bytes: Array[Byte]): Array[Short] = {
    val pcm = new Array[Short](bytes.length)
    var acc = 0.0
    for (i <- bytes.indices) {
      acc = 0.85 * acc + 0.45 * (((bytes(i) & 0xff) - 128) * 256)
      val v = StrictMath.rint(acc)
      pcm(i) = (if (v > 32767) 32767 else if (v < -32768) -32768 else v.toInt).toShort
    }
    pcm
  }

  private def detBytes(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 131 + 57) % 256).toByte)

  test("roundtrip SNR through the full hybrid cascade exceeds 20 dB") {
    val pcm = shaped(detBytes(4000))
    val (stream, encSum) = MpegL3Codec.encodeL3WithSum(pcm)
    val (dec, decSum) = MpegL3Codec.decodeL3WithSum(stream).get
    assert(encSum == decSum, "bitstream checksum parity")
    val snr = MpegL3Codec.snrL3Db(pcm, dec)
    // a wrong butterfly sign, IMDCT phase, window, or requant exponent
    // lands near (or below) 0 dB; the intact cascade clears 20 easily
    assert(snr > 20.0, s"snr=$snr")
  }

  test("frame geometry follows the ISO Layer III arithmetic") {
    for (n <- Seq(1, 100, 1152, 3000, 5000)) {
      val pcm = shaped(detBytes(n))
      val stream = MpegL3Codec.encodeL3(pcm)
      val frames = (math.max(1, n) + MpegL3Codec.L3Delay + 1151) / 1152
      assert(stream.length == frames * 960, s"n=$n")
      // every frame starts with a valid sync + layer III header
      for (f <- 0 until frames) {
        assert((stream(f * 960) & 0xff) == 0xff)
        assert(((stream(f * 960 + 1) >> 1) & 3) == 1, "layer bits '01'")
      }
    }
  }

  test("pure tone survives the cascade (alias cancellation works)") {
    // a mid-band tone is the classic alias-reduction stressor: leakage
    // across the subband boundary that the butterflies must cancel
    val pcm = Array.tabulate(4608)(i =>
      (12000 * StrictMath.sin(2 * math.Pi * 3000.0 * i / 48000.0)).toShort)
    val (stream, _) = MpegL3Codec.encodeL3WithSum(pcm)
    val (dec, _) = MpegL3Codec.decodeL3WithSum(stream).get
    val snr = MpegL3Codec.snrL3Db(pcm, dec)
    assert(snr > 20.0, s"tone snr=$snr")
  }

  test("silence encodes to zero big_values and decodes to silence") {
    val pcm = new Array[Short](2304)
    val (stream, _) = MpegL3Codec.encodeL3WithSum(pcm)
    val (dec, _) = MpegL3Codec.decodeL3WithSum(stream).get
    assert(dec.forall(v => math.abs(v.toInt) <= 1))
  }

  test("malformed streams are rejected, not misdecoded") {
    val good = MpegL3Codec.encodeL3(shaped(detBytes(1000)))
    assert(MpegL3Codec.decodeL3(good).isDefined)
    assert(MpegL3Codec.decodeL3(good.drop(1)).isEmpty) // lost sync
    assert(MpegL3Codec.decodeL3(good.take(good.length - 1)).isEmpty)
    assert(MpegL3Codec.decodeL3(Array.emptyByteArray).isEmpty)
    // corrupt a side-info byte: part2_3_length no longer matches the
    // consumed Huffman bits -> reject
    val bad = good.clone()
    bad(6) = (bad(6) ^ 0x55).toByte
    assert(MpegL3Codec.decodeL3(bad).isEmpty ||
      MpegL3Codec.decodeL3WithSum(bad).get._2 !=
        MpegL3Codec.encodeL3WithSum(shaped(detBytes(1000)))._2)
  }
}
