package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AdpcmCodec

/** The IMA ADPCM recurrence, pinned against hand-stepped values: the
  * decoder is stateful (every sample depends on the whole nibble prefix),
  * so these vectors nail the step table, the shift-sum diff, the sign
  * bit, and both clamps — exactly what q169's recursive-CTE oracle
  * replays.
  */
class AdpcmCodecSpec extends AnyFunSuite {

  test("hand-stepped vector: byte 0x07 decodes to [0, 11, 13]") {
    // nibble 7 from (pred 0, idx 0): step 7, diff = 0+1+3+7 = 11 → pred 11,
    // idx 0+8 = 8; nibble 0 from (11, 8): step 16, diff = 2 → pred 13, idx 7
    val got = AdpcmCodec.decodeSamples(AdpcmCodec.encode(Array(0x07.toByte)))
    assert(got.map(_.toSeq) === Some(Seq[Short](0, 11, 13)))
  }

  test("zero nibbles decode to silence (diff = step>>3 = 0 at index 0)") {
    val got = AdpcmCodec.decodeSamples(AdpcmCodec.encode(Array.fill(8)(0.toByte)))
    assert(got.exists(s => s.length == 17 && s.forall(_ == 0)))
  }

  test("a sustained max-magnitude run saturates at the clamp, no overflow") {
    // nibble 7 repeatedly: predictor must rise monotonically to 32767 and
    // stick there; step index rides the top of the table without escaping
    val got = AdpcmCodec.decodeSamples(AdpcmCodec.encode(Array.fill(64)(0x77.toByte))).get
    assert(got.last === 32767.toShort)
    assert(got.sliding(2).forall(w => (w(1) & 0xffff) >= (w(0) & 0xffff) || w(1) == 32767))
    // and the sign bit walks it straight back down without underflow
    val down = AdpcmCodec.decodeSamples(AdpcmCodec.encode(
      Array.fill(64)(0x77.toByte) ++ Array.fill(64)(0xff.toByte))).get
    assert(down.last >= -32768 && down.last < 0)
  }

  test("state carries across samples: permuting the stream changes the tail") {
    val a = AdpcmCodec.decodeSamples(AdpcmCodec.encode(Array[Byte](0x07, 0x31))).get
    val b = AdpcmCodec.decodeSamples(AdpcmCodec.encode(Array[Byte](0x31, 0x07))).get
    // a memoryless codec (q160's mu-law) would decode the same multiset —
    // the predictive state makes even the sample multiset differ
    assert(a.sorted.toSeq !== b.sorted.toSeq)
  }

  test("an out-of-table block step index rejects the container") {
    val c = AdpcmCodec.encode(Array[Byte](1, 2, 3))
    c(50) = 89.toByte // block header step index past the table
    assert(AdpcmCodec.decodeSamples(c).isEmpty)
  }
}
