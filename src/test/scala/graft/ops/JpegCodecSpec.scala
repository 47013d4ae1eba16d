package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JpegCodec

/** The baseline JPEG codec: exact round-trip on the flat DC-only encoding
  * (what q159's oracle relies on), ≤1-LSB round-trip through the FULL
  * FDCT + run-length AC path, restart-marker resync, and hostile-input
  * rejection.
  */
class JpegCodecSpec extends AnyFunSuite {

  private val payload =
    (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray

  test("flat-block encode decodes bit-exactly to the payload grid") {
    val jpg = JpegCodec.encode(payload)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val Some((w, h, px)) = JpegCodec.decodePixels(jpg)
    assert(w == 32 && h == 8 * 25) // 100 bytes, 4 blocks per row
    for (i <- 0 until 25 * 4) {
      val expected = if (i < payload.length) payload(i) & 0xff else 0
      val bx = i % 4; val by = i / 4
      for (y <- 0 until 8; x <- 0 until 8) {
        val got = px((by * 8 + y) * w + bx * 8 + x) & 0xff
        assert(got == expected, s"block $i pixel ($x,$y): $got != $expected")
      }
    }
  }

  test("full FDCT round-trip stays within 1 LSB on smooth content") {
    val (w, h) = (41, 23) // non-multiples of 8: exercises edge replication
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 5 + y * 3 + (x * y) / 7) % 256).toByte
    }
    val jpg = JpegCodec.encodeRich(gray, w, h)
    val Some((dw, dh, px)) = JpegCodec.decodePixels(jpg)
    assert((dw, dh) == (w, h))
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs((px(i) & 0xff) - (gray(i) & 0xff)))
    assert(maxErr <= 1, s"max round-trip error $maxErr > 1")
  }

  test("restart markers resync the entropy stream and DC prediction") {
    val plain = JpegCodec.decodePixels(JpegCodec.encode(payload)).get
    val rst = JpegCodec.decodePixels(JpegCodec.encode(payload, restartInterval = 2)).get
    assert(plain._3.sameElements(rst._3) && plain._1 == rst._1 && plain._2 == rst._2)
    val (w, h) = (41, 23)
    val gray = Array.tabulate(w * h)(i => ((i * 13 + 5) % 256).toByte)
    val a = JpegCodec.decodePixels(JpegCodec.encodeRich(gray, w, h)).get
    val b = JpegCodec.decodePixels(
      JpegCodec.encodeRich(gray, w, h, restartInterval = 3)).get
    assert(a._3.sameElements(b._3))
  }

  test("4:4:4 color encode decodes to exact gray triplets via YCbCr") {
    val jpg = JpegCodec.encodeColor(payload)
    val Some((w, h, rgb)) = JpegCodec.decodeColorPixels(jpg)
    assert(w == 32 && h == 8 * 25 && rgb.length == w * h * 3)
    for (i <- 0 until 25 * 4) {
      val expected = if (i < payload.length) payload(i) & 0xff else 0
      val bx = i % 4; val by = i / 4
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
        val got = rgb(((by * 8 + y) * w + bx * 8 + x) * 3 + c) & 0xff
        assert(got == expected, s"block $i ($x,$y) ch $c: $got != $expected")
      }
    }
    // gray and color decoders reject each other's component counts
    assert(JpegCodec.decodePixels(jpg).isEmpty)
    assert(JpegCodec.decodeColorPixels(JpegCodec.encode(payload)).isEmpty)
    // restart markers reset all three DC predictors
    val rst = JpegCodec.decodeColorPixels(
      JpegCodec.encodeColor(payload, restartInterval = 3)).get
    assert(rst._3.sameElements(rgb))
  }

  test("4:2:0 subsampled encode decodes to exact gray triplets") {
    val jpg = JpegCodec.encode420(payload)
    val Some((w, h, rgb)) = JpegCodec.decodeColorPixels(jpg)
    assert(w == 32 && h == 8 * 26) // 25 luma block rows pad to 26 (even)
    for (i <- 0 until 26 * 4) {
      val expected = if (i < payload.length) payload(i) & 0xff else 0
      val bx = i % 4; val by = i / 4
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
        val got = rgb(((by * 8 + y) * w + bx * 8 + x) * 3 + c) & 0xff
        assert(got == expected, s"block $i ($x,$y) ch $c: $got != $expected")
      }
    }
    // restart markers also resync the 6-block 4:2:0 MCUs
    val rst = JpegCodec.decodeColorPixels(
      JpegCodec.encode420(payload, restartInterval = 2)).get
    assert(rst._3.sameElements(rgb))
  }

  test("decode fails soft on any corruption (deterministic fuzz)") {
    // a decoder that runs inside mapPartitions must return None on garbage,
    // never throw: flip one byte at every position, truncate at every
    // length — decode either succeeds or returns None
    val jpg = JpegCodec.encode(payload.take(24))
    for (i <- jpg.indices) {
      val mut = jpg.clone()
      mut(i) = (mut(i) ^ ((i * 37 + 1) & 0xff)).toByte
      JpegCodec.decodePixels(mut) // must not throw
      JpegCodec.decodePixels(jpg.take(i)) // nor any truncation
    }
  }

  test("rejects non-baseline, truncated, and hostile containers") {
    val jpg = JpegCodec.encode(payload)
    assert(JpegCodec.decodePixels(jpg.take(jpg.length / 2)).isEmpty)
    assert(JpegCodec.decodePixels("not a jpeg".getBytes("US-ASCII")).isEmpty)
    // flip SOF0 (FFC0) to SOF2 progressive (FFC2): must be rejected
    val prog = jpg.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && i + 1 < prog.length &&
        (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodePixels(prog).isEmpty)
    // hostile dimensions: huge declared width/height must fail soft
    val big = jpg.clone()
    big(sof + 5) = 0x7f; big(sof + 6) = 0xff.toByte // height
    big(sof + 7) = 0x7f; big(sof + 8) = 0xff.toByte // width
    assert(JpegCodec.decodePixels(big).isEmpty)
  }
}
