package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MjpegAviCodec

/** The Motion-JPEG AVI container: frame-exact round-trip through real
  * per-frame JPEGs, index validation, and hostile-container rejection.
  */
class MjpegAviSpec extends AnyFunSuite {

  private val payload =
    (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray

  test("every frame decodes to its zero-padded payload slice") {
    val avi = MjpegAviCodec.encode(payload)
    assert(new String(avi.take(4)) == "RIFF" && new String(avi.slice(8, 12)) == "AVI ")
    val Some((w, h, frames)) = MjpegAviCodec.decodeFrames(avi)
    assert(w == 32 && h == 16)
    assert(frames.length == 13) // ceil(100 / 8)
    for ((px, f) <- frames.zipWithIndex) {
      assert(px.length == w * h)
      for (b <- 0 until 8) { // 8 blocks of 8x8, 4 per row
        val expected =
          if (f * 8 + b < payload.length) payload(f * 8 + b) & 0xff else 0
        val bx = b % 4; val by = b / 4
        val got = px((by * 8 + 3) * w + bx * 8 + 3) & 0xff // one interior px
        assert(got == expected, s"frame $f block $b: $got != $expected")
      }
    }
  }

  test("empty and single-byte payloads produce exactly one frame") {
    for (p <- Seq(Array[Byte](), Array[Byte](42))) {
      val Some((_, _, frames)) = MjpegAviCodec.decodeFrames(MjpegAviCodec.encode(p))
      assert(frames.length == 1)
    }
  }

  test("index corruption and frame-count mismatch are rejected") {
    val avi = MjpegAviCodec.encode(payload)
    // find idx1 and corrupt the first entry's size field
    var i = 12
    var idxAt = -1
    while (idxAt < 0 && i + 8 <= avi.length) {
      if (new String(avi.slice(i, i + 4)) == "idx1") idxAt = i
      else {
        val sz = (avi(i + 4) & 0xff) | ((avi(i + 5) & 0xff) << 8) |
          ((avi(i + 6) & 0xff) << 16) | ((avi(i + 7) & 0xff) << 24)
        i += 8 + sz + (sz & 1)
      }
    }
    assert(idxAt > 0)
    val mut = avi.clone()
    mut(idxAt + 8 + 12) = (mut(idxAt + 8 + 12) ^ 0x01).toByte
    assert(MjpegAviCodec.decodeFrames(mut).isEmpty, "corrupt idx1 size accepted")
    // truncating away the last frame makes the walk disagree with avih
    assert(MjpegAviCodec.decodeFrames(avi.take(avi.length / 2)).isEmpty)
  }

  test("idx1-absent and absolute-offset-idx1 containers both decode") {
    val avi = MjpegAviCodec.encode(payload)
    def u32(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def w32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
    }
    // locate movi LIST and idx1
    var i = 12
    var moviAt = -1; var idxAt = -1; var idxLen = -1
    while (i + 8 <= avi.length) {
      val tag = new String(avi.slice(i, i + 4))
      val sz = u32(avi, i + 4)
      if (tag == "LIST" && new String(avi.slice(i + 8, i + 12)) == "movi") moviAt = i + 8
      if (tag == "idx1") { idxAt = i; idxLen = sz }
      i += 8 + sz + (sz & 1)
    }
    assert(moviAt > 0 && idxAt > 0)
    // 1) drop idx1 entirely (older writers): still decodes
    val noIdx = avi.take(idxAt)
    w32(noIdx, 4, noIdx.length - 8) // fix RIFF size
    val Some((_, _, f1)) = MjpegAviCodec.decodeFrames(noIdx)
    assert(f1.length == 13)
    // 2) rewrite offsets to the ABSOLUTE file-offset convention
    val abs = avi.clone()
    for (e <- 0 until idxLen / 16)
      w32(abs, idxAt + 8 + 16 * e + 8, u32(avi, idxAt + 8 + 16 * e + 8) + moviAt)
    val Some((_, _, f2)) = MjpegAviCodec.decodeFrames(abs)
    assert(f2.length == 13)
    // a half-shifted (wrong-convention) offset is rejected
    val bad = avi.clone()
    w32(bad, idxAt + 8 + 8, u32(avi, idxAt + 8 + 8) + 2)
    assert(MjpegAviCodec.decodeFrames(bad).isEmpty)
  }

  test("non-MJPG containers are rejected") {
    assert(MjpegAviCodec.decodeFrames(Array[Byte]()).isEmpty)
    assert(MjpegAviCodec.decodeFrames("RIFFxxxxWAVE".getBytes).isEmpty)
    val avi = MjpegAviCodec.encode(payload)
    val mut = avi.clone()
    // flip the strh handler fourcc 'MJPG' -> 'MJPH'
    var i = 0
    var found = false
    while (!found && i + 4 <= mut.length) {
      if (new String(mut.slice(i, i + 4)) == "vids") {
        mut(i + 7) = 'H'.toByte; found = true
      }
      i += 1
    }
    assert(found)
    assert(MjpegAviCodec.decodeFrames(mut).isEmpty, "non-MJPG handler accepted")
  }
}
