package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RleVideoCodec._

/** Pins for the MRLE (BI_RLE8) inter-predicted video codec: frame content
  * vs a directly-synthesized raster, the TEMPORAL CARRY itself (delta
  * frames never re-send the static half yet decode it correctly — and a
  * decoder with a cleared canvas provably cannot), container/index
  * validation incl. keyframe flags, palette realness, and malformed-RLE
  * rejection.
  */
class RleVideoSpec extends AnyFunSuite {

  private val payload =
    (0 until 40).map(i => ((i * 53 + 11) % 256).toByte).toArray

  /** the raster frame f should decode to (bottom-up rows) */
  private def expected(payload: Array[Byte], f: Int): Array[Int] = {
    val s = if (payload.nonEmpty) payload(0) & 0xff else 0
    val vf = if (f * FrameBytes < payload.length) payload(f * FrameBytes) & 0xff else 0
    val px = new Array[Int](W * H)
    for (y <- 0 until 8; x <- 0 until W) px(y * W + x) = s
    for (y <- 8 until 15; x <- 0 until W) px(y * W + x) = vf
    for (x <- 0 until W) px(15 * W + x) = (vf & 0x7f) + x
    px
  }

  test("every decoded frame equals the directly-synthesized raster") {
    val (w, h, frames) = decodeFrames(encode(payload)).get
    assert(w == W && h == H && frames.length == 5)
    for (f <- frames.indices) {
      val exp = expected(payload, f)
      assert(frames(f).map(_ & 0xff).sameElements(exp), s"frame $f differs")
    }
  }

  test("delta frames carry the static half temporally, never re-sending it") {
    val bytes = encode(payload)
    // the delta escape (00 02 00 08) must appear in the stream, and no
    // delta frame may contain the static value as a full-width run at
    // rows 0..7 — structurally: every non-key '00dc' chunk starts with
    // the 4-byte delta escape
    var i = 0
    var chunks = List.empty[Array[Byte]]
    var inIdx = false
    while (i + 8 <= bytes.length && !inIdx) {
      // idx1 entries also lead with "00dc" — stop at the index
      if (bytes(i) == 'i' && bytes(i + 1) == 'd' && bytes(i + 2) == 'x' &&
        bytes(i + 3) == '1') inIdx = true
      else if (isDc(bytes, i)) {
        val sz = rd32le(bytes, i + 4)
        chunks ::= java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + sz)
        i += 8 + sz + (sz & 1)
      } else i += 1
    }
    val ordered = chunks.reverse
    assert(ordered.length == 5)
    assert(ordered.head.length > ordered(1).length,
      "keyframe must be larger than a delta frame")
    for (f <- 1 until ordered.length) {
      val c = ordered(f)
      assert((c(0) & 0xff) == 0 && (c(1) & 0xff) == 2 &&
        (c(2) & 0xff) == 0 && (c(3) & 0xff) == 8,
        s"delta frame $f does not start with the temporal escape")
    }
  }

  private def isDc(p: Array[Byte], i: Int): Boolean =
    p(i) == '0' && p(i + 1) == '0' && p(i + 2) == 'd' && p(i + 3) == 'c'
  private def rd32le(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) | ((p(i + 2) & 0xff) << 16) |
      ((p(i + 3) & 0xff) << 24)

  test("keyframe flags are validated: a delta frame claiming KEYFRAME rejects") {
    val bytes = encode(payload)
    // idx1 entries are 16 bytes: fourcc, flags, offset, size; find idx1
    var i = 12
    var idxStart = -1
    while (i + 8 <= bytes.length && idxStart < 0) {
      if (bytes(i) == 'i' && bytes(i + 1) == 'd' && bytes(i + 2) == 'x' &&
        bytes(i + 3) == '1') idxStart = i + 8
      else i += 1
    }
    assert(idxStart > 0)
    val mut = bytes.clone()
    mut(idxStart + 16 + 4) = 0x10.toByte // frame 1 claims AVIIF_KEYFRAME
    assert(decodeFrames(mut).isEmpty)
    val mut2 = bytes.clone()
    mut2(idxStart + 4) = 0 // frame 0 loses its keyframe flag
    assert(decodeFrames(mut2).isEmpty)
  }

  test("handler mismatch rejects (MJPG stream is not MRLE)") {
    assert(decodeFrames(MjpegAviCodec.encode(payload)).isEmpty)
    assert(MjpegAviCodec.decodeFrames(encode(payload)).isEmpty)
  }

  test("the palette is genuinely applied: a non-identity palette changes luminance") {
    val bytes = encode(payload)
    // find the strf RGBQUAD table and invert entry s (the static value)
    val s = payload(0) & 0xff
    var i = 12
    var strf = -1
    while (i + 8 <= bytes.length && strf < 0) {
      if (bytes(i) == 's' && bytes(i + 1) == 't' && bytes(i + 2) == 'r' &&
        bytes(i + 3) == 'f') strf = i + 8
      else i += 1
    }
    assert(strf > 0)
    val mut = bytes.clone()
    val e = strf + 40 + 4 * s
    mut(e) = (255 - s).toByte; mut(e + 1) = (255 - s).toByte
    mut(e + 2) = (255 - s).toByte
    val (_, _, frames) = decodeFrames(mut).get
    // the static half must now decode to the REMAPPED luminance
    assert((frames(1)(0) & 0xff) == (255 - s))
  }

  test("malformed RLE rejects: run past row end, missing EOB, truncated escape") {
    def container(chunk: Array[Byte]): Array[Byte] = {
      // swap frame 0's chunk body for `chunk` by re-encoding a 1-frame
      // stream and patching its movi payload in place (same length needed,
      // so craft directly at matching size)
      val base = encode(Array[Byte](payload(0)))
      var i = 12
      var dc = -1
      while (i + 8 <= base.length && dc < 0) {
        if (isDc(base, i)) dc = i else i += 1
      }
      val sz = rd32le(base, dc + 4)
      assert(chunk.length <= sz, "test chunk must fit the original")
      val mut = base.clone()
      // pad with EOL escapes (harmless) to preserve the declared size
      var k = 0
      while (k < sz) {
        mut(dc + 8 + k) = if (k < chunk.length) chunk(k) else 0
        k += 1
      }
      mut
    }
    // run of 33 past the 32-px row
    assert(decodeFrames(container(Array[Byte](33, 5, 0, 1))).isEmpty)
    // absolute mode longer than the row
    assert(decodeFrames(container(Array[Byte](0, 33.toByte))).isEmpty)
    // no end-of-bitmap (the EOL padding keeps y growing past h)
    assert(decodeFrames(container(Array[Byte](1, 1))).isEmpty)
    // delta past the bitmap
    assert(decodeFrames(container(Array[Byte](0, 2, 40, 40, 1, 1, 0, 1))).isEmpty)
  }

  test("empty payload: a single dark keyframe") {
    val (w, h, frames) = decodeFrames(encode(Array.empty[Byte])).get
    assert(w == W && h == H && frames.length == 1)
    val exp = expected(Array.empty[Byte], 0)
    assert(frames(0).map(_ & 0xff).sameElements(exp))
  }
}
