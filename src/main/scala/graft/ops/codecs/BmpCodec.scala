package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

/** REAL pixel-level codec for uncompressed 24-bit BMP — pure JVM byte
  * arithmetic, no native deps. `encode` emits a genuine BMP container
  * (BITMAPINFOHEADER, bottom-up rows, 4-byte row stride); `decodePixels`
  * is header-driven: it follows the pixel-array offset from the file
  * header and walks rows by the computed stride, so it decodes any
  * conforming 24-bit uncompressed BMP, not just its own output.
  */
object BmpCodec {
  val W = 16 // fixed encode width: stride = W*3 = 48, already 4-aligned

  private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
    out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
    le16(out, i, v & 0xffff); le16(out, i + 2, (v >>> 16) & 0xffff)
  }
  private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def rd32(p: Array[Byte], i: Int) = rd16(p, i) | (rd16(p, i + 2) << 16)

  /** Payload bytes become BGR channel bytes row-major, zero-padded to
    * fill the last row; height = ceil(len/48), min 1.
    */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val h = math.max(1, (payload.length + 47) / 48)
    val dataSize = h * W * 3
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataSize) // file size
    le32(out, 10, 54)           // pixel-array offset
    le32(out, 14, 40)           // BITMAPINFOHEADER size
    le32(out, 18, W)
    le32(out, 22, h)            // positive height: bottom-up row order
    le16(out, 26, 1)            // planes
    le16(out, 28, 24)           // bits per pixel
    le32(out, 30, 0)            // BI_RGB (uncompressed)
    le32(out, 34, dataSize)
    // payload rows written bottom-up so a top-down read returns them in
    // original order after the flip in decodePixels
    var row = 0
    while (row < h) {
      val src = row * W * 3
      val n = math.min(W * 3, math.max(0, payload.length - src))
      if (n > 0)
        System.arraycopy(payload, src, out, 54 + (h - 1 - row) * W * 3, n)
      row += 1
    }
    out
  }

  /** Header-driven decode of any uncompressed 24-bit BMP: returns
    * (width, height, channel bytes top-down row-major) or None when the
    * container isn't a BMP this codec handles.
    */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (HeaderCodec.sniff(p) != "bmp") return None
    if (p.length < 54) return None // truncated before BITMAPINFOHEADER ends
    val off = rd32(p, 10)
    val w = rd32(p, 18)
    val rawH = rd32(p, 22)
    // abs in Long: math.abs(Int.MinValue) is still negative and would
    // slip through the size guards below as a negative product
    val hL = math.abs(rawH.toLong)
    val topDown = rawH < 0
    val bpp = rd16(p, 28)
    val comp = rd32(p, 30)
    if (bpp != 24 || comp != 0 || w <= 0 || hL == 0 || hL > Int.MaxValue)
      return None
    val h = hL.toInt
    // header-declared dimensions are untrusted: a magic-matching payload
    // with huge w/h would overflow the Int products below or allocate
    // gigabytes and kill the whole partition. Long arithmetic + the
    // available-bytes check reject it as a malformed container instead.
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    if (off < 0 || w.toLong * 3 * h > MaxPixelBytes) return None
    if (off.toLong + stride * h > p.length) return None
    val px = new Array[Byte](w * 3 * h)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      System.arraycopy(p, off + srcRow * stride.toInt, px, row * w * 3, w * 3)
      row += 1
    }
    Some((w, h, px))
  }
}
