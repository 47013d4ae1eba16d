package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

/** REAL pixel-level codec for 8-bit truecolor PNG — pure JVM: zlib via
  * `java.util.zip.Deflater`/`Inflater`, chunk CRCs via `CRC32`, and the
  * five PNG row filters in byte arithmetic. `encode` emits a genuine
  * filtered PNG (Sub on even rows, Up on odd rows — real filter bytes,
  * not the trivial None row prefix); `decodePixels` walks the chunk list,
  * verifies every CRC, concatenates IDAT, inflates, and reconstructs all
  * five filter types (None/Sub/Up/Average/Paeth), so it decodes any
  * conforming non-interlaced RGB8 PNG, not just its own output.
  */
object PngCodec {
  val W = 16 // fixed encode width: scanline = 1 filter byte + 48 pixel bytes

  private def wr32(out: Array[Byte], i: Int, v: Int): Unit = {
    out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
    out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
  }
  private def rd32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
  private def crc(buf: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(buf, off, len)
    c.getValue.toInt
  }
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    wr32(out, 0, data.length)
    typ.indices.foreach(k => out(4 + k) = typ.charAt(k).toByte)
    System.arraycopy(data, 0, out, 8, data.length)
    wr32(out, 8 + data.length, crc(out, 4, 4 + data.length))
    out
  }

  /** Payload bytes become RGB channel bytes row-major (zero-padded last
    * row), height = ceil(len/48), min 1 — the same pixel mapping as
    * [[BmpCodec.encode]], so the two containers carry identical images.
    */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val rowB = W * 3
    val h = math.max(1, (payload.length + rowB - 1) / rowB)
    val raw = new Array[Byte](h * (1 + rowB))
    val cur = new Array[Byte](rowB)
    val prev = new Array[Byte](rowB)
    var row = 0
    while (row < h) {
      java.util.Arrays.fill(cur, 0.toByte)
      val src = row * rowB
      val n = math.min(rowB, math.max(0, payload.length - src))
      if (n > 0) System.arraycopy(payload, src, cur, 0, n)
      val base = row * (1 + rowB)
      if (row % 2 == 0) {
        raw(base) = 1 // Sub: delta vs the pixel 3 bytes left
        var i = 0
        while (i < rowB) {
          raw(base + 1 + i) = (cur(i) - (if (i >= 3) cur(i - 3) else 0)).toByte
          i += 1
        }
      } else {
        raw(base) = 2 // Up: delta vs the row above
        var i = 0
        while (i < rowB) { raw(base + 1 + i) = (cur(i) - prev(i)).toByte; i += 1 }
      }
      System.arraycopy(cur, 0, prev, 0, rowB)
      row += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = new Array[Byte](13)
    wr32(ihdr, 0, W); wr32(ihdr, 4, h)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // color type: truecolor RGB
    // compression 0, filter 0, interlace 0 already zero
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val out = new java.io.ByteArrayOutputStream()
    out.write(sig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", bos.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Chunk-walking, CRC-verified decode of any non-interlaced RGB8 PNG:
    * returns (width, height, channel bytes top-down, distinct filter
    * types seen) or None for containers outside that profile.
    */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte], Int)] = {
    if (HeaderCodec.sniff(p) != "png") return None
    var w = 0; var h = 0; var ihdrOk = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 12 <= p.length) {
      val len = rd32(p, i)
      if (len < 0 || i + 12 + len > p.length) return None
      if (crc(p, i + 4, 4 + len) != rd32(p, i + 8 + len)) return None
      val typ = new String(p, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          w = rd32(p, i + 8); h = rd32(p, i + 12)
          ihdrOk = p(i + 16) == 8 && p(i + 17) == 2 && p(i + 18) == 0 &&
            p(i + 19) == 0 && p(i + 20) == 0 && w > 0 && h > 0
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    if (!ihdrOk || idat.size() == 0) return None
    // untrusted IHDR dimensions: reject before allocating (see BmpCodec) —
    // h·(1+3w) must fit an Int and a sane decode budget, or a hostile
    // CRC-valid container OOMs the executor instead of returning None
    if (h.toLong * (1 + w.toLong * 3) > MaxPixelBytes) return None
    val rowB = w * 3
    val raw = new Array[Byte](h * (1 + rowB))
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        if (n == 0 && infl.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally infl.end()
    if (got != raw.length) return None
    val px = new Array[Byte](h * rowB)
    var kinds = 0 // bitmask of filter types seen
    var row = 0
    while (row < h) {
      val ft = raw(row * (1 + rowB)) & 0xff
      if (ft > 4) return None
      kinds |= 1 << ft
      val base = row * (1 + rowB) + 1
      val out = row * rowB
      val up = out - rowB
      var c = 0
      while (c < rowB) {
        val x = raw(base + c) & 0xff
        val left = if (c >= 3) px(out + c - 3) & 0xff else 0
        val above = if (row > 0) px(up + c) & 0xff else 0
        val upLeft = if (row > 0 && c >= 3) px(up + c - 3) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + above
          case 3 => x + (left + above) / 2
          case 4 => // Paeth predictor
            val pp = left + above - upLeft
            val pa = math.abs(pp - left); val pb = math.abs(pp - above)
            val pc = math.abs(pp - upLeft)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft)
        }
        px(out + c) = (recon & 0xff).toByte
        c += 1
      }
      row += 1
    }
    Some((w, h, px, java.lang.Integer.bitCount(kinds)))
  }
}
