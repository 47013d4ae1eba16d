package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

/** REAL pixel-level codec for GIF — pure-JVM LZW, the entropy coder GIF
  * wraps pixels in. LZW is a plain dictionary coder (no Huffman tables, no
  * DCT), so unlike JPEG it needs no codec library: `encode` emits a
  * genuine GIF89a (logical screen descriptor, 256-entry grayscale global
  * color table, image descriptor, variable-code-width LZW stream in
  * ≤255-byte sub-blocks); `decodePixels` walks the block list, rebuilds
  * the LZW dictionary code by code — including the KwKwK
  * just-added-code case and dictionary reset on CLEAR — and maps indices
  * through the actual color table, so it decodes any conforming
  * single-image 8-bit GIF, not just its own output.
  *
  * Code-width discipline (the part implementations get wrong): widths
  * start at minCodeSize+1 and cap at 12. The DECODER grows after adding
  * entry `next` when `next == 1<<width`; the ENCODER adds its entry one
  * code earlier in the stream than the decoder does, so it must grow one
  * entry later — `next == (1<<width)+1` — to stay bit-synchronized.
  * At 4096 entries the encoder emits CLEAR and resets; the decoder also
  * tolerates streams that defer the clear (stops adding at 4096).
  */
object GifCodec {
  val W = 16 // fixed encode width: one payload byte per pixel index

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  /** GIF-variant LZW compression of `idx` with 8-bit min code size. */
  private[ops] def lzwEncode(idx: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    val Clear = 256; val Eoi = 257
    // dictionary keyed by (prefixCode << 8 | nextByte) — every prefix is a
    // known code, so the chain key is exact and O(1)
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    emit(Clear)
    if (idx.nonEmpty) {
      var prefix = idx(0) & 0xff
      var i = 1
      while (i < idx.length) {
        val c = idx(i) & 0xff
        val key = Integer.valueOf((prefix << 8) | c)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          dict.put(key, Integer.valueOf(next)); next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next == 4096) { // table full: hard reset (no deferred clear)
            emit(Clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = 258; width = 9
          }
          prefix = c
        }
        i += 1
      }
      emit(prefix)
    }
    emit(Eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt) // flush partial byte
    out.toByteArray
  }

  /** General GIF LZW decode: returns the index stream or None on a
    * malformed code sequence.
    */
  private[ops] def lzwDecode(data: Array[Byte], minCode: Int,
      maxOut: Int): Option[Array[Byte]] = {
    val Clear = 1 << minCode; val Eoi = Clear + 1
    val out = new java.io.ByteArrayOutputStream()
    // dictionary as parent-pointer chains: suffix byte + previous code
    val suffix = new Array[Byte](4096)
    val parent = new Array[Int](4096)
    val buf = new Array[Byte](4096) // reversed-chain scratch
    var next = Eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var pos = 0
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= Clear) c = parent(c)
      c.toByte
    }
    def writeChain(code: Int): Unit = {
      var c = code; var n = 0
      while (c >= Clear) { buf(n) = suffix(c); n += 1; c = parent(c) }
      buf(n) = c.toByte; n += 1
      while (n > 0) { n -= 1; out.write(buf(n)) }
    }
    while (true) {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      if (nbits < width) return None // ran out of bits before EOI
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nbits -= width
      if (code == Clear) {
        next = Eoi + 1; width = minCode + 1; prev = -1
      } else if (code == Eoi) {
        return Some(out.toByteArray)
      } else if (code > next || (code == next && prev < 0)) {
        return None // referenced a code the dictionary can't have yet
      } else {
        if (prev < 0) {
          if (code >= Clear) return None
          out.write(code)
        } else {
          val entryFirst =
            if (code == next) firstByte(prev) // KwKwK: code being defined
            else firstByte(code)
          if (next < 4096) { // deferred-clear streams stop growing here
            suffix(next) = entryFirst
            parent(next) = prev
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          // for KwKwK `code` is the entry just added above, so one
          // writeChain covers both cases
          writeChain(code)
        }
        prev = code
        if (out.size() > maxOut) return None // oversized vs declared dims
      }
    }
    None
  }

  /** Payload bytes become pixel indices row-major (zero-padded last row),
    * height = ceil(len/16), min 1; the global color table is the identity
    * grayscale ramp palette[i] = (i, i, i).
    */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val h = math.max(1, (payload.length + W - 1) / W)
    val idx = java.util.Arrays.copyOf(payload, W * h)
    val out = new java.io.ByteArrayOutputStream(W * h + 800)
    "GIF89a".foreach(c => out.write(c))
    le16(out, W); le16(out, h)
    out.write(0xf7) // GCT present, color resolution 8, GCT size 2^(7+1)=256
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    le16(out, 0); le16(out, 0); le16(out, W); le16(out, h)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW min code size
    val lzw = lzwEncode(idx)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Block-walking decode of any single-image 8-bit non-interlaced GIF:
    * returns (width, height, gray values = color-table red channel per
    * pixel) or None outside that profile.
    */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (HeaderCodec.sniff(p) != "gif") return None
    if (p.length < 13) return None // truncated screen descriptor
    val w = rd16(p, 6); val h = rd16(p, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixelBytes) return None
    val packed = p(10) & 0xff
    var i = 13
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (i + 3 * n > p.length) return None
      palette = java.util.Arrays.copyOfRange(p, i, i + 3 * n)
      i += 3 * n
    }
    while (i < p.length) {
      (p(i) & 0xff) match {
        case 0x21 => // extension: label byte, then sub-blocks to a 0 block
          i += 2
          while (i < p.length && (p(i) & 0xff) != 0) i += 1 + (p(i) & 0xff)
          i += 1
        case 0x2c =>
          if (i + 10 > p.length) return None
          val iw = rd16(p, i + 5); val ih = rd16(p, i + 7)
          // untrusted dims: iw·ih can exceed Int.MaxValue (65535² ≈ 4.3e9)
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > MaxPixelBytes) return None
          val ipacked = p(i + 9) & 0xff
          if ((ipacked & 0x40) != 0) return None // interlaced unsupported
          i += 10
          if ((ipacked & 0x80) != 0) { // local color table wins
            val n = 1 << ((ipacked & 7) + 1)
            if (i + 3 * n > p.length) return None
            palette = java.util.Arrays.copyOfRange(p, i, i + 3 * n)
            i += 3 * n
          }
          if (palette == null || i >= p.length) return None
          val minCode = p(i) & 0xff
          if (minCode < 2 || minCode > 11) return None
          i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < p.length && (p(i) & 0xff) != 0) {
            val n = p(i) & 0xff
            if (i + 1 + n > p.length) return None
            data.write(p, i + 1, n)
            i += 1 + n
          }
          val decoded = lzwDecode(data.toByteArray, minCode, iw * ih)
          decoded match {
            case Some(idx) if idx.length == iw * ih =>
              val px = new Array[Byte](iw * ih)
              var k = 0
              var ok = true
              while (ok && k < idx.length) {
                val pi = 3 * (idx(k) & 0xff)
                if (pi + 2 >= palette.length) ok = false
                else { px(k) = palette(pi); k += 1 } // red channel
              }
              return if (ok) Some((iw, ih, px)) else None
            case _ => return None
          }
        case 0x3b => return None // trailer before any image data
        case _ => return None
      }
    }
    None
  }
}
