package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads ride through
  * the engine as opaque `binary` columns with typed metadata extracted by a
  * partition-batched decoder.
  *
  * Decoding is tiered, all REAL down to content level for the formats JVM
  * byte arithmetic can reach without native codec libs:
  * [[HeaderCodec]] sniffs container magic and parses actual format headers
  * (PNG IHDR, BMP info header, GIF screen descriptor, WAV fmt chunk);
  * [[BmpCodec]] and [[WavCodec]] go further — full pixel-array /
  * PCM-sample decode of uncompressed 24-bit BMP and 16-bit PCM WAV,
  * header-driven (offset + stride walk, RIFF chunk iteration), exercised
  * end-to-end by q131; [[PngCodec]] decodes a COMPRESSED container too —
  * zlib inflate + all five PNG row filters + chunk CRC verification, pure
  * JVM (q140); [[GifCodec]] decodes GIF's LZW entropy coding — a plain
  * dictionary coder, fully implementable in JVM byte arithmetic (q142);
  * [[JpegCodec]] decodes TRANSFORM-CODED baseline sequential grayscale
  * JPEG — canonical Huffman from DHT, zigzag, dequantization, and a
  * double-precision 8×8 IDCT, pure JVM (q159). The remaining boundary is
  * subsampled-color/progressive JPEG and compressed audio; payloads that
  * match no known magic fall back to the clearly-marked
  * [[FakeCodec]] STUB, which derives deterministic dimensions from leading
  * bytes so the synthetic text fixtures stay oracle-checkable. Everything
  * around the codecs — the binary column, the typed Dataset boundary, the
  * `mapPartitions` batch shape (one decoder instantiation per partition,
  * streaming iterator, no per-row setup), and the schema of the decoded
  * output — is the real production plumbing.
  *
  * Scale: decode runs partition-parallel with no shuffle; metadata
  * aggregation afterwards is a normal partial agg. Payloads never pass
  * through the driver.
  */
object Multimodal {

  /** Decode allocation budget: header-declared dimensions are validated in
    * Long arithmetic against this cap (64 MiB of pixel bytes) before any
    * array is sized, so adversarial containers fail soft (None) instead of
    * OOM/NegativeArraySizeException inside a mapPartitions task.
    */
  private[ops] val MaxPixelBytes = 64L << 20

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int)

  final case class Frame(doc_id: Long, frame_id: Int, off: Int, frame_w: Int)

  /** Real header-level media parser: identifies the container by magic
    * bytes and reads dimensions/metadata straight from the format's own
    * header layout. Returns `Some((w, h))` for recognized containers
    * (WAV reports (sampleRate, channels) in the same slot), `None` for
    * anything unrecognized or truncated — callers fall back to
    * [[FakeCodec]] there.
    */
  object HeaderCodec {
    private def u8(p: Array[Byte], i: Int) = p(i) & 0xff
    private def be32(p: Array[Byte], i: Int) =
      (u8(p, i) << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
    private def le16(p: Array[Byte], i: Int) = u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int) =
      u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16) | (u8(p, i + 3) << 24)
    private def ascii(p: Array[Byte], i: Int, s: String) =
      p.length >= i + s.length && s.indices.forall(k => u8(p, i + k) == s.charAt(k))

    /** Container kind by magic, or "unknown". */
    def sniff(p: Array[Byte]): String =
      if (p.length >= 24 && be32(p, 0) == 0x89504e47 && be32(p, 4) == 0x0d0a1a0a) "png"
      // "BM" alone would false-positive on ASCII text payloads; require a
      // plausible DIB header size too (an ASCII run can never produce one)
      else if (p.length >= 26 && ascii(p, 0, "BM") &&
        Set(12, 40, 56, 64, 108, 124).contains(le32(p, 14))) "bmp"
      else if (p.length >= 10 && (ascii(p, 0, "GIF87a") || ascii(p, 0, "GIF89a"))) "gif"
      else if (p.length >= 28 && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE")) "wav"
      else "unknown"

    def decode(p: Array[Byte]): Option[(Int, Int)] = sniff(p) match {
      // PNG: 8-byte signature, then the IHDR chunk (len+type at 8..15),
      // width/height big-endian at 16/20
      case "png" if p.length >= 24 && ascii(p, 12, "IHDR") =>
        Some((be32(p, 16), be32(p, 20)))
      // BMP: BITMAPINFOHEADER width at 18, height at 22 (LE int32; height
      // may be negative for top-down rows)
      // abs in Long: Int.MinValue height must not surface as negative dims
      case "bmp" => Some((le32(p, 18),
        math.abs(le32(p, 22).toLong).min(Int.MaxValue.toLong).toInt))
      // GIF: logical screen descriptor, LE uint16 at 6/8
      case "gif" => Some((le16(p, 6), le16(p, 8)))
      // WAV: fmt chunk directly after "WAVE" in canonical files — channels
      // LE uint16 at 22, sample rate LE uint32 at 24
      case "wav" if ascii(p, 12, "fmt ") => Some((le32(p, 24), le16(p, 22)))
      case _ => None
    }
  }

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

  /** REAL sample-level codec for PCM WAV — canonical RIFF chunk walk.
    * `encode` emits 16-bit mono PCM at 8 kHz; `decodeSamples` iterates the
    * chunk list (not a fixed layout) to find `fmt ` and `data`, validates
    * PCM/16-bit, and reads little-endian signed samples.
    */
  object WavCodec {
    private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
      le16(out, i, v & 0xffff); le16(out, i + 2, (v >>> 16) & 0xffff)
    }
    private def tag(out: Array[Byte], i: Int, s: String): Unit =
      s.indices.foreach(k => out(i + k) = s.charAt(k).toByte)
    private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def rd32(p: Array[Byte], i: Int) = rd16(p, i) | (rd16(p, i + 2) << 16)
    private def isTag(p: Array[Byte], i: Int, s: String) =
      p.length >= i + 4 && s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** Payload byte pairs become LE int16 samples (odd tail padded with a
      * zero high byte); sample count = ceil(len/2), min 1.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val n = math.max(1, (payload.length + 1) / 2)
      val dataSize = n * 2
      val out = new Array[Byte](44 + dataSize)
      tag(out, 0, "RIFF"); le32(out, 4, 36 + dataSize); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 16)
      le16(out, 20, 1)      // PCM
      le16(out, 22, 1)      // mono
      le32(out, 24, 8000)   // sample rate
      le32(out, 28, 16000)  // byte rate
      le16(out, 32, 2)      // block align
      le16(out, 34, 16)     // bits per sample
      tag(out, 36, "data"); le32(out, 40, dataSize)
      System.arraycopy(payload, 0, out, 44, payload.length)
      out
    }

    /** Chunk-walking decode of any 16-bit PCM WAV: returns the signed
      * sample array or None for non-PCM/non-16-bit/malformed containers.
      */
    def decodeSamples(p: Array[Byte]): Option[Array[Short]] = {
      if (HeaderCodec.sniff(p) != "wav") return None
      var i = 12
      var fmtOk = false
      var data: Option[(Int, Int)] = None
      while (i + 8 <= p.length) {
        val sz = rd32(p, i + 4)
        // hostile negative chunk size would walk i BACKWARDS and loop the
        // task forever — reject the container instead
        if (sz < 0) return None
        if (isTag(p, i, "fmt ") && sz >= 16 && i + 24 <= p.length)
          fmtOk = rd16(p, i + 8) == 1 && rd16(p, i + 22) == 16
        else if (isTag(p, i, "data"))
          data = Some((i + 8, math.min(sz, p.length - i - 8)))
        i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      data.filter(_ => fmtOk).map { case (off, len) =>
        Array.tabulate(len / 2)(k => rd16(p, off + 2 * k).toShort)
      }
    }
  }

  /** REAL compressed-audio codec: ITU-T G.711 μ-law (companding — the
    * logarithmic 8-bit encoding telephony and legacy audio pipelines use;
    * WAV format tag 7). Decode is the standard memoryless expansion
    * (invert, split sign/exponent/mantissa, `t = ((m<<3)+0x84)<<e`,
    * `±(t−0x84)`), which reaches ±32124 over a 16-segment log curve — a
    * genuine lossy compressed format whose decode is exact integer
    * arithmetic, so a SQL oracle reproduces it in closed form. `encode`
    * wraps payload bytes AS the μ-law stream in a conforming format-7 WAV
    * (fmt tag 7, 8 bits/sample); `decodeSamples` walks the RIFF chunks
    * (junk-chunk tolerant, like [[WavCodec]]), validates the format, and
    * expands every code byte. Perceptual subband audio is covered by
    * [[MpegAudioCodec]] (MPEG-1 Layers I/II); the remaining audio
    * boundary is the MDCT/Huffman generation (MP3/AAC).
    */
  object MuLawCodec {
    /** Standard μ-law code → linear PCM expansion (G.711). */
    def expand(code: Int): Short = {
      val u = (~code) & 0xff
      val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
      (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
    }

    private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
      le16(out, i, v & 0xffff); le16(out, i + 2, (v >>> 16) & 0xffff)
    }
    private def tag(out: Array[Byte], i: Int, s: String): Unit =
      s.indices.foreach(k => out(i + k) = s.charAt(k).toByte)
    private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def rd32(p: Array[Byte], i: Int) = rd16(p, i) | (rd16(p, i + 2) << 16)
    private def isTag(p: Array[Byte], i: Int, s: String) =
      p.length >= i + 4 && s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** Payload bytes become the μ-law sample stream, one code per byte
      * (min 1 sample, zero pad — code 0 expands to −8031).
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val n = math.max(1, payload.length)
      val out = new Array[Byte](44 + n)
      tag(out, 0, "RIFF"); le32(out, 4, 36 + n); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 16)
      le16(out, 20, 7)      // WAVE_FORMAT_MULAW
      le16(out, 22, 1)      // mono
      le32(out, 24, 8000)   // sample rate
      le32(out, 28, 8000)   // byte rate (1 byte/sample)
      le16(out, 32, 1)      // block align
      le16(out, 34, 8)      // bits per sample
      tag(out, 36, "data"); le32(out, 40, n)
      System.arraycopy(payload, 0, out, 44, payload.length)
      out
    }

    /** Chunk-walking decode of any μ-law WAV: expands every code byte to
      * linear PCM, or None for non-μ-law/malformed containers.
      */
    def decodeSamples(p: Array[Byte]): Option[Array[Short]] = {
      if (HeaderCodec.sniff(p) != "wav") return None
      var i = 12
      var fmtOk = false
      var data: Option[(Int, Int)] = None
      while (i + 8 <= p.length) {
        val sz = rd32(p, i + 4)
        if (sz < 0) return None // negative size would walk i backwards
        if (isTag(p, i, "fmt ") && sz >= 16 && i + 24 <= p.length)
          fmtOk = rd16(p, i + 8) == 7 && rd16(p, i + 22) == 8
        else if (isTag(p, i, "data"))
          data = Some((i + 8, math.min(sz, p.length - i - 8)))
        i += 8 + sz + (sz & 1)
      }
      data.filter(_ => fmtOk).map { case (off, len) =>
        Array.tabulate(len)(k => expand(p(off + k) & 0xff))
      }
    }
  }

  /** REAL predictive-audio codec: IMA/DVI ADPCM (WAV format tag 0x11) —
    * the 4-bit adaptive differential PCM of the IMA reference algorithm:
    * every nibble updates a (predictor, step-index) STATE pair, so unlike
    * the memoryless G.711 curve ([[MuLawCodec]]) each decoded sample
    * depends on the entire nibble history. The arithmetic is still exact
    * integers (table step, 3-shift diff reconstruction, ±32768 clamp,
    * index clamp to [0, 88]), which is what lets a SQL oracle replay the
    * recurrence with a recursive CTE — closing the "predictive codecs
    * aren't oracle-expressible" boundary; perceptual subband audio is
    * [[MpegAudioCodec]], and what remains out of scope is the
    * MDCT/Huffman generation (MP3/AAC).
    *
    * `encode` wraps payload bytes AS the nibble stream (low nibble first,
    * the WAV layout) in a conforming single-block format-0x11 container
    * (fmt size 20 with samplesPerBlock extra field, 4-byte block header:
    * int16 predictor, step index, reserved). `decodeSamples` walks the
    * RIFF chunks, validates format tag/bits/block header, and replays the
    * recurrence block by block — any conforming mono IMA ADPCM WAV, not
    * just this encoder's output.
    */
  object AdpcmCodec {
    /** IMA ADPCM step-size table (89 entries, public reference constants). */
    val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
      19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
      50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
      130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
      337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
      876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
      5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
      15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    /** Step-index adjustment by nibble magnitude (sign bit ignored). */
    val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One decoder step: (predictor, stepIndex) × nibble → next state.
      * diff = (s>>3) + b0·(s>>2) + b1·(s>>1) + b2·s, subtract when the
      * sign bit is set, clamp both state components.
      */
    def step(pred: Int, idx: Int, nib: Int): (Int, Int) = {
      val s = StepTable(idx)
      var diff = s >> 3
      if ((nib & 1) != 0) diff += s >> 2
      if ((nib & 2) != 0) diff += s >> 1
      if ((nib & 4) != 0) diff += s
      val p = math.max(-32768,
        math.min(32767, if ((nib & 8) != 0) pred - diff else pred + diff))
      val i2 = math.max(0, math.min(88, idx + IndexTable(nib & 7)))
      (p, i2)
    }

    private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
      le16(out, i, v & 0xffff); le16(out, i + 2, (v >>> 16) & 0xffff)
    }
    private def tag(out: Array[Byte], i: Int, s: String): Unit =
      s.indices.foreach(k => out(i + k) = s.charAt(k).toByte)
    private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def rd32(p: Array[Byte], i: Int) = rd16(p, i) | (rd16(p, i + 2) << 16)
    private def isTag(p: Array[Byte], i: Int, s: String) =
      p.length >= i + 4 && s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** Payload bytes become the nibble stream of ONE ADPCM block (low
      * nibble first; min 1 data byte, zero pad): block header predictor 0,
      * step index 0, so samplesPerBlock = 2·n + 1.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val n = math.max(1, payload.length)
      val blockAlign = 4 + n
      val out = new Array[Byte](48 + blockAlign)
      tag(out, 0, "RIFF"); le32(out, 4, 40 + blockAlign); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 20)
      le16(out, 20, 0x11)       // WAVE_FORMAT_IMA_ADPCM
      le16(out, 22, 1)          // mono
      le32(out, 24, 8000)       // sample rate
      le32(out, 28, 4000)       // nominal byte rate
      le16(out, 32, blockAlign)
      le16(out, 34, 4)          // bits per sample
      le16(out, 36, 2)          // cbSize
      le16(out, 38, 2 * n + 1)  // samplesPerBlock
      tag(out, 40, "data"); le32(out, 44, blockAlign)
      // block header at 48: predictor = 0 (int16 LE), step index = 0,
      // reserved — all zero already; nibbles follow
      System.arraycopy(payload, 0, out, 52, payload.length)
      out
    }

    /** Chunk-walking decode of any mono IMA ADPCM WAV: replays the
      * predictor recurrence over every block (block-header sample first,
      * then two nibbles per byte, low first, capped at samplesPerBlock),
      * or None for malformed/non-ADPCM containers.
      */
    def decodeSamples(p: Array[Byte]): Option[Array[Short]] = {
      if (HeaderCodec.sniff(p) != "wav") return None
      var i = 12
      var blockAlign = 0
      var samplesPerBlock = 0
      var fmtOk = false
      var data: Option[(Int, Int)] = None
      while (i + 8 <= p.length) {
        val sz = rd32(p, i + 4)
        if (sz < 0) return None // negative size would walk i backwards
        if (isTag(p, i, "fmt ") && sz >= 20 && i + 28 <= p.length) {
          fmtOk = rd16(p, i + 8) == 0x11 && rd16(p, i + 10) == 1 &&
            rd16(p, i + 22) == 4
          blockAlign = rd16(p, i + 20)
          samplesPerBlock = rd16(p, i + 26)
        } else if (isTag(p, i, "data"))
          data = Some((i + 8, math.min(sz, p.length - i - 8)))
        i += 8 + sz + (sz & 1)
      }
      if (!fmtOk || blockAlign < 5 || samplesPerBlock < 1) return None
      data.map { case (off, len) =>
        val out = Array.newBuilder[Short]
        var b = off
        while (b + 4 <= off + len) {
          val blockEnd = math.min(b + blockAlign, off + len)
          var pred = rd16(p, b).toShort.toInt
          var idx = p(b + 2) & 0xff
          if (idx > 88) return None // hostile header: out-of-table index
          out += pred.toShort
          var emitted = 1
          var j = b + 4
          while (j < blockEnd && emitted < samplesPerBlock) {
            val byte = p(j) & 0xff
            var half = 0
            while (half < 2 && emitted < samplesPerBlock) {
              val (p2, i2) = step(pred, idx, (byte >> (4 * half)) & 0xf)
              pred = p2; idx = i2
              out += pred.toShort
              emitted += 1
              half += 1
            }
            j += 1
          }
          b += blockAlign
        }
        out.result()
      }
    }
  }

  /** REAL lossless-audio codec: FLAC (the public xiph.org format — RFC
    * 9639), pure JVM and pure integer math: fLaC magic + STREAMINFO
    * metadata, per-frame headers (14-bit sync, blocksize/rate/channel/
    * sample-size codes, UTF-8-coded frame number, CRC-8) and footers
    * (CRC-16 over the whole frame), CONSTANT / VERBATIM / FIXED-predictor
    * subframes (orders 0–4, the spec's polynomial difference predictors),
    * and Rice-coded residuals (zigzag fold, unary quotient = run of 0s
    * then a 1, 4-bit parameters with the 5-bit raw-escape decode path,
    * general partition orders). Lossless means decode∘encode is BIT-EXACT
    * on any PCM input — the property the DuckDB oracle consumes directly
    * (the oracle recomputes the input samples in closed form; no codec
    * state replay needed, unlike q169's ADPCM recursion). The encoder
    * picks the best fixed order per frame like a real encoder (min sum
    * |residual|), emits CONSTANT frames for flat stretches, and can emit
    * genuine LPC subframes (Levinson-Durbin on the frame autocorrelation,
    * 15-bit quantized coefficients, residuals computed with the decoder's
    * exact integer predictor so the round-trip stays lossless); the
    * decoder handles all four subframe types including arbitrary-order
    * LPC with the 64-bit-accumulator arithmetic-shift reconstruction.
    * STEREO streams support all four channel assignments — independent,
    * left-side, right-side, and mid-side (the dropped sum LSB restored
    * from the side channel's parity; side subframes carry bps + 1 bits)
    * — the inter-channel decorrelation that makes stereo FLAC beat two
    * mono streams on correlated audio (spec-proven).
    */
  object FlacCodec {
    private val BlockSize = 256

    private final class FlacFail extends RuntimeException

    private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        crc ^= b(i) & 0xff
        var j = 0
        while (j < 8) {
          crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
          j += 1
        }
        i += 1
      }
      crc
    }

    private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        crc ^= (b(i) & 0xff) << 8
        var j = 0
        while (j < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
                else (crc << 1) & 0xffff
          j += 1
        }
        i += 1
      }
      crc
    }

    private final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var acc = 0
      private var n = 0
      def put(v: Long, bits: Int): Unit = { // MSB first
        var i = bits - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1L).toInt
          n += 1
          if (n == 8) { out.write(acc); acc = 0; n = 0 }
          i -= 1
        }
      }
      def putUnary(q: Int): Unit = { // q zeros, then a terminating 1
        var i = 0
        while (i < q) { put(0, 1); i += 1 }
        put(1, 1)
      }
      def align(): Unit = while (n != 0) put(0, 1)
      def bytes: Array[Byte] = out.toByteArray
    }

    private final class BitReader(p: Array[Byte], var pos: Int) {
      private var acc = 0
      private var n = 0
      def bit(): Int = {
        if (n == 0) {
          if (pos >= p.length) throw new FlacFail
          acc = p(pos) & 0xff; pos += 1; n = 8
        }
        n -= 1
        (acc >> n) & 1
      }
      def bits(len: Int): Long = {
        var v = 0L
        var i = 0
        while (i < len) { v = (v << 1) | bit(); i += 1 }
        v
      }
      def unary(): Int = {
        var q = 0
        while (bit() == 0) { q += 1; if (q > (1 << 24)) throw new FlacFail }
        q
      }
      def align(): Unit = { n = 0 }
      def atByteBoundary: Boolean = n == 0
    }

    /** UTF-8-style coded number (the frame-number coding, RFC 9639 §9.1.5). */
    private def utf8Encode(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      if (v0 < 0x80) { out.write(v0.toInt); return }
      var bytes = 2
      while (bytes < 7 && v0 >= (1L << (bytes * 5 + 1))) bytes += 1
      val lead = (0xfe << (7 - bytes)) & 0xff
      out.write(lead | ((v0 >> (6 * (bytes - 1))) & ((1 << (7 - bytes)) - 1)).toInt)
      var i = bytes - 2
      while (i >= 0) { out.write(0x80 | ((v0 >> (6 * i)) & 0x3f).toInt); i -= 1 }
    }

    private def utf8Decode(br: BitReader): Long = {
      val b0 = br.bits(8).toInt
      if ((b0 & 0x80) == 0) return b0
      var bytes = 0
      var mask = 0x40
      while ((b0 & mask) != 0) { bytes += 1; mask >>= 1 }
      if (bytes < 1 || bytes > 6) throw new FlacFail
      var v = (b0 & (mask - 1)).toLong
      var i = 0
      while (i < bytes) {
        val b = br.bits(8).toInt
        if ((b & 0xc0) != 0x80) throw new FlacFail
        v = (v << 6) | (b & 0x3f)
        i += 1
      }
      v
    }

    // FIXED predictor residual at order o over s (spec §9.2.5 polynomials)
    private def residual(s: Array[Int], i: Int, o: Int): Int = o match {
      case 0 => s(i)
      case 1 => s(i) - s(i - 1)
      case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
      case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
      case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
    }

    /** One subframe at sample width `w0` bits (a decorrelated stereo side
      * channel carries bps + 1): CONSTANT / VERBATIM / FIXED / LPC with
      * wasted-bits handling — reconstruction at reduced width, wasted
      * bits restored last. Shared by the mono and stereo frame decoders.
      */
    private def readSubframe(br: BitReader, blockSize: Int, w0: Int): Array[Int] = {
      if (br.bit() != 0) throw new FlacFail
      val sfType = br.bits(6).toInt
      val wasted = if (br.bit() == 1) br.unary() + 1 else 0
      if (wasted >= w0) throw new FlacFail
      val w = w0 - wasted // samples are stored at reduced width, shifted
      def signedW(v: Long): Int = (v.toInt << (32 - w)) >> (32 - w)
      val s = new Array[Int](blockSize)
      sfType match {
        case 0 => // CONSTANT
          java.util.Arrays.fill(s, signedW(br.bits(w)) << wasted)
        case 1 => // VERBATIM
          var j = 0
          while (j < blockSize) { s(j) = signedW(br.bits(w)) << wasted; j += 1 }
        case t if t >= 8 && t <= 12 => // FIXED order 0..4
          val order = t - 8
          if (order > blockSize) throw new FlacFail
          var j = 0
          while (j < order) { s(j) = signedW(br.bits(w)); j += 1 }
          val res = readResiduals(br, blockSize, order)
          // reconstruct at reduced width, then restore wasted bits last
          var idx = order
          while (idx < blockSize) {
            val rv = res(idx - order)
            s(idx) = (order match {
              case 0 => rv
              case 1 => rv + s(idx - 1)
              case 2 => rv + 2 * s(idx - 1) - s(idx - 2)
              case 3 => rv + 3 * s(idx - 1) - 3 * s(idx - 2) + s(idx - 3)
              case _ => rv + 4 * s(idx - 1) - 6 * s(idx - 2) + 4 * s(idx - 3) - s(idx - 4)
            })
            idx += 1
          }
          if (wasted > 0) {
            idx = 0
            while (idx < blockSize) { s(idx) <<= wasted; idx += 1 }
          }
        case t if t >= 32 => // LPC order 1..32
          val order = (t & 0x1f) + 1
          if (order > blockSize) throw new FlacFail
          var j = 0
          while (j < order) { s(j) = signedW(br.bits(w)); j += 1 }
          val precM1 = br.bits(4).toInt
          if (precM1 == 15) throw new FlacFail // invalid per spec
          val prec = precM1 + 1
          val shift = (br.bits(5).toInt << 27) >> 27 // signed 5-bit
          if (shift < 0) throw new FlacFail // negative shift not allowed
          val coefs = Array.fill(order)((br.bits(prec).toInt << (32 - prec)) >> (32 - prec))
          val res = readResiduals(br, blockSize, order)
          var idx = order
          while (idx < blockSize) {
            var acc = 0L // 64-bit accumulator per spec
            var c = 0
            while (c < order) { acc += coefs(c).toLong * s(idx - 1 - c); c += 1 }
            s(idx) = res(idx - order) + (acc >> shift).toInt
            idx += 1
          }
          if (wasted > 0) {
            idx = 0
            while (idx < blockSize) { s(idx) <<= wasted; idx += 1 }
          }
        case _ => throw new FlacFail
      }
      s
    }

    /** Residual section shared by FIXED and LPC subframes: 2-bit method,
      * partition order, per-partition Rice parameter (with the raw-escape
      * decode path), zigzag-folded unary/remainder codes.
      */
    private def readResiduals(br: BitReader, blockSize: Int, order: Int): Array[Int] = {
      val res = new Array[Int](blockSize - order)
      val method = br.bits(2).toInt
      if (method > 1) throw new FlacFail
      val pbits = if (method == 0) 4 else 5
      val escape = (1 << pbits) - 1
      val po = br.bits(4).toInt
      val parts = 1 << po
      if (blockSize % parts != 0 || (blockSize / parts <= order && parts > 1))
        throw new FlacFail
      var r = 0
      var part = 0
      while (part < parts) {
        val cnt = (if (parts == 1) blockSize - order
                   else if (part == 0) blockSize / parts - order
                   else blockSize / parts)
        val k = br.bits(pbits).toInt
        if (k == escape) {
          val raw = br.bits(5).toInt
          var j = 0
          while (j < cnt) {
            val x = br.bits(raw)
            res(r) = if (raw == 0) 0 else (x.toInt << (32 - raw)) >> (32 - raw)
            r += 1; j += 1
          }
        } else {
          var j = 0
          while (j < cnt) {
            val q = br.unary().toLong
            val folded = (q << k) | (if (k > 0) br.bits(k) else 0L)
            res(r) = (if ((folded & 1) == 0) folded >> 1 else -((folded >> 1) + 1)).toInt
            r += 1; j += 1
          }
        }
        part += 1
      }
      res
    }

    private def writeResiduals(body: BitWriter, res: Array[Int]): Unit = {
      body.put(0, 2) // residual method: 4-bit Rice
      body.put(0, 4) // partition order 0
      val k = riceParam(res, 0, res.length)
      body.put(k, 4)
      res.foreach { v =>
        val folded = if (v >= 0) v.toLong << 1 else ((-v).toLong << 1) - 1
        body.putUnary((folded >> k).toInt)
        if (k > 0) body.put(folded & ((1L << k) - 1), k)
      }
    }

    private def riceParam(res: Array[Int], from: Int, until: Int): Int = {
      var sum = 0L
      var i = from
      while (i < until) {
        val v = res(i)
        sum += (if (v >= 0) v.toLong << 1 else ((-v).toLong << 1) - 1)
        i += 1
      }
      val count = math.max(1, until - from)
      var k = 0
      while (k < 14 && (count.toLong << (k + 1)) < sum) k += 1
      k
    }

    /** "fLaC" magic + the one mandatory STREAMINFO block — shared by the
      * mono and stereo encoders (they differ only in channels − 1).
      */
    private def writeStreamPreamble(out: java.io.ByteArrayOutputStream,
        channelsMinus1: Int, totalSamples: Long): Unit = {
      "fLaC".foreach(c => out.write(c))
      out.write(0x80) // last metadata block, type 0 = STREAMINFO
      out.write(0); out.write(0); out.write(34)
      val si = new BitWriter
      si.put(BlockSize, 16); si.put(BlockSize, 16) // min/max blocksize
      si.put(0, 24); si.put(0, 24) // min/max framesize unknown
      si.put(8000, 20) // sample rate
      si.put(channelsMinus1, 3)
      si.put(15, 5) // bits per sample - 1
      si.put(totalSamples, 36)
      (0 until 16).foreach(_ => si.put(0, 8)) // MD5 unknown
      out.write(si.bytes)
    }

    /** Frame header bytes (sync through the conditional 16-bit end-of-
      * stream blocksize), CRC-8 excluded — `chanCode` 0 = mono, else a
      * stereo channel-assignment code.
      */
    private def frameHeader(n: Int, chanCode: Int, frame: Int): Array[Byte] = {
      val hdr = new java.io.ByteArrayOutputStream()
      val hb = new BitWriter
      hb.put(0x3ffe, 14) // sync
      hb.put(0, 1) // reserved
      hb.put(0, 1) // fixed blocking: frame number = frame index
      hb.put(if (n == BlockSize) 0x8 else 0x7, 4) // 256 | 16-bit at end
      hb.put(0, 4) // sample rate: from STREAMINFO
      hb.put(chanCode, 4)
      hb.put(4, 3) // 16-bit samples
      hb.put(0, 1) // reserved
      hdr.write(hb.bytes)
      utf8Encode(hdr, frame.toLong)
      if (n != BlockSize) { hdr.write(((n - 1) >> 8) & 0xff); hdr.write((n - 1) & 0xff) }
      hdr.toByteArray
    }

    /** Assemble one frame: header + CRC-8(header) + aligned body +
      * CRC-16(all of the above).
      */
    private def writeFrame(out: java.io.ByteArrayOutputStream,
        hdrBytes: Array[Byte], body: BitWriter): Unit = {
      body.align()
      val frameBuf = new java.io.ByteArrayOutputStream()
      frameBuf.write(hdrBytes)
      frameBuf.write(crc8(hdrBytes, 0, hdrBytes.length))
      frameBuf.write(body.bytes)
      val fb = frameBuf.toByteArray
      val c16 = crc16(fb, 0, fb.length)
      out.write(fb)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    }

    /** Encode mono 16-bit PCM to a conforming FLAC stream. `forceOrder`
      * (0..4) / `forceVerbatim` / `lpcOrder` pin a subframe type for spec
      * coverage; default behavior is best-fixed-order with CONSTANT for
      * flat frames.
      */
    def encodePcm(samples: Array[Int], forceOrder: Int = -1,
        forceVerbatim: Boolean = false, lpcOrder: Int = -1): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      writeStreamPreamble(out, 0, samples.length.toLong)
      var off = 0
      var frame = 0
      while (off < samples.length) {
        val n = math.min(BlockSize, samples.length - off)
        val hdrBytes = frameHeader(n, 0, frame) // chanCode 0 = mono
        val body = new BitWriter
        val s = java.util.Arrays.copyOfRange(samples, off, off + n)
        val const = s.forall(_ == s(0))
        if (forceVerbatim) {
          body.put(0, 1); body.put(1, 6); body.put(0, 1) // VERBATIM
          s.foreach(v => body.put(v & 0xffffL, 16))
        } else if (const && forceOrder < 0 && lpcOrder < 1) {
          body.put(0, 1); body.put(0, 6); body.put(0, 1) // CONSTANT
          body.put(s(0) & 0xffffL, 16)
        } else if (lpcOrder >= 1 && n > lpcOrder) {
          // LPC subframe: Levinson-Durbin on the frame autocorrelation,
          // coefficients quantized to 15-bit precision with a shift chosen
          // so the largest fits; residuals computed with the DECODER's
          // exact integer predictor (64-bit accumulator, arithmetic shift)
          // so the round-trip is lossless regardless of model quality
          val order = math.min(lpcOrder, 32)
          // Welch-windowed autocorrelation (standard encoder practice —
          // unwindowed finite-frame estimates bias the model; windowing
          // only affects model QUALITY, never losslessness)
          val win = Array.tabulate(n) { i =>
            val t = (i - (n - 1) / 2.0) / ((n + 1) / 2.0)
            s(i) * (1.0 - t * t)
          }
          val ac = Array.tabulate(order + 1) { lag =>
            var sum = 0.0
            var i = lag
            while (i < n) { sum += win(i) * win(i - lag); i += 1 }
            sum
          }
          val a = new Array[Double](order)
          var err = ac(0)
          var i = 0
          while (i < order && err > 0) {
            var acc = ac(i + 1)
            var j = 0
            while (j < i) { acc -= a(j) * ac(i - j); j += 1 }
            val kref = acc / err
            val prev = java.util.Arrays.copyOf(a, i)
            a(i) = kref
            j = 0
            while (j < i) { a(j) = prev(j) - kref * prev(i - 1 - j); j += 1 }
            err *= 1 - kref * kref
            i += 1
          }
          val maxc = a.map(math.abs).foldLeft(0.0)(math.max)
          val prec = 15
          var shift = 14
          while (shift > 0 && maxc * (1L << shift) > (1 << (prec - 1)) - 1)
            shift -= 1
          val qc = a.map { c =>
            math.max(-(1 << (prec - 1)),
              math.min((1 << (prec - 1)) - 1, math.round(c * (1L << shift)).toInt))
          }
          body.put(0, 1); body.put(0x20 | (order - 1), 6); body.put(0, 1)
          var w = 0
          while (w < order) { body.put(s(w) & 0xffffL, 16); w += 1 } // warmup
          body.put(prec - 1, 4)
          body.put(shift, 5)
          qc.foreach(c => body.put(c & ((1L << prec) - 1), prec))
          val res = Array.tabulate(n - order) { ri =>
            val idx = ri + order
            var acc = 0L
            var c = 0
            while (c < order) { acc += qc(c).toLong * s(idx - 1 - c); c += 1 }
            s(idx) - (acc >> shift).toInt
          }
          writeResiduals(body, res)
        } else {
          val maxOrder = math.min(4, n)
          val order =
            if (forceOrder >= 0) math.min(forceOrder, maxOrder)
            else (0 to maxOrder).minBy { o =>
              var sum = 0L
              var i = o
              while (i < n) { sum += math.abs(residual(s, i, o).toLong); i += 1 }
              sum
            }
          body.put(0, 1); body.put(8 + order, 6); body.put(0, 1) // FIXED
          var i = 0
          while (i < order) { body.put(s(i) & 0xffffL, 16); i += 1 } // warmup
          writeResiduals(body, Array.tabulate(n - order)(i => residual(s, i + order, order)))
        }
        writeFrame(out, hdrBytes, body)
        off += n
        frame += 1
      }
      out.toByteArray
    }

    /** Payload bytes become 16-bit PCM via s = (b − 128)·256 (min 1 zero
      * sample) — the closed form the q269 oracle recomputes.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val n = math.max(1, payload.length)
      encodePcm(Array.tabulate(n)(i =>
        if (i < payload.length) ((payload(i) & 0xff) - 128) * 256 else 0))
    }

    /** Write one subframe (CONSTANT when flat, else best FIXED order) at
      * sample width `w0` bits — the stereo encoder's shared writer.
      */
    private def writeSubframe(body: BitWriter, sArr: Array[Int], w0: Int): Unit = {
      val n = sArr.length
      val mask = (1L << w0) - 1
      if (n > 0 && sArr.forall(_ == sArr(0))) {
        body.put(0, 1); body.put(0, 6); body.put(0, 1) // CONSTANT
        body.put(sArr(0) & mask, w0)
      } else {
        val maxOrder = math.min(4, n)
        val order = (0 to maxOrder).minBy { o =>
          var sum = 0L
          var i = o
          while (i < n) { sum += math.abs(residual(sArr, i, o).toLong); i += 1 }
          sum
        }
        body.put(0, 1); body.put(8 + order, 6); body.put(0, 1) // FIXED
        var i = 0
        while (i < order) { body.put(sArr(i) & mask, w0); i += 1 } // warmup
        writeResiduals(body, Array.tabulate(n - order)(i => residual(sArr, i + order, order)))
      }
    }

    /** Encode a STEREO 16-bit PCM pair with one of the spec's channel
      * assignments: "independent" (L/R as-is), "left-side" (L, L−R),
      * "right-side" (L−R, R), or "mid-side" ((L+R)>>1, L−R — the dropped
      * sum LSB rides in the side channel's parity). Side channels carry
      * bps + 1 = 17 bits. Inter-channel decorrelation is THE reason
      * stereo FLAC beats two mono streams on correlated audio.
      */
    def encodePcmStereo(left: Array[Int], right: Array[Int],
        assignment: String = "mid-side"): Array[Byte] = {
      require(left.length == right.length)
      val chanCode = assignment match {
        case "independent" => 0x1 // 2 channels, no decorrelation
        case "left-side" => 0x8
        case "right-side" => 0x9
        case "mid-side" => 0xa
      }
      val out = new java.io.ByteArrayOutputStream()
      writeStreamPreamble(out, 1, left.length.toLong)
      var off = 0
      var frame = 0
      while (off < left.length) {
        val n = math.min(BlockSize, left.length - off)
        val hdrBytes = frameHeader(n, chanCode, frame)
        val l = java.util.Arrays.copyOfRange(left, off, off + n)
        val r = java.util.Arrays.copyOfRange(right, off, off + n)
        val (s0, w0, s1, w1) = chanCode match {
          case 0x1 => (l, 16, r, 16)
          case 0x8 => (l, 16, Array.tabulate(n)(i => l(i) - r(i)), 17)
          case 0x9 => (Array.tabulate(n)(i => l(i) - r(i)), 17, r, 16)
          case _ => (Array.tabulate(n)(i => (l(i) + r(i)) >> 1), 16,
            Array.tabulate(n)(i => l(i) - r(i)), 17)
        }
        val body = new BitWriter
        writeSubframe(body, s0, w0)
        writeSubframe(body, s1, w1)
        writeFrame(out, hdrBytes, body)
        off += n
        frame += 1
      }
      out.toByteArray
    }

    /** Decode a STEREO 16-bit FLAC stream — all four channel assignments,
      * per-frame (a conforming stream may switch assignment every frame).
      * Returns (left, right) or None.
      */
    def decodeStereo(p: Array[Byte]): Option[(Array[Short], Array[Short])] = {
      try decodeStereoOrThrow(p) catch {
        case _: FlacFail | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }
    }

    private def decodeStereoOrThrow(p: Array[Byte]): Option[(Array[Short], Array[Short])] = {
      if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C')
        return None
      var i = 4
      var last = false
      var total = -1L
      var bps = 0
      var channels = 0
      while (!last) {
        if (i + 4 > p.length) return None
        last = (p(i) & 0x80) != 0
        val btype = p(i) & 0x7f
        val len = ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (btype == 0) {
          if (len < 34 || i + 4 + 34 > p.length) return None
          val br = new BitReader(p, i + 4)
          br.bits(16); br.bits(16); br.bits(24); br.bits(24); br.bits(20)
          channels = br.bits(3).toInt + 1
          bps = br.bits(5).toInt + 1
          total = br.bits(36)
        }
        i += 4 + len
        if (i > p.length) return None
      }
      if (total < 0 || bps != 16 || channels != 2) return None
      if (total > MaxPixelBytes / 4) return None
      val outL = new Array[Short](total.toInt)
      val outR = new Array[Short](total.toInt)
      var got = 0
      val br = new BitReader(p, i)
      while (got < total) {
        val frameStart = br.pos
        if (!br.atByteBoundary) throw new FlacFail
        if (br.bits(14).toInt != 0x3ffe) throw new FlacFail
        br.bit(); br.bit()
        val bsCode = br.bits(4).toInt
        val srCode = br.bits(4).toInt
        val chan = br.bits(4).toInt
        val ssCode = br.bits(3).toInt
        br.bit()
        if (ssCode != 4) throw new FlacFail
        if (chan != 0x1 && chan != 0x8 && chan != 0x9 && chan != 0xa)
          throw new FlacFail
        utf8Decode(br)
        val blockSize = bsCode match {
          case 0x1 => 192
          case c if c >= 0x2 && c <= 0x5 => 576 << (c - 2)
          case 0x6 => br.bits(8).toInt + 1
          case 0x7 => br.bits(16).toInt + 1
          case c if c >= 0x8 => 256 << (c - 8)
          case _ => throw new FlacFail
        }
        srCode match {
          case 0xc => br.bits(8)
          case 0xd | 0xe => br.bits(16)
          case 0xf => throw new FlacFail
          case _ => ()
        }
        val hdrCrc = br.bits(8).toInt
        if (crc8(p, frameStart, br.pos - 1) != hdrCrc) throw new FlacFail
        if (got + blockSize > total) throw new FlacFail
        val (w0, w1) = chan match {
          case 0x8 => (16, 17) // left-side: side carries bps + 1
          case 0x9 => (17, 16) // right-side
          case 0xa => (16, 17) // mid-side
          case _ => (16, 16)
        }
        val s0 = readSubframe(br, blockSize, w0)
        val s1 = readSubframe(br, blockSize, w1)
        br.align()
        val fCrc = br.bits(16).toInt
        if (crc16(p, frameStart, br.pos - 2) != fCrc) throw new FlacFail
        var j = 0
        while (j < blockSize) {
          val (l, r) = chan match {
            case 0x1 => (s0(j), s1(j))
            case 0x8 => (s0(j), s0(j) - s1(j))
            case 0x9 => (s1(j) + s0(j), s1(j))
            case _ => // mid-side: restore the sum LSB from side parity
              val mid2 = (s0(j) << 1) | (s1(j) & 1)
              ((mid2 + s1(j)) >> 1, (mid2 - s1(j)) >> 1)
          }
          if (l < Short.MinValue || l > Short.MaxValue ||
              r < Short.MinValue || r > Short.MaxValue) throw new FlacFail
          outL(got + j) = l.toShort
          outR(got + j) = r.toShort
          j += 1
        }
        got += blockSize
      }
      Some((outL, outR))
    }

    /** Decode any mono 16-bit FLAC stream (CONSTANT / VERBATIM / FIXED /
      * LPC subframes, Rice or escaped residuals, any partition order,
      * both CRCs verified). None on other geometries or malformed bytes.
      */
    def decodeSamples(p: Array[Byte]): Option[Array[Short]] = {
      try decodeOrThrow(p) catch {
        case _: FlacFail | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }
    }

    private def decodeOrThrow(p: Array[Byte]): Option[Array[Short]] = {
      if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C')
        return None
      var i = 4
      var last = false
      var total = -1L
      var bps = 0
      var channels = 0
      while (!last) {
        if (i + 4 > p.length) return None
        last = (p(i) & 0x80) != 0
        val btype = p(i) & 0x7f
        val len = ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (btype == 0) { // STREAMINFO
          if (len < 34 || i + 4 + 34 > p.length) return None
          val br = new BitReader(p, i + 4)
          br.bits(16); br.bits(16); br.bits(24); br.bits(24); br.bits(20)
          channels = br.bits(3).toInt + 1
          bps = br.bits(5).toInt + 1
          total = br.bits(36)
        }
        i += 4 + len
        if (i > p.length) return None
      }
      if (total < 0 || bps != 16 || channels != 1) return None
      if (total > MaxPixelBytes / 2) return None
      val outSamples = new Array[Short](total.toInt)
      var got = 0
      val br = new BitReader(p, i)
      while (got < total) {
        val frameStart = br.pos // header is byte-aligned by construction
        if (!br.atByteBoundary) throw new FlacFail
        if (br.bits(14).toInt != 0x3ffe) throw new FlacFail
        br.bit() // reserved
        br.bit() // blocking strategy (frame/sample number both fine here)
        val bsCode = br.bits(4).toInt
        val srCode = br.bits(4).toInt
        val chan = br.bits(4).toInt
        val ssCode = br.bits(3).toInt
        br.bit()
        if (chan != 0 || ssCode != 4) throw new FlacFail // mono 16-bit only
        utf8Decode(br)
        val blockSize = bsCode match {
          case 0x1 => 192
          case c if c >= 0x2 && c <= 0x5 => 576 << (c - 2)
          case 0x6 => br.bits(8).toInt + 1
          case 0x7 => br.bits(16).toInt + 1
          case c if c >= 0x8 => 256 << (c - 8)
          case _ => throw new FlacFail
        }
        srCode match {
          case 0xc => br.bits(8) // rate in kHz: skip
          case 0xd | 0xe => br.bits(16)
          case 0xf => throw new FlacFail // invalid
          case _ => ()
        }
        val hdrCrc = br.bits(8).toInt
        if (crc8(p, frameStart, br.pos - 1) != hdrCrc) throw new FlacFail
        if (got + blockSize > total) throw new FlacFail
        val s = readSubframe(br, blockSize, 16) // mono: exactly one
        br.align()
        val fCrc = br.bits(16).toInt
        if (crc16(p, frameStart, br.pos - 2) != fCrc) throw new FlacFail
        var j = 0
        while (j < blockSize) {
          val v = s(j)
          if (v < Short.MinValue || v > Short.MaxValue) throw new FlacFail
          outSamples(got + j) = v.toShort
          j += 1
        }
        got += blockSize
      }
      Some(outSamples)
    }
  }

  /** REAL video container: Motion-JPEG AVI — the RIFF 'AVI ' layout
    * classic capture tools and IP cameras write: an 'hdrl' LIST with the
    * avih main header and one 'vids'/'MJPG' stream (strh + a
    * BITMAPINFOHEADER strf), a 'movi' LIST whose '00dc' chunks each hold
    * a COMPLETE baseline JPEG, and an 'idx1' index whose entries are
    * validated against the actual chunk walk. Frame extraction is the
    * real thing the q62 stub stands in for: RIFF walk → per-frame
    * [[JpegCodec]] pixel decode — one-to-many, each frame a full
    * entropy-coded image. Every frame carries [[FrameBytes]] payload
    * bytes as flat blocks (zero-padded), so all frames share one geometry
    * (as video requires) and the per-frame oracle stays closed form.
    * Decode validates: RIFF/AVI magic, stream type+handler, strf
    * biCompression, per-frame JPEG decode success, frame dims ==
    * avih/strf dims, frame count == avih totalFrames, and — when idx1 is
    * present — index entry count/sizes/offsets against the walk (both
    * public offset conventions: movi-relative and absolute). Fail-soft
    * None on anything else (flip/truncation fuzz in CodecFuzzSpec).
    */
  object MjpegAviCodec {
    val FrameBytes = 8 // payload bytes per frame → 8 blocks → 32×16 px

    private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      le16(out, v & 0xffff); le16(out, (v >>> 16) & 0xffff)
    }
    private def tag(out: java.io.ByteArrayOutputStream, s: String): Unit =
      s.foreach(c => out.write(c))

    def encode(payload: Array[Byte]): Array[Byte] = {
      val nf = math.max(1, (payload.length + FrameBytes - 1) / FrameBytes)
      val frames = Array.tabulate(nf) { f =>
        val slice = new Array[Byte](FrameBytes) // zero-padded frame content
        val from = f * FrameBytes
        val n = math.min(FrameBytes, math.max(0, payload.length - from))
        if (n > 0) System.arraycopy(payload, from, slice, 0, n)
        JpegCodec.encode(slice)
      }
      val w = JpegCodec.BlocksPerRow * 8
      val h = FrameBytes / JpegCodec.BlocksPerRow * 8
      val maxFrame = frames.map(_.length).max
      // movi LIST payload: 'movi' + per-frame '00dc' chunks (word-aligned)
      val movi = new java.io.ByteArrayOutputStream()
      tag(movi, "movi")
      val offsets = new Array[Int](nf) // offset of each '00dc' within movi
      for (f <- 0 until nf) {
        offsets(f) = movi.size()
        tag(movi, "00dc"); le32(movi, frames(f).length)
        movi.write(frames(f))
        if ((frames(f).length & 1) == 1) movi.write(0) // pad to word
      }
      val moviBytes = movi.toByteArray
      // hdrl LIST: avih + strl(strh + strf)
      val hdrl = new java.io.ByteArrayOutputStream()
      tag(hdrl, "hdrl")
      tag(hdrl, "avih"); le32(hdrl, 56)
      le32(hdrl, 40000) // microseconds per frame (25 fps)
      le32(hdrl, 0); le32(hdrl, 0)
      le32(hdrl, 0x10) // AVIF_HASINDEX
      le32(hdrl, nf) // total frames
      le32(hdrl, 0); le32(hdrl, 1) // initial frames, stream count
      le32(hdrl, maxFrame) // suggested buffer size
      le32(hdrl, w); le32(hdrl, h)
      (0 until 4).foreach(_ => le32(hdrl, 0)) // reserved
      val strl = new java.io.ByteArrayOutputStream()
      tag(strl, "strl")
      tag(strl, "strh"); le32(strl, 56)
      tag(strl, "vids"); tag(strl, "MJPG")
      le32(strl, 0); le32(strl, 0); le32(strl, 0) // flags, prio/lang, initial
      le32(strl, 1); le32(strl, 25) // scale, rate → 25 fps
      le32(strl, 0); le32(strl, nf) // start, length (frames)
      le32(strl, maxFrame); le32(strl, -1); le32(strl, 0) // buffer, quality, sampleSize
      le16(strl, 0); le16(strl, 0); le16(strl, w); le16(strl, h) // rcFrame
      tag(strl, "strf"); le32(strl, 40) // BITMAPINFOHEADER
      le32(strl, 40); le32(strl, w); le32(strl, h)
      le16(strl, 1); le16(strl, 24) // planes, bit count
      tag(strl, "MJPG") // biCompression
      le32(strl, w * h * 3)
      le32(strl, 0); le32(strl, 0); le32(strl, 0); le32(strl, 0)
      val strlBytes = strl.toByteArray
      val hdrlFull = new java.io.ByteArrayOutputStream()
      hdrlFull.write(hdrl.toByteArray)
      tag(hdrlFull, "LIST"); le32(hdrlFull, strlBytes.length)
      hdrlFull.write(strlBytes)
      val hdrlBytes = hdrlFull.toByteArray
      // idx1: one entry per frame, offsets relative to the 'movi' fourcc
      val idx = new java.io.ByteArrayOutputStream()
      for (f <- 0 until nf) {
        tag(idx, "00dc"); le32(idx, 0x10) // AVIIF_KEYFRAME
        le32(idx, offsets(f)); le32(idx, frames(f).length)
      }
      val idxBytes = idx.toByteArray
      val riff = new java.io.ByteArrayOutputStream()
      tag(riff, "AVI ")
      tag(riff, "LIST"); le32(riff, hdrlBytes.length); riff.write(hdrlBytes)
      tag(riff, "LIST"); le32(riff, moviBytes.length); riff.write(moviBytes)
      tag(riff, "idx1"); le32(riff, idxBytes.length); riff.write(idxBytes)
      val riffBytes = riff.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      tag(out, "RIFF"); le32(out, riffBytes.length)
      out.write(riffBytes)
      out.toByteArray
    }

    private def rd16(p: Array[Byte], i: Int): Int = {
      if (i + 1 >= p.length) return -1
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    }
    private def rd32(p: Array[Byte], i: Int): Int = {
      if (i + 3 >= p.length) return -1
      rd16(p, i) | (rd16(p, i + 2) << 16)
    }
    private def isTag(p: Array[Byte], i: Int, s: String): Boolean =
      i >= 0 && p.length >= i + 4 &&
        s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** Decoded frames: (width, height, gray pixel planes in frame order),
      * or None for non-MJPG/malformed containers.
      */
    def decodeFrames(p: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] =
      try decodeFramesImpl(p)
      catch { // fail-soft on hostile bytes, like every other codec here
        case _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }

    private def decodeFramesImpl(
        p: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
      if (!isTag(p, 0, "RIFF") || !isTag(p, 8, "AVI ")) return None
      val riffEnd = math.min(p.length.toLong, 8L + rd32(p, 4)).toInt
      if (riffEnd < 12) return None
      var i = 12
      var totalFrames = -1
      var w = -1; var h = -1
      var vidsOk = false; var strfOk = false
      var moviStart = -1; var moviEnd = -1
      var idxStart = -1; var idxLen = -1
      while (i + 8 <= riffEnd) {
        val sz = rd32(p, i + 4)
        if (sz < 0) return None
        if (isTag(p, i, "LIST") && isTag(p, i + 8, "hdrl")) {
          // walk inside hdrl: avih, nested strl LIST
          var j = i + 12
          val end = math.min(riffEnd.toLong, i + 8L + sz).toInt
          while (j + 8 <= end) {
            val csz = rd32(p, j + 4)
            if (csz < 0) return None
            if (isTag(p, j, "avih") && csz >= 40) {
              totalFrames = rd32(p, j + 8 + 16)
              w = rd32(p, j + 8 + 32); h = rd32(p, j + 8 + 36)
            } else if (isTag(p, j, "LIST") && isTag(p, j + 8, "strl")) {
              var k = j + 12
              val send = math.min(end.toLong, j + 8L + csz).toInt
              while (k + 8 <= send) {
                val ssz = rd32(p, k + 4)
                if (ssz < 0) return None
                if (isTag(p, k, "strh") && ssz >= 8)
                  vidsOk = isTag(p, k + 8, "vids") && isTag(p, k + 12, "MJPG")
                else if (isTag(p, k, "strf") && ssz >= 20)
                  strfOk = isTag(p, k + 8 + 16, "MJPG") // biCompression
                k = math.min(send.toLong, k + 8L + ssz + (ssz & 1)).toInt
              }
            }
            j = math.min(end.toLong, j + 8L + csz + (csz & 1)).toInt
          }
        } else if (isTag(p, i, "LIST") && isTag(p, i + 8, "movi")) {
          moviStart = i + 8; moviEnd = math.min(riffEnd.toLong, i + 8L + sz).toInt
        } else if (isTag(p, i, "idx1")) {
          idxStart = i + 8; idxLen = sz
        }
        i = math.min(riffEnd.toLong, i + 8L + sz + (sz & 1)).toInt
      }
      if (totalFrames < 0 || !vidsOk || !strfOk || moviStart < 0) return None
      if (w <= 0 || h <= 0 || w.toLong * h * totalFrames > MaxPixelBytes) return None
      val frames = Seq.newBuilder[Array[Byte]]
      val walk = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var j = moviStart + 4
      var n = 0
      while (j + 8 <= moviEnd) {
        val csz = rd32(p, j + 4)
        if (csz < 0 || j + 8L + csz > moviEnd) return None
        if (isTag(p, j, "00dc")) {
          val jpg = java.util.Arrays.copyOfRange(p, j + 8, j + 8 + csz)
          val (fw, fh, px) = JpegCodec.decodePixels(jpg).getOrElse(return None)
          if (fw != w || fh != h) return None
          frames += px
          walk += ((j - moviStart, csz)) // movi-relative offset of '00dc'
          n += 1
        }
        j += 8 + csz + (csz & 1)
      }
      if (n != totalFrames) return None
      if (idxStart >= 0) { // validate the index against the walk
        if (idxLen != 16 * n) return None
        for (f <- 0 until n) {
          val e = idxStart + 16 * f
          if (!isTag(p, e, "00dc")) return None
          val off = rd32(p, e + 8); val sz = rd32(p, e + 12)
          val (woff, wsz) = walk(f)
          // movi-relative (to the 'movi' fourcc) or absolute convention
          if (sz != wsz || (off != woff && off != moviStart + woff))
            return None
        }
      }
      Some((w, h, frames.result()))
    }
  }

  /** REAL baseline sequential JPEG codec for GRAYSCALE JFIF — pure JVM:
    * canonical Huffman tables built from DHT segments (ITU-T T.81 Annex K
    * constants on the encode side), zigzag de-serialization, table-driven
    * dequantization, double-precision separable 8×8 IDCT, byte-stuffing
    * (FF 00) and restart-marker (DRI/RSTn) handling. `decodePixels` decodes
    * any conforming single-component baseline sequential JPEG — DC + AC
    * coefficients, multiple DQT/DHT segments, 8/16-bit quant tables,
    * restart intervals — not just this encoder's output; `decodeColorPixels`
    * extends that to 3-component 4:4:4 color (interleaved MCUs, three
    * independent DC predictors, per-component quant/Huffman selection,
    * JFIF YCbCr → RGB). Subsampled 4:2:0 color, progressive (SOF2), and
    * arithmetic (SOF9) coding are each handled by their own decode paths
    * (`decodeColorPixels` MCU geometry, `decodeProgressivePixels`,
    * `decodeArithPixels`); perceptual subband audio by
    * [[MpegAudioCodec]]; inter-predicted video by [[RleVideoCodec]];
    * motion-compensated transform video by [[MpegVideoCodec]] (MPEG-1
    * syntax I/P pictures, macroblock motion vectors, DCT residuals);
    * MDCT-generation audio by [[MpegL3Codec]] (Layer III-class hybrid
    * filterbank: Huffman spectrum, requantization, alias reduction,
    * IMDCT/overlap-add). Every real-codec role is now covered; the
    * [[FakeCodec]] stub remains ONLY as the labeled dimensions fallback
    * for payloads matching no known container magic.
    *
    * `encode` packs one payload byte per FLAT 8×8 block (4 blocks per row,
    * zero-padded tail). A flat block has only a DC coefficient, and with
    * q_DC = 8 the quantized DC is exactly v − 128 (8·(v−128)/8, an
    * integer), so decode∘encode is BIT-EXACT — the property the DuckDB
    * oracle needs (the transform round-trips ±1 on general content; see
    * `encodeRich`, which runs the full FDCT + run-length AC path and is
    * spec-checked to ≤1 LSB instead). Quantized-DC category coding, EOB
    * run-length, and the bit-level writer are the genuine Annex F
    * procedures, so the decoder's Huffman/IDCT machinery is fully
    * exercised by real entropy-coded data.
    */
  object JpegCodec {
    val BlocksPerRow = 4 // encode layout: 32 px wide, one byte per block

    // ITU-T T.81 Annex K.3 typical luminance Huffman tables (public spec
    // constants): counts per code length 1..16, then symbol values
    private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    private val DcVals = (0 to 11).map(_.toByte).toArray
    private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    private val AcVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

    // zigzag position k → natural (row-major) coefficient index
    private val Zigzag = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    private val Cos = Array.tabulate(8, 8)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    private val Cn = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

    /** Canonical code assignment (T.81 Annex C): symbol → (code, length). */
    private def canonical(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
      val out = new Array[(Int, Int)](256)
      var code = 0; var vi = 0
      for (len <- 1 to 16) {
        var i = 0
        while (i < bits(len - 1)) {
          out(vals(vi) & 0xff) = (code, len); code += 1; vi += 1; i += 1
        }
        code <<= 1
      }
      out
    }

    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var acc = 0; private var n = 0
      def put(bits: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((bits >> i) & 1); n += 1
          if (n == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00) // byte stuffing
            acc = 0; n = 0
          }
          i -= 1
        }
      }
      def flush(): Unit = while (n != 0) put(1, 1) // pad with 1-bits (F.1.2.3)
    }

    private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }

    /** Magnitude category (number of bits) of a DC diff / AC value. */
    private def category(v: Int): Int = {
      var a = math.abs(v); var c = 0
      while (a != 0) { a >>= 1; c += 1 }
      c
    }
    // value bits: negative values are encoded as v + 2^cat − 1 (F.1.4.1)
    private def valueBits(v: Int, cat: Int): Int =
      if (v >= 0) v else v + (1 << cat) - 1

    private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int,
        h: Int, qtab: Array[Int], restartInterval: Int, nc: Int = 1,
        lumaHv: Int = 0x11): Unit = {
      out.write(0xff); out.write(0xd8) // SOI
      out.write(0xff); out.write(0xe0) // APP0 JFIF
      w16(out, 16)
      "JFIF".foreach(c => out.write(c)); out.write(0)
      out.write(1); out.write(1) // version 1.1
      out.write(0); w16(out, 1); w16(out, 1) // no density
      out.write(0); out.write(0) // no thumbnail
      out.write(0xff); out.write(0xdb) // DQT, table 0, 8-bit, zigzag order
      w16(out, 2 + 1 + 64)
      out.write(0x00)
      Zigzag.indices.foreach(k => out.write(qtab(k)))
      out.write(0xff); out.write(0xc0) // SOF0: 8-bit, nc components, all 1x1
      w16(out, 8 + 3 * nc)
      out.write(8); w16(out, h); w16(out, w); out.write(nc)
      for (c <- 1 to nc) {
        out.write(c); out.write(if (c == 1) lumaHv else 0x11); out.write(0)
      }
      out.write(0xff); out.write(0xc4) // DHT: DC class 0 id 0 + AC class 1 id 0
      w16(out, 2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length))
      out.write(0x00); DcBits.foreach(out.write); DcVals.foreach(b => out.write(b & 0xff))
      out.write(0x10); AcBits.foreach(out.write); AcVals.foreach(b => out.write(b & 0xff))
      if (restartInterval > 0) {
        out.write(0xff); out.write(0xdd); w16(out, 4); w16(out, restartInterval)
      }
      out.write(0xff); out.write(0xda) // SOS: all components, tables 0/0
      w16(out, 6 + 2 * nc)
      out.write(nc)
      for (c <- 1 to nc) { out.write(c); out.write(0x00) }
      out.write(0); out.write(63); out.write(0)
    }

    /** One payload byte per flat 8×8 block, [[BlocksPerRow]] blocks per
      * row, zero-padded; q_DC = 8 makes the DC quantization exact, so the
      * decoded image reproduces the payload bytes bit-for-bit.
      */
    def encode(payload: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
      val nBlocks = math.max(1, (payload.length + BlocksPerRow - 1) / BlocksPerRow) * BlocksPerRow
      val w = BlocksPerRow * 8; val h = nBlocks / BlocksPerRow * 8
      val qtab = Array.tabulate(64)(k => if (k == 0) 8 else 16)
      val out = new java.io.ByteArrayOutputStream()
      writeHeaders(out, w, h, qtab, restartInterval)
      val dcCodes = canonical(DcBits, DcVals)
      val acCodes = canonical(AcBits, AcVals)
      var bw = new BitWriter(out)
      var pred = 0; var rst = 0
      for (i <- 0 until nBlocks) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
          bw = new BitWriter(out); pred = 0
        }
        val v = if (i < payload.length) payload(i) & 0xff else 0
        val dc = v - 128 // quantized: 8·(v−128)/8
        val diff = dc - pred; pred = dc
        val cat = category(diff)
        val (c, l) = dcCodes(cat)
        bw.put(c, l)
        if (cat > 0) bw.put(valueBits(diff, cat), cat)
        val (ec, el) = acCodes(0x00) // EOB: all 63 ACs are zero
        bw.put(ec, el)
      }
      bw.flush()
      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
    }

    /** 3-component 4:4:4 color variant of [[encode]]: luma carries one flat
      * payload block per byte, chroma is flat neutral (Cb = Cr = 128, i.e.
      * level-shifted DC 0) — so the decoded RGB equals the payload gray
      * triplicated EXACTLY (R = Y + 1.402·0, etc.), keeping the color path
      * oracle-expressible while exercising MCU interleave and the three
      * independent DC predictors.
      */
    def encodeColor(payload: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
      val nBlocks = math.max(1, (payload.length + BlocksPerRow - 1) / BlocksPerRow) * BlocksPerRow
      val w = BlocksPerRow * 8; val h = nBlocks / BlocksPerRow * 8
      val qtab = Array.tabulate(64)(k => if (k == 0) 8 else 16)
      val out = new java.io.ByteArrayOutputStream()
      writeHeaders(out, w, h, qtab, restartInterval, nc = 3)
      val dcCodes = canonical(DcBits, DcVals)
      val acCodes = canonical(AcBits, AcVals)
      var bw = new BitWriter(out)
      val pred = new Array[Int](3); var rst = 0
      val (ec, el) = acCodes(0x00) // EOB
      for (i <- 0 until nBlocks) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
          bw = new BitWriter(out); java.util.Arrays.fill(pred, 0)
        }
        val v = if (i < payload.length) payload(i) & 0xff else 0
        // MCU = Y, Cb, Cr blocks interleaved; chroma DC is 0 (neutral 128)
        for (c <- 0 until 3) {
          val dc = if (c == 0) v - 128 else 0
          val diff = dc - pred(c); pred(c) = dc
          val cat = category(diff)
          val (cc, cl) = dcCodes(cat)
          bw.put(cc, cl)
          if (cat > 0) bw.put(valueBits(diff, cat), cat)
          bw.put(ec, el)
        }
      }
      bw.flush()
      out.write(0xff); out.write(0xd9)
      out.toByteArray
    }

    /** 4:2:0 SUBSAMPLED color variant: the MCU is 2×2 luma blocks plus one
      * Cb and one Cr block covering the same 16×16 area at half resolution
      * — the geometry virtually every camera JPEG uses. Luma carries one
      * flat payload block per byte (luma block rows padded to even so MCUs
      * tile exactly), chroma is flat neutral, so nearest-neighbor chroma
      * upsampling is exact and decoded RGB still equals the payload gray.
      */
    def encode420(payload: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
      val nr0 = math.max(1, (payload.length + BlocksPerRow - 1) / BlocksPerRow)
      val lumaRows = nr0 + (nr0 % 2) // even: MCUs are 2 luma-block rows tall
      val w = BlocksPerRow * 8; val h = lumaRows * 8
      val qtab = Array.tabulate(64)(k => if (k == 0) 8 else 16)
      val out = new java.io.ByteArrayOutputStream()
      writeHeaders(out, w, h, qtab, restartInterval, nc = 3, lumaHv = 0x22)
      val dcCodes = canonical(DcBits, DcVals)
      val acCodes = canonical(AcBits, AcVals)
      var bw = new BitWriter(out)
      val pred = new Array[Int](3); var rst = 0
      val (ec, el) = acCodes(0x00)
      def block(c: Int, dc: Int): Unit = {
        val diff = dc - pred(c); pred(c) = dc
        val cat = category(diff)
        val (cc, cl) = dcCodes(cat)
        bw.put(cc, cl)
        if (cat > 0) bw.put(valueBits(diff, cat), cat)
        bw.put(ec, el)
      }
      val mcusX = BlocksPerRow / 2; val mcusY = lumaRows / 2
      var mcu = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
          bw = new BitWriter(out); java.util.Arrays.fill(pred, 0)
        }
        mcu += 1
        for (bv <- 0 until 2; bh <- 0 until 2) { // Y: 2×2 blocks, row-major
          val bi = (my * 2 + bv) * BlocksPerRow + (mx * 2 + bh)
          val v = if (bi < payload.length) payload(bi) & 0xff else 0
          block(0, v - 128)
        }
        block(1, 0) // Cb: flat neutral
        block(2, 0) // Cr
      }
      bw.flush()
      out.write(0xff); out.write(0xd9)
      out.toByteArray
    }

    /** Full FDCT encode of an arbitrary grayscale image with a flat
      * quant table of 1 — exercises the run-length AC path (ZRL, EOB,
      * magnitude categories) the flat encoder never emits. Lossy by ±1
      * from transform rounding (spec-checked); edges pad by replication.
      */
    def encodeRich(gray: Array[Byte], w: Int, h: Int,
        restartInterval: Int = 0): Array[Byte] = {
      require(w > 0 && h > 0 && gray.length == w * h)
      val bx = (w + 7) / 8; val by = (h + 7) / 8
      val qtab = Array.fill(64)(1)
      val out = new java.io.ByteArrayOutputStream()
      writeHeaders(out, w, h, qtab, restartInterval)
      val dcCodes = canonical(DcBits, DcVals)
      val acCodes = canonical(AcBits, AcVals)
      var bw = new BitWriter(out)
      var pred = 0; var rst = 0; var mcu = 0
      for (byi <- 0 until by; bxi <- 0 until bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
          bw = new BitWriter(out); pred = 0
        }
        mcu += 1
        // level-shifted source block, edge-replicated
        val s = new Array[Double](64)
        for (y <- 0 until 8; x <- 0 until 8) {
          val sx = math.min(bxi * 8 + x, w - 1); val sy = math.min(byi * 8 + y, h - 1)
          s(y * 8 + x) = (gray(sy * w + sx) & 0xff) - 128.0
        }
        // separable FDCT (A.3.3), rounded to integers (quant = 1)
        val tmp = new Array[Double](64)
        for (y <- 0 until 8; u <- 0 until 8) {
          var acc = 0.0
          var x = 0
          while (x < 8) { acc += s(y * 8 + x) * Cos(u)(x); x += 1 }
          tmp(y * 8 + u) = 0.5 * Cn(u) * acc
        }
        val coef = new Array[Int](64)
        for (v <- 0 until 8; u <- 0 until 8) {
          var acc = 0.0
          var y = 0
          while (y < 8) { acc += tmp(y * 8 + u) * Cos(v)(y); y += 1 }
          coef(v * 8 + u) = math.round(0.5 * Cn(v) * acc).toInt
        }
        val diff = coef(0) - pred; pred = coef(0)
        val dcat = category(diff)
        val (c, l) = dcCodes(dcat)
        bw.put(c, l)
        if (dcat > 0) bw.put(valueBits(diff, dcat), dcat)
        // AC run-length coding (F.2): (run, size) symbols, ZRL for 16 zeros
        var k = 1; var run = 0
        while (k < 64) {
          val a = coef(Zigzag(k))
          if (a == 0) run += 1
          else {
            while (run > 15) {
              val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16
            }
            val cat = category(a)
            // the standard AC table tops out at size 10; with quant = 1
            // only adversarially sharp content exceeds it
            require(cat <= 10, s"AC magnitude $a needs category $cat > 10")
            val (ac, al) = acCodes((run << 4) | cat)
            bw.put(ac, al); bw.put(valueBits(a, cat), cat)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
      }
      bw.flush()
      out.write(0xff); out.write(0xd9)
      out.toByteArray
    }

    private final class DecodeFail extends RuntimeException

    private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
      val mincode = new Array[Int](17)
      val maxcode = Array.fill(17)(-1)
      val valptr = new Array[Int](17)
      locally {
        var code = 0; var vi = 0
        for (l <- 1 to 16) {
          if (bits(l - 1) > 0) {
            valptr(l) = vi; mincode(l) = code
            code += bits(l - 1); vi += bits(l - 1)
            maxcode(l) = code - 1
          }
          code <<= 1
        }
      }
      def decode(br: BitReader): Int = {
        var code = 0
        var l = 1
        while (l <= 16) {
          code = (code << 1) | br.bit()
          if (maxcode(l) >= 0 && code <= maxcode(l))
            return vals(valptr(l) + code - mincode(l)) & 0xff
          l += 1
        }
        throw new DecodeFail
      }
    }

    private final class BitReader(p: Array[Byte], var pos: Int) {
      private var acc = 0; private var n = 0
      def bit(): Int = {
        if (n == 0) {
          if (pos >= p.length) throw new DecodeFail
          var b = p(pos) & 0xff; pos += 1
          if (b == 0xff) {
            if (pos >= p.length) throw new DecodeFail
            val b2 = p(pos) & 0xff
            if (b2 == 0x00) pos += 1 // stuffed data byte
            else throw new DecodeFail // marker mid-codeword: malformed
          }
          acc = b; n = 8
        }
        n -= 1
        (acc >> n) & 1
      }
      def receive(len: Int): Int = {
        var v = 0; var i = 0
        while (i < len) { v = (v << 1) | bit(); i += 1 }
        v
      }
      /** Consume an expected RSTn marker and realign to a byte boundary. */
      def restart(): Unit = {
        n = 0
        while (pos + 1 < p.length && (p(pos) & 0xff) == 0xff &&
          (p(pos + 1) & 0xff) == 0x00) pos += 2 // stray stuffed bytes
        if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff ||
          ((p(pos + 1) & 0xff) & 0xf8) != 0xd0) throw new DecodeFail
        pos += 2
      }
    }

    // EXTEND (F.2.2.1): map `len` received bits back to a signed value
    private def extend(v: Int, len: Int): Int =
      if (len == 0) 0 else if (v < (1 << (len - 1))) v - (1 << len) + 1 else v

    /** Header-driven decode of any single-component baseline sequential
      * JPEG: returns (width, height, gray bytes top-down row-major) or
      * None for color/progressive/arithmetic/malformed containers.
      */
    def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      try decodeOrThrow(p).collect {
        case (w, h, planes) if planes.length == 1 => (w, h, planes(0))
      } catch {
        case _: DecodeFail | _: ArrayIndexOutOfBoundsException => None
      }
    }

    /** Header-driven decode of any 3-component 4:4:4 baseline sequential
      * JPEG: YCbCr → RGB per JFIF (R = Y + 1.402·Cr', G = Y − 0.344136·Cb'
      * − 0.714136·Cr', B = Y + 1.772·Cb'), returns interleaved RGB bytes.
      */
    def decodeColorPixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      try decodeOrThrow(p).collect {
        case (w, h, pl) if pl.length == 3 =>
          val rgb = new Array[Byte](w * h * 3)
          def clamp(v: Long) = math.max(0L, math.min(255L, v)).toByte
          var i = 0
          while (i < w * h) {
            val y = pl(0)(i) & 0xff
            val cb = (pl(1)(i) & 0xff) - 128
            val cr = (pl(2)(i) & 0xff) - 128
            rgb(3 * i) = clamp(math.round(y + 1.402 * cr))
            rgb(3 * i + 1) = clamp(math.round(y - 0.344136 * cb - 0.714136 * cr))
            rgb(3 * i + 2) = clamp(math.round(y + 1.772 * cb))
            i += 1
          }
          (w, h, rgb)
      } catch {
        case _: DecodeFail | _: ArrayIndexOutOfBoundsException => None
      }
    }

    /** Decoded component planes: width, height, one w×h byte plane per
      * SOF component in scan order.
      */
    private def decodeOrThrow(p: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] = {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
        return None
      val qtabs = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffTable](4)
      val acTabs = new Array[HuffTable](4)
      var w = 0; var h = 0; var restartInterval = 0
      // per SOF component: (component id, h factor, v factor, quant table id)
      var comps: Array[(Int, Int, Int, Int)] = null
      var i = 2
      def u16(at: Int) = ((p(at) & 0xff) << 8) | (p(at + 1) & 0xff)
      var scanStart = -1
      // per scan component, in SOF order: (dc table id, ac table id)
      var sel: Array[(Int, Int)] = null
      while (scanStart < 0) {
        if (i + 4 > p.length) return None
        if ((p(i) & 0xff) != 0xff) return None
        val m = p(i + 1) & 0xff
        val len = u16(i + 2)
        m match {
          case 0xdb => // DQT: one or more (precision, id, 64 entries)
            var j = i + 4
            while (j < i + 2 + len) {
              val pq = (p(j) & 0xff) >> 4; val id = p(j) & 0x0f
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) = if (pq == 0) p(j + 1 + k) & 0xff
                       else u16(j + 1 + 2 * k)
                k += 1
              }
              qtabs(id) = t
              j += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT: one or more (class/id, counts, symbols)
            var j = i + 4
            while (j < i + 2 + len) {
              val cls = (p(j) & 0xff) >> 4; val id = p(j) & 0x0f
              val bits = Array.tabulate(16)(k => p(j + 1 + k) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(k => p(j + 17 + k))
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcTabs(id) = t else acTabs(id) = t
              j += 17 + nv
            }
          case 0xc0 => // SOF0 baseline; 1 or 3 components, factors 1 or 2
            if ((p(i + 4) & 0xff) != 8) return None
            h = u16(i + 5); w = u16(i + 7)
            val nc = p(i + 9) & 0xff
            if (nc != 1 && nc != 3) return None
            comps = Array.tabulate(nc) { c =>
              val hv = p(i + 11 + 3 * c) & 0xff
              val (sh, sv) = (hv >> 4, hv & 0x0f)
              if (sh < 1 || sh > 2 || sv < 1 || sv > 2) return None
              if (nc == 1 && hv != 0x11) return None // 1-comp scans: 1×1
              (p(i + 10 + 3 * c) & 0xff, sh, sv, p(i + 12 + 3 * c) & 0x0f)
            }
            if (w <= 0 || h <= 0 || w.toLong * h * nc > MaxPixelBytes) return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcc | 0xcd | 0xce | 0xcf =>
            return None // extended/progressive/lossless/arithmetic
          case 0xdd =>
            restartInterval = u16(i + 4)
          case 0xda => // SOS: every SOF component, in SOF order
            if (comps == null || (p(i + 4) & 0xff) != comps.length) return None
            val bySel = Array.tabulate(comps.length) { c =>
              (p(i + 5 + 2 * c) & 0xff,
                ((p(i + 6 + 2 * c) & 0xff) >> 4, p(i + 6 + 2 * c) & 0x0f))
            }.toMap
            sel = comps.map { case (cid, _, _, _) =>
              bySel.getOrElse(cid, return None)
            }
            scanStart = i + 2 + len
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
      if (comps == null || sel == null) return None
      val nc = comps.length
      val q = comps.map { case (_, _, _, tq) =>
        if (qtabs(tq) == null) return None else qtabs(tq)
      }
      val dcT = sel.map { case (d, _) =>
        if (dcTabs(d) == null) return None else dcTabs(d)
      }
      val acT = sel.map { case (_, a) =>
        if (acTabs(a) == null) return None else acTabs(a)
      }
      val hmax = comps.map(_._2).max; val vmax = comps.map(_._3).max
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      // planes land at FULL resolution: subsampled components replicate
      // each decoded sample hmax/hc × vmax/vc times (nearest-neighbor
      // upsampling — exact for the flat-chroma encodings, a conforming
      // choice for general content)
      val planes = Array.fill(nc)(new Array[Byte](w * h))
      val br = new BitReader(p, scanStart)
      val pred = new Array[Int](nc)
      var mcu = 0
      val coef = new Array[Int](64)
      val tmp = new Array[Double](64)
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(); java.util.Arrays.fill(pred, 0)
        }
        mcu += 1
        // MCU = hc×vc blocks per component, components interleaved, each
        // component's blocks left-to-right then top-to-bottom (A.2.3)
        for (c <- 0 until nc) {
          val (_, hc, vc, _) = comps(c)
          val sx = hmax / hc; val sy = vmax / vc
          for (bv <- 0 until vc; bh <- 0 until hc) {
            java.util.Arrays.fill(coef, 0)
            val dcat = dcT(c).decode(br)
            if (dcat > 15) throw new DecodeFail
            pred(c) += extend(br.receive(dcat), dcat)
            coef(0) = pred(c) * q(c)(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT(c).decode(br)
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 else eob = true // ZRL / EOB
              } else {
                k += r
                if (k > 63) throw new DecodeFail
                coef(Zigzag(k)) = extend(br.receive(s), s) * q(c)(k)
                k += 1
              }
            }
            // separable IDCT (A.3.3), double precision
            for (y <- 0 until 8; x <- 0 until 8) {
              var acc = 0.0
              var u = 0
              while (u < 8) { acc += Cn(u) * coef(y * 8 + u) * Cos(u)(x); u += 1 }
              tmp(y * 8 + x) = 0.5 * acc
            }
            // block origin in component coords, then upsample-replicate
            val cx0 = (mx * hc + bh) * 8; val cy0 = (my * vc + bv) * 8
            for (y <- 0 until 8; x <- 0 until 8) {
              var acc = 0.0
              var v = 0
              while (v < 8) { acc += Cn(v) * tmp(v * 8 + x) * Cos(v)(y); v += 1 }
              val out = math.round(0.5 * acc + 128.0)
              val b = math.max(0L, math.min(255L, out)).toByte
              var ry = 0
              while (ry < sy) {
                val gy = (cy0 + y) * sy + ry
                var rx = 0
                while (rx < sx) {
                  val gx = (cx0 + x) * sx + rx
                  if (gx < w && gy < h) planes(c)(gy * w + gx) = b
                  rx += 1
                }
                ry += 1
              }
            }
          }
        }
      }
      Some((w, h, planes))
    }

    // ---- progressive (SOF2): spectral selection + successive approximation

    // AC table for progressive scans: EOBn symbols (r<<4 | 0, r = 0..14 —
    // baseline's Annex K table has no EOBn > 0, so progressive needs its
    // own) plus zero-run/size codes for the first-scan values and the
    // refinement newly-nonzero code (r<<4 | 1). 20 + 15 symbols, all
    // canonical length 6 (Kraft 35/64).
    private val PAcVals: Array[Byte] =
      ((0 to 14).map(r => (r << 4) | 0) ++ (1 to 5).map(s => s) ++
        (1 to 15).map(r => (r << 4) | 1)).map(_.toByte).toArray
    private val PAcBits = Array(0, 0, 0, 0, 0, PAcVals.length, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

    private def writeProgressiveHeaders(out: java.io.ByteArrayOutputStream,
        w: Int, h: Int, qtab: Array[Int]): Unit = {
      out.write(0xff); out.write(0xd8) // SOI
      out.write(0xff); out.write(0xe0) // APP0 JFIF
      w16(out, 16)
      "JFIF".foreach(c => out.write(c)); out.write(0)
      out.write(1); out.write(1)
      out.write(0); w16(out, 1); w16(out, 1)
      out.write(0); out.write(0)
      out.write(0xff); out.write(0xdb) // DQT table 0
      w16(out, 2 + 1 + 64)
      out.write(0x00)
      Zigzag.indices.foreach(k => out.write(qtab(k)))
      out.write(0xff); out.write(0xc2) // SOF2: progressive, 1 component 1x1
      w16(out, 8 + 3)
      out.write(8); w16(out, h); w16(out, w); out.write(1)
      out.write(1); out.write(0x11); out.write(0)
      out.write(0xff); out.write(0xc4) // DHT: DC class 0 id 0 + AC class 1 id 0
      w16(out, 2 + (1 + 16 + DcVals.length) + (1 + 16 + PAcVals.length))
      out.write(0x00); DcBits.foreach(out.write); DcVals.foreach(b => out.write(b & 0xff))
      out.write(0x10); PAcBits.foreach(out.write); PAcVals.foreach(b => out.write(b & 0xff))
    }

    private def writeSos(out: java.io.ByteArrayOutputStream, ss: Int, se: Int,
        ah: Int, al: Int): Unit = {
      out.write(0xff); out.write(0xda)
      w16(out, 8)
      out.write(1); out.write(1); out.write(0x00) // component 1, tables 0/0
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    /** Emit an accumulated EOB run: EOBn code (r = ⌊log₂ run⌋, r extra bits
      * = run − 2^r), then any buffered refinement correction bits the run
      * covers (G.1.2.3 appended-bit order).
      */
    private def emitEobRun(bw: BitWriter, ac: Array[(Int, Int)], run: Int,
        pending: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
      if (run > 0) {
        var r = 0
        while ((1 << (r + 1)) <= run) r += 1
        val (c, l) = ac(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(run - (1 << r), r)
        pending.foreach(b => bw.put(b, 1))
        pending.clear()
      }
    }

    /** Progressive encode of one payload byte per flat 8×8 block (the q159
      * layout and exactness trick) through FOUR scans exercising the whole
      * successive-approximation machinery: DC first at Al = 1 (diffs of
      * dc >> 1), AC first 1..63 at Al = 1 (pure EOB runs, chunked ≤ 16
      * blocks so several EOBn codes appear), DC refinement (raw dc & 1
      * bits), AC refinement at Al = 0 (EOB runs again). The decoded image
      * reproduces the payload bytes bit-for-bit, so the DuckDB oracle
      * stays closed-form while the hash proves all four scan decoders.
      *
      * With `withAc` ([[encodeProgressiveRich]]), each block also carries
      * AC coefficient (v mod 64) − 32 at zigzag k = 1 (q₁ = 1): the first
      * AC scan codes c₁ >> 1 (blocks where that is 0 stay hidden), and the
      * refinement scan exercises every G.1.2.3 path — newly-nonzero
      * (r<<4|1) codes with sign bits, correction bits for
      * previously-nonzero coefficients buffered and appended after the
      * covering EOBn code.
      */
    def encodeProgressive(payload: Array[Byte], withAc: Boolean = false): Array[Byte] = {
      val nBlocks = math.max(1, (payload.length + BlocksPerRow - 1) / BlocksPerRow) * BlocksPerRow
      val w = BlocksPerRow * 8; val h = nBlocks / BlocksPerRow * 8
      val qtab = Array.tabulate(64)(k => if (k == 0) 8 else if (k == 1) 1 else 16)
      val out = new java.io.ByteArrayOutputStream()
      writeProgressiveHeaders(out, w, h, qtab)
      val dcCodes = canonical(DcBits, DcVals)
      val acCodes = canonical(PAcBits, PAcVals)
      def byteAt(i: Int) = if (i < payload.length) payload(i) & 0xff else 0
      def dcAt(i: Int) = byteAt(i) - 128
      def acAt(i: Int) = if (withAc) (byteAt(i) % 64) - 32 else 0
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]

      // scan 1: DC first, Ah = 0, Al = 1 — Huffman-coded diffs of dc >> 1
      writeSos(out, 0, 0, 0, 1)
      var bw = new BitWriter(out)
      var pred = 0
      for (i <- 0 until nBlocks) {
        val t = dcAt(i) >> 1
        val diff = t - pred; pred = t
        val cat = category(diff)
        val (c, l) = dcCodes(cat)
        bw.put(c, l)
        if (cat > 0) bw.put(valueBits(diff, cat), cat)
      }
      bw.flush()

      // scan 2: AC first, band 1..63, Ah = 0, Al = 1 — values c1 >> 1 at
      // k = 1, EOB runs chunked at 16
      writeSos(out, 1, 63, 0, 1)
      bw = new BitWriter(out)
      var run = 0
      for (i <- 0 until nBlocks) {
        // AC point transform divides toward zero (sign-magnitude, G.1.2.2)
        // — unlike the DC arithmetic shift
        val a2 = acAt(i)
        val v1 = if (a2 < 0) -((-a2) >> 1) else a2 >> 1
        if (v1 != 0) {
          emitEobRun(bw, acCodes, run, pending)
          val cat = category(v1)
          val (c, l) = acCodes(cat) // run 0, size cat
          bw.put(c, l); bw.put(valueBits(v1, cat), cat)
          run = 1 // terminator for the zero remainder of this block
        } else run += 1
        if (run == 16) { emitEobRun(bw, acCodes, run, pending); run = 0 }
      }
      emitEobRun(bw, acCodes, run, pending)
      bw.flush()

      // scan 3: DC refinement, Ah = 1, Al = 0 — one raw bit per block
      writeSos(out, 0, 0, 1, 0)
      bw = new BitWriter(out)
      for (i <- 0 until nBlocks) bw.put(dcAt(i) & 1, 1)
      bw.flush()

      // scan 4: AC refinement, Ah = 1, Al = 0 — newly-nonzero codes for
      // |c1| = 1, correction bits (appended after the covering EOBn) for
      // |c1| >= 2, EOB runs for the rest
      writeSos(out, 1, 63, 1, 0)
      bw = new BitWriter(out)
      run = 0
      for (i <- 0 until nBlocks) {
        val c1 = acAt(i)
        if ((math.abs(c1) >> 1) != 0) { // previously nonzero: buffered correction bit
          run += 1; pending += (c1 & 1)
        } else if (c1 != 0) { // newly nonzero: (0<<4|1) code + sign bit
          emitEobRun(bw, acCodes, run, pending)
          val (c, l) = acCodes(0x01)
          bw.put(c, l); bw.put(if (c1 > 0) 1 else 0, 1)
          run = 1
        } else run += 1
        if (run == 16) { emitEobRun(bw, acCodes, run, pending); run = 0 }
      }
      emitEobRun(bw, acCodes, run, pending)
      bw.flush()

      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
    }

    /** [[encodeProgressive]] with per-block AC content — the spec's
      * cross-validation input for the G.1.2.3 refinement paths.
      */
    def encodeProgressiveRich(payload: Array[Byte]): Array[Byte] =
      encodeProgressive(payload, withAc = true)

    /** Decode of any single-component 1×1 PROGRESSIVE (SOF2) JPEG:
      * accumulates coefficients (zigzag order) across every scan —
      * interleaved/non-interleaved DC first + refinement, AC spectral
      * bands with EOBRUN, the full G.1.2.3 AC refinement (newly-nonzero
      * codes, correction bits, EOB-covered blocks) — then dequantizes and
      * runs the shared IDCT once at EOI. Returns None for non-progressive,
      * subsampled, restart-interval, or malformed containers.
      */
    def decodeProgressivePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      try decodeProgressiveOrThrow(p) catch {
        case _: DecodeFail | _: ArrayIndexOutOfBoundsException => None
      }
    }

    private def decodeProgressiveOrThrow(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
        return None
      def u16(at: Int) = {
        if (at + 1 >= p.length) throw new DecodeFail
        ((p(at) & 0xff) << 8) | (p(at + 1) & 0xff)
      }
      // first non-stuffed, non-fill marker byte at or after `from`
      def nextMarker(from: Int): Int = {
        var j = from
        while (j + 1 < p.length) {
          if ((p(j) & 0xff) != 0xff) j += 1
          else if ((p(j + 1) & 0xff) == 0x00) j += 2 // stuffed data byte
          else if ((p(j + 1) & 0xff) == 0xff) j += 1 // fill byte
          else return j
        }
        throw new DecodeFail
      }
      val qtabs = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffTable](4)
      val acTabs = new Array[HuffTable](4)
      var w = 0; var h = 0; var nb = 0; var qid = 0
      var coefs: Array[Int] = null // per block, zigzag order
      var i = 2
      var sawSof = false
      var done = false
      while (!done) {
        if (i + 2 > p.length) return None
        if ((p(i) & 0xff) != 0xff) return None
        val m = p(i + 1) & 0xff
        if (m == 0xd9) done = true // EOI
        else {
          val len = u16(i + 2)
          if (len < 2 || i + 2 + len > p.length) return None
          m match {
            case 0xdb =>
              var j = i + 4
              while (j < i + 2 + len) {
                val pq = (p(j) & 0xff) >> 4; val id = p(j) & 0x0f
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) {
                  t(k) = if (pq == 0) p(j + 1 + k) & 0xff else u16(j + 1 + 2 * k)
                  k += 1
                }
                qtabs(id) = t
                j += 1 + (if (pq == 0) 64 else 128)
              }
            case 0xc4 =>
              var j = i + 4
              while (j < i + 2 + len) {
                val cls = (p(j) & 0xff) >> 4; val id = p(j) & 0x0f
                if (j + 17 > p.length) return None
                val bits = Array.tabulate(16)(k => p(j + 1 + k) & 0xff)
                val nv = bits.sum
                if (j + 17 + nv > p.length) return None
                val vals = Array.tabulate(nv)(k => p(j + 17 + k))
                val t = new HuffTable(bits, vals)
                if (cls == 0) dcTabs(id) = t else acTabs(id) = t
                j += 17 + nv
              }
            case 0xc2 =>
              if ((p(i + 4) & 0xff) != 8) return None
              h = u16(i + 5); w = u16(i + 7)
              if ((p(i + 9) & 0xff) != 1) return None // single component
              if ((p(i + 11) & 0xff) != 0x11) return None // 1×1 only
              qid = p(i + 12) & 0x0f
              if (w <= 0 || h <= 0 || w.toLong * h > MaxPixelBytes) return None
              nb = ((w + 7) / 8) * ((h + 7) / 8)
              coefs = new Array[Int](nb * 64)
              sawSof = true
            case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                 0xcb | 0xcc | 0xcd | 0xce | 0xcf =>
              return None // non-progressive / arithmetic / lossless frames
            case 0xdd => return None // restart intervals out of scope here
            case 0xda =>
              if (!sawSof) return None
              val ns = p(i + 4) & 0xff
              if (ns != 1) return None
              val td = (p(i + 6) & 0xff) >> 4; val ta = p(i + 6) & 0x0f
              val ss = p(i + 7) & 0xff; val se = p(i + 8) & 0xff
              val ah = (p(i + 9) & 0xff) >> 4; val al = p(i + 9) & 0x0f
              if (ss > 63 || se > 63 || se < ss || al > 13) return None
              if (ss == 0 && se != 0) return None // DC scans are 0..0
              val br = new BitReader(p, i + 2 + len)
              if (ss == 0) decodeDcScan(br, coefs, nb, ah, al,
                if (ah == 0) { if (dcTabs(td) == null) return None else dcTabs(td) }
                else null)
              else {
                if (acTabs(ta) == null) return None
                decodeAcScan(br, coefs, nb, ss, se, ah, al, acTabs(ta))
              }
              i = nextMarker(br.pos) - (2 + len) // loop adds 2 + len back
            case _ => ()
          }
          i += 2 + len
        }
      }
      if (!sawSof) return None
      val q = qtabs(qid)
      if (q == null) return None
      val plane = new Array[Byte](w * h)
      val bw = (w + 7) / 8
      val coef = new Array[Int](64)
      val tmp = new Array[Double](64)
      for (b <- 0 until nb) {
        java.util.Arrays.fill(coef, 0)
        var k = 0
        while (k < 64) {
          coef(Zigzag(k)) = coefs(b * 64 + k) * q(k)
          k += 1
        }
        for (y <- 0 until 8; x <- 0 until 8) {
          var acc = 0.0
          var u = 0
          while (u < 8) { acc += Cn(u) * coef(y * 8 + u) * Cos(u)(x); u += 1 }
          tmp(y * 8 + x) = 0.5 * acc
        }
        val x0 = (b % bw) * 8; val y0 = (b / bw) * 8
        for (y <- 0 until 8; x <- 0 until 8) {
          var acc = 0.0
          var v = 0
          while (v < 8) { acc += Cn(v) * tmp(v * 8 + x) * Cos(v)(y); v += 1 }
          val out = math.round(0.5 * acc + 128.0)
          if (x0 + x < w && y0 + y < h)
            plane((y0 + y) * w + (x0 + x)) =
              math.max(0L, math.min(255L, out)).toByte
        }
      }
      Some((w, h, plane))
    }

    /** DC scan: first pass (Ah = 0) Huffman-decodes diffs and stores
      * pred << Al; refinement (Ah > 0) ORs one raw bit at Al per block.
      */
    private def decodeDcScan(br: BitReader, coefs: Array[Int], nb: Int,
        ah: Int, al: Int, dc: HuffTable): Unit = {
      var pred = 0
      var b = 0
      while (b < nb) {
        if (ah == 0) {
          val cat = dc.decode(br)
          if (cat > 15) throw new DecodeFail
          pred += extend(br.receive(cat), cat)
          coefs(b * 64) = pred << al
        } else if (br.bit() == 1) coefs(b * 64) |= 1 << al
        b += 1
      }
    }

    /** AC scan over band ss..se (zigzag order). First pass (Ah = 0):
      * zero-run/size codes shifted by Al, ZRL, EOBRUN. Refinement
      * (Ah > 0): the full G.1.2.3 walk — correction bits for nonzero
      * history, newly-nonzero ±(1 << Al) placements, EOB-covered blocks.
      */
    private def decodeAcScan(br: BitReader, coefs: Array[Int], nb: Int,
        ss: Int, se: Int, ah: Int, al: Int, ac: HuffTable): Unit = {
      val p1 = 1 << al; val m1 = -1 << al
      var eobrun = 0
      var b = 0
      while (b < nb) {
        val base = b * 64
        if (ah == 0) { // first scan for this band
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = ac.decode(br)
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else { eobrun = (1 << r) - 1 + br.receive(r); k = se + 1 }
              } else {
                k += r
                if (k > se) throw new DecodeFail
                coefs(base + k) = extend(br.receive(s), s) << al
                k += 1
              }
            }
          }
        } else { // refinement
          var k = ss
          if (eobrun == 0) {
            var break = false
            while (k <= se && !break) {
              val rs = ac.decode(br)
              var r = rs >> 4; val s = rs & 0x0f
              var newval = 0
              if (s == 0) {
                if (r < 15) {
                  // no −1 here: the post-loop decrement below consumes the
                  // current block's share of the run
                  eobrun = (1 << r) + br.receive(r)
                  break = true
                }
                // r == 15: advance past 16 zero-history coefficients
              } else {
                if (s != 1) throw new DecodeFail
                newval = if (br.bit() == 1) p1 else m1
              }
              if (!break) {
                var placed = false
                while (k <= se && !placed) {
                  if (coefs(base + k) != 0) {
                    if (br.bit() == 1 && (coefs(base + k) & p1) == 0)
                      coefs(base + k) +=
                        (if (coefs(base + k) >= 0) p1 else m1)
                  } else {
                    if (r == 0) {
                      if (newval != 0) coefs(base + k) = newval
                      placed = true
                    } else r -= 1
                  }
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) { // remainder of this block is EOB-covered
            while (k <= se) {
              if (coefs(base + k) != 0 && br.bit() == 1 &&
                  (coefs(base + k) & p1) == 0)
                coefs(base + k) += (if (coefs(base + k) >= 0) p1 else m1)
              k += 1
            }
            eobrun -= 1
          }
        }
        b += 1
      }
    }

    // ---- sequential ARITHMETIC coding (SOF9): ITU-T T.81 Annex D QM-coder
    //      + Annex F.1.4.4 statistical models. This closes the last branch
    //      of the JPEG entropy matrix (baseline/progressive Huffman + now
    //      arithmetic); the reference repo has no media path at all
    //      (extended §2.3 surface).

    /** T.81 Table D.3 probability-estimation state machine, transcribed
      * from the public spec: per state (Qe, NMPS, NLPS, switch). Index 113
      * is the fixed non-adaptive ~0.5 bin the AC sign uses (F.1.4.4.2 —
      * NMPS = NLPS = self, switch 0, so it never adapts). The properties
      * verified in-repo are SYMMETRIC encode/decode round-trip, table
      * sanity invariants, and compression efficiency vs the Huffman
      * baseline (QmCoderSpec / JpegArithSpec) — cross-implementation
      * bit-parity against another arithmetic JPEG codec would need a
      * reference binary this environment doesn't ship, so any transcription
      * slip in a Qe/next-state value would shift compression ratio
      * slightly, never correctness.
      */
    private val QmTable: Array[(Int, Int, Int, Int)] = Array(
      (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
      (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
      (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
      (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
      (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
      (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
      (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
      (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
      (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
      (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
      (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
      (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
      (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
      (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
      (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
      (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
      (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
      (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
      (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
      (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
      (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
      (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
      (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
      (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
      (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
      (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
      (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
      (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
      (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
      (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
      (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
      (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
      (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
      (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
      (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 100, 103, 0),
      (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
      (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
      (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
      (0x5A1D, 113, 113, 0)) // 113: fixed ~0.5 bin, never adapts
    private[ops] val QmQe: Array[Int] = QmTable.map(_._1)
    private[ops] val QmNmps: Array[Int] = QmTable.map(_._2)
    private[ops] val QmNlps: Array[Int] = QmTable.map(_._3)
    private[ops] val QmSwitch: Array[Int] = QmTable.map(_._4)

    /** QM arithmetic ENCODER (T.81 D.1): 16-bit interval A, 32-bit code
      * register C with the output byte at bits 19..26 and 3 spacer bits,
      * CT bit countdown, byte-stuffing (FF → FF 00) and carry resolution
      * over a deferred run of 0xFF bytes (the `sc` stack — a carry turns
      * each stacked FF into 00 and increments the byte before the run).
      * Statistics bins are ints: low 7 bits = Table D.3 index, bit 7 = MPS
      * sense.
      */
    private[ops] final class QmEncoder(out: java.io.ByteArrayOutputStream) {
      private var a = 0x10000
      private var c = 0L
      private var ct = 11
      private var buffer = -1 // pending byte (never 0xFF), -1 = none yet
      private var sc = 0 // deferred 0xFF bytes awaiting carry resolution

      def encodeBit(st: Array[Int], i: Int, d: Int): Unit = {
        val s = st(i); val idx = s & 0x7f; val mps = s >>> 7
        val qe = QmQe(idx)
        a -= qe
        if (d == mps) { // CODEMPS (D.1.4): lower subinterval, C unchanged
          if (a >= 0x8000) return // no renorm → no estimation update
          if (a < qe) { c += a; a = qe } // conditional exchange
          st(i) = (mps << 7) | QmNmps(idx)
          renorm()
        } else { // CODELPS (D.1.3): always renorms
          if (a >= qe) { c += a; a = qe } // no exchange: LPS is upper
          val nm = if (QmSwitch(idx) == 1) 1 - mps else mps
          st(i) = (nm << 7) | QmNlps(idx)
          renorm()
        }
      }

      private def renorm(): Unit = {
        while ({
          a <<= 1; c <<= 1; ct -= 1
          if (ct == 0) { byteOut(); ct = 8 }
          a < 0x8000
        }) ()
      }

      private def byteOut(): Unit = {
        val t = (c >> 19).toInt
        if (t > 0xff) {
          // carry: ripples through every stacked FF (each becomes 00) into
          // the pending byte
          if (buffer >= 0) {
            out.write(buffer + 1)
            if (buffer + 1 == 0xff) out.write(0x00) // stuff
          }
          while (sc > 0) { out.write(0x00); sc -= 1 }
          buffer = t & 0xff // spacer bits guarantee this is < 0xFF
        } else if (t == 0xff) {
          sc += 1 // defer — a later carry may still turn it into 00
        } else {
          if (buffer >= 0) out.write(buffer)
          while (sc > 0) { out.write(0xff); out.write(0x00); sc -= 1 }
          buffer = t
        }
        c &= 0x7ffff
      }

      /** D.1.8–D.1.9: point C at the value with the most trailing zeros
        * inside the final interval, then push the remaining 2 bytes out.
        */
      def flush(): Unit = {
        var t = (c + a - 1) & 0xffff0000L
        if (t < c) t += 0x8000
        c = t << ct
        if ((c & 0xf8000000L) != 0) { // carry out of the final shift
          if (buffer >= 0) {
            out.write(buffer + 1)
            if (buffer + 1 == 0xff) out.write(0x00)
          }
          while (sc > 0) { out.write(0x00); sc -= 1 }
        } else {
          if (buffer >= 0) out.write(buffer)
          while (sc > 0) { out.write(0xff); out.write(0x00); sc -= 1 }
        }
        val b1 = ((c >> 19) & 0xff).toInt
        out.write(b1); if (b1 == 0xff) out.write(0x00)
        val b2 = ((c >> 11) & 0xff).toInt
        out.write(b2); if (b2 == 0xff) out.write(0x00)
        buffer = -1; sc = 0; a = 0x10000; c = 0; ct = 11
      }
    }

    /** QM arithmetic DECODER (T.81 D.2), libjpeg-style register discipline:
      * C accumulates raw bytes with CT fresh low bits, the active code
      * value is C >> CT, and a subinterval test compares C against
      * A << CT. Feeding: FF-unstuffing (FF 00 → data FF, extra FFs are
      * fill), and hitting a real marker switches to zero-feed — legal
      * mid-scan in arithmetic coding (the flush pads with optimal-zero
      * bits), and what bounds every loop on hostile input. The code-value
      * invariant C < A << CT holds inductively for ANY byte content, so
      * corrupt payloads can't overflow or hang the decoder (CodecFuzzSpec).
      */
    private[ops] final class QmDecoder(p: Array[Byte], start: Int) {
      private var pos = start
      private var a = 0x10000
      private var ct = 0
      private var markerPos = -1 // offset of the FF of the ending marker
      private var c: Long = { val hi = nextByte().toLong; (hi << 8) | nextByte() }

      /** Where a restart scan should begin: at the marker if the feeder
        * reached one, else at the first unconsumed byte.
        */
      def restartScanFrom: Int = if (markerPos >= 0) markerPos else pos

      private def nextByte(): Int = {
        if (markerPos >= 0 || pos >= p.length) return 0 // zero-feed
        val b = p(pos) & 0xff
        if (b != 0xff) { pos += 1; return b }
        var j = pos + 1
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= p.length) { markerPos = pos; 0 }
        else if ((p(j) & 0xff) == 0x00) { pos = j + 1; 0xff } // stuffed
        else { markerPos = pos; 0 } // marker: supply zeros from here on
      }

      def decodeBit(st: Array[Int], i: Int): Int = {
        while (a < 0x8000) { // pending renormalization (D.2.6)
          ct -= 1
          if (ct < 0) { c = (c << 8) | nextByte(); ct += 8 }
          a <<= 1
        }
        val s = st(i); val idx = s & 0x7f; val mps = s >>> 7
        val qe = QmQe(idx)
        a -= qe
        val t = a.toLong << ct
        if (c >= t) { // upper subinterval, size Qe — always renorms
          c -= t
          val d =
            if (a < qe) { st(i) = (mps << 7) | QmNmps(idx); mps } // exchange
            else {
              val nm = if (QmSwitch(idx) == 1) 1 - mps else mps
              st(i) = (nm << 7) | QmNlps(idx)
              1 - mps
            }
          a = qe
          d
        } else if (a < 0x8000) { // lower subinterval, renorm pending
          if (a < qe) { // conditional exchange: the smaller side is LPS
            val nm = if (QmSwitch(idx) == 1) 1 - mps else mps
            st(i) = (nm << 7) | QmNlps(idx)
            1 - mps
          } else { st(i) = (mps << 7) | QmNmps(idx); mps }
        } else mps // fast path: no renorm → no estimation update
      }
    }

    /** Statistics areas + conditioning state for a scan (Annex F.1.4.4
      * layout): DC = 5 conditioning categories × 4 bins {S0, SS, SP, SN}
      * at 0/4/8/12/16 plus a shared X/M area from bin 20; AC = {SE, S0,
      * X1} triple per k (bins 0..188) plus low/high X/M areas at 189/217
      * split at Kx; AC signs use the fixed bin. Components that select
      * the same conditioning table share its ADAPTIVE STATISTICS (the
      * spec's multi-component discipline — all three color components
      * here use table 0), while DC prediction and the
      * previous-difference conditioning class stay PER COMPONENT.
      * Defaults L = 0, U = 1, Kx = 5 per F.1.4.4.1.4 / F.1.4.4.2.1,
      * spelled out in the DAC segment.
      */
    private[ops] final class ArithModel(val dcL: Int = 0, val dcU: Int = 1,
        val acKx: Int = 5, nComp: Int = 1) {
      val dcStats = new Array[Int](64)
      val acStats = new Array[Int](256)
      val fixed = Array(113)
      val dcContext = new Array[Int](nComp)
      val pred = new Array[Int](nComp)
      def reset(): Unit = {
        java.util.Arrays.fill(dcStats, 0)
        java.util.Arrays.fill(acStats, 0)
        java.util.Arrays.fill(dcContext, 0)
        java.util.Arrays.fill(pred, 0)
        fixed(0) = 113
      }
    }

    /** Encode one quantized coefficient block (zigzag order, DC absolute)
      * per F.1.4.4.1 (DC: sign + magnitude-category walk + magnitude bits,
      * conditioned on the previous difference's class) and F.1.4.4.2 (AC:
      * per-k EOB decision, zero runs on S0 bins, fixed-bin sign, X1/X2 on
      * the per-k bin then the Kx-split shared area).
      */
    private[ops] def arithEncodeBlock(enc: QmEncoder, m: ArithModel,
        coefZz: Array[Int], comp: Int = 0): Unit = {
      val dc = coefZz(0)
      var v = dc - m.pred(comp); m.pred(comp) = dc
      var st = m.dcContext(comp)
      if (v == 0) { enc.encodeBit(m.dcStats, st, 0); m.dcContext(comp) = 0 }
      else {
        enc.encodeBit(m.dcStats, st, 1)
        var sign = 0
        if (v > 0) { enc.encodeBit(m.dcStats, st + 1, 0); st += 2 }
        else { v = -v; sign = 1; enc.encodeBit(m.dcStats, st + 1, 1); st += 3 }
        val sz = v - 1
        var mag = 0
        if (sz != 0) {
          enc.encodeBit(m.dcStats, st, 1)
          mag = 1
          var v2 = sz
          st = 20
          while ({ v2 >>= 1; v2 != 0 }) {
            enc.encodeBit(m.dcStats, st, 1); mag <<= 1; st += 1
          }
        }
        enc.encodeBit(m.dcStats, st, 0) // magnitude-category terminator
        m.dcContext(comp) = // F.1.4.4.1.2 conditioning class, NEXT block
          if (mag < ((1 << m.dcL) >> 1)) 0
          else if (mag > ((1 << m.dcU) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        st += 14 // magnitude bits: one bin per category (F.1.4.4.1.3)
        var mm = mag
        while ({ mm >>= 1; mm != 0 })
          enc.encodeBit(m.dcStats, st, if ((mm & sz) != 0) 1 else 0)
      }
      var ke = 63
      while (ke >= 1 && coefZz(ke) == 0) ke -= 1
      var k = 1
      while (k <= ke) {
        var ast = 3 * (k - 1)
        enc.encodeBit(m.acStats, ast, 0) // not end-of-block
        while (coefZz(k) == 0) {
          enc.encodeBit(m.acStats, ast + 1, 0); ast += 3; k += 1
        }
        enc.encodeBit(m.acStats, ast + 1, 1)
        var av = coefZz(k)
        var sign = 0
        if (av < 0) { av = -av; sign = 1 }
        enc.encodeBit(m.fixed, 0, sign) // fixed ~0.5 bin, non-adaptive
        ast += 2
        val sz = av - 1
        var mag = 0
        if (sz != 0) {
          enc.encodeBit(m.acStats, ast, 1) // X1
          mag = 1
          var v2 = sz
          if ({ v2 >>= 1; v2 != 0 }) {
            enc.encodeBit(m.acStats, ast, 1) // X2 shares X1's bin
            mag <<= 1
            ast = if (k <= m.acKx) 189 else 217
            while ({ v2 >>= 1; v2 != 0 }) {
              enc.encodeBit(m.acStats, ast, 1); mag <<= 1; ast += 1
            }
          }
        }
        enc.encodeBit(m.acStats, ast, 0)
        ast += 14
        var mm = mag
        while ({ mm >>= 1; mm != 0 })
          enc.encodeBit(m.acStats, ast, if ((mm & sz) != 0) 1 else 0)
        k += 1
      }
      if (ke < 63) enc.encodeBit(m.acStats, 3 * ke, 1) // EOB at k = ke+1
    }

    /** Decode one block — exact mirror of [[arithEncodeBlock]]. Throws
      * [[DecodeFail]] on impossible magnitudes or AC overrun (bounded
      * decisions per block, so garbage input can never hang).
      */
    private[ops] def arithDecodeBlock(dec: QmDecoder, m: ArithModel,
        coefZz: Array[Int], comp: Int = 0): Unit = {
      java.util.Arrays.fill(coefZz, 0)
      var st = m.dcContext(comp)
      if (dec.decodeBit(m.dcStats, st) == 0) m.dcContext(comp) = 0
      else {
        val sign = dec.decodeBit(m.dcStats, st + 1)
        st += 2 + sign
        var mag = 0
        var sz = 0
        if (dec.decodeBit(m.dcStats, st) != 0) {
          mag = 1
          st = 20
          while (dec.decodeBit(m.dcStats, st) != 0) {
            mag <<= 1
            if (mag == 0x8000) throw new DecodeFail
            st += 1
          }
          sz = mag
          st += 14
          var mm = mag
          while ({ mm >>= 1; mm != 0 })
            if (dec.decodeBit(m.dcStats, st) != 0) sz |= mm
        }
        m.dcContext(comp) =
          if (mag < ((1 << m.dcL) >> 1)) 0
          else if (mag > ((1 << m.dcU) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        m.pred(comp) += (if (sign == 1) -(sz + 1) else sz + 1)
      }
      coefZz(0) = m.pred(comp)
      var k = 1
      var eob = false
      while (k <= 63 && !eob) {
        var ast = 3 * (k - 1)
        if (dec.decodeBit(m.acStats, ast) != 0) eob = true
        else {
          while (dec.decodeBit(m.acStats, ast + 1) == 0) {
            ast += 3; k += 1
            if (k > 63) throw new DecodeFail
          }
          val sign = dec.decodeBit(m.fixed, 0)
          ast += 2
          var mag = 0
          var sz = 0
          if (dec.decodeBit(m.acStats, ast) != 0) {
            mag = 1
            if (dec.decodeBit(m.acStats, ast) != 0) {
              mag = 2
              ast = if (k <= m.acKx) 189 else 217
              while (dec.decodeBit(m.acStats, ast) != 0) {
                mag <<= 1
                if (mag == 0x8000) throw new DecodeFail
                ast += 1
              }
            }
            sz = mag
            ast += 14
            var mm = mag
            while ({ mm >>= 1; mm != 0 })
              if (dec.decodeBit(m.acStats, ast) != 0) sz |= mm
          }
          coefZz(k) = if (sign == 1) -(sz + 1) else sz + 1
          k += 1
        }
      }
    }

    /** Entropy layer alone over arbitrary coefficient blocks — the
      * general-content round-trip hook JpegArithSpec uses (the container
      * path only ever emits flat blocks).
      */
    private[ops] def arithEncodeBlocks(blocks: Array[Array[Int]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val enc = new QmEncoder(out); val m = new ArithModel()
      blocks.foreach(b => arithEncodeBlock(enc, m, b))
      enc.flush()
      out.toByteArray
    }

    private[ops] def arithDecodeBlocks(data: Array[Byte], n: Int): Array[Array[Int]] = {
      val dec = new QmDecoder(data, 0); val m = new ArithModel()
      Array.fill(n) {
        val c = new Array[Int](64); arithDecodeBlock(dec, m, c); c
      }
    }

    private def writeArithHeaders(out: java.io.ByteArrayOutputStream, w: Int,
        h: Int, qtab: Array[Int], restartInterval: Int, nc: Int = 1): Unit = {
      out.write(0xff); out.write(0xd8) // SOI
      out.write(0xff); out.write(0xe0) // APP0 JFIF
      w16(out, 16)
      "JFIF".foreach(c => out.write(c)); out.write(0)
      out.write(1); out.write(1)
      out.write(0); w16(out, 1); w16(out, 1)
      out.write(0); out.write(0)
      out.write(0xff); out.write(0xdb) // DQT table 0, zigzag order
      w16(out, 2 + 1 + 64)
      out.write(0x00)
      Zigzag.indices.foreach(k => out.write(qtab(k)))
      out.write(0xff); out.write(0xc9) // SOF9: sequential DCT, arithmetic
      w16(out, 8 + 3 * nc)
      out.write(8); w16(out, h); w16(out, w); out.write(nc)
      for (c <- 1 to nc) { out.write(c); out.write(0x11); out.write(0) }
      out.write(0xff); out.write(0xcc) // DAC: DC 0 (L=0,U=1), AC 0 (Kx=5)
      w16(out, 6)
      out.write(0x00); out.write(0x10)
      out.write(0x10); out.write(0x05)
      if (restartInterval > 0) {
        out.write(0xff); out.write(0xdd); w16(out, 4); w16(out, restartInterval)
      }
      out.write(0xff); out.write(0xda) // SOS: every component, table 0
      w16(out, 6 + 2 * nc)
      out.write(nc)
      for (c <- 1 to nc) { out.write(c); out.write(0x00) }
      out.write(0); out.write(63); out.write(0)
    }

    /** Flat-block ARITHMETIC-coded sibling of [[encode]]: same geometry and
      * q_DC = 8 exactness, entropy-coded with the adaptive QM-coder under
      * SOF9 + DAC instead of SOF0 + DHT. Restart intervals flush the coder
      * and reset statistics/predictors per F.1.4.4.3.
      */
    def encodeArith(payload: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
      val nBlocks = math.max(1, (payload.length + BlocksPerRow - 1) / BlocksPerRow) * BlocksPerRow
      val w = BlocksPerRow * 8; val h = nBlocks / BlocksPerRow * 8
      val qtab = Array.tabulate(64)(k => if (k == 0) 8 else 16)
      val out = new java.io.ByteArrayOutputStream()
      writeArithHeaders(out, w, h, qtab, restartInterval)
      val model = new ArithModel()
      var enc = new QmEncoder(out)
      val coef = new Array[Int](64)
      var rst = 0
      for (i <- 0 until nBlocks) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          enc.flush()
          out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
          enc = new QmEncoder(out); model.reset()
        }
        val v = if (i < payload.length) payload(i) & 0xff else 0
        java.util.Arrays.fill(coef, 0)
        coef(0) = v - 128 // quantized exactly: 8·(v−128)/8
        arithEncodeBlock(enc, model, coef)
      }
      enc.flush()
      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
    }

    /** 3-component 4:4:4 ARITHMETIC-coded color variant of [[encodeArith]]
      * — the q165 layout under the QM-coder: interleaved MCUs with one
      * block per component, all three components on conditioning table 0
      * (SHARED adaptive statistics, per-component DC prediction and
      * conditioning class — the T.81 multi-component discipline), flat
      * neutral chroma so decoded RGB equals the payload gray exactly.
      */
    def encodeColorArith(payload: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
      val nBlocks = math.max(1, (payload.length + BlocksPerRow - 1) / BlocksPerRow) * BlocksPerRow
      val w = BlocksPerRow * 8; val h = nBlocks / BlocksPerRow * 8
      val qtab = Array.tabulate(64)(k => if (k == 0) 8 else 16)
      val out = new java.io.ByteArrayOutputStream()
      writeArithHeaders(out, w, h, qtab, restartInterval, nc = 3)
      val model = new ArithModel(nComp = 3)
      var enc = new QmEncoder(out)
      val coef = new Array[Int](64)
      var rst = 0
      for (i <- 0 until nBlocks) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          enc.flush()
          out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
          enc = new QmEncoder(out); model.reset()
        }
        val v = if (i < payload.length) payload(i) & 0xff else 0
        for (c <- 0 until 3) { // MCU: Y, Cb, Cr — chroma flat neutral
          java.util.Arrays.fill(coef, 0)
          coef(0) = if (c == 0) v - 128 else 0
          arithEncodeBlock(enc, model, coef, c)
        }
      }
      enc.flush()
      out.write(0xff); out.write(0xd9)
      out.toByteArray
    }

    /** Header-driven decode of a single-component SEQUENTIAL ARITHMETIC
      * (SOF9) JPEG: DAC conditioning, DRI restarts, QM entropy decode,
      * then the same dequant + IDCT as baseline. None on any other frame
      * type or malformed bytes (fail-soft — runs inside mapPartitions).
      */
    def decodeArithPixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      try decodeArithOrThrow(p).collect {
        case (w, h, planes) if planes.length == 1 => (w, h, planes(0))
      } catch {
        case _: DecodeFail | _: ArrayIndexOutOfBoundsException => None
      }
    }

    /** 3-component 4:4:4 arithmetic color decode: same JFIF YCbCr → RGB
      * conversion as the baseline color path.
      */
    def decodeArithColorPixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      try decodeArithOrThrow(p).collect {
        case (w, h, pl) if pl.length == 3 =>
          val rgb = new Array[Byte](w * h * 3)
          def clamp(v: Long) = math.max(0L, math.min(255L, v)).toByte
          var i = 0
          while (i < w * h) {
            val y = pl(0)(i) & 0xff
            val cb = (pl(1)(i) & 0xff) - 128
            val cr = (pl(2)(i) & 0xff) - 128
            rgb(3 * i) = clamp(math.round(y + 1.402 * cr))
            rgb(3 * i + 1) = clamp(math.round(y - 0.344136 * cb - 0.714136 * cr))
            rgb(3 * i + 2) = clamp(math.round(y + 1.772 * cb))
            i += 1
          }
          (w, h, rgb)
      } catch {
        case _: DecodeFail | _: ArrayIndexOutOfBoundsException => None
      }
    }

    private def decodeArithOrThrow(p: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] = {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
        return None
      val qtabs = new Array[Array[Int]](4)
      var dcL = 0; var dcU = 1; var acKx = 5 // DAC defaults
      var w = 0; var h = 0; var restartInterval = 0
      var qids: Array[Int] = null
      var sawSof = false
      var i = 2
      def u16(at: Int) = {
        if (at + 1 >= p.length) throw new DecodeFail
        ((p(at) & 0xff) << 8) | (p(at + 1) & 0xff)
      }
      var scanStart = -1
      while (scanStart < 0) {
        if (i + 4 > p.length) return None
        if ((p(i) & 0xff) != 0xff) return None
        val m = p(i + 1) & 0xff
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > p.length) return None
        m match {
          case 0xdb =>
            var j = i + 4
            while (j < i + 2 + len) {
              val pq = (p(j) & 0xff) >> 4; val id = p(j) & 0x0f
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) = if (pq == 0) p(j + 1 + k) & 0xff else u16(j + 1 + 2 * k)
                k += 1
              }
              qtabs(id) = t
              j += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc9 => // SOF9; this decoder: 1 or 3 components, all 1×1
            if ((p(i + 4) & 0xff) != 8) return None
            h = u16(i + 5); w = u16(i + 7)
            val nc = p(i + 9) & 0xff
            if (nc != 1 && nc != 3) return None
            qids = Array.tabulate(nc) { c =>
              if ((p(i + 11 + 3 * c) & 0xff) != 0x11) return None
              p(i + 12 + 3 * c) & 0x0f
            }
            if (w <= 0 || h <= 0 || w.toLong * h * nc > MaxPixelBytes) return None
            sawSof = true
          case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // Huffman / lossless / other arithmetic frames
          case 0xcc => // DAC conditioning values (B.2.4.3)
            var j = i + 4
            while (j + 1 < i + 2 + len) {
              val tc = (p(j) & 0xff) >> 4
              val cs = p(j + 1) & 0xff
              if (tc == 0) {
                dcL = cs & 0x0f; dcU = cs >> 4
                if (dcL > dcU) return None
              } else {
                acKx = cs
                if (acKx < 1 || acKx > 63) return None
              }
              j += 2
            }
          case 0xdd => restartInterval = u16(i + 4)
          case 0xda => // SOS: every SOF component in order, table 0
            if (!sawSof || (p(i + 4) & 0xff) != qids.length) return None
            scanStart = i + 2 + len
          case _ => () // APPn / COM: skip
        }
        i += 2 + len
      }
      if (!sawSof) return None
      val q = qids.map(id => if (qtabs(id) == null) return None else qtabs(id))
      val nc = qids.length
      val bx = (w + 7) / 8; val by = (h + 7) / 8
      val planes = Array.fill(nc)(new Array[Byte](w * h))
      val model = new ArithModel(dcL, dcU, acKx, nComp = nc)
      var dec = new QmDecoder(p, scanStart)
      val coefZz = new Array[Int](64)
      val coef = new Array[Int](64)
      val tmp = new Array[Double](64)
      var mcu = 0
      for (byi <- 0 until by; bxi <- 0 until bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // entropy bytes never contain FF D0..D7 (stuffing), so scan for
          // the marker from wherever the feeder stopped
          var j = dec.restartScanFrom
          while (j + 1 < p.length &&
            !((p(j) & 0xff) == 0xff && ((p(j + 1) & 0xff) & 0xf8) == 0xd0)) j += 1
          if (j + 1 >= p.length) throw new DecodeFail
          dec = new QmDecoder(p, j + 2)
          model.reset()
        }
        mcu += 1
        for (c <- 0 until nc) { // MCU: one 1x1 block per component (A.2.3)
          arithDecodeBlock(dec, model, coefZz, c)
          java.util.Arrays.fill(coef, 0)
          var k = 0
          while (k < 64) { coef(Zigzag(k)) = coefZz(k) * q(c)(k); k += 1 }
          for (y <- 0 until 8; x <- 0 until 8) {
            var acc = 0.0
            var u = 0
            while (u < 8) { acc += Cn(u) * coef(y * 8 + u) * Cos(u)(x); u += 1 }
            tmp(y * 8 + x) = 0.5 * acc
          }
          val x0 = bxi * 8; val y0 = byi * 8
          for (y <- 0 until 8; x <- 0 until 8) {
            var acc = 0.0
            var v = 0
            while (v < 8) { acc += Cn(v) * tmp(v * 8 + x) * Cos(v)(y); v += 1 }
            val o = math.round(0.5 * acc + 128.0)
            val b = math.max(0L, math.min(255L, o)).toByte
            if (x0 + x < w && y0 + y < h) planes(c)((y0 + y) * w + (x0 + x)) = b
          }
        }
      }
      Some((w, h, planes))
    }
  }

  /** STUB decoder — stands in for a full pixel-level codec behind the same
    * signature. Deterministic: dimensions derive from the first two payload
    * bytes. Only reached for payloads [[HeaderCodec]] doesn't recognize
    * (e.g. the synthetic text fixtures).
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (64 + b0 % 64, 64 + b1 % 64)
    }

    /** STUB batch decode — the signature a vectorized/native codec needs:
      * one call per batch of payloads, results positionally aligned.
      */
    def decodeBatch(payloads: Array[Array[Byte]]): Array[(Int, Int)] =
      payloads.map(decode)

    /** STUB frame sampler (video stand-in): one frame every `step` bytes,
      * width derived from the byte at the frame offset.
      */
    def sampleFrames(payload: Array[Byte], step: Int): Seq[(Int, Int)] =
      (0 until payload.length by step).map(o => (o, 64 + (payload(o) & 0xff) % 64))
  }

  /** Dispatching decode: real header parse when the payload is a recognized
    * container, deterministic stub otherwise.
    */
  def decodeDims(payload: Array[Byte]): (Int, Int) =
    HeaderCodec.decode(payload).getOrElse(FakeCodec.decode(payload))

  /** Batch form of [[decodeDims]] — the call shape GPU/native decoders
    * need; stub batches delegate to [[FakeCodec.decodeBatch]].
    */
  def decodeDimsBatch(payloads: Array[Array[Byte]]): Array[(Int, Int)] =
    payloads.map(decodeDims)

  /** Attach the media payload as an opaque binary column (fixtures carry
    * text; a real pipeline would read image/audio bytes the same way).
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-batched metadata extraction — the mapPartitions boundary a
    * real codec plugs into (decoder init once per partition).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (codec handles, buffers)
      rows.map { r =>
        val (w, h) = decodeDims(r.payload)
        MediaMeta(r.doc_id, r.payload.length, w, h)
      }
    }
  }

  /** Columnar-batched variant of [[decodeMeta]] — the Scala analogue of a
    * `mapInPandas`/`mapInArrow` batch UDF: rows are staged into fixed-size
    * batches and the codec is invoked ONCE per batch (`decodeBatch`), which
    * is the call shape GPU/native decoders need to amortize transfer and
    * launch overhead. Same results as the row-at-a-time path (parity spec).
    */
  def decodeMetaBatched(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val dims = decodeDimsBatch(batch.map(_.payload).toArray)
        batch.iterator.zip(dims.iterator).map { case (r, (w, h)) =>
          MediaMeta(r.doc_id, r.payload.length, w, h)
        }
      }
    }
  }

  final case class MediaContent(doc_id: Long, n_bytes: Int, bmp_w: Int,
      bmp_h: Int, mean_pixel: Double, n_samples: Int, rms_amplitude: Double)

  /** Full content decode through REAL containers: each payload is wrapped
    * into a genuine BMP image and a genuine PCM WAV, then decoded back
    * pixel-by-pixel / sample-by-sample by the header-driven codecs — the
    * encode→decode pair proves the parsers work on actual format bytes,
    * and the extracted features (mean channel value, RMS amplitude) are
    * the standard image/audio summary statistics. Partition-parallel, no
    * shuffle, payloads never touch the driver. Sums are exact integers;
    * the single float division+sqrt happens per row (accumulation-order
    * independent, oracle-safe at 6 digits).
    */
  def decodeContent(media: Dataset[MediaRow]): Dataset[MediaContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("BMP roundtrip failed"))
        var psum = 0L
        px.foreach(b => psum += (b & 0xff))
        val samples = WavCodec.decodeSamples(WavCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("WAV roundtrip failed"))
        var sq = 0L
        samples.foreach(s => sq += s.toLong * s)
        MediaContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, samples.length,
          math.sqrt(sq.toDouble / samples.length))
      }
    }
  }

  final case class GifContent(doc_id: Long, n_bytes: Int, gif_w: Int,
      gif_h: Int, mean_pixel: Double, max_idx: Int)

  /** Pixel decode through GIF's LZW entropy coding: each payload becomes a
    * genuine GIF89a (grayscale color table, variable-width LZW stream) and
    * is decoded back through the full dictionary rebuild. The identity
    * palette makes gray value == pixel index == payload byte, so the
    * extracted mean must equal the BMP/PNG paths' — any desync in the
    * code-width schedule or the KwKwK case breaks the oracle hash.
    * Partition-parallel, no shuffle, nothing on the driver.
    */
  def decodeContentGif(media: Dataset[MediaRow]): Dataset[GifContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = GifCodec.decodePixels(GifCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("GIF roundtrip failed"))
        var psum = 0L
        var mx = 0
        px.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
        GifContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, mx)
      }
    }
  }

  /** Nearest-neighbor resample of a byte grid to `tw`×`th` — the resize
    * primitive a multimodal pipeline runs after decode (thumbnailing,
    * fixed-input-size models). Source index per target cell is the
    * standard floor mapping sx = ⌊x·W/tw⌋, sy = ⌊y·H/th⌋ — integer
    * arithmetic, so an oracle reproduces it exactly.
    */
  def resizeNearest(px: Array[Byte], srcW: Int, srcH: Int,
      tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * srcH / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = px(sy * srcW + x * srcW / tw)
        x += 1
      }
      y += 1
    }
    out
  }

  final case class ResizedContent(doc_id: Long, n_bytes: Int, src_h: Int,
      rs_mean: Double, rs_min: Int, rs_max: Int)

  /** Decode → resize feature extraction: payload → real BMP → pixel decode
    * → 8×8 nearest-neighbor thumbnail → summary stats. The source grid is
    * the decoded channel-byte plane (48 bytes per 16-px RGB row), so every
    * sampled byte is payload(sy·48 + sx) or zero padding — closed-form for
    * the oracle. Map-only, partition-parallel, nothing on the driver.
    */
  def decodeResized(media: Dataset[MediaRow]): Dataset[ResizedContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("BMP roundtrip failed"))
        val thumb = resizeNearest(px, w * 3, h, 8, 8)
        var sum = 0L; var mn = 255; var mx = 0
        thumb.foreach { b =>
          val v = b & 0xff
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        }
        ResizedContent(r.doc_id, r.payload.length, h,
          sum.toDouble / thumb.length, mn, mx)
      }
    }
  }

  final case class MuLawContent(doc_id: Long, n_bytes: Int, n_samples: Int,
      rms_amplitude: Double, max_abs: Int)

  /** Sample decode through a COMPRESSED audio container: each payload
    * becomes a genuine μ-law WAV (its bytes ARE the companded stream) and
    * is expanded back to linear PCM through the G.711 curve. Sums of
    * squares are exact integers; the single division + sqrt happens per
    * row (order-independent, oracle-safe at 6 digits).
    */
  def decodeContentMuLaw(media: Dataset[MediaRow]): Dataset[MuLawContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val samples = MuLawCodec.decodeSamples(MuLawCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("mu-law roundtrip failed"))
        var sq = 0L; var mx = 0
        samples.foreach { s =>
          sq += s.toLong * s
          if (math.abs(s.toInt) > mx) mx = math.abs(s.toInt)
        }
        MuLawContent(r.doc_id, r.payload.length, samples.length,
          math.sqrt(sq.toDouble / samples.length), mx)
      }
    }
  }

  final case class FlacContent(doc_id: Long, n_bytes: Int, n_samples: Int,
      rms_amplitude: Double, max_abs: Int, checksum: Long)

  /** Lossless-audio decode through a real FLAC container: payload → 16-bit
    * PCM → FLAC encode (frames, fixed predictors, Rice residuals, CRCs) →
    * full decode. Lossless, so decoded samples equal the input PCM
    * bit-for-bit and the oracle is CLOSED FORM per byte; the
    * position-weighted checksum pins sample ORDER across frame boundaries.
    */
  def decodeContentFlac(media: Dataset[MediaRow]): Dataset[FlacContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val samples = FlacCodec.decodeSamples(FlacCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("FLAC roundtrip failed"))
        var sq = 0L; var mx = 0; var ck = 0L
        var i = 0
        while (i < samples.length) {
          val s = samples(i)
          sq += s.toLong * s
          if (math.abs(s.toInt) > mx) mx = math.abs(s.toInt)
          ck += (i + 1).toLong * s
          i += 1
        }
        FlacContent(r.doc_id, r.payload.length, samples.length,
          math.sqrt(sq.toDouble / samples.length), mx, ck)
      }
    }
  }

  final case class AdpcmContent(doc_id: Long, n_bytes: Int, n_samples: Int,
      rms_amplitude: Double, max_abs: Int, end_pred: Int)

  /** Sample decode through a PREDICTIVE audio container: each payload
    * becomes a genuine IMA ADPCM WAV (its bytes ARE the nibble stream) and
    * is reconstructed sample by sample through the adaptive predictor.
    * Every decoded sample depends on the whole nibble prefix — the state
    * recurrence the oracle replays with a recursive CTE. Sums of squares
    * stay exact integers; one division + sqrt per row (order-independent,
    * oracle-safe at 6 digits). Map-only, partition-parallel.
    */
  def decodeContentAdpcm(media: Dataset[MediaRow]): Dataset[AdpcmContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val samples = AdpcmCodec.decodeSamples(AdpcmCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("ADPCM roundtrip failed"))
        var sq = 0L; var mx = 0
        samples.foreach { s =>
          sq += s.toLong * s
          if (math.abs(s.toInt) > mx) mx = math.abs(s.toInt)
        }
        AdpcmContent(r.doc_id, r.payload.length, samples.length,
          math.sqrt(sq.toDouble / samples.length), mx, samples.last.toInt)
      }
    }
  }

  final case class JpegContent(doc_id: Long, n_bytes: Int, jpg_w: Int,
      jpg_h: Int, mean_pixel: Double, max_gray: Int)

  /** Pixel decode through a TRANSFORM-CODED container: each payload becomes
    * a genuine baseline JFIF (flat DC-only blocks, q_DC = 8 — the encoding
    * where the lossy transform round-trips bit-exactly) and is decoded back
    * through Huffman + dequant + IDCT. One payload byte expands to a 64-px
    * block, so mean = Σbytes / nBlocks and max gray = max byte — the
    * closed forms the oracle computes from the text. Partition-parallel,
    * no shuffle, nothing on the driver.
    */
  def decodeContentJpeg(media: Dataset[MediaRow]): Dataset[JpegContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JpegCodec.decodePixels(JpegCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("JPEG roundtrip failed"))
        var psum = 0L
        var mx = 0
        px.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
        JpegContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, mx)
      }
    }
  }

  final case class PngContent(doc_id: Long, n_bytes: Int, png_w: Int,
      png_h: Int, mean_pixel: Double, n_filter_kinds: Int)

  /** Pixel decode through a COMPRESSED container: each payload becomes a
    * genuine filtered RGB8 PNG (Sub/Up filter bytes, zlib-deflated IDAT,
    * CRC'd chunks) and is decoded back through inflate + unfiltering. The
    * extracted mean pixel must equal the BMP path's (same pixel mapping) —
    * any corruption in the deflate→inflate→unfilter chain breaks the
    * oracle hash. Partition-parallel, no shuffle, nothing on the driver.
    */
  def decodeContentPng(media: Dataset[MediaRow]): Dataset[PngContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px, kinds) = PngCodec.decodePixels(PngCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("PNG roundtrip failed"))
        var psum = 0L
        px.foreach(b => psum += (b & 0xff))
        PngContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, kinds)
      }
    }
  }

  final case class PerceptualRow(doc_id: Long, dhash: Long)

  /** 64-bit difference hash (dHash) over DECODED pixels — the perceptual
    * fingerprint image pipelines dedup on (robust to re-encoding, unlike
    * byte-level md5): sample the image on a 9×8 grid (nearest-neighbor, so
    * the arithmetic is exactly reproducible), emit one bit per horizontal
    * gradient (right sample brighter than left), pack row-major. Gray value
    * = channel-0 byte of the decoded BMP pixel array.
    */
  private[ops] def dhash64(px: Array[Byte], w: Int, h: Int): Long = {
    var hash = 0L
    var row = 0
    while (row < 8) {
      val y = row * h / 8
      var c = 0
      while (c < 8) {
        val xl = c * w / 9
        val xr = (c + 1) * w / 9
        val l = px((y * w + xl) * 3) & 0xff
        val r = px((y * w + xr) * 3) & 0xff
        if (r > l) hash |= 1L << (row * 8 + c)
        c += 1
      }
      row += 1
    }
    hash
  }

  /** Payload → real BMP container → pixel decode → dHash, one fingerprint
    * per document, partition-parallel.
    */
  def decodePerceptual(media: Dataset[MediaRow]): Dataset[PerceptualRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("BMP roundtrip failed"))
        PerceptualRow(r.doc_id, dhash64(px, w, h))
      }
    }
  }

  /** One-to-many decode (frame sampling): each payload expands to its
    * sampled frames, partition-parallel, no shuffle until the caller
    * aggregates.
    */
  def sampleFrames(media: Dataset[MediaRow], step: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        FakeCodec.sampleFrames(r.payload, step).iterator.zipWithIndex.map {
          case ((o, w), i) => Frame(r.doc_id, i, o, w)
        }
      }
    }
  }

  /** End-to-end: binary attach → typed decode → metadata rows. The oracle
    * reproduces the stub's byte arithmetic in SQL (fixture text is ASCII, so
    * bytes = chars).
    */
  val q32MultimodalMeta = GraftQuery(
    "q32_multimodal_meta",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 100))
        .as[MediaRow]
      decodeMeta(media).toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, length(text) AS n_bytes,
           |  64 + ascii(substr(text, 1, 1)) % 64 AS width,
           |  64 + ascii(substr(text, 2, 1)) % 64 AS height
           |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))

  /** Frame sampling end-to-end through the batched decode boundary: every
    * 512th byte starts a frame (video stand-in), one output row per frame.
    */
  val q62MultimodalFrames = GraftQuery(
    "q62_multimodal_frames",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 100))
        .as[MediaRow]
      sampleFrames(media, 512).toDF()
        .orderBy("doc_id", "frame_id")
    },
    // scalar range()+unnest: DuckDB 1.0's range TABLE function rejects
    // lateral column parameters
    Some("""SELECT doc_id, CAST(i AS INT) AS frame_id, CAST(i * 512 AS INT) AS off,
           |  64 + ascii(substr(text, CAST(i * 512 + 1 AS INT), 1)) % 64 AS frame_w
           |FROM (SELECT doc_id, text,
           |        unnest(range(0, CAST(ceil(length(text) / 512.0) AS BIGINT))) AS i
           |      FROM documents WHERE doc_id < 100) t
           |ORDER BY doc_id, frame_id""".stripMargin))

  /** Pixel/sample-level decode end-to-end: payload → real BMP + real WAV →
    * header-driven decode → mean pixel value and RMS amplitude. The oracle
    * reproduces the byte arithmetic from the document text (ASCII fixtures:
    * bytes = chars; BMP pads rows with zero bytes, WAV pads the odd tail
    * with a zero high byte, both mirrored exactly in SQL).
    */
  val q131MultimodalDecode = GraftQuery(
    "q131_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContent(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("bmp_w"), col("bmp_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"),
          col("n_samples"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, text, len,
           |    greatest(1, (len + 47) // 48) AS h,
           |    greatest(1, (len + 1) // 2) AS n,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum
           |  FROM t),
           |w AS (
           |  SELECT doc_id, len, h, n, bytesum,
           |    list_transform(range(0, n), k ->
           |      (CASE WHEN 2*k + 1 <= len
           |         THEN ascii(substr(text, CAST(2*k + 1 AS INT), 1)) ELSE 0 END)
           |      + 256 * (CASE WHEN 2*k + 2 <= len
           |         THEN ascii(substr(text, CAST(2*k + 2 AS INT), 1)) ELSE 0 END)
           |    ) AS samples
           |  FROM b)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(16 AS INT) AS bmp_w, CAST(h AS INT) AS bmp_h,
           |  round(bytesum::DOUBLE / (h * 48), 6) AS mean_pixel,
           |  CAST(n AS INT) AS n_samples,
           |  round(sqrt(list_sum(list_transform(samples, v -> v * v))::DOUBLE / n), 6)
           |    AS rms_amplitude
           |FROM w ORDER BY doc_id""".stripMargin))

  /** Compressed-container decode end-to-end: payload → real filtered PNG →
    * CRC walk + inflate + unfilter → mean pixel. The oracle reproduces the
    * pixel arithmetic from the document text (same mapping as q131's BMP:
    * 16-wide RGB rows, zero-padded tail), so the hash only matches if the
    * whole compression round-trip is byte-exact. n_filter_kinds comes from
    * the actual filter bytes (Sub everywhere; Up too once there are ≥2
    * rows).
    */
  val q140PngDecode = GraftQuery(
    "q140_png_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentPng(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("png_w"), col("png_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("n_filter_kinds"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 47) // 48) AS h,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(16 AS INT) AS png_w, CAST(h AS INT) AS png_h,
           |  round(bytesum::DOUBLE / (h * 48), 6) AS mean_pixel,
           |  CAST(CASE WHEN h = 1 THEN 1 ELSE 2 END AS INT) AS n_filter_kinds
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Entropy-coded-container decode end-to-end: payload → real GIF89a →
    * LZW dictionary rebuild + palette lookup → mean pixel / max index. The
    * oracle reproduces the pixel arithmetic from the document text (16-wide
    * index rows, zero-padded tail, identity grayscale palette), so the hash
    * only matches if the whole LZW round-trip is byte-exact.
    */
  val q142GifDecode = GraftQuery(
    "q142_gif_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentGif(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("gif_w"), col("gif_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("max_idx"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 15) // 16) AS h,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum,
           |    COALESCE(list_max(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(16 AS INT) AS gif_w, CAST(h AS INT) AS gif_h,
           |  round(bytesum::DOUBLE / (h * 16), 6) AS mean_pixel,
           |  CAST(mx AS INT) AS max_idx
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Perceptual image dedup end-to-end: payload → real BMP → pixel decode →
    * 64-bit dHash → nearest neighbor by Hamming distance. This is the
    * image-side near-dup operator (byte-exact dedup misses re-encoded
    * images; the gradient hash doesn't), wired through the same decoded
    * pixels q131 extracts. The oracle reproduces the 9×8 grid sampling and
    * bit packing from the document text, building the hash in HUGEINT and
    * wrapping to signed 64-bit explicitly (bit 63 overflows a BIGINT
    * shift).
    *
    * Scale: hashing is map-only; the exact NN pairing here is the bounded
    * ground-truth form (q28's pattern) — the Hamming-banded scale path is
    * registered as q156 below.
    */
  val q151PerceptualDedup = GraftQuery(
    "q151_perceptual_dedup",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 100))
        .as[MediaRow]
      val sh = decodePerceptual(media).toDF().persist()
      val pairs = sh.select(col("doc_id").as("vid"), col("dhash").as("ha"))
        .join(sh.select(col("doc_id").as("cid"), col("dhash").as("hb")),
          col("vid") =!= col("cid"))
        .withColumn("ham", bit_count(col("ha").bitwiseXOR(col("hb"))))
      // argmin via max(struct): min hamming, ties to the smaller cid —
      // partial-agg collapses the pair rows before the shuffle (q28 shape)
      pairs.groupBy("vid")
        .agg(max(struct((-col("ham")).as("negham"), (-col("cid")).as("negcid"),
          col("ha").as("h"))).as("best"))
        .select(col("vid").as("doc_id"), col("best.h").as("dhash"),
          (-col("best.negcid")).as("nn_id"), (-col("best.negham")).as("ham"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len,
           |    greatest(1, (CAST(length(text) AS INT) + 47) // 48) AS h
           |  FROM documents WHERE doc_id < 100),
           |sh AS (
           |  SELECT doc_id,
           |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
           |         THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS dhash
           |  FROM (
           |    SELECT doc_id, CAST(list_sum(flatten(list_transform(range(0, 8), row ->
           |      list_transform(range(0, 8), c ->
           |        CASE WHEN
           |          (CASE WHEN ((row*h)//8)*48 + (((c+1)*16)//9)*3 + 1 <= len
           |            THEN ascii(substr(text, CAST(((row*h)//8)*48 + (((c+1)*16)//9)*3 + 1 AS INT), 1))
           |            ELSE 0 END)
           |          >
           |          (CASE WHEN ((row*h)//8)*48 + ((c*16)//9)*3 + 1 <= len
           |            THEN ascii(substr(text, CAST(((row*h)//8)*48 + ((c*16)//9)*3 + 1 AS INT), 1))
           |            ELSE 0 END)
           |        THEN 1::HUGEINT << CAST(row*8 + c AS INT) ELSE 0::HUGEINT END)))) AS HUGEINT) AS s
           |    FROM t)),
           |p AS (SELECT a.doc_id vid, a.dhash ha, b.doc_id cid,
           |    bit_count(xor(a.dhash, b.dhash)) ham
           |  FROM sh a, sh b WHERE a.doc_id <> b.doc_id),
           |r AS (SELECT vid, ha, cid, ham,
           |  row_number() OVER (PARTITION BY vid ORDER BY ham, cid) rn FROM p)
           |SELECT vid AS doc_id, ha AS dhash, cid AS nn_id, CAST(ham AS BIGINT) AS ham
           |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin))

  /** Hamming-banded perceptual near-dup pairs — q151's SCALE path,
    * registered: the 64-bit dHash splits into 4×16-bit bands, and by
    * pigeonhole two hashes within Hamming distance 3 MUST agree on at
    * least one whole band — so candidates come from an EQUI-join on
    * (band, key) buckets (q76's SimHash recipe) and the exact Hamming
    * verify runs on candidates only. Recall at ham ≤ 3 is therefore
    * exact, which is what the oracle proves: it brute-forces all pairs
    * (bounded fixture) and the banded pair set must equal it.
    *
    * Scale: decode + hash are map-only; the only shuffles are the keyed
    * band join and the candidate distinct — no all-pairs stage anywhere
    * (PlanShapeSpec pins non-cartesian). Band buckets over near-uniform
    * hashes stay tiny; a pathological constant-image corpus would hot-spot
    * a bucket, which AQE skew-join splits like any other keyed join.
    */
  val q156BandedPerceptualPairs = GraftQuery(
    "q156_banded_perceptual_pairs",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 200))
        .as[MediaRow]
      val sh = decodePerceptual(media).toDF()
        .select(col("doc_id"), col("dhash")).persist()
      val bands = sh.select(col("doc_id"), col("dhash"),
          explode(array((0 until 4).map(b => struct(lit(b).as("band"),
            shiftrightunsigned(col("dhash"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("dhash"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = bands
        .select(col("doc_id").as("i"), col("dhash").as("ha"),
          col("band"), col("key"))
        .join(bands.select(col("doc_id").as("j"), col("dhash").as("hb"),
          col("band"), col("key")), Seq("band", "key"))
        .filter(col("i") < col("j"))
        .select("i", "j", "ha", "hb").distinct()
      cand
        .withColumn("ham", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("ham") <= 3)
        .select(col("i"), col("j"), col("ham"))
        .orderBy("i", "j")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len,
           |    greatest(1, (CAST(length(text) AS INT) + 47) // 48) AS h
           |  FROM documents WHERE doc_id < 200),
           |sh AS (
           |  SELECT doc_id,
           |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
           |         THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS dhash
           |  FROM (
           |    SELECT doc_id, CAST(list_sum(flatten(list_transform(range(0, 8), row ->
           |      list_transform(range(0, 8), c ->
           |        CASE WHEN
           |          (CASE WHEN ((row*h)//8)*48 + (((c+1)*16)//9)*3 + 1 <= len
           |            THEN ascii(substr(text, CAST(((row*h)//8)*48 + (((c+1)*16)//9)*3 + 1 AS INT), 1))
           |            ELSE 0 END)
           |          >
           |          (CASE WHEN ((row*h)//8)*48 + ((c*16)//9)*3 + 1 <= len
           |            THEN ascii(substr(text, CAST(((row*h)//8)*48 + ((c*16)//9)*3 + 1 AS INT), 1))
           |            ELSE 0 END)
           |        THEN 1::HUGEINT << CAST(row*8 + c AS INT) ELSE 0::HUGEINT END)))) AS HUGEINT) AS s
           |    FROM t)),
           |p AS (SELECT a.doc_id i, b.doc_id j,
           |    bit_count(xor(a.dhash, b.dhash)) ham
           |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
           |SELECT i, j, CAST(ham AS BIGINT) AS ham FROM p WHERE ham <= 3
           |ORDER BY i, j""".stripMargin))

  final case class JpegColorContent(doc_id: Long, n_bytes: Int, jpg_w: Int,
      jpg_h: Int, mean_rgb: Double, max_channel: Int)

  /** COLOR decode through the full 3-component path: payload → real 4:4:4
    * JFIF (luma = flat payload blocks, chroma = flat neutral 128) →
    * interleaved-MCU Huffman decode → YCbCr→RGB. Neutral chroma makes
    * R = G = B = payload byte exactly, so the oracle stays closed-form
    * while the decode exercises three DC predictor chains and the color
    * conversion.
    */
  def decodeContentJpegColor(media: Dataset[MediaRow]): Dataset[JpegColorContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = JpegCodec.decodeColorPixels(JpegCodec.encodeColor(r.payload))
          .getOrElse(throw new IllegalStateException("color JPEG roundtrip failed"))
        var psum = 0L
        var mx = 0
        rgb.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
        JpegColorContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / rgb.length, mx)
      }
    }
  }

  /** PROGRESSIVE (SOF2) sibling of [[decodeContentJpeg]]: the same flat
    * payload blocks delivered through four successive-approximation scans
    * (DC first at Al = 1, AC band 1..63 with EOB runs, DC refinement bits,
    * AC refinement) instead of one sequential scan. Exact under the same
    * q_DC = 8 trick, so the q159 oracle closed form carries over unchanged
    * while the hash proves all four scan decoders and the coefficient
    * accumulation across scans.
    */
  def decodeContentJpegProgressive(media: Dataset[MediaRow]): Dataset[JpegContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JpegCodec.decodeProgressivePixels(
          JpegCodec.encodeProgressive(r.payload))
          .getOrElse(throw new IllegalStateException("progressive JPEG roundtrip failed"))
        var psum = 0L
        var mx = 0
        px.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
        JpegContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, mx)
      }
    }
  }

  /** ARITHMETIC-coded (SOF9) sibling of [[decodeContentJpeg]]: the same
    * flat payload blocks entropy-coded with the T.81 Annex D QM-coder
    * instead of Huffman. Exact under the same q_DC = 8 trick, so the q159
    * oracle closed form carries over while the hash proves the QM decoder,
    * the Annex F DC/AC statistical models, and the DAC conditioning path.
    */
  def decodeContentJpegArith(media: Dataset[MediaRow]): Dataset[JpegContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JpegCodec.decodeArithPixels(JpegCodec.encodeArith(r.payload))
          .getOrElse(throw new IllegalStateException("arithmetic JPEG roundtrip failed"))
        var psum = 0L
        var mx = 0
        px.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
        JpegContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, mx)
      }
    }
  }

  final case class VideoFrame(doc_id: Long, frame_id: Int, frame_w: Int,
      frame_h: Int, mean_pixel: Double, max_gray: Int)

  /** One-to-many REAL video frame extraction: payload → MJPEG AVI →
    * RIFF/hdrl/movi/idx1 walk → per-frame full JPEG decode → one row per
    * frame. The real form of the q62 stub sampler: every row comes out of
    * a complete entropy-coded image inside a validated container.
    */
  def decodeContentMjpegFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, frames) = MjpegAviCodec.decodeFrames(MjpegAviCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("MJPEG AVI roundtrip failed"))
        frames.iterator.zipWithIndex.map { case (px, f) =>
          var psum = 0L
          var mx = 0
          px.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
          VideoFrame(r.doc_id, f, w, h, psum.toDouble / px.length, mx)
        }
      }
    }
  }

  /** 4:2:0 sibling of [[decodeContentJpegColor]]: the subsampled-MCU
    * geometry (2×2 luma + 1 Cb + 1 Cr) with nearest-neighbor chroma
    * upsampling, exact under flat neutral chroma.
    */
  def decodeContentJpeg420(media: Dataset[MediaRow]): Dataset[JpegColorContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = JpegCodec.decodeColorPixels(JpegCodec.encode420(r.payload))
          .getOrElse(throw new IllegalStateException("4:2:0 JPEG roundtrip failed"))
        var psum = 0L
        var mx = 0
        rgb.foreach { b => val v = b & 0xff; psum += v; if (v > mx) mx = v }
        JpegColorContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / rgb.length, mx)
      }
    }
  }

  /** Transform-coded-container decode end-to-end: payload → real baseline
    * JFIF → Huffman + dequant + IDCT → mean pixel / max gray. The flat
    * DC-only encoding with q_DC = 8 is the point where JPEG's lossy
    * transform is exactly invertible (quantized DC = v − 128, an integer;
    * the IDCT of a DC-only block is constant to 1 ulp, far inside the
    * round-to-int margin), so the oracle reproduces the decoded pixels in
    * closed form from the document text — the hash only matches if the
    * entropy decode, dequant, and IDCT are all byte-exact. The general
    * lossy path (full FDCT, run-length AC) is JpegCodecSpec's ≤1-LSB
    * round-trip property.
    */
  val q159JpegDecode = GraftQuery(
    "q159_jpeg_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentJpeg(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("jpg_w"), col("jpg_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("max_gray"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 3) // 4) AS nrows,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum,
           |    COALESCE(list_max(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(32 AS INT) AS jpg_w, CAST(nrows * 8 AS INT) AS jpg_h,
           |  round(bytesum::DOUBLE / (nrows * 4), 6) AS mean_pixel,
           |  CAST(mx AS INT) AS max_gray
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Progressive-JPEG decode end-to-end: the q159 payload through a
    * four-scan SOF2 container — spectral selection (DC scan, AC band
    * 1..63), successive approximation (Al = 1 first passes, refinement
    * bits), EOBRUN codes chunked so several appear per scan. The flat
    * exactness trick makes the oracle identical to q159's closed form;
    * matching hashes prove the multi-scan coefficient accumulation, the
    * custom EOBn Huffman table, and the G.1.2.3 refinement walk. The
    * general-content refinement paths (newly-nonzero codes, correction
    * bits) are JpegProgressiveSpec's cross-validated property.
    */
  val q170JpegProgressiveDecode = GraftQuery(
    "q170_jpeg_progressive_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentJpegProgressive(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("jpg_w"), col("jpg_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("max_gray"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 3) // 4) AS nrows,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum,
           |    COALESCE(list_max(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(32 AS INT) AS jpg_w, CAST(nrows * 8 AS INT) AS jpg_h,
           |  round(bytesum::DOUBLE / (nrows * 4), 6) AS mean_pixel,
           |  CAST(mx AS INT) AS max_gray
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Arithmetic-JPEG decode end-to-end — closes the SOF9 branch the round-7
    * verdict listed as the remaining codec boundary. Same closed-form
    * oracle as q159: the hash only matches if the QM-coder (carry/stuffing
    * byte discipline included), the adaptive statistical models, dequant,
    * and IDCT are all byte-exact. General-content entropy round-trip and
    * compression-beats-Huffman are JpegArithSpec properties.
    */
  val q268JpegArithDecode = GraftQuery(
    "q268_jpeg_arith_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentJpegArith(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("jpg_w"), col("jpg_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("max_gray"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 3) // 4) AS nrows,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum,
           |    COALESCE(list_max(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(32 AS INT) AS jpg_w, CAST(nrows * 8 AS INT) AS jpg_h,
           |  round(bytesum::DOUBLE / (nrows * 4), 6) AS mean_pixel,
           |  CAST(mx AS INT) AS max_gray
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Video frame extraction end-to-end: payload → real Motion-JPEG AVI →
    * container walk + per-frame JPEG decode → one row PER FRAME. The hash
    * only matches if the RIFF/hdrl parsing, movi chunk walk, idx1
    * validation, and every frame's full Huffman→dequant→IDCT are all
    * byte-exact — per-frame means are closed-form over the 8-byte payload
    * slices (zero-padded last frame included).
    */
  val q270MjpegFrames = GraftQuery(
    "q270_mjpeg_frames",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentMjpegFrames(media).toDF()
        .select(col("doc_id"), col("frame_id"), col("frame_w"), col("frame_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("max_gray"))
        .orderBy("doc_id", "frame_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |f AS (
           |  SELECT doc_id, text, len, greatest(1, (len + 7) // 8) AS nf
           |  FROM t),
           |x AS (
           |  SELECT doc_id, text, len,
           |    unnest(range(0, CAST(nf AS INT))) AS fid
           |  FROM f),
           |s AS (
           |  SELECT doc_id, fid,
           |    COALESCE(list_sum(list_transform(
           |      range(CAST(fid * 8 + 1 AS INT), CAST(least(len, fid * 8 + 8) + 1 AS INT)),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bsum,
           |    COALESCE(list_max(list_transform(
           |      range(CAST(fid * 8 + 1 AS INT), CAST(least(len, fid * 8 + 8) + 1 AS INT)),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM x)
           |SELECT doc_id, CAST(fid AS INT) AS frame_id,
           |  CAST(32 AS INT) AS frame_w, CAST(16 AS INT) AS frame_h,
           |  round(bsum::DOUBLE / 8, 6) AS mean_pixel, CAST(mx AS INT) AS max_gray
           |FROM s ORDER BY doc_id, frame_id""".stripMargin))

  /** REAL media-file INGESTION through Spark's built-in `binaryFile`
    * source — the canonical way a multimodal pipeline lands image/audio
    * FILES (one row per file: path + length + binary content): one
    * genuine FLAC file is written per document, the directory is
    * ingested with `spark.read.format("binaryFile")`, and every file's
    * bytes decode through [[FlacCodec]] inside mapPartitions — so the
    * hash proves the WHOLE chain: file write → source scan (content
    * fidelity, path→id parsing) → codec decode. The oracle is q269's
    * closed form (losslessness again — no container state leaks into the
    * metrics).
    *
    * The file planting is driver-side FIXTURE SETUP (50 bounded files
    * under WorkDir — on a cluster the media files already sit on shared
    * storage); the OPERATOR under test is the binaryFile scan plus
    * executor-side decode. Scale note: binaryFile packs many small files
    * per task (spark.sql.files.maxPartitionBytes) — the small-file cost
    * is exactly why a pipeline converts landed media into the parquet
    * payload tables every other multimodal query here reads.
    */
  val q271BinaryIngest = GraftQuery(
    "q271_binary_ingest",
    (s, dir) => {
      import s.implicits._
      val base = graft.WorkDir.resolve(s, "binary_ingest", dir)
      val mediaDir = new java.io.File(s"$base/flac")
      // listFiles is null when the path is a plain file or unreadable —
      // delete whatever sits there and start from an empty directory
      if (mediaDir.exists)
        Option(mediaDir.listFiles).getOrElse(Array.empty).foreach(_.delete())
      if (mediaDir.isFile) mediaDir.delete()
      mediaDir.mkdirs()
      Tables.documents(s, dir).filter(col("doc_id") < 50)
        .select("doc_id", "text").collect() // bounded 50-row fixture write
        .foreach { r =>
          val id = r.getLong(0)
          val payload = Option(r.getString(1)).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(mediaDir.getPath, f"doc_$id%05d.flac"),
            FlacCodec.encode(payload))
        }
      s.read.format("binaryFile").load(mediaDir.getPath)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (path, content) =>
            val stem = path.substring(path.lastIndexOf('/') + 1)
            val id = stem.stripPrefix("doc_").stripSuffix(".flac").toLong
            val samples = FlacCodec.decodeSamples(content).getOrElse(
              throw new IllegalStateException(s"FLAC ingest decode failed: $path"))
            var sq = 0L; var mx = 0; var ck = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i)
              sq += v.toLong * v
              if (math.abs(v.toInt) > mx) mx = math.abs(v.toInt)
              ck += (i + 1).toLong * v
              i += 1
            }
            (id, samples.length,
              math.sqrt(sq.toDouble / samples.length), mx, ck)
          }
        }
        .toDF("doc_id", "n_samples", "rms_amplitude", "max_abs", "checksum")
        .select(col("doc_id"), col("n_samples"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"),
          col("max_abs"), col("checksum"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |c AS (
           |  SELECT doc_id, len, greatest(1, len) AS n,
           |    CASE WHEN len = 0 THEN [0]
           |         ELSE list_transform(range(1, len + 1),
           |           i -> (ascii(substr(text, CAST(i AS INT), 1)) - 128) * 256)
           |    END AS ss
           |  FROM t)
           |SELECT doc_id, CAST(n AS INT) AS n_samples,
           |  round(sqrt(list_sum(list_transform(ss, x -> x * x))::DOUBLE / n), 6)
           |    AS rms_amplitude,
           |  CAST(list_max(list_transform(ss, x -> abs(x))) AS INT) AS max_abs,
           |  CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)),
           |    j -> j * ss[CAST(j AS INT)])) AS BIGINT) AS checksum
           |FROM c ORDER BY doc_id""".stripMargin))

  final case class ResampledAudio(doc_id: Long, n_in: Int, n_out: Int,
      rms_amplitude: Double, max_abs: Int, checksum: Long)

  /** Decode → resample composition: μ-law-expanded PCM decimated 2:1
    * through the 3-tap [1, 2, 1]/4 anti-alias filter, y[j] =
    * ⌊(x[2j−1] + 2·x[2j] + x[2j+1]) / 4⌋ — the sample-rate normalization
    * every audio ingest pipeline runs before feature extraction (filter
    * first, THEN drop samples, or the dropped half aliases into the kept
    * band). floorDiv keeps the filter integer-exact for negative samples,
    * so the per-sample outputs are closed-form from the payload bytes and
    * the checksum Σ j·y[j] pins every output sample and its position.
    * Map-only, partition-parallel, payloads never on the driver.
    */
  def resampleContentMuLaw(media: Dataset[MediaRow]): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val x = MuLawCodec.decodeSamples(MuLawCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("mu-law roundtrip failed"))
        val n = x.length
        val m = (n - 1) / 2
        var sq = 0L; var mx = 0; var ck = 0L
        var j = 0
        while (j < m) {
          val y = Math.floorDiv(x(2 * j).toInt + 2 * x(2 * j + 1) + x(2 * j + 2), 4)
          sq += y.toLong * y
          if (math.abs(y) > mx) mx = math.abs(y)
          ck += (j + 1).toLong * y
          j += 1
        }
        ResampledAudio(r.doc_id, n, m,
          if (m == 0) 0.0 else math.sqrt(sq.toDouble / m), mx, ck)
      }
    }
  }

  /** Anti-aliased 2:1 audio decimation after μ-law decode (see
    * [[resampleContentMuLaw]]). The oracle expands the same μ-law curve in
    * closed form per byte (q160's construction), applies the identical
    * [1,2,1]/4 floor-division filter over the 1-based sample list, and
    * checks RMS, peak, and the position-weighted checksum — bit-exact but
    * for the one rounded sqrt.
    */
  val q175AudioResample = GraftQuery(
    "q175_audio_resample",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      resampleContentMuLaw(media).toDF()
        .filter(col("n_out") > 0)
        .select(col("doc_id"), col("n_in"), col("n_out"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"),
          col("max_abs"), col("checksum"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |c AS (
           |  SELECT doc_id, len, greatest(1, len) AS n,
           |    CASE WHEN len = 0 THEN [0]
           |         ELSE list_transform(range(1, len + 1),
           |           i -> ascii(substr(text, CAST(i AS INT), 1))) END AS codes
           |  FROM t),
           |e AS (
           |  SELECT doc_id, len, n,
           |    list_transform(codes, b -> CASE WHEN (255 - b) >= 128
           |      THEN 132 - (((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8))
           |      ELSE (((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8)) - 132
           |      END) AS ss
           |  FROM c),
           |y AS (
           |  SELECT doc_id, n, (n - 1) // 2 AS m,
           |    list_transform(range(1, (n - 1) // 2 + 1),
           |      j -> CAST(floor((ss[CAST(2*j-1 AS INT)] + 2*ss[CAST(2*j AS INT)]
           |        + ss[CAST(2*j+1 AS INT)]) / 4.0) AS BIGINT)) AS ys
           |  FROM e)
           |SELECT doc_id, CAST(n AS INT) AS n_in, CAST(m AS INT) AS n_out,
           |  round(sqrt(list_sum(list_transform(ys, v -> v * v))::DOUBLE / m), 6)
           |    AS rms_amplitude,
           |  CAST(list_max(list_transform(ys, v -> abs(v))) AS INT) AS max_abs,
           |  CAST(list_sum(list_transform(range(1, CAST(m+1 AS INT)),
           |    j -> j * ys[CAST(j AS INT)])) AS BIGINT) AS checksum
           |FROM y WHERE m > 0 ORDER BY doc_id""".stripMargin))

  /** Compressed-audio decode end-to-end: payload → real format-7 μ-law WAV
    * → G.711 expansion → RMS / peak amplitude. Every code byte expands
    * through exact integer arithmetic (memoryless, so the oracle is CLOSED
    * FORM per byte — contrast q169, where the predictive ADPCM state forces
    * a recursive-CTE replay), so the hash only matches if the chunk walk,
    * format validation, and the full 16-segment expansion curve are
    * byte-exact.
    */
  val q160MulawDecode = GraftQuery(
    "q160_mulaw_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentMuLaw(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_samples"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"), col("max_abs"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |c AS (
           |  SELECT doc_id, len, greatest(1, len) AS n,
           |    CASE WHEN len = 0 THEN [0]
           |         ELSE list_transform(range(1, len + 1),
           |           i -> ascii(substr(text, CAST(i AS INT), 1))) END AS codes
           |  FROM t),
           |e AS (
           |  SELECT doc_id, len, n,
           |    list_transform(codes, b -> CASE WHEN (255 - b) >= 128
           |      THEN 132 - (((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8))
           |      ELSE (((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8)) - 132
           |      END) AS ss
           |  FROM c)
           |SELECT doc_id, len AS n_bytes, CAST(n AS INT) AS n_samples,
           |  round(sqrt(list_sum(list_transform(ss, x -> x * x))::DOUBLE / n), 6)
           |    AS rms_amplitude,
           |  CAST(list_max(list_transform(ss, x -> abs(x))) AS INT) AS max_abs
           |FROM e ORDER BY doc_id""".stripMargin))

  /** Lossless-audio decode end-to-end: payload → 16-bit PCM → real FLAC
    * (fixed-blocking frames, best-fixed-order predictors, Rice residuals,
    * CRC-8/CRC-16) → full decode. Losslessness makes the oracle CLOSED
    * FORM — decoded samples ARE the input PCM — so the hash only matches
    * if frame sync, UTF-8 frame numbers, both CRCs, subframe headers,
    * Rice unary/remainder bits, and all predictor reconstructions are
    * bit-exact across every frame boundary (the position-weighted
    * checksum pins cross-frame sample order).
    */
  val q269FlacDecode = GraftQuery(
    "q269_flac_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentFlac(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_samples"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"),
          col("max_abs"), col("checksum"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |c AS (
           |  SELECT doc_id, len, greatest(1, len) AS n,
           |    CASE WHEN len = 0 THEN [0]
           |         ELSE list_transform(range(1, len + 1),
           |           i -> (ascii(substr(text, CAST(i AS INT), 1)) - 128) * 256)
           |    END AS ss
           |  FROM t)
           |SELECT doc_id, len AS n_bytes, CAST(n AS INT) AS n_samples,
           |  round(sqrt(list_sum(list_transform(ss, x -> x * x))::DOUBLE / n), 6)
           |    AS rms_amplitude,
           |  CAST(list_max(list_transform(ss, x -> abs(x))) AS INT) AS max_abs,
           |  CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)),
           |    j -> j * ss[CAST(j AS INT)])) AS BIGINT) AS checksum
           |FROM c ORDER BY doc_id""".stripMargin))

  /** Predictive-audio decode end-to-end: payload → real format-0x11 IMA
    * ADPCM WAV → adaptive-predictor reconstruction → RMS / peak / final
    * predictor. Each sample depends on the ENTIRE nibble history through
    * the (predictor, step-index) state pair, so the oracle replays the
    * recurrence with a recursive CTE over the nibble sequence (low nibble
    * first, exactly the WAV bit layout) — the hash only matches if the
    * chunk walk, block-header parse, step/index tables, shift-sum diff
    * reconstruction, and both clamps are all bit-exact over every step.
    */
  val q169AdpcmDecode = GraftQuery(
    "q169_adpcm_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentAdpcm(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_samples"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"),
          col("max_abs"), col("end_pred"))
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |c AS (
           |  SELECT doc_id, len,
           |    CASE WHEN len = 0 THEN [0]
           |         ELSE list_transform(range(1, len + 1),
           |           i -> ascii(substr(text, CAST(i AS INT), 1))) END AS codes
           |  FROM t),
           |nb AS (
           |  SELECT doc_id, len,
           |    flatten(list_transform(codes, b -> [b % 16, b // 16])) AS nibs
           |  FROM c),
           |st AS (SELECT [7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
           |    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
           |    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
           |    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
           |    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
           |    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
           |    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
           |    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
           |    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767] AS s),
           |dec AS (
           |  SELECT doc_id, 0 AS k, 0 AS pred, 0 AS idx,
           |    CAST(0 AS BIGINT) AS sq, 0 AS mx
           |  FROM nb
           |  UNION ALL
           |  SELECT d.doc_id, d.k + 1,
           |    least(32767, greatest(-32768, d.pred
           |      + (1 - 2 * (nb.nibs[d.k + 1] // 8))
           |      * (st.s[d.idx + 1] // 8
           |        + (nb.nibs[d.k + 1] % 2) * (st.s[d.idx + 1] // 4)
           |        + ((nb.nibs[d.k + 1] // 2) % 2) * (st.s[d.idx + 1] // 2)
           |        + ((nb.nibs[d.k + 1] // 4) % 2) * st.s[d.idx + 1]))),
           |    least(88, greatest(0, d.idx
           |      + [-1, -1, -1, -1, 2, 4, 6, 8][(nb.nibs[d.k + 1] % 8) + 1])),
           |    d.sq + CAST(least(32767, greatest(-32768, d.pred
           |      + (1 - 2 * (nb.nibs[d.k + 1] // 8))
           |      * (st.s[d.idx + 1] // 8
           |        + (nb.nibs[d.k + 1] % 2) * (st.s[d.idx + 1] // 4)
           |        + ((nb.nibs[d.k + 1] // 2) % 2) * (st.s[d.idx + 1] // 2)
           |        + ((nb.nibs[d.k + 1] // 4) % 2) * st.s[d.idx + 1])))
           |      AS BIGINT) * least(32767, greatest(-32768, d.pred
           |      + (1 - 2 * (nb.nibs[d.k + 1] // 8))
           |      * (st.s[d.idx + 1] // 8
           |        + (nb.nibs[d.k + 1] % 2) * (st.s[d.idx + 1] // 4)
           |        + ((nb.nibs[d.k + 1] // 2) % 2) * (st.s[d.idx + 1] // 2)
           |        + ((nb.nibs[d.k + 1] // 4) % 2) * st.s[d.idx + 1]))),
           |    greatest(d.mx, abs(least(32767, greatest(-32768, d.pred
           |      + (1 - 2 * (nb.nibs[d.k + 1] // 8))
           |      * (st.s[d.idx + 1] // 8
           |        + (nb.nibs[d.k + 1] % 2) * (st.s[d.idx + 1] // 4)
           |        + ((nb.nibs[d.k + 1] // 2) % 2) * (st.s[d.idx + 1] // 2)
           |        + ((nb.nibs[d.k + 1] // 4) % 2) * st.s[d.idx + 1])))))
           |  FROM dec d JOIN nb ON nb.doc_id = d.doc_id, st
           |  WHERE d.k < len(nb.nibs)),
           |fin AS (
           |  SELECT d.doc_id, nb.len, len(nb.nibs) AS nn, d.pred, d.sq, d.mx
           |  FROM dec d JOIN nb ON nb.doc_id = d.doc_id
           |  WHERE d.k = len(nb.nibs))
           |SELECT doc_id, len AS n_bytes, CAST(nn + 1 AS INT) AS n_samples,
           |  round(sqrt(sq::DOUBLE / (nn + 1)), 6) AS rms_amplitude,
           |  CAST(mx AS INT) AS max_abs, CAST(pred AS INT) AS end_pred
           |FROM fin ORDER BY doc_id""".stripMargin))

  /** Resize after decode end-to-end: payload → real BMP → pixel decode →
    * 8×8 nearest-neighbor thumbnail → mean/min/max. The oracle reproduces
    * the floor-mapping sample grid from the document text (byte at
    * sy·48 + sx, zero past the payload), so the hash only matches if the
    * decode AND the resample index arithmetic are exact.
    */
  val q162ImageResize = GraftQuery(
    "q162_image_resize",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeResized(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("src_h"),
          round(col("rs_mean"), 6).as("rs_mean"), col("rs_min"), col("rs_max"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len,
           |    greatest(1, (CAST(length(text) AS INT) + 47) // 48) AS h
           |  FROM documents WHERE doc_id < 50),
           |s AS (
           |  SELECT doc_id, len, h,
           |    flatten(list_transform(range(0, 8), y ->
           |      list_transform(range(0, 8), x ->
           |        CASE WHEN ((y * h) // 8) * 48 + (x * 48) // 8 + 1 <= len
           |          THEN ascii(substr(text,
           |            CAST(((y * h) // 8) * 48 + (x * 48) // 8 + 1 AS INT), 1))
           |          ELSE 0 END))) AS thumb
           |  FROM t)
           |SELECT doc_id, len AS n_bytes, CAST(h AS INT) AS src_h,
           |  round(list_sum(thumb)::DOUBLE / 64, 6) AS rs_mean,
           |  CAST(list_min(thumb) AS INT) AS rs_min,
           |  CAST(list_max(thumb) AS INT) AS rs_max
           |FROM s ORDER BY doc_id""".stripMargin))

  /** Color-JPEG decode end-to-end: the 3-component 4:4:4 path (interleaved
    * MCUs, three DC predictor chains, YCbCr→RGB) under the oracle gate.
    * Neutral chroma keeps the lossy pipeline exactly invertible, so mean
    * RGB = mean payload byte and max channel = max byte — same closed
    * forms as q159 over three channels.
    */
  val q165JpegColorDecode = GraftQuery(
    "q165_jpeg_color_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentJpegColor(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("jpg_w"), col("jpg_h"),
          round(col("mean_rgb"), 6).as("mean_rgb"), col("max_channel"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 3) // 4) AS nrows,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum,
           |    COALESCE(list_max(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(32 AS INT) AS jpg_w, CAST(nrows * 8 AS INT) AS jpg_h,
           |  round(bytesum::DOUBLE / (nrows * 4), 6) AS mean_rgb,
           |  CAST(mx AS INT) AS max_channel
           |FROM b ORDER BY doc_id""".stripMargin))

  /** SUBSAMPLED (4:2:0) JPEG decode end-to-end — the MCU geometry virtually
    * every camera JPEG ships: 2×2 luma blocks + one Cb + one Cr per MCU,
    * three predictor chains, chroma upsampling, YCbCr→RGB. Flat neutral
    * chroma keeps the whole lossy pipeline exactly invertible; luma block
    * rows pad to EVEN so MCUs tile, which the oracle mirrors in its row
    * count.
    */
  val q166Jpeg420Decode = GraftQuery(
    "q166_jpeg420_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentJpeg420(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("jpg_w"), col("jpg_h"),
          round(col("mean_rgb"), 6).as("mean_rgb"), col("max_channel"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 3) // 4)
           |      + (greatest(1, (len + 3) // 4) % 2) AS nrows,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum,
           |    COALESCE(list_max(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS mx
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(32 AS INT) AS jpg_w, CAST(nrows * 8 AS INT) AS jpg_h,
           |  round(bytesum::DOUBLE / (nrows * 4), 6) AS mean_rgb,
           |  CAST(mx AS INT) AS max_channel
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Post-decode luminance histogram (16 bins of 16 gray levels) across
    * the image corpus — the feature-extraction step after q131's decode
    * that real curation filters read (all-black/all-white detection,
    * exposure outliers, near-constant screenshots). Each payload round-
    * trips through the REAL BMP container ([[BmpCodec]] encode→decode),
    * the per-image histogram folds map-side inside mapPartitions (≤16
    * rows leave each image regardless of pixel count — the shuffle is
    * bins × docs, never pixels), and the global agg sums per-bin counts
    * plus how many distinct images touch the bin. The oracle reproduces
    * the pixel arithmetic from the document text (q131's encode-side
    * mapping: 48-byte rows, zero-padded tail ⇒ padding lands in bin 0),
    * so the hash only matches if the container round-trip is byte-exact.
    */
  val q197ImageHistogram = GraftQuery(
    "q197_image_histogram",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      val perDoc = media.mapPartitions { rows =>
        rows.flatMap { r =>
          val (_, _, px) = BmpCodec.decodePixels(BmpCodec.encode(r.payload))
            .getOrElse(throw new IllegalStateException("BMP roundtrip failed"))
          val counts = new Array[Long](16)
          px.foreach(b => counts((b & 0xff) >> 4) += 1)
          counts.iterator.zipWithIndex
            .collect { case (c, bin) if c > 0 => (r.doc_id, bin, c) }
        }
      }.toDF("doc_id", "bin", "cnt")
      perDoc.groupBy("bin")
        .agg(sum("cnt").as("n_pixels"), count(lit(1)).as("n_docs"))
        .orderBy("bin")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (SELECT doc_id, text, len,
           |    greatest(1, (len + 47) // 48) AS h FROM t),
           |chars AS (
           |  SELECT doc_id, unnest(list_transform(range(1, len + 1),
           |    i -> ascii(substr(text, CAST(i AS INT), 1)) // 16)) AS bin
           |  FROM b),
           |perchar AS (
           |  SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS cnt
           |  FROM chars GROUP BY 1, 2),
           |pad AS (
           |  SELECT doc_id, 0 AS bin, CAST(h * 48 - len AS BIGINT) AS cnt
           |  FROM b WHERE h * 48 - len > 0),
           |perdoc AS (
           |  SELECT doc_id, bin, sum(cnt) AS c
           |  FROM (SELECT * FROM perchar UNION ALL SELECT * FROM pad)
           |  GROUP BY 1, 2)
           |SELECT CAST(bin AS INT) AS bin, CAST(sum(c) AS BIGINT) AS n_pixels,
           |  CAST(count(*) AS BIGINT) AS n_docs
           |FROM perdoc GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q32MultimodalMeta, q62MultimodalFrames,
    q131MultimodalDecode, q140PngDecode, q142GifDecode, q151PerceptualDedup,
    q156BandedPerceptualPairs, q159JpegDecode, q160MulawDecode, q162ImageResize,
    q165JpegColorDecode, q166Jpeg420Decode, q169AdpcmDecode,
    q170JpegProgressiveDecode, q175AudioResample, q197ImageHistogram,
    q268JpegArithDecode, q269FlacDecode, q270MjpegFrames, q271BinaryIngest)
}
