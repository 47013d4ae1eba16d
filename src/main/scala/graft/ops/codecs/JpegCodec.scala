package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

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
  * JFIF YCbCr → RGB). Subsampled 4:2:0 color is handled by
  * `decodeColorPixels`' MCU geometry; progressive (SOF2) lives in
  * [[JpegProgressive]] and arithmetic (SOF9) in [[JpegArith]] (both build
  * on this object's shared tables/bit/DCT machinery, split per the
  * file-size discipline); perceptual subband audio by
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
  private[ops] val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[ops] val DcVals = (0 to 11).map(_.toByte).toArray
  private[ops] val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private[ops] val AcVals = Array(
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
  private[ops] val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private[ops] val Cos = Array.tabulate(8, 8)((u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private[ops] val Cn = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

  /** Canonical code assignment (T.81 Annex C): symbol → (code, length). */
  private[ops] def canonical(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
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

  private[ops] final class BitWriter(out: java.io.ByteArrayOutputStream) {
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

  private[ops] def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  /** Magnitude category (number of bits) of a DC diff / AC value. */
  private[ops] def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }
  // value bits: negative values are encoded as v + 2^cat − 1 (F.1.4.1)
  private[ops] def valueBits(v: Int, cat: Int): Int =
    if (v >= 0) v else v + (1 << cat) - 1

  private[ops] def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int,
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

  private[ops] final class DecodeFail extends RuntimeException

  private[ops] final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
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

  private[ops] final class BitReader(p: Array[Byte], var pos: Int) {
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
  private[ops] def extend(v: Int, len: Int): Int =
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

}
