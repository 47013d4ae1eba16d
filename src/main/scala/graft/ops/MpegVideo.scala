package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ops.Multimodal.{attachBinary, MediaRow}

/** REAL motion-compensated transform video: an MPEG-1-class (ISO 11172-2
  * syntax) video elementary stream with I and P pictures — sequence/GOP/
  * picture/slice start codes, macroblock address-increment and type VLCs,
  * differential motion vectors with f_code scaling and the modular wrap,
  * DC-predicted intra blocks through the default intra quantizer matrix,
  * run/level-coded DCT residuals (escape coding) dequantized with the
  * standard's oddification mismatch control, a full separable 8×8 IDCT,
  * and 4:2:0 macroblock motion compensation ONTO a persistent reference
  * frame. This closes the [[Multimodal.FakeCodec]] video role: q278's MRLE
  * proved temporal carry; this adds the two mechanisms that define
  * MPEG/H.26x-class video — per-macroblock MOTION VECTORS (prediction from
  * a displaced region of the reference) and TRANSFORM RESIDUALS on top of
  * that prediction.
  *
  * Scope boundary (same honesty note as [[MpegAudioCodec]]'s prototype
  * window): the bitstream layer implements the ISO 11172-2 syntax with the
  * VLC subset the encoder emits (address increments 1–5, the four
  * commonest macroblock types per picture kind, motion codes 0/±1/±2/±3,
  * the cbp codes for the luma-only and single-block patterns, intra DC
  * size tables in full, AC escape + end-of-block + the run0/±1 codes) —
  * a conformance stream using the deeper Huffman rows would be rejected,
  * not misdecoded; B/D pictures and half-pel interpolation are out of
  * scope (the encoder's full_pel vectors are even, so chroma sampling
  * stays integral). The spec suite pins this decoder against this
  * encoder plus closed-form expectations, not against an external
  * conformance suite.
  *
  * Reference scope note: `/root/reference` has no media path; this family
  * exists for the §2.3 multimodal north star.
  */
object MpegVideoCodec {
  val W = 32
  val H = 32
  val FrameBytes = 8
  private val MaxFrames = 1 << 16

  private final class DecodeFail extends RuntimeException

  // standard zigzag scan order: position k in the scan -> raster index
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var x = 0; var y = 0
    var up = true
    for (k <- 0 until 64) {
      z(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    z
  }

  /** ISO 11172-2 default intra quantizer matrix (raster order). */
  private val IntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  // ---- VLC tables (code string -> value), shared by encoder and decoder

  private val AddrIncCodes: Seq[(String, Int)] = Seq(
    "1" -> 1, "011" -> 2, "010" -> 3, "0011" -> 4, "0010" -> 5)
  // macroblock_type, I pictures: (quant, mc, cbp, intra)
  private val MbTypeI: Seq[(String, (Boolean, Boolean, Boolean, Boolean))] = Seq(
    "1" -> ((false, false, false, true)),
    "01" -> ((true, false, false, true)))
  // macroblock_type, P pictures
  private val MbTypeP: Seq[(String, (Boolean, Boolean, Boolean, Boolean))] = Seq(
    "1" -> ((false, true, true, false)),
    "01" -> ((false, false, true, false)),
    "001" -> ((false, true, false, false)),
    "00011" -> ((false, false, false, true)))
  private val MotionCodes: Seq[(String, Int)] = Seq(
    "1" -> 0, "010" -> 1, "011" -> -1, "0010" -> 2, "0011" -> -2,
    "00010" -> 3, "00011" -> -3)
  private val CbpCodes: Seq[(String, Int)] = Seq(
    "111" -> 60, "1101" -> 4, "1100" -> 8, "1011" -> 16, "1010" -> 32)
  private val DcLumaSize: Seq[(String, Int)] = Seq(
    "100" -> 0, "00" -> 1, "01" -> 2, "101" -> 3, "110" -> 4,
    "1110" -> 5, "11110" -> 6, "111110" -> 7, "1111110" -> 8)
  private val DcChromaSize: Seq[(String, Int)] = Seq(
    "00" -> 0, "01" -> 1, "10" -> 2, "110" -> 3, "1110" -> 4,
    "11110" -> 5, "111110" -> 6, "1111110" -> 7, "11111110" -> 8)

  private def codeOf[A](t: Seq[(String, A)], v: A): String =
    t.find(_._2 == v).get._1

  // ---- bit IO

  private final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >>> i) & 1); i -= 1 }
    }
    def code(s: String): Unit = s.foreach(c => bit(c - '0'))
    def align(): Unit = while (nb != 0) bit(0)
    def startCode(v: Int): Unit = { align(); bits(0, 8); bits(0, 8); bits(1, 8); bits(v, 8) }
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BR(p: Array[Byte]) {
    var pos = 0 // bit position
    private val n = p.length * 8
    def bit(): Int = {
      if (pos >= n) throw new DecodeFail
      val b = (p(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1; b
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = pos = (pos + 7) & ~7
    /** Align and advance to the next 0x000001 prefix; returns the start
      * code value byte, or -1 at end of stream. */
    def nextStartCode(): Int = {
      align()
      var i = pos >>> 3
      while (i + 3 < p.length) {
        if (p(i) == 0 && p(i + 1) == 0 && p(i + 2) == 1) {
          pos = (i + 4) * 8
          return p(i + 3) & 0xff
        }
        i += 1
      }
      pos = n
      -1
    }
    /** The ISO macroblock-loop termination test: the slice ends when the
      * next 23 bits from the CURRENT position are all zero (valid MB data
      * never starts with 23 zeros — that property is why start-code
      * emulation in the middle of escape-coded zero runs can't happen at
      * an MB boundary). End of stream counts as termination (fail-soft).
      */
    def peekZeros23: Boolean = {
      var i = pos
      var k = 0
      while (k < 23) {
        if (i >= n) return true
        if (((p(i >>> 3) >> (7 - (i & 7))) & 1) != 0) return false
        i += 1; k += 1
      }
      true
    }
    def vlc[A](t: Seq[(String, A)]): A = {
      val maxLen = t.map(_._1.length).max
      var s = ""
      while (s.length < maxLen) {
        s += (if (bit() == 1) "1" else "0")
        t.find(_._1 == s) match {
          case Some((_, v)) => return v
          case None =>
        }
      }
      throw new DecodeFail
    }
  }

  // ---- encoder

  private def frameByte(payload: Array[Byte], f: Int): Int =
    if (f * FrameBytes < payload.length) payload(f * FrameBytes) & 0xff else 0

  /** The residual level frame f's MC macroblock carries: payload-driven,
    * nonzero (run/level levels cannot be 0), |L| ≤ 32. */
  def residualLevel(payload: Array[Byte], f: Int): Int = {
    val raw = (frameByte(payload, f) & 63) - 32
    if (raw == 0) 1 else raw
  }

  private def writeDcDiff(w: BW, t: Seq[(String, Int)], diff: Int): Unit = {
    val size = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    w.code(codeOf(t, size))
    if (size > 0) {
      val v = if (diff > 0) diff else diff + (1 << size) - 1
      w.bits(v, size)
    }
  }

  /** DC-only intra block: coded DC level (0..255) against the running
    * predictor, then end-of-block. Returns the new predictor. */
  private def intraBlock(w: BW, t: Seq[(String, Int)], pred: Int,
      level: Int): Int = {
    writeDcDiff(w, t, level - pred)
    w.code("10") // EOB
    level
  }

  /** One motion-vector component: differential d against pred, f_code=5
    * (f=16) — motion_code = sign, motion_r = |d|−1 for |d| ≤ 16,
    * code ±2 with r = |d|−17 for 17 ≤ |d| ≤ 32. */
  private def writeMv(w: BW, d: Int): Unit = {
    if (d == 0) w.code(codeOf(MotionCodes, 0))
    else {
      val mag = math.abs(d)
      val code = (mag + 15) / 16 // 1 for 1..16, 2 for 17..32
      val r = mag - (code - 1) * 16 - 1
      w.code(codeOf(MotionCodes, if (d > 0) code else -code))
      w.bits(r, 4)
    }
  }

  /** Non-intra residual block: one escape-coded (run 0, level L), EOB. */
  private def residualBlock(w: BW, level: Int): Unit = {
    w.code("000001")
    w.bits(0, 6)
    w.bits(level & 0xff, 8) // |level| <= 127, two's complement byte
    w.code("10")
  }

  /** Encode the payload as an MPEG-1-syntax video stream: one I picture,
    * then P pictures. Per P frame f (b = payload byte 8f, s = byte 0):
    * MB0 intra-refreshes to b (DC-coded through the intra matrix), MB1 is
    * SKIPPED (temporal carry of the static s), MB2 is MC-coded — motion
    * vector (+16, −16) predicts from the static MB1 region, plus a DCT
    * residual of level L(b) on each luma block — and MB3 is MC-not-coded
    * with differential vector (−32, 0) against MB2's PMV, reconstructing
    * (−16, −16): a pure displaced copy of the PREVIOUS frame's MB0.
    */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val nf = math.max(1, (payload.length + FrameBytes - 1) / FrameBytes)
    val s = if (payload.nonEmpty) payload(0) & 0xff else 0
    val w = new BW
    w.startCode(0xb3) // sequence header
    w.bits(W, 12); w.bits(H, 12)
    w.bits(1, 4) // pel aspect 1:1
    w.bits(3, 4) // 25 fps
    w.bits(0x3ffff, 18) // variable bit rate
    w.bit(1) // marker
    w.bits(0, 10) // vbv buffer size
    w.bit(0) // constrained flag
    w.bit(0); w.bit(0) // no custom quant matrices
    w.startCode(0xb8) // GOP
    w.bits(0, 25); w.bit(1); w.bit(0) // time code, closed, not broken
    for (f <- 0 until nf) {
      val bf = frameByte(payload, f)
      w.startCode(0x00) // picture
      w.bits(f & 0x3ff, 10)
      w.bits(if (f == 0) 1 else 2, 3) // I / P
      w.bits(0xffff, 16) // vbv_delay
      if (f > 0) { w.bit(1); w.bits(5, 3) } // full_pel, forward_f_code=5
      w.bit(0) // extra_bit_picture
      w.startCode(0x01) // slice, vertical position 1
      w.bits(8, 5) // quantizer_scale
      w.bit(0) // extra_bit_slice
      if (f == 0) {
        // I picture: 4 intra macroblocks, all flat s, 4:2:0 chroma at 128
        var py = 128; var pb = 128; var pr = 128
        for (_ <- 0 until 4) {
          w.code(codeOf(AddrIncCodes, 1))
          w.code(codeOf(MbTypeI, (false, false, false, true)))
          for (_ <- 0 until 4) py = intraBlock(w, DcLumaSize, py, s)
          pb = intraBlock(w, DcChromaSize, pb, 128)
          pr = intraBlock(w, DcChromaSize, pr, 128)
        }
      } else {
        val lvl = residualLevel(payload, f)
        // MB0: intra refresh to bf
        w.code(codeOf(AddrIncCodes, 1))
        w.code(codeOf(MbTypeP, (false, false, false, true)))
        var py = 128
        for (_ <- 0 until 4) py = intraBlock(w, DcLumaSize, py, bf)
        intraBlock(w, DcChromaSize, 128, 128)
        intraBlock(w, DcChromaSize, 128, 128)
        // MB1 skipped -> increment 2 to MB2
        w.code(codeOf(AddrIncCodes, 2))
        // MB2: MC + coded, vector (16, -16) from PMV 0, cbp 60, residuals
        w.code(codeOf(MbTypeP, (false, true, true, false)))
        writeMv(w, 16); writeMv(w, -16)
        w.code(codeOf(CbpCodes, 60))
        for (_ <- 0 until 4) residualBlock(w, lvl)
        // MB3: MC not coded, differential (-32, 0) -> vector (-16, -16)
        w.code(codeOf(AddrIncCodes, 1))
        w.code(codeOf(MbTypeP, (false, true, false, false)))
        writeMv(w, -32); writeMv(w, 0)
      }
    }
    w.startCode(0xb7) // sequence end
    w.toBytes
  }

  // ---- decoder

  private val Cos = Array.tabulate(8, 8)((u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Separable double-precision 8×8 IDCT (no level shift — MPEG-1 intra
    * codes unsigned pixel values directly). */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += Cn(u) * coef(y * 8 + u) * Cos(u)(x); u += 1 }
        tmp(y * 8 + x) = 0.5 * acc
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      y = 0
      while (y < 8) {
        var acc = 0.0; var v = 0
        while (v < 8) { acc += Cn(v) * tmp(v * 8 + x) * Cos(v)(y); v += 1 }
        out(y * 8 + x) = math.round(0.5 * acc).toInt
        y += 1
      }
      x += 1
    }
  }

  /** Mismatch control: every reconstructed coefficient except the intra DC
    * is forced odd, toward zero. */
  private def oddify(v: Int): Int =
    if (v == 0 || (v & 1) != 0) v else if (v > 0) v - 1 else v + 1

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  private def clamp255(v: Int): Int = math.max(0, math.min(255, v))

  /** Per-picture state while decoding one frame. */
  private final class Planes(val w: Int, val h: Int) {
    val yP = new Array[Byte](w * h)
    val cbP = new Array[Byte](w / 2 * (h / 2))
    val crP = new Array[Byte](w / 2 * (h / 2))
    def copyFrom(o: Planes): Unit = {
      System.arraycopy(o.yP, 0, yP, 0, yP.length)
      System.arraycopy(o.cbP, 0, cbP, 0, cbP.length)
      System.arraycopy(o.crP, 0, crP, 0, crP.length)
    }
    def snapshotY: Array[Byte] = yP.clone()
    def snapshotCb: Array[Byte] = cbP.clone()
  }

  /** Motion-compensate one 8×8 block region from `src` into pred. */
  private def mc8(src: Array[Byte], w: Int, h: Int, x0: Int, y0: Int,
      pred: Array[Int]): Unit = {
    if (x0 < 0 || y0 < 0 || x0 + 8 > w || y0 + 8 > h) throw new DecodeFail
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { pred(y * 8 + x) = src((y0 + y) * w + x0 + x) & 0xff; x += 1 }
      y += 1
    }
  }

  /** Decoded frames: (w, h, Y planes, Cb planes) in display order, or None
    * for malformed/unsupported streams. */
  def decodeFrames(p: Array[Byte])
      : Option[(Int, Int, Seq[Array[Byte]], Seq[Array[Byte]])] =
    try decodeImpl(p)
    catch {
      case _: DecodeFail | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  private def decodeImpl(p: Array[Byte])
      : Option[(Int, Int, Seq[Array[Byte]], Seq[Array[Byte]])] = {
    val br = new BR(p)
    if (br.nextStartCode() != 0xb3) return None
    val w = br.bits(12); val h = br.bits(12)
    if (w <= 0 || h <= 0 || (w & 15) != 0 || (h & 15) != 0 ||
        w.toLong * h > (1 << 22)) return None
    br.bits(4); br.bits(4); br.bits(18)
    if (br.bit() != 1) return None // marker
    br.bits(10); br.bit()
    val intraQ = IntraQ.clone()
    val nonIntraQ = Array.fill(64)(16)
    if (br.bit() == 1) { // load_intra_quantiser_matrix (zigzag order)
      var k = 0
      while (k < 64) { intraQ(Zigzag(k)) = br.bits(8); k += 1 }
    }
    if (br.bit() == 1) {
      var k = 0
      while (k < 64) { nonIntraQ(Zigzag(k)) = br.bits(8); k += 1 }
    }
    if (intraQ.exists(_ == 0) || nonIntraQ.exists(_ == 0)) return None
    val mbW = w / 16
    val mbH = h / 16
    var ref: Planes = null
    var cur: Planes = null
    val ys = Seq.newBuilder[Array[Byte]]
    val cbs = Seq.newBuilder[Array[Byte]]
    var nFrames = 0

    val coef = new Array[Int](64)
    val spat = new Array[Int](64)
    val pred = new Array[Int](64)

    def decodeBlock(br2: BR, intra: Boolean, chroma: Boolean, dcPred: Int,
        q: Int): Int = {
      java.util.Arrays.fill(coef, 0)
      var newPred = dcPred
      var k = 0 // next scan position
      if (intra) {
        val size = br2.vlc(if (chroma) DcChromaSize else DcLumaSize)
        if (size > 11) throw new DecodeFail
        val diff = extend(br2.bits(size), size)
        newPred = dcPred + diff
        if (newPred < 0 || newPred > 255) throw new DecodeFail
        coef(0) = newPred * 8 // intra DC: fixed quantizer 8, no oddification
        k = 1
      }
      var first = !intra
      var eob = false
      while (!eob) {
        if (first) {
          // first coefficient of a non-intra block: '1s' = run0/±1 (EOB
          // cannot occur first), or escape
          if (br2.bit() == 1) {
            val lvl = if (br2.bit() == 0) 1 else -1
            if (k > 63) throw new DecodeFail
            val zz = Zigzag(k)
            coef(zz) = oddify(((2 * math.abs(lvl) + 1) * q * nonIntraQ(zz)) / 16 *
              Integer.signum(lvl))
            k += 1
            first = false
          } else if (br2.bits(5) == 1) { // '0' + '00001' = escape '000001'
            val run = br2.bits(6)
            val l8 = br2.bits(8)
            val lvl =
              if (l8 == 0) br2.bits(8)
              else if (l8 == 128) br2.bits(8) - 256
              else if (l8 > 128) l8 - 256
              else l8
            if (lvl == 0) throw new DecodeFail
            k += run
            if (k > 63) throw new DecodeFail
            val zz = Zigzag(k)
            val mag = ((2 * math.abs(lvl) + 1) * q * nonIntraQ(zz)) / 16
            coef(zz) = oddify(Integer.signum(lvl) * mag)
            k += 1
            first = false
          } else throw new DecodeFail
        } else {
          // '10' EOB | '11s' run0/±1 | '000001' escape
          if (br2.bit() == 1) {
            if (br2.bit() == 0) eob = true
            else {
              val lvl = if (br2.bit() == 0) 1 else -1
              if (k > 63) throw new DecodeFail
              val zz = Zigzag(k)
              val wq = if (intra) intraQ(zz) else nonIntraQ(zz)
              val mag =
                if (intra) (2 * math.abs(lvl) * wq * q) / 16
                else ((2 * math.abs(lvl) + 1) * wq * q) / 16
              coef(zz) = oddify(Integer.signum(lvl) * mag)
              k += 1
            }
          } else if (br2.bits(5) == 1) { // '0' + '00001' = escape
            val run = br2.bits(6)
            val l8 = br2.bits(8)
            val lvl =
              if (l8 == 0) br2.bits(8)
              else if (l8 == 128) br2.bits(8) - 256
              else if (l8 > 128) l8 - 256
              else l8
            if (lvl == 0) throw new DecodeFail
            k += run
            if (k > 63) throw new DecodeFail
            val zz = Zigzag(k)
            val wq = if (intra) intraQ(zz) else nonIntraQ(zz)
            val mag =
              if (intra) (2 * math.abs(lvl) * wq * q) / 16
              else ((2 * math.abs(lvl) + 1) * wq * q) / 16
            coef(zz) = oddify(Integer.signum(lvl) * mag)
            k += 1
          } else throw new DecodeFail
        }
      }
      idct(coef, spat)
      newPred
    }

    /** Reconstruct motion-vector component: pred + decoded differential,
      * f_code-scaled, with the standard modular wraparound. */
    def reconMv(br2: BR, prev: Int, fCode: Int): Int = {
      val f = 1 << (fCode - 1)
      val code = br2.vlc(MotionCodes)
      val d =
        if (code == 0) 0
        else {
          val r = if (f == 1) 0 else br2.bits(fCode - 1)
          val mag = (math.abs(code) - 1) * f + r + 1
          Integer.signum(code) * mag
        }
      var v = prev + d
      val hi = 16 * f - 1
      val lo = -16 * f
      if (v > hi) v -= 32 * f
      if (v < lo) v += 32 * f
      v
    }

    var sc = br.nextStartCode()
    while (sc == 0xb8) { // GOP header
      br.bits(25); br.bit(); br.bit()
      sc = br.nextStartCode()
    }
    while (sc == 0x00) {
      if (nFrames >= MaxFrames) return None
      br.bits(10) // temporal reference
      val ptype = br.bits(3)
      if (ptype != 1 && ptype != 2) return None // I and P only
      br.bits(16) // vbv_delay
      var fullPel = false
      var fCode = 1
      if (ptype == 2) {
        fullPel = br.bit() == 1
        fCode = br.bits(3)
        if (fCode < 1 || fCode > 7) return None
        if (!fullPel) return None // half-pel interpolation out of scope
      }
      while (br.bit() == 1) br.bits(8) // extra picture information
      if (ptype == 2 && ref == null) return None // P without a reference
      cur = new Planes(w, h)
      if (ref != null) cur.copyFrom(ref) // skipped-MB default = co-located
      var sc2 = br.nextStartCode()
      if (sc2 < 0x01 || sc2 > 0xaf) return None // at least one slice
      while (sc2 >= 0x01 && sc2 <= 0xaf) {
        val q0 = br.bits(5)
        if (q0 == 0) return None
        var q = q0
        while (br.bit() == 1) br.bits(8) // extra slice information
        var mbAddr = (sc2 - 1) * mbW - 1
        var pmvX = 0; var pmvY = 0
        var dcY = 128; var dcCb = 128; var dcCr = 128
        var done = false
        while (!done) {
          val inc = br.vlc(AddrIncCodes)
          if (ptype == 1 && inc != 1) return None // no skipped MBs in I
          mbAddr += inc
          if (mbAddr >= mbW * mbH) return None
          if (inc > 1) { pmvX = 0; pmvY = 0; dcY = 128; dcCb = 128; dcCr = 128 }
          val (quant, mc, cbpOn, intra) =
            if (ptype == 1) br.vlc(MbTypeI) else br.vlc(MbTypeP)
          if (quant) {
            q = br.bits(5)
            if (q == 0) return None
          }
          var mvX = 0; var mvY = 0
          if (mc) {
            mvX = reconMv(br, pmvX, fCode)
            mvY = reconMv(br, pmvY, fCode)
            pmvX = mvX; pmvY = mvY
          } else if (!intra) { pmvX = 0; pmvY = 0 }
          val cbp =
            if (intra) 63
            else if (cbpOn) br.vlc(CbpCodes)
            else 0
          if (!intra) { dcY = 128; dcCb = 128; dcCr = 128 }
          val mbX = (mbAddr % mbW) * 16
          val mbY = (mbAddr / mbW) * 16
          // six blocks: Y0 Y1 Y2 Y3 Cb Cr (cbp MSB = Y0)
          var b = 0
          while (b < 6) {
            val chroma = b >= 4
            val cw = if (chroma) w / 2 else w
            val ch = if (chroma) h / 2 else h
            val bx = if (chroma) mbX / 2 else mbX + (b & 1) * 8
            val by = if (chroma) mbY / 2 else mbY + (b >> 1) * 8
            val plane =
              if (b < 4) cur.yP else if (b == 4) cur.cbP else cur.crP
            val rplane =
              if (ref == null) null
              else if (b < 4) ref.yP else if (b == 4) ref.cbP else ref.crP
            // prediction: displaced reference for MC blocks, zero for intra
            if (intra) java.util.Arrays.fill(pred, 0)
            else {
              val dx = if (chroma) mvX / 2 else mvX
              val dy = if (chroma) mvY / 2 else mvY
              if (rplane == null) throw new DecodeFail
              mc8(rplane, cw, ch, bx + dx, by + dy, pred)
            }
            val coded = (cbp & (32 >> b)) != 0
            if (coded) {
              val np = decodeBlock(br, intra, chroma,
                if (b < 4) dcY else if (b == 4) dcCb else dcCr, q)
              if (intra) {
                if (b < 4) dcY = np else if (b == 4) dcCb = np else dcCr = np
              }
              var i = 0
              while (i < 64) {
                plane((by + i / 8) * cw + bx + i % 8) =
                  clamp255(pred(i) + spat(i)).toByte
                i += 1
              }
            } else if (!intra) {
              var i = 0
              while (i < 64) {
                plane((by + i / 8) * cw + bx + i % 8) = pred(i).toByte
                i += 1
              }
            }
            b += 1
          }
          if (br.peekZeros23) done = true
        }
        sc2 = br.nextStartCode()
      }
      ys += cur.snapshotY
      cbs += cur.snapshotCb
      ref = cur
      nFrames += 1
      sc = sc2
    }
    if (sc != 0xb7 || nFrames == 0) return None
    Some((w, h, ys.result(), cbs.result()))
  }
}

/** Registered queries for the motion-compensated video family. */
object MpegVideoQueries {
  import MpegVideoCodec._

  final case class MpegFrame(doc_id: Long, frame_idx: Int, n_frames: Int,
      mb_refresh: Double, mb_static: Double, mb_mc: Double, mb_copy: Double,
      mean_y: Double, max_y: Int, mean_cb: Double)

  /** Motion-compensated video decode end-to-end: payload → MPEG-1-syntax
    * stream (I picture + P pictures with intra refresh, a skipped static
    * macroblock, an MC+residual macroblock and a displaced-copy
    * macroblock) → full bit-level decode → per-quadrant luminance means.
    * The oracle's closed form pins each mechanism separately: mb_static
    * pins skipped-MB temporal carry, mb_mc pins motion compensation PLUS
    * the dequantized residual (level L reconstructs to a 2L+sign(L) pixel
    * delta through q=8 × the flat non-intra matrix and oddification),
    * mb_copy pins the differential motion vector chain (it displaces to
    * the PREVIOUS frame's refresh block), and mb_refresh pins intra DC
    * prediction. Map-only, partition-parallel, one-to-many.
    */
  def decodeContentMpegVideo(media: Dataset[MediaRow]): Dataset[MpegFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (w, h, ys, cbs) = decodeFrames(encode(r.payload))
        .getOrElse(throw new IllegalStateException("MPEG video roundtrip failed"))
      def quad(px: Array[Byte], qx: Int, qy: Int): Double = {
        var sum = 0L
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            sum += px((qy * 16 + y) * w + qx * 16 + x) & 0xff
            x += 1
          }
          y += 1
        }
        sum / 256.0
      }
      ys.iterator.zip(cbs.iterator).zipWithIndex.map { case ((py, pcb), f) =>
        var sum = 0L; var mx = 0
        py.foreach { b => val v = b & 0xff; sum += v; if (v > mx) mx = v }
        var csum = 0L
        pcb.foreach(b => csum += b & 0xff)
        MpegFrame(r.doc_id, f, ys.length,
          quad(py, 0, 0), quad(py, 1, 0), quad(py, 0, 1), quad(py, 1, 1),
          sum.toDouble / (w * h), mx, csum.toDouble / (w / 2 * (h / 2)))
      }
    }
  }

  val q289MpegVideoDecode = GraftQuery(
    "q289_mpeg_video_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentMpegVideo(media).toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          round(col("mb_refresh"), 2).as("mb_refresh"),
          round(col("mb_static"), 2).as("mb_static"),
          round(col("mb_mc"), 2).as("mb_mc"),
          round(col("mb_copy"), 2).as("mb_copy"),
          round(col("mean_y"), 2).as("mean_y"), col("max_y"),
          round(col("mean_cb"), 2).as("mean_cb"))
        .orderBy("doc_id", "frame_idx")
    },
    // closed form per frame f (b = text byte 8f, s = byte 0, L from b):
    // refresh = b, static = s (skip carry), mc = clamp(s + 2L + sign L),
    // copy = previous frame's refresh value; frame 0 is flat s
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |f AS (
           |  SELECT doc_id, len,
           |    CAST(greatest(1, (len + 7) // 8) AS INT) AS nf,
           |    CASE WHEN len > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS s,
           |    unnest(range(CAST(greatest(1, (len + 7) // 8) AS BIGINT))) AS fi,
           |    text
           |  FROM t),
           |v AS (
           |  SELECT doc_id, nf, CAST(fi AS INT) AS frame_idx, s,
           |    CASE WHEN fi * 8 + 1 <= len
           |         THEN ascii(substr(text, CAST(fi * 8 + 1 AS INT), 1))
           |         ELSE 0 END AS vf,
           |    CASE WHEN fi >= 2 THEN
           |      CASE WHEN (fi - 1) * 8 + 1 <= len
           |           THEN ascii(substr(text, CAST((fi - 1) * 8 + 1 AS INT), 1))
           |           ELSE 0 END
           |    ELSE s END AS prev0
           |  FROM f),
           |l AS (
           |  SELECT *, CASE WHEN (vf % 64) - 32 = 0 THEN 1
           |                 ELSE (vf % 64) - 32 END AS lv
           |  FROM v),
           |q AS (
           |  SELECT doc_id, frame_idx, nf,
           |    CASE WHEN frame_idx = 0 THEN s ELSE vf END AS q0,
           |    s AS q1,
           |    CASE WHEN frame_idx = 0 THEN s
           |         ELSE least(255, greatest(0,
           |           s + 2 * lv + CASE WHEN lv > 0 THEN 1 ELSE -1 END)) END AS q2,
           |    CASE WHEN frame_idx = 0 THEN s ELSE prev0 END AS q3
           |  FROM l)
           |SELECT doc_id, frame_idx, nf AS n_frames,
           |  round(CAST(q0 AS DOUBLE), 2) AS mb_refresh,
           |  round(CAST(q1 AS DOUBLE), 2) AS mb_static,
           |  round(CAST(q2 AS DOUBLE), 2) AS mb_mc,
           |  round(CAST(q3 AS DOUBLE), 2) AS mb_copy,
           |  round(CAST(q0 + q1 + q2 + q3 AS DOUBLE) / 4.0, 2) AS mean_y,
           |  greatest(q0, q1, q2, q3) AS max_y,
           |  CAST(128.0 AS DOUBLE) AS mean_cb
           |FROM q ORDER BY doc_id, frame_idx""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q289MpegVideoDecode)
}
