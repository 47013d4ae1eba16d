package graft.ops

import graft.ops.Multimodal.MaxPixelBytes
import graft.ops.JpegCodec._

/** PROGRESSIVE (SOF2) JPEG layer — spectral selection + successive
  * approximation over [[JpegCodec]]'s shared Huffman/bit/DCT machinery
  * (ITU-T T.81 Annex G): DC-first/DC-refine scans, banded AC scans with
  * EOBn run coding, and AC refinement with correction bits. Split from
  * `JpegCodec.scala` per the round-10 file-size discipline; behavior is
  * unchanged and the encode/decode contracts are pinned by
  * JpegProgressiveSpec + the CodecFuzzSpec flip/truncation harness.
  */
object JpegProgressive {

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

}
