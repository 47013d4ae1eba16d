package graft.ops

import graft.ops.Multimodal.MaxPixelBytes
import graft.ops.JpegCodec._

/** Sequential ARITHMETIC-coded (SOF9) JPEG layer — the ITU-T T.81 Annex D
  * QM-coder (Table D.3 probability-estimation state machine) plus the
  * Annex F.1.4.4 statistical models, over [[JpegCodec]]'s shared headers
  * and DCT machinery. Split from `JpegCodec.scala` per the round-10
  * file-size discipline; behavior is unchanged and the round-trip /
  * table-sanity / compression-efficiency properties are pinned by
  * JpegArithSpec and JpegArithPropertySpec.
  */
object JpegArith {
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
