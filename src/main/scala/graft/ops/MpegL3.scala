package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ops.Multimodal.{attachBinary, MediaRow}

/** REAL MDCT-generation audio: an MPEG-1 Audio Layer III-class (ISO/IEC
  * 11172-3 §2.4.1.7/2.4.2.7) hybrid-filterbank codec, pure JVM — the
  * architecture behind MP3 and the direct ancestor of AAC's pure-MDCT
  * path. This closes the LAST labeled [[Multimodal.FakeCodec]] boundary
  * (MDCT audio): on top of q277's 32-band polyphase filterbank the
  * decoder runs the full Layer III long-block chain — Huffman-coded
  * spectral pairs with linbits escapes and per-value sign bits, the
  * x^(4/3) nonlinear requantizer driven by global_gain, the EIGHT
  * alias-reduction butterflies per subband boundary (the ISO ci
  * coefficients −0.6…−0.0037), an 18-point IMDCT with the type-0 sine
  * window and 50% overlap-add, frequency inversion of odd samples in odd
  * subbands, and polyphase synthesis. The encoder is the true inverse
  * chain (forward MDCT, inverse butterflies, the nonlinear quantizer)
  * with MP3's actual RATE-CONTROL INNER LOOP: global_gain walks up until
  * the granule's Huffman bits fit the frame budget.
  *
  * ISO-exact here: header fields and the Layer III 144·bitrate/fs frame
  * arithmetic, the mono 17-byte side-info layout (main_data_begin,
  * scfsi, and per-granule part2_3_length / big_values / global_gain /
  * scalefac_compress / window-switching / table_select / region counts /
  * preflag / scalefac_scale / count1table_select), big_values pair
  * coding with linbits escapes and sign bits, the requantization law
  * 2^((gg−210)/4)·|is|^(4/3), the alias-reduction coefficients, and the
  * IMDCT/window/overlap/inversion flowchart.
  *
  * Honest boundary (the q277 prototype-window note's class): the 32 ISO
  * Huffman code tables are pure table data — transcribing them offline is
  * hallucination-prone, so the pair coder here uses a DERIVED canonical
  * code (length 4 + bits(|x|) + bits(|y|) per pair symbol, Kraft sum
  * 9/16, canonical assignment) with the ISO escape/sign structure. The
  * bitstream is therefore Layer III-SYNTACTIC with a documented
  * table substitution; MpegL3Spec pins reconstruction SNR, bitstream
  * checksum parity, rate-loop convergence, and corruption fail-soft
  * rather than cross-implementation bit parity.
  *
  * Reference scope note: `/root/reference` has no media path; this
  * family exists for the §2.3 multimodal north star.
  */
object MpegL3Codec {
  import MpegAudioCodec.{Analysis, Synthesis, CodecDelay, SampleRate, CodeSum}

  val BitratesL3: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrIdx = 14 // 320 kbps: 144*320000/48000 = 960 bytes, no padding
  private val FrameBytes = 144 * (BitratesL3(BrIdx) * 1000) / SampleRate
  /** polyphase look-back + one granule (576) of MDCT overlap-add latency */
  val L3Delay: Int = CodecDelay + 576
  private val MaxEscape = 270 // 15 + 8-bit linbits

  // ---- hybrid filterbank tables (StrictMath: bit-identical across JVMs)

  /** IMDCT basis: cos(π/72·(2i+1+18)(2j+1)), i time 0..35, j spectral. */
  private val CosI: Array[Array[Double]] = Array.tabulate(36, 18)((i, j) =>
    StrictMath.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * j + 1)))

  /** Type-0 (normal) long-block sine window. */
  private val Win: Array[Double] =
    Array.tabulate(36)(i => StrictMath.sin(math.Pi / 36.0 * (i + 0.5)))

  /** ISO alias-reduction butterfly coefficients: cs = 1/√(1+ci²),
    * ca = ci·cs, for the eight ci of §2.4.3.4.10.1. */
  private val Ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
    -0.0142, -0.0037)
  private val Cs = Ci.map(c => 1.0 / StrictMath.sqrt(1.0 + c * c))
  private val Ca = Ci.indices.map(i => Ci(i) * Cs(i)).toArray

  // ---- derived canonical Huffman pair code (see scaladoc boundary)

  private def blen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** symbol = x<<4 | y (x, y ∈ 0..15); code length 4 + bits(x) + bits(y). */
  private val PairLen: Array[Int] =
    Array.tabulate(256)(s => 4 + blen(s >> 4) + blen(s & 15))

  /** canonical assignment in (length, symbol) order. */
  private val PairCode: Array[(Int, Int)] = { // symbol -> (code, len)
    val order = (0 until 256).sortBy(s => (PairLen(s), s))
    val out = new Array[(Int, Int)](256)
    var code = 0
    var last = PairLen(order.head)
    order.foreach { s =>
      code <<= (PairLen(s) - last)
      last = PairLen(s)
      out(s) = (code, PairLen(s))
      code += 1
    }
    out
  }
  private val PairDecode: Map[(Int, Int), Int] =
    (0 until 256).map(s => (PairCode(s)._2, PairCode(s)._1) -> s).toMap
  private val MaxPairLen = PairLen.max

  // ---- bit IO

  private final class BW(val buf: Array[Byte]) {
    var pos = 0
    def put(v: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        if (((v >> b) & 1) != 0)
          buf(pos >> 3) = (buf(pos >> 3) | (0x80 >> (pos & 7))).toByte
        pos += 1
        b -= 1
      }
    }
  }

  private final class BRd(val buf: Array[Byte], val limitBits: Int) {
    var pos = 0
    var ok = true
    def get(bits: Int): Int = {
      if (pos + bits > limitBits) { ok = false; return 0 }
      var v = 0
      var b = bits
      while (b > 0) {
        v = (v << 1) | ((buf(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        b -= 1
      }
      v
    }
  }

  // ---- encoder

  /** Huffman bit cost of a quantized pair (values already |v| ≤ 270). */
  private def pairBits(a: Int, b: Int): Int = {
    val ea = math.min(math.abs(a), 15)
    val eb = math.min(math.abs(b), 15)
    PairLen(ea << 4 | eb) +
      (if (ea == 15) 8 else 0) + (if (eb == 15) 8 else 0) +
      (if (a != 0) 1 else 0) + (if (b != 0) 1 else 0)
  }

  private def quantize(xr: Array[Double], gg: Int, is: Array[Int]): Int = {
    val step = StrictMath.pow(2.0, (gg - 210) / 4.0)
    var maxAbs = 0
    var i = 0
    while (i < 576) {
      val q = StrictMath.rint(StrictMath.pow(math.abs(xr(i)) / step, 0.75)).toInt
      is(i) = if (xr(i) < 0) -q else q
      if (q > maxAbs) maxAbs = q
      i += 1
    }
    maxAbs
  }

  /** Layer III-class encode: returns the stream plus the side-info/symbol
    * checksum (the q277 stream_ok discipline). */
  def encodeL3WithSum(pcm: Array[Short]): (Array[Byte], Long) = {
    val n = math.max(1, pcm.length)
    val nFrames = (n + L3Delay + 1151) / 1152
    val out = new Array[Byte](nFrames * FrameBytes)
    val ana = new Analysis
    val in = new Array[Double](32)
    val prevSb = Array.ofDim[Double](32, 18) // MDCT 50% overlap memory
    val sum = new CodeSum
    val granuleBudget = (FrameBytes * 8 - 32 - 136) / 2
    var f = 0
    while (f < nFrames) {
      val w = new BW(out)
      w.pos = f * FrameBytes * 8
      // header: 12-bit sync, MPEG-1, layer III ('01'), no CRC, 320k, 48k, mono
      w.put(0xfff, 12); w.put(1, 1); w.put(1, 2); w.put(1, 1)
      w.put(BrIdx, 4); w.put(1, 2); w.put(0, 1); w.put(0, 1)
      w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(0, 1); w.put(0, 2)
      val sideStart = w.pos
      w.pos += 136 // side info written after the rate loop
      val part23 = new Array[Int](2)
      val bigVal = new Array[Int](2)
      val ggOut = new Array[Int](2)
      val huffBits = Array.ofDim[Int](2)
      val isAll = Array.ofDim[Int](2, 576)
      var gr = 0
      while (gr < 2) {
        // 18 polyphase feeds -> sbGr(t)(k)
        val sbGr = Array.ofDim[Double](18, 32)
        var t = 0
        while (t < 18) {
          var i = 0
          while (i < 32) {
            val idx = (f * 2 + gr) * 576 + t * 32 + i
            in(i) = if (idx < pcm.length) pcm(idx) / 32768.0 else 0.0
            i += 1
          }
          sbGr(t) = ana.feed(in, 0)
          t += 1
        }
        // pre-compensate the decoder's frequency inversion
        var k = 1
        while (k < 32) {
          t = 1
          while (t < 18) { sbGr(t)(k) = -sbGr(t)(k); t += 2 }
          k += 2
        }
        // forward MDCT per subband (1/18 scale -> unscaled ISO IMDCT is PR)
        val xr = new Array[Double](576)
        k = 0
        while (k < 32) {
          val z = new Array[Double](36)
          var i = 0
          while (i < 18) { z(i) = prevSb(k)(i) * Win(i); i += 1 }
          while (i < 36) { z(i) = sbGr(i - 18)(k) * Win(i); i += 1 }
          var j = 0
          while (j < 18) {
            var acc = 0.0
            i = 0
            while (i < 36) { acc += z(i) * CosI(i)(j); i += 1 }
            // cos-basis composition contributes N/4 = 9 per sample and the
            // window pair w² + w²_shifted sums to 1, so 1/9 is exact PR
            xr(k * 18 + j) = acc / 9.0
            j += 1
          }
          i = 0
          while (i < 18) { prevSb(k)(i) = sbGr(i)(k); i += 1 }
          k += 1
        }
        // inverse alias butterflies (decoder's rotation transposed)
        var sb = 1
        while (sb < 32) {
          var i = 0
          while (i < 8) {
            val l = xr(18 * sb - 1 - i)
            val u = xr(18 * sb + i)
            xr(18 * sb - 1 - i) = l * Cs(i) + u * Ca(i)
            xr(18 * sb + i) = u * Cs(i) - l * Ca(i)
            i += 1
          }
          sb += 1
        }
        // rate-control inner loop: coarsen global_gain until the spectrum
        // fits the escape range AND the granule bit budget
        var maxAbs = 0.0
        var i = 0
        while (i < 576) { val a = math.abs(xr(i)); if (a > maxAbs) maxAbs = a; i += 1 }
        var gg = 210
        if (maxAbs > 0) {
          // start where max|is| ≈ MaxEscape, then walk up as needed
          val step0 = maxAbs / StrictMath.pow(MaxEscape.toDouble, 4.0 / 3.0)
          gg = math.max(0, math.min(255,
            210 + StrictMath.ceil(4.0 * StrictMath.log(step0) / StrictMath.log(2.0)).toInt))
        }
        val is = isAll(gr)
        var fits = false
        var bits = 0
        var bv = 0
        while (!fits) {
          val mx = quantize(xr, gg, is)
          if (mx > MaxEscape) { gg += 1 }
          else {
            var last = -1
            i = 0
            while (i < 576) { if (is(i) != 0) last = i; i += 1 }
            bv = (last + 2) / 2 // pairs covering the nonzero prefix
            bits = 0
            var p = 0
            while (p < bv) { bits += pairBits(is(2 * p), is(2 * p + 1)); p += 1 }
            if (bits <= granuleBudget && bits <= 4095) fits = true
            else gg += 1
          }
          if (gg > 255) { // silence the granule rather than overflow
            java.util.Arrays.fill(is, 0); bv = 0; bits = 0; fits = true
            gg = 255
          }
        }
        part23(gr) = bits
        bigVal(gr) = bv
        ggOut(gr) = gg
        huffBits(gr) = bits
        gr += 1
      }
      // side info (mono, 17 bytes)
      val ws = new BW(out)
      ws.pos = sideStart
      ws.put(0, 9); ws.put(0, 5); ws.put(0, 4)
      gr = 0
      while (gr < 2) {
        ws.put(part23(gr), 12); ws.put(bigVal(gr), 9); ws.put(ggOut(gr), 8)
        ws.put(0, 4); ws.put(0, 1)
        ws.put(1, 5); ws.put(1, 5); ws.put(1, 5) // table_select (derived table)
        ws.put(0, 4); ws.put(0, 3); ws.put(0, 1); ws.put(0, 1); ws.put(0, 1)
        gr += 1
      }
      // main data: Huffman pairs
      gr = 0
      while (gr < 2) {
        // checksum order mirrors the decoder's read order: side fields
        // then symbols, per granule
        sum.add(ggOut(gr)); sum.add(bigVal(gr))
        val is = isAll(gr)
        var p = 0
        while (p < bigVal(gr)) {
          val a = is(2 * p); val b = is(2 * p + 1)
          val ea = math.min(math.abs(a), 15)
          val eb = math.min(math.abs(b), 15)
          val (code, len) = PairCode(ea << 4 | eb)
          w.put(code, len); sum.add(ea << 4 | eb)
          if (ea == 15) { w.put(math.abs(a) - 15, 8); sum.add(math.abs(a) - 15) }
          if (a != 0) { val s = if (a < 0) 1 else 0; w.put(s, 1); sum.add(s) }
          if (eb == 15) { w.put(math.abs(b) - 15, 8); sum.add(math.abs(b) - 15) }
          if (b != 0) { val s = if (b < 0) 1 else 0; w.put(s, 1); sum.add(s) }
          p += 1
        }
        gr += 1
      }
      f += 1
    }
    (out, sum.value)
  }

  def encodeL3(pcm: Array[Short]): Array[Byte] = encodeL3WithSum(pcm)._1

  // ---- decoder

  /** Decode a Layer III-class stream: Option of (PCM, checksum). */
  def decodeL3WithSum(p: Array[Byte]): Option[(Array[Short], Long)] = {
    try {
      val syn = new Synthesis
      val sum = new CodeSum
      val overlap = Array.ofDim[Double](32, 18)
      val outBuf = scala.collection.mutable.ArrayBuffer.empty[Short]
      var pos = 0
      if (p.length < 4) return None
      while (pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff || ((p(pos + 1) >> 5) & 7) != 7) return None
        val id = (p(pos + 1) >> 3) & 1
        val layer = (p(pos + 1) >> 1) & 3
        val prot = p(pos + 1) & 1
        val brIdx = (p(pos + 2) >> 4) & 0xf
        val fsIdx = (p(pos + 2) >> 2) & 3
        val padding = (p(pos + 2) >> 1) & 1
        val mode = (p(pos + 3) >> 6) & 3
        if (id != 1 || layer != 1 || prot != 1 || fsIdx != 1 || mode != 3)
          return None
        if (brIdx < 1 || brIdx > 14) return None
        val frameBytes = 144 * (BitratesL3(brIdx) * 1000) / SampleRate + padding
        if (pos + frameBytes > p.length) return None
        val r = new BRd(p, (pos + frameBytes) * 8)
        r.pos = pos * 8 + 32
        // side info (mono)
        val mainDataBegin = r.get(9)
        if (mainDataBegin != 0) return None // bit reservoir out of scope
        r.get(5); r.get(4)
        val part23 = new Array[Int](2)
        val bigVal = new Array[Int](2)
        val gg = new Array[Int](2)
        var gr = 0
        while (gr < 2) {
          part23(gr) = r.get(12)
          bigVal(gr) = r.get(9)
          gg(gr) = r.get(8)
          val scalefacCompress = r.get(4)
          val windowSwitching = r.get(1)
          if (scalefacCompress != 0 || windowSwitching != 0) return None
          r.get(5); r.get(5); r.get(5); r.get(4); r.get(3)
          r.get(1); r.get(1); r.get(1)
          if (bigVal(gr) > 288) return None
          gr += 1
        }
        if (!r.ok) return None
        gr = 0
        while (gr < 2) {
          sum.add(gg(gr)); sum.add(bigVal(gr))
          val is = new Array[Int](576)
          val start = r.pos
          var pq = 0
          while (pq < bigVal(gr)) {
            // canonical prefix decode
            var code = 0; var len = 0; var sym = -1
            while (sym < 0 && len < MaxPairLen) {
              code = (code << 1) | r.get(1); len += 1
              sym = PairDecode.getOrElse((len, code), -1)
            }
            if (sym < 0 || !r.ok) return None
            sum.add(sym)
            var a = sym >> 4
            var b = sym & 15
            if (a == 15) { val lb = r.get(8); sum.add(lb); a += lb }
            if (a != 0) { val s = r.get(1); sum.add(s); if (s == 1) a = -a }
            if (b == 15) { val lb = r.get(8); sum.add(lb); b += lb }
            if (b != 0) { val s = r.get(1); sum.add(s); if (s == 1) b = -b }
            is(2 * pq) = a; is(2 * pq + 1) = b
            pq += 1
          }
          if (!r.ok || r.pos - start != part23(gr)) return None
          // requantize: xr = sign·|is|^(4/3)·2^((gg-210)/4)
          val step = StrictMath.pow(2.0, (gg(gr) - 210) / 4.0)
          val xr = new Array[Double](576)
          var i = 0
          while (i < 576) {
            if (is(i) != 0) {
              val m = StrictMath.pow(math.abs(is(i)).toDouble, 4.0 / 3.0) * step
              xr(i) = if (is(i) < 0) -m else m
            }
            i += 1
          }
          // alias-reduction butterflies (ISO §2.4.3.4.10.1)
          var sb = 1
          while (sb < 32) {
            i = 0
            while (i < 8) {
              val l = xr(18 * sb - 1 - i)
              val u = xr(18 * sb + i)
              xr(18 * sb - 1 - i) = l * Cs(i) - u * Ca(i)
              xr(18 * sb + i) = u * Cs(i) + l * Ca(i)
              i += 1
            }
            sb += 1
          }
          // IMDCT + sine window + overlap-add per subband
          val sbOut = Array.ofDim[Double](18, 32)
          var k = 0
          while (k < 32) {
            val z = new Array[Double](36)
            i = 0
            while (i < 36) {
              var acc = 0.0
              var j = 0
              while (j < 18) { acc += xr(k * 18 + j) * CosI(i)(j); j += 1 }
              z(i) = acc * Win(i)
              i += 1
            }
            i = 0
            while (i < 18) {
              sbOut(i)(k) = z(i) + overlap(k)(i)
              overlap(k)(i) = z(i + 18)
              i += 1
            }
            k += 1
          }
          // frequency inversion: odd time samples of odd subbands
          k = 1
          while (k < 32) {
            i = 1
            while (i < 18) { sbOut(i)(k) = -sbOut(i)(k); i += 2 }
            k += 2
          }
          // polyphase synthesis
          i = 0
          while (i < 18) {
            val pcm32 = syn.feed(sbOut(i))
            var j = 0
            while (j < 32) {
              val v = StrictMath.rint(pcm32(j) * 32768.0)
              outBuf += (if (v > 32767.0) 32767
                else if (v < -32768.0) -32768 else v.toInt).toShort
              j += 1
            }
            i += 1
          }
          gr += 1
        }
        pos += frameBytes
      }
      if (pos != p.length) return None
      if (outBuf.isEmpty) None else Some((outBuf.toArray, sum.value))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def decodeL3(p: Array[Byte]): Option[Array[Short]] =
    decodeL3WithSum(p).map(_._1)

  /** SNR against the original, decoder output delayed by [[L3Delay]]. */
  def snrL3Db(orig: Array[Short], dec: Array[Short]): Double = {
    val n = math.min(orig.length, math.max(0, dec.length - L3Delay))
    if (n <= 0) return 0.0
    var sig = 0.0
    var err = 0.0
    var i = 0
    while (i < n) {
      val a = orig(i).toDouble
      val e = a - dec(i + L3Delay)
      sig += a * a
      err += e * e
      i += 1
    }
    if (err == 0) 200.0
    else if (sig == 0) 0.0
    else 10.0 * StrictMath.log10(sig / err)
  }
}

/** Registered queries for the MDCT audio family. */
object MpegL3Queries {
  import MpegL3Codec._

  final case class L3Content(doc_id: Long, n_bytes: Int, n_samples_in: Int,
      l3_frames: Int, l3_bytes: Int, l3_stream_ok: Boolean, l3_snr_ok: Boolean)

  /** MDCT-audio decode end-to-end: payload → shaped 16-bit PCM (the q277
    * one-pole program-material model) → Layer III-class encode (polyphase
    * analysis + forward MDCT + inverse butterflies + nonlinear quantizer
    * under the rate loop) → full decode (side info, Huffman pairs,
    * requantize, alias reduction, IMDCT/overlap, inversion, synthesis) →
    * fidelity. Lossy by design, so the oracle gates the closed-form frame
    * geometry (ISO 144·bitrate/fs arithmetic with the hybrid filterbank's
    * 1057-sample latency) plus the bitstream checksum parity and the
    * achieved SNR through the full cascade — a wrong butterfly sign,
    * window, IMDCT phase, or requantization exponent lands near 0 dB and
    * fails the gate. Map-only, partition-parallel.
    */
  def decodeContentL3(media: Dataset[MediaRow]): Dataset[L3Content] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val pcm = new Array[Short](math.max(1, r.payload.length))
        var acc = 0.0
        var i = 0
        while (i < r.payload.length) {
          acc = 0.85 * acc + 0.45 * (((r.payload(i) & 0xff) - 128) * 256)
          val v = StrictMath.rint(acc)
          pcm(i) = (if (v > 32767) 32767 else if (v < -32768) -32768 else v.toInt).toShort
          i += 1
        }
        val (l3, encSum) = encodeL3WithSum(pcm)
        val (dec, decSum) = decodeL3WithSum(l3)
          .getOrElse(throw new IllegalStateException("L3 roundtrip failed"))
        L3Content(r.doc_id, r.payload.length, pcm.length,
          (pcm.length + L3Delay + 1151) / 1152, l3.length,
          encSum == decSum, snrL3Db(pcm, dec) > 20.0)
      }
    }
  }

  val q292MdctAudioDecode = GraftQuery(
    "q292_mdct_audio_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentL3(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_samples_in"),
          col("l3_frames"), col("l3_bytes"), col("l3_stream_ok"),
          col("l3_snr_ok"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
           |  CAST(greatest(1, octet_length(CAST(text AS BLOB))) AS INT)
           |    AS n_samples_in,
           |  CAST((greatest(1, octet_length(CAST(text AS BLOB))) + 1057 + 1151)
           |    // 1152 AS INT) AS l3_frames,
           |  CAST(((greatest(1, octet_length(CAST(text AS BLOB))) + 1057 + 1151)
           |    // 1152) * 960 AS INT) AS l3_bytes,
           |  TRUE AS l3_stream_ok,
           |  TRUE AS l3_snr_ok
           |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q292MdctAudioDecode)
}
