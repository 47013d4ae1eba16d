package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

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
