package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

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
