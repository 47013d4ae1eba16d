package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

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
