package graft.ops

import graft.ops.Multimodal.{HeaderCodec, MaxPixelBytes}

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
