package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ops.Multimodal.{attachBinary, MediaRow}

/** REAL inter-predicted video codec: Microsoft BI_RLE8 ("MRLE") in an AVI
  * container — the public run-length video format whose DELTA escape is
  * genuine TEMPORAL PREDICTION: a delta/skip leaves the skipped pixels at
  * their previous-frame values, so the decoder carries a persistent
  * canvas across '00dc' chunks and a non-key frame is undecodable without
  * its predecessor. That upgraded the [[Multimodal.FakeCodec]] video role
  * from "frame sampler stub" to a real decode with cross-frame state;
  * [[MpegVideoCodec]] (q289) then added the motion-compensated transform
  * layer, leaving the stub only MDCT-generation audio.
  *
  * Format per the public BI_RLE8 specification: encoded mode is
  * (count, index) runs; escape 00 00 = end of line, 00 01 = end of
  * bitmap, 00 02 dx dy = delta (move the position WITHOUT writing — the
  * temporal carry), 00 nn (nn ≥ 3) = absolute mode with nn literal
  * indices padded to a word boundary. Rows are stored bottom-up (DIB
  * convention); 8-bit indices resolve through the strf palette
  * (BITMAPINFOHEADER + RGBQUAD table — the decoder computes luminance
  * from the resolved RGB, so the palette path is genuinely exercised).
  * The AVI layer mirrors [[MjpegAviCodec]]: hdrl (avih +
  * 'vids'/'MRLE' strh + 8-bit strf), movi chunk walk, idx1 validated
  * against the walk INCLUDING the keyframe flags (frame 0 is the only
  * AVIIF_KEYFRAME — delta frames must not carry it).
  *
  * Reference scope note: `/root/reference` has no media path; this
  * family exists for the §2.3 multimodal north star.
  */
object RleVideoCodec {
  val W = 32
  val H = 16
  val FrameBytes = 8 // one driving payload byte per frame slot of 8
  private val MaxFrames = 1 << 16

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    le16(out, v & 0xffff); le16(out, (v >>> 16) & 0xffff)
  }
  private def tag(out: java.io.ByteArrayOutputStream, s: String): Unit =
    s.foreach(c => out.write(c))
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

  /** Frame f's synthesized content (what the encoder draws):
    * rows 0..7 (the bottom half, DIB order) are STATIC at the value of
    * payload byte 0 — encoded only in the keyframe and delta-skipped in
    * every later frame (the temporal carry the oracle pins); rows 8..14
    * are flat at payload byte 8f (run mode); row 15 is the gradient
    * (b_f & 0x7f) + x (absolute mode — never wraps, 158 max).
    */
  private def frameByte(payload: Array[Byte], f: Int): Int =
    if (f * FrameBytes < payload.length) payload(f * FrameBytes) & 0xff else 0

  /** Encode the payload as an MRLE AVI: keyframe + delta frames. */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val nf = math.max(1, (payload.length + FrameBytes - 1) / FrameBytes)
    val s = if (payload.nonEmpty) payload(0) & 0xff else 0
    val frames = Array.tabulate(nf) { f =>
      val vf = frameByte(payload, f)
      val o = new java.io.ByteArrayOutputStream()
      if (f == 0) {
        // keyframe: all 16 rows
        var r = 0
        while (r < 8) { o.write(W); o.write(s); o.write(0); o.write(0); r += 1 } // run + EOL
      } else {
        // delta frame: skip the 8 static rows via the temporal escape
        o.write(0); o.write(2); o.write(0); o.write(8) // delta dx=0 dy=8
      }
      var r = 8
      while (r < 15) { o.write(W); o.write(vf); o.write(0); o.write(0); r += 1 }
      // row 15 in absolute mode: 32 literal indices (even — no pad byte)
      o.write(0); o.write(W)
      var x = 0
      while (x < W) { o.write((vf & 0x7f) + x); x += 1 }
      o.write(0); o.write(1) // end of bitmap
      o.toByteArray
    }
    val maxFrame = frames.map(_.length).max
    val movi = new java.io.ByteArrayOutputStream()
    tag(movi, "movi")
    val offsets = new Array[Int](nf)
    for (f <- 0 until nf) {
      offsets(f) = movi.size()
      tag(movi, "00dc"); le32(movi, frames(f).length)
      movi.write(frames(f))
      if ((frames(f).length & 1) == 1) movi.write(0)
    }
    val moviBytes = movi.toByteArray
    val hdrl = new java.io.ByteArrayOutputStream()
    tag(hdrl, "hdrl")
    tag(hdrl, "avih"); le32(hdrl, 56)
    le32(hdrl, 40000)
    le32(hdrl, 0); le32(hdrl, 0)
    le32(hdrl, 0x10) // AVIF_HASINDEX
    le32(hdrl, nf)
    le32(hdrl, 0); le32(hdrl, 1)
    le32(hdrl, maxFrame)
    le32(hdrl, W); le32(hdrl, H)
    (0 until 4).foreach(_ => le32(hdrl, 0))
    val strl = new java.io.ByteArrayOutputStream()
    tag(strl, "strl")
    tag(strl, "strh"); le32(strl, 56)
    tag(strl, "vids"); tag(strl, "MRLE")
    le32(strl, 0); le32(strl, 0); le32(strl, 0)
    le32(strl, 1); le32(strl, 25)
    le32(strl, 0); le32(strl, nf)
    le32(strl, maxFrame); le32(strl, -1); le32(strl, 0)
    le16(strl, 0); le16(strl, 0); le16(strl, W); le16(strl, H)
    // strf: BITMAPINFOHEADER (biCompression = 1 = BI_RLE8) + 256 RGBQUADs
    tag(strl, "strf"); le32(strl, 40 + 256 * 4)
    le32(strl, 40); le32(strl, W); le32(strl, H)
    le16(strl, 1); le16(strl, 8) // planes, 8 bpp
    le32(strl, 1) // BI_RLE8
    le32(strl, W * H)
    le32(strl, 0); le32(strl, 0)
    le32(strl, 256); le32(strl, 0) // biClrUsed, biClrImportant
    var i = 0
    while (i < 256) { // grayscale palette: RGBQUAD = (B, G, R, 0)
      strl.write(i); strl.write(i); strl.write(i); strl.write(0)
      i += 1
    }
    val strlBytes = strl.toByteArray
    val hdrlFull = new java.io.ByteArrayOutputStream()
    hdrlFull.write(hdrl.toByteArray)
    tag(hdrlFull, "LIST"); le32(hdrlFull, strlBytes.length)
    hdrlFull.write(strlBytes)
    val hdrlBytes = hdrlFull.toByteArray
    val idx = new java.io.ByteArrayOutputStream()
    for (f <- 0 until nf) {
      tag(idx, "00dc")
      le32(idx, if (f == 0) 0x10 else 0) // AVIIF_KEYFRAME on frame 0 only
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

  /** Decode one RLE8 chunk ONTO the persistent canvas (the temporal
    * state). Returns false on any malformed stream: run past row end,
    * position out of bounds, missing end-of-bitmap, truncated escape.
    */
  private def decodeChunk(data: Array[Byte], from: Int, len: Int,
      canvas: Array[Byte], w: Int, h: Int): Boolean = {
    var i = from
    val end = from + len
    var x = 0
    var y = 0
    while (i < end) {
      if (i + 1 >= end) return false // a lone trailing byte is malformed
      val b1 = data(i) & 0xff
      val b2 = data(i + 1) & 0xff
      i += 2
      if (b1 > 0) { // encoded run
        if (y >= h || x + b1 > w) return false
        java.util.Arrays.fill(canvas, y * w + x, y * w + x + b1, b2.toByte)
        x += b1
      } else b2 match {
        case 0 => // end of line
          x = 0; y += 1
          if (y > h) return false
        case 1 => // end of bitmap
          return true
        case 2 => // delta: move WITHOUT writing — pixels stay previous-frame
          if (i + 1 >= end) return false
          x += data(i) & 0xff; y += data(i + 1) & 0xff
          i += 2
          if (x > w || y > h) return false
        case n => // absolute mode: n literal indices, word-aligned
          if (y >= h || x + n > w) return false
          if (i + n > end) return false
          var k = 0
          while (k < n) { canvas(y * w + x + k) = data(i + k); k += 1 }
          x += n
          i += n + (n & 1)
      }
    }
    false // ran out of data without end-of-bitmap
  }

  /** Decoded frames: (width, height, luminance planes in frame order) —
    * each frame a SNAPSHOT of the persistent canvas after its chunk, with
    * indices resolved through the palette (luminance of the RGBQUAD).
    * None for non-MRLE/malformed containers, wrong keyframe flags, or a
    * bad index.
    */
  def decodeFrames(p: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] =
    try decodeFramesImpl(p)
    catch {
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
    var vidsOk = false
    var palette: Array[Int] = null // luminance per index
    var moviStart = -1; var moviEnd = -1
    var idxStart = -1; var idxLen = -1
    while (i + 8 <= riffEnd) {
      val sz = rd32(p, i + 4)
      if (sz < 0) return None
      if (isTag(p, i, "LIST") && isTag(p, i + 8, "hdrl")) {
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
                vidsOk = isTag(p, k + 8, "vids") && isTag(p, k + 12, "MRLE")
              else if (isTag(p, k, "strf") && ssz >= 40) {
                // BITMAPINFOHEADER: 8 bpp BI_RLE8, then the RGBQUAD table
                val bo = k + 8
                val bpp = rd16(p, bo + 14)
                val comp = rd32(p, bo + 16)
                var used = rd32(p, bo + 32)
                if (used == 0) used = 256
                if (bpp == 8 && comp == 1 && used > 0 && used <= 256 &&
                    ssz >= 40 + used * 4) {
                  palette = new Array[Int](256)
                  var c = 0
                  while (c < used) {
                    val b = p(bo + 40 + 4 * c) & 0xff
                    val g = p(bo + 40 + 4 * c + 1) & 0xff
                    val r = p(bo + 40 + 4 * c + 2) & 0xff
                    palette(c) = (299 * r + 587 * g + 114 * b) / 1000
                    c += 1
                  }
                }
              }
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
    if (totalFrames < 0 || totalFrames > MaxFrames || !vidsOk ||
        palette == null || moviStart < 0) return None
    if (w <= 0 || h <= 0 || w.toLong * h > (1 << 24)) return None
    val canvas = new Array[Byte](w * h) // the persistent temporal state
    val frames = Seq.newBuilder[Array[Byte]]
    val walk = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var j = moviStart + 4
    var n = 0
    while (j + 8 <= moviEnd) {
      val csz = rd32(p, j + 4)
      if (csz < 0 || j + 8L + csz > moviEnd) return None
      if (isTag(p, j, "00dc")) {
        if (n >= MaxFrames) return None
        if (!decodeChunk(p, j + 8, csz, canvas, w, h)) return None
        val lum = new Array[Byte](w * h)
        var q = 0
        while (q < lum.length) { lum(q) = palette(canvas(q) & 0xff).toByte; q += 1 }
        frames += lum
        walk += ((j - moviStart, csz))
        n += 1
      }
      j += 8 + csz + (csz & 1)
    }
    if (n != totalFrames) return None
    if (idxStart >= 0) { // validate index incl. the keyframe flags
      if (idxLen != 16 * n) return None
      for (f <- 0 until n) {
        val e = idxStart + 16 * f
        if (!isTag(p, e, "00dc")) return None
        val flags = rd32(p, e + 4)
        // frame 0 is the keyframe; delta frames must not claim to be
        if ((f == 0) != ((flags & 0x10) != 0)) return None
        val off = rd32(p, e + 8); val sz = rd32(p, e + 12)
        val (woff, wsz) = walk(f)
        if (sz != wsz || (off != woff && off != moviStart + woff))
          return None
      }
    }
    Some((w, h, frames.result()))
  }
}

/** Registered queries for the inter-predicted video family. */
object RleVideoQueries {
  import RleVideoCodec._

  final case class RleFrame(doc_id: Long, frame_idx: Int, n_frames: Int,
      mean_lum: Double, max_lum: Int)

  /** Inter-predicted video decode end-to-end: payload → MRLE AVI
    * (keyframe + DELTA frames whose static bottom half is never re-sent)
    * → full decode through the persistent canvas → per-frame luminance
    * stats. The oracle's closed form includes the STATIC region's value
    * in every frame's mean, so a decoder that fails to carry pixels
    * across frames (or misapplies the delta escape) hash-mismatches on
    * every non-key frame — the temporal-prediction pin. Map-only,
    * partition-parallel, one-to-many (doc → frames).
    */
  def decodeContentRleVideo(media: Dataset[MediaRow]): Dataset[RleFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (w, h, frames) = decodeFrames(encode(r.payload))
        .getOrElse(throw new IllegalStateException("MRLE roundtrip failed"))
      frames.iterator.zipWithIndex.map { case (px, f) =>
        var sum = 0L
        var mx = 0
        px.foreach { b => val v = b & 0xff; sum += v; if (v > mx) mx = v }
        RleFrame(r.doc_id, f, frames.length, sum.toDouble / (w * h), mx)
      }
    }
  }

  val q278RleVideoDecode = GraftQuery(
    "q278_rle_video_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentRleVideo(media).toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          round(col("mean_lum"), 6).as("mean_lum"), col("max_lum"))
        .orderBy("doc_id", "frame_idx")
    },
    // closed form: frame mean = (256*s + 224*v_f + 32*(v_f & 127) + 496)/512
    // with s = byte 0 (the static half, carried temporally into EVERY
    // frame) and v_f = byte 8f; max = max(s, v_f, (v_f & 127) + 31)
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
           |         ELSE 0 END AS vf
           |  FROM f)
           |SELECT doc_id, frame_idx, nf AS n_frames,
           |  round((256 * s + 224 * vf + 32 * (vf % 128) + 496) / 512.0, 6)
           |    AS mean_lum,
           |  greatest(s, vf, (vf % 128) + 31) AS max_lum
           |FROM v ORDER BY doc_id, frame_idx""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q278RleVideoDecode)
}
