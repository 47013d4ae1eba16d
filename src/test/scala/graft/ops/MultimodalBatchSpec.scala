package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class MultimodalBatchSpec extends AnyFunSuite with SparkSpec {

  test("batched decode equals row-at-a-time decode (batch boundary parity)") {
    import spark.implicits._
    val media = Multimodal.attachBinary(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .as[Multimodal.MediaRow]
    val rowWise = Multimodal.decodeMeta(media).orderBy("doc_id").collect()
    // batchSize smaller than partition row counts so grouping really kicks in
    val batched = Multimodal.decodeMetaBatched(media, batchSize = 7)
      .orderBy("doc_id").collect()
    assert(rowWise.length == batched.length && rowWise.length > 0)
    assert(rowWise.sameElements(batched))
  }

  // -- real container bytes for the HeaderCodec specs ----------------------

  /** A genuine minimal PNG: signature + IHDR chunk for a 640×480 8-bit RGB
    * image (chunk CRC bytes present but unvalidated by a header parse).
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++ // file hdr
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) // BITMAPINFOHEADER
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](w.toByte, (w >>> 8).toByte, h.toByte, (h >>> 8).toByte, 0, 0, 0)

  private def wavBytes(rate: Int, channels: Int): Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(36) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * 2) ++ le16(channels * 2) ++ le16(16)
  }

  test("HeaderCodec parses real PNG / BMP / GIF / WAV headers") {
    assert(Multimodal.HeaderCodec.sniff(pngBytes(640, 480)) == "png")
    assert(Multimodal.HeaderCodec.decode(pngBytes(640, 480)) == Some((640, 480)))
    assert(Multimodal.HeaderCodec.decode(pngBytes(1, 1)) == Some((1, 1)))
    assert(Multimodal.HeaderCodec.sniff(bmpBytes(800, 600)) == "bmp")
    assert(Multimodal.HeaderCodec.decode(bmpBytes(800, 600)) == Some((800, 600)))
    assert(Multimodal.HeaderCodec.sniff(gifBytes(320, 200)) == "gif")
    assert(Multimodal.HeaderCodec.decode(gifBytes(320, 200)) == Some((320, 200)))
    assert(Multimodal.HeaderCodec.sniff(wavBytes(44100, 2)) == "wav")
    assert(Multimodal.HeaderCodec.decode(wavBytes(44100, 2)) == Some((44100, 2)))
  }

  test("HeaderCodec rejects text, truncated, and lookalike payloads") {
    val codec = Multimodal.HeaderCodec
    assert(codec.sniff("plain document text long enough to sniff".getBytes) == "unknown")
    // ASCII starting with BM must NOT classify as bmp (DIB size gate)
    assert(codec.sniff("BM industries quarterly report 2024".getBytes) == "unknown")
    assert(codec.sniff(pngBytes(640, 480).take(12)) == "unknown") // truncated
    assert(codec.decode(Array.emptyByteArray).isEmpty)
  }

  test("decodeMeta uses real header dims for containers, stub for text") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, pngBytes(640, 480)),
      Multimodal.MediaRow(2L, bmpBytes(800, 600)),
      Multimodal.MediaRow(3L, wavBytes(16000, 1)),
      Multimodal.MediaRow(4L, "just text".getBytes("US-ASCII"))
    ).toDS()
    val got = Multimodal.decodeMeta(media).orderBy("doc_id").collect()
    assert(got.map(m => (m.doc_id, m.width, m.height)).toSeq == Seq(
      (1L, 640, 480), (2L, 800, 600), (3L, 16000, 1),
      (4L, 64 + 'j' % 64, 64 + 'u' % 64)))
    // batched path agrees on the mixed payload set
    val batched = Multimodal.decodeMetaBatched(media, batchSize = 2)
      .orderBy("doc_id").collect()
    assert(got.sameElements(batched))
  }

  test("BmpCodec roundtrips payload bytes through a genuine BMP container") {
    val payload = (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val bmp = BmpCodec.encode(payload)
    assert(Multimodal.HeaderCodec.sniff(bmp) == "bmp")
    // header parse agrees with the encode geometry
    assert(Multimodal.HeaderCodec.decode(bmp) == Some((16, 3))) // ceil(100/48)=3
    val Some((w, h, px)) = BmpCodec.decodePixels(bmp)
    assert((w, h) == (16, 3))
    // decoded top-down pixels = payload then zero padding
    assert(px.take(100).sameElements(payload))
    assert(px.drop(100).forall(_ == 0))
    // width not a multiple of 4: decode honors the padded row stride.
    // hand-build a 3×2 24-bit BMP (stride 12 = 9 data + 3 pad) bottom-up
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val row0 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9) // top row
    val row1 = Array[Byte](10, 11, 12, 13, 14, 15, 16, 17, 18)
    val pad = Array[Byte](0, 0, 0)
    val strided = "BM".getBytes("US-ASCII") ++ le32(54 + 24) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++ le32(24) ++
      Array.fill[Byte](16)(0) ++ // rest of BITMAPINFOHEADER to byte 54
      row1 ++ pad ++ row0 ++ pad // bottom-up storage
    val Some((w2, h2, px2)) = BmpCodec.decodePixels(strided)
    assert((w2, h2) == (3, 2))
    assert(px2.sameElements(row0 ++ row1)) // stride pad stripped, rows flipped
    // hostile header: height = Int.MinValue defeats Int-domain abs (still
    // negative), which would turn the size guards into negative-product
    // no-ops and crash the allocation — must be rejected, not thrown
    val hostile = strided.clone()
    hostile(22) = 0; hostile(23) = 0; hostile(24) = 0; hostile(25) = 0x80.toByte
    assert(BmpCodec.decodePixels(hostile).isEmpty)
  }

  test("resizeNearest: identity at same size, floor-mapped sampling when shrinking") {
    val src = Array.tabulate(6 * 4)(i => i.toByte) // 6 wide, 4 tall
    assert(Multimodal.resizeNearest(src, 6, 4, 6, 4).sameElements(src))
    val half = Multimodal.resizeNearest(src, 6, 4, 3, 2)
    // sx = x*6/3 = 2x, sy = y*4/2 = 2y → bytes at (2y)*6 + 2x
    assert(half.toSeq == Seq[Byte](0, 2, 4, 12, 14, 16))
  }

  test("WavCodec roundtrips samples and walks non-canonical chunk layouts") {
    val payload = Array[Byte](0x10, 0x00, 0x00, 0x7f, 0xff.toByte, 0xff.toByte, 0x55)
    val wav = WavCodec.encode(payload)
    assert(Multimodal.HeaderCodec.sniff(wav) == "wav")
    val Some(samples) = WavCodec.decodeSamples(wav)
    // LE pairs: (0x10,0x00)=16, (0x00,0x7f)=32512, (0xff,0xff)=-1,
    // odd tail (0x55) padded with zero high byte = 85
    assert(samples.toSeq == Seq[Short](16, 32512, -1, 85))
    // decoder must WALK chunks, not assume fmt at byte 12: insert a junk
    // chunk before fmt and data
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val data = Array[Byte](3, 0, 0xfe.toByte, 0xff.toByte) // samples 3, -2
    val shuffled = "RIFF".getBytes("US-ASCII") ++ le32(4 + 12 + 24 + 12) ++
      "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(4) ++ data
    assert(WavCodec.decodeSamples(shuffled).map(_.toSeq) ==
      Some(Seq[Short](3, -2)))
    // non-PCM (format tag 3 = float) is refused, not misread
    val floatFmt = shuffled.clone()
    floatFmt(32) = 3 // audioFormat field of the fmt chunk
    assert(WavCodec.decodeSamples(floatFmt).isEmpty)
  }

  test("PngCodec roundtrips through a genuine compressed filtered PNG") {
    val payload = (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val png = PngCodec.encode(payload)
    assert(Multimodal.HeaderCodec.sniff(png) == "png")
    assert(Multimodal.HeaderCodec.decode(png) == Some((16, 3)))
    val Some((w, h, px, kinds)) = PngCodec.decodePixels(png)
    assert((w, h) == (16, 3))
    assert(px.take(100).sameElements(payload))
    assert(px.drop(100).forall(_ == 0))
    assert(kinds == 2, "encode uses real Sub+Up filter bytes")
    // single-row image: only the Sub filter appears
    val one = PngCodec.encode(Array[Byte](1, 2, 3))
    assert(PngCodec.decodePixels(one).map(_._4) == Some(1))
  }

  test("PngCodec unfilters None/Average/Paeth and verifies chunk CRCs") {
    // hand-build a 2x3 RGB8 PNG with filter types 0/3/4, forward-filtering
    // here independently of the codec, and require exact reconstruction
    val w = 2; val rowB = w * 3
    val pixels = Array[Array[Int]](
      Array(10, 20, 30, 40, 50, 60),
      Array(5, 5, 5, 9, 9, 9),
      Array(7, 8, 9, 10, 11, 12))
    val filters = Array(0, 3, 4)
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- pixels.indices) {
      raw.write(filters(r))
      for (c <- 0 until rowB) {
        val x = pixels(r)(c)
        val left = if (c >= 3) pixels(r)(c - 3) else 0
        val up = if (r > 0) pixels(r - 1)(c) else 0
        val upLeft = if (r > 0 && c >= 3) pixels(r - 1)(c - 3) else 0
        val pred = filters(r) match {
          case 0 => 0
          case 3 => (left + up) / 2
          case 4 =>
            val pp = left + up - upLeft
            val pa = math.abs(pp - left); val pb = math.abs(pp - up)
            val pc = math.abs(pp - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        raw.write((x - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ data
      val c = new java.util.zip.CRC32(); c.update(body)
      be32(data.length) ++ body ++ be32(c.getValue.toInt)
    }
    val ihdr = be32(w) ++ be32(3) ++ Array[Byte](8, 2, 0, 0, 0)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((dw, dh, px, kinds)) = PngCodec.decodePixels(png)
    assert((dw, dh) == (2, 3))
    assert(px.map(_ & 0xff).toSeq == pixels.flatten.toSeq)
    assert(kinds == 3)
    // a corrupted IDAT byte must fail the CRC walk, not mis-decode
    val bad = png.clone()
    bad(8 + 25 + 8 + 2) = (bad(8 + 25 + 8 + 2) ^ 0x01).toByte
    assert(PngCodec.decodePixels(bad).isEmpty)
    // unsupported profile (grayscale color type) is refused on a PNG whose
    // CRCs are valid — the IHDR check itself, not the CRC walk
    val grayIhdr = be32(w) ++ be32(3) ++ Array[Byte](8, 0, 0, 0, 0)
    val gray = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", grayIhdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    assert(PngCodec.decodePixels(gray).isEmpty)
  }

  test("decodeContent mean/RMS match direct byte arithmetic") {
    import spark.implicits._
    val p1 = "hello multimodal world".getBytes("US-ASCII")
    val media = Seq(Multimodal.MediaRow(1L, p1)).toDS()
    val got = Multimodal.decodeContent(media).collect().head
    val expMean = p1.map(_ & 0xff).sum.toDouble / 48 // 1 row of 48 channel bytes
    val n = (p1.length + 1) / 2
    val expSq = (0 until n).map { k =>
      val lo = p1(2 * k) & 0xff
      val hi = if (2 * k + 1 < p1.length) p1(2 * k + 1) & 0xff else 0
      val v = (lo | (hi << 8)).toShort.toLong
      v * v
    }.sum
    assert(got.bmp_w == 16 && got.bmp_h == 1 && got.n_samples == n)
    assert(math.abs(got.mean_pixel - expMean) < 1e-9)
    assert(math.abs(got.rms_amplitude - math.sqrt(expSq.toDouble / n)) < 1e-9)
  }

  test("frame sampling expands payloads one-to-many with correct offsets") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Array.fill[Byte](1025)(65)), // 3 frames: 0,512,1024
      Multimodal.MediaRow(2L, Array.emptyByteArray) // no frames
    ).toDS()
    val got = Multimodal.sampleFrames(media, 512).orderBy("doc_id", "frame_id").collect()
    assert(got.map(f => (f.doc_id, f.frame_id, f.off)).toSeq ==
      Seq((1L, 0, 0), (1L, 1, 512), (1L, 2, 1024)))
    assert(got.forall(_.frame_w == 64 + 65 % 64))
  }
}
