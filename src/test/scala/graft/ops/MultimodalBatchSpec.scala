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
