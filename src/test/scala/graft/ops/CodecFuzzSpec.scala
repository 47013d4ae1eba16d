package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal._

/** Deterministic corruption fuzz across every container codec: decoders run
  * inside mapPartitions tasks, so on ANY corrupt input they must return
  * None (or a wrong-but-bounded value) — never throw, never hang, never
  * allocate past the decode budget. One byte flipped at every position and
  * every truncation length, per format.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val payload =
    (0 until 64).map(i => ((i * 31 + 7) % 256).toByte).toArray

  private def fuzz(name: String, container: Array[Byte],
      decode: Array[Byte] => Any): Unit = {
    for (i <- container.indices) {
      val mut = container.clone()
      mut(i) = (mut(i) ^ ((i * 41 + 3) & 0xff)).toByte
      try decode(mut) catch {
        case e: Throwable =>
          fail(s"$name decode threw ${e.getClass.getSimpleName} with byte $i flipped")
      }
      try decode(container.take(i)) catch {
        case e: Throwable =>
          fail(s"$name decode threw ${e.getClass.getSimpleName} truncated at $i")
      }
    }
  }

  test("BMP decode survives every one-byte flip and truncation") {
    fuzz("bmp", BmpCodec.encode(payload), BmpCodec.decodePixels)
  }

  test("PNG decode survives every one-byte flip and truncation") {
    fuzz("png", PngCodec.encode(payload), PngCodec.decodePixels)
  }

  test("GIF decode survives every one-byte flip and truncation") {
    fuzz("gif", GifCodec.encode(payload), GifCodec.decodePixels)
  }

  test("WAV and mu-law decode survive every one-byte flip and truncation") {
    fuzz("wav", WavCodec.encode(payload), WavCodec.decodeSamples)
    fuzz("mulaw", MuLawCodec.encode(payload), MuLawCodec.decodeSamples)
  }

  test("ADPCM decode survives every one-byte flip and truncation") {
    fuzz("adpcm", AdpcmCodec.encode(payload), AdpcmCodec.decodeSamples)
  }

  test("Layer III-class decode survives every one-byte flip and truncation") {
    val pcm = payload.map(b => ((((b & 0xff) - 128) * 256)).toShort)
    fuzz("mpeg-l3", MpegL3Codec.encodeL3(pcm), MpegL3Codec.decodeL3)
  }

  test("MPEG video decode survives every one-byte flip and truncation") {
    fuzz("mpeg-video", MpegVideoCodec.encode(payload),
      MpegVideoCodec.decodeFrames)
  }

  test("MPEG audio decode survives every one-byte flip and truncation") {
    val pcm = payload.map(b => ((((b & 0xff) - 128) * 256)).toShort)
    fuzz("mpeg-l2", MpegAudioCodec.encodeL2(pcm), MpegAudioCodec.decodeSamples)
    fuzz("mpeg-l1", MpegAudioCodec.encodeL1(pcm), MpegAudioCodec.decodeSamples)
  }

  test("MRLE video decode survives every one-byte flip and truncation") {
    fuzz("mrle-avi", RleVideoCodec.encode(payload), RleVideoCodec.decodeFrames)
  }

  test("FLAC decode survives every one-byte flip and truncation") {
    fuzz("flac", FlacCodec.encode(payload), FlacCodec.decodeSamples)
    val l = payload.map(b => ((b & 0xff) - 128) * 200)
    val r = l.map(_ + 3)
    fuzz("flac-stereo", FlacCodec.encodePcmStereo(l, r), FlacCodec.decodeStereo)
  }

  test("MJPEG AVI decode survives every one-byte flip and truncation") {
    fuzz("mjpeg-avi", MjpegAviCodec.encode(payload), MjpegAviCodec.decodeFrames)
  }

  test("WARC parse survives every one-byte flip and truncation") {
    import graft.ops.Warc.WarcCodec
    val blob = WarcCodec.record(
      Seq("WARC-Type" -> "warcinfo"), "software: graft\r\n".getBytes) ++
      WarcCodec.record(
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> "https://corpus.example/doc/7"),
        "HTTP/1.1 200 OK\r\nWARC/1.0\r\n\r\n<html>x</html>".getBytes)
    fuzz("warc", blob, WarcCodec.parseRecords)
  }

  test("MJPEG AVI walker survives crafted near-Int.MaxValue chunk sizes") {
    // Single-byte flips of the small encoder output can never produce a
    // size field near Int.MaxValue, so the three chunk walks (top-level,
    // hdrl, strl) get dedicated crafted inputs whose `8 + sz` advance
    // would wrap negative without the Long-clamped advance.
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def bytes(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    val big = le32(0x7ffffff4)
    val top = bytes("RIFF".getBytes, le32(16), "AVI ".getBytes,
      "JUNK".getBytes, big, Array.fill(4)(0.toByte))
    assert(MjpegAviCodec.decodeFrames(top).isEmpty)
    val hdrl = bytes("RIFF".getBytes, le32(32), "AVI ".getBytes,
      "LIST".getBytes, le32(0x7ffffff0), "hdrl".getBytes,
      "avih".getBytes, big, Array.fill(8)(0.toByte))
    assert(MjpegAviCodec.decodeFrames(hdrl).isEmpty)
    val strl = bytes("RIFF".getBytes, le32(44), "AVI ".getBytes,
      "LIST".getBytes, le32(0x7ffffff0), "hdrl".getBytes,
      "LIST".getBytes, le32(0x7fffffe0), "strl".getBytes,
      "strh".getBytes, big, Array.fill(8)(0.toByte))
    assert(MjpegAviCodec.decodeFrames(strl).isEmpty)
  }

  test("color JPEG decode survives every one-byte flip and truncation") {
    fuzz("jpeg-color", JpegCodec.encodeColor(payload), JpegCodec.decodeColorPixels)
    fuzz("jpeg-420", JpegCodec.encode420(payload), JpegCodec.decodeColorPixels)
  }

  test("arithmetic JPEG decode survives every one-byte flip and truncation") {
    fuzz("jpeg-arith", JpegArith.encodeArith(payload), JpegArith.decodeArithPixels)
    fuzz("jpeg-arith-rst", JpegArith.encodeArith(payload, restartInterval = 3),
      JpegArith.decodeArithPixels)
    fuzz("jpeg-arith-color", JpegArith.encodeColorArith(payload),
      JpegArith.decodeArithColorPixels)
  }

  test("progressive JPEG decode survives every one-byte flip and truncation") {
    fuzz("jpeg-prog", JpegProgressive.encodeProgressive(payload),
      JpegProgressive.decodeProgressivePixels)
    fuzz("jpeg-prog-rich", JpegProgressive.encodeProgressiveRich(payload),
      JpegProgressive.decodeProgressivePixels)
  }

  test("header-level decodeDims (the q32 path) survives corruption of every format") {
    for ((name, c) <- Seq(
        "bmp" -> BmpCodec.encode(payload), "png" -> PngCodec.encode(payload),
        "gif" -> GifCodec.encode(payload), "wav" -> WavCodec.encode(payload),
        "jpeg" -> JpegCodec.encode(payload)))
      fuzz(s"dims:$name", c, decodeDims)
  }
}
