package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MuLawCodec

/** G.711 μ-law expansion against the standard's fixed points, curve shape,
  * and container handling.
  */
class MuLawCodecSpec extends AnyFunSuite {

  test("expansion hits the G.711 fixed points") {
    assert(MuLawCodec.expand(0x00) == -32124) // maximum negative
    assert(MuLawCodec.expand(0x80) == 32124)  // maximum positive
    assert(MuLawCodec.expand(0xff) == 0)      // positive zero
    assert(MuLawCodec.expand(0x7f) == 0)      // negative zero
  }

  test("expansion is monotone along each sign half of the code space") {
    // positive codes 0x80..0xFF decode to non-increasing magnitudes;
    // negative codes 0x00..0x7F to non-decreasing (more negative → larger)
    for (c <- 0x80 until 0xff)
      assert(MuLawCodec.expand(c) >= MuLawCodec.expand(c + 1))
    for (c <- 0x00 until 0x7f)
      assert(MuLawCodec.expand(c) <= MuLawCodec.expand(c + 1))
  }

  test("container round-trip expands payload codes; junk chunks tolerated") {
    val payload = Array[Byte](0x00, 0xff.toByte, 0x80.toByte, 0x42)
    val wav = MuLawCodec.encode(payload)
    assert(Multimodal.HeaderCodec.sniff(wav) == "wav")
    val Some(samples) = MuLawCodec.decodeSamples(wav)
    assert(samples.toSeq == payload.map(b => MuLawCodec.expand(b & 0xff)).toSeq)
    // 16-bit PCM WavCodec must NOT accept a mu-law container and vice versa
    assert(WavCodec.decodeSamples(wav).isEmpty)
    assert(MuLawCodec.decodeSamples(WavCodec.encode(payload)).isEmpty)
    // decoder walks chunks: junk chunk before fmt and data
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val data = Array[Byte](0x00, 0x80.toByte)
    val wonky = "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + 4 + 8 + 16 + 8 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ le32(4) ++ Array[Byte](1, 2, 3, 4) ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(7) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val Some(got) = MuLawCodec.decodeSamples(wonky)
    assert(got.toSeq == Seq[Short](-32124, 32124))
  }

  test("hostile negative chunk size is rejected, not an infinite walk") {
    // corrupt the fmt chunk size to 0x80000000 — a backwards-walking size
    for (mk <- Seq[Array[Byte] => Array[Byte]](
        p => { val q = p.clone(); q(19) = 0x80.toByte; q }, // fmt size hi byte
        p => { val q = p.clone(); q(43) = 0x80.toByte; q })) { // data size hi byte
      val bad = mk(MuLawCodec.encode(Array[Byte](1, 2, 3, 4)))
      assert(MuLawCodec.decodeSamples(bad).isEmpty)
      val badPcm = mk(WavCodec.encode(Array[Byte](1, 2, 3, 4)))
      assert(WavCodec.decodeSamples(badPcm).isEmpty)
    }
  }
}
