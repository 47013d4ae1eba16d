package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BmpCodec
import graft.ops.GifCodec
import graft.ops.PngCodec
import graft.ops.WavCodec

/** Property form of the lossless-container contract shared by the BMP, PNG,
  * GIF, and WAV codecs: for ANY payload, decode(encode(p)) returns exactly
  * p under each container's documented byte→pixel/sample mapping (zero
  * padding to the row/sample grain). The directed specs pin hand-picked
  * shapes; these sweep random lengths across row boundaries with random,
  * repetitive, and cycling content — LZW dictionary resets, PNG filter
  * choices, and BMP row strides all shift with length and content.
  */
class LosslessContainerPropertySpec extends AnyFunSuite with graft.SeededGen {

  private val genPayload: Gen[Array[Byte]] = for {
    n   <- Gen.frequency(
             4 -> Gen.choose(0, 5000),
             1 -> Gen.oneOf(0, 1, 15, 16, 17, 47, 48, 49, 4095, 4096))
    arr <- Gen.frequency(
             3 -> Gen.containerOfN[Array, Byte](n,
                    Gen.choose(Byte.MinValue, Byte.MaxValue)),
             1 -> Gen.choose(Byte.MinValue, Byte.MaxValue)
                    .map(b => Array.fill(n)(b)),
             1 -> Gen.const(Array.tabulate(n)(i => (i % 251).toByte)))
  } yield arr

  private def padded(p: Array[Byte], len: Int): Array[Byte] =
    java.util.Arrays.copyOf(p, len)

  test("property: BMP, PNG, GIF, and WAV round-trip arbitrary payloads " +
    "exactly under their documented mappings") {
    val payloads = sample(genPayload, 30, 0x10551E55L)
    assert(payloads.size >= 25)
    payloads.foreach { p =>
      val hRgb = math.max(1, (p.length + 47) / 48)
      val (bw, bh, bpx) = BmpCodec.decodePixels(BmpCodec.encode(p))
        .getOrElse(fail(s"bmp decode failed at len ${p.length}"))
      assert((bw, bh) == (16, hRgb), s"bmp geometry at len ${p.length}")
      assert(java.util.Arrays.equals(bpx, padded(p, hRgb * 48)),
        s"bmp content at len ${p.length}")

      val png = PngCodec.decodePixels(PngCodec.encode(p))
        .getOrElse(fail(s"png decode failed at len ${p.length}"))
      assert((png._1, png._2) == (16, hRgb), s"png geometry at len ${p.length}")
      assert(java.util.Arrays.equals(png._3, padded(p, hRgb * 48)),
        s"png content at len ${p.length}")

      val hIdx = math.max(1, (p.length + 15) / 16)
      val (gw, gh, gpx) = GifCodec.decodePixels(GifCodec.encode(p))
        .getOrElse(fail(s"gif decode failed at len ${p.length}"))
      assert((gw, gh) == (16, hIdx), s"gif geometry at len ${p.length}")
      assert(java.util.Arrays.equals(gpx, padded(p, hIdx * 16)),
        s"gif content at len ${p.length}")

      val n16 = math.max(1, (p.length + 1) / 2)
      val even = padded(p, n16 * 2)
      val expectSamples = Array.tabulate(n16) { i =>
        ((even(2 * i) & 0xff) | (even(2 * i + 1) << 8)).toShort
      }
      val got = WavCodec.decodeSamples(WavCodec.encode(p))
        .getOrElse(fail(s"wav decode failed at len ${p.length}"))
      assert(got.sameElements(expectSamples), s"wav content at len ${p.length}")
    }
  }
}
