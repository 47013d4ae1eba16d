package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FlacCodec

/** Property-based widening of FlacCodecSpec's directed cases: losslessness
  * is a universally-quantified claim (decode ∘ encode = id for EVERY
  * 16-bit PCM stream), so it is exactly the kind of contract random
  * generation strengthens — block-boundary lengths, constant runs inside
  * noise, clipped ramps, full-range extremes, and every encoder knob, in
  * combinations no directed table enumerates. Seeded generators keep every
  * run deterministic (no flaky CI): a failure prints the seed's sample.
  */
class FlacPropertySpec extends AnyFunSuite with graft.SeededGen {

  private def clamp16(v: Int): Int = math.max(-32768, math.min(32767, v))

  /** Content families a predictor codec treats differently: white noise
    * (Rice escapes / high params), constants (CONSTANT subframes), clipped
    * ramps (order-1/2 territory with saturation breaking the model), tones
    * (LPC territory), and noise with embedded constant runs (subframe-type
    * switches mid-stream). Lengths straddle the 256-sample block size.
    */
  private val genPcm: Gen[Array[Int]] = for {
    n    <- Gen.frequency(
              4 -> Gen.choose(1, 1500),
              1 -> Gen.oneOf(1, 2, 255, 256, 257, 511, 512, 513))
    base <- Gen.choose(-32768, 32767)
    arr  <- Gen.frequency(
      3 -> Gen.containerOfN[Array, Int](n, Gen.choose(-32768, 32767)),
      1 -> Gen.const(Array.fill(n)(base)),
      2 -> Gen.choose(-300, 300).map(step =>
             Array.tabulate(n)(i => clamp16(base + i * step))),
      2 -> Gen.zip(Gen.choose(1, 30000), Gen.choose(0.01, 3.0)).map {
             case (amp, w) =>
               Array.tabulate(n)(i => clamp16((amp * math.sin(i * w)).toInt))
           },
      1 -> Gen.containerOfN[Array, Int](n, Gen.choose(-32768, 32767)).map {
             a => // constant run embedded in noise
               val run = math.min(a.length, 300)
               java.util.Arrays.fill(a, 0, run, base); a
           })
  } yield arr

  test("property: mono PCM round-trips losslessly across content families " +
    "and every encoder setting") {
    val pcms = sample(genPcm, 40, 0xF1ACL)
    assert(pcms.size >= 35, "generator must produce samples")
    pcms.foreach { s =>
      val expect = s.map(_.toShort).toSeq
      // auto selection, forced verbatim, every forceable fixed order that
      // has enough warmup samples, and a spread of LPC orders
      val encodings =
        Seq(FlacCodec.encodePcm(s), FlacCodec.encodePcm(s, forceVerbatim = true)) ++
        (0 to 4).filter(_ < s.length).map(k => FlacCodec.encodePcm(s, forceOrder = k)) ++
        Seq(1, 2, 4, 8).filter(_ < s.length).map(k => FlacCodec.encodePcm(s, lpcOrder = k))
      encodings.foreach { bytes =>
        val got = FlacCodec.decodeSamples(bytes)
        assert(got.isDefined, s"decode failed for n=${s.length}")
        assert(got.get.toSeq == expect, s"round-trip mismatch at n=${s.length}")
      }
    }
  }

  test("property: stereo PCM round-trips losslessly under all four channel " +
    "assignments on independent random channels") {
    val pairs = sample(Gen.zip(genPcm, genPcm), 15, 0x57E2E0L)
    assert(pairs.size >= 12)
    pairs.foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      val l = a.take(n); val r = b.take(n)
      Seq("independent", "left-side", "right-side", "mid-side").foreach { mode =>
        val got = FlacCodec.decodeStereo(FlacCodec.encodePcmStereo(l, r, mode))
        assert(got.isDefined, s"decode failed: $mode n=$n")
        assert(got.get._1.toSeq == l.map(_.toShort).toSeq, s"$mode left n=$n")
        assert(got.get._2.toSeq == r.map(_.toShort).toSeq, s"$mode right n=$n")
      }
    }
  }

  test("property: random garbage bytes never throw out of the decoder") {
    val genJunk = for {
      n <- Gen.choose(0, 4096)
      b <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield b
    // half pure junk, half junk behind a genuine fLaC magic — the second
    // shape reaches the frame walker instead of dying at the sniff
    sample(genJunk, 60, 0xDEADL).zipWithIndex.foreach { case (junk, i) =>
      val payload =
        if (i % 2 == 0) junk
        else "fLaC".getBytes("US-ASCII") ++ junk
      FlacCodec.decodeSamples(payload)       // must return, not throw
      FlacCodec.decodeStereo(payload)
    }
  }
}
