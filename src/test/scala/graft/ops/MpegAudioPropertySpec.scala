package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SeededGen
import graft.ops.MpegAudioCodec._

/** Seeded property round-trips for the MPEG-1 audio codec: arbitrary
  * content families × bitrates through the full encode→decode chain, the
  * side-info/code checksum as the bitstream-layer equality witness, plus
  * garbage-bytes fail-soft. Deterministic seeds (SeededGen) — no flakes.
  */
class MpegAudioPropertySpec extends AnyFunSuite with SeededGen {

  // content families: tones, noise, DC steps, impulses, byte-derived
  private val genPcm: Gen[Array[Short]] = for {
    kind <- Gen.choose(0, 4)
    n <- Gen.choose(1, 4000)
    seed <- Gen.choose(0, 1 << 20)
  } yield {
    val rnd = new scala.util.Random(seed)
    kind match {
      case 0 => // tone mix
        val f1 = 30.0 + rnd.nextDouble() * 20000
        val f2 = 30.0 + rnd.nextDouble() * 20000
        Array.tabulate(n)(i => ((math.sin(2 * math.Pi * f1 / 48000 * i) * 12000 +
          math.sin(2 * math.Pi * f2 / 48000 * i) * 8000)).toShort)
      case 1 => Array.fill(n)((rnd.nextInt(65536) - 32768).toShort) // white
      case 2 => // DC steps
        var lvl = 0
        Array.tabulate(n) { i =>
          if (i % 500 == 0) lvl = rnd.nextInt(50000) - 25000
          lvl.toShort
        }
      case 3 => // sparse impulses
        Array.tabulate(n)(i => if (rnd.nextInt(97) == 0) 30000.toShort else 0.toShort)
      case 4 => // one-pole shaped bytes (the q277 signal class)
        var acc = 0.0
        Array.tabulate(n) { _ =>
          acc = 0.85 * acc + 0.45 * ((rnd.nextInt(256) - 128) * 256)
          StrictMath.rint(acc).toInt.max(-32768).min(32767).toShort
        }
    }
  }

  test("L2: every (content, bitrate) round-trips with checksum equality and sane geometry") {
    val cases = sample(Gen.zip(genPcm, Gen.choose(3, 10)), 60, 0xA11D10L)
    for (((pcm, br), i) <- cases.zipWithIndex) {
      val (bytes, encSum) = encodeL2WithSum(pcm, br)
      val frameBytes = 144 * (BitratesL2(br) * 1000) / SampleRate
      assert(bytes.length % frameBytes == 0, s"case $i: partial frame")
      val dec = decodeSamplesWithSum(bytes)
      assert(dec.isDefined, s"case $i: decode failed (n=${pcm.length}, br=$br)")
      val (out, decSum) = dec.get
      assert(decSum == encSum, s"case $i: checksum mismatch")
      assert(out.length == bytes.length / frameBytes * 1152, s"case $i: length")
      // enough frames to flush the 481-sample delay past the input
      assert(out.length >= pcm.length + CodecDelay, s"case $i: under-flushed")
    }
  }

  test("L1: every content case round-trips with checksum equality") {
    val cases = sample(genPcm, 40, 0xA11D11L)
    for ((pcm, i) <- cases.zipWithIndex) {
      val (bytes, encSum) = encodeL1WithSum(pcm)
      val dec = decodeSamplesWithSum(bytes)
      assert(dec.isDefined, s"case $i: decode failed (n=${pcm.length})")
      assert(dec.get._2 == encSum, s"case $i: checksum mismatch")
      assert(dec.get._1.length >= pcm.length + CodecDelay, s"case $i: under-flushed")
    }
  }

  test("tonal content beats white noise at the same bitrate (the perceptual claim)") {
    // the dynamic allocation's reason to exist: concentrated spectra get
    // concentrated bits; measured SNR must show it at the lowest rate
    val n = 6000
    val tone = Array.tabulate(n)(i =>
      (18000 * math.sin(2 * math.Pi * 700.0 / 48000 * i)).toShort)
    val rnd = new scala.util.Random(3)
    val white = Array.fill(n)(((rnd.nextInt(32768) - 16384) * 1.1).toShort)
    val toneSnr = snrDb(tone, decodeSamples(encodeL2(tone, 3)).get)
    val whiteSnr = snrDb(white, decodeSamples(encodeL2(white, 3)).get)
    assert(toneSnr > whiteSnr + 15.0,
      s"tone $toneSnr dB vs white $whiteSnr dB at 56 kbps")
  }

  test("garbage bytes are fail-soft (arbitrary non-frame content decodes to None)") {
    val genBytes = for {
      n <- Gen.choose(0, 600)
      seed <- Gen.choose(0, 1 << 20)
    } yield {
      val rnd = new scala.util.Random(seed)
      Array.fill(n)(rnd.nextInt(256).toByte)
    }
    for (g <- sample(genBytes, 300, 0xA11D12L)) {
      decodeSamples(g) // must never throw; None expected unless a miracle
      ()
    }
  }
}
