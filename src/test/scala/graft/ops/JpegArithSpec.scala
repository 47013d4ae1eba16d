package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JpegCodec

/** The arithmetic-coded (SOF9) JPEG path: QM-coder round-trip through the
  * full container, general-content entropy-layer round-trip (all magnitude
  * categories, zero runs, EOB shapes, conditioning contexts), carry/stuffing
  * byte-discipline edge cases, restart resync, Table D.3 sanity invariants,
  * and the headline T.81 claim that adaptive arithmetic coding beats the
  * fixed Huffman tables on the same content.
  */
class JpegArithSpec extends AnyFunSuite {

  private val payload =
    (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray

  test("flat-block arithmetic encode decodes bit-exactly to the payload grid") {
    val jpg = JpegArith.encodeArith(payload)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val Some((w, h, px)) = JpegArith.decodeArithPixels(jpg)
    assert(w == 32 && h == 8 * 25)
    for (i <- 0 until 25 * 4) {
      val expected = if (i < payload.length) payload(i) & 0xff else 0
      val bx = i % 4; val by = i / 4
      for (y <- 0 until 8; x <- 0 until 8) {
        val got = px((by * 8 + y) * w + bx * 8 + x) & 0xff
        assert(got == expected, s"block $i pixel ($x,$y): $got != $expected")
      }
    }
  }

  test("arithmetic decode equals baseline Huffman decode on varied payloads") {
    for (n <- Seq(0, 1, 3, 4, 5, 64, 257)) {
      val p = (0 until n).map(i => ((i * 73 + n * 19) % 256).toByte).toArray
      val a = JpegArith.decodeArithPixels(JpegArith.encodeArith(p)).get
      val b = JpegCodec.decodePixels(JpegCodec.encode(p)).get
      assert(a._1 == b._1 && a._2 == b._2, s"dims differ at n=$n")
      assert(a._3.sameElements(b._3), s"pixels differ at n=$n")
    }
  }

  test("entropy layer round-trips arbitrary coefficient blocks exactly") {
    // deterministic pseudo-random blocks covering: zero blocks, DC-only,
    // dense AC, isolated high-k AC (the Kx>5 high-magnitude area), large
    // magnitudes (deep X walks + magnitude bits), long zero runs, ke = 63
    var seed = 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val blocks = Array.tabulate(200) { b =>
      val c = new Array[Int](64)
      b % 5 match {
        case 0 => // flat / DC-only, varied magnitudes incl. negatives
          c(0) = next(4001) - 2000
        case 1 => // dense small AC
          c(0) = next(255) - 127
          for (k <- 1 to 63) if (next(3) == 0) c(k) = next(7) - 3
          c(63) = 1 // force the ke = 63 no-EOB path sometimes
        case 2 => // sparse large AC across the Kx split
          c(0) = next(1001) - 500
          c(3) = next(2001) - 1000
          c(40) = next(2001) - 1000
        case 3 => // single trailing coefficient after a 62-zero run
          c(0) = 0
          c(next(63) + 1) = next(31) - 15 match { case 0 => 1; case v => v }
        case _ => // empty block (EOB at k=1, zero DC diff)
          ()
      }
      c
    }
    val data = JpegArith.arithEncodeBlocks(blocks)
    val back = JpegArith.arithDecodeBlocks(data, blocks.length)
    for (b <- blocks.indices)
      assert(back(b).sameElements(blocks(b)), s"block $b mismatched")
  }

  test("restart markers resync the coder, statistics, and DC prediction") {
    val plain = JpegArith.decodeArithPixels(JpegArith.encodeArith(payload)).get
    for (ri <- Seq(1, 2, 7)) {
      val rst = JpegArith.decodeArithPixels(
        JpegArith.encodeArith(payload, restartInterval = ri)).get
      assert(plain._3.sameElements(rst._3), s"restartInterval=$ri differs")
    }
  }

  test("adaptive arithmetic coding beats the fixed Huffman tables (T.81 claim)") {
    // skewed content (constant bytes) is where adaptation shines: the DC
    // zero-diff + EOB decisions converge to near-zero cost per block,
    // while Huffman pays >= 6 whole bits per block forever
    val skewed = Array.fill(4096)(42.toByte)
    val huff = JpegCodec.encode(skewed).length
    val arith = JpegArith.encodeArith(skewed).length
    assert(arith < huff, s"arith $arith >= huffman $huff on skewed content")
    // and on the mixed fixture payload it should still not be worse
    val h2 = JpegCodec.encode(payload).length
    val a2 = JpegArith.encodeArith(payload).length
    assert(a2 <= h2 + 8, s"arith $a2 far above huffman $h2 on mixed content")
  }

  test("Table D.3 transcription satisfies the spec's structural invariants") {
    val n = JpegArith.QmQe.length
    assert(n == 114) // 113 adaptive states + the fixed ~0.5 bin
    for (i <- 0 until n) {
      assert(JpegArith.QmQe(i) > 0 && JpegArith.QmQe(i) < 0x8000, s"Qe($i)")
      assert(JpegArith.QmNmps(i) >= 0 && JpegArith.QmNmps(i) < n, s"NMPS($i)")
      assert(JpegArith.QmNlps(i) >= 0 && JpegArith.QmNlps(i) < n, s"NLPS($i)")
      // switch only on MPS/LPS-boundary states (Qe near 0.5)
      if (JpegArith.QmSwitch(i) == 1)
        assert(JpegArith.QmQe(i) >= 0x5000, s"switch on low-Qe state $i")
    }
    // the fixed bin never adapts
    assert(JpegArith.QmNmps(113) == 113 && JpegArith.QmNlps(113) == 113 &&
      JpegArith.QmSwitch(113) == 0)
    // MPS success must lower Qe (or stay at the boundary): the estimator
    // converges toward certainty along NMPS chains
    for (i <- 0 until 113)
      assert(JpegArith.QmQe(JpegArith.QmNmps(i)) <= JpegArith.QmQe(i) ||
        JpegArith.QmSwitch(i) == 1, s"NMPS($i) raises Qe")
  }

  test("color arithmetic decode equals color Huffman decode exactly") {
    // the multi-component discipline: three components share table 0's
    // adaptive statistics while DC prediction/conditioning stay per
    // component — a state-separation bug would corrupt every chroma block
    for (n <- Seq(0, 5, 100)) {
      val p = (0 until n).map(i => ((i * 91 + 17) % 256).toByte).toArray
      val a = JpegArith.decodeArithColorPixels(JpegArith.encodeColorArith(p)).get
      val b = JpegCodec.decodeColorPixels(JpegCodec.encodeColor(p)).get
      assert(a._1 == b._1 && a._2 == b._2, s"color dims differ at n=$n")
      assert(a._3.sameElements(b._3), s"color pixels differ at n=$n")
    }
    val rst = JpegArith.decodeArithColorPixels(
      JpegArith.encodeColorArith(payload, restartInterval = 3)).get
    val plain = JpegArith.decodeArithColorPixels(JpegArith.encodeColorArith(payload)).get
    assert(rst._3.sameElements(plain._3), "color restart resync differs")
    // geometry separation: the color container is not a grayscale one
    assert(JpegArith.decodeArithPixels(JpegArith.encodeColorArith(payload)).isEmpty)
  }

  test("QM coder round-trips a 200k-decision adversarial stream exactly") {
    // raw coder level, below the statistical models: three adaptive bins
    // plus the fixed bin, with phases designed to stress the byte layer —
    // long MPS runs drive Qe to the floor (deep renormalizations), skewed
    // phases drive the code register through 0xFF output runs (deferred
    // stuffing + carry resolution), alternation forces MPS/LPS exchange
    // at the 0.5 boundary states
    var seed = 0x9E3779B97F4A7C15L
    def next(): Int = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      (seed >>> 40).toInt & 0xff
    }
    val n = 200000
    val bins = new Array[Int](3)
    val fixed = Array(113)
    val decisions = new Array[Int](n)
    val binOf = new Array[Int](n)
    var i = 0
    while (i < n) {
      val phase = (i / 10000) % 4
      binOf(i) = next() % 4 // 3 = fixed bin
      decisions(i) = phase match {
        case 0 => if (next() < 8) 1 else 0 // long MPS runs
        case 1 => next() & 1 // coin flips at the boundary states
        case 2 => if (next() < 240) 1 else 0 // inverted skew (MPS flips)
        case _ => if ((i & 7) == 0) 1 else 0 // periodic
      }
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val enc = new JpegArith.QmEncoder(out)
    i = 0
    while (i < n) {
      if (binOf(i) == 3) enc.encodeBit(fixed, 0, decisions(i))
      else enc.encodeBit(bins, binOf(i), decisions(i))
      i += 1
    }
    enc.flush()
    val data = out.toByteArray
    // stuffing discipline: a 0xFF in the stream is always followed by 0x00
    for (j <- 0 until data.length - 1)
      assert((data(j) & 0xff) != 0xff || (data(j + 1) & 0xff) == 0x00,
        s"unstuffed FF at $j")
    java.util.Arrays.fill(bins, 0); fixed(0) = 113
    val dec = new JpegArith.QmDecoder(data, 0)
    i = 0
    while (i < n) {
      val d =
        if (binOf(i) == 3) dec.decodeBit(fixed, 0)
        else dec.decodeBit(bins, binOf(i))
      assert(d == decisions(i), s"decision $i diverged")
      i += 1
    }
    // and the skewed stream should compress far below 1 bit/decision
    assert(data.length < n / 4, s"${data.length} bytes for $n decisions")
  }

  test("non-SOF9 containers and hostile headers are rejected, not thrown") {
    assert(JpegArith.decodeArithPixels(JpegCodec.encode(payload)).isEmpty)
    assert(JpegArith.decodeArithPixels(Array[Byte]()).isEmpty)
    assert(JpegArith.decodeArithPixels(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }
}
