package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JpegCodec

/** Property widening of JpegArithSpec's directed QM stress: the directed
  * test drives one fixed phase schedule; these drive RANDOM context
  * counts, skew profiles, and decision mixes per seed, so the
  * probability-estimation state machine walks different Table D.3
  * trajectories each case (different Qe floors, exchange points, and
  * renormalization depths). Seeded generators keep runs deterministic.
  */
class JpegArithPropertySpec extends AnyFunSuite with graft.SeededGen {

  test("property: QM coder round-trips random multi-context streams of " +
    "varied skew exactly, with FF-stuffing discipline intact") {
    val genCase = for {
      nBins <- Gen.choose(1, 8)
      n     <- Gen.choose(5000, 30000)
      skews <- Gen.containerOfN[Array, Int](nBins, Gen.choose(1, 255))
      s0    <- Gen.choose(1L, Long.MaxValue)
    } yield (nBins, n, skews, s0)

    sample(genCase, 8, 0xA417L).foreach { case (nBins, n, skews, s0) =>
      var seed = s0
      def next(): Int = {
        seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
        (seed >>> 40).toInt & 0xff
      }
      val decisions = new Array[Int](n)
      val binOf = new Array[Int](n)
      var i = 0
      while (i < n) {
        binOf(i) = next() % nBins
        decisions(i) = if (next() < skews(binOf(i))) 1 else 0
        i += 1
      }
      val bins = new Array[Int](nBins)
      val out = new java.io.ByteArrayOutputStream()
      val enc = new JpegArith.QmEncoder(out)
      i = 0
      while (i < n) { enc.encodeBit(bins, binOf(i), decisions(i)); i += 1 }
      enc.flush()
      val data = out.toByteArray
      for (j <- 0 until data.length - 1)
        assert((data(j) & 0xff) != 0xff || (data(j + 1) & 0xff) == 0x00,
          s"unstuffed FF at $j (nBins=$nBins seed=$s0)")
      java.util.Arrays.fill(bins, 0)
      val dec = new JpegArith.QmDecoder(data, 0)
      i = 0
      while (i < n) {
        assert(dec.decodeBit(bins, binOf(i)) == decisions(i),
          s"decision $i diverged (nBins=$nBins n=$n seed=$s0)")
        i += 1
      }
    }
  }

  test("property: the block entropy layer round-trips random dense/sparse " +
    "coefficient blocks exactly") {
    val genBlock: Gen[Array[Int]] = for {
      density <- Gen.choose(0, 10)
      dc      <- Gen.choose(-2000, 2000)
      acs     <- Gen.containerOfN[Array, Int](63, Gen.zip(
                   Gen.choose(0, 10), Gen.choose(-1000, 1000)).map {
                     case (gate, v) => if (gate < density) v else 0
                   })
    } yield dc +: acs

    val blockSets = sample(Gen.containerOfN[Array, Array[Int]](40, genBlock),
      5, 0xB10CL)
    assert(blockSets.size >= 4)
    blockSets.foreach { blocks =>
      val data = JpegArith.arithEncodeBlocks(blocks)
      val back = JpegArith.arithDecodeBlocks(data, blocks.length)
      for (b <- blocks.indices)
        assert(back(b).sameElements(blocks(b)), s"block $b mismatched")
    }
  }
}
