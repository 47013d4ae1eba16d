package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.dhash64
import graft.ops.BmpCodec

/** Hand-derivable dHash cases: the 9×8 grid sampling and bit packing have
  * no float anywhere, so exact expectations are computable on paper.
  */
class DHashSpec extends AnyFunSuite {

  private def hashOf(payload: Array[Byte]): Long = {
    val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(payload)).get
    dhash64(px, w, h)
  }

  test("uniform image has no gradients: hash 0") {
    assert(hashOf(Array.fill[Byte](48)(7)) == 0L)
    assert(hashOf(Array.emptyByteArray) == 0L) // all-zero padding row
  }

  test("strictly increasing ramp sets every bit") {
    // one 16-pixel row, channel-0 bytes strictly increasing left to right:
    // every sampled right neighbor is brighter, so all 64 bits set → -1
    val ramp = Array.tabulate[Byte](48)(i => i.toByte)
    assert(hashOf(ramp) == -1L)
  }

  test("decreasing ramp sets no bit") {
    val ramp = Array.tabulate[Byte](48)(i => (200 - i).toByte)
    assert(hashOf(ramp) == 0L)
  }

  test("hash reads channel-0 bytes at the sampled grid points only") {
    // flipping a byte OFF the sampled channel-0 positions leaves the hash
    // unchanged; flipping one ON a sampled position changes it
    val base = Array.tabulate[Byte](48)(i => i.toByte)
    val offGrid = base.clone(); offGrid(1) = 99 // channel 1 of pixel 0
    assert(hashOf(base) == hashOf(offGrid))
    val onGrid = base.clone(); onGrid(0) = 127 // channel 0 of pixel 0 (xl=0)
    assert(hashOf(base) != hashOf(onGrid))
  }
}
