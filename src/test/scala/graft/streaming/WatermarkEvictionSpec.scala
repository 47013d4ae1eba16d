package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q158's oracle proves WHAT survived; this spec pins HOW: the replay must
  * decompose into exactly three micro-batches (fixture → fresh → late) and
  * the late batch must run with an armed (non-zero) watermark — otherwise
  * the oracle gate would be passing for the wrong reason (e.g. all files
  * collapsing into one batch where nothing is ever late).
  */
class WatermarkEvictionSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q158 runs as three batches and the late batch sees an armed watermark") {
    graft.ops.StreamingQueries.q158WatermarkEviction.fn(spark, sf).count()
    val ckpt = new java.io.File(
      s"${graft.WorkDir.resolve(spark, "wmevq", sf)}/ckpt/offsets")
    val offsets = Option(ckpt.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(offsets.map(_.getName).toSeq == Seq("0", "1", "2"),
      s"expected 3 micro-batches, saw ${offsets.map(_.getName).toSeq}")
    def watermarkOf(f: java.io.File): Long = {
      val line = scala.io.Source.fromFile(f).getLines()
        .find(_.contains("batchWatermarkMs")).getOrElse("")
      """"batchWatermarkMs":(\d+)""".r.findFirstMatchIn(line)
        .map(_.group(1).toLong).getOrElse(-1L)
    }
    assert(watermarkOf(offsets(0)) == 0L) // nothing seen before batch 0
    // batches 1 and 2 run with the fixture-derived watermark: max(ts) - 2d
    assert(watermarkOf(offsets(1)) > 0L)
    assert(watermarkOf(offsets(2)) == watermarkOf(offsets(1)),
      "late batch must see the same armed watermark the fresh batch armed")
  }
}
