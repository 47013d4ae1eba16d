package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q294's shot-boundary algebra: per-frame-pair SAD from the REAL
  * decoded planes equals the synthesis closed form, the static half never
  * contributes (temporal carry), and segmentation turns cut flags into the
  * expected scene structure on a crafted payload.
  */
class SceneCutsSpec extends AnyFunSuite with SparkSpec {

  // payload bytes at stride 8 drive frames: frame f shows byte 8f
  private def track(frameBytes: Int*): Array[Byte] = {
    val out = new Array[Byte](frameBytes.length * 8 - 7)
    frameBytes.zipWithIndex.foreach { case (b, f) =>
      out(f * 8) = b.toByte
      // fill gap bytes with the same value so only stride-8 bytes matter
      if (f * 8 + 1 < out.length)
        (1 until math.min(8, out.length - f * 8)).foreach(k => out(f * 8 + k) = b.toByte)
    }
    out
  }

  test("SAD from decoded planes matches the closed form 32*(7|dv| + |d(v%128)|)") {
    import spark.implicits._
    val p = track(100, 100, 40, 45) // frames: flat, repeat, big jump, small step
    val media = Seq(Multimodal.MediaRow(1L, p)).toDS()
    val sads = SceneCutQueries.frameDiffs(media).collect()
      .sortBy(_.frame_idx).map(_.sad).toSeq
    def cf(a: Int, b: Int): Long = 32L * (7 * math.abs(b - a) + math.abs(b % 128 - a % 128))
    assert(sads == Seq(0L, cf(100, 100), cf(100, 40), cf(40, 45)))
    assert(sads(1) == 0L) // identical frames: zero SAD incl. the static half
  }

  test("the static bottom half never contributes to SAD (temporal carry)") {
    import spark.implicits._
    // two tracks differing ONLY in byte 0 (the static half's value):
    // SAD sequences must be identical because the static rows cancel
    val a = track(90, 30, 120)
    val b = a.clone(); b(0) = 10 // static value changes, variable rows at 8,16 unchanged
    val media = Seq(Multimodal.MediaRow(1L, a), Multimodal.MediaRow(2L, b)).toDS()
    val rows = SceneCutQueries.frameDiffs(media).collect()
    // byte 0 is ALSO frame 0's variable value, so compare from the 1->2
    // pair onward: those frames' variable rows (bytes 8, 16) are unchanged,
    // and the static half (byte 0: 90 vs 10) must cancel out of the SAD
    val s1 = rows.filter(_.doc_id == 1L).sortBy(_.frame_idx).map(_.sad).drop(2).toSeq
    val s2 = rows.filter(_.doc_id == 2L).sortBy(_.frame_idx).map(_.sad).drop(2).toSeq
    assert(s1.nonEmpty && s1 == s2)
  }

  test("segmentation: crafted cuts produce the expected scene structure") {
    import spark.implicits._
    // |dv|>8 is a cut: 50->50 no, 50->100 cut, 100->95 no, 95->20 cut, 20->21 no
    val p = track(50, 50, 100, 95, 20, 21)
    val diffs = SceneCutQueries.frameDiffs(Seq(Multimodal.MediaRow(7L, p)).toDS())
      .toDF()
    val cuts = diffs.withColumn("is_cut",
        (col("sad") > SceneCutQueries.CutSad).cast("int"))
      .orderBy("frame_idx").select("is_cut").as[Int].collect().toSeq
    assert(cuts == Seq(0, 0, 1, 0, 1, 0))
    // scenes: [0,1], [2,3], [4,5] -> 3 scenes, longest 2
  }
}
