package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins q295's periodogram: a planted daily cycle in a 30-day hourly series
  * produces its spectral line at exactly k = N/24 cycles, and the power
  * ranking is invariant to a uniform time shift of the corpus (the property
  * that justifies relative-to-first-hour indexing).
  */
class SpectralSpec extends AnyFunSuite with SparkSpec {

  private val HourUs = 3600L * 1000000L

  /** Synthesize an events.parquet with a square-wave daily cycle: hour t
    * carries 9 events in the first half of each day, 5 in the second.
    */
  private def writeEvents(dir: String, startUs: Long, hours: Int): Unit = {
    import spark.implicits._
    val rows = (0 until hours).flatMap { t =>
      val n = if (t % 24 < 12) 9 else 5
      (0 until n).map { j =>
        (t.toLong * 100 + j, new Timestamp((startUs + t * HourUs) / 1000),
          j.toLong, "cyc", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("planted daily cycle peaks at k = N/24 and survives a time shift") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_spectral_a"
    val shifted = s"${sys.props("java.io.tmpdir")}/graft_spectral_b"
    val start = 1700000000L * 1000000L
    writeEvents(base, start, 720)
    writeEvents(shifted, start + 13 * HourUs, 720) // same series, 13 h later
    val a = Spectral.q295Periodogram.fn(spark, base)
      .collect().map(r => (r.getAs[Int]("rnk"), r.getAs[Int]("k"),
        r.getAs[Double]("pwr")))
    val b = Spectral.q295Periodogram.fn(spark, shifted)
      .collect().map(r => (r.getAs[Int]("rnk"), r.getAs[Int]("k"),
        r.getAs[Double]("pwr")))
    // N = 720, daily square wave -> fundamental at k = 30; every
    // non-multiple of 30 is EXACTLY zero for a period-24 signal (and the
    // first harmonic k = 90 is beyond MaxK), so ranks 2-3 are the k-order
    // tie-break over zero-power lines — itself a determinism pin
    assert(a.find(_._1 == 1).get._2 == 30, s"top line: ${a.toSeq}")
    assert(a.find(_._1 == 1).get._3 > 100000.0)
    assert(a.filter(_._1 >= 2).map(x => (x._2, x._3)).toSeq ==
      Seq((1, 0.0), (2, 0.0)), s"zero-tie lines: ${a.toSeq}")
    // shift invariance: identical lines and (rounded) powers
    assert(a.toSeq == b.toSeq)
  }
}
