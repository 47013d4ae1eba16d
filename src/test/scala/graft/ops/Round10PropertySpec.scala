package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Value-level properties of the round-10 second-pass queries that the
  * hash gate alone doesn't explain: the MV advisor's answerability
  * algebra and the temperature sampler's upsampling direction.
  */
class Round10PropertySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q303: the all-dims MV answers the whole workload and tops n_answerable") {
    val rows = Extras7.q303MvAdvisor.fn(spark, sf).collect()
      .map(r => (r.getAs[Int]("mvmask"), r.getAs[Long]("mv_rows"),
        r.getAs[Long]("n_answerable"), r.getAs[Long]("score")))
    val full = rows.find(_._1 == 15)
    assert(full.isDefined, "all-dims MV missing from top-5")
    assert(full.get._3 == 8L) // subset-mask: 15 covers every qmask
    // answerability is monotone in the mask lattice: any reported MV
    // answers at most as many queries as the full one
    rows.foreach { case (_, _, na, _) => assert(na <= 8L) }
    // mv_rows of the full MV bounds every coarser MV's from below
    val fullRows = full.get._2
    rows.foreach { case (m, mr, _, _) =>
      if (m != 15) assert(mr <= fullRows, s"mask $m has $mr > $fullRows")
    }
  }

  test("q305: temperature sampling upsamples low-resource languages") {
    val rows = Pipeline.q305TemperatureMixture.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("w"), r.getAs[Long]("budget")))
    assert(rows.length >= 2)
    val total = rows.map(_._2).sum.toDouble
    val en = rows.find(_._1 == "en").get
    // α = 0.3 < 1: the dominant language's weight sits BELOW its corpus
    // share, every smaller language's weight sits ABOVE its share
    assert(en._3 < en._2 / total, s"en not downsampled: $en vs share ${en._2 / total}")
    rows.filter(_._1 != "en").foreach { r =>
      assert(r._3 > r._2 / total, s"${r._1} not upsampled: $r")
    }
    // budgets never exceed availability
    rows.foreach(r => assert(r._4 <= r._2))
    // weights normalize (rounded at 4, so allow the rounding slack)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.002)
  }
}
