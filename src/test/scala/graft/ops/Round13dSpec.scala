package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-13 fourth-batch pins: RANSAC recovering the planted line where
  * naive LSQ does not (q396), the EWMA closed form replaying the
  * recurrence exactly (q397), Nelson-Aalen's ordering relations against
  * Kaplan-Meier from the same frame (q395), CMH recovering the planted
  * common odds ratio (q398), and the LSH planner's recommendation being
  * the true cost argmin (q399).
  */
class Round13dSpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("q396 RANSAC recovers the planted line; naive LSQ does not") {
    val r = Stats13d.q396RansacLine.fn(spark, sf001).head()
    val refit = r.getAs[Double]("slope_refit")
    val naive = r.getAs[Double]("slope_naive_lsq")
    assert(math.abs(refit - 3.0) < 0.05, s"refit slope $refit")
    assert(math.abs(r.getAs[Double]("intercept_refit") - 70.0) < 5.0)
    assert(math.abs(naive - 3.0) > 10 * math.abs(refit - 3.0),
      s"naive $naive should be far off while refit $refit is close")
    val share = r.getAs[Double]("inlier_share")
    assert(share > 0.7 && share < 0.9, s"inlier share $share vs planted 0.8")
  }

  test("q397 EWMA closed form equals a driver-side recurrence replay") {
    val rows = Ewma13.q397EwmaChart.fn(spark, sf001)
      .select("event_type", "t", "x", "ewma").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, series) =>
      val byT = series.sortBy(_._2)
      var z = byT.head._3.toDouble // z_1 = x_1
      byT.foreach { case (_, t, x, ewma) =>
        if (t > 1) z = x / 4.0 + 3.0 * z / 4.0
        assert(math.abs(ewma - z) < 1e-3,
          s"$et t=$t closed-form $ewma vs recurrence $z")
      }
    }
  }

  test("q395 Nelson-Aalen vs Kaplan-Meier orderings from the same frame") {
    val na = Survival13.q395NelsonAalen.fn(spark, sf001)
      .select("day", "na_cumhaz", "s_fh").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val km = Extras9.q325KaplanMeier.fn(spark, sf001)
      .select("day", "km").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(na.keySet == km.keySet)
    na.foreach { case (d, (h, sfh)) =>
      val k = km(d)
      // H(t) = Σ d/n ≤ Σ -ln(1 - d/n) = -ln(KM)  ⇒  S_FH = e^{-H} ≥ KM
      if (k > 0) {
        assert(h <= -math.log(k) + 1e-6, s"day $d: H $h vs -ln(km) ${-math.log(k)}")
        assert(sfh >= k - 1e-6, s"day $d: S_FH $sfh should dominate KM $k")
      }
    }
  }

  test("q398 CMH recovers the planted common odds ratio") {
    val r = Stats13d.q398CmhTest.fn(spark, sf001).head()
    val or = r.getAs[Double]("or_mh")
    assert(or > 1.7 && or < 3.4, s"OR_MH $or vs planted 2.5")
    assert(r.getAs[Double]("cmh_chi2") > 10.0,
      "planted association should be decisively detected")
  }

  test("q400 decomposition reassembles: x = trend + seasonal + residual") {
    val rows = Ts13.q400SeasonalDecompose.fn(spark, sf001)
      .select("x", "trend", "seasonal", "residual").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getLong(0).toDouble
      val sum = r.getDouble(1) + r.getDouble(2) + r.getDouble(3)
      assert(math.abs(x - sum) < 5e-3,
        s"x $x != trend+seasonal+residual $sum beyond rounding")
    }
  }

  test("q401 Holt-Winters fold equals a driver-side recurrence replay") {
    val daily = graft.Tables.events(spark, sf001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val out = Ts13.q401HoltWinters.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.map(_._2)
      if (xs.length >= 14) {
        val m1 = xs.take(7).sum / 7.0
        val m2 = xs.slice(7, 14).sum / 7.0
        var l = m1
        var b = (m2 - m1) / 7.0
        var q = xs.take(7).map(_ - m1).toVector
        xs.drop(7).foreach { x =>
          val s7 = q.head
          val l2 = 0.5 * (x - s7) + 0.5 * (l + b)
          val b2 = 0.25 * (l2 - l) + 0.75 * b
          val sn = 0.25 * (x - l2) + 0.75 * s7
          l = l2; b = b2; q = q.tail :+ sn
        }
        val row = out(et)
        assert(math.abs(row.getAs[Double]("level") - l) < 1e-3,
          s"$et level")
        assert(math.abs(row.getAs[Double]("trend") - b) < 1e-3,
          s"$et trend")
        val f3 = l + 3.0 * b + q(2)
        assert(math.abs(row.getAs[Double]("f3") - f3) < 1e-3, s"$et f3")
      }
    }
  }

  test("q399 recommendation is the exact cost argmin and the S-curve " +
    "trade-off is non-vacuous") {
    val rows = Dedup13.q399LshPlanner.fn(spark, sf001)
      .select("b", "r", "n_pairs", "fp_rate", "fn_rate", "recommended")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5)))
    assert(rows.length == 4)
    assert(rows.count(_._6 == 1) >= 1)
    // monotone trade-off: fp falls with r, fn rises with r
    val byR = rows.sortBy(_._2)
    assert(byR.map(_._4).sliding(2).forall(p => p(0) >= p(1)),
      "fp_rate must fall as rows-per-band grows")
    assert(byR.map(_._5).sliding(2).forall(p => p(0) <= p(1)),
      "fn_rate must rise as rows-per-band grows")
    // the extremes genuinely flood/starve on this corpus
    assert(byR.head._4 > 0.5, "r=2 should flood with false candidates")
    assert(byR.last._5 > 0.5, "r=16 should starve recall")
  }
}
