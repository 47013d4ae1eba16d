package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}

/** Value-level pins for the ninth extras batch — each test enforces a
  * property the query's scaladoc claims, on the sf0.001 fixture.
  */
class Extras9Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q319: z only significant with a matching trend label, and a " +
    "gap-filled series carries a positive tie term") {
    val rows = SparkEntry.queries("q319_mann_kendall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("s_stat")
      val z = r.getAs[Double]("z")
      val trend = r.getAs[String]("trend")
      assert(math.signum(z.toInt).toLong * s >= 0 || z == 0.0)
      if (trend == "increasing") assert(z > 1.96 && s > 0, r.toString)
      if (trend == "decreasing") assert(z < -1.96 && s < 0, r.toString)
      if (trend == "no trend") assert(math.abs(z) <= 1.96, r.toString)
      // the gap-filled hourly series has many repeated small counts, so
      // the tie correction must actually engage
      assert(r.getAs[Long]("tie_term") > 0, r.toString)
    }
  }

  test("q320: full-agreement pattern links, zero-agreement does not, and " +
    "blocking keeps nearly every planted true pair") {
    val rows = SparkEntry.queries("q320_fellegi_sunter")(spark, sf).collect()
    val byPat = rows.map(r => (r.getAs[Int]("f_seg"), r.getAs[Int]("f_tight"),
      r.getAs[Int]("f_bal")) -> r).toMap
    assert(byPat((1, 1, 1)).getAs[String]("decision") == "link")
    byPat.get((0, 0, 0)).foreach { r =>
      assert(r.getAs[String]("decision") != "link", r.toString)
    }
    // every true pair has |bal diff| <= 3 by construction, so no match
    // can land in an f_bal = 0 pattern
    rows.filter(_.getAs[Int]("f_bal") == 0)
      .foreach(r => assert(r.getAs[Long]("n_match") == 0L, r.toString))
    val matches = rows.map(_.getAs[Long]("n_match")).sum
    val customers = Tables.customer(spark, sf).count()
    assert(matches >= (customers * 99) / 100,
      s"blocking lost too many true pairs: $matches of $customers")
  }

  test("q321: exact code-length identities hold bucket-wide") {
    val rows = SparkEntry.queries("q321_elias_postings")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_postings")
      val gamma = r.getAs[Long]("gamma_bits")
      val vb = r.getAs[Long]("varbyte_bits")
      val fixed = r.getAs[Long]("fixed_bits")
      assert(gamma >= n, "gamma is at least one bit per gap")
      assert(vb >= 8 * n && vb % 8 == 0, "varbyte is whole bytes, >= 1/gap")
      assert(fixed == 64 * n)
      assert(r.getAs[Double]("gamma_ratio") < 1.0,
        "gamma must beat 64-bit fixed width on real gap distributions")
    }
  }

  test("q322: the fitted calibration curve is monotone and preserves the " +
    "weighted mean (the two defining PAV properties)") {
    val rows = SparkEntry.queries("q322_isotonic_calibration")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    val fits = rows.map(_.getAs[Double]("fit_rate"))
    fits.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9, s"fit not monotone: $a > $b")
      case _ =>
    }
    val n = rows.map(_.getAs[Long]("n_docs").toDouble)
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    val lhs = n.zip(fits).map { case (a, b) => a * b }.sum
    val rhs = n.zip(raw).map { case (a, b) => a * b }.sum
    assert(math.abs(lhs - rhs) <= 1e-3 * math.max(1.0, rhs),
      s"PAV must preserve the weighted mean: $lhs vs $rhs")
  }

  test("q323: flag accounting is consistent and the denominator covers " +
    "every document, including gram-free ones") {
    val rows = SparkEntry.queries("q323_repetition_filter")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val any = r.getAs[Long]("flagged_any")
      val each = Seq("flagged_2", "flagged_3", "flagged_4")
        .map(r.getAs[Long](_))
      assert(each.forall(_ <= any), r.toString)
      assert(any <= each.sum, r.toString)
      assert(any <= r.getAs[Long]("n_docs"), r.toString)
    }
  }

  test("q324: exactly 10 keywords, scores floored by the teleport mass " +
    "and ordered (score desc, word asc)") {
    val rows = SparkEntry.queries("q324_textrank")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Long]("score") >= 150000000L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("score"), b.getAs[Long]("score"))
        assert(sa > sb || (sa == sb &&
          a.getAs[String]("word") < b.getAs[String]("word")))
      case _ =>
    }
  }

  test("q325: the survival curve starts from the full risk set and is " +
    "non-increasing, as are the risk sets") {
    val rows = SparkEntry.queries("q325_kaplan_meier")(spark, sf)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") == totalUsers)
    rows.foreach { r =>
      val km = r.getAs[Double]("km")
      assert(km > 0.0 && km <= 1.0, r.toString)
      assert(r.getAs[Long]("n_death") + r.getAs[Long]("n_censored") <=
        r.getAs[Long]("n_risk"), r.toString)
    }
    rows.map(_.getAs[Double]("km")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9, s"km increased: $a -> $b")
      case _ =>
    }
    rows.map(_.getAs[Long]("n_risk")).sliding(2).foreach {
      case Array(a, b) => assert(a > b, "risk set must strictly shrink")
      case _ =>
    }
  }

  test("q326: the unseen-mass row exists and Good-Turing mass is a " +
    "sub-probability bounded by 1") {
    val rows = SparkEntry.queries("q326_good_turing")(spark, sf).collect()
    val zero = rows.find(_.getAs[Long]("r") == 0L)
    assert(zero.isDefined, "the r = 0 (unseen mass) row is the point")
    // cross-check the unseen mass against independently computed N_1/T
    // (the saturated fixture vocabulary legitimately has N_1 = 0)
    import org.apache.spark.sql.functions._
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
    val n1 = freq.where(col("count") === 1).count().toDouble
    val t = freq.agg(sum("count")).collect()(0).getLong(0).toDouble
    assert(math.abs(zero.get.getAs[Double]("gt_share") - n1 / t) < 1e-6)
    assert(zero.get.getAs[Double]("r_star") == 0.0)
    val mass = rows.map(_.getAs[Double]("gt_share")).sum
    assert(mass > 0.0 && mass <= 1.0 + 1e-6, s"GT mass out of range: $mass")
  }

  test("q329: rendezvous hashing moves ~1/(N+1) of keys on resize while " +
    "mod-N moves nearly everything") {
    val rows = SparkEntry.queries("q329_rendezvous_placement")(spark, sf)
      .collect().map(r => r.getAs[String]("strategy") -> r).toMap
    val hrw = rows("hrw").getAs[Double]("moved_frac")
    val mod = rows("mod").getAs[Double]("moved_frac")
    assert(hrw > 0.03 && hrw < 0.25, s"hrw moved_frac $hrw not near 1/9")
    assert(mod > 0.75, s"mod-N must move ~8/9 of keys, got $mod")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("min_load") > 0, "an empty shard after resize")
      assert(r.getAs[Long]("n_moved") <= r.getAs[Long]("n_keys"))
    }
  }

  test("q330: every source's bootstrap interval brackets its point " +
    "estimate") {
    val rows = SparkEntry.queries("q330_poisson_bootstrap")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, lo, hi) = (r.getAs[Double]("mean_chars"),
        r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_hi"))
      assert(lo < hi, r.toString)
      assert(lo <= m && m <= hi,
        s"interval [$lo, $hi] misses the point estimate $m: $r")
    }
  }

  test("q332: the bitmap popcount reproduces the exact distinct count on " +
    "every row — the whole identity the rollup trades on") {
    val rows = SparkEntry.queries("q332_bitmap_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bitmap_dv") == r.getAs[Long]("exact_dv"),
        r.toString)
      assert(r.getAs[Long]("exact_dv") <= 63 * r.getAs[Long]("n_words"),
        r.toString)
    }
  }

  test("q333: the daily peak is bounded by the session count and its " +
    "instant falls inside the day") {
    val rows = SparkEntry.queries("q333_peak_concurrency")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (day, peak, n) = (r.getAs[Long]("day"), r.getAs[Long]("peak"),
        r.getAs[Long]("n_sessions"))
      assert(peak >= 1 && peak <= n, r.toString)
      val at = r.getAs[Long]("peak_at")
      assert(at >= day * 86400000000L && at < (day + 1) * 86400000000L,
        r.toString)
    }
  }
}
