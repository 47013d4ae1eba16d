package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Invariant pins for the round-12 evaluation/screening batch. */
class Eval12Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q359: truncation recall is a valid fraction and the truncated " +
    "prefix keeps meaningful recall on the fixture") {
    val rows = SparkEntry.queries("q359_truncation_recall")(spark, sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_common")
      assert(c >= 0 && c <= 10, s"$r")
      assert(math.abs(r.getAs[Double]("recall_at_10") - c / 10.0) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_common")).sum > 0,
      "16-dim prefix recalls nothing — audit vacuous")
  }

  test("q360: the blocklist flags some documents but not all, and hits " +
    "are at least as numerous as flagged docs") {
    val rows = SparkEntry.queries("q360_blocklist_screen")(spark, sf)
      .collect()
    val flagged = rows.map(_.getAs[Long]("n_flagged")).sum
    val docs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(flagged > 0, "blocklist vacuous")
    assert(flagged < docs, "blocklist flags the whole corpus")
    rows.foreach(r =>
      assert(r.getAs[Long]("n_hits") >= r.getAs[Long]("n_flagged"), s"$r"))
  }

  test("q361: kappa matches the constructed ~1/7 disagreement (po = " +
    "agree/N exactly; kappa below po because chance agreement is ~0.1)") {
    val r = SparkEntry.queries("q361_cohen_kappa")(spark, sf).collect().head
    val n = r.getAs[Long]("n"); val agree = r.getAs[Long]("agree")
    // every 7th vec_id disagrees by construction
    assert(n - agree == (0L until n).count(_ % 7 == 0), s"$r")
    val kappa = r.getAs[Double]("kappa")
    assert(kappa > 0.7 && kappa < r.getAs[Double]("po"), s"$r")
  }
}
