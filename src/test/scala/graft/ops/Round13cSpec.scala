package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-13 third-batch pins: the Soundex variant's truth table and
  * perturbation invariants (q387), the SPRT's planted decisions (q394),
  * post-stratification bias recovery (q392), NB language-ID learning
  * above the majority baseline (q391), RRF integer arithmetic consistency
  * (q386), the encoding advisor's bit math (q393), and a driver-side
  * chi-square recomputation (q388).
  */
class Round13cSpec extends AnyFunSuite with SparkSpec {

  private val sf0001 = "/root/testdata/sf0.001"
  private val sf001 = "/root/testdata/sf0.01"

  private def soundexOf(names: Seq[String]): Map[String, String] = {
    import spark.implicits._
    names.toDF("nm")
      .selectExpr("nm", s"${Phonetic13.soundexSql("nm")} AS sdx")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("q387 Soundex truth table (vowel-separator variant)") {
    val got = soundexOf(Seq(
      "robert", // R163 — canonical agreement on an H/W-free name
      "rupert", // R163 — the classic same-code pair
      "bben", // B500 — leading double letter collapses into the first code
      "jolkamtor", // J425 — a generated-shape 3-syllable name
      "balbal", // B414 — vowel-separated repeats keep BOTH codes
      "tanattan", // T535 — vowels separate, so no cross-vowel collapse
      "kamnesgar")) // K526 — TWO separate runs (55 and 22) both collapse;
    // the case DuckDB's first-match-only regexp_replace got wrong until
    // the oracle passed 'g' (caught by the 3× derived-scale gate)
    assert(got("robert") == "R163")
    assert(got("rupert") == "R163")
    assert(got("bben") == "B500")
    assert(got("jolkamtor") == "J425")
    assert(got("balbal") == "B414")
    assert(got("tanattan") == "T535")
    assert(got("kamnesgar") == "K526")
  }

  test("q387 perturbation classes behave as documented") {
    val names = Seq("jolkamtor", "balbennes", "corgarfel", "kamlinsil")
    val base = soundexOf(names)
    // vowel swap a->o: Soundex-invariant on every name
    val vowel = soundexOf(names.map(_.replace('a', 'o')))
    names.foreach { n =>
      assert(vowel(n.replace('a', 'o')) == base(n), s"vowel swap broke $n")
    }
    // doubling the final consonant: invariant via adjacent-collapse
    val dbl = soundexOf(names.map(n => n + n.last))
    names.foreach { n =>
      assert(dbl(n + n.last) == base(n), s"double-last broke $n")
    }
    // replacing the first consonant with z: ALWAYS a different code
    val zed = soundexOf(names.map(n => "z" + n.tail))
    names.foreach { n =>
      assert(zed("z" + n.tail) != base(n), s"z-swap did not break $n")
    }
  }

  test("q394 SPRT reaches the planted decisions at sf0.01") {
    val rows = Stats13c.q394Sprt.fn(spark, sf001)
      .select("arm", "decision").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows(0) == "accept_h0",
      s"arm 0 (no lift, p = p0) should accept H0, got ${rows(0)}")
    assert(rows(1) == "reject_h0",
      s"arm 1 (planted lift to ~p1) should reject H0, got ${rows(1)}")
  }

  test("q392 stratified estimator recovers the planted effect; naive is " +
    "more biased") {
    val r = Stats13c.q392PostStratification.fn(spark, sf001).head()
    val naive = r.getAs[Double]("naive_diff")
    val adj = r.getAs[Double]("adjusted_diff")
    assert(math.abs(adj - 200.0) < 80.0,
      s"adjusted $adj should land near the planted 200")
    assert(math.abs(naive - 200.0) > math.abs(adj - 200.0),
      s"naive $naive should be MORE biased than adjusted $adj")
  }

  test("q391 NB language-ID beats the majority baseline on held-out docs") {
    val rows = Tables13cSpecHelper.langidRows(spark, sf001)
    val total = rows.map(_._2).sum
    val correct = rows.map(_._3).sum
    val majority = rows.map(_._2).max // en is the largest test class
    assert(correct.toDouble / total > majority.toDouble / total + 0.1,
      s"accuracy ${correct.toDouble / total} should clear the majority " +
        s"baseline ${majority.toDouble / total} by 10 points")
  }

  test("q386 trimmed/winsorized means match a driver-side recomputation " +
    "and trim ~10% of each type") {
    val rows = Stats13c.q386TrimmedWinsorized.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf001)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (t05, t95) = (r.getAs[Long]("t05_cents"), r.getAs[Long]("t95_cents"))
      assert(t05 <= t95)
      val n = r.getAs[Long]("n")
      val cut = r.getAs[Long]("n_below") + r.getAs[Long]("n_above")
      assert(cut.toDouble / n > 0.05 && cut.toDouble / n < 0.15,
        s"$t trims ${cut.toDouble / n} — expected ~10%")
      // winsorized mean recomputed from the raw rows + the query's bounds
      val vals = ev.filter(_._1 == t).map(_._2)
      val wm = vals.map(v => math.min(math.max(v, t05), t95)).sum.toDouble /
        vals.length
      assert(math.abs(r.getAs[Double]("winsorized_mean_cents") -
        math.round(wm * 10000) / 10000.0) < 1e-9, s"$t winsorized mismatch")
    }
  }

  test("q393 encoding advisor bit math and winning regimes") {
    val rows = Layout13b.q393EncodingAdvisor.fn(spark, sf0001)
      .collect().map(r => r.getAs[String]("colname") -> r).toMap
    val ln = rows("l_linenumber")
    assert(ln.getAs[Long]("bits_for") == 3L) // range 1..7 -> 6 -> 3 bits
    assert(ln.getAs[String]("recommended") == "for")
    val sw = rows("sparse_wide_id")
    // ndv = min(16, |suppliers|): 10 at sf0.001, 16 from sf0.01 up
    assert(sw.getAs[Long]("ndv") <= 16L && sw.getAs[Long]("ndv") >= 2L)
    assert(sw.getAs[Long]("bits_dict") <= 4L)
    assert(sw.getAs[Long]("bits_for") >= 40L) // 2^40-spaced wide domain
    assert(sw.getAs[String]("recommended") == "dict")
    // exact byte identity on one row: FOR bytes = ceil(n*bits/8)
    assert(ln.getAs[Long]("bytes_for") ==
      (ln.getAs[Long]("n") * 3L + 7L) / 8L)
  }

  test("q388 chi-square matches a driver-side recomputation at sf0.001") {
    val r = Stats13c.q388Chi2CramersV.fn(spark, sf0001).head()
    val cells = graft.Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = cells.map(_._3).sum.toDouble
    val rt = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val chi2 = cells.map { case (l, s, o) =>
      val e = rt(l) * ct(s) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-2,
      s"query ${r.getAs[Double]("chi2")} vs recomputed $chi2")
    val v = math.sqrt(chi2 / (n * math.min(rt.size - 1, ct.size - 1)))
    assert(math.abs(r.getAs[Double]("cramers_v") - v) < 1e-4)
  }
}

/** Small helper kept outside the suite so the langid pin reads cleanly. */
private[ops] object Tables13cSpecHelper {
  def langidRows(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Long, Long)] =
    TextModel13.q391NbLangid.fn(spark, dir)
      .select("lang", "n_test", "n_correct").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
}
