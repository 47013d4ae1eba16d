package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-13 continuation batches (q386–q401) — the
  * structural claims the scaladocs make, turned into test failures:
  * blocked linkage joins stay equi-joins (never cartesians), model
  * weight tables broadcast, and time-series frames keep their windows
  * keyed.
  */
class Round13ePlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q387: the phonetic blocking join is an equi-join — no cartesian; " +
    "the only nested-loop is the one-row adaptive-width broadcast") {
    val qe = SparkEntry.queries("q387_soundex_blocking")(spark, sf)
      .queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the (nk, sdx, bucket) pair join must be a real equi-join
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    // BNLJ appears only for the count(*)-derived ONE-ROW width frame,
    // which feeds the clean side, the dirty side, and the class-size
    // frame — three instances, all 1-row broadcasts
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 3, s"unexpected nested-loop joins ($bnlj): " + p.take(2000))
  }

  test("q391: the NB weight table reaches scoring as a broadcast hash " +
    "join; no shuffle cartesian anywhere") {
    val qe = SparkEntry.queries("q391_nb_langid")(spark, sf).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "weights/prior joins should broadcast: " + p.take(2000))
  }

  test("q397: the EWMA triangle is an equi-join on event_type — no " +
    "cartesian, no broadcast nested loop") {
    val p = SparkEntry.queries("q397_ewma_chart")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q400: every window in the decomposition is keyed by event_type " +
    "— never global") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("q400_seasonal_decompose")(spark, sf)
      .queryExecution
    val wins = qe.optimizedPlan.collect { case w: LWindow => w }
    // the moving-average window may sit behind the localCheckpoint
    // barrier of the daily frame; assert on whatever windows remain
    // visible AND re-derive the pre-checkpoint plan's property via the
    // sweep (which walks the full inventory) — here: none of the
    // visible windows may be global
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        "a GLOBAL window (empty partitionSpec) in q400")
    }
  }

  test("q398/q392: single-row estimator outputs carry the planted truth " +
    "columns for auditability") {
    val cmh = SparkEntry.queries("q398_cmh_test")(spark, sf)
    assert(cmh.columns.contains("planted_or"))
    val ps = SparkEntry.queries("q392_post_stratification")(spark, sf)
    assert(ps.columns.contains("planted_effect"))
  }
}
