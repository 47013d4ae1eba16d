package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan + invariant pins for the round-12 multimodal composed capstone —
  * the structural claims q341's scaladoc makes, turned into test failures:
  * perceptual pair generation is the banded EQUI-join (never a cartesian),
  * the packing window is sub-stream-keyed, and the stage counts obey the
  * pipeline's funnel arithmetic.
  */
class Round12PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val q341 = SparkEntry.queries("q341_media_capstone")(spark, sf)

  test("q341: no cartesian or broadcast nested loop anywhere — the pair " +
    "stage is the banded equi-join") {
    val p = q341.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q341: the packing window is sub-stream-keyed (source, shard), " +
    "never global") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = q341.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "packing window not found")
    wins.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
      assert(parts.nonEmpty, "a GLOBAL window (empty partitionSpec) in the capstone")
    }
    assert(wins.exists { w =>
      val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
      parts.contains("source")
    }, s"no window keyed by source: ${wins.map(_.partitionSpec)}")
  }

  test("q341: stage counts obey the funnel — every doc lands through the " +
    "real container round-trip, dedup and QC only shrink, packing covers " +
    "every surviving token block") {
    val rows = q341.collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nLanded = r.getAs[Long]("n_landed")
      val nPdup = r.getAs[Long]("n_pdup")
      val nQc = r.getAs[Long]("n_qc_pass")
      assert(nLanded == nDocs, s"landing lost docs: $r")
      assert(nPdup >= 0 && nQc <= nLanded - nPdup, s"funnel grew: $r")
      // every block holds <= Cap tokens' worth of segments, so segments
      // >= blocks whenever anything was packed
      assert(r.getAs[Long]("n_segments") >= r.getAs[Long]("n_blocks"), s"$r")
    }
    // the dedup and QC stages are load-bearing on the fixture, not vacuous
    assert(rows.map(_.getAs[Long]("n_pdup")).sum > 0, "no perceptual dups dropped")
    assert(rows.map(r => r.getAs[Long]("n_landed") - r.getAs[Long]("n_pdup") -
      r.getAs[Long]("n_qc_pass")).sum > 0, "QC gate dropped nothing")
  }

  test("q343 (TPC-H Q6): scan-only aggregation — no join, all three " +
    "predicates pushed to the parquet scan") {
    val q = SparkEntry.queries("q343_tpch_q6")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
  }

  test("q347 (TPC-H Q4): the EXISTS probe decorrelates to a LEFT SEMI " +
    "join, never a per-row subquery") {
    val q = SparkEntry.queries("q347_tpch_q4")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q351 (TPC-H Q2) and q350 (Q19): correlated-min join-back and the " +
    "disjunctive bracket join stay non-cartesian") {
    for (name <- Seq("q351_tpch_q2", "q350_tpch_q19")) {
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(3000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: ${p.take(3000)}")
    }
  }
}
