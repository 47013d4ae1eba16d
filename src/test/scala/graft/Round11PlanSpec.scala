package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-11 composed-pipeline capstone — the structural
  * claims its scaladoc makes, turned into test failures: the packing window
  * is keyed by (source, shard) sub-streams (never a global window), the BPE
  * vocabulary applies via broadcast join, and no stage regresses to a
  * cartesian or nested-loop shape.
  */
class Round11PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val q308 = SparkEntry.queries("q308_pipeline_capstone")(spark, sf)

  test("q308: the packing window is sub-stream-keyed (source, shard), not global") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = q308.queryExecution.optimizedPlan.collect { case w: LWindow => w }
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

  test("q308: the BPE vocabulary and mixture budgets join as broadcasts, " +
    "and nothing degenerates to a cartesian") {
    val p = q308.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }
}
