package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-10 second-pass queries — the structural claims
  * their scaladocs make, turned into test failures (the PlanShapeSpec
  * discipline): Q21's decorrelation shape, q300's narrow-key shuffle,
  * q293's broadcast probe, q303's single cube pass.
  */
class Round10PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q296: EXISTS/NOT-EXISTS decorrelate to hash semi/anti joins with a top-k") {
    val p = plan("q296_tpch_q21")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q300: the duplicate-key aggregate shuffles ONLY the rolling key — " +
    "one fixed 8-byte long, no text/gram column ever crosses the wire") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.LongType
    val opt = SparkEntry.queries("q300_exact_span_dedup")(spark, sf)
      .queryExecution.optimizedPlan
    val dupAgg = opt.collect {
      case a: Aggregate
          if a.groupingExpressions.size == 1 &&
            a.groupingExpressions.head.references.toSeq
              .exists(_.name == "k") => a
    }
    assert(dupAgg.nonEmpty, "duplicate-key aggregate not found")
    dupAgg.foreach { a =>
      // narrow-key pin: the shuffled key must stay the ONE packed BIGINT
      // the rolling pass emits (r14) — a regression to a hex STRING key
      // doubles the per-position shuffle bytes on the engine's hottest
      // groupBy, and the primitive-long key is also the cheapest possible
      // HashAggregate probe
      a.groupingExpressions.foreach { g =>
        assert(g.dataType == LongType,
          s"dup-key grouping expression is ${g.dataType}, expected LongType")
      }
      val childCols = a.child.output.map(_.name).toSet
      assert(!childCols.contains("text"),
        s"text reaches the dup aggregate: $childCols")
    }
  }

  test("q293: the clip-fingerprint batch broadcasts into the index probe join") {
    val p = plan("q293_audio_fingerprint")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }

  test("q303: all 16 lattice cardinalities come from ONE cube pass (a single Expand)") {
    val p = plan("q303_mv_advisor")
    assert("Expand".r.findAllIn(p).size >= 1, p.take(3000))
    // exactly one Expand: a second would mean the lattice was scanned twice
    assert("(?m)^.*Expand".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("q295: the time-origin bounds are a broadcast 1-row aggregate, not a shuffle") {
    val p = plan("q295_periodogram")
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }
}
