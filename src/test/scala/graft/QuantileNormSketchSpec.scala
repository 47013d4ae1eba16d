package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q267 — the sketch-boundary quantile normalization q193's scaladoc
  * promises: per-source approx_percentile boundaries replacing the exact
  * per-source rank window. Pins the two properties that make it the
  * 100 TB form: the boundary frame is ≤ 2×9 values PER SOURCE regardless
  * of corpus size, and the doc-side plan is a broadcast join with no
  * window at all.
  */
class QuantileNormSketchSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("boundary frame is one row per source with 9+9 boundaries — fixed " +
    "state regardless of source size") {
    val bounds = ops.Quality.quantileNormBounds(spark, sf)
    val nSources = Tables.documents(spark, sf)
      .select(countDistinct("source")).head().getLong(0)
    val rows = bounds.collect()
    assert(rows.length == nSources, s"${rows.length} rows vs $nSources sources")
    for (r <- rows) {
      assert(r.getSeq[Double](r.fieldIndex("eb")).size == 9)
      assert(r.getSeq[Double](r.fieldIndex("ab")).size == 9)
    }
  }

  test("sketch boundaries sit within the 2% band the query asserts") {
    // the sketch_ok booleans ARE the oracle-checked property; this spec
    // re-asserts them directly so a GK regression fails here with the
    // actual deltas, not just a hash mismatch
    val out = SparkEntry.queries("q267_quantile_norm_sketch")(spark, sf)
    val bad = out.filter(!col("sketch_ok")).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("doc-side plan: broadcast boundary join, zero windows") {
    val p = SparkEntry.queries("q267_quantile_norm_sketch")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
  }
}
