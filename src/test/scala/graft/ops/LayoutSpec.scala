package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Physical-layout invariants: partition pruning reaches the scan and the
  * bucketed join runs shuffle-free — the two plan facts the 100 TB layout
  * story rests on.
  */
class LayoutSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q84: event_type filter prunes hive partitions at the scan") {
    val df = Layout.q84PartitionedWrite.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(event_type"),
      plan.take(3000))
    assert(df.collect().nonEmpty)
  }

  test("q85: bucketed join plans with no shuffle exchange") {
    // at fixture scale the planner would broadcast instead of using the
    // buckets; disable broadcast so the co-location property is visible
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try testBucketedJoin()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def testBucketedJoin(): Unit = {
    val df = Layout.q85BucketedJoin.fn(spark, sf)
    // the join itself must not re-shuffle either bucketed side: both scans
    // read bucketed, and no Exchange repartitions on a join key (the
    // groupBy/orderBy above the join still shuffle on their own keys)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(3000))
    assert("Bucketed: true".r.findAllIn(plan).size == 2, plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(3000))
    assert(df.collect().nonEmpty)
  }

  test("q93: z-order sink clusters each file into a narrow z-range") {
    Layout.q93ZOrder.fn(spark, sf).collect() // runs the clustered write
    // resolve through WorkDir exactly as the query does — a hardcoded path
    // here rotted once before and only passed off a stale directory
    val out = graft.WorkDir.resolve(spark, "layout_zorder", sf)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect()
    assert(spans.length > 1, "expected multiple z-clustered files")
    val global = spans.map(_.getAs[Long]("hi")).max - spans.map(_.getAs[Long]("lo")).min
    val avgSpan = spans.map(r => r.getAs[Long]("hi") - r.getAs[Long]("lo")).sum.toDouble / spans.length
    // range-partitioned + sorted on z: each file covers ~1/8 of the space;
    // anything below half the global span proves the clustering engaged
    assert(avgSpan < global / 2.0, s"avg per-file z-span $avgSpan vs global $global")
  }

  test("q86: merged schema surfaces nulls for pre-evolution rows") {
    val rows = Layout.q86SchemaEvolution.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Number]("n").longValue
      val scored = r.getAs[Number]("n_scored").longValue
      assert(scored <= n) // old-batch rows must not be counted as scored
    }
    val totalN = rows.map(_.getAs[Number]("n").longValue).sum
    assert(totalN == Tables.documents(spark, sf).count())
  }
}
