package graft.rebalance

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Hive-style partitioned layout + partition pruning: a filter on the
  * partition column must reach the scan as a partition filter (directories
  * skipped entirely), not a row filter — the difference between reading
  * 1/N and N/N of a 100 TB table.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSpec {

  private lazy val dir = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_partitioned_events"
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(d)
    d
  }

  test("filter on the partition column becomes a partition filter") {
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "expected the event_type predicate as a partition filter")
    // only the click directory's rows are read
    val clicks = q.count()
    val total = spark.read.parquet(dir).count()
    assert(clicks > 0 && clicks < total)
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum < scan.relation.location.listFiles(Nil, Nil)
      .map(_.files.size).sum,
      "pruned file listing should be smaller than the full listing")
  }
}
