package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** V2 pushdown behavior of the generator source: split planning, column
  * pruning reaching the reader, and LIMIT truncating the generated range.
  */
class NumbersSourceSpec extends AnyFunSuite with SparkSpec {

  private def load(end: Long, splits: Int) =
    spark.read.format("graft.sources.NumbersSource")
      .option("end", end.toString).option("splits", splits.toString).load()

  test("rows split into the requested partitions and values are deterministic") {
    val df = load(1000, 8)
    assert(df.rdd.getNumPartitions == 8)
    val row = df.filter("id = 42").collect().head
    assert(row.getAs[Long]("hash") == NumbersSource.md5Int(42L))
    assert(row.getAs[Int]("bucket") == 2)
    assert(df.count() == 1000)
  }

  test("column pruning reaches the scan") {
    val plan = load(1000, 4).select("id").queryExecution.executedPlan.toString
    assert(plan.contains("cols=id") && !plan.contains("hash"), plan.take(2000))
  }

  test("limit pushes into the source and truncates the range") {
    val df = load(1000000, 4).limit(7)
    assert(df.queryExecution.executedPlan.toString.contains("end=7"),
      df.queryExecution.executedPlan.toString.take(2000))
    assert(df.count() == 7)
  }
}
