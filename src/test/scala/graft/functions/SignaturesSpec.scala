package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The fused kernels must equal their compositional (HOF) definitions —
  * that equivalence is what keeps the DuckDB oracles valid.
  */
class SignaturesSpec extends AnyFunSuite with SparkSpec {

  private def tokens = {
    import spark.implicits._
    Seq(
      Seq(5L, 999999L, 42L, 7L),
      Seq(1L),
      Seq.tabulate(200)(i => (i * 2654435761L) % 4294967296L)
    ).toDF("t")
  }

  test("MinHashSignature equals the HOF min-over-family definition") {
    GraftFunctions.register(spark)
    val hof = expr(
      """transform(sequence(0, 23), h ->
        |  array_min(transform(t, x -> (x * (2*h + 1) + h * 1000000007L + 12345L) % 2147483647L)))
        |""".stripMargin)
    val rows = tokens.select(
      GraftFunctions.minhash(col("t"), 24).as("fused"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("SimHash60 equals the per-bit majority definition") {
    GraftFunctions.register(spark)
    val hof = expr(
      """aggregate(sequence(0, 59), 0L, (acc, j) ->
        |  acc + IF(aggregate(t, 0L, (a, x) -> a + (shiftright(x, j) & 1) * 2 - 1) > 0,
        |           shiftleft(1L, j), 0L))""".stripMargin)
    val rows = tokens.select(
      GraftFunctions.simhash60(col("t")).as("fused"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("IntersectCountSorted equals size(array_intersect) on sorted sets") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(5L, 6L))
    ).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.intersectCount(col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
