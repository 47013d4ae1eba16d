package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused sorted-merge intersect must be indistinguishable from
  * `array_intersect` under the sorted-distinct precondition — element
  * equality AND ascending order (array_intersect preserves the left
  * argument's order, which for a sorted left side is also ascending).
  */
class IntersectSortedSpec extends AnyFunSuite with SparkSpec with graft.SeededGen {

  test("property: equals array_intersect on random sorted distinct arrays") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val genArr: Gen[Seq[Long]] = for {
      n <- Gen.choose(0, 400)
      s <- Gen.containerOfN[Seq, Long](n, Gen.choose(0L, 500L))
    } yield s.distinct.sorted
    val rows = sample(Gen.zip(genArr, genArr), 25, 0x1357L)
    assert(rows.size >= 20)
    val df = rows.toDF("a", "b")
    val got = df.select(
        GraftFunctions.intersectSorted(col("a"), col("b")).as("fused"),
        array_intersect(col("a"), col("b")).as("builtin"),
        GraftFunctions.intersectCount(col("a"), col("b")).as("cnt"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "element mismatch")
      assert(r.getSeq[Long](0).size.toLong == r.getLong(2), "count mismatch")
    }
  }

  test("null elements are skipped, never read as 0 (SQL callers can pass " +
    "any array<bigint>)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_intersect_sorted(array(CAST(NULL AS BIGINT), 5L),
        |                         array(0L, 5L)) AS els,
        |  graft_intersect_count(array(CAST(NULL AS BIGINT), 5L),
        |                        array(0L, 5L)) AS cnt""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(5L), "null must not fabricate element 0")
    assert(r.getLong(1) == 1L, "null must not count as a phantom match")
  }

  test("SQL surface: graft_intersect_sorted is registered") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_intersect_sorted(array(1L,3L,5L), array(3L,4L,5L)) AS r")
      .head().getSeq[Long](0)
    assert(out == Seq(3L, 5L))
  }
}
