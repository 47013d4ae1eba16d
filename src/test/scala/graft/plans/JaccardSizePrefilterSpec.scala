package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Multiply, Size}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GraftFunctions

class JaccardSizePrefilterSpec extends AnyFunSuite with SparkSpec {

  private def pairs() = {
    import spark.implicits._
    GraftFunctions.register(spark)
    // doc 1/2 near-dup (share 3 of 4 grams); doc 3 much longer — the size
    // bound alone must discard its pairings
    val docs = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L, 50L)),
      (3L, (1L to 40L).toSeq)
    ).toDF("id", "g")
    val l = docs.select(col("id").as("i"), col("g").as("gi"))
    val r = docs.select(col("id").as("j"), col("g").as("gj"))
    val inter = GraftFunctions.intersectCount(col("gi"), col("gj")).cast("double")
    l.join(r, col("i") < col("j"))
      .filter(inter / (size(col("gi")) + size(col("gj")) - inter) >= 0.5)
      .select("i", "j")
  }

  test("rule injects exact size-compatibility bounds ahead of the Jaccard filter") {
    val optimized = pairs().queryExecution.optimizedPlan
    val allExprs = optimized.collect { case n => n.expressions }.flatten
    val injected = allExprs.flatMap(_.collect {
      case GreaterThanOrEqual(_, Multiply(_, _, _)) => true
    })
    // exactly the two bounds — re-runs of the fixed-point batch must not
    // stack duplicates
    assert(injected.size == 2, optimized.toString.take(3000))
    // the bound compares SIZES, not the intersect count
    val sizeNodes = allExprs.flatMap(_.collect { case s: Size => s })
    assert(sizeNodes.size >= 4, optimized.toString.take(3000))
  }

  test("injected bounds change no results (exact pre-condition)") {
    val spark0 = spark
    import spark0.implicits._
    val got = pairs().as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L))) // doc 3 pairs are below threshold anyway
  }
}
