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

  private def docsFrame() = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L, 40L, 60L, 70L))
    ).toDF("id", "g")
  }

  private def injectedBoundCount(df: org.apache.spark.sql.DataFrame): Int = {
    val allExprs = df.queryExecution.optimizedPlan.collect { case n => n.expressions }.flatten
    allExprs.flatMap(_.collect {
      case GreaterThanOrEqual(_, Multiply(_, _, _)) => true
    }).size
  }

  test("Dice-shaped predicate is NOT rewritten (bound would be unsound)") {
    val docs = docsFrame()
    val l = docs.select(col("id").as("i"), col("g").as("gi"))
    val r = docs.select(col("id").as("j"), col("g").as("gj"))
    val inter = GraftFunctions.intersectCount(col("gi"), col("gj")).cast("double")
    // Dice = 2I/(|a|+|b|): contains size(a), size(b) and the intersect count,
    // but is not Jaccard — the rule must leave it alone. |a|=4, |b|=6, I=4
    // gives Dice 0.8, which a Jaccard size bound at t=0.8 would wrongly drop.
    val dice = l.join(r, col("i") < col("j"))
      .filter((inter * 2) / (size(col("gi")) + size(col("gj"))) >= 0.8)
      .select("i", "j")
    assert(injectedBoundCount(dice) == 0,
      dice.queryExecution.optimizedPlan.toString.take(3000))
    val spark0 = spark
    import spark0.implicits._
    assert(dice.as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("Jaccard threshold under a DISJUNCTION is NOT rewritten (bound " +
    "would drop rows the other disjunct accepts)") {
    val spark0 = spark
    import spark0.implicits._
    GraftFunctions.register(spark)
    // doc 0 is empty: its pairings satisfy the filter via the
    // size(gi) = 0 escape hatch but FAIL the Jaccard disjunct's size
    // bound — a rule that collected predicates from inside the Or and
    // injected their bounds as top-level conjuncts would silently drop
    // (0,1) and (0,2)
    val docs = Seq(
      (0L, Seq.empty[Long]),
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L, 50L))
    ).toDF("id", "g")
    val l = docs.select(col("id").as("i"), col("g").as("gi"))
    val r = docs.select(col("id").as("j"), col("g").as("gj"))
    val inter = GraftFunctions.intersectCount(col("gi"), col("gj")).cast("double")
    val either = l.join(r, col("i") < col("j"))
      .filter(size(col("gi")) === 0 ||
        inter / (size(col("gi")) + size(col("gj")) - inter) >= 0.5)
      .select("i", "j")
    assert(injectedBoundCount(either) == 0,
      either.queryExecution.optimizedPlan.toString.take(3000))
    assert(either.as[(Long, Long)].collect().toSet ==
      Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("denominator subtracting a DIFFERENT intersect count is NOT rewritten") {
    val docs = docsFrame()
    val l = docs.select(col("id").as("i"), col("g").as("gi"))
    val r = docs.select(col("id").as("j"), col("g").as("gj"))
    val inter = GraftFunctions.intersectCount(col("gi"), col("gj")).cast("double")
    val other = GraftFunctions.intersectCount(col("gj"), col("gi")).cast("double")
    val odd = l.join(r, col("i") < col("j"))
      .filter(inter / (size(col("gi")) + size(col("gj")) - other) >= 0.5)
      .select("i", "j")
    assert(injectedBoundCount(odd) == 0,
      odd.queryExecution.optimizedPlan.toString.take(3000))
  }
}
