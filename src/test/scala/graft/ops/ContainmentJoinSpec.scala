package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GraftFunctions

/** q173's asymmetric containment candidates. Mirrors PrefixJoinSpec: the
  * oracle gate only checks final-output equality, so the two load-bearing
  * candidate-stage properties — prunes (≪ all directional pairs) and
  * misses nothing above the threshold — are pinned here directly.
  */
class ContainmentJoinSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val t = 0.8

  private lazy val sets = {
    GraftFunctions.register(spark)
    Dedup.prefixJoinSets(spark, sf, 200).persist()
  }

  test("containment candidates prune: well below all directional pairs") {
    val n = sets.count()
    val all = n * (n - 1) // directional
    val cand = Dedup.containmentCandidates(sets, t).count()
    assert(cand < all / 2,
      s"containment join generated $cand candidates vs $all directional pairs")
  }

  test("containment candidates are complete above the threshold") {
    GraftFunctions.register(spark)
    val a = sets.select(col("doc_id").as("i"), col("ti").as("ta"))
    val b = sets.select(col("doc_id").as("j"), col("ti").as("tb"))
    val inter = GraftFunctions.intersectCount(col("ta"), col("tb")).cast("int")
    val truth = a.join(b, col("i") =!= col("j"))
      .withColumn("cont", inter.cast("double") / size(col("ta")))
      .filter(col("cont") >= t)
      .select("i", "j")
    val cand = Dedup.containmentCandidates(sets, t)
    val missed = truth.join(cand, Seq("i", "j"), "left_anti").count()
    assert(missed == 0L, s"$missed qualifying pairs missing from candidates")
    assert(truth.count() > 0L, "fixture has no qualifying pairs — test is vacuous")
  }
}
