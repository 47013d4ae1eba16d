package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.GraftFunctions

/** q150's prefix-filtering candidate generation: the point of PPJoin is
  * that the prefix equi-join emits FAR fewer pairs than brute force while
  * missing nothing above the threshold. Both halves are pinned here on the
  * fixture — the oracle gate only checks final-output equality, which a
  * secretly-cartesian candidate stage would also pass.
  */
class PrefixJoinSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.5

  private lazy val sets = {
    GraftFunctions.register(spark) // shingleHashed uses graft_shingle3
    Dedup.prefixJoinSets(spark, sf, 200).persist()
  }

  test("prefix candidates prune: candidate count well below brute-force pairs") {
    val n = sets.filter(size(col("ti")) > 0).count()
    val brute = n * (n - 1) / 2
    val cand = Dedup.prefixCandidates(sets, tau).count()
    assert(cand < brute / 2,
      s"prefix join generated $cand candidates vs $brute brute-force pairs")
  }

  test("prefix candidates are complete: every pair with J >= tau is a candidate") {
    GraftFunctions.register(spark)
    val a = sets.select(col("doc_id").as("i"), col("ti").as("ta"))
    val b = sets.select(col("doc_id").as("j"), col("ti").as("tb"))
    val inter = GraftFunctions.intersectCount(col("ta"), col("tb")).cast("int")
    val truth = a.join(b, col("i") < col("j"))
      .withColumn("jac",
        inter.cast("double") / (size(col("ta")) + size(col("tb")) - inter))
      .filter(col("jac") >= tau)
      .select("i", "j")
    val cand = Dedup.prefixCandidates(sets, tau)
    val missed = truth.join(cand, Seq("i", "j"), "left_anti").count()
    assert(missed == 0L, s"$missed qualifying pairs missing from candidates")
    assert(truth.count() > 0L, "fixture has no qualifying pairs — test is vacuous")
  }
}
