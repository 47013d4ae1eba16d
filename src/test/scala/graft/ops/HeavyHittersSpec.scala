package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q189's Misra-Gries candidate phase: the oracle gate only checks the
  * final exact-filtered output, which would also pass if the candidate
  * stage silently emitted every distinct term (defeating the sketch's
  * point) or — worse — if it dropped a true heavy hitter (the exact phase
  * cannot resurrect a missing candidate). Both properties are pinned here
  * on the fixture token stream.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val toks = graft.Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("term"))
    .persist()

  test("MG candidates are a superset of every term above the N/(k+1) bar") {
    val k = 512
    val n = toks.count()
    val mandatory = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
      .select("term")
    val cands = Sketches.misraGriesCandidates(toks, k)
    val missed = mandatory.join(cands, Seq("term"), "left_anti").count()
    assert(missed == 0L, s"$missed guaranteed-frequent terms missing from MG candidates")
  }

  test("MG candidate volume is bounded by partitions x k, below distinct terms") {
    val k = 8 // small k so the bound bites on the fixture's ~31-term vocabulary
    val parts = toks.rdd.getNumPartitions
    val cands = Sketches.misraGriesCandidates(toks, k).count()
    val distinctTerms = toks.distinct().count()
    assert(cands <= parts.toLong * k,
      s"$cands candidates exceed the $parts x $k summary bound")
    assert(cands < distinctTerms,
      s"candidate set ($cands) did not prune the $distinctTerms distinct terms")
  }
}
