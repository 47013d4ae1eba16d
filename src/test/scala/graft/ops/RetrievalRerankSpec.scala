package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Value-level pins for the round-11 retrieval additions: Dirichlet
  * query-likelihood ranking (q327) and MMR diversification (q328).
  */
class RetrievalRerankSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q327: five ranked results per query, scores non-increasing in rank") {
    val rows = SparkEntry.queries("q327_dirichlet_ql")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        s"qid $q ranks not contiguous")
      sorted.map(_.getAs[Double]("score")).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"qid $q scores increased")
        case _ =>
      }
      // a query doc never retrieves itself
      assert(!rs.exists(_.getAs[Long]("cid") == q))
    }
  }

  test("q328: greedy MMR picks are distinct per query, step 1 is the pure " +
    "relevance argmax, and marginal scores never increase") {
    val rows = SparkEntry.queries("q328_mmr_diversify")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("step"))
      assert(sorted.map(_.getAs[Long]("cid")).distinct.length == rs.length,
        s"qid $q re-picked a document")
      // greedy marginal scores are provably non-increasing: each later
      // step maximizes over a smaller candidate set with a larger penalty
      sorted.map(_.getAs[Double]("mmr")).sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-9, s"qid $q mmr increased")
        case _ =>
      }
    }
  }
}
