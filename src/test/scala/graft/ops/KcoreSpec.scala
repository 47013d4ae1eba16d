package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q171's k-core peel. Pins three things the oracle gate alone can't:
  * exact k-core on a planted graph (clique + pendant tail), genuine
  * CASCADE peeling (a chain that unravels over multiple rounds — not one
  * degree filter), and the fixture's convergence depth at the verify SF
  * (the DuckDB oracle unrolls 6 peel rounds, so the Spark fixpoint must
  * land within 6 or the unrolled oracle would disagree).
  */
class KcoreSpec extends AnyFunSuite with SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    val p = pairs.toDF("u", "v")
    p.unionAll(p.select(col("v").as("u"), col("u").as("v")))
  }

  test("planted graph: 3-core is exactly the K4 clique, tail peeled") {
    // K4 on {0,1,2,3} (degree 3 each) plus a pendant path 3-4-5.
    val clique = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val (core, _) = Graph.kcorePeel(edgesDf(clique ++ Seq((3L, 4L), (4L, 5L))), 3, 10)
    val deg = core.groupBy("u").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"3-core should be K4 alone, got $deg")
  }

  test("peel cascades: a path unravels from both ends, one hop per round") {
    // Path 0-1-2-...-7 under k=2: endpoints have degree 1, their removal
    // exposes the next node, and so on — the empty fixpoint takes ~len/2
    // rounds, which a single degree filter (no iteration) would not reach.
    val path = (0L until 7L).map(i => (i, i + 1))
    val (core, rounds) = Graph.kcorePeel(edgesDf(path), 2, 20)
    assert(core.count() == 0L, "path has no 2-core")
    assert(rounds >= 4, s"expected multi-round cascade, converged in $rounds")
  }

  test("fixture converges within the oracle's 6 unrolled rounds and cascades") {
    val edges = Graph.semanticEdges(spark, "/root/testdata/sf0.01")
    val (core, rounds) = Graph.kcorePeel(edges, 7, 12)
    assert(rounds <= 6, s"fixpoint took $rounds rounds; oracle unrolls only 6")
    assert(rounds >= 2, s"no cascade on fixture (rounds=$rounds) — test is weak")
    assert(core.count() > 0L, "fixture 7-core is empty — oracle comparison vacuous")
    core.unpersist()
  }
}
