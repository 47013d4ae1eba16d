package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DedupClusterSpec extends AnyFunSuite with SparkSpec {

  test("connected components collapse chains, triangles, and isolated pairs") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("i", "j")
    val got = Dedup.connectedComponents(edges)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(got == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (diameter > 2 rounds)") {
    import spark.implicits._
    val n = 30L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("i", "j")
    val got = Dedup.connectedComponents(edges).as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L))
  }

  test("distributed star path (threshold 0) agrees with the local union-find") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("i", "j")
    val dist = Dedup.connectedComponents(edges, localThreshold = 0L)
      .as[(Long, Long)].collect().sorted.toSeq
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(dist == local)
  }

  test("large-star/small-star agrees with union-find and GraphX " +
      "on an adversarial long chain") {
    import spark.implicits._
    // a 200-node chain (diameter 199) plus a triangle and a pair: the shape
    // where O(diameter) min-label propagation is at its worst and the
    // O(log n) star algorithm shines
    val edges = ((0L until 199L).map(i => (i, i + 1)) ++
      Seq((500L, 501L), (501L, 502L), (500L, 502L), (700L, 701L)))
      .toDF("i", "j")
    val star = Dedup.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val graphx = Dedup.connectedComponentsGraphX(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(star == local)
    assert(star == graphx)
    // chain collapses to min label 0 in well under diameter rounds
    assert(star.count(_._2 == 0L) == 200)
  }

  test("min-label variant agrees with union-find and star on a small mixed graph") {
    import spark.implicits._
    // small diameter on purpose: min-label pays one distributed round per
    // hop, so its parity case stays on a graph where that's cheap
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("i", "j")
    val minLabel = Dedup.connectedComponentsMinLabel(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val star = Dedup.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(minLabel == local)
    assert(minLabel == star)
  }

  test("large-star/small-star handles scrambled ids and reversed edges") {
    import spark.implicits._
    val edges = ((0L until 60L).map(k => ((k * 37) % 61 + 1000L, (k * 37 + 1) % 61 + 1000L)) ++
      Seq((5L, 3L), (3L, 9L), (9L, 5L))).toDF("i", "j")
    val star = Dedup.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(star == local)
  }

  test("GraphX variant agrees with the DataFrame loop on a mixed graph") {
    import spark.implicits._
    // chains, triangles, pairs, and hash-scrambled ids in one edge list
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)) ++
      (0L until 40L).map(k => (1000L + (k * 37) % 40, 1000L + (k * 37 + 1) % 40)))
      .toDF("i", "j")
    val loop = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val graphx = Dedup.connectedComponentsGraphX(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(loop == graphx)
  }
}
