package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The bounded-cell property behind q141: with k scaled to the corpus
  * (k = max(8, ceil(n / 64))), lloyd cells stay bounded even when the data
  * is heavily skewed — the property that keeps within-cell pairwise
  * comparison LINEAR in corpus size. A label-derived cell assignment (the
  * q134 baseline) would put the dominant blob — 80% of the corpus — into
  * one cell and pay O(n²) there.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkSpec {

  /** Deterministic uniform in [-1, 1) from a string key (md5-derived, the
    * fixture discipline used across the suite — no RNG state).
    */
  private def u(key: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    var v = 0L
    (0 until 8).foreach(i => v = (v << 8) | (d(i) & 0xffL))
    (v >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  test("scaled-k lloyd splits a dominant blob into bounded cells") {
    import spark.implicits._
    val dim = 4
    val centers = Seq(
      Seq(10.0, 0.0, 0.0, 0.0),
      Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 0.0))
    val sizes = Seq(400, 80, 20) // 80% of the corpus in blob 0
    val pts = for {
      (c, bi) <- centers.zipWithIndex
      j <- 0 until sizes(bi)
    } yield (bi, j, c.zipWithIndex.map { case (x, d) => x + u(s"${bi}_${j}_$d") })
    // vec_ids interleaved across blobs by hash so the k lowest-id seeds
    // sample the corpus (not one blob) — the production seeding discipline
    val ids = pts.sortBy { case (bi, j, _) => u(s"id_${bi}_$j") }.zipWithIndex
      .map { case ((_, _, v), id) => (id.toLong, v) }
    val df = ids.toDF("vec_id", "v")
    val n = ids.size
    val k = math.max(8, math.ceil(n / 64.0).toInt) // the q141 formula → 8
    val (_, assigned) = Vectors.lloyd(df, k, rounds = 2, dim = dim)
    val cellSizes = assigned.groupBy("j").count().collect()
      .map(r => r.getLong(1))
    assert(cellSizes.sum == n)
    // the dominant blob is split: no cell holds it whole
    assert(cellSizes.max < 400, s"cells: ${cellSizes.sorted.mkString(",")}")
    // bounded vs the design target n/k = 62: within 3× even under skew
    assert(cellSizes.max <= 3L * (n / k),
      s"cells: ${cellSizes.sorted.mkString(",")}")
  }
}
