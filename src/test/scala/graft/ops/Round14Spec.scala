package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-14 optimization pins: the fused [[graft.functions.TriangleCredits]]
  * kernel (one sorted-merge pass emitting all three credits per triangle)
  * against a brute-force reference on a hand graph and on the sf0.001
  * co-purchase graph, in both modes (node credits for q148, edge-key
  * credits for q375).
  */
class Round14Spec extends AnyFunSuite with SparkSpec {

  private def ek(a: Long, b: Long): Long =
    math.min(a, b) * 2147483648L + math.max(a, b)

  /** Brute-force triangles of an undirected edge set {u < v}. */
  private def triangles(edges: Set[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: Long, b: Long) =
      edges.contains((math.min(a, b), math.max(a, b)))
    for {
      x <- nodes; y <- nodes if x < y && adj(x, y)
      z <- nodes if y < z && adj(x, z) && adj(y, z)
    } yield (x, y, z)
  }

  private def creditFrames(edgeSeq: Seq[(Long, Long)]) = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val edges = edgeSeq.toDF("u", "v")
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbr"))
    oriented
      .join(adj.select(col("src"), col("nbr").as("nx")), "src")
      .join(adj.select(col("src").as("dst"), col("nbr").as("ny")), "dst")
  }

  test("fused TriangleCredits node mode matches brute-force per-node counts") {
    val edgeSeq: Seq[(Long, Long)] = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L), (5L, 6L), (1L, 4L))
    val dec = creditFrames(edgeSeq)
    val got = dec.select(explode(graft.functions.GraftFunctions
        .triangleCredits(col("src"), col("dst"), col("nx"), col("ny"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = triangles(edgeSeq.toSet)
      .flatMap { case (x, y, z) => Seq(x, y, z) }
      .groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    assert(got == want)
    assert(!got.contains(5L) && !got.contains(6L)) // absent = zero triangles
  }

  test("fused TriangleCredits pair mode matches brute-force edge support") {
    val edgeSeq: Seq[(Long, Long)] = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L), (5L, 6L), (1L, 4L))
    val dec = creditFrames(edgeSeq)
    val got = dec.select(explode(graft.functions.GraftFunctions
        .trussCredits(col("src"), col("dst"), col("nx"), col("ny"))).as("ek"))
      .groupBy("ek").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = triangles(edgeSeq.toSet)
      .flatMap { case (x, y, z) => Seq(ek(x, y), ek(x, z), ek(y, z)) }
      .groupBy(identity).map { case (k, l) => k -> l.size.toLong }
    assert(got == want)
  }

  test("RollingGramKeys: rolling keys equal per-position Horner recompute " +
    "and separate every distinct 30-gram of a crafted corpus") {
    import graft.functions.RollingGramKeys._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val L = ExactSpans.L
    def direct(s: String, i: Int): Long = {
      // independent per-position recompute: Σ cp_j · B^(L−1−j) mod M
      val cps = s.codePoints().toArray.slice(i, i + L)
      def h(b: Long, m: Long) =
        cps.foldLeft(0L)((acc, c) => (acc * b + c) % m)
      h(B1, M1) * 2147483648L + h(B2, M2)
    }
    val block = "0123456789" * 4
    val texts = Seq(
      s"aaaa${block}bbbb",
      s"cccccccc${block}dddddddd",
      "The boilerplate legal disclaimer text, repeated: " +
        "The boilerplate legal disclaimer text.",
      "ünïcøde çháracters beyond ascii — ünïcøde çháracters beyond ascii!")
    val rows = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.rollingGramKeys(col("text"), L)))
      .toDF("doc_id", "i", "k")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((id, i, k) <- rows)
      assert(k == direct(texts(id.toInt), i), s"doc $id pos $i")
    // the key's equality relation must match exact gram equality here
    // (collisions are possible in principle, impossible on this fixture)
    val byKey = rows.groupBy(_._3).values
    for (grp <- byKey) {
      val grams = grp.map { case (id, i, _) =>
        val cps = texts(id.toInt).codePoints().toArray
        new String(cps.slice(i, i + L), 0, L)
      }.toSet
      assert(grams.size == 1, s"collision across distinct grams: $grams")
    }
    val nGrams = rows.map { case (id, i, _) =>
      val cps = texts(id.toInt).codePoints().toArray
      new String(cps.slice(i, i + L), 0, L)
    }.toSet.size
    assert(byKey.toSeq.size == rows.map(_._3).toSet.size)
    assert(rows.map(_._3).toSet.size == nGrams, "distinct grams != distinct keys")
  }

  test("q339 bitmask greedy equals a set-based greedy replay at sf0.001") {
    // reference: independent set-based greedy over the exact per-source
    // trigram sets (the shape the bitmask pass replaced), including the
    // vocab denominator and the (gain desc, source asc) tie-break
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val sw = graft.Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), " ").as("ws"))
      .select(col("source"), explode(expr(
        """CASE WHEN size(ws) >= 3 THEN
          |  transform(sequence(0, size(ws) - 3),
          |    i -> concat_ws(' ', slice(ws, i + 1, 3)))
          |ELSE array() END""".stripMargin)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc: Map[String, Set[String]] =
      sw.groupBy(_._1).map { case (s0, l) => s0 -> l.map(_._2).toSet }
    val vocab = bySrc.values.flatten.toSet.size.toLong
    var covered = Set.empty[String]
    var picked = Vector.empty[String]
    val want = (1 to 5).map { step =>
      val (src, gain) = bySrc.keys.toSeq.sorted.filterNot(picked.contains)
        .map(s0 => s0 -> (bySrc(s0) -- covered).size.toLong)
        .maxBy(_._2)
      covered ++= bySrc(src); picked :+= src
      (step, src, gain,
        BigDecimal(covered.size.toDouble / vocab)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Extras10.q339MaxCoverage.fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(4)))
    assert(got.toSeq == want)
  }

  test("q148 fused per-node counts match the two-leg reference at sf0.001") {
    graft.functions.GraftFunctions.register(spark)
    val und = Graph.coPurchaseEdges(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001"),
      "l_orderkey", "l_suppkey")
    val edgeSeq = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dec = creditFrames(edgeSeq)
    val got = dec.select(explode(graft.functions.GraftFunctions
        .triangleCredits(col("src"), col("dst"), col("nx"), col("ny"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two-leg reference: intersect-count endpoint credits + apex explode
    val xy = dec.select(col("src").as("x"), col("dst").as("y"),
        graft.functions.GraftFunctions
          .intersectCount(col("nx"), col("ny")).as("c"))
      .select(explode(array(col("x"), col("y"))).as("n"), col("c"))
      .groupBy("n").agg(sum("c").as("t"))
    val zc = dec.select(explode(graft.functions.GraftFunctions
        .intersectSorted(col("nx"), col("ny"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("t"))
    val want = xy.unionAll(zc).groupBy("n").agg(sum("t").as("t"))
      .filter(col("t") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture graph must contain triangles")
  }
}
