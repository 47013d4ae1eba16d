package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Iterative graph analytics on DataFrames: PageRank over the bipartite
  * customer↔supplier trade graph (an edge per distinct (custkey, suppkey)
  * pair traded through orders⋈lineitem, walked in both directions).
  *
  * Each iteration is one equi-join (ranks ⋈ edges) + one partial-agg
  * groupBy — the join-agg loop shape that scales to billion-edge graphs
  * (same dataflow GraphX's Pregel lowers to), with the edge list persisted
  * across iterations. Determinism: fixed iteration count, damping 0.85,
  * uniform init; the DuckDB oracle unrolls the same 3 iterations as chained
  * CTEs, and the output buckets ranks (sum per node-kind × degree decile,
  * rounded) so float accumulation order can't flip a top-k boundary.
  */
object Graph {

  /** Node ids: customers as +custkey, suppliers as -suppkey (disjoint). */
  private def edges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("cust"), (-col("l_suppkey")).as("supp"))
      .distinct()
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  val q98PageRank = GraftQuery(
    "q98_pagerank",
    (s, dir) => {
      val e = edges(s, dir).persist()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val withDeg = e.join(deg, "src").persist()
      var ranks = deg.select(col("src").as("node"), lit(1.0).as("rank"))
      for (_ <- 1 to 3) {
        val contrib = withDeg.join(ranks, withDeg("src") === ranks("node"))
          .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
          .groupBy("dst").agg(sum("c").as("inflow"))
        ranks = ranks.select(col("node"), col("rank")).alias("r")
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(0.15) + lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      }
      val out = ranks.join(deg, ranks("node") === deg("src"))
        .select(
          when(col("node") > 0, "customer").otherwise("supplier").as("kind"),
          least(lit(9L), expr("outdeg div 10")).as("deg_bucket"),
          col("rank"))
        .groupBy("kind", "deg_bucket")
        .agg(count(lit(1)).as("n"), round(sum("rank"), 4).as("rank_mass"))
        .orderBy("kind", "deg_bucket")
      e.unpersist()
      withDeg.unpersist()
      out
    },
    Some("""WITH pairs AS (
           |  SELECT DISTINCT o_custkey AS cust, -l_suppkey AS supp
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS (SELECT cust AS src, supp AS dst FROM pairs
           |      UNION ALL SELECT supp, cust FROM pairs),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
           |c1 AS (SELECT e.dst, sum(r0.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
           |r1 AS (SELECT r0.node, 0.15 + 0.85 * coalesce(c1.inflow, 0) AS rank
           |  FROM r0 LEFT JOIN c1 ON c1.dst = r0.node),
           |c2 AS (SELECT e.dst, sum(r1.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
           |r2 AS (SELECT r1.node, 0.15 + 0.85 * coalesce(c2.inflow, 0) AS rank
           |  FROM r1 LEFT JOIN c2 ON c2.dst = r1.node),
           |c3 AS (SELECT e.dst, sum(r2.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
           |r3 AS (SELECT r2.node, 0.15 + 0.85 * coalesce(c3.inflow, 0) AS rank
           |  FROM r2 LEFT JOIN c3 ON c3.dst = r2.node)
           |SELECT CASE WHEN node > 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  least(9, outdeg // 10) AS deg_bucket,
           |  count(*) AS n, round(sum(rank), 4) AS rank_mass
           |FROM r3 JOIN deg ON deg.src = r3.node
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Distributed triangle counting with clustering coefficients over the
    * supplier co-purchase graph (an edge when two suppliers ship lines of
    * the same order). The algorithm is the degree-oriented wedge-closure
    * (Schank-Wagner / the MapReduce "node-iterator++"): orient every edge
    * from its lower-(degree, id) endpoint to the higher, enumerate wedges
    * only from each node's OUT-neighbors, and close them against the
    * oriented edge list.
    *
    * Scale: the orientation is the whole point — out-degrees are bounded by
    * O(√m) regardless of how skewed the raw degree distribution is, so the
    * wedge self-join (the quadratic step) is O(m^1.5) total and no hub node
    * explodes a partition. Both joins are keyed equi-joins (shuffle by node
    * / by edge endpoints); counts are exact integers, and the one float
    * (clustering coefficient = 2T / deg·(deg−1)) is per-row arithmetic.
    */
  val q148TriangleCount = GraftQuery(
    "q148_triangle_count",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val und = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
        .distinct()
        .persist()
      val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      // orient {a, b} from lower (deg, id) to higher — a total order, so
      // each triangle has exactly one wedge-closing representation
      val dn = deg.select(col("n"), col("deg"))
      val oriented = und
        .join(dn.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(dn.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("dst"))
        .persist()
      // wedges from a common source, ordered between the two endpoints by
      // the same total order so the closing edge is oriented (y → z)
      val dy = dn.select(col("n").as("y"), col("deg").as("dy"))
      val dz = dn.select(col("n").as("z"), col("deg").as("dz"))
      val wedges = oriented.as("p")
        .join(oriented.as("q"), col("p.src") === col("q.src"))
        .select(col("p.src").as("x"), col("p.dst").as("y"), col("q.dst").as("z"))
        .join(dy, "y").join(dz, "z")
        .filter(col("dy") < col("dz") ||
          (col("dy") === col("dz") && col("y") < col("z")))
        .select(col("x"), col("y"), col("z"))
      val tris = wedges.join(oriented,
          col("y") === col("src") && col("z") === col("dst"))
        .select(col("x"), col("y"), col("z"))
        .persist()
      val perNode = tris.select(col("x").as("n"))
        .unionAll(tris.select(col("y").as("n")))
        .unionAll(tris.select(col("z").as("n")))
        .groupBy("n").agg(count(lit(1)).as("n_tri"))
      deg.join(perNode, Seq("n"), "left")
        .select(col("n").as("suppkey"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          when(col("deg") >= 2,
            round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
              (col("deg") * (col("deg") - 1)), 6)).otherwise(lit(0.0))
            .as("clustering"))
        .orderBy("suppkey")
    },
    Some("""WITH und AS (
           |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
           |deg AS (SELECT n, count(*) AS deg FROM (
           |  SELECT u AS n FROM und UNION ALL SELECT v FROM und) GROUP BY 1),
           |oriented AS (
           |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
           |           THEN u ELSE v END AS src,
           |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
           |           THEN v ELSE u END AS dst
           |  FROM und JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
           |wedges AS (
           |  SELECT p.src AS x, p.dst AS y, q.dst AS z
           |  FROM oriented p JOIN oriented q ON p.src = q.src
           |  JOIN deg dy ON dy.n = p.dst JOIN deg dz ON dz.n = q.dst
           |  WHERE dy.deg < dz.deg OR (dy.deg = dz.deg AND p.dst < q.dst)),
           |tris AS (
           |  SELECT x, y, z FROM wedges
           |  JOIN oriented ON y = oriented.src AND z = oriented.dst),
           |pernode AS (SELECT n, count(*) AS n_tri FROM (
           |  SELECT x AS n FROM tris UNION ALL SELECT y FROM tris
           |  UNION ALL SELECT z FROM tris) GROUP BY 1)
           |SELECT deg.n AS suppkey, deg.deg,
           |  coalesce(pernode.n_tri, 0) AS n_tri,
           |  CASE WHEN deg.deg >= 2 THEN
           |    round(2.0 * coalesce(pernode.n_tri, 0) / (deg.deg * (deg.deg - 1)), 6)
           |  ELSE 0.0 END AS clustering
           |FROM deg LEFT JOIN pernode ON pernode.n = deg.n
           |ORDER BY suppkey""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q98PageRank, q148TriangleCount)
}
