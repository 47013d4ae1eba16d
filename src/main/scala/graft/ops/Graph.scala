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

  val all: Seq[GraftQuery] = Seq(q98PageRank)
}
