package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.rebalance.Rebalancer

/** End-to-end rebalance verification queries: physically redistribute a
  * fixture table through [[Rebalancer]] (staging write + swap), read the
  * result back, and emit a distribution summary the DuckDB oracle can compute
  * directly from the ORIGINAL table — proving the redistribution preserved
  * the row multiset (the reference's core guarantee for its bulk
  * `INSERT INTO … SELECT *` rebalance, `sharding_recreation.py:159-160`).
  */
object RebalanceQueries {

  private def workDir(s: org.apache.spark.sql.SparkSession, sfDir: String,
      tag: String): String =
    graft.WorkDir.resolve(s, s"rebalance_$tag", sfDir)

  /** Hash-scatter lineitem into 8 shards on l_orderkey, then verify bucket
    * counts and quantity sums survive the move.
    */
  val q17RebalanceHash = GraftQuery(
    "q17_rebalance_hash",
    (s, dir) => {
      val dest = workDir(s, dir, "hash")
      Rebalancer.redistribute(Tables.lineitem(s, dir), Rebalancer.ByHash("l_orderkey"), 8, dest)
      s.read.parquet(dest)
        .groupBy(pmod(col("l_orderkey"), lit(8L)).as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("bucket")
    },
    Some("""SELECT l_orderkey % 8 AS bucket, count(*) AS n,
           |  round(sum(l_quantity), 2) AS sum_qty
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Range-partition orders into 4 shards on o_orderdate (sorted layout →
    * partition pruning on date predicates), verify monthly distribution.
    */
  val q18RebalanceRange = GraftQuery(
    "q18_rebalance_range",
    (s, dir) => {
      val dest = workDir(s, dir, "range")
      Rebalancer.redistribute(Tables.orders(s, dir), Rebalancer.ByRange("o_orderdate"), 4, dest)
      s.read.parquet(dest)
        .groupBy(date_format(date_trunc("year", col("o_orderdate")), "yyyy").as("year"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("year")
    },
    Some("""SELECT strftime(date_trunc('year', o_orderdate), '%Y') AS year,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS total
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Round-robin scatter (ClickHouse rand() sharding analogue): placement is
    * intentionally key-free, so the oracle checks multiset preservation via
    * content-independent aggregates.
    */
  val q51RebalanceRoundRobin = GraftQuery(
    "q51_rebalance_roundrobin",
    (s, dir) => {
      val dest = workDir(s, dir, "rr")
      Rebalancer.redistribute(Tables.customer(s, dir), Rebalancer.RoundRobin, 6, dest)
      s.read.parquet(dest)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"),
          round(sum("c_acctbal"), 2).as("bal_sum"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           |  round(sum(c_acctbal), 2) AS bal_sum
           |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q17RebalanceHash, q18RebalanceRange, q51RebalanceRoundRobin)
}
