package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Keyed batch upsert (MERGE semantics over immutable parquet): updates win
  * over existing rows on the key, inserts pass through — the CDC-apply /
  * compaction primitive behind every mutable-table illusion on an
  * append-only lake. Implemented as anti-join + union (the same shape
  * [[graft.streaming.MaterializedView]] uses per micro-batch): one shuffle
  * on the key, and — unlike a per-key rank over the union — LOSSLESS for
  * legitimately duplicate-keyed existing rows (a rank keeps rn = 1 only,
  * silently deleting siblings of keys no update touched) and deterministic
  * when a batch carries several updates for one key (all are kept; rank
  * picked a partition-order-dependent winner). Pairs with
  * [[graft.rebalance.Rebalancer]]'s staging+swap to publish atomically.
  */
object Upsert {

  /** Rows of `updates` replace same-key rows of `existing`; others insert. */
  def merge(existing: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      existing.join(updates.select(key), Seq(key), "left_anti")
        .select(existing.columns.map(col).toIndexedSeq: _*))

  /** Upsert a revised order batch into orders, then audit the merge: row
    * counts by origin plus value sums proving updated keys carry the new
    * prices and untouched keys the old ones.
    */
  val q108Upsert = GraftQuery(
    "q108_upsert",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      // revision batch: every 7th order re-priced +10%, plus brand-new
      // synthetic keys above the current max — both derived deterministically
      val updates = orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice",
          // +10% in exact integer cents ((c*11+5) div 10): round(x*1.1, 2)
          // is NOT cross-engine stable on half-cent doubles
          expr("((cast(round(o_totalprice * 100) as bigint) * 11 + 5) div 10) / 100.0"))
        .withColumn("o_orderstatus", lit("U"))
        .unionByName(
          orders.filter(col("o_orderkey") % 1000 === 1)
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
            .withColumn("o_orderstatus", lit("N")))
      Upsert.merge(orders, updates, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2).as("price_sum"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH orders0 AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
           |updates AS (
           |  SELECT o_orderkey, o_custkey, ((CAST(round(o_totalprice * 100) AS BIGINT) * 11 + 5) // 10) / 100.0 AS o_totalprice,
           |    'U' AS o_orderstatus
           |  FROM orders0 WHERE o_orderkey % 7 = 0
           |  UNION ALL
           |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'N'
           |  FROM orders0 WHERE o_orderkey % 1000 = 1),
           |merged AS (
           |  SELECT * FROM updates
           |  UNION ALL
           |  SELECT * FROM orders0
           |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates))
           |SELECT o_orderstatus, count(*) AS n,
           |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS price_sum,
           |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
           |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Incremental view maintenance for a distributive/algebraic aggregate
    * view — the delta-rule discipline behind every materialized-view
    * refresh that does NOT rescan history: the base partition of orders
    * (keys with o_orderkey % 97 ≠ 0) aggregates once into per-priority
    * partial states (count, sum, min, max), the "newly arrived" delta
    * partition aggregates separately, and the maintained view is the
    * STATE MERGE (counts and sums add, min/max fold, avg derives from the
    * merged sum/count — never averaged averages). The oracle computes the
    * view directly over ALL orders, so the hash gate proves
    * V(base ⊎ Δ) = merge(V(base), V(Δ)) exactly — the algebraic property
    * incremental pipelines rely on. Both aggregations are partial-agg
    * scans; the merge touches 2×|keys| rows.
    */
  val q213IvmMerge = GraftQuery(
    "q213_ivm_merge",
    (s, dir) => {
      def state(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("sm"),
          min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      val o = Tables.orders(s, dir)
      val base = state(o.filter(col("o_orderkey") % 97 =!= 0))
      val delta = state(o.filter(col("o_orderkey") % 97 === 0))
      base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(sum("cnt").as("n_orders"), round(sum("sm"), 2).as("total"),
          round(sum("sm") / sum("cnt"), 2).as("avg_price"),
          round(min("mn"), 2).as("min_price"), round(max("mx"), 2).as("max_price"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           |  round(sum(o_totalprice), 2) AS total,
           |  round(sum(o_totalprice) / count(*), 2) AS avg_price,
           |  round(min(o_totalprice), 2) AS min_price,
           |  round(max(o_totalprice), 2) AS max_price
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q108Upsert, q213IvmMerge)
}
