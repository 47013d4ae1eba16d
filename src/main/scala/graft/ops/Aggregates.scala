package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Remaining aggregation surface from SURVEY.md §2.2: CUBE, GROUPING SETS
  * semantics, approximate distinct (HLL), and the full broadcast-dimension
  * snowflake join (supplier → nation → region).
  */
object Aggregates {

  /** CUBE over two order dimensions (all 4 grouping combinations). */
  val q35Cube = GraftQuery(
    "q35_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("total"))
        .orderBy("st", "pri"),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
           |  coalesce(o_orderpriority, 'ALL') AS pri,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS total
           |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
           |ORDER BY st, pri""".stripMargin))

  /** Explicit GROUPING SETS: per-status and per-priority marginals only. */
  val q36GroupingSets = GraftQuery(
    "q36_grouping_sets",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.createOrReplaceTempView("graft_orders_gs")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
              |  coalesce(o_orderpriority, 'ALL') AS pri,
              |  count(*) AS n
              |FROM graft_orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
              |ORDER BY st, pri""".stripMargin)
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
           |  coalesce(o_orderpriority, 'ALL') AS pri,
           |  count(*) AS n
           |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
           |ORDER BY st, pri""".stripMargin))

  /** HLL approximate distinct next to the exact count. HLL estimates differ
    * across engines, so the oracle-checkable form emits the exact count plus
    * an error-bound boolean (|approx−exact|/exact ≤ 5% at rsd 0.02); the
    * oracle asserts the bound by emitting literal TRUE — a sketch regression
    * flips the boolean and fails the hash. The tighter rsd-level bound is
    * asserted in AggregatesSpec.
    */
  val q37ApproxDistinct = GraftQuery(
    "q37_approx_distinct",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(
          col("l_returnflag"),
          col("exact_orders"),
          (abs(col("approx") - col("exact_orders")).cast("double") /
            col("exact_orders") <= 0.05).as("approx_ok"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  count(DISTINCT l_orderkey) AS exact_orders,
           |  TRUE AS approx_ok
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Snowflake dimension chain: supplier ⋈ nation ⋈ region. The fixed
    * dims (nation 25, region 5) broadcast by hint; supplier is SF-scaled
    * so its join stays size-based (no hint — a forced broadcast would be
    * ~1B rows at the 100 TB target).
    */
  val q38RegionRevenue = GraftQuery(
    "q38_region_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(sup, col("l_suppkey") === col("s_suppkey")) // SF-scaled: no hint
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, count(*) AS n_items,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Prefix-sum range acceleration — the pre-aggregation structure that
    * answers ANY day-range count in two lookups instead of a scan: build
    * the per-type cumulative daily table once (one window over days —
    * day-cardinality-sized), then each [lo, hi] range resolves as
    * cum(hi) − cum(lo−1) via max_by as-of lookups. The query answers
    * three ranges THROUGH the prefix table while the oracle counts them
    * DIRECTLY with WHERE BETWEEN — hash equality proves the acceleration
    * structure returns exactly what the scan would, which is the entire
    * contract of a pre-agg. Ranges anchor to the fixture's min day so
    * any regeneration shifts with the data.
    */
  val q244RangePrefix = GraftQuery(
    "q244_range_prefix",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val prefix = daily.withColumn("cum", sum("n").over(w)).persist()
      val d0 = prefix.agg(min("day")).head().getDate(0).toLocalDate
      def cumAt(offset: Int) = prefix
        .filter(col("day") <= lit(d0.plusDays(offset.toLong).toString).cast("date"))
        .groupBy("event_type")
        .agg(expr("max_by(cum, day)").as("cumv"))
      val ranges = Seq((1, 3, 10), (2, 12, 20), (3, 0, 29))
      val out = ranges.map { case (id, lo, hi) =>
        val hiC = cumAt(hi).select(col("event_type"), col("cumv").as("chi"))
        val loC = cumAt(lo - 1).select(col("event_type"), col("cumv").as("clo"))
        hiC.join(loC, Seq("event_type"), "left")
          .select(lit(id).as("range_id"), col("event_type"),
            (col("chi") - coalesce(col("clo"), lit(0L))).as("n"))
          // a type active only BEFORE the range has equal cum at both
          // endpoints → n = 0 here, but no group at all in the oracle's
          // direct WHERE BETWEEN scan — emit exactly the scan's groups
          .filter(col("n") > 0)
      }.reduce(_ unionByName _).orderBy("range_id", "event_type")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      prefix.unpersist()
      ckpt
    },
    Some("""WITH d0 AS (SELECT CAST(min(ts) AS DATE) AS d FROM events),
           |r(range_id, lo, hi) AS (VALUES (1, 3, 10), (2, 12, 20), (3, 0, 29))
           |SELECT r.range_id, e.event_type, CAST(count(*) AS BIGINT) AS n
           |FROM events e, d0, r
           |WHERE CAST(e.ts AS DATE) BETWEEN d0.d + r.lo AND d0.d + r.hi
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q35Cube, q36GroupingSets, q37ApproxDistinct,
    q38RegionRevenue, q244RangePrefix)
}
