package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Relational operator surface (SURVEY.md §2.2): scans, projections, filters,
  * joins (shuffle/broadcast/semi/anti), aggregations (hash, distinct,
  * conditional, rollup), window functions, sorts/limits/top-k, set ops, and
  * string/date/json functions — all declared through the DataFrame API so
  * Catalyst gets full pushdown/pruning/codegen freedom.
  *
  * Determinism discipline for the DuckDB oracle: every query ends in a total
  * ORDER BY (unique tie-breakers), float aggregates are rounded on both sides,
  * timestamps are emitted as formatted strings, and window orderings are
  * uniquely keyed so ranks can't flip between engines.
  *
  * Scale notes (100 TB): filters/projections sit directly on the parquet scan
  * (PushedFilters/ReadSchema); the lineitem⋈orders join shuffles on the join
  * key with AQE skew handling; dimension joins (customer, nation, region) are
  * explicit `broadcast`; top-k is rank-then-filter (no global sort of the
  * fact table); rollup/distinct aggregates use partial (map-side) aggregation
  * automatically.
  */
object Relational {

  private def diskr(c: org.apache.spark.sql.Column) = c * (lit(1.0) - col("l_discount"))

  /** TPC-H Q1-style pricing summary: full-scan aggregate with partial aggs. */
  /** Money sums are EXACT INTEGER UNITS (cents / ten-thousandths), not
    * rounded float sums — the round-13 3× derived-scale pass caught
    * sum_disc_price at ~8.09·10⁹ straddling a .875 display boundary
    * (accumulation-order ulp + Spark shortest-representation vs DuckDB
    * binary-value rounding: the exact q107 drift class from round 12).
    * Per-row cents are exact (2-decimal prices, the q320 discipline);
    * the sums accumulate in DECIMAL(38,0)/HUGEINT so there is no wrap
    * cliff at any scale, and the display column is the integer itself —
    * never a divided float.
    */
  val q1PricingSummary = GraftQuery(
    "q1_pricing_summary",
    (s, dir) => {
      val cents = round(col("l_extendedprice") * 100, 0).cast("long")
      val disc = round(col("l_discount") * 100, 0).cast("long")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          sum(cents.cast("decimal(38,0)")).cast("long")
            .as("base_price_cents"),
          sum((cents * (lit(100L) - disc)).cast("decimal(38,0)"))
            .cast("long").as("disc_price_e4"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           |    AS base_price_cents,
           |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           |    AS disc_price_e4,
           |  round(avg(l_quantity), 4) AS avg_qty,
           |  round(avg(l_discount), 4) AS avg_disc,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Top-k: aggregate then rank — never a global sort of the fact table. */
  val q2TopRevenueOrders = GraftQuery(
    "q2_top_revenue_orders",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(round(sum(diskr(col("l_extendedprice"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10),
    Some("""SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem GROUP BY l_orderkey
           |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** Fact-fact shuffle join + size-based customer join. The customer side
    * carries NO broadcast hint: customer is SF-scaled (TPC-H SF·150k — a
    * hint would force a multi-billion-row broadcast at the 100 TB target
    * and OOM every executor), so the planner's size threshold decides —
    * broadcast while it fits, shuffle join when it doesn't. Only the
    * FIXED-cardinality dims (nation 25, region 5) ever get hints.
    */
  val q3SegmentRevenue = GraftQuery(
    "q3_segment_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(diskr(col("l_extendedprice"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Left-semi join (EXISTS). */
  val q4SemiJoin = GraftQuery(
    "q4_semi_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0)
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
           |ORDER BY c_custkey""".stripMargin))

  /** Left-anti join (NOT EXISTS). */
  val q5AntiJoin = GraftQuery(
    "q5_anti_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val pend = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
      cust.join(pend, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
           |ORDER BY c_custkey""".stripMargin))

  /** Windowed top-N per group: rank inside partition, filter — distributes by
    * the partition key instead of sorting globally.
    */
  val q6WindowTopPerSupplier = GraftQuery(
    "q6_window_top_per_supplier",
    (s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_suppkey", "rn")
    },
    Some("""SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
           |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           |    row_number() OVER (PARTITION BY l_suppkey
           |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           |  FROM lineitem) t
           |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin))

  /** Running totals + lag: frame-ordered accumulation is engine-order
    * deterministic on both sides.
    */
  val q7RunningTotals = GraftQuery(
    "q7_running_totals",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .withColumn("running_spend",
          round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .select("o_custkey", "o_orderkey", "running_spend", "prev_price")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey) AS prev_price
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Set operations: INTERSECT and EXCEPT (distinct semantics). */
  val q8SetOps = GraftQuery(
    "q8_set_ops",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val f = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      val o = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      f.intersect(o).withColumn("tag", lit("both"))
        .unionAll(f.except(o).withColumn("tag", lit("f_only")))
        .select("tag", "custkey")
        .orderBy("tag", "custkey")
    },
    Some("""SELECT tag, custkey FROM (
           |  SELECT 'both' AS tag, custkey FROM (
           |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
           |    INTERSECT
           |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O') a
           |  UNION ALL
           |  SELECT 'f_only' AS tag, custkey FROM (
           |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
           |    EXCEPT
           |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O') b) t
           |ORDER BY tag, custkey""".stripMargin))

  /** ROLLUP hierarchy totals; NULL grouping markers normalized to 'ALL' so
    * both engines order identically.
    */
  val q9Rollup = GraftQuery(
    "q9_rollup",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
           |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY rf, ls""".stripMargin))

  /** String-function projection + aggregation. */
  val q10StringFuncs = GraftQuery(
    "q10_string_funcs",
    (s, dir) =>
      Tables.part(s, dir)
        .groupBy(
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_type"), 1, 5).as("type_pfx"))
        .agg(
          count(lit(1)).as("n"),
          round(avg("p_retailprice"), 2).as("avg_price"),
          min(length(col("p_name"))).as("min_name_len"),
          max(length(replace(col("p_name"), lit(" "), lit("")))).as("max_squashed_len"))
        .orderBy("brand_u", "type_pfx"),
    Some("""SELECT upper(p_brand) AS brand_u, substring(p_type, 1, 5) AS type_pfx,
           |  count(*) AS n, round(avg(p_retailprice), 2) AS avg_price,
           |  min(length(p_name)) AS min_name_len,
           |  max(length(replace(p_name, ' ', ''))) AS max_squashed_len
           |FROM part GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Date functions: month truncation emitted as a string for cross-engine
    * hash parity.
    */
  val q11MonthlyOrders = GraftQuery(
    "q11_monthly_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy("month"),
    Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total,
           |  count(DISTINCT o_custkey) AS n_custs
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  val q12DistinctCounts = GraftQuery(
    "q12_distinct_counts",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Conditional aggregation (CASE WHEN pivots). */
  val q13ConditionalAgg = GraftQuery(
    "q13_conditional_agg",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("f_total"))
        .orderBy("o_orderpriority"),
    // DuckDB integer sum() yields HUGEINT; CAST to BIGINT so the driver's
    // type-sensitive hash matches Spark's LongType output.
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f_total
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** JSON extraction from a string column (events.props = {"k": <int>}). */
  val q14JsonProps = GraftQuery(
    "q14_json_props",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
           |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Tumbling-window (hourly) event aggregation — the batch-equivalent of the
    * streaming query in graft.streaming.
    */
  val q15HourlyEvents = GraftQuery(
    "q15_hourly_events",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("hour", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
           |  count(*) AS n, round(sum(value), 2) AS total_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Batch sessionization: 30-minute inactivity gap → session ids via
    * lag + cumulative sum (the batch-equivalent of a session_window stream).
    */
  val q16Sessions = GraftQuery(
    "q16_sessions",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(cum))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH marked AS (
           |  SELECT user_id, value,
           |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
           |           OR epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
           |         THEN 1 ELSE 0 END AS new_sess,
           |    ts, event_id
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |sess AS (
           |  SELECT user_id, value,
           |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           |  FROM marked)
           |SELECT user_id, session_id, count(*) AS n_events,
           |  round(sum(value), 2) AS session_value
           |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Period-over-period mix-shift decomposition of regional revenue — the
    * BI staple behind every "why did the number move" review: each
    * region's revenue share in 1995 vs 1996 and the share delta, so the
    * total change splits into per-region mix movement. Plan shape is the
    * TPC-H star: lineitem⋈orders filtered to the two years at the scan
    * (pushdown), a size-based customer join (SF-scaled — no hint), then
    * broadcast fixed dims nation→region, one partial
    * agg to (region, year), and a window total over the 10-row result —
    * the heavy tables shuffle once. Sums round at 2 (float accumulation);
    * shares are divisions of those sums (6).
    */
  val q214MixShift = GraftQuery(
    "q214_mix_shift",
    (s, dir) => {
      val yr = year(col("o_orderdate"))
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(yr.isin(1995, 1996))
        .join(Tables.customer(s, dir), // SF-scaled: size-based, no hint
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(
          sum(when(yr === 1995,
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(0.0)).as("r95"),
          sum(when(yr === 1996,
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(0.0)).as("r96"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      rev
        .withColumn("t95", sum("r95").over(w))
        .withColumn("t96", sum("r96").over(w))
        .select(col("region"),
          round(col("r95"), 2).as("rev_1995"),
          round(col("r96"), 2).as("rev_1996"),
          round(col("r95") / col("t95"), 6).as("share_1995"),
          round(col("r96") / col("t96"), 6).as("share_1996"),
          round(col("r96") / col("t96") - col("r95") / col("t95"), 6)
            .as("share_delta"))
        .orderBy("region")
    },
    Some("""WITH rev AS (
           |  SELECT r_name AS region,
           |    sum(CASE WHEN year(o_orderdate) = 1995
           |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) AS r95,
           |    sum(CASE WHEN year(o_orderdate) = 1996
           |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) AS r96
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  WHERE year(o_orderdate) IN (1995, 1996)
           |  GROUP BY 1),
           |t AS (SELECT *, sum(r95) OVER () t95, sum(r96) OVER () t96 FROM rev)
           |SELECT region, round(r95, 2) AS rev_1995, round(r96, 2) AS rev_1996,
           |  round(r95 / t95, 6) AS share_1995, round(r96 / t96, 6) AS share_1996,
           |  round(r96 / t96 - r95 / t95, 6) AS share_delta
           |FROM t ORDER BY region""".stripMargin))

  /** TPC-H Q5 analogue (local supplier volume): revenue per nation for
    * 1995 orders where the customer and the line's supplier sit in the
    * SAME nation — the classic snowflake with a co-location predicate.
    * The two fact tables shuffle once on orderkey; customer and supplier
    * are SF-scaled so their joins stay size-based (no hints — a forced
    * broadcast of either would OOM at the 100 TB target); the fixed
    * 25-row nation broadcasts; the co-location filter lands after the
    * supplier join as a column equality. Sums round at 2.
    */
  val q227LocalSupplierVolume = GraftQuery(
    "q227_local_supplier_volume",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1995)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), // SF-scaled: size-based, no hint
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), // SF-scaled: size-based, no hint
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(desc("revenue"), col("nation"))
    },
    Some("""SELECT n_name AS nation,
           |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           |  CAST(count(*) AS BIGINT) AS n_lines
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE year(o_orderdate) = 1995
           |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin))

  /** TPC-H Q8 analogue (market share): a target region's share of revenue
    * supplied by one nation's suppliers, per order year — the conditional
    * share-of-aggregate shape (sum(CASE)·/·sum) with a two-hop dimension
    * path on BOTH fact sides. Fact tables shuffle once; the fixed dims
    * (nation, region) broadcast while SF-scaled customer/supplier joins
    * stay size-based (no hints); the share is a division of two
    * same-group sums (round 6).
    */
  val q228MarketShare = GraftQuery(
    "q228_market_share",
    (s, dir) => {
      val nat = Tables.nation(s, dir)
      val li = Tables.lineitem(s, dir)
      val vol = li
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), // SF-scaled: size-based, no hint
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat.select(col("n_nationkey").as("cnk"),
          col("n_regionkey").as("crk"))), col("c_nationkey") === col("cnk"))
        .join(broadcast(Tables.region(s, dir)), col("crk") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(Tables.supplier(s, dir), // SF-scaled: size-based, no hint
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .select(year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
          col("supp_nation"))
      vol.groupBy("o_year")
        .agg(
          round(sum(when(col("supp_nation") === "NATION_5", col("volume"))
            .otherwise(0.0)), 2).as("nation_volume"),
          round(sum("volume"), 2).as("total_volume"),
          round(sum(when(col("supp_nation") === "NATION_5", col("volume"))
            .otherwise(0.0)) / sum("volume"), 6).as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""WITH vol AS (
           |  SELECT year(o_orderdate) AS o_year,
           |    l_extendedprice * (1.0 - l_discount) AS volume,
           |    sn.n_name AS supp_nation
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN region ON cn.n_regionkey = r_regionkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  WHERE r_name = 'ASIA')
           |SELECT o_year,
           |  round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END), 2)
           |    AS nation_volume,
           |  round(sum(volume), 2) AS total_volume,
           |  round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END)
           |    / sum(volume), 6) AS mkt_share
           |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Pure-SQL surface with a calendar-interval RANGE frame — two things
    * q56's numeric RANGE frame doesn't cover: the query is authored
    * entirely in `spark.sql` over a registered temp view (the SQL-first
    * entry path a reference user migrating from a SQL engine reaches
    * for), and the rolling 7-day revenue window frames by INTERVAL '6'
    * DAY over real DATEs — so calendar gaps are handled by the frame
    * semantics, not by a synthetic day index. Daily revenue accumulates
    * as integer CENTS (the q103 drift-proof discipline) so the rolling
    * mean is exact-integer sums divided ONCE — a float daily sum fed to
    * avg() diverged from DuckDB by one ulp at a .005 rounding boundary
    * on the sf0.001 fixture; the daily base is one partial agg and the
    * window runs over day-cardinality rows.
    */
  val q257SqlRollingWindow = GraftQuery(
    "q257_sql_rolling_window",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_q257")
      s.sql("""
        |WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c,
        |    count(*) AS n
        |  FROM orders_q257
        |  WHERE year(o_orderdate) = 1995
        |  GROUP BY 1)
        |SELECT date_format(day, 'yyyy-MM-dd') AS day, n,
        |  round(rev_c / CAST(100 AS DOUBLE), 2) AS rev,
        |  round(sum(rev_c) OVER (ORDER BY day
        |      RANGE BETWEEN INTERVAL '6' DAY PRECEDING AND CURRENT ROW)
        |    / count(*) OVER (ORDER BY day
        |      RANGE BETWEEN INTERVAL '6' DAY PRECEDING AND CURRENT ROW)
        |    / CAST(100 AS DOUBLE), 2) AS rolling_7d_avg
        |FROM daily ORDER BY day
        |""".stripMargin)
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM orders WHERE year(o_orderdate) = 1995
           |  GROUP BY 1)
           |SELECT strftime(day, '%Y-%m-%d') AS day, n,
           |  round(rev_c / 100.0, 2) AS rev,
           |  round(sum(rev_c) OVER (ORDER BY day
           |      RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
           |    / count(*) OVER (ORDER BY day
           |      RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
           |    / 100.0, 2) AS rolling_7d_avg
           |FROM daily ORDER BY day""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    q1PricingSummary, q2TopRevenueOrders, q3SegmentRevenue, q4SemiJoin,
    q5AntiJoin, q6WindowTopPerSupplier, q7RunningTotals, q8SetOps, q9Rollup,
    q10StringFuncs, q11MonthlyOrders, q12DistinctCounts, q13ConditionalAgg,
    q14JsonProps, q15HourlyEvents, q16Sessions, q214MixShift,
    q227LocalSupplierVolume, q228MarketShare, q257SqlRollingWindow)
}
