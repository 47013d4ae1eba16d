package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Fourth extras batch: fuzzy string matching (edit-distance blocking join),
  * the calendar-function long tail, and correlated LATERAL top-k joins.
  */
object Extras4 {

  /** Drift-proof TPC-H revenue: Σ price·(1−disc) reconstructed from exact
    * integer cents so the top-k boundary cannot flip on float accumulation
    * order — shared by q103/q104 (one owner for the precision discipline).
    */
  private def centsRevenue: org.apache.spark.sql.Column =
    round(sum(round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))) / 10000.0, 2)

  /** Fuzzy near-match within a blocking key: candidate pairs are generated
    * only inside each p_brand partition (the classic blocking step that
    * keeps the pair count linear-ish at 100 TB — never an unblocked cross
    * join), then scored with levenshtein edit distance. Identical distance
    * definition in both engines; all outputs are exact integers.
    */
  val q90FuzzyMatch = GraftQuery(
    "q90_fuzzy_match",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_partkey") < 500)
        .select(col("p_brand"), col("p_partkey").as("k1"), col("p_name").as("n1"))
      val q = p.select(col("p_brand"), col("k1").as("k2"), col("n1").as("n2"))
      p.join(q, Seq("p_brand"))
        .filter(col("k1") < col("k2"))
        .withColumn("lev", levenshtein(col("n1"), col("n2")))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("lev") <= 12, 1L).otherwise(0L)).as("n_close"),
          min("lev").as("min_lev"))
        .orderBy("p_brand")
    },
    Some("""WITH p AS (SELECT p_brand, p_partkey k, p_name n FROM part WHERE p_partkey < 500)
           |SELECT a.p_brand, count(*) AS n_pairs,
           |  CAST(sum(CASE WHEN levenshtein(a.n, b.n) <= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
           |  min(levenshtein(a.n, b.n)) AS min_lev
           |FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.k < b.k
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Calendar-function long tail over order dates: quarter boundaries,
    * month-end, ISO day-of-week / week-of-year, day offsets and month
    * arithmetic. Dates are emitted as ISO strings so the cross-engine
    * compare is on exact text, not engine-specific date objects.
    */
  val q91DatetimeFuncs = GraftQuery(
    "q91_datetime_funcs",
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderkey") < 200)
        .withColumn("d", to_date(col("o_orderdate")))
        .select(
          col("o_orderkey"),
          date_format(col("d"), "yyyy-MM-dd").as("d_iso"),
          quarter(col("d")).as("qtr"),
          date_format(last_day(col("d")), "yyyy-MM-dd").as("month_end"),
          date_format(date_trunc("quarter", col("d")), "yyyy-MM-dd").as("qtr_start"),
          (((dayofweek(col("d")) + lit(5)) % 7) + 1).as("isodow"),
          weekofyear(col("d")).as("iso_week"),
          date_format(date_add(col("d"), 45), "yyyy-MM-dd").as("plus_45d"),
          date_format(add_months(col("d"), 3), "yyyy-MM-dd").as("plus_3m"),
          datediff(col("d"), lit("1995-01-01").cast("date")).as("days_since_95"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d_iso,
           |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
           |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           |  strftime(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE), '%Y-%m-%d') AS qtr_start,
           |  CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS isodow,
           |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
           |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY, '%Y-%m-%d') AS plus_45d,
           |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95
           |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin))

  /** Correlated LATERAL top-k join: for each high-balance customer, the two
    * most expensive orders via a LATERAL subquery with its own ORDER BY +
    * LIMIT — the per-row dependent-join form Catalyst decorrelates (vs. the
    * window-rank formulation in q6). Output is each customer's top order
    * pair aggregated to one row.
    */
  val q92LateralTopk = GraftQuery(
    "q92_lateral_topk",
    (s, dir) => {
      Tables.customer(s, dir).filter(col("c_acctbal") > 9900)
        .createOrReplaceTempView("graft_lat_cust")
      Tables.orders(s, dir).createOrReplaceTempView("graft_lat_orders")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
              |FROM graft_lat_cust c,
              |LATERAL (
              |  SELECT o_orderkey, o_totalprice FROM graft_lat_orders
              |  WHERE o_custkey = c.c_custkey
              |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
              |) t
              |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM (SELECT * FROM customer WHERE c_acctbal > 9900) c,
           |LATERAL (
           |  SELECT o_orderkey, o_totalprice FROM orders
           |  WHERE o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
           |) t
           |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin))

  /** TPC-H Q3 analogue (shipping-priority): top-10 highest-revenue orders of
    * one market segment, ordered before a cutoff but shipped after it — the
    * canonical 3-table join + aggregate + top-k workload. Revenue is rounded
    * before the ORDER BY so the top-k boundary is float-drift-proof, with
    * l_orderkey as the total tie-break.
    */
  val q103TpchQ3 = GraftQuery(
    "q103_tpch_q3",
    (s, dir) => {
      val cut = lit("1997-06-01").cast("date")
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(to_date(col("o_orderdate")) < cut)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(to_date(col("l_shipdate")) > cut)
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .agg(centsRevenue.as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
    },
    Some("""SELECT l_orderkey,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS revenue,
           |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           |  o_orderpriority
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND CAST(o_orderdate AS DATE) < DATE '1997-06-01'
           |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-01'
           |GROUP BY l_orderkey, 3, o_orderpriority
           |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q10 analogue (returned-item reporting): per-customer lost revenue
    * from returned lineitems in one quarter, joined to the nation dimension —
    * 4-table join, conditional date slice, top-20.
    */
  val q104TpchQ10 = GraftQuery(
    "q104_tpch_q10",
    (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1996-07-01").cast("date"))
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(centsRevenue.as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name"),
    Some("""SELECT c_custkey, c_name,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS revenue, n_name
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           |  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
           |  AND l_returnflag = 'R'
           |GROUP BY c_custkey, c_name, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  /** Recursive CTE (Spark 4 WITH RECURSIVE): walk the synthetic customer
    * hierarchy parent(k) = k div 10 from the single-digit roots down,
    * labeling every customer with its root and depth — the transitive-
    * closure/org-chart recursion shape. Each recursion step is one
    * distributed join against the previous frontier; depth is bounded by
    * the key width, so the iteration count is O(log10(maxkey)) regardless
    * of row count.
    */
  val q106RecursiveCte = GraftQuery(
    "q106_recursive_cte",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_rec_cust")
      s.sql("""WITH RECURSIVE chain AS (
              |  SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
              |  FROM graft_rec_cust WHERE c_custkey < 10
              |  UNION ALL
              |  SELECT c.c_custkey, ch.root, ch.depth + 1
              |  FROM graft_rec_cust c
              |  JOIN chain ch ON c.c_custkey div 10 = ch.node
              |  WHERE c.c_custkey >= 10
              |)
              |SELECT depth, count(*) AS n, min(node) AS min_node,
              |  max(node) AS max_node, CAST(sum(root) AS BIGINT) AS root_sum
              |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)
    },
    Some("""WITH RECURSIVE chain AS (
           |  SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
           |  FROM customer WHERE c_custkey < 10
           |  UNION ALL
           |  SELECT c.c_custkey, ch.root, ch.depth + 1
           |  FROM customer c
           |  JOIN chain ch ON c.c_custkey // 10 = ch.node
           |  WHERE c.c_custkey >= 10
           |)
           |SELECT CAST(depth AS INT) AS depth, count(*) AS n, min(node) AS min_node,
           |  max(node) AS max_node, CAST(sum(root) AS BIGINT) AS root_sum
           |FROM chain GROUP BY depth ORDER BY depth""".stripMargin))

  /** ANSI-safe error handling: Spark 4 runs ANSI mode by default, where bad
    * casts and division by zero THROW — try_cast / try_divide are the
    * null-on-error escape hatches a robust 100 TB pipeline uses instead of
    * failing a 6-hour job on one malformed row. The oracle mirrors them with
    * DuckDB TRY_CAST and nullif-guarded division.
    */
  val q107TryFunctions = GraftQuery(
    "q107_try_functions",
    // ratio_sum accumulates as EXACT half-cents BIGINTs (the divisor is
    // custkey % 3 ∈ {1, 2}, so 2·price-cents div d is exact), not as a
    // float sum — at 3× sf0.1 the ~2·10¹⁰-magnitude double sum drifted
    // past round(2) across accumulation orders (caught by the round-12
    // derived-scale correctness pass), and even the exact integer divided
    // by 200.0 landed on a .545 decimal boundary where Spark's
    // shortest-representation rounding and DuckDB's binary-value rounding
    // disagree — so the column is emitted AS the exact integer, no
    // division at all; try_divide keeps the null-on-zero-divisor showcase
    // for the ok-count
    (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("seg_num", expr("try_cast(o_orderpriority AS DOUBLE)"))
        .withColumn("prio_rank", expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)"))
        .withColumn("ratio", expr("try_divide(o_totalprice, o_custkey % 3)"))
        .withColumn("ratio2", expr(
          "CASE WHEN o_custkey % 3 = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE (2 * CAST(round(o_totalprice * 100) AS BIGINT))" +
            " div (o_custkey % 3) END"))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          count(col("seg_num")).as("n_seg_cast_ok"),
          count(col("prio_rank")).as("n_prio_cast_ok"),
          count(col("ratio")).as("n_ratio_ok"),
          sum("ratio2").as("ratio_sum_halfcents"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus, count(*) AS n,
           |  count(TRY_CAST(o_orderpriority AS DOUBLE)) AS n_seg_cast_ok,
           |  count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)) AS n_prio_cast_ok,
           |  count(o_totalprice / nullif(o_custkey % 3, 0)) AS n_ratio_ok,
           |  CAST(sum((2 * CAST(round(o_totalprice * 100) AS BIGINT))
           |    // nullif(o_custkey % 3, 0)) AS BIGINT) AS ratio_sum_halfcents
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q90FuzzyMatch, q91DatetimeFuncs, q92LateralTopk,
    q103TpchQ3, q104TpchQ10, q106RecursiveCte, q107TryFunctions)
}
