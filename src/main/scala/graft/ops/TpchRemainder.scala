package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q343–q351 — the REMAINING nine classic TPC-H query shapes, closing the
  * full 22-query matrix (Q1/3/5/8/10/13/15/16/17/18/20/21/22 landed in
  * earlier rounds). The fixture schema lacks partsupp, l_commitdate /
  * l_receiptdate, l_shipmode and p_container, so these are ANALOGUES in
  * the established q311/q296 sense: each preserves the query's canonical
  * PLAN SHAPE (the thing Catalyst must get right — scan-only aggregation,
  * disjunctive pushdown, EXISTS decorrelation, correlated-min join-back,
  * global-scalar HAVING) on the columns the fixture has, with the
  * substitution documented per query.
  *
  * Batch precision discipline (the Extras8 contract): revenue rides as
  * exact 10⁻⁴-dollar BIGINTs (price cents × (100 − discount hundredths)),
  * every filter boundary compares integers (discounts are exact
  * hundredths, quantities integral — FixtureInvariantSpec), and doubles
  * appear only in display columns as ONE division of two exact integers
  * rounded identically on both engines.
  */
object TpchRemainder {

  /** Price in exact cents. */
  private def pc: Column = round(col("l_extendedprice") * 100).cast("long")
  /** Discount in exact hundredths. */
  private def dh: Column = round(col("l_discount") * 100).cast("long")
  private def qty: Column = col("l_quantity").cast("long")
  /** Per-row discounted revenue in 10⁻⁴ dollars — exact BIGINT. */
  private def rev4: Column = pc * (lit(100L) - dh)

  /** TPC-H Q6 (forecasting revenue change) — LITERAL, every column exists:
    * the pure scan→filter→aggregate workload, no join anywhere. The plan
    * to want at 100 TB is a parquet scan with ALL THREE predicates pushed
    * (date range, discount band, quantity cap) feeding one partial agg;
    * the discount band compares exact hundredths (2 ≤ 100·disc ≤ 6), so
    * no row can flip on float representation of 0.02.
    */
  val q343TpchQ6 = GraftQuery(
    "q343_tpch_q6",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
          dh.between(2L, 6L) && qty < 24L)
        .agg(count(lit(1)).as("n_items"),
          round(sum(pc * dh) / 10000.0, 2).as("revenue_effect"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_items,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |    * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0, 2)
           |    AS revenue_effect
           |FROM lineitem
           |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 2 AND 6
           |  AND CAST(l_quantity AS BIGINT) < 24""".stripMargin))

  /** TPC-H Q7 (volume shipping) — LITERAL shape on fixture nation names:
    * bidirectional trade volume between two nations by ship year. The
    * 6-table join tree is the point: lineitem shuffles ONCE per fact edge
    * (orders, supplier), while both nation legs and region-free dims are
    * size-based broadcasts; the nation-pair disjunction is evaluated
    * post-join on two broadcast legs, never as a cartesian.
    */
  val q344TpchQ7 = GraftQuery(
    "q344_tpch_q7",
    (s, dir) => {
      val (na, nb) = ("NATION_1", "NATION_2")
      val sn = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cn = Tables.customer(s, dir)
        .join(Tables.nation(s, dir),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(cn, col("o_custkey") === col("c_custkey"))
        .join(sn, col("l_suppkey") === col("s_suppkey"))
        .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
          (col("supp_nation") === nb && col("cust_nation") === na))
        .filter(year(to_date(col("l_shipdate"))).between(1996, 1997))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(to_date(col("l_shipdate"))).cast("long").as("l_year"))
        .agg(round(sum(rev4) / 10000.0, 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |  CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2)
           |    AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
           |  AND year(CAST(l_shipdate AS DATE)) BETWEEN 1996 AND 1997
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** TPC-H Q9 analogue (product-type profit): profit by (supplier nation,
    * order year) over parts whose name contains 'red'. The fixture has no
    * partsupp, so supply cost substitutes p_retailprice · quantity (the
    * same join tree and sign structure; documented substitution). Profit
    * stays an exact 10⁻⁴-dollar BIGINT: discounted revenue MINUS
    * 100 · retail-cents · qty, summed before the single display division.
    */
  val q345TpchQ9 = GraftQuery(
    "q345_tpch_q9",
    (s, dir) => {
      val parts = Tables.part(s, dir).filter(col("p_name").contains("red"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("rc"))
      val sn = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(s, dir)
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(sn, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"),
          year(to_date(col("o_orderdate"))).cast("long").as("o_year"))
        .agg(round(sum(rev4 - lit(100L) * col("rc") * qty) / 10000.0, 2)
          .as("profit"))
        .orderBy(col("nation"), desc("o_year"))
    },
    Some("""SELECT n_name AS nation,
           |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
           |    - 100 * CAST(round(p_retailprice * 100) AS BIGINT)
           |      * CAST(l_quantity AS BIGINT)) / 10000.0, 2) AS profit
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE p_name LIKE '%red%'
           |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin))

  /** TPC-H Q11 analogue (important stock value): parts whose total
    * discounted revenue exceeds 1.5× the MEAN per-part value — the
    * group-agg-vs-global-scalar HAVING shape (no partsupp, so line revenue
    * substitutes stock value; Q11's literal FRACTION shrinks with SF by
    * spec, so the scale-invariant mean multiple keeps the query
    * non-vacuous at every fixture scale). The scalar subquery decorrelates
    * to a 1-row broadcast cross join carrying the PRE-DIVIDED integer
    * threshold (3·total div 2·nparts — one floor, so the boundary is
    * deterministic and no per-row product can overflow at any corpus
    * size). Ranking is orderBy+limit on the exact value.
    */
  val q346TpchQ11 = GraftQuery(
    "q346_tpch_q11",
    (s, dir) => {
      val pv = Tables.lineitem(s, dir)
        .groupBy("l_partkey").agg(sum(rev4).as("value4"))
      val tot = pv.agg(
        expr("(3 * sum(value4)) div (2 * count(*))").as("thr"))
      pv.crossJoin(broadcast(tot))
        .filter(col("value4") > col("thr"))
        .select(col("l_partkey"),
          round(col("value4") / 10000.0, 2).as("value"))
        .orderBy(desc("value"), col("l_partkey"))
        .limit(100)
    },
    Some("""WITH pv AS (
           |  SELECT l_partkey,
           |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           |      AS BIGINT) AS value4
           |  FROM lineitem GROUP BY 1),
           |tot AS (SELECT (3 * CAST(sum(value4) AS BIGINT))
           |    // (2 * CAST(count(*) AS BIGINT)) AS thr FROM pv)
           |SELECT l_partkey, round(value4 / 10000.0, 2) AS value
           |FROM pv, tot WHERE value4 > thr
           |ORDER BY value DESC, l_partkey LIMIT 100""".stripMargin))

  /** TPC-H Q4 analogue (order priority checking): orders placed in one
    * quarter with at least one LATE line (shipped after the order date —
    * the fixture has no commit/receipt dates), counted per priority. The
    * point is the EXISTS decorrelation: the correlated existence probe
    * becomes a LEFT SEMI hash join on orderkey with the non-equi
    * late-shipment residual, never a per-row subquery, and the count runs
    * on the deduplicated semi-join output.
    */
  val q347TpchQ4 = GraftQuery(
    "q347_tpch_q4",
    (s, dir) => {
      Tables.orders(s, dir)
        .filter(to_date(col("o_orderdate")) >= lit("1996-07-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1996-10-01").cast("date"))
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey") &&
            to_date(col("l_shipdate")) > to_date(col("o_orderdate")),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
           |FROM orders
           |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
           |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
           |  AND EXISTS (
           |    SELECT 1 FROM lineitem
           |    WHERE l_orderkey = o_orderkey
           |      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** TPC-H Q12 analogue (shipping-mode priority audit): among lines
    * shipped more than 30 days after their order date in 1996–1997,
    * critical- vs non-critical-priority order counts per return flag (the
    * fixture has no l_shipmode; l_returnflag is the grouping dimension,
    * the 30-day lag stands in for commit-vs-receipt). Conditional
    * aggregation over one fact join — both counts from a single pass.
    */
  val q348TpchQ12 = GraftQuery(
    "q348_tpch_q12",
    (s, dir) => {
      val hi = Seq("1-URGENT", "2-HIGH")
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(to_date(col("l_shipdate")) >
          date_add(to_date(col("o_orderdate")), 30) &&
          year(to_date(col("l_shipdate"))).between(1996, 1997))
        .groupBy("l_returnflag")
        .agg(sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin(hi: _*), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
           |  AND year(CAST(l_shipdate AS DATE)) BETWEEN 1996 AND 1997
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** TPC-H Q14 (promotion effect) — LITERAL shape: the share of one
    * month's revenue from PROMO-type parts. Both the promo and total
    * revenue accumulate as exact 10⁻⁴-dollar BIGINTs in ONE pass
    * (conditional aggregation), and the percentage is the single display
    * division — (100.0 · promo) / total computed with the same operation
    * order on both engines, so the doubles are bit-identical.
    */
  val q349TpchQ14 = GraftQuery(
    "q349_tpch_q14",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) >= lit("1996-09-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1996-10-01").cast("date"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("p_type") === "PROMO", 1L).otherwise(0L))
            .as("n_promo_items"),
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev4).otherwise(0L))
              .cast("double") /
            sum(rev4).cast("double"), 6).as("promo_revenue_pct"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_items,
           |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_promo_items,
           |  round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
           |      THEN CAST(round(l_extendedprice * 100) AS BIGINT)
           |        * (100 - CAST(round(l_discount * 100) AS BIGINT))
           |      ELSE 0 END) AS DOUBLE)
           |    / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           |      AS DOUBLE), 6) AS promo_revenue_pct
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
           |  AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'""".stripMargin))

  /** TPC-H Q19 analogue (discounted revenue under disjunctive brackets):
    * revenue from three OR'd (brand, size-bracket, quantity-bracket)
    * conjunctions (no p_container in the fixture; p_size brackets stand
    * in). The shape under test is DISJUNCTIVE predicate handling across a
    * join: the brand/size legs must prune the part build side and the
    * quantity legs the lineitem scan, while the cross-leg disjunction
    * evaluates post-join without degenerating the equi-join itself.
    */
  val q350TpchQ19 = GraftQuery(
    "q350_tpch_q19",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            qty.between(1L, 11L)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            qty.between(10L, 20L)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            qty.between(20L, 30L)))
        .agg(count(lit(1)).as("n_items"),
          round(sum(rev4) / 10000.0, 2).as("revenue"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_items,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2)
           |    AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           |    AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
           |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           |    AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
           |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           |    AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin))

  /** TPC-H Q2 analogue (minimum-cost supplier): for size-15 parts, the
    * EUROPE supplier(s) matching the per-part MINIMUM unit price — the
    * correlated-min-subquery shape (no partsupp: a supplier's offer is
    * its cheapest observed line unit price, price-cents div quantity —
    * the floor is deterministic on both engines since the fixture keeps
    * both non-negative). Spark-first decorrelation: per-(part, supplier)
    * offers aggregate ONCE, the per-part min joins back on partkey, and
    * the region/size dimensions prune BEFORE the aggregation, so nothing
    * bigger than the pruned offer list ever shuffles. Top-100 by account
    * balance via TakeOrderedAndProject with a full tie-break chain.
    */
  val q351TpchQ2 = GraftQuery(
    "q351_tpch_q2",
    (s, dir) => {
      val euSupp = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val parts15 = Tables.part(s, dir).filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_brand"))
      val offers = Tables.lineitem(s, dir)
        .join(parts15, col("l_partkey") === col("p_partkey"))
        .join(euSupp.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " div CAST(l_quantity AS BIGINT)")).as("offer"))
      val best = offers.groupBy(col("l_partkey").as("b_partkey"))
        .agg(min("offer").as("best"))
      offers
        .join(best, col("l_partkey") === col("b_partkey") &&
          col("offer") === col("best"))
        .join(euSupp, col("l_suppkey") === col("s_suppkey"))
        .join(parts15, col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"), col("p_brand"),
          col("offer").as("unit_cents"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some("""WITH eu AS (
           |  SELECT s_suppkey, s_name, s_acctbal, n_name
           |  FROM supplier
           |  JOIN nation ON s_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  WHERE r_name = 'EUROPE'),
           |p15 AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 15),
           |offers AS (
           |  SELECT l_partkey, l_suppkey,
           |    CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      // CAST(l_quantity AS BIGINT)) AS BIGINT) AS offer
           |  FROM lineitem
           |  JOIN p15 ON l_partkey = p_partkey
           |  WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
           |  GROUP BY 1, 2),
           |best AS (SELECT l_partkey AS b_partkey,
           |    CAST(min(offer) AS BIGINT) AS best
           |  FROM offers GROUP BY 1)
           |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
           |  p_brand, offer AS unit_cents
           |FROM offers
           |JOIN best ON l_partkey = b_partkey AND offer = best
           |JOIN eu ON l_suppkey = s_suppkey
           |JOIN p15 ON l_partkey = p_partkey
           |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
           |LIMIT 100""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q343TpchQ6, q344TpchQ7, q345TpchQ9,
    q346TpchQ11, q347TpchQ4, q348TpchQ12, q349TpchQ14, q350TpchQ19,
    q351TpchQ2)
}
