package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Final surface fill-ins: ORC source/sink, RANGE window frames, and
  * order-normalized collect aggregation.
  */
object Extras2 {

  /** ORC sink → source round-trip (columnar format #2); oracle reads the
    * original parquet, proving the ORC path preserves data.
    */
  val q55OrcRoundtrip = GraftQuery(
    "q55_orc_roundtrip",
    (s, dir) => {
      val out = graft.WorkDir.resolve(s, "orc", dir)
      Tables.supplier(s, dir)
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("bal"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
           |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin))

  /** RANGE window frame: trailing 30-day spend per customer — a
    * value-range frame (not row-count), keyed on epoch microseconds.
    */
  val q56RangeFrame = GraftQuery(
    "q56_range_frame",
    (s, dir) => {
      val month = 30L * 24 * 3600 * 1000000 // 30 days in microseconds
      val w = Window.partitionBy("o_custkey").orderBy("us")
        .rangeBetween(-month, Window.currentRow)
      Tables.orders(s, dir)
        // o_orderdate arrives as TIMESTAMP_NTZ; UTC session makes the cast
        // value-preserving, matching DuckDB's epoch_us
        .withColumn("us", unix_micros(col("o_orderdate").cast("timestamp")))
        .withColumn("trailing_30d", round(sum("o_totalprice").over(w), 2))
        .withColumn("trailing_n", count(lit(1)).over(w))
        .select("o_custkey", "o_orderkey", "trailing_30d", "trailing_n")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  round(sum(o_totalprice) OVER w, 2) AS trailing_30d,
           |  count(*) OVER w AS trailing_n
           |FROM (SELECT *, epoch_us(o_orderdate) us FROM orders) t
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY us
           |  RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Collect aggregation normalized to deterministic order: the distinct
    * event types each user produced, as a sorted joined string (collect_set
    * order is engine/run-dependent; sort_array fixes it).
    */
  val q57CollectTypes = GraftQuery(
    "q57_collect_types",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
    Some("""SELECT user_id,
           |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
           |  count(*) AS n
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Unpivot (wide → long): per-priority price metrics melted into
    * (metric, val) rows via `Dataset.unpivot` — the inverse of q42's pivot.
    */
  val q67Unpivot = GraftQuery(
    "q67_unpivot",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          round(avg("o_totalprice"), 2).as("avg_price"),
          round(max("o_totalprice"), 2).as("max_price"),
          round(min("o_totalprice"), 2).as("min_price"))
        .unpivot(
          Array(col("o_orderpriority")),
          Array(col("avg_price"), col("max_price"), col("min_price")),
          "metric", "val")
        .orderBy("o_orderpriority", "metric"),
    Some("""WITH agg AS (
           |  SELECT o_orderpriority,
           |    round(avg(o_totalprice), 2) AS avg_price,
           |    round(max(o_totalprice), 2) AS max_price,
           |    round(min(o_totalprice), 2) AS min_price
           |  FROM orders GROUP BY 1)
           |SELECT o_orderpriority, metric, val
           |FROM agg UNPIVOT (val FOR metric IN (avg_price, max_price, min_price))
           |ORDER BY o_orderpriority, metric""".stripMargin))

  /** Correlated scalar subqueries — exercises Catalyst's decorrelation
    * (RewriteCorrelatedScalarSubquery turns each into a left outer
    * aggregate join, so at scale this is two shuffled joins, not N probes).
    */
  val q68CorrelatedScalar = GraftQuery(
    "q68_correlated_scalar",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_q68")
      Tables.customer(s, dir).createOrReplaceTempView("customer_q68")
      s.sql("""SELECT c_custkey, c_mktsegment,
              |  (SELECT count(*) FROM orders_q68
              |   WHERE o_custkey = c_custkey) AS n_orders,
              |  (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders_q68
              |   WHERE o_custkey = c_custkey) AS spend
              |FROM customer_q68 WHERE c_custkey < 200
              |ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT c_custkey, c_mktsegment,
           |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
           |  (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders
           |   WHERE o_custkey = c_custkey) AS spend
           |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin))

  /** Time-series densification + forward fill: generate the complete hourly
    * grid per user between their first and last event, left-join observed
    * values, carry the last observation forward into gaps. At scale the
    * grid explode is partition-local per user and the fill is one window —
    * no shuffle beyond the (user, hour) aggregation's own.
    */
  val q69GapFill = GraftQuery(
    "q69_gap_fill",
    (s, dir) => {
      val hourly = Tables.events(s, dir)
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"),
          unix_micros(date_trunc("hour", col("ts"))).as("hus"))
        .agg(round(sum("value"), 2).as("v"), count(lit(1)).as("cnt"))
      val grid = hourly.groupBy("user_id")
        .agg(min("hus").as("lo"), max("hus").as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(3600000000L))).as("hus"))
      val w = Window.partitionBy("user_id").orderBy("hus")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hus"), "left")
        .select(col("user_id"), col("hus"),
          coalesce(col("cnt"), lit(0L)).as("n"),
          coalesce(col("v"), lit(0.0)).as("v_raw"),
          round(coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0)), 2)
            .as("v_filled"))
        .orderBy("user_id", "hus")
    },
    Some("""WITH hourly AS (
           |  SELECT user_id, epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) hus,
           |    round(sum(value), 2) v, count(*) n
           |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
           |bounds AS (SELECT user_id, min(hus) lo, max(hus) hi FROM hourly GROUP BY 1),
           |grid AS (SELECT user_id, unnest(range(lo, hi + 1, 3600000000)) hus FROM bounds),
           |joined AS (
           |  SELECT g.user_id, g.hus, h.v, coalesce(h.n, 0) n
           |  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hus = h.hus)
           |SELECT user_id, hus, n,
           |  coalesce(v, 0) AS v_raw,
           |  round(coalesce(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
           |    ORDER BY hus ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 2)
           |    AS v_filled
           |FROM joined ORDER BY user_id, hus""".stripMargin))

  /** LIMIT/OFFSET pagination (Spark 3.4+ `Dataset.offset`): page 2 of the
    * price-ranked orders. At scale offset pushes into the same
    * TakeOrdered-style top-(offset+limit) physical op — no global sort.
    */
  val q71OffsetPage = GraftQuery(
    "q71_offset_page",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(desc("price"), col("o_orderkey"))
        .offset(20)
        .limit(15),
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders ORDER BY price DESC, o_orderkey LIMIT 15 OFFSET 20""".stripMargin))

  /** Null-semantics surface: nullif, count(col) vs count(*), null-safe
    * equality (<=> / IS NOT DISTINCT FROM), and coalesce fallback.
    */
  val q72NullSemantics = GraftQuery(
    "q72_null_semantics",
    (s, dir) => {
      val nonp = nullif(col("o_orderstatus"), lit("P"))
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_rows"),
          count(nonp).as("n_nonp"),
          sum(when(nonp <=> nonp, 1L).otherwise(0L)).as("n_nullsafe_eq"),
          sum(when(nonp === "F", 1L).otherwise(0L)).as("n_f"),
          coalesce(min(nonp), lit("none")).as("min_nonp"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  count(*) AS n_rows,
           |  count(nullif(o_orderstatus, 'P')) AS n_nonp,
           |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'P')
           |       IS NOT DISTINCT FROM nullif(o_orderstatus, 'P')
           |       THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
           |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') = 'F' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_f,
           |  coalesce(min(nullif(o_orderstatus, 'P')), 'none') AS min_nonp
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** XML sink → source round-trip over Spark 4's BUILT-IN xml source
    * (SPARK-44265 — no external package): customer rows become
    * `<customer>` elements, read back under the WRITER's explicit schema
    * (XML inference would widen every scalar from text), and the
    * aggregate matches the original parquet — proving serialization,
    * entity escaping in text fields, and type restoration. Scale:
    * XML read/write is partition-parallel line-record IO like csv/json;
    * the aggregate is one partial-agg shuffle.
    */
  val q272XmlRoundtrip = GraftQuery(
    "q272_xml_roundtrip",
    (s, dir) => {
      val out = graft.WorkDir.resolve(s, "xml", dir)
      val cust = Tables.customer(s, dir)
      cust.write.mode("overwrite")
        .option("rowTag", "customer").option("declaration", "")
        .xml(out)
      s.read.schema(cust.schema).option("rowTag", "customer").xml(out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum("c_acctbal"), 2).as("bal"),
          sum(length(col("c_name"))).as("name_chars"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n,
           |  round(sum(c_acctbal), 2) AS bal,
           |  CAST(sum(length(c_name)) AS BIGINT) AS name_chars
           |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q55OrcRoundtrip, q56RangeFrame, q57CollectTypes,
    q67Unpivot, q68CorrelatedScalar, q69GapFill, q71OffsetPage, q72NullSemantics,
    q272XmlRoundtrip)
}
