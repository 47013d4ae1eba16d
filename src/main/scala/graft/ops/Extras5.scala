package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Fifth extras batch: outer-join null audit and the window null-handling
  * surface (defaults + IGNORE NULLS).
  */
object Extras5 {

  /** LEFT and RIGHT outer joins in one audit: customers with no orders
    * surface as null-extended rows on the probe side, and the mirrored
    * right join must agree exactly — the dangling-row semantics every
    * report join depends on.
    */
  val q109OuterJoins = GraftQuery(
    "q109_outer_joins",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir).select("o_custkey", "o_totalprice")
      val left = c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_custkey").isNull.cast("long")).as("n_dangling"),
          countDistinct(col("c_custkey")).as("n_customers"))
      val right = o.join(c, c("c_custkey") === o("o_custkey"), "right")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("r_rows"),
          sum(col("o_custkey").isNull.cast("long")).as("r_dangling"))
      left.join(right, Seq("c_mktsegment"))
        .select("c_mktsegment", "n_rows", "n_dangling", "n_customers",
          "r_rows", "r_dangling")
        .orderBy("c_mktsegment")
    },
    Some("""WITH l AS (
           |  SELECT c_mktsegment, count(*) AS n_rows,
           |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling,
           |    count(DISTINCT c_custkey) AS n_customers
           |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |  GROUP BY 1),
           |r AS (
           |  SELECT c_mktsegment, count(*) AS r_rows,
           |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_dangling
           |  FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
           |  GROUP BY 1)
           |SELECT c_mktsegment, n_rows, n_dangling, n_customers, r_rows, r_dangling
           |FROM l JOIN r USING (c_mktsegment) ORDER BY c_mktsegment""".stripMargin))

  /** Window null handling: lag with an explicit default and first/last_value
    * IGNORE NULLS over a running frame — the gap-bridging primitives behind
    * forward-fill (q69 uses the same machinery). The nullable measure is
    * derived deterministically (value only on every 3rd event).
    */
  val q110WindowNulls = GraftQuery(
    "q110_window_nulls",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("event_id") < 2000)
        .withColumn("y", when(col("event_id") % 3 === 0, round(col("value"), 2)))
        .select(
          col("user_id"), col("event_id"), col("y"),
          lag(col("y"), 1, -1.0).over(w).as("prev_or_default"),
          first(col("y"), ignoreNulls = true).over(run).as("first_seen"),
          last(col("y"), ignoreNulls = true).over(run).as("carry_forward"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
           |  CASE WHEN event_id % 3 = 0 THEN round(value, 2) END AS y,
           |  lag(CASE WHEN event_id % 3 = 0 THEN round(value, 2) END, 1, -1.0) OVER w AS prev_or_default,
           |  first_value((CASE WHEN event_id % 3 = 0 THEN round(value, 2) END) IGNORE NULLS)
           |    OVER (PARTITION BY user_id ORDER BY event_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_seen,
           |  last_value((CASE WHEN event_id % 3 = 0 THEN round(value, 2) END) IGNORE NULLS)
           |    OVER (PARTITION BY user_id ORDER BY event_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_forward
           |FROM events WHERE event_id < 2000
           |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
           |ORDER BY user_id, event_id""".stripMargin))

  /** Explicit NULLS FIRST/LAST ordering: Spark defaults nulls-first on ASC
    * while DuckDB defaults nulls-last, so portable sorts must state the
    * placement. Ranks a deterministically-nulled measure both ways.
    */
  val q114NullOrdering = GraftQuery(
    "q114_null_ordering",
    (s, dir) => {
      val y = when(col("event_id") % 5 === 0, round(col("value"), 2))
      val base = Tables.events(s, dir).filter(col("event_id") < 500)
        .select(col("event_id"), y.as("y"))
      base.select(
        col("event_id"), col("y"),
        row_number().over(Window.orderBy(
          col("y").asc_nulls_last, col("event_id"))).as("rank_nl"),
        row_number().over(Window.orderBy(
          col("y").desc_nulls_first, col("event_id"))).as("rank_nf"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
           |  CASE WHEN event_id % 5 = 0 THEN round(value, 2) END AS y,
           |  row_number() OVER (ORDER BY
           |    (CASE WHEN event_id % 5 = 0 THEN round(value, 2) END) ASC NULLS LAST,
           |    event_id) AS rank_nl,
           |  row_number() OVER (ORDER BY
           |    (CASE WHEN event_id % 5 = 0 THEN round(value, 2) END) DESC NULLS FIRST,
           |    event_id) AS rank_nf
           |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin))

  /** Join-cardinality estimation by correlated key-universe sampling — the
    * query-planner diagnostic done the only way that works for joins:
    * sampling ROWS independently on each side underestimates the join
    * quadratically, but hashing the JOIN KEY into 1/16 of its universe and
    * keeping whole key-groups on BOTH sides (the same md5 bucket, so the
    * samples are correlated) makes the sampled join an unbiased 1/16
    * miniature whose count scales back by exactly 16. The query reports
    * the estimate next to the true count and the relative error — the
    * audit loop for sampling-based cost models. Both sampled scans push
    * the bucket predicate into the scan; the sampled join is 1/16 the
    * work of the true one.
    */
  val q216JoinCardEstimate = GraftQuery(
    "q216_join_card_estimate",
    (s, dir) => {
      def bucket(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 16
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val actual = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("actual"))
      val est = li.filter(bucket(col("l_orderkey")) === 0)
        .join(o.filter(bucket(col("o_orderkey")) === 0),
          col("l_orderkey") === col("o_orderkey"))
        .agg((count(lit(1)) * 16).as("estimate"))
      actual.crossJoin(est)
        .select(col("actual"), col("estimate"),
          round(abs(col("estimate") - col("actual")) / col("actual").cast("double"), 6)
            .as("rel_error"))
    },
    Some("""WITH li AS (SELECT l_orderkey FROM lineitem),
           |o AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
           |act AS (SELECT CAST(count(*) AS BIGINT) actual
           |  FROM li JOIN o ON l_orderkey = o_orderkey),
           |est AS (SELECT CAST(count(*) * 16 AS BIGINT) estimate
           |  FROM li JOIN o ON l_orderkey = o_orderkey
           |  WHERE CAST(concat('0x', substr(md5(l_orderkey::VARCHAR), 1, 8)) AS BIGINT) % 16 = 0
           |    AND CAST(concat('0x', substr(md5(o_orderkey::VARCHAR), 1, 8)) AS BIGINT) % 16 = 0)
           |SELECT actual, estimate,
           |  round(abs(estimate - actual) / actual::DOUBLE, 6) AS rel_error
           |FROM act, est""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q109OuterJoins, q110WindowNulls, q114NullOrdering,
    q216JoinCardEstimate)
}
