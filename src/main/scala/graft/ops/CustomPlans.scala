package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Queries exercising graft's custom Catalyst operators (logical plan +
  * strategy + physical exec, injected via GraftExtensions / register).
  */
object CustomPlans {

  /** Native as-of join ([[graft.plans.AsOfJoin]]): every error event picks
    * up the most recent click of the same user strictly before it. Unlike
    * the window formulation (q40), this works across two independent
    * relations — here the click side is pre-aggregated to one row per
    * (user, ts) so the as-of match is tie-free and deterministic on both
    * engines. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  val q58AsofNative = GraftQuery(
    "q58_asof_native",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val ev = Tables.events(s, dir)
      val err = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user_id"), col("ts").as("c_ts"))
        .agg(max(struct(col("event_id"), col("value"))).as("best"))
        .select(col("c_user_id"), col("c_ts"),
          col("best.event_id").as("click_id"), col("best.value").as("click_value"))
      graft.plans.AsOfJoin.join(err, clicks,
          Seq("user_id" -> "c_user_id"), "ts", "c_ts", strict = true)
        .select(col("event_id"), col("user_id"), col("click_id"),
          round(col("click_value"), 2).as("click_value"))
        .orderBy("event_id")
    },
    Some("""WITH clicks AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) ts,
           |    max(struct_pack(event_id := event_id, value := value)) AS best
           |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
           |c AS (SELECT user_id c_user_id, ts c_ts,
           |  best.event_id click_id, best.value click_value FROM clicks),
           |err AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts
           |  FROM events WHERE event_type = 'error')
           |SELECT err.event_id, err.user_id, c.click_id,
           |  round(c.click_value, 2) AS click_value
           |FROM err ASOF LEFT JOIN c ON err.user_id = c.c_user_id AND err.ts > c.c_ts
           |ORDER BY err.event_id""".stripMargin))

  /** Bucketed interval join ([[IntervalJoin.lookback]]): every (error,
    * click-of-same-user-in-preceding-5-minutes) pair, aggregated per user.
    * The rewrite turns Spark's nested-loop plan for the non-equi window
    * predicate into a (key, time-cell) equi-join; the oracle runs the naive
    * non-equi join, proving the rewrite is lossless.
    */
  val q73IntervalJoin = GraftQuery(
    "q73_interval_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val err = ev.filter(col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("e_us"),
          col("event_id").as("err_id"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
          col("value").as("c_value"))
      IntervalJoin.lookback(err, clk, "user_id", "e_us", "c_us", 300000000L)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("err_id")).as("n_errs"),
          round(sum("c_value"), 2).as("pair_value"))
        .orderBy("user_id")
    },
    Some("""WITH err AS (
           |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) e_us, event_id err_id
           |  FROM events WHERE event_type = 'error'),
           |clk AS (
           |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) c_us, value c_value
           |  FROM events WHERE event_type = 'click')
           |SELECT e.user_id, count(*) AS n_pairs,
           |  count(DISTINCT err_id) AS n_errs,
           |  round(sum(c_value), 2) AS pair_value
           |FROM err e JOIN clk c ON e.user_id = c.user_id
           |  AND c.c_us >= e.e_us - 300000000 AND c.c_us <= e.e_us
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Salted equi-join ([[Skew.saltedEquiJoin]]): orders⋈customer with the
    * customer key deliberately collapsed onto 3 hot values — the planned-
    * ahead skew mitigation (every hot key spread over `salts` reducers).
    * The salt only changes physical placement; the oracle runs the plain
    * join, proving row-identity.
    */
  val q74SaltedJoin = GraftQuery(
    "q74_salted_join",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), (col("o_custkey") % 3).as("hot_key"),
          col("o_totalprice"))
      val dim = Tables.customer(s, dir)
        .filter(col("c_custkey") < 3)
        .select(col("c_custkey").as("hot_key"), col("c_mktsegment"))
      Skew.saltedEquiJoin(ord, dim, "hot_key", col("o_orderkey"), 8)
        .groupBy("hot_key", "c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("hot_key", "c_mktsegment")
    },
    Some("""SELECT o_custkey % 3 AS hot_key, c_mktsegment,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS total
           |FROM orders JOIN customer ON o_custkey % 3 = c_custkey
           |WHERE c_custkey < 3
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q58AsofNative, q73IntervalJoin, q74SaltedJoin)
}
