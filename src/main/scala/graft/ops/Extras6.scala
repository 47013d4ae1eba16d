package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Sixth extras batch: arg-extreme aggregates (min_by/max_by) and the array
  * function long tail.
  */
object Extras6 {

  /** min_by / max_by with an explicit struct tie-break: "which event carried
    * the extreme value" is the arg-extreme pattern behind every
    * top-offender / best-example report. Spark's bare max_by(x, y) is
    * nondeterministic under ties, so the ordering key is (value, event_id) —
    * a total order. DuckDB 1.0's arg_max can't take a composite ordering
    * key, so the oracle expresses the same total order with row_number.
    */
  val q115ArgExtremes = GraftQuery(
    "q115_arg_extremes",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("max_by(event_id, struct(value, event_id))").as("top_id"),
          expr("min_by(event_id, struct(value, event_id))").as("bot_id"),
          round(max("value"), 2).as("max_value"),
          round(min("value"), 2).as("min_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""WITH ranked AS (
           |  SELECT event_type, event_id, value,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value DESC, event_id DESC) AS rt,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value ASC, event_id ASC) AS rb
           |  FROM events)
           |SELECT event_type,
           |  max(CASE WHEN rt = 1 THEN event_id END) AS top_id,
           |  max(CASE WHEN rb = 1 THEN event_id END) AS bot_id,
           |  round(max(value), 2) AS max_value,
           |  round(min(value), 2) AS min_value,
           |  count(*) AS n
           |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Array-function long tail over tokenized text: distinct+sort, slicing,
    * membership, size, and sequence generation — the building blocks the
    * dedup/chunking pipelines compose, exercised here as first-class
    * columns. Arrays are canonically ordered (sorted) and then string-joined
    * in the FINAL select: the round driver's compare pandas-sorts rows, and
    * array-typed cells raise `unhashable type: numpy.ndarray` there (the
    * round-2 q116/q123/q124 failure class) — scalar strings keep the result
    * driver-hashable without losing any information.
    */
  val q116ArrayFuncs = GraftQuery(
    "q116_array_funcs",
    (s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          array_join(array_sort(array_distinct(toks)), ",").as("vocab"),
          array_join(slice(array_sort(array_distinct(toks)), 1, 3), ",").as("first3"),
          size(toks).cast("long").as("n_tokens"),
          array_contains(toks, "query").as("has_kw"),
          array_join(transform(
            sequence(lit(1L), least(size(toks).cast("long"), lit(3L))),
            x => x.cast("string")), ",").as("idx_seq"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab,
           |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ',') AS first3,
           |  len(string_split(text, ' ')) AS n_tokens,
           |  list_contains(string_split(text, ' '), 'query') AS has_kw,
           |  array_to_string(generate_series(1, least(len(string_split(text, ' ')), 3)), ',') AS idx_seq
           |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  /** Ordered-sequence funnel: of the users who signed up, how many later
    * clicked, and of those how many later purchased — strict event-time
    * ordering via min-timestamp per stage, the standard conversion-funnel
    * reduction. One shuffle (groupBy user) then a tiny global aggregate.
    */
  val q117Funnel = GraftQuery(
    "q117_funnel",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("t_signup")).as("n_signup"),
          // coalesce: an all-NULL comparison column sums to NULL in Spark
          // but the oracle's CASE ... ELSE 0 form returns 0
          coalesce(sum((col("t_signup") < col("t_click")).cast("long")), lit(0L))
            .as("n_signup_click"),
          coalesce(sum((col("t_signup") < col("t_click") &&
            col("t_click") < col("t_purchase")).cast("long")), lit(0L))
            .as("n_full_funnel")),
    Some("""WITH stages AS (
           |  SELECT user_id,
           |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
           |  FROM events GROUP BY 1)
           |SELECT count(*) AS n_users, count(t_signup) AS n_signup,
           |  CAST(sum(CASE WHEN t_signup < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
           |  CAST(sum(CASE WHEN t_signup < t_click AND t_click < t_purchase
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
           |FROM stages""".stripMargin))

  /** Cohort retention matrix: users bucketed by first-seen day, counted per
    * day-offset of later activity. One shuffle on user_id computes the
    * cohort AND the distinct active-day set (collect_set is bounded by the
    * calendar span, not the event count), then explode feeds a tiny final
    * aggregate — no join, no second full-data exchange, which is the shape
    * that survives a 100 TB event log. Day granularity because the
    * fixture's event span is 30 days at every scale factor.
    */
  val q118Retention = GraftQuery(
    "q118_retention",
    (s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          to_date(min(col("ts"))).as("cohort"),
          collect_set(to_date(col("ts"))).as("days"))
      perUser.select(col("cohort"), explode(col("days")).as("d"))
        .groupBy(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("d"), col("cohort")).cast("long").as("offset_d"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "offset_d")
    },
    Some("""WITH firsts AS (
           |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM events GROUP BY 1),
           |activity AS (
           |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
           |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           |  datediff('day', cohort, d) AS offset_d, count(*) AS n_users
           |FROM firsts JOIN activity USING (user_id)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Event-transition matrix (first-order Markov counts): for each user's
    * time-ordered event stream, count event_type → next event_type pairs.
    * lead() over (user_id, ts) with event_id as the tie-break so the
    * sequence is total-ordered; the window partitions by user, so state per
    * partition is one row.
    */
  val q119Transitions = GraftQuery(
    "q119_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "next_type")
    },
    Some("""WITH seq AS (
           |  SELECT user_id, event_type,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS next_type
           |  FROM events)
           |SELECT event_type, next_type, count(*) AS n
           |FROM seq WHERE next_type IS NOT NULL
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** RFM (recency / frequency / monetary) customer segmentation:
    * per-customer order stats quartiled against the three exact quartile
    * thresholds of each metric (the ScaleFrames threshold frame — r_q 1 =
    * most recent, f_q/m_q 1 = highest; equal metric values share a
    * quartile). Monetary totals sum in INTEGER CENTS (the q103
    * drift-proof discipline) so thresholds and comparisons are exact
    * cross-engine; the displayed `monetary` divides back to dollars.
    *
    * Scale: the round-7 form ran three global ntile windows over the
    * customer dimension through one task each; this form is one
    * threshold-aggregate over the localCheckpointed per-customer table
    * plus a map-side comparison chain — no global window, no
    * `Exchange SinglePartition` at any customer cardinality.
    */
  private[graft] def q120Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val per0 = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          datediff(to_date(lit("1999-01-01")), to_date(max(col("o_orderdate"))))
            .cast("long").as("recency_d"),
          count(lit(1)).as("frequency"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("m_cents"))
      // customer-dimension cardinality
      val per = if (forPlan) per0 else per0.localCheckpoint()
      val fr = Seq(0.25, 0.5, 0.75)
      val rT = ScaleFrames.thresholds(per, "recency_d", fr)
      val fT = ScaleFrames.thresholds(per, "frequency", fr.reverse)
      val mT = ScaleFrames.thresholds(per, "m_cents", fr.reverse)
      per.select(
        col("o_custkey"), col("recency_d"), col("frequency"),
        round(col("m_cents") / 100.0, 2).as("monetary"),
        ScaleFrames.binAsc(col("recency_d"), rT).as("r_q"),
        ScaleFrames.binDesc(col("frequency"), fT).as("f_q"),
        ScaleFrames.binDesc(col("m_cents"), mT).as("m_q"))
        .orderBy("o_custkey")
  }

  val q120Rfm = GraftQuery(
    "q120_rfm",
    (s, dir) => q120Df(s, dir),
    Some(s"""WITH per AS (
           |  SELECT o_custkey,
           |    datediff('day', CAST(max(o_orderdate) AS DATE), DATE '1999-01-01') AS recency_d,
           |    count(*) AS frequency,
           |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
           |  FROM orders GROUP BY 1),
           |th AS (SELECT
           |    round(quantile_cont(recency_d, 0.25), 6) r1,
           |    round(quantile_cont(recency_d, 0.5), 6) r2,
           |    round(quantile_cont(recency_d, 0.75), 6) r3,
           |    round(quantile_cont(frequency, 0.75), 6) f1,
           |    round(quantile_cont(frequency, 0.5), 6) f2,
           |    round(quantile_cont(frequency, 0.25), 6) f3,
           |    round(quantile_cont(m_cents, 0.75), 6) m1,
           |    round(quantile_cont(m_cents, 0.5), 6) m2,
           |    round(quantile_cont(m_cents, 0.25), 6) m3
           |  FROM per)
           |SELECT o_custkey, recency_d, frequency,
           |  round(m_cents / 100.0, 2) AS monetary,
           |  1 + CAST(recency_d > th.r1 AS INT) + CAST(recency_d > th.r2 AS INT)
           |    + CAST(recency_d > th.r3 AS INT) AS r_q,
           |  1 + CAST(frequency < th.f1 AS INT) + CAST(frequency < th.f2 AS INT)
           |    + CAST(frequency < th.f3 AS INT) AS f_q,
           |  1 + CAST(m_cents < th.m1 AS INT) + CAST(m_cents < th.m2 AS INT)
           |    + CAST(m_cents < th.m3 AS INT) AS m_q
           |FROM per, th ORDER BY o_custkey""".stripMargin))

  /** Top user journeys: each user's first five events in time order,
    * joined into a path string and ranked by popularity. The per-user
    * prefix is taken BEFORE any collection: rank ≤ 5 over
    * (user_id | ts, event_id) plans as a WindowGroupLimit — each task
    * keeps at most 5 rows per user ahead of the shuffle — so the
    * collect_list that follows is bounded at 5 structs per user at ANY
    * per-user event volume (the unbounded-hot-user hazard of collecting
    * whole histories). sort_array makes the ≤5-element sequence
    * deterministic (collect_list alone has no order guarantee; event_id
    * breaks ts ties). DuckDB's ORDER BY-qualified list() is the oracle
    * twin.
    */
  val q121SessionPaths = GraftQuery(
    "q121_session_paths",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val per = Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      per.select(concat_ws(">",
          transform(col("evs"), e => e.getField("event_type")))
          .as("path5"))
        .groupBy("path5")
        .agg(count(lit(1)).as("n_users"))
        .orderBy(desc("n_users"), col("path5"))
        .limit(20)
    },
    Some("""WITH per AS (
           |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS evs
           |  FROM events GROUP BY 1)
           |SELECT array_to_string(list_slice(evs, 1, 5), '>') AS path5,
           |  count(*) AS n_users
           |FROM per GROUP BY 1 ORDER BY n_users DESC, path5 LIMIT 20""".stripMargin))

  /** Ordered string aggregation (listagg WITHIN GROUP): the SQL-standard
    * spelling of "join the group's values in a defined order". Equal keys
    * make tie order irrelevant, so the output string is deterministic.
    * DuckDB's twin is string_agg(... ORDER BY ...).
    */
  val q122Listagg = GraftQuery(
    "q122_listagg",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 40)
        .groupBy("l_returnflag")
        .agg(
          expr("listagg(cast(l_orderkey as string), ',') " +
            "within group (order by l_orderkey)").as("keys"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  string_agg(CAST(l_orderkey AS VARCHAR), ',' ORDER BY l_orderkey) AS keys,
           |  count(*) AS n
           |FROM lineitem WHERE l_orderkey < 40 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Approximate percentiles (Greenwald-Khanna sketch) next to their exact
    * twins: the fixed-size-state path for quantiles over data too big to
    * sort. The sketch's internal state isn't cross-engine stable, so the
    * oracle-checkable form emits the EXACT percentiles plus per-quantile
    * error-bound booleans (|approx−exact|/exact ≤ 2%); the oracle asserts
    * the bound holds by emitting literal TRUE. GK with accuracy 10000 has
    * rank error ≤ n/10000 (6 ranks at sf0.01), far inside 2% value error on
    * this distribution — a sketch regression flips the boolean and the hash.
    */
  val q123ApproxPercentile = GraftQuery(
    "q123_approx_percentile",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          approx_percentile(col("l_extendedprice"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"),
          expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ep"),
          count(lit(1)).as("n"))
        .select(
          col("l_returnflag"),
          round(element_at(col("ep"), 1), 4).as("exact_p50"),
          round(element_at(col("ep"), 2), 4).as("exact_p90"),
          round(element_at(col("ep"), 3), 4).as("exact_p99"),
          (abs(element_at(col("ap"), 1) - element_at(col("ep"), 1)) /
            element_at(col("ep"), 1) <= 0.02).as("p50_ok"),
          (abs(element_at(col("ap"), 2) - element_at(col("ep"), 2)) /
            element_at(col("ep"), 2) <= 0.02).as("p90_ok"),
          (abs(element_at(col("ap"), 3) - element_at(col("ep"), 3)) /
            element_at(col("ep"), 3) <= 0.02).as("p99_ok"),
          col("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
           |  round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
           |  round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
           |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Map-function long tail: per order, a linenumber→quantity map built
    * with map_from_entries over sorted entries (two collect_lists would not
    * align; sorted structs make entry order — and therefore map_values fold
    * order — deterministic), then map_keys / map_filter / element_at /
    * aggregate-over-values. The oracle computes the same results from the
    * raw rows, so it never has to reproduce Spark's MAP representation.
    * Quantities are integer-valued, so the fold total is exact in any
    * order.
    */
  val q124MapFuncs = GraftQuery(
    "q124_map_funcs",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 200)
        // linenumber is not unique per order in this fixture, and Spark maps
        // reject duplicate keys: reduce to one quantity per (order, line)
        // first (integer-valued sums, exact in any order)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(round(sum("l_quantity"), 2).as("v"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(
          struct(col("l_linenumber").as("k"), col("v")))).as("kv"))
        .withColumn("m", map_from_entries(col("kv")))
        .select(
          col("l_orderkey"),
          size(col("m")).cast("long").as("n_lines"),
          // string-joined, not raw array: see q116 — array cells crash the
          // driver's pandas row sort
          array_join(transform(array_sort(map_keys(col("m"))),
            k => k.cast("string")), ",").as("line_nos"),
          round(element_at(col("m"), 1), 2).as("qty_line1"),
          size(map_filter(col("m"), (_, v) => v > 25)).cast("long").as("n_big"),
          round(aggregate(map_values(col("m")), lit(0.0), (a, x) => a + x), 2)
            .as("qty_total"))
        .orderBy("l_orderkey"),
    Some("""WITH per AS (
           |  SELECT l_orderkey, l_linenumber, round(sum(l_quantity), 2) AS v
           |  FROM lineitem WHERE l_orderkey < 200 GROUP BY 1, 2)
           |SELECT l_orderkey, count(*) AS n_lines,
           |  array_to_string(list_sort(list(l_linenumber)), ',') AS line_nos,
           |  max(CASE WHEN l_linenumber = 1 THEN v END) AS qty_line1,
           |  CAST(sum(CASE WHEN v > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           |  round(sum(v), 2) AS qty_total
           |FROM per GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Schema-drift union: unionByName(allowMissingColumns = true) aligns two
    * inputs with different column sets by NAME, null-filling the gaps — the
    * append path when a landing table gains columns over time (the batch
    * counterpart of q86's mergeSchema read). DuckDB's UNION ALL BY NAME is
    * the oracle twin.
    */
  val q125UnionByName = GraftQuery(
    "q125_union_by_name",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val olds = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_bal"))
      val news = c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_mktsegment"))
      olds.unionByName(news, allowMissingColumns = true)
        .orderBy("c_custkey")
    },
    Some("""WITH a AS (
           |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_bal
           |  FROM customer WHERE c_custkey % 2 = 0),
           |b AS (
           |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 1)
           |SELECT * FROM a UNION ALL BY NAME SELECT * FROM b
           |ORDER BY c_custkey""".stripMargin))

  /** grouping() / grouping_id() over a rollup: the only reliable way to
    * tell a subtotal row from a genuine NULL group key. gid bit order
    * (first rollup column = MSB) follows the SQL standard in both engines;
    * both sides cast the indicator columns to BIGINT so the type-sensitive
    * hash agrees.
    */
  val q126GroupingId = GraftQuery(
    "q126_grouping_id",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("gid"), col("n"), col("sum_qty"))
        .orderBy("gid", "rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
           |  coalesce(l_linestatus, 'ALL') AS ls,
           |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY gid, rf, ls""".stripMargin))

  /** Exponentially time-decayed engagement score per user — the
    * feature-store staple (recency-weighted activity with a 7-day
    * half-life: an event's contribution halves every week between it and
    * the corpus horizon). The horizon is the one-row max-timestamp
    * aggregate CROSS-JOINED as a broadcast, not a driver-side scalar, so
    * the whole computation stays one scan + one partial-agg shuffle; the
    * decay factor is per-row closed-form math (unix_micros keeps the age
    * arithmetic integer until one division). Σ value·2^(−age/7) is a
    * float accumulation → round 3 (the order-dependent discipline);
    * min(age) is order-independent → round 6.
    */
  val q177DecayedEngagement = GraftQuery(
    "q177_decayed_engagement",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val refDf = ev.agg(max(unix_micros(col("ts"))).as("ref_us"))
      ev.crossJoin(broadcast(refDf))
        .withColumn("age_d",
          (col("ref_us") - unix_micros(col("ts"))) / lit(86400e6))
        .withColumn("decay",
          col("value") * pow(lit(2.0), -col("age_d") / lit(7.0)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(min("age_d"), 6).as("last_seen_days"),
          round(sum("decay"), 3).as("decayed_value"))
        .orderBy("user_id")
    },
    Some("""WITH r AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
           |d AS (SELECT user_id, value,
           |    (ref_us - epoch_us(ts)) / 86400e6 AS age_d
           |  FROM events, r)
           |SELECT user_id, count(*) AS n_events,
           |  round(min(age_d), 6) AS last_seen_days,
           |  round(sum(value * pow(2.0, -age_d / 7.0)), 3) AS decayed_value
           |FROM d GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Skyline (Pareto frontier) query — minimize per-part best price while
    * maximizing per-part total quantity sold: the multi-criteria shortlist
    * operator (Börzsönyi et al. 2001) relational engines bolt on as
    * SKYLINE OF. Distributed shape is the classic two-phase: each
    * partition sweeps its points sorted by (price asc, qty desc) keeping
    * strict running-max-qty risers — a LOCAL skyline, provably a superset
    * of the global one (2D skylines rise monotonically; equal-(x,y)
    * duplicates of the frontier point are kept, since dominance needs a
    * strict inequality) — and only the union of local frontiers (tiny)
    * enters the exact dominance anti-join. The corpus never self-joins:
    * the O(n²) test runs on the pruned candidate set alone, the q189
    * candidates-then-verify discipline.
    */
  val q211Skyline = GraftQuery(
    "q211_skyline",
    (s, dir) => {
      import s.implicits._
      val pts = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(min("l_extendedprice").as("min_price"),
          sum("l_quantity").cast("long").as("total_qty"))
      val cand = pts.select(col("l_partkey"), col("min_price"),
          col("total_qty").cast("double"))
        // the riser sweep needs each partition in (x asc, y desc) order;
        // Spark's external sorter does that with disk spill, so the sweep
        // itself is a pure streaming filter — the partition is never held
        // in executor memory (an it.toArray.sortBy here would cap the
        // partition size at the heap)
        .sortWithinPartitions(
          asc("min_price"), desc("total_qty"), asc("l_partkey"))
        .as[(Long, Double, Double)]
        .mapPartitions { it =>
          var bestY = Double.NegativeInfinity
          var bestX = Double.NaN
          it.filter { case (_, x, y) =>
            if (y > bestY) { bestY = y; bestX = x; true }
            else y == bestY && x == bestX // exact duplicate of the frontier point
          }
        }.toDF("l_partkey", "min_price", "total_qty")
      val dominated = col("b.min_price") <= col("a.min_price") &&
        col("b.total_qty") >= col("a.total_qty") &&
        (col("b.min_price") < col("a.min_price") ||
          col("b.total_qty") > col("a.total_qty"))
      cand.alias("a").join(cand.alias("b"), dominated, "left_anti")
        .select(col("l_partkey"), col("min_price"),
          col("total_qty").cast("long").as("total_qty"))
        .orderBy("l_partkey")
    },
    Some("""WITH pts AS (SELECT l_partkey, min(l_extendedprice) AS min_price,
           |    CAST(sum(l_quantity) AS BIGINT) AS total_qty
           |  FROM lineitem GROUP BY 1)
           |SELECT p.l_partkey, p.min_price, p.total_qty FROM pts p
           |WHERE NOT EXISTS (SELECT 1 FROM pts q
           |  WHERE q.min_price <= p.min_price AND q.total_qty >= p.total_qty
           |    AND (q.min_price < p.min_price OR q.total_qty > p.total_qty))
           |ORDER BY p.l_partkey""".stripMargin))

  /** Association-rule mining over order baskets (Agrawal & Srikant's
    * support/confidence/lift, restricted to 2-itemsets — the market-basket
    * co-occurrence report): candidate pairs come from a self-join KEYED ON
    * THE ORDER (baskets are small, so per-key fan-out is the squared
    * basket size — bounded, never a hot key), pair support prunes at ≥ 3
    * before any per-item join, and confidence/lift derive from integer
    * support counts (the one division rounds at 6). Top-20 ranks the
    * 3-digit-ROUNDED lift (round-before-rank) with item-id ties.
    */
  val q212AssociationRules = GraftQuery(
    "q212_association_rules",
    (s, dir) => {
      val b = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct().persist()
      val nOrders = b.select("o").distinct().count().toDouble
      val itemSupp = b.groupBy("p").agg(count(lit(1)).as("supp_i"))
      // NOTE (r13 optimization round): the collect_set + in-row-pair-HOF
      // build that won on coPurchaseEdges was tried here and measured
      // SLOWER both isolated (+12 %) and inside a full bench pass
      // (+0.35 s) — unlike the graph queries there is no heavy downstream
      // to amortize it, and the support groupBy reads the exploded pair
      // stream from the few AQE-coalesced post-aggregate partitions.
      // Kept on the baseline-proven self-join shape deliberately.
      val pairs = b.select(col("o"), col("p").as("pa"))
        .join(b.select(col("o"), col("p").as("pb")), Seq("o"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 3)
      val out = pairs
        .join(itemSupp.select(col("p").as("pa"), col("supp_i").as("sa")), "pa")
        .join(itemSupp.select(col("p").as("pb"), col("supp_i").as("sb")), "pb")
        .select(col("pa"), col("pb"), col("supp"),
          round(col("supp") / col("sa").cast("double"), 6).as("confidence"),
          round(lit(nOrders) * col("supp") / (col("sa") * col("sb")).cast("double"), 3)
            .as("lift"))
        .orderBy(desc("lift"), col("pa"), col("pb"))
        .limit(20)
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      b.unpersist()
      ckpt
    },
    Some("""WITH b AS (SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem),
           |n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) n FROM b),
           |si AS (SELECT p, CAST(count(*) AS BIGINT) supp_i FROM b GROUP BY 1),
           |pairs AS (SELECT a.p pa, b2.p pb, CAST(count(*) AS BIGINT) supp
           |  FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
           |  GROUP BY 1, 2 HAVING count(*) >= 3)
           |SELECT pa, pb, supp,
           |  round(supp / sa.supp_i::DOUBLE, 6) AS confidence,
           |  round(n.n * supp / (sa.supp_i * sb.supp_i)::DOUBLE, 3) AS lift
           |FROM pairs
           |JOIN si sa ON sa.p = pa JOIN si sb ON sb.p = pb, n
           |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin))

  /** Top-k rank stability across weeks — "is this leaderboard signal or
    * churn": each 7-day bucket ranks parts by shipped quantity, keeps its
    * top 10 (integer counts, id ties), and consecutive weeks compare as
    * exact set overlap + Jaccard. High churn on a supposedly stable
    * dimension is the classic upstream-data-change tripwire. Weekly ranks
    * are per-bucket WindowGroupLimit-shaped top-k; the comparison joins
    * two 10-row sets per week pair.
    */
  val q250RankStability = GraftQuery(
    "q250_rank_stability",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      val mn = li.agg(min(to_date(col("o_orderdate"))).as("d0"))
      val weekly = li.crossJoin(mn)
        .withColumn("wk",
          floor(datediff(to_date(col("o_orderdate")), col("d0")) / 7))
        .groupBy("wk", "l_partkey")
        .agg(sum("l_quantity").cast("long").as("qty"))
      val top = weekly.withColumn("rn", row_number().over(
          Window.partitionBy("wk").orderBy(desc("qty"), col("l_partkey"))))
        .filter(col("rn") <= 10)
        .select(col("wk"), col("l_partkey")).persist()
      val out = top.select(col("wk"), col("l_partkey"))
        .join(top.select((col("wk") + 1).as("wk"), col("l_partkey")),
          Seq("wk", "l_partkey"))
        .groupBy("wk").agg(count(lit(1)).as("overlap"))
        .withColumn("jaccard",
          round(col("overlap") / (lit(20.0) - col("overlap")), 6))
        .select(col("wk").cast("long").as("week"), col("overlap"),
          col("jaccard"))
        .orderBy("week")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      top.unpersist()
      ckpt
    },
    Some("""WITH li AS (SELECT l_partkey, l_quantity, o_orderdate
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |mn AS (SELECT CAST(min(o_orderdate) AS DATE) d0 FROM li),
           |weekly AS (SELECT
           |    datediff('day', d0, CAST(o_orderdate AS DATE)) // 7 AS wk,
           |    l_partkey, CAST(sum(l_quantity) AS BIGINT) qty
           |  FROM li, mn GROUP BY 1, 2),
           |top AS (SELECT wk, l_partkey FROM (
           |  SELECT wk, l_partkey, row_number() OVER (
           |    PARTITION BY wk ORDER BY qty DESC, l_partkey) rn
           |  FROM weekly) WHERE rn <= 10)
           |SELECT CAST(a.wk AS BIGINT) AS week,
           |  CAST(count(*) AS BIGINT) AS overlap,
           |  round(count(*) / (20.0 - count(*)), 6) AS jaccard
           |FROM top a JOIN top b ON b.wk = a.wk - 1 AND b.l_partkey = a.l_partkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Behavioral-diversity entropy per user, histogrammed — the
    * bot-vs-human screen on event MIX (q238 screens timing): a user's
    * event-type distribution has entropy 0 if they only ever do one
    * thing (scripted) and ln(5) if perfectly mixed; the corpus-level
    * histogram of per-user entropies is the population
    * fingerprint a fraud review reads (0.05-nat bins — the fixture's
    * synthetic users are all near-uniform, so the interesting structure
    * is the narrow spread around ln(5)). Per-user entropy folds from
    * exact integer ratios over ≤5 cells; the histogram is a second
    * partial agg over user-cardinality rows.
    */
  val q265BehaviorEntropy = GraftQuery(
    "q265_behavior_entropy",
    (s, dir) => {
      val cells = Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val tot = cells.groupBy("user_id").agg(sum("c").as("n"))
      // round h to 6 BEFORE the floor bucketing (the knife-edge-threshold
      // discipline): the xlogx fold is accumulation-order- and
      // libm-dependent, so an h within an ulp of a 0.05 boundary must
      // bin identically across engines and runs
      val ent = cells.join(tot, "user_id")
        .groupBy("user_id")
        .agg(round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 6)
          .as("h"))
      ent.groupBy(floor(col("h") / 0.05).cast("long").as("entropy_bin"))
        .agg(count(lit(1)).as("n_users"), round(avg("h"), 3).as("mean_h"))
        .orderBy("entropy_bin")
    },
    Some("""WITH cells AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) c
           |  FROM events GROUP BY 1, 2),
           |tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) n FROM cells GROUP BY 1),
           |ent AS (SELECT cells.user_id,
           |    round(-sum((c / tot.n::DOUBLE) * ln(c / tot.n::DOUBLE)), 6) AS h
           |  FROM cells JOIN tot USING (user_id) GROUP BY 1)
           |SELECT CAST(floor(h / 0.05) AS BIGINT) AS entropy_bin,
           |  CAST(count(*) AS BIGINT) AS n_users, round(avg(h), 3) AS mean_h
           |FROM ent GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Time-to-convert distribution — q219 counts WHO converts inside the
    * window; this measures HOW FAST: seconds from first signup to first
    * subsequent purchase per user, reduced to exact quartiles + P90 and
    * the converter count. Gaps are integer epoch-second deltas; the
    * percentiles are the q54-proven exact pairing.
    */
  val q266TimeToConvert = GraftQuery(
    "q266_time_to_convert",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(s0, "user_id")
        .filter(col("ts") > col("t0"))
        .groupBy("user_id").agg(min("ts").as("t1"), first("t0").as("t0"))
        .select((col("t1").cast("long") - col("t0").cast("long")).as("gap_s"))
      conv.agg(count(lit(1)).as("n_converters"),
        round(expr("percentile(gap_s, 0.25)"), 3).as("p25_s"),
        round(expr("percentile(gap_s, 0.5)"), 3).as("p50_s"),
        round(expr("percentile(gap_s, 0.75)"), 3).as("p75_s"),
        round(expr("percentile(gap_s, 0.9)"), 3).as("p90_s"))
    },
    Some("""WITH s0 AS (SELECT user_id, min(ts) t0 FROM events
           |  WHERE event_type = 'signup' GROUP BY 1),
           |conv AS (SELECT e.user_id,
           |    date_diff('second', any_value(s0.t0), min(e.ts)) AS gap_s
           |  FROM events e JOIN s0 USING (user_id)
           |  WHERE e.event_type = 'purchase' AND e.ts > s0.t0
           |  GROUP BY 1)
           |SELECT CAST(count(*) AS BIGINT) n_converters,
           |  round(quantile_cont(gap_s, 0.25), 3) AS p25_s,
           |  round(quantile_cont(gap_s, 0.5), 3) AS p50_s,
           |  round(quantile_cont(gap_s, 0.75), 3) AS p75_s,
           |  round(quantile_cont(gap_s, 0.9), 3) AS p90_s
           |FROM conv""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q115ArgExtremes, q116ArrayFuncs, q117Funnel, q118Retention,
      q119Transitions, q120Rfm, q121SessionPaths, q122Listagg,
      q123ApproxPercentile, q124MapFuncs, q125UnionByName, q126GroupingId,
      q177DecayedEngagement, q211Skyline, q212AssociationRules,
      q250RankStability, q265BehaviorEntropy, q266TimeToConvert)
}
