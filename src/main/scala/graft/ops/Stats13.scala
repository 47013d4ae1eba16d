package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q373/q380/q381 — round-13 statistics additions: the Theil-Sen robust
  * slope (the ESTIMATOR companion to q319's Mann-Kendall trend TEST),
  * Kendall's tau-b (the tie-corrected concordance coefficient next to
  * q363's tie-corrected Spearman), and a difference-in-differences
  * estimate (the causal readout q247's A/B summary can't give when
  * treatment isn't randomized over time).
  *
  * Reference scope note: the reference (pesto93/Clickhouse_data-rebalance)
  * ships no statistics — these extend the engine's curation/monitoring
  * surface per the training-data-pipeline mandate.
  */
object Stats13 {

  /** Theil-Sen robust trend slope per event type — the median of all
    * pairwise daily-count slopes (Theil 1950, Sen 1968). q319's
    * Mann-Kendall S answers "is there a monotone trend?"; this answers
    * "how steep?", with the same 29%-outlier breakdown point. The pair
    * frame reports S too (Σ sign(c₂−c₁) over day pairs), so the test and
    * its estimator come from one pass over the same pairs.
    *
    * Exactness: counts are BIGINT; each slope is ONE double division of
    * two exact integers (identical per-row math in both engines); the
    * median is the LOWER median — the element at row_number (n+1) div 2
    * in (slope, d1, d2) order — a pure order statistic with no
    * interpolation, so no float averaging can drift. Rounded at 6 for
    * display only.
    *
    * Scale shape: the corpus-scale work is ONE partial-agg groupBy to the
    * (type, day) frame — bounded by the calendar horizon times the type
    * count, NOT the corpus (the q315/q319 argument). The pair self-join
    * and the rank window both run on that bounded frame (≤ days²/2 rows
    * per type at any corpus size), keyed by event_type.
    */
  val q373TheilSen = GraftQuery(
    "q373_theil_sen",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      val a = daily.select(col("event_type"), col("d").as("d1"), col("c").as("c1"))
      val b = daily.select(col("event_type"), col("d").as("d2"), col("c").as("c2"))
      val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
        .select(col("event_type"), col("d1"), col("d2"),
          (col("c2") - col("c1")).as("dc"),
          datediff(col("d2"), col("d1")).cast("long").as("dd"))
        .withColumn("slope", col("dc").cast("double") / col("dd").cast("double"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("slope", "d1", "d2")
      val ranked = pairs.withColumn("rn", row_number().over(w))
      val stats = pairs.groupBy("event_type").agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("dc") > 0, 1L).when(col("dc") < 0, -1L).otherwise(0L))
          .as("mk_s"))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      stats
        .join(ranked.withColumnRenamed("event_type", "et"),
          col("event_type") === col("et") &&
            col("rn") === expr("(n_pairs + 1) div 2"))
        .join(nd, "event_type")
        .select(col("event_type"), col("n_days"), col("n_pairs"), col("mk_s"),
          round(col("slope"), 6).as("ts_slope"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS d,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |pairs AS (
           |  SELECT a.event_type, a.d AS d1, b.d AS d2,
           |    b.c - a.c AS dc,
           |    CAST(date_diff('day', a.d, b.d) AS BIGINT) AS dd
           |  FROM daily a JOIN daily b
           |    ON a.event_type = b.event_type AND a.d < b.d),
           |sl AS (
           |  SELECT event_type, d1, d2, dc,
           |    CAST(dc AS DOUBLE) / CAST(dd AS DOUBLE) AS slope
           |  FROM pairs),
           |ranked AS (
           |  SELECT event_type, slope, row_number() OVER (
           |    PARTITION BY event_type ORDER BY slope, d1, d2) AS rn
           |  FROM sl),
           |st AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           |    CAST(sum(CASE WHEN dc > 0 THEN 1 WHEN dc < 0 THEN -1
           |      ELSE 0 END) AS BIGINT) AS mk_s
           |  FROM sl GROUP BY 1),
           |nd AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           |  FROM daily GROUP BY 1)
           |SELECT st.event_type, nd.n_days, st.n_pairs, st.mk_s,
           |  round(r.slope, 6) AS ts_slope
           |FROM st
           |JOIN ranked r ON r.event_type = st.event_type
           |  AND r.rn = (st.n_pairs + 1) // 2
           |JOIN nd ON nd.event_type = st.event_type
           |ORDER BY st.event_type""".stripMargin))

  /** Kendall's tau-b between daily order volume and daily revenue — the
    * tie-corrected CONCORDANCE coefficient (Kendall 1945), completing the
    * rank-association pair with q363's Spearman: Spearman squares rank
    * gaps, tau counts pair inversions, and the two disagree exactly when
    * association is non-uniform across the range. Ties (equal volumes or
    * equal revenues on two days) are handled by the tau-b denominator
    * √((n₀−n₁)(n₀−n₂)).
    *
    * Exactness: revenue accumulates as exact integer cents (round-per-row
    * BIGINT); concordant/discordant/tied pair counts are exact BIGINTs
    * from sign tests; tau-b is ONE final expression — IEEE sqrt is
    * correctly rounded in both engines, so even the float step is
    * bit-identical. Rounded at 6.
    *
    * Scale shape: corpus-scale work is one partial-agg groupBy to the
    * daily frame, bounded by the ~2,400-day TPC-H calendar at ANY corpus
    * size; the pair self-join runs on that bounded frame (≤ 2.9M pairs,
    * constant), one partial agg folds it to six numbers.
    */
  val q380KendallTau = GraftQuery(
    "q380_kendall_tau",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("d"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy("d")
        .agg(count(lit(1)).as("x"), sum("cents").as("y"))
      val a = daily.select(col("d").as("d1"), col("x").as("x1"), col("y").as("y1"))
      val b = daily.select(col("d").as("d2"), col("x").as("x2"), col("y").as("y2"))
      // daily is aggregate-reduced to the bounded calendar domain, so the
      // broadcast hint is scale-safe and pins BroadcastNestedLoopJoin over
      // a shuffle CartesianProduct for the non-equi pair condition
      val agg = a.join(broadcast(b), col("d1") < col("d2"))
        .select(
          ((col("x2") - col("x1")) > 0 && (col("y2") - col("y1")) > 0 ||
            (col("x2") - col("x1")) < 0 && (col("y2") - col("y1")) < 0)
            .cast("long").as("conc"),
          ((col("x2") - col("x1")) > 0 && (col("y2") - col("y1")) < 0 ||
            (col("x2") - col("x1")) < 0 && (col("y2") - col("y1")) > 0)
            .cast("long").as("disc"),
          (col("x1") === col("x2")).cast("long").as("tx"),
          (col("y1") === col("y2")).cast("long").as("ty"))
        .agg(sum("conc").as("nc"), sum("disc").as("nd"),
          sum("tx").as("ties_x"), sum("ty").as("ties_y"),
          count(lit(1)).as("n0"))
      val nDays = daily.agg(count(lit(1)).as("n_days"))
      nDays.crossJoin(broadcast(agg))
        .select(col("n_days"), col("nc"), col("nd"),
          col("ties_x"), col("ties_y"),
          round((col("nc") - col("nd")).cast("double") /
            sqrt(((col("n0") - col("ties_x")) *
              (col("n0") - col("ties_y"))).cast("double")), 6).as("tau_b"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS d,
           |    CAST(count(*) AS BIGINT) AS x,
           |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |      AS y
           |  FROM orders GROUP BY 1),
           |p AS (
           |  SELECT
           |    CAST(sum(CASE WHEN (b.x - a.x) > 0 AND (b.y - a.y) > 0
           |        OR (b.x - a.x) < 0 AND (b.y - a.y) < 0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
           |    CAST(sum(CASE WHEN (b.x - a.x) > 0 AND (b.y - a.y) < 0
           |        OR (b.x - a.x) < 0 AND (b.y - a.y) > 0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS nd,
           |    CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ties_x,
           |    CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ties_y,
           |    CAST(count(*) AS BIGINT) AS n0
           |  FROM daily a JOIN daily b ON a.d < b.d),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
           |SELECT nn.n_days, p.nc, p.nd, p.ties_x, p.ties_y,
           |  round(CAST(p.nc - p.nd AS DOUBLE) /
           |    sqrt(CAST((p.n0 - p.ties_x) * (p.n0 - p.ties_y) AS DOUBLE)), 6)
           |    AS tau_b
           |FROM nn, p""".stripMargin))

  /** Difference-in-differences over purchase values — the two-period,
    * two-group causal estimate (Card & Krueger 1994 form): arms are
    * md5-parity on user_id (the q247 deterministic split), periods split
    * the OBSERVED event horizon at its midpoint (computed from the data,
    * so derived corpora with shifted calendars split identically), and
    * the estimate is (T,post − T,pre) − (C,post − C,pre) of mean purchase
    * cents. Under randomized arms the true effect is ~0 — the query is
    * the placebo audit an experimentation platform runs to validate its
    * DiD plumbing before pointing it at a real rollout.
    *
    * Exactness: purchase values accumulate as exact integer cents per
    * cell; the four means and the DiD are per-row math on eight exact
    * integers, rounded at 6.
    *
    * Scale shape: one scan → four-cell conditional partial agg; the
    * horizon midpoint comes from a broadcast single-row min/max agg.
    */
  val q381DiffInDiffs = GraftQuery(
    "q381_diff_in_diffs",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
        .select(to_date(col("ts")).as("d"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).as("arm"))
      val span = ev.agg(min("d").as("d_lo"), max("d").as("d_hi"))
        .select(date_add(col("d_lo"),
          (datediff(col("d_hi"), col("d_lo")) / 2).cast("int") + 1)
          .as("d_post"))
      val cells = ev.crossJoin(broadcast(span))
        .withColumn("post", (col("d") >= col("d_post")).cast("int"))
        .groupBy("arm", "post")
        .agg(count(lit(1)).as("n"), sum("cents").as("cs"))
      def cell(a: Int, p: Int, c: String, as: String) =
        first(when(col("arm") === a && col("post") === p, col(c)), true).as(as)
      cells.agg(
        cell(1, 0, "n", "n_t_pre"), cell(1, 1, "n", "n_t_post"),
        cell(0, 0, "n", "n_c_pre"), cell(0, 1, "n", "n_c_post"),
        cell(1, 0, "cs", "s_t_pre"), cell(1, 1, "cs", "s_t_post"),
        cell(0, 0, "cs", "s_c_pre"), cell(0, 1, "cs", "s_c_post"))
        .select(
          col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
          round(col("s_t_pre").cast("double") / col("n_t_pre"), 6)
            .as("mean_t_pre"),
          round(col("s_t_post").cast("double") / col("n_t_post"), 6)
            .as("mean_t_post"),
          round(col("s_c_pre").cast("double") / col("n_c_pre"), 6)
            .as("mean_c_pre"),
          round(col("s_c_post").cast("double") / col("n_c_post"), 6)
            .as("mean_c_post"),
          round((col("s_t_post").cast("double") / col("n_t_post") -
            col("s_t_pre").cast("double") / col("n_t_pre")) -
            (col("s_c_post").cast("double") / col("n_c_post") -
              col("s_c_pre").cast("double") / col("n_c_pre")), 6).as("did"))
    },
    Some("""WITH ev AS (
           |  SELECT CAST(ts AS DATE) AS d,
           |    CAST(round(value * 100) AS BIGINT) AS cents,
           |    CAST(concat('0x', substr(md5(user_id::VARCHAR), 1, 8))
           |      AS BIGINT) % 2 AS arm
           |  FROM events WHERE event_type = 'purchase'),
           |span AS (
           |  SELECT min(d) + CAST(
           |      date_diff('day', min(d), max(d)) // 2 + 1 AS INT) AS d_post
           |  FROM ev),
           |cells AS (
           |  SELECT arm, CASE WHEN d >= (SELECT d_post FROM span)
           |      THEN 1 ELSE 0 END AS post,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(cents) AS BIGINT) AS cs
           |  FROM ev GROUP BY 1, 2),
           |f AS (
           |  SELECT
           |    max(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n_t_pre,
           |    max(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n_t_post,
           |    max(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n_c_pre,
           |    max(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n_c_post,
           |    max(CASE WHEN arm = 1 AND post = 0 THEN cs END) AS s_t_pre,
           |    max(CASE WHEN arm = 1 AND post = 1 THEN cs END) AS s_t_post,
           |    max(CASE WHEN arm = 0 AND post = 0 THEN cs END) AS s_c_pre,
           |    max(CASE WHEN arm = 0 AND post = 1 THEN cs END) AS s_c_post
           |  FROM cells)
           |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           |  round(CAST(s_t_pre AS DOUBLE) / n_t_pre, 6) AS mean_t_pre,
           |  round(CAST(s_t_post AS DOUBLE) / n_t_post, 6) AS mean_t_post,
           |  round(CAST(s_c_pre AS DOUBLE) / n_c_pre, 6) AS mean_c_pre,
           |  round(CAST(s_c_post AS DOUBLE) / n_c_post, 6) AS mean_c_post,
           |  round((CAST(s_t_post AS DOUBLE) / n_t_post
           |    - CAST(s_t_pre AS DOUBLE) / n_t_pre)
           |    - (CAST(s_c_post AS DOUBLE) / n_c_post
           |    - CAST(s_c_pre AS DOUBLE) / n_c_pre), 6) AS did
           |FROM f""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q373TheilSen, q380KendallTau, q381DiffInDiffs)
}
