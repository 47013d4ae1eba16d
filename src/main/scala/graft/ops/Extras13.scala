package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q377/q379/q382 — round-13 operations additions: time-weighted
  * averaging (the interval-weighted mean irregular event streams need
  * where the plain mean misleads), Krippendorff's alpha (multi-rater
  * agreement WITH missing ratings — where q361's Cohen kappa stops), and
  * an existential event-sequence match with per-step time constraints
  * (ClickHouse `sequenceMatch` semantics — a different operator from
  * q219's first-touch funnel).
  */
object Extras13 {

  /** Time-weighted average (TWAP) of the purchase-value step function per
    * event type — the interval-weighted mean every monitoring / pricing
    * system reads where the PLAIN mean is wrong (a value that held for an
    * hour must weigh 3600× one that held a second; irregular event
    * spacing makes the two diverge). Semantics: within each (type, day),
    * each event's value holds until the next same-type event of that day,
    * the day's last value holds to midnight, and the observation window
    * starts at the day's first event — the standard daily-TWAP clipping,
    * so no cross-day hold chains exist and every window stays
    * (type, day)-keyed. (An earlier draft of this slot duplicated q187's
    * cumulative-fill compaction grouping and was replaced pre-release.)
    *
    * Exactness: integer cents × integer seconds accumulate in
    * DECIMAL(38,0)/HUGEINT (the q356 overflow discipline: per-row terms
    * reach cents·86400 ≈ 10¹⁰, so BIGINT sums wrap near 10⁹ rows — both
    * engines raise or stay exact instead of silently diverging); the
    * second-granularity Δt uses floor-difference ≡ boundary-crossing
    * counts (identical in both engines); ONE float division at the edge,
    * rounded 6. The plain mean is reported beside it — the TWAP−mean gap
    * is the irregular-spacing signal itself.
    *
    * Scale shape: one lead() window keyed by (type, day) — partition
    * sizes are per-day event counts, never corpus-sized — then a partial
    * agg to the calendar-bounded daily frame and a partial agg to ≤5
    * type rows.
    */
  val q377TimeWeightedAvg = GraftQuery(
    "q377_time_weighted_avg",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("ts"),
          to_date(col("ts")).as("d"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type", "d").orderBy("ts", "event_id")
      val seg = ev
        .withColumn("next_ts", lead("ts", 1).over(w))
        .withColumn("dt",
          when(col("next_ts").isNotNull,
            unix_timestamp(col("next_ts")) - unix_timestamp(col("ts")))
            .otherwise(
              unix_timestamp(date_add(col("d"), 1).cast("timestamp")) -
                unix_timestamp(col("ts"))))
      seg.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("dt").as("obs_seconds"),
          sum((col("cents") * col("dt")).cast("decimal(38,0)")).as("num"),
          sum("cents").as("cs"))
        .select(col("event_type"), col("n_events"), col("obs_seconds"),
          round(col("num").cast("double") /
            col("obs_seconds").cast("double"), 6).as("twap_cents"),
          round(col("cs").cast("double") /
            col("n_events").cast("double"), 6).as("mean_cents"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, event_id, ts, CAST(ts AS DATE) AS d,
           |    CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events),
           |seg AS (
           |  SELECT event_type, cents,
           |    CAST(coalesce(
           |      date_diff('second', ts, lead(ts) OVER (
           |        PARTITION BY event_type, d ORDER BY ts, event_id)),
           |      date_diff('second', ts,
           |        CAST(d + INTERVAL 1 DAY AS TIMESTAMP))) AS BIGINT)
           |      AS dt
           |  FROM ev)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(sum(dt) AS BIGINT) AS obs_seconds,
           |  round(CAST(sum(CAST(cents AS HUGEINT) * dt) AS DOUBLE) /
           |    CAST(sum(dt) AS DOUBLE), 6) AS twap_cents,
           |  round(CAST(sum(cents) AS DOUBLE) /
           |    CAST(count(*) AS DOUBLE), 6) AS mean_cents
           |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Krippendorff's alpha (nominal) over a three-rater annotation pass
    * with missingness — the agreement coefficient that generalizes q361's
    * two-rater Cohen kappa to R raters and INCOMPLETE data (Krippendorff
    * 2004): units with fewer than two ratings drop out, and each pairable
    * unit contributes its rating pairs weighted by 1/(m_u − 1).
    *
    * Raters derive deterministically from the document language so both
    * engines annotate identically: rater a flips every 7th doc to the
    * planted noise label, rater b flips every 5th, rater c SKIPS every
    * 4th doc (the missingness) and flips every 11th — so the coincidence
    * matrix has real off-diagonal mass and real m_u ∈ {2, 3} variation.
    *
    * Exactness: with m_u ∈ {2, 3}, each unit's disagreement mass
    * 2·(m_u² − Σ_c m_uc²)/(m_u − 1) is an exact integer (the ×2 scaling
    * clears the only possible half), coincidence marginals n_c are plain
    * rating counts, and α = 1 − D₂(n−1) / (2(n² − Σn_c²)) is ONE float
    * division of exact BIGINTs, rounded at 6.
    *
    * Scale shape: one scan fans out to ≤3 rating rows per doc, a
    * (doc, label) partial agg bounds per-unit state, and the label
    * marginal frame is bounded by the label domain — no pair join ever
    * materializes (the per-unit pair mass is closed-form from counts).
    */
  val q379KrippendorffAlpha = GraftQuery(
    "q379_krippendorff_alpha",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val ra = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit("xx"))
          .otherwise(col("lang")).as("label"))
      val rb = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("xx"))
          .otherwise(col("lang")).as("label"))
      val rc = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(11)) === 0, lit("xx"))
            .otherwise(col("lang")).as("label"))
      val ratings = ra.unionAll(rb).unionAll(rc)
      val unitLabel = ratings.groupBy("doc_id", "label")
        .agg(count(lit(1)).as("muc"))
      val units = unitLabel.groupBy("doc_id")
        .agg(sum("muc").as("mu"), sum(col("muc") * col("muc")).as("sq"))
        .filter(col("mu") >= 2)
        .select(col("mu"),
          expr("(2 * (mu * mu - sq)) div (mu - 1)").as("d2u"))
      val tot = units.agg(sum("mu").as("n"), sum("d2u").as("d2"),
        count(lit(1)).as("n_units"))
      // coincidence marginals: plain rating counts over pairable units
      val pairable = unitLabel.groupBy("doc_id").agg(sum("muc").as("mu"))
        .filter(col("mu") >= 2).select("doc_id")
      val margCnt = ratings.join(pairable, Seq("doc_id"), "left_semi")
        .groupBy("label").agg(count(lit(1)).as("nc"))
        .agg(sum(col("nc") * col("nc")).as("sq_nc"),
          count(lit(1)).as("n_labels"))
      tot.crossJoin(broadcast(margCnt))
        .select(col("n_units"), col("n"), col("n_labels"), col("d2"),
          round(lit(1.0) -
            (col("d2") * (col("n") - 1)).cast("double") /
              (lit(2.0) * (col("n") * col("n") - col("sq_nc")).cast("double")),
            6).as("alpha"))
    },
    Some("""WITH ra AS (
           |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END
           |    AS label FROM documents),
           |rb AS (
           |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END
           |    AS label FROM documents),
           |rc AS (
           |  SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END
           |    AS label FROM documents WHERE doc_id % 4 <> 0),
           |ratings AS (
           |  SELECT * FROM ra UNION ALL SELECT * FROM rb
           |  UNION ALL SELECT * FROM rc),
           |ul AS (
           |  SELECT doc_id, label, CAST(count(*) AS BIGINT) AS muc
           |  FROM ratings GROUP BY 1, 2),
           |units AS (
           |  SELECT doc_id, sum(muc) AS mu, sum(muc * muc) AS sq
           |  FROM ul GROUP BY 1 HAVING sum(muc) >= 2),
           |tot AS (
           |  SELECT CAST(sum(mu) AS BIGINT) AS n,
           |    CAST(sum(2 * (mu * mu - sq) // (mu - 1)) AS BIGINT) AS d2,
           |    CAST(count(*) AS BIGINT) AS n_units
           |  FROM units),
           |marg AS (
           |  SELECT r.label, CAST(count(*) AS BIGINT) AS nc
           |  FROM ratings r JOIN units u ON u.doc_id = r.doc_id
           |  GROUP BY 1),
           |mt AS (
           |  SELECT CAST(sum(nc * nc) AS BIGINT) AS sq_nc,
           |    CAST(count(*) AS BIGINT) AS n_labels
           |  FROM marg)
           |SELECT tot.n_units, tot.n, mt.n_labels, tot.d2,
           |  round(1.0 - CAST(tot.d2 * (tot.n - 1) AS DOUBLE) /
           |    (2.0 * CAST(tot.n * tot.n - mt.sq_nc AS DOUBLE)), 6) AS alpha
           |FROM tot, mt""".stripMargin))

  /** Existential event-sequence match with per-step time constraints —
    * ClickHouse `sequenceMatch('(?1)(?t<=W)(?2).*(?3)')` semantics: a
    * user matches when SOME signup is followed by SOME click within the
    * window, and that click is later followed by SOME purchase. This is
    * the existential-chain operator, distinct from q219's funnel (which
    * anchors every step to the FIRST signup): a user whose first signup
    * went nowhere but whose second converted matches here and not there.
    *
    * The search is exact without enumerating chains: a user matches iff
    * min{click c banded to any signup} < max{purchase ts} — taking the
    * EARLIEST banded click maximizes the remaining purchase window, so
    * the existential collapses to two per-user extremes (both engines
    * compute the identical closed form). Two window widths (1 h, 24 h)
    * report how tempo-sensitive conversion is.
    *
    * Scale shape: the signup⋈click band is a user-keyed equi-join with
    * per-user bounded fan-out (the q154 interval-join discipline), then
    * everything folds to per-user min/max partial aggs; counts are exact
    * and the rate is one rounded division.
    */
  val q382SequenceMatch = GraftQuery(
    "q382_sequence_match",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(max("ts").as("max_p"))
      val totals = ev.select("user_id").distinct()
        .agg(count(lit(1)).as("n_users_total"))
      def matched(windowHours: Int) = {
        val banded = signups.join(clicks, "user_id")
          .filter(col("c_ts") > col("s_ts") &&
            col("c_ts") <= col("s_ts") + expr(s"INTERVAL $windowHours HOURS"))
          .groupBy("user_id").agg(min("c_ts").as("min_c"))
        banded.join(purchases, "user_id")
          .filter(col("max_p") > col("min_c"))
          .agg(count(lit(1)).as("n_matched"))
          .select(lit(windowHours).as("window_hours"), col("n_matched"))
      }
      matched(1).unionAll(matched(24))
        .crossJoin(broadcast(totals))
        .select(col("window_hours"), col("n_matched"), col("n_users_total"),
          round(col("n_matched").cast("double") /
            col("n_users_total").cast("double"), 6).as("match_rate"))
        .orderBy("window_hours")
    },
    Some("""WITH su AS (
           |  SELECT user_id, ts AS s_ts FROM events
           |  WHERE event_type = 'signup'),
           |cl AS (
           |  SELECT user_id, ts AS c_ts FROM events
           |  WHERE event_type = 'click'),
           |pu AS (
           |  SELECT user_id, max(ts) AS max_p FROM events
           |  WHERE event_type = 'purchase' GROUP BY 1),
           |tot AS (
           |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_total
           |  FROM events),
           |m1 AS (
           |  SELECT 1 AS window_hours, CAST(count(*) AS BIGINT) AS n_matched
           |  FROM (
           |    SELECT su.user_id, min(cl.c_ts) AS min_c
           |    FROM su JOIN cl ON cl.user_id = su.user_id
           |      AND cl.c_ts > su.s_ts
           |      AND cl.c_ts <= su.s_ts + INTERVAL 1 HOUR
           |    GROUP BY 1) b
           |  JOIN pu ON pu.user_id = b.user_id AND pu.max_p > b.min_c),
           |m24 AS (
           |  SELECT 24 AS window_hours, CAST(count(*) AS BIGINT) AS n_matched
           |  FROM (
           |    SELECT su.user_id, min(cl.c_ts) AS min_c
           |    FROM su JOIN cl ON cl.user_id = su.user_id
           |      AND cl.c_ts > su.s_ts
           |      AND cl.c_ts <= su.s_ts + INTERVAL 24 HOUR
           |    GROUP BY 1) b
           |  JOIN pu ON pu.user_id = b.user_id AND pu.max_p > b.min_c),
           |m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m24)
           |SELECT m.window_hours, m.n_matched, tot.n_users_total,
           |  round(CAST(m.n_matched AS DOUBLE) /
           |    CAST(tot.n_users_total AS DOUBLE), 6) AS match_rate
           |FROM m, tot ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q377TimeWeightedAvg, q379KrippendorffAlpha, q382SequenceMatch)
}
