package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-13 forecasting closure: classical seasonal decomposition (q400,
  * the STL-shaped trend/seasonal/residual split of Cleveland et al.,
  * computed with moving-average trend and day-of-week seasonal means) and
  * additive Holt-Winters triple exponential smoothing (q401, Winters
  * 1960) — the two standard answers to "this series has a weekly cycle"
  * that q207's trend-only Holt and q231's profile screen stop short of.
  */
object Ts13 {

  /** q400 — classical seasonal decomposition of daily event volumes:
    * trend = centered 7-day moving average (full windows only — edge
    * days are excluded rather than padded, documented), seasonal =
    * day-of-week mean of the detrended series, residual = the rest, with
    * a 2σ residual anomaly flag.
    *
    * Integer-exact construction: x is an exact count; the trend window
    * keeps (Σ₇x, 7) so detrended_scaled = 7x − Σ₇x is a pure BIGINT; the
    * seasonal mean keeps (Σ detr7, cnt) so the residual numerator
    * detr7·cnt − Σdetr7 is BIGINT too — every displayed double is ONE
    * division of exact integers (round 4), and the anomaly σ comes from
    * milli-integer residuals (round once to 10⁻³, then exact BIGINT
    * sum-of-squares — the q388 discipline; milli not micro keeps the
    * squares inside BIGINT up to ~4·10⁹-count days), so the flag is
    * order-free.
    *
    * Scale shape: one corpus scan → the calendar-bounded (type, day)
    * frame; the moving window, day-of-week agg, and σ agg all run on
    * that ≤|types|·31-row frame (windows partitioned by type).
    */
  val q400SeasonalDecompose = GraftQuery(
    "q400_seasonal_decompose",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("dow", dayofweek(col("day")).cast("long"))
        .localCheckpoint() // ≤ |types| × |calendar days| rows
      val w7 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-3, 3)
      val trended = daily
        .withColumn("s7", sum("x").over(w7))
        .withColumn("c7", count(lit(1)).over(w7))
        .filter(col("c7") === 7)
        .withColumn("detr7", lit(7L) * col("x") - col("s7"))
      val seas = trended.groupBy(col("event_type").as("se"), col("dow")
        .as("sd"))
        .agg(sum("detr7").as("sdetr"), count(lit(1)).as("cnt"))
      val resid = trended.join(broadcast(seas),
        col("event_type") === col("se") && col("dow") === col("sd"))
        .withColumn("resid_num",
          col("detr7") * col("cnt") - col("sdetr"))
        .withColumn("resid",
          col("resid_num").cast("double") /
            (lit(7.0) * col("cnt").cast("double")))
        .withColumn("resid_milli",
          round(col("resid") * lit(1e3), 0).cast("long"))
      val sig = resid.groupBy(col("event_type").as("ve"))
        .agg(sum(col("resid_milli") * col("resid_milli")).as("ss"),
          count(lit(1)).as("nv"))
      resid.join(broadcast(sig), col("event_type") === col("ve"))
        .select(col("event_type"),
          col("day").cast("string").as("day"), col("x"),
          round(col("s7").cast("double") / lit(7.0), 4).as("trend"),
          round(col("sdetr").cast("double") /
            (lit(7.0) * col("cnt").cast("double")), 4).as("seasonal"),
          round(col("resid"), 4).as("residual"),
          (abs(col("resid_milli").cast("double")) >
            lit(2.0) * sqrt(col("ss").cast("double") /
              (col("nv") - 1).cast("double"))).cast("int").as("anom"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS MATERIALIZED (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS x,
           |    CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow
           |  FROM events GROUP BY 1, 2, 4),
           |tr AS (
           |  SELECT event_type, day, x, dow,
           |    sum(x) OVER (PARTITION BY event_type ORDER BY day
           |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
           |    count(*) OVER (PARTITION BY event_type ORDER BY day
           |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
           |  FROM daily),
           |td AS (
           |  SELECT event_type, day, x, dow, s7,
           |    7 * x - s7 AS detr7
           |  FROM tr WHERE c7 = 7),
           |seas AS (
           |  SELECT event_type AS se, dow AS sd,
           |    CAST(sum(detr7) AS BIGINT) AS sdetr,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM td GROUP BY 1, 2),
           |res AS (
           |  SELECT td.event_type, td.day, td.x, td.s7, seas.sdetr,
           |    seas.cnt,
           |    CAST(td.detr7 * seas.cnt - seas.sdetr AS BIGINT)
           |      AS resid_num,
           |    CAST(td.detr7 * seas.cnt - seas.sdetr AS DOUBLE)
           |      / (7.0 * CAST(seas.cnt AS DOUBLE)) AS resid
           |  FROM td JOIN seas
           |    ON td.event_type = seas.se AND td.dow = seas.sd),
           |rm AS (
           |  SELECT *, CAST(round(resid * 1e3, 0) AS BIGINT)
           |    AS resid_milli
           |  FROM res),
           |sig AS (
           |  SELECT event_type AS ve,
           |    CAST(sum(resid_milli * resid_milli) AS BIGINT) AS ss,
           |    CAST(count(*) AS BIGINT) AS nv
           |  FROM rm GROUP BY 1)
           |SELECT rm.event_type, strftime(rm.day, '%Y-%m-%d') AS day,
           |  rm.x,
           |  round(CAST(rm.s7 AS DOUBLE) / 7.0, 4) AS trend,
           |  round(CAST(rm.sdetr AS DOUBLE)
           |    / (7.0 * CAST(rm.cnt AS DOUBLE)), 4) AS seasonal,
           |  round(rm.resid, 4) AS residual,
           |  CAST(abs(CAST(rm.resid_milli AS DOUBLE))
           |    > 2.0 * sqrt(CAST(sig.ss AS DOUBLE)
           |      / CAST(sig.nv - 1 AS DOUBLE)) AS INT) AS anom
           |FROM rm JOIN sig ON sig.ve = rm.event_type
           |ORDER BY rm.event_type, rm.day""".stripMargin))

  /** q401 — additive Holt-Winters (level + trend + 7-day season) with
    * BINARY-EXACT smoothing constants α = 1/2, β = γ = 1/4 — chosen so
    * every multiply is by an exactly-representable constant and the fold
    * is bit-identical cross-engine given identical operation order (the
    * q207 discipline extended to 9-double state). Initialization is the
    * standard two-cycle simple init: l₇ = mean(x₁..₇),
    * b₇ = (mean(x₈..₁₄) − mean(x₁..₇))/7, s_d = x_d − l₇ — all from
    * exact integer counts, fixed-order sums. The recurrence (t ≥ 8)
    *
    *   l' = ½(x − s_{t−7}) + ½(l + b)
    *   b' = ¼(l' − l) + ¾ b
    *   s_t = ¼(x − l') + ¾ s_{t−7}
    *
    * folds once per type over the day-ordered array (state = level,
    * trend, rolling 7-slot seasonal queue), while the oracle replays it
    * as a RECURSIVE CTE carrying (l, b, q1..q7) — the q169/q342
    * state-replay pattern. Output: per type, the final state and the
    * 7-day-ahead forecast vector f_h = l + h·b + s_{matching}, round 4.
    *
    * Scale shape: one corpus scan → per-type day arrays (calendar-
    * bounded), one fold per type. Types with fewer than 14 days are
    * dropped on BOTH sides (the q207 seed guard).
    */
  val q401HoltWinters = GraftQuery(
    "q401_holt_winters",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      val series = daily.groupBy("event_type")
        .agg(transform(sort_array(collect_list(struct(col("day"), col("x")))),
          e => e("x")).as("xs"))
        .filter(size(col("xs")) >= 14)
      def el(k: Int): Column = element_at(col("xs"), k)
      val m1 = (el(1) + el(2) + el(3) + el(4) + el(5) + el(6) + el(7)) /
        lit(7.0)
      val m2 = (el(8) + el(9) + el(10) + el(11) + el(12) + el(13) + el(14)) /
        lit(7.0)
      def hwStep(acc: Column, x: Column): Column = {
        val s7 = element_at(acc("q"), 1)
        val l2 = lit(0.5) * (x - s7) + lit(0.5) * (acc("l") + acc("b"))
        val b2 = lit(0.25) * (l2 - acc("l")) + lit(0.75) * acc("b")
        val snew = lit(0.25) * (x - l2) + lit(0.75) * s7
        struct(l2.as("l"), b2.as("b"),
          concat(slice(acc("q"), 2, 6), array(snew)).as("q"))
      }
      val fin = series
        .withColumn("m1", m1)
        .withColumn("fin", aggregate(
          slice(col("xs"), lit(8), size(col("xs")) - 7),
          struct(col("m1").as("l"),
            ((m2 - col("m1")) / lit(7.0)).as("b"),
            transform(sequence(lit(1), lit(7)),
              k => element_at(col("xs"), k) - col("m1")).as("q")),
          hwStep))
      def f(h: Int): Column =
        round(col("fin.l") + lit(h.toDouble) * col("fin.b") +
          element_at(col("fin.q"), h), 4).as(s"f$h")
      fin.select(col("event_type") +: size(col("xs")).as("n_points") +:
        round(col("fin.l"), 4).as("level") +:
        round(col("fin.b"), 4).as("trend") +:
        (1 to 7).map(f): _*)
        .orderBy("event_type")
    },
    Some("""WITH RECURSIVE daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS DOUBLE) AS x
           |  FROM events GROUP BY 1, 2),
           |idx AS (SELECT event_type, x,
           |    CAST(row_number() OVER (PARTITION BY event_type
           |      ORDER BY day) AS BIGINT) AS i
           |  FROM daily),
           |nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1
           |  HAVING max(i) >= 14),
           |piv AS (
           |  SELECT idx.event_type,
           |    max(CASE WHEN i = 1 THEN x END) AS x1,
           |    max(CASE WHEN i = 2 THEN x END) AS x2,
           |    max(CASE WHEN i = 3 THEN x END) AS x3,
           |    max(CASE WHEN i = 4 THEN x END) AS x4,
           |    max(CASE WHEN i = 5 THEN x END) AS x5,
           |    max(CASE WHEN i = 6 THEN x END) AS x6,
           |    max(CASE WHEN i = 7 THEN x END) AS x7,
           |    max(CASE WHEN i = 8 THEN x END) AS x8,
           |    max(CASE WHEN i = 9 THEN x END) AS x9,
           |    max(CASE WHEN i = 10 THEN x END) AS x10,
           |    max(CASE WHEN i = 11 THEN x END) AS x11,
           |    max(CASE WHEN i = 12 THEN x END) AS x12,
           |    max(CASE WHEN i = 13 THEN x END) AS x13,
           |    max(CASE WHEN i = 14 THEN x END) AS x14
           |  FROM idx JOIN nn ON nn.event_type = idx.event_type
           |  GROUP BY 1),
           |rec(event_type, i, l, b, q1, q2, q3, q4, q5, q6, q7) AS (
           |  SELECT event_type, CAST(7 AS BIGINT),
           |    (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    ((x8 + x9 + x10 + x11 + x12 + x13 + x14) / 7.0
           |      - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0) / 7.0,
           |    x1 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    x2 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    x3 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    x4 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    x5 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    x6 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0,
           |    x7 - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0
           |  FROM piv
           |  UNION ALL
           |  SELECT r.event_type, r.i + 1,
           |    0.5 * (x.x - r.q1) + 0.5 * (r.l + r.b),
           |    0.25 * ((0.5 * (x.x - r.q1) + 0.5 * (r.l + r.b)) - r.l)
           |      + 0.75 * r.b,
           |    r.q2, r.q3, r.q4, r.q5, r.q6, r.q7,
           |    0.25 * (x.x - (0.5 * (x.x - r.q1) + 0.5 * (r.l + r.b)))
           |      + 0.75 * r.q1
           |  FROM rec r JOIN idx x ON x.event_type = r.event_type
           |    AND x.i = r.i + 1)
           |SELECT r.event_type, nn.n AS n_points,
           |  round(r.l, 4) AS level, round(r.b, 4) AS trend,
           |  round(r.l + 1.0 * r.b + r.q1, 4) AS f1,
           |  round(r.l + 2.0 * r.b + r.q2, 4) AS f2,
           |  round(r.l + 3.0 * r.b + r.q3, 4) AS f3,
           |  round(r.l + 4.0 * r.b + r.q4, 4) AS f4,
           |  round(r.l + 5.0 * r.b + r.q5, 4) AS f5,
           |  round(r.l + 6.0 * r.b + r.q6, 4) AS f6,
           |  round(r.l + 7.0 * r.b + r.q7, 4) AS f7
           |FROM rec r JOIN nn ON nn.event_type = r.event_type
           |  AND r.i = nn.n
           |ORDER BY r.event_type""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q400SeasonalDecompose, q401HoltWinters)
}
