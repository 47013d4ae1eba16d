package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q395 — Nelson-Aalen cumulative-hazard estimator (Nelson 1972; Aalen
  * 1978) over the SAME lifetime frame as q325's Kaplan-Meier: per-day
  * risk sets and deaths from two partial aggs, then
  *
  *   H(t) = Σ_{d ≤ t} n_death_d / n_risk_d
  *
  * with the Fleming-Harrington survival S_FH = exp(−H) (the KM
  * alternative that is better-behaved in small risk sets) and the
  * variance accumulator Σ d/(n·(n−d)) (the hazard-scale Greenwood
  * analogue; its d = n term is undefined and skipped with an explicit
  * guard in BOTH engine texts — the q325 log(0) discipline applied to a
  * division). Reporting both estimators next to each other (km from the
  * same frame) is the standard survival-audit table.
  *
  * Determinism: risk sets and deaths are exact integers; each day's
  * hazard increment is ONE double division from them, and the cumulative
  * sums run over the SAME deterministic day order in both engines (the
  * q325 convention), rounded at 6.
  *
  * Scale shape: identical to q325 — two corpus partial aggs, then every
  * window runs on the calendar-bounded day table (whitelisted with that
  * bound).
  */
object Survival13 {

  val q395NelsonAalen = GraftQuery(
    "q395_nelson_aalen",
    (s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("f"),
          max(unix_micros(col("ts"))).as("l"),
          max(when(col("event_type") === "error", unix_micros(col("ts"))))
            .as("le"))
        .select(expr("(l - f) div 86400000000").as("day"),
          when(col("le") === col("l"), 1L).otherwise(0L).as("death"))
      val perDay = perUser.groupBy("day")
        .agg(sum("death").as("n_death"),
          sum(lit(1L) - col("death")).as("n_censored"))
      val totalUsers = perUser.agg(count(lit(1)).as("tu"))
      val byDay = Window.orderBy("day")
      val prior = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      perDay.crossJoin(broadcast(totalUsers))
        .withColumn("n_risk", col("tu") -
          coalesce(sum(col("n_death") + col("n_censored")).over(prior),
            lit(0L)))
        .withColumn("haz",
          col("n_death").cast("double") / col("n_risk").cast("double"))
        .withColumn("vterm",
          when(col("n_risk") > col("n_death"),
            col("n_death").cast("double") /
              (col("n_risk").cast("double") *
                (col("n_risk") - col("n_death")).cast("double"))))
        .select(col("day"), col("n_risk"), col("n_death"), col("n_censored"),
          round(sum("haz").over(byDay), 6).as("na_cumhaz"),
          round(exp(-sum("haz").over(byDay)), 6).as("s_fh"),
          round(coalesce(sum("vterm").over(byDay), lit(0.0)), 6)
            .as("na_var"))
        .orderBy("day")
    },
    Some("""WITH per_user AS (
           |  SELECT (max(epoch_us(CAST(ts AS TIMESTAMP))) -
           |          min(epoch_us(CAST(ts AS TIMESTAMP)))) // 86400000000
           |      AS day,
           |    CASE WHEN max(CASE WHEN event_type = 'error'
           |            THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
           |          = max(epoch_us(CAST(ts AS TIMESTAMP)))
           |         THEN 1 ELSE 0 END AS death
           |  FROM events GROUP BY user_id),
           |per_day AS (
           |  SELECT day, CAST(sum(death) AS BIGINT) AS n_death,
           |    CAST(sum(1 - death) AS BIGINT) AS n_censored
           |  FROM per_user GROUP BY 1),
           |tu AS (SELECT CAST(count(*) AS BIGINT) AS tu FROM per_user),
           |risk AS (
           |  SELECT day, n_death, n_censored,
           |    CAST(tu - coalesce(sum(n_death + n_censored) OVER (
           |      ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS n_risk
           |  FROM per_day, tu),
           |h AS (
           |  SELECT day, n_risk, n_death, n_censored,
           |    CAST(n_death AS DOUBLE) / CAST(n_risk AS DOUBLE) AS haz,
           |    CASE WHEN n_risk > n_death
           |      THEN CAST(n_death AS DOUBLE) / (CAST(n_risk AS DOUBLE)
           |        * CAST(n_risk - n_death AS DOUBLE)) END AS vterm
           |  FROM risk)
           |SELECT day, n_risk, n_death, n_censored,
           |  round(sum(haz) OVER (ORDER BY day), 6) AS na_cumhaz,
           |  round(exp(-sum(haz) OVER (ORDER BY day)), 6) AS s_fh,
           |  round(coalesce(sum(vterm) OVER (ORDER BY day), 0.0), 6)
           |    AS na_var
           |FROM h ORDER BY day""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q395NelsonAalen)
}
