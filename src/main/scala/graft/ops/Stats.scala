package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Statistical / analytical surface: pivot, exact percentiles, moment
  * aggregates, and the long tail of window functions.
  */
object Stats {

  /** Pivot on order status (explicit value list keeps the schema static —
    * the scale-safe form; dynamic pivots need a collect of distinct values).
    */
  val q42Pivot = GraftQuery(
    "q42_pivot",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Exact percentiles (linear interpolation — identical definition to
    * DuckDB's quantile_cont).
    */
  val q43Percentiles = GraftQuery(
    "q43_percentiles",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Moment aggregates: stddev / correlation / covariance. Rounded to 3
    * digits — the engines accumulate moments in different orders/algorithms,
    * so the 6th decimal is not cross-engine stable (see ADVICE r01).
    */
  val q44Moments = GraftQuery(
    "q44_moments",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 3).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 3).as("corr_qty_price"),
          round(covar_samp(col("l_discount"), col("l_tax")), 3).as("cov_disc_tax"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(stddev_samp(l_quantity), 3) AS sd_qty,
           |  round(corr(l_quantity, l_extendedprice), 3) AS corr_qty_price,
           |  round(covar_samp(l_discount, l_tax), 3) AS cov_disc_tax
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Window-function long tail: ntile, percent_rank, cume_dist,
    * first_value, nth_value — all under a uniquely-keyed ordering.
    */
  val q45WindowExtras = GraftQuery(
    "q45_window_extras",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("first_price", first_value(col("o_totalprice")).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .select("o_custkey", "o_orderkey", "quartile", "pr", "cd",
          "first_price", "second_price")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  ntile(4) OVER w AS quartile,
           |  round(percent_rank() OVER w, 6) AS pr,
           |  round(cume_dist() OVER w, 6) AS cd,
           |  first_value(o_totalprice) OVER w AS first_price,
           |  nth_value(o_totalprice, 2) OVER w AS second_price
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Fixed-width histogram: 50-unit value bins (top bin open-ended), one
    * scan + partial agg — the constant-memory distribution profile used
    * before choosing outlier bounds.
    */
  val q66Histogram = GraftQuery(
    "q66_histogram",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("bin", least(lit(9L), floor(col("value") / 50).cast("long")))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("bin_value"))
        .orderBy("event_type", "bin"),
    Some("""SELECT event_type, least(9, CAST(floor(value / 50) AS BIGINT)) AS bin,
           |  count(*) AS n, round(sum(value), 2) AS bin_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Math-function surface: sqrt/pow/exp/ln/abs/mod/greatest/least through
    * aggregation. Transcendentals are IEEE-identical per element on both
    * engines; the rounded aggregates absorb accumulation-order noise.
    */
  val q75MathFuncs = GraftQuery(
    "q75_math_funcs",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(sum(sqrt(col("l_quantity"))), 4).as("sum_sqrt"),
          round(avg(pow(col("l_discount"), 2)), 6).as("avg_disc_sq"),
          round(avg(exp(col("l_tax"))), 6).as("avg_exp_tax"),
          round(avg(log(lit(1.0) + col("l_quantity"))), 6).as("avg_log_qty"),
          round(sum(abs(col("l_quantity") - 25)), 2).as("sum_absdev"),
          sum(col("l_quantity").cast("long") % 7).as("sum_mod"),
          round(max(greatest(col("l_discount"), col("l_tax"))), 2).as("max_rate"),
          round(min(least(col("l_discount"), col("l_tax"))), 2).as("min_rate"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(sum(sqrt(l_quantity)), 4) AS sum_sqrt,
           |  round(avg(pow(l_discount, 2)), 6) AS avg_disc_sq,
           |  round(avg(exp(l_tax)), 6) AS avg_exp_tax,
           |  round(avg(ln(1 + l_quantity)), 6) AS avg_log_qty,
           |  round(sum(abs(l_quantity - 25)), 2) AS sum_absdev,
           |  CAST(sum(CAST(l_quantity AS BIGINT) % 7) AS BIGINT) AS sum_mod,
           |  round(max(greatest(l_discount, l_tax)), 2) AS max_rate,
           |  round(min(least(l_discount, l_tax)), 2) AS min_rate
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Linear-regression aggregates (regr_*): slope/intercept/R²/count of
    * price-on-quantity per return flag — single-pass covariance-style
    * accumulation, so at 100 TB it's one scan + a 3-row partial agg. Rounded
    * to 3-4 digits: the regr_* outputs are ratios of co-moment sums whose
    * accumulation order varies with partitioning, so deep rounding (r2 at 6
    * was the round-1 drift class, see ADVICE r01) is not cross-engine safe.
    */
  val q87Regression = GraftQuery(
    "q87_regression",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 3).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           |  round(regr_r2(l_extendedprice, l_quantity), 3) AS r2,
           |  regr_count(l_extendedprice, l_quantity) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Distribution-shape aggregates: skewness / kurtosis / median / boolean
    * aggs per event type. Spark reports POPULATION skewness g1 and excess
    * kurtosis g2; DuckDB reports the bias-corrected SAMPLE statistics G1/G2,
    * so the oracle converts with the standard bias factors
    * g1 = G1·(n-2)/√(n(n-1)) and g2 = (G2·(n-2)(n-3)/(n-1) − 6)/(n+1)
    * (verified numerically to 1e-15 before adoption).
    */
  val q88DistShape = GraftQuery(
    "q88_dist_shape",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          round(skewness(col("value")), 3).as("skew"),
          round(kurtosis(col("value")), 3).as("kurt"),
          round(median(col("value")), 4).as("med"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          bool_or(col("value") > 99).as("any_high"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
           |  round(skewness(value) * (count(value) - 2)
           |    / sqrt(count(value) * (count(value) - 1.0)), 3) AS skew,
           |  round((kurtosis(value) * (count(value) - 2) * (count(value) - 3)
           |    / (count(value) - 1.0) - 6) / (count(value) + 1.0), 3) AS kurt,
           |  round(median(value), 4) AS med,
           |  bool_and(value >= 0) AS all_nonneg,
           |  bool_or(value > 99) AS any_high,
           |  count(*) AS n
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Bitwise aggregates over integer keys — exact in both engines (BIGINT
    * in, BIGINT out), order-independent, so no rounding discipline needed.
    */
  val q89Bitwise = GraftQuery(
    "q89_bitwise",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_linenumber")
        .agg(
          expr("bit_and(l_orderkey)").as("band"),
          expr("bit_or(l_orderkey)").as("bor"),
          expr("bit_xor(l_orderkey)").as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("l_linenumber"),
    Some("""SELECT l_linenumber, bit_and(l_orderkey) AS band,
           |  bit_or(l_orderkey) AS bor, bit_xor(l_orderkey) AS bxor,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q42Pivot, q43Percentiles, q44Moments, q45WindowExtras,
    q66Histogram, q75MathFuncs, q87Regression, q88DistShape, q89Bitwise)
}
