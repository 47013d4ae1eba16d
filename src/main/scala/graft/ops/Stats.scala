package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Moment aggregates: stddev / correlation / covariance, rebuilt from
    * EXACT integer sums. The builtin aggregates accumulate doubles in
    * partition order, so the last rounded digit can flip between engines and
    * between partitionings (the round-1/2 drift class — q44 hash-failed at 3
    * digits). Every input column is exact at 2 decimals in the fixtures, so
    * quantities/cents cast to DECIMAL(38,0) accumulate EXACTLY
    * (order-independent); both engines then evaluate the identical
    * closed-form text over identically-rounded doubles. The oracle mirrors
    * with BIGINT element products (HUGEINT accumulation) cast to DOUBLE.
    * One residual divergence remains after that: IEEE signed zero. A raw
    * value like -2.45e-07 rounds to -0.0 in DuckDB (sign-preserving
    * double round) but +0.0 in Spark (BigDecimal round has no signed
    * zero) — equal by ==, different by hash. `round(...) + 0` collapses
    * both to +0.0 (IEEE: -0.0 + 0.0 = +0.0) on both engines.
    */
  val q44Moments = GraftQuery(
    "q44_moments",
    (s, dir) => {
      import org.apache.spark.sql.Column
      def cents(c: Column) = round(c * 100, 0).cast("decimal(38,0)")
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag"),
        col("l_quantity").cast("decimal(38,0)").as("q"),
        cents(col("l_extendedprice")).as("p"),
        cents(col("l_discount")).as("d"),
        cents(col("l_tax")).as("t"))
      val sums = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum("q").as("sq"), sum(col("q") * col("q")).as("sqq"),
        sum("p").as("sp"), sum(col("p") * col("p")).as("spp"),
        sum(col("q") * col("p")).as("sqp"),
        sum("d").as("sd"), sum("t").as("st"),
        sum(col("d") * col("t")).as("sdt"))
      def D(c: String) = col(c).cast("double")
      val n = col("n").cast("double")
      sums.select(
        col("l_returnflag"),
        (round(sqrt((n * D("sqq") - D("sq") * D("sq")) / (n * (n - 1))), 6) + 0)
          .as("sd_qty"),
        (round((n * D("sqp") - D("sq") * D("sp")) /
          sqrt((n * D("sqq") - D("sq") * D("sq")) *
            (n * D("spp") - D("sp") * D("sp"))), 6) + 0).as("corr_qty_price"),
        // covariance of the cent-scaled columns, descaled by 100·100
        (round((n * D("sdt") - D("sd") * D("st")) / (n * (n - 1)) / 10000, 6) + 0)
          .as("cov_disc_tax"))
        .orderBy("l_returnflag")
    },
    Some("""WITH b AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    sum(CAST(l_quantity AS BIGINT)) AS sq,
           |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq,
           |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sp,
           |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS spp,
           |    sum(CAST(l_quantity AS BIGINT)
           |      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sqp,
           |    sum(CAST(round(l_discount * 100) AS BIGINT)) AS sd,
           |    sum(CAST(round(l_tax * 100) AS BIGINT)) AS st,
           |    sum(CAST(round(l_discount * 100) AS BIGINT)
           |      * CAST(round(l_tax * 100) AS BIGINT)) AS sdt
           |  FROM lineitem GROUP BY 1),
           |c AS (
           |  SELECT l_returnflag, CAST(n AS DOUBLE) AS n,
           |    CAST(sq AS DOUBLE) AS sq, CAST(sqq AS DOUBLE) AS sqq,
           |    CAST(sp AS DOUBLE) AS sp, CAST(spp AS DOUBLE) AS spp,
           |    CAST(sqp AS DOUBLE) AS sqp,
           |    CAST(sd AS DOUBLE) AS sd, CAST(st AS DOUBLE) AS st,
           |    CAST(sdt AS DOUBLE) AS sdt
           |  FROM b)
           |SELECT l_returnflag,
           |  round(sqrt((n * sqq - sq * sq) / (n * (n - 1))), 6) + 0 AS sd_qty,
           |  round((n * sqp - sq * sp)
           |    / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) + 0 AS corr_qty_price,
           |  round((n * sdt - sd * st) / (n * (n - 1)) / 10000, 6) + 0 AS cov_disc_tax
           |FROM c ORDER BY l_returnflag""".stripMargin))

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

  /** Linear-regression aggregates: slope/intercept/R²/count of
    * price-on-quantity per return flag. Same exact-integer-sums
    * reconstruction as q44 (the builtin regr_* accumulate doubles in
    * partition order — the drift class): one scan collects exact
    * DECIMAL(38,0) sums (n, Σx, Σx², Σy, Σy², Σxy over quantity and price
    * cents), then both engines evaluate the identical closed-form text.
    * Still one scan + a 3-row partial agg at 100 TB.
    */
  val q87Regression = GraftQuery(
    "q87_regression",
    (s, dir) => {
      import org.apache.spark.sql.Column
      def cents(c: Column) = round(c * 100, 0).cast("decimal(38,0)")
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag"),
        col("l_quantity").cast("decimal(38,0)").as("x"),
        cents(col("l_extendedprice")).as("y"))
      val sums = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum("x").as("sxb"), sum(col("x") * col("x")).as("sxxb"),
        sum("y").as("syb"), sum(col("y") * col("y")).as("syyb"),
        sum(col("x") * col("y")).as("sxyb"))
      val base = sums.select(
        col("l_returnflag"), col("n"),
        col("n").cast("double").as("nd"),
        col("sxb").cast("double").as("sx"), col("sxxb").cast("double").as("sxx"),
        col("syb").cast("double").as("sy"), col("syyb").cast("double").as("syy"),
        col("sxyb").cast("double").as("sxy"))
      base
        .withColumn("num", col("nd") * col("sxy") - col("sx") * col("sy"))
        .withColumn("dx", col("nd") * col("sxx") - col("sx") * col("sx"))
        .withColumn("dy", col("nd") * col("syy") - col("sy") * col("sy"))
        // y is in cents: descale slope/intercept by 100 back to price units
        .withColumn("slope", col("num") / col("dx") / 100)
        .select(
          col("l_returnflag"),
          // `+ 0` collapses IEEE -0.0 to +0.0 on both engines (see q44)
          (round(col("slope"), 4) + 0).as("slope"),
          (round(col("sy") / col("nd") / 100 - col("slope") * (col("sx") / col("nd")), 4) + 0)
            .as("intercept"),
          (round(col("num") * col("num") / (col("dx") * col("dy")), 4) + 0).as("r2"),
          col("n"))
        .orderBy("l_returnflag")
    },
    Some("""WITH b AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    sum(CAST(l_quantity AS BIGINT)) AS sx,
           |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
           |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
           |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy,
           |    sum(CAST(l_quantity AS BIGINT)
           |      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
           |  FROM lineitem GROUP BY 1),
           |c AS (
           |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
           |    CAST(sx AS DOUBLE) AS sx, CAST(sxx AS DOUBLE) AS sxx,
           |    CAST(sy AS DOUBLE) AS sy, CAST(syy AS DOUBLE) AS syy,
           |    CAST(sxy AS DOUBLE) AS sxy
           |  FROM b),
           |d AS (
           |  SELECT *, nd * sxy - sx * sy AS num,
           |    nd * sxx - sx * sx AS dx,
           |    nd * syy - sy * sy AS dy
           |  FROM c),
           |e AS (SELECT *, num / dx / 100 AS slope FROM d)
           |SELECT l_returnflag,
           |  round(slope, 4) + 0 AS slope,
           |  round(sy / nd / 100 - slope * (sx / nd), 4) + 0 AS intercept,
           |  round(num * num / (dx * dy), 4) + 0 AS r2,
           |  n
           |FROM e ORDER BY l_returnflag""".stripMargin))

  /** Distribution-shape aggregates: population skewness g1 / excess kurtosis
    * g2 / median / boolean aggs per event type. g1 and g2 are rebuilt from
    * exact integer power sums (the q44 treatment — `value` is exact cents in
    * the fixtures, and g1/g2 are scale-invariant so no descaling is needed):
    * Σv..Σv⁴ accumulate exactly in DECIMAL(38,0) / HUGEINT, then both
    * engines evaluate the identical central-moment closed form. The oracle's
    * v³ and v⁴ element products are widened to HUGEINT BEFORE multiplying —
    * at cents scale the pure-BIGINT product overflows once values reach
    * ~21000 (v³) / ~1300 (v⁴).
    */
  val q88DistShape = GraftQuery(
    "q88_dist_shape",
    (s, dir) => {
      val v = round(col("value") * 100, 0).cast("decimal(38,0)")
      val sums = Tables.events(s, dir)
        .select(col("event_type"), col("value"), v.as("v"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("v")).as("svb"),
          sum(col("v") * col("v")).as("svvb"),
          sum(col("v") * col("v") * col("v")).as("svvvb"),
          sum(col("v") * col("v") * col("v") * col("v")).as("svvvvb"),
          round(median(col("value")), 4).as("med"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          bool_or(col("value") > 99).as("any_high"))
      sums.select(
          col("event_type"), col("n"), col("med"), col("all_nonneg"), col("any_high"),
          col("n").cast("double").as("nd"),
          col("svb").cast("double").as("sv"),
          col("svvb").cast("double").as("svv"),
          col("svvvb").cast("double").as("svvv"),
          col("svvvvb").cast("double").as("svvvv"))
        .withColumn("m1", col("sv") / col("nd"))
        .withColumn("m2", col("svv") / col("nd") - col("m1") * col("m1"))
        .withColumn("m3", col("svvv") / col("nd")
          - lit(3) * col("m1") * (col("svv") / col("nd"))
          + lit(2) * col("m1") * col("m1") * col("m1"))
        .withColumn("m4", col("svvvv") / col("nd")
          - lit(4) * col("m1") * (col("svvv") / col("nd"))
          + lit(6) * col("m1") * col("m1") * (col("svv") / col("nd"))
          - lit(3) * col("m1") * col("m1") * col("m1") * col("m1"))
        .select(
          col("event_type"),
          // `+ 0` collapses IEEE -0.0 to +0.0 on both engines (see q44)
          (round(col("m3") / (col("m2") * sqrt(col("m2"))), 6) + 0).as("skew"),
          (round(col("m4") / (col("m2") * col("m2")) - 3, 6) + 0).as("kurt"),
          col("med"), col("all_nonneg"), col("any_high"), col("n"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
           |  SELECT event_type, count(*) AS n,
           |    sum(CAST(round(value * 100) AS BIGINT)) AS sv,
           |    sum(CAST(round(value * 100) AS BIGINT)
           |      * CAST(round(value * 100) AS BIGINT)) AS svv,
           |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
           |      * CAST(round(value * 100) AS BIGINT)
           |      * CAST(round(value * 100) AS BIGINT)) AS svvv,
           |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
           |      * CAST(round(value * 100) AS BIGINT)
           |      * CAST(round(value * 100) AS BIGINT)
           |      * CAST(round(value * 100) AS BIGINT)) AS svvvv,
           |    round(median(value), 4) AS med,
           |    bool_and(value >= 0) AS all_nonneg,
           |    bool_or(value > 99) AS any_high
           |  FROM events GROUP BY 1),
           |c AS (
           |  SELECT event_type, n, med, all_nonneg, any_high,
           |    CAST(n AS DOUBLE) AS nd, CAST(sv AS DOUBLE) AS sv,
           |    CAST(svv AS DOUBLE) AS svv, CAST(svvv AS DOUBLE) AS svvv,
           |    CAST(svvvv AS DOUBLE) AS svvvv
           |  FROM b),
           |d AS (SELECT *, sv / nd AS m1 FROM c),
           |e AS (SELECT *,
           |    svv / nd - m1 * m1 AS m2,
           |    svvv / nd - 3 * m1 * (svv / nd) + 2 * m1 * m1 * m1 AS m3,
           |    svvvv / nd - 4 * m1 * (svvv / nd) + 6 * m1 * m1 * (svv / nd)
           |      - 3 * m1 * m1 * m1 * m1 AS m4
           |  FROM d)
           |SELECT event_type,
           |  round(m3 / (m2 * sqrt(m2)), 6) + 0 AS skew,
           |  round(m4 / (m2 * m2) - 3, 6) + 0 AS kurt,
           |  med, all_nonneg, any_high, n
           |FROM e ORDER BY event_type""".stripMargin))

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

  /** Poisson-bootstrap confidence intervals for the per-type mean — THE
    * cluster-scale resampling technique (Chamandy et al. / Kleiner et al.
    * lineage): classic bootstrap resampling needs n draws per replica and
    * coordination across the dataset; the Poisson approximation gives each
    * row an independent Poisson(1) multiplicity per replica, so all 50
    * replicas materialize in ONE scan as a row-local explode — mergeable,
    * shuffle-once (groupBy (type, replica) partial-aggregates map-side),
    * and embarrassingly parallel at any scale. Multiplicities come from a
    * deterministic md5-uniform inverted through the Poisson(1) CDF
    * (thresholds are the e⁻¹·Σ1/k! partial sums as shared literals), so
    * both engines draw identical "randomness". Replica means round to 3
    * digits before the exact percentile bracket [2.5%, 97.5%] — the same
    * round-before-rank discipline as q167/q200.
    */
  val q201PoissonBootstrap = GraftQuery(
    "q201_poisson_bootstrap",
    (s, dir) => {
      val u = conv(substring(md5(concat(col("b").cast("string"), lit("_"),
        col("event_id").cast("string"))), 1, 8), 16, 10).cast("long")
        .cast("double") / lit(4294967296.0)
      val wgt = when(col("u") < 0.3678794412, 0)
        .when(col("u") < 0.7357588823, 1)
        .when(col("u") < 0.9196986029, 2)
        .when(col("u") < 0.9810118431, 3)
        .when(col("u") < 0.9963401532, 4)
        .when(col("u") < 0.9994058152, 5)
        .otherwise(6)
      val reps = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("b", explode(sequence(lit(0), lit(49))))
        .withColumn("u", u)
        .withColumn("wgt", wgt)
      val rm = reps.groupBy("event_type", "b")
        .agg(round(sum(col("wgt") * col("value")) / sum("wgt"), 3).as("m"))
      val ci = rm.groupBy("event_type").agg(
        round(expr("percentile(m, 0.025)"), 3).as("ci_lo"),
        round(expr("percentile(m, 0.975)"), 3).as("ci_hi"))
      Tables.events(s, dir).groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("value"), 3).as("mean_value"))
        .join(ci, "event_type")
        .select(col("event_type"), col("n"), col("mean_value"),
          col("ci_lo"), col("ci_hi"))
        .orderBy("event_type")
    },
    Some("""WITH reps AS (
           |  SELECT event_type, r.b,
           |    CAST(concat('0x', substr(md5(r.b::VARCHAR || '_' || event_id::VARCHAR), 1, 8)) AS BIGINT)
           |      / 4294967296.0 AS u,
           |    value
           |  FROM events, range(0, 50) r(b)),
           |w AS (SELECT event_type, b, value,
           |    CASE WHEN u < 0.3678794412 THEN 0
           |         WHEN u < 0.7357588823 THEN 1
           |         WHEN u < 0.9196986029 THEN 2
           |         WHEN u < 0.9810118431 THEN 3
           |         WHEN u < 0.9963401532 THEN 4
           |         WHEN u < 0.9994058152 THEN 5
           |         ELSE 6 END AS wgt
           |  FROM reps),
           |rm AS (SELECT event_type, b,
           |    round(sum(wgt * value) / sum(wgt), 3) AS m
           |  FROM w GROUP BY 1, 2),
           |ci AS (SELECT event_type,
           |    round(quantile_cont(m, 0.025), 3) AS ci_lo,
           |    round(quantile_cont(m, 0.975), 3) AS ci_hi
           |  FROM rm GROUP BY 1)
           |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(avg(e.value), 3) AS mean_value,
           |  any_value(ci.ci_lo) AS ci_lo, any_value(ci.ci_hi) AS ci_hi
           |FROM events e JOIN ci USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Exact weighted median (price weighted by quantity) per return flag —
    * the order statistic `percentile()` can't express (every unit of
    * quantity counts as one observation of its price): sort each group by
    * price with a unique tie-break, run a windowed cumulative weight, and
    * take the first price whose doubled cumulative weight reaches the
    * group total. The weights are integral-valued doubles, so every cumw
    * is fp-exact — the ≥ comparison has no noise to flip on (no rounding
    * needed before the threshold).
    *
    * Scale: because weights are positive, the crossing VALUE depends only
    * on per-distinct-value weight totals — so rows first collapse to
    * (flag, price) partials (a parallel agg; the price domain is bounded
    * at cents granularity), the cumulative weight runs inside fixed-width
    * price buckets (a PARTITIONED window — the round-7 form partitioned
    * by the 3-value flag alone, ~n/3 rows through one task), and the
    * bounded per-(flag, bucket) totals cumulate through a triangle join.
    * No single-partition exchange anywhere; the oracle's row-level window
    * form is unchanged (it selects the same crossing value).
    */
  private[graft] def q205Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val byV0 = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice").as("v"),
          col("l_quantity").as("wt"))
        .groupBy("l_returnflag", "v")
        .agg(sum("wt").as("w"), count(lit(1)).as("c"))
        .withColumn("bkt", floor(col("v") / 1000).cast("long"))
      // ≤ price-domain × |flags| rows
      val byV = if (forPlan) byV0 else byV0.localCheckpoint()
      val tot = byV.groupBy("l_returnflag")
        .agg(sum("c").as("n"), sum("w").as("w_total"))
      ScaleFrames.twoLevelCumsum(byV, Seq("l_returnflag"), "bkt", "v",
          Seq("w" -> "cumw"))
        .join(tot, "l_returnflag")
        .filter(col("cumw") * 2 >= col("w_total"))
        .groupBy("l_returnflag")
        .agg(first(col("n")).as("n"), round(first(col("w_total")), 2).as("w_total"),
          min(col("v")).as("wmedian"))
        .orderBy("l_returnflag")
  }

  val q205WeightedMedian = GraftQuery(
    "q205_weighted_median",
    (s, dir) => q205Df(s, dir),
    Some("""WITH li AS (SELECT l_returnflag, l_extendedprice AS v,
           |    l_quantity AS wt, l_orderkey, l_linenumber FROM lineitem),
           |cum AS (SELECT l_returnflag, v,
           |    sum(wt) OVER (PARTITION BY l_returnflag
           |      ORDER BY v, l_orderkey, l_linenumber) AS cumw
           |  FROM li),
           |tot AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           |    sum(wt) AS w_total FROM li GROUP BY 1)
           |SELECT cum.l_returnflag, any_value(tot.n) AS n,
           |  round(any_value(tot.w_total), 2) AS w_total,
           |  min(v) AS wmedian
           |FROM cum JOIN tot USING (l_returnflag)
           |WHERE cumw * 2 >= w_total
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Benford's-law first-digit audit of a monetary column — the classic
    * synthetic-data / fabrication screen: organically-generated amounts
    * follow P(d) = log10(1 + 1/d) on their leading digit, and a corpus
    * whose numbers were templated or uniformly drawn fails it loudly (the
    * fixture's synthetic prices SHOULD fail — the query reports the
    * deviation, it doesn't assert conformance). One partial-agg scan to 9
    * digit rows; the per-digit chi-square contribution ((obs−exp)²/exp)
    * folds from integer counts and a literal expectation table.
    */
  val q206Benford = GraftQuery(
    "q206_benford",
    (s, dir) => {
      val p = Map(1 -> 0.301029995663981, 2 -> 0.176091259055681,
        3 -> 0.124938736608300, 4 -> 0.096910013008056,
        5 -> 0.079181246047625, 6 -> 0.066946789630613,
        7 -> 0.057991946977687, 8 -> 0.051152522447381,
        9 -> 0.045757490560675)
      val expLit = map(p.toSeq.sortBy(_._1)
        .flatMap { case (d, v) => Seq(lit(d), lit(v)) }: _*)
      val digits = Tables.lineitem(s, dir)
        .select(substring(col("l_extendedprice").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      digits
        .withColumn("total", sum("n").over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        // a value < 1 leads with digit 0 — the oracle's join to the ben
        // table drops it (while still counting it in total); dropping it
        // AFTER the total window matches that exactly, and keeps
        // element_at from throwing on the missing map key under ANSI
        .filter(col("digit").between(1, 9))
        .withColumn("share", col("n").cast("double") / col("total"))
        .withColumn("benford_p", element_at(expLit, col("digit")))
        .select(col("digit"), col("n"), round(col("share"), 6).as("share"),
          round(col("benford_p"), 6).as("benford_p"),
          round(pow(col("share") - col("benford_p"), 2) / col("benford_p") * col("total"), 3)
            .as("chi2_term"))
        .orderBy("digit")
    },
    Some("""WITH ben(digit, p) AS (VALUES
           |  (1, 0.301029995663981), (2, 0.176091259055681),
           |  (3, 0.124938736608300), (4, 0.096910013008056),
           |  (5, 0.079181246047625), (6, 0.066946789630613),
           |  (7, 0.057991946977687), (8, 0.051152522447381),
           |  (9, 0.045757490560675)),
           |d AS (SELECT CAST(substr(l_extendedprice::VARCHAR, 1, 1) AS INT) AS digit,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM lineitem GROUP BY 1),
           |t AS (SELECT d.digit, d.n, sum(d.n) OVER () AS total FROM d)
           |SELECT t.digit, t.n, round(t.n::DOUBLE / total, 6) AS share,
           |  round(ben.p::DOUBLE, 6) AS benford_p,
           |  round(pow(t.n::DOUBLE / total - ben.p, 2) / ben.p * total, 3) AS chi2_term
           |FROM t JOIN ben ON ben.digit = t.digit
           |ORDER BY t.digit""".stripMargin))

  /** Holt linear-trend exponential smoothing (α = 0.5, β = 0.3) over the
    * per-type daily event series, plus the 3-step-ahead forecast — the
    * capacity-planning / drift-projection primitive a monitoring pipeline
    * runs on its own metrics. The recurrence l_t = αx_t + (1−α)(l+b),
    * b_t = β(l_t−l) + (1−β)b is inherently sequential, so each key's
    * series folds ONCE in event-time order: Spark sorts the per-key day
    * array and folds with the `aggregate` higher-order function (per-key
    * state is 2 doubles; series length is bounded by the day span — the
    * honest per-key-fits-in-memory contract every stateful time-series op
    * carries), and the oracle replays the identical recurrence with a
    * recursive CTE stepping the day index. Both engines execute the SAME
    * operation order, so the fold is bit-identical before the final
    * 3-digit rounding.
    */
  val q207HoltTrend = GraftQuery(
    "q207_holt_trend",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("x"))
      val series = daily.groupBy("event_type")
        .agg(transform(sort_array(collect_list(struct(col("d"), col("x")))),
          e => e("x")).as("xs"))
        // Holt needs two seed points; a single-day series would make
        // element_at(xs, 2) throw under ANSI, while the oracle's
        // recursive base (i = 1 AND i = 2) silently drops that group —
        // drop it explicitly on this side so both engines agree
        .filter(size(col("xs")) >= 2)
      def holtStep(acc: Column, x: Column) = {
        val l2 = lit(0.5) * x + lit(0.5) * (acc("l") + acc("b"))
        struct(l2.as("l"),
          (lit(0.3) * (l2 - acc("l")) + lit(0.7) * acc("b")).as("b"))
      }
      series
        .withColumn("fin", aggregate(
          slice(col("xs"), lit(3), greatest(size(col("xs")) - 2, lit(0))),
          struct(element_at(col("xs"), 1).as("l"),
            (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b")),
          holtStep))
        .select(col("event_type"), size(col("xs")).as("n_points"),
          round(col("fin.l"), 3).as("level"),
          round(col("fin.b"), 3).as("trend"),
          round(col("fin.l") + lit(3.0) * col("fin.b"), 3).as("forecast_3"))
        .orderBy("event_type")
    },
    Some("""WITH RECURSIVE daily AS (
           |  SELECT event_type, date_trunc('day', ts) AS d,
           |    CAST(count(*) AS DOUBLE) AS x
           |  FROM events GROUP BY 1, 2),
           |idx AS (SELECT event_type, x,
           |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
           |  FROM daily),
           |nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
           |rec(event_type, i, l, b) AS (
           |  SELECT a.event_type, 2, a.x, b2.x - a.x
           |  FROM idx a JOIN idx b2 ON b2.event_type = a.event_type
           |  WHERE a.i = 1 AND b2.i = 2
           |  UNION ALL
           |  SELECT r.event_type, r.i + 1,
           |    0.5 * x.x + 0.5 * (r.l + r.b),
           |    0.3 * ((0.5 * x.x + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
           |  FROM rec r JOIN idx x ON x.event_type = r.event_type
           |    AND x.i = r.i + 1)
           |SELECT r.event_type, CAST(nn.n AS INT) AS n_points,
           |  round(r.l, 3) AS level, round(r.b, 3) AS trend,
           |  round(r.l + 3.0 * r.b, 3) AS forecast_3
           |FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
           |ORDER BY r.event_type""".stripMargin))

  /** Daily P50/P95 bands per event type with day-over-day P95 drift — the
    * SLO dashboard reduction: exact grouped percentiles per (type, day)
    * then one lag window over the tiny per-day result for the drift
    * column. Percentiles are per-group order statistics (the q54-proven
    * Spark `percentile` / DuckDB `quantile_cont` pairing — selection +
    * one interpolation, no accumulation), so 6-digit rounding holds; the
    * drift subtracts two such values.
    */
  val q218PercentileBands = GraftQuery(
    "q218_percentile_bands",
    (s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("day")
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5)").as("p50u"),
          expr("percentile(value, 0.95)").as("p95u"))
        .withColumn("p95_prev", lag("p95u", 1).over(w))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), round(col("p50u"), 6).as("p50"), round(col("p95u"), 6).as("p95"),
          round(col("p95u") - col("p95_prev"), 6).as("p95_drift"))
        .orderBy("event_type", "day")
    },
    Some("""WITH b AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) n,
           |    quantile_cont(value, 0.5) p50u, quantile_cont(value, 0.95) p95u
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           |  round(p50u, 6) AS p50, round(p95u, 6) AS p95,
           |  round(p95u - lag(p95u, 1) OVER (
           |    PARTITION BY event_type ORDER BY day), 6) AS p95_drift
           |FROM b ORDER BY event_type, day""".stripMargin))

  /** Time-constrained conversion funnel — q117's ordered funnel with the
    * product-analytics clock attached: a click only converts if it lands
    * within 24 h of the user's first signup, a purchase within 72 h. One
    * shuffle computes each user's first-signup time; the constrained
    * stage times are conditional mins over a second keyed pass joined on
    * user (the two-scan shape — no window over the raw event stream).
    * All comparisons are on exact microsecond timestamps.
    */
  val q219WindowedFunnel = GraftQuery(
    "q219_windowed_funnel",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts")).persist()
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
      val joined = ev.join(signup, "user_id")
      val per = joined.groupBy("user_id")
        .agg(first("t0").as("t0"),
          min(when(col("event_type") === "click" &&
            col("ts") > col("t0") &&
            col("ts") <= col("t0") + expr("INTERVAL 24 HOURS"), col("ts")))
            .as("t_click"),
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("t0") &&
            col("ts") <= col("t0") + expr("INTERVAL 72 HOURS"), col("ts")))
            .as("t_buy"))
      val out = per.agg(count(lit(1)).as("n_signup"),
        count(col("t_click")).as("n_click_24h"),
        // coalesce: with zero users holding both stages the sum aggregates
        // only NULL comparisons and returns NULL, but the oracle's
        // CASE ... ELSE 0 form returns 0
        coalesce(sum((col("t_buy") > col("t_click")).cast("long")), lit(0L))
          .as("n_buy_after_click"),
        count(col("t_buy")).as("n_buy_72h"))
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      ev.unpersist()
      ckpt
    },
    Some("""WITH s0 AS (SELECT user_id, min(ts) t0 FROM events
           |  WHERE event_type = 'signup' GROUP BY 1),
           |per AS (SELECT e.user_id, any_value(s0.t0) t0,
           |    min(CASE WHEN e.event_type = 'click' AND e.ts > s0.t0
           |      AND e.ts <= s0.t0 + INTERVAL 24 HOUR THEN e.ts END) t_click,
           |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > s0.t0
           |      AND e.ts <= s0.t0 + INTERVAL 72 HOUR THEN e.ts END) t_buy
           |  FROM events e JOIN s0 USING (user_id) GROUP BY 1)
           |SELECT CAST(count(*) AS BIGINT) n_signup,
           |  CAST(count(t_click) AS BIGINT) n_click_24h,
           |  CAST(sum(CASE WHEN t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
           |    n_buy_after_click,
           |  CAST(count(t_buy) AS BIGINT) n_buy_72h
           |FROM per""".stripMargin))

  /** Theil-T inequality index of customer revenue — the decomposable
    * entropy-based concentration measure (complementing q194's Gini):
    * T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ) over per-customer revenue, 0 = equal,
    * ln(n) = one customer holds everything. Per-customer revenue is a
    * partial agg; the index folds in one pass (xlogx accumulation →
    * 3-digit rounding discipline).
    */
  val q220Theil = GraftQuery(
    "q220_theil",
    (s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(sum("o_totalprice").as("x"))
      val mu = rev.agg(avg("x").as("mu"), count(lit(1)).as("n"))
      rev.crossJoin(mu)
        .agg(first("n").as("n_customers"),
          round(first("mu"), 2).as("mean_revenue"),
          round(sum((col("x") / col("mu")) * log(col("x") / col("mu"))) /
            first("n"), 3).as("theil_t"))
    },
    Some("""WITH rev AS (SELECT o_custkey, sum(o_totalprice) x FROM orders GROUP BY 1),
           |mu AS (SELECT avg(x) mu, CAST(count(*) AS BIGINT) n FROM rev)
           |SELECT any_value(mu.n) AS n_customers,
           |  round(any_value(mu.mu), 2) AS mean_revenue,
           |  round(sum((x / mu.mu) * ln(x / mu.mu)) / any_value(mu.n), 3) AS theil_t
           |FROM rev, mu""".stripMargin))

  /** Equi-depth (equal-frequency) histogram of l_extendedprice — the
    * planner-statistics form of q66's equal-width histogram: 10 value
    * buckets at the nine exact price deciles (ScaleFrames threshold
    * frame — equal prices share a bucket, the tie discipline a real
    * equi-depth histogram has anyway), each reporting its [lo, hi]
    * boundary and exact count — the structure a cost model reads for
    * selectivity.
    *
    * Scale: the price column is near-unique, so the one-shot exact
    * `percentile()` aggregate would merge the whole distinct-value map on
    * one reducer (15 s at sf0.1, the whole domain at 100×) — the
    * thresholds instead come from [[ScaleFrames.thresholdsWideDomain]]:
    * per-distinct-value counts, two-level cumulative ranks, interpolation
    * between the two bracketing order statistics. Then one partial-agg
    * scan bins against the 9 literals — no global window, no
    * `Exchange SinglePartition`, no O(distinct) single-task state.
    */
  private[graft] def q221Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select(col("l_extendedprice").as("v"))
    val li = if (forPlan) base else base.persist()
    val ts = ScaleFrames.thresholdsWideDomain(li, "v", 1000.0,
      (1 to 9).map(_ / 10.0))
    val out = li
      .withColumn("bucket", ScaleFrames.binAsc(col("v"), ts))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bucket")
    if (forPlan) out
    else {
      val r = out.localCheckpoint() // ≤10 rows; frees the cached projection
      li.unpersist()
      r
    }
  }

  val q221EquidepthHist = GraftQuery(
    "q221_equidepth_hist",
    (s, dir) => q221Df(s, dir),
    Some(s"""WITH li AS (SELECT l_extendedprice v FROM lineitem),
           |th AS (${ScaleFrames.thresholdCte("v", (1 to 9).map(_ / 10.0), "li")})
           |SELECT ${ScaleFrames.binSqlAsc("v", 9)} AS bucket,
           |  CAST(count(*) AS BIGINT) n, min(v) lo, max(v) hi
           |FROM li, th
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Lorenz-curve concentration deciles of customer revenue — the curve
    * whose area complements q194's Gini and q220's Theil scalar: bin
    * customers into revenue-value deciles (nine exact percentile
    * thresholds — the ScaleFrames frame; equal revenues share a decile),
    * report each decile's cumulative share of customers vs cumulative
    * share of revenue ("the top 10% hold X%"). Revenue is summed in
    * INTEGER CENTS (the q103 drift-proof discipline) so the percentile
    * interpolation and every comparison are exact cross-engine; shares
    * are integer ratios rounded at 6.
    *
    * Scale: per-customer partial agg → threshold scan over the bounded
    * customer dimension → 10-row decile table localCheckpointed →
    * triangle-join cumulation. No global window, no
    * `Exchange SinglePartition`.
    */
  private[graft] def q229Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val rev0 = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      // customer-dimension cardinality
      val rev = if (forPlan) rev0 else rev0.localCheckpoint()
      val ts = ScaleFrames.thresholds(rev, "x", (1 to 9).map(_ / 10.0))
      val per = rev.withColumn("decile", ScaleFrames.binAsc(col("x"), ts))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("x").as("rev"))
      val prior = per.select(col("decile").as("d2"), col("n").as("n2"),
        col("rev").as("r2"))
      per.crossJoin(prior)
        .groupBy("decile", "n")
        .agg(sum(when(col("d2") <= col("decile"), col("n2")).otherwise(0L))
            .as("cum_n"),
          sum(when(col("d2") <= col("decile"), col("r2")).otherwise(0L))
            .as("cum_rev"),
          sum("n2").as("tot_n"), sum("r2").as("tot_rev"))
        .select(col("decile"), col("n"),
          round(col("cum_n").cast("double") / col("tot_n"), 6)
            .as("cum_pop_share"),
          round(col("cum_rev").cast("double") / col("tot_rev"), 6)
            .as("cum_rev_share"))
        .orderBy("decile")
  }

  val q229LorenzCurve = GraftQuery(
    "q229_lorenz_curve",
    (s, dir) => q229Df(s, dir),
    Some(s"""WITH rev AS (SELECT o_custkey,
           |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) x
           |  FROM orders GROUP BY 1),
           |th AS (${ScaleFrames.thresholdCte("x", (1 to 9).map(_ / 10.0), "rev")}),
           |b AS (SELECT x, ${ScaleFrames.binSqlAsc("x", 9)} decile
           |  FROM rev, th),
           |per AS (SELECT decile, CAST(count(*) AS BIGINT) n, sum(x) rev
           |  FROM b GROUP BY 1)
           |SELECT decile, n,
           |  round((sum(n) OVER (ORDER BY decile))::DOUBLE
           |    / (sum(n) OVER ()), 6) AS cum_pop_share,
           |  round((sum(rev) OVER (ORDER BY decile))::DOUBLE
           |    / (sum(rev) OVER ()), 6) AS cum_rev_share
           |FROM per ORDER BY decile""".stripMargin))

  /** Day-of-week seasonality profile + deseasonalized outliers — the
    * monitoring reduction that stops weekly rhythm from drowning real
    * anomalies: per (event_type, weekday) mean daily volume is the
    * profile; each actual day scores volume / its weekday mean, and days
    * outside [0.5, 1.5]× flag. Ratios are integer-count divisions (the
    * weekday mean is an exact rational of two integers — computed as
    * sum/count, not averaged averages), so 6-digit rounding holds. The
    * fixture's events are near-uniform, so the band is ±15% (production
    * uses ±50%); output is flagged days with ratio and profile mean.
    */
  val q231SeasonalOutliers = GraftQuery(
    "q231_seasonal_outliers",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")).persist()
      val prof = daily
        .withColumn("dow", dayofweek(col("day")))
        .groupBy("event_type", "dow")
        .agg(sum("n").as("tot"), count(lit(1)).as("nd"))
        .select(col("event_type"), col("dow"),
          (col("tot").cast("double") / col("nd")).as("dow_mean"))
      val out = daily.withColumn("dow", dayofweek(col("day")))
        .join(prof, Seq("event_type", "dow"))
        .withColumn("ratio", col("n") / col("dow_mean"))
        .filter(col("ratio") > 1.15 || col("ratio") < 0.85)
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), round(col("dow_mean"), 6).as("dow_mean"),
          round(col("ratio"), 6).as("ratio"))
        .orderBy("event_type", "day")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      daily.unpersist()
      ckpt
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) n
           |  FROM events GROUP BY 1, 2),
           |prof AS (SELECT event_type, dayofweek(day) AS dow,
           |    sum(n)::DOUBLE / count(*) dow_mean
           |  FROM daily GROUP BY 1, 2)
           |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n,
           |  round(p.dow_mean, 6) AS dow_mean,
           |  round(d.n / p.dow_mean, 6) AS ratio
           |FROM daily d JOIN prof p
           |  ON p.event_type = d.event_type AND p.dow = dayofweek(d.day)
           |WHERE d.n / p.dow_mean > 1.15 OR d.n / p.dow_mean < 0.85
           |ORDER BY d.event_type, day""".stripMargin))

  /** Join fan-out audit — the multiplicity histogram a planner (or a
    * wary engineer) reads before a fact-fact join: per orders key, how
    * many lineitem rows match; reported as the fan-out distribution
    * (matches → key count) plus unmatched keys at fan-out 0 via a left
    * join. Two stacked partial aggs; the histogram is at most
    * max-fan-out rows. A long tail here predicts shuffle amplification
    * BEFORE the join runs.
    */
  val q232JoinFanout = GraftQuery(
    "q232_join_fanout",
    (s, dir) => {
      val per = Tables.orders(s, dir).select(col("o_orderkey"))
        .join(Tables.lineitem(s, dir).select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(sum(when(col("l_orderkey").isNotNull, 1).otherwise(0)).as("fanout"))
      per.groupBy("fanout").agg(count(lit(1)).as("n_keys"))
        .orderBy("fanout")
    },
    Some("""WITH per AS (SELECT o_orderkey,
           |    CAST(sum(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS fanout
           |  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
           |  GROUP BY 1)
           |SELECT fanout, CAST(count(*) AS BIGINT) n_keys
           |FROM per GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Longest daily-activity streak per user — the gaps-and-islands SQL
    * pattern (consecutive days collapse to one island because
    * day − row_number() is constant inside a run): distinct active days
    * per user, one window for the island key, one grouped count for
    * island lengths, one max per user. Top-20 by (streak desc, user) —
    * all integer arithmetic. Every window partitions by user, so no
    * global sort touches the event log.
    */
  val q234ActivityStreaks = GraftQuery(
    "q234_activity_streaks",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val islands = days
        .withColumn("k", datediff(col("d"), lit("1970-01-01").cast("date"))
          - row_number().over(w))
        .groupBy("user_id", "k").agg(count(lit(1)).as("len"))
      islands.groupBy("user_id")
        .agg(max("len").as("max_streak"), count(lit(1)).as("n_streaks"))
        .orderBy(desc("max_streak"), col("user_id"))
        .limit(20)
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
           |isl AS (SELECT user_id,
           |    datediff('day', DATE '1970-01-01', d) - row_number() OVER (
           |      PARTITION BY user_id ORDER BY d) AS k
           |  FROM days),
           |runs AS (SELECT user_id, k, CAST(count(*) AS BIGINT) len
           |  FROM isl GROUP BY 1, 2)
           |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
           |  CAST(count(*) AS BIGINT) AS n_streaks
           |FROM runs GROUP BY 1
           |ORDER BY max_streak DESC, user_id LIMIT 20""".stripMargin))

  /** Proportional (fractional) revenue attribution — the many-to-many
    * allocation pattern: each order's total price is split across its
    * line suppliers in proportion to line revenue, so every supplier's
    * attributed total sums order-consistently (no double counting — the
    * per-order shares sum to 1 by construction). Per-order revenue is a
    * partial agg joined back on the key; shares are per-row divisions;
    * only the final per-supplier sum accumulates floats (round 2).
    * Top-20 suppliers by rounded attributed revenue.
    */
  val q235FractionalAttribution = GraftQuery(
    "q235_fractional_attribution",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("lr"))
      val orev = li.groupBy("l_orderkey").agg(sum("lr").as("orev"))
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      li.join(orev, "l_orderkey")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"),
          (col("o_totalprice") * col("lr") / col("orev")).as("attr"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"), round(sum("attr"), 2).as("attributed"))
        .orderBy(desc("attributed"), col("l_suppkey"))
        .limit(20)
    },
    Some("""WITH li AS (SELECT l_orderkey, l_suppkey,
           |    l_extendedprice * (1.0 - l_discount) AS lr FROM lineitem),
           |orev AS (SELECT l_orderkey, sum(lr) AS orev FROM li GROUP BY 1)
           |SELECT l_suppkey, CAST(count(*) AS BIGINT) n_lines,
           |  round(sum(o_totalprice * lr / orev), 2) AS attributed
           |FROM li JOIN orev USING (l_orderkey)
           |JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1 ORDER BY attributed DESC, l_suppkey LIMIT 20""".stripMargin))

  /** Inter-arrival time analysis per event type — the traffic-model
    * reduction behind capacity planning and bot detection (a human
    * stream's gaps are heavy-tailed; a scripted one's are near-constant):
    * per-user consecutive gaps via one user-partitioned lag window, then
    * per-type exact mean / median / P95 gap seconds and the
    * coefficient-of-variation mean/median ratio (≈1.44 for exponential
    * arrivals, →1 for clockwork). Gaps are integer epoch-second deltas;
    * percentiles are the q54-proven exact pairing; only the mean
    * accumulates (round 3).
    */
  val q238InterArrival = GraftQuery(
    "q238_inter_arrival",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, dir)
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        .filter(col("gap_s").isNotNull)
      gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg("gap_s"), 3).as("mean_gap_s"),
          round(expr("percentile(gap_s, 0.5)"), 3).as("median_gap_s"),
          round(expr("percentile(gap_s, 0.95)"), 3).as("p95_gap_s"),
          round(avg("gap_s") / expr("percentile(gap_s, 0.5)"), 3)
            .as("mean_over_median"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (SELECT event_type,
           |    date_diff('second', lag(ts) OVER (
           |      PARTITION BY user_id, event_type ORDER BY ts, event_id), ts)
           |      AS gap_s
           |  FROM events)
           |SELECT event_type, CAST(count(*) AS BIGINT) n_gaps,
           |  round(avg(gap_s), 3) AS mean_gap_s,
           |  round(quantile_cont(gap_s, 0.5), 3) AS median_gap_s,
           |  round(quantile_cont(gap_s, 0.95), 3) AS p95_gap_s,
           |  round(avg(gap_s) / quantile_cont(gap_s, 0.5), 3) AS mean_over_median
           |FROM g WHERE gap_s IS NOT NULL
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Cross-table referential-integrity audit — q96 checks constraints
    * WITHIN a table; this walks the foreign-key edges of the star schema
    * (lineitem→orders, lineitem→part, lineitem→supplier, orders→customer)
    * and counts orphans on each, plus the reverse childless-parent counts
    * for the fact edges. Every check is one left-anti-joinable aggregate
    * (here as left-join + null count so all edges batch into one pass
    * per pair); output is one row per FK edge — the first artifact any
    * warehouse onboarding produces.
    */
  val q239RiAudit = GraftQuery(
    "q239_ri_audit",
    (s, dir) => {
      import s.implicits._
      def orphans(child: org.apache.spark.sql.DataFrame, ck: String,
          parent: org.apache.spark.sql.DataFrame, pk: String): Long =
        child.select(col(ck)).join(parent.select(col(pk)),
          col(ck) === col(pk), "left_anti").count()
      val li = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir); val p = Tables.part(s, dir)
      val su = Tables.supplier(s, dir)
      val rows = Seq(
        ("lineitem->orders", orphans(li, "l_orderkey", o, "o_orderkey"),
          orphans(o, "o_orderkey", li, "l_orderkey")),
        ("lineitem->part", orphans(li, "l_partkey", p, "p_partkey"),
          orphans(p, "p_partkey", li, "l_partkey")),
        ("lineitem->supplier", orphans(li, "l_suppkey", su, "s_suppkey"),
          orphans(su, "s_suppkey", li, "l_suppkey")),
        ("orders->customer", orphans(o, "o_custkey", c, "c_custkey"),
          orphans(c, "c_custkey", o, "o_custkey")))
      rows.toDF("fk_edge", "orphan_children", "childless_parents")
        .orderBy("fk_edge")
    },
    Some("""SELECT * FROM (
           |SELECT 'lineitem->orders' AS fk_edge,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphan_children,
           |  (SELECT CAST(count(*) AS BIGINT) FROM orders
           |   WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)) AS childless_parents
           |UNION ALL SELECT 'lineitem->part',
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |   WHERE l_partkey NOT IN (SELECT p_partkey FROM part)),
           |  (SELECT CAST(count(*) AS BIGINT) FROM part
           |   WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem))
           |UNION ALL SELECT 'lineitem->supplier',
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |   WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)),
           |  (SELECT CAST(count(*) AS BIGINT) FROM supplier
           |   WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem))
           |UNION ALL SELECT 'orders->customer',
           |  (SELECT CAST(count(*) AS BIGINT) FROM orders
           |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
           |  (SELECT CAST(count(*) AS BIGINT) FROM customer
           |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
           |) ORDER BY fk_edge""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q42Pivot, q43Percentiles, q44Moments, q45WindowExtras,
    q66Histogram, q75MathFuncs, q87Regression, q88DistShape, q89Bitwise,
    q201PoissonBootstrap, q205WeightedMedian, q206Benford, q207HoltTrend,
    q218PercentileBands, q219WindowedFunnel, q220Theil, q221EquidepthHist,
    q229LorenzCurve, q231SeasonalOutliers, q232JoinFanout, q234ActivityStreaks,
    q235FractionalAttribution, q238InterArrival, q239RiAudit,
    q241WelfordVariance, q246Cusum, q247AbTest, q248HorvitzThompson,
    q259SampleSizePlanner)

  /** Sample-size planning — the inverse of q248's audit: given each
    * type's pilot mean and stddev, how many rows does a ±5%-relative
    * 95% CI on the mean require (n = (1.96·σ / (0.05·μ))²), and does the
    * current volume already suffice? The closed-form z-based planner is
    * what a sampling pipeline sizes its rates from BEFORE collecting.
    * μ and σ round to 6 before entering the formula (shared literals
    * discipline), so the derived ceiling is identical on both engines.
    */
  lazy val q259SampleSizePlanner: GraftQuery = GraftQuery(
    "q259_sample_size_planner",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_current"),
          round(avg("value"), 6).as("mu"),
          round(expr("stddev_samp(value)"), 6).as("sd"))
        .withColumn("n_required",
          ceil(pow(lit(1.96) * col("sd") / (lit(0.05) * col("mu")), 2))
            .cast("long"))
        .select(col("event_type"), col("n_current"), col("mu"), col("sd"),
          col("n_required"),
          (col("n_current") >= col("n_required")).cast("int").as("sufficient"))
        .orderBy("event_type")
    },
    Some("""WITH st AS (SELECT event_type, CAST(count(*) AS BIGINT) n_current,
           |    round(avg(value), 6) mu, round(stddev_samp(value), 6) sd
           |  FROM events GROUP BY 1)
           |SELECT event_type, n_current, mu, sd,
           |  CAST(ceil(pow(1.96 * sd / (0.05 * mu), 2)) AS BIGINT) AS n_required,
           |  CAST(n_current >= ceil(pow(1.96 * sd / (0.05 * mu), 2)) AS INT)
           |    AS sufficient
           |FROM st ORDER BY event_type""".stripMargin))

  /** One-sided CUSUM change-point detection over per-type daily volumes
    * (Page 1954): S⁺ ← max(0, S⁺ + (x − μ − κ)) accumulates only
    * sustained upward drift (κ = slack absorbs noise; μ = the series'
    * own mean so the fixture anchors itself), alarming when S⁺ crosses
    * h = 3σ̂. Like q207's Holt fold, the recurrence is inherently
    * sequential: Spark folds each type's day-ordered array once via the
    * `aggregate` HOF (state = 2 doubles: running S⁺ and its max), the
    * oracle replays the identical recurrence in a recursive CTE, and
    * because both execute the same operation order the fold is
    * bit-identical before the 3-digit display rounding. μ and σ̂ round
    * to 6 BEFORE entering the recurrence (shared literals, the
    * round-before-use discipline).
    */
  lazy val q246Cusum: GraftQuery = GraftQuery(
    "q246_cusum",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("x")).persist()
      val stats = daily.groupBy("event_type")
        .agg(round(avg("x"), 6).as("mu"), round(expr("stddev_samp(x)"), 6).as("sd"))
      val series = daily.groupBy("event_type")
        .agg(transform(sort_array(collect_list(struct(col("d"), col("x")))),
          e => e("x")).as("xs"))
        .join(stats, "event_type")
      def step(acc: Column, x: Column) = {
        val sPlus = greatest(lit(0.0),
          acc("s") + (x - col("mu") - lit(0.5) * col("sd")))
        struct(sPlus.as("s"), greatest(acc("mx"), sPlus).as("mx"))
      }
      val out = series
        .withColumn("fin", aggregate(col("xs"),
          struct(lit(0.0).as("s"), lit(0.0).as("mx")), step))
        .select(col("event_type"), size(col("xs")).as("n_days"),
          col("mu"), col("sd"),
          round(col("fin.mx"), 3).as("max_cusum"),
          (col("fin.mx") > lit(3.0) * col("sd")).cast("int").as("alarm"))
        .orderBy("event_type")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      daily.unpersist()
      ckpt
    },
    Some("""WITH RECURSIVE daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) x
           |  FROM events GROUP BY 1, 2),
           |st AS (SELECT event_type, round(avg(x), 6) mu,
           |    round(stddev_samp(x), 6) sd FROM daily GROUP BY 1),
           |idx AS (SELECT event_type, x, row_number() OVER (
           |    PARTITION BY event_type ORDER BY d) i FROM daily),
           |nn AS (SELECT event_type, max(i) n FROM idx GROUP BY 1),
           |rec(event_type, i, s, mx) AS (
           |  SELECT event_type, 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE) FROM st
           |  UNION ALL
           |  SELECT r.event_type, r.i + 1,
           |    greatest(0.0, r.s + (x.x - st.mu - 0.5 * st.sd)),
           |    greatest(r.mx, greatest(0.0, r.s + (x.x - st.mu - 0.5 * st.sd)))
           |  FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
           |  JOIN st ON st.event_type = r.event_type)
           |SELECT r.event_type, CAST(nn.n AS INT) AS n_days, st.mu, st.sd,
           |  round(r.mx, 3) AS max_cusum,
           |  CAST(r.mx > 3.0 * st.sd AS INT) AS alarm
           |FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
           |JOIN st ON st.event_type = r.event_type
           |ORDER BY r.event_type""".stripMargin))

  /** A/B experiment summary — Welch's t statistic + Cohen's d between two
    * deterministic hash arms over event values (the readout layer every
    * experimentation platform reduces to): per-arm moments come from the
    * q44 exact-integer discipline... except event values aren't
    * cents-exact, so both engines compute sums of doubles — per-arm n is
    * large and the values well-conditioned, and every derived statistic
    * rounds at 3 (accumulation discipline). The hash arm assignment is
    * md5-parity on user_id, so both engines split identically.
    */
  lazy val q247AbTest: GraftQuery = GraftQuery(
    "q247_ab_test",
    (s, dir) => {
      val arm = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2
      val ev = Tables.events(s, dir)
        .select(col("value"), arm.as("arm"))
      val st = ev.groupBy("arm").agg(count(lit(1)).as("n"),
        avg("value").as("m"), expr("var_samp(value)").as("v"))
      val a = st.filter(col("arm") === 0).select(
        col("n").as("na"), col("m").as("ma"), col("v").as("va"))
      val b = st.filter(col("arm") === 1).select(
        col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
      a.crossJoin(b).select(
        col("na"), col("nb"),
        round(col("ma"), 3).as("mean_a"), round(col("mb"), 3).as("mean_b"),
        round((col("ma") - col("mb")) /
          sqrt(col("va") / col("na") + col("vb") / col("nb")), 3).as("welch_t"),
        round((col("ma") - col("mb")) /
          sqrt(((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb")) /
            (col("na") + col("nb") - 2)), 3).as("cohens_d"))
    },
    Some("""WITH ev AS (SELECT value,
           |    CAST(concat('0x', substr(md5(user_id::VARCHAR), 1, 8)) AS BIGINT) % 2 AS arm
           |  FROM events),
           |st AS (SELECT arm, CAST(count(*) AS BIGINT) n, avg(value) m,
           |    var_samp(value) v FROM ev GROUP BY 1)
           |SELECT a.n AS na, b.n AS nb,
           |  round(a.m, 3) AS mean_a, round(b.m, 3) AS mean_b,
           |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 3) AS welch_t,
           |  round((a.m - b.m) / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
           |    / (a.n + b.n - 2)), 3) AS cohens_d
           |FROM st a, st b WHERE a.arm = 0 AND b.arm = 1""".stripMargin))

  /** Horvitz-Thompson estimation audit — the survey-sampling identity a
    * sampled pipeline bills by: with deterministic md5 inclusion at rate
    * π = 1/8, the HT estimator Σ x/π over the SAMPLE estimates the
    * population total unbiasedly; the query reports true total, HT
    * estimate, and relative error per event type. Sampling is the q52
    * hash discipline (reproducible, engine-independent); the estimator is
    * one scan of 1/8 the data — the audit quantifies exactly what that
    * 8× cost cut pays in accuracy.
    */
  lazy val q248HorvitzThompson: GraftQuery = GraftQuery(
    "q248_horvitz_thompson",
    (s, dir) => {
      val bucket = conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 8
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("value"), bucket.as("b"))
      val truth = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("true_total"))
      val est = ev.filter(col("b") === 0).groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          round(sum("value") * 8, 3).as("ht_total"))
      truth.join(est, "event_type")
        .select(col("event_type"), col("n"), col("n_sampled"),
          col("true_total"), col("ht_total"),
          round(abs(col("ht_total") - col("true_total")) / col("true_total"), 6)
            .as("rel_error"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, value,
           |    CAST(concat('0x', substr(md5(event_id::VARCHAR), 1, 8)) AS BIGINT) % 8 AS b
           |  FROM events),
           |t AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
           |    round(sum(value), 3) true_total FROM ev GROUP BY 1),
           |e AS (SELECT event_type, CAST(count(*) AS BIGINT) n_sampled,
           |    round(sum(value) * 8, 3) ht_total FROM ev WHERE b = 0 GROUP BY 1)
           |SELECT t.event_type, t.n, e.n_sampled, t.true_total, e.ht_total,
           |  round(abs(e.ht_total - t.true_total) / t.true_total, 6) AS rel_error
           |FROM t JOIN e USING (event_type) ORDER BY 1""".stripMargin))

  /** Grouped variance through the custom mergeable Welford/Chan Aggregator
    * ([[graft.functions.WelfordVariance]]) — q44 solved cross-engine
    * stddev by exact integer sums (possible because the fixture columns
    * are cents-exact); this registers the GENERAL-case path for columns
    * with no exact representation: conditioned (n, mean, M2) state,
    * associative partition merges, constant per-group buffer. The oracle
    * uses DuckDB's stddev_samp; both sides agree to well under the 4-digit
    * rounding because neither formulation cancels catastrophically on
    * this value range (WelfordSpec pins partitioning-invariance — the
    * merge property the operator exists for).
    */
  lazy val q241WelfordVariance: GraftQuery = GraftQuery(
    "q241_welford_variance",
    (s, dir) => {
      val wvar = udaf(new graft.functions.WelfordVariance)
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(wvar(col("value")).as("w"))
        .select(col("event_type"), col("w._1").as("n"),
          round(col("w._2"), 4).as("mean_value"),
          round(col("w._3"), 4).as("stddev_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(avg(value), 4) AS mean_value,
           |  round(stddev_samp(value), 4) AS stddev_value
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))
}
