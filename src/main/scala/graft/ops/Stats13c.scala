package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-13 continuation statistics batch II: the three inference shapes
  * the engine's experiment/audit surface still lacked — a full r×c
  * contingency test with effect size (q388, next to q223's NMI and q206's
  * one-way Benford terms), covariate-adjustment for confounded
  * observational comparisons (q392, next to q247's randomized Welch t and
  * q381's DiD), and Wald's sequential probability ratio test (q394, the
  * always-valid early-stopping rule q247's fixed-horizon test cannot
  * give).
  *
  * Shared discipline: every corpus-scale aggregate is an exact integer;
  * the only float arithmetic happens on BOUNDED frames (≤|langs×sources|
  * cells, 4 strata, ≤|calendar days| rows) inside single fixed-order
  * expressions, so cross-engine doubles are bit-identical (the q381/q385
  * convention).
  */
object Stats13c {

  /** q388 — Pearson chi-square test of independence over the lang×source
    * contingency table, with Cramér's V effect size (the association
    * strength screen a corpus curator runs before trusting per-facet
    * stratification; q223 measures the same dependence in bits, this is
    * the classical test statistic form).
    *
    * Integer-exact path: per-cell observed counts O, row/col totals R, C
    * and N are exact BIGINTs aggregated from ONE partial-agg scan; each
    * cell's term enters as round(10⁶·(O·N − R·C)²/(N·R·C)) — a single
    * IEEE division+round per cell from exact integers — and the
    * chi-square is the exact integer SUM of those micro-terms (order-free,
    * the q385 discipline). Overflow bound: O·N − R·C ≤ 2N², exact as a
    * double while 2N² < 2⁵³ → N ≤ 6.7·10⁷ rows per facet pair; beyond
    * that, promote num to DECIMAL(38,0) (the q363 pattern) — documented,
    * not silently wrapped. Cramér's V = sqrt(χ²/(N·min(r−1,c−1))): sqrt
    * is IEEE-correctly-rounded, so the final doubles match bit-for-bit.
    *
    * Scale shape: one groupBy to ≤|langs|·|sources| cells, re-aggregated
    * (never rescanned) for margins, broadcast-joined back; everything
    * after the first partial agg runs on the bounded cell frame.
    */
  val q388Chi2CramersV = GraftQuery(
    "q388_chi2_cramers_v",
    (s, dir) => {
      val cells = Tables.documents(s, dir)
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        .localCheckpoint()
      val rows = cells.groupBy("lang").agg(sum("o").as("r"))
      val cols = cells.groupBy("source").agg(sum("o").as("c"))
      val tot = cells.agg(sum("o").as("n"),
        countDistinct("lang").as("nr"), countDistinct("source").as("nc"))
      val terms = cells
        .join(broadcast(rows), "lang")
        .join(broadcast(cols), "source")
        .crossJoin(broadcast(tot))
        .withColumn("num",
          col("o") * col("n") - col("r") * col("c"))
        .withColumn("term_micro",
          round(col("num").cast("double") * col("num").cast("double") /
            (col("n").cast("double") * col("r").cast("double") *
              col("c").cast("double")) * lit(1e6), 0).cast("long"))
      terms.groupBy("n", "nr", "nc")
        .agg(sum("term_micro").as("chi2_micro"))
        .select(col("n"), col("nr"), col("nc"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          col("chi2_micro"),
          round(col("chi2_micro").cast("double") / lit(1e6), 4).as("chi2"),
          round(sqrt(col("chi2_micro").cast("double") / lit(1e6) /
            (col("n").cast("double") *
              least(col("nr") - 1, col("nc") - 1).cast("double"))), 6)
            .as("cramers_v"))
    },
    Some("""WITH cells AS (
           |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           |  FROM documents GROUP BY 1, 2),
           |rws AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
           |  FROM cells GROUP BY 1),
           |cls AS (SELECT source, CAST(sum(o) AS BIGINT) AS c
           |  FROM cells GROUP BY 1),
           |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
           |  CAST(count(DISTINCT lang) AS BIGINT) AS nr,
           |  CAST(count(DISTINCT source) AS BIGINT) AS nc FROM cells),
           |terms AS (
           |  SELECT tot.n, tot.nr, tot.nc,
           |    cells.o * tot.n - rws.r * cls.c AS num,
           |    CAST(round(CAST(cells.o * tot.n - rws.r * cls.c AS DOUBLE)
           |      * CAST(cells.o * tot.n - rws.r * cls.c AS DOUBLE)
           |      / (CAST(tot.n AS DOUBLE) * CAST(rws.r AS DOUBLE)
           |        * CAST(cls.c AS DOUBLE)) * 1e6, 0) AS BIGINT)
           |      AS term_micro
           |  FROM cells
           |  JOIN rws USING (lang)
           |  JOIN cls USING (source)
           |  CROSS JOIN tot)
           |SELECT n, nr, nc, (nr - 1) * (nc - 1) AS dof,
           |  CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
           |  round(CAST(sum(term_micro) AS DOUBLE) / 1e6, 4) AS chi2,
           |  round(sqrt(CAST(sum(term_micro) AS DOUBLE) / 1e6
           |    / (CAST(n AS DOUBLE)
           |      * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 6) AS cramers_v
           |FROM terms GROUP BY n, nr, nc""".stripMargin))

  /** q392 — post-stratification adjustment for a confounded observational
    * comparison (the design-based sibling of propensity weighting:
    * stratify on the confounder, difference within strata, recombine at
    * the POPULATION stratum shares — Cochran 1968). The fixture plants
    * the full causal structure as disclosed ground truth: the base
    * outcome is the user's purchase total in 10-dollar units (base div
    * 1000 cents — scaled so idiosyncratic spend noise doesn't swamp the
    * planted structure), stratum = user_id % 4 shifts it by 500·stratum,
    * treatment propensity rises with the stratum (md5 % 100 <
    * 20 + 20·stratum — md5 is the engines' shared deterministic
    * randomness), and the true effect is exactly +200. The naive
    * treated-vs-control gap is therefore biased upward by roughly the
    * treated−control mean-stratum gap × 500 (measured ≈ +370 at sf0.01);
    * the stratified estimator lands within sampling error of the planted
    * 200.
    *
    * Exactness: per-(stratum, arm) outcome sums and counts are exact
    * BIGINT cents from one partial-agg scan; naive and adjusted estimates
    * are each ONE fixed-order double expression over those 16 integers
    * (s0 → s3 literal order — no float accumulation across data-dependent
    * order), rounded at 4. Strata missing either arm are EXCLUDED and the
    * stratum shares renormalized over the covered strata — the standard
    * common-support restriction (at sf0.001's 15 users two cells are
    * empty and the estimator reports n_covered_strata = 2; from sf0.01 up
    * all four strata are covered).
    *
    * Scale shape: one user-level partial agg (purchase cents per user),
    * map-side stratum/arm/outcome derivation, one 16-column conditional
    * aggregate to a single row. No window, no join.
    */
  val q392PostStratification = GraftQuery(
    "q392_post_stratification",
    (s, dir) => {
      val users = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long"))), lit(0L)).as("base"))
        .withColumn("stratum", pmod(col("user_id"), lit(4)).cast("int"))
        .withColumn("treated",
          (conv(substring(md5(concat(lit("t"),
            col("user_id").cast("string"))), 1, 8), 16, 10).cast("long") % 100
            < lit(20) + lit(20) * col("stratum")).cast("int"))
        .withColumn("y",
          expr("base div 1000") + lit(500L) * col("stratum") +
            lit(200L) * col("treated"))
      def cnt(st: Int, tr: Int) =
        sum(when(col("stratum") === st && col("treated") === tr, 1L)
          .otherwise(0L))
      def sy(st: Int, tr: Int) =
        sum(when(col("stratum") === st && col("treated") === tr, col("y"))
          .otherwise(0L))
      val aggCols = Seq(
        sum("treated").cast("long").as("n_treated"),
        sum(when(col("treated") === 1, col("y")).otherwise(0L)).as("sy1"),
        sum(when(col("treated") === 0, col("y")).otherwise(0L)).as("sy0")) ++
        (0 to 3).flatMap(st => Seq(
          cnt(st, 1).as(s"n${st}t"), cnt(st, 0).as(s"n${st}c"),
          sy(st, 1).as(s"s${st}t"), sy(st, 0).as(s"s${st}c")))
      val aggd = users.agg(count(lit(1)).as("n_users"), aggCols: _*)
      def cov(st: Int) = col(s"n${st}t") > 0 && col(s"n${st}c") > 0
      def d(st: Int) = when(cov(st),
        col(s"s${st}t").cast("double") / col(s"n${st}t").cast("double") -
          col(s"s${st}c").cast("double") / col(s"n${st}c").cast("double"))
        .otherwise(0.0)
      def ns(st: Int) = when(cov(st),
        (col(s"n${st}t") + col(s"n${st}c")).cast("double")).otherwise(0.0)
      aggd.select(col("n_users"), col("n_treated"),
        (cov(0).cast("long") + cov(1).cast("long") + cov(2).cast("long") +
          cov(3).cast("long")).as("n_covered_strata"),
        round(col("sy1").cast("double") / col("n_treated").cast("double") -
          col("sy0").cast("double") /
            (col("n_users") - col("n_treated")).cast("double"), 4)
          .as("naive_diff"),
        round((ns(0) * d(0) + ns(1) * d(1) + ns(2) * d(2) + ns(3) * d(3)) /
          (ns(0) + ns(1) + ns(2) + ns(3)), 4).as("adjusted_diff"),
        lit(200L).as("planted_effect"))
    },
    Some("""WITH u AS (
           |  SELECT user_id,
           |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
           |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)
           |      AS base
           |  FROM events GROUP BY 1),
           |ua AS (
           |  SELECT user_id, base,
           |    CAST(user_id % 4 AS INT) AS stratum,
           |    CASE WHEN CAST(concat('0x', substr(md5('t'
           |        || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
           |        < 20 + 20 * (user_id % 4)
           |      THEN 1 ELSE 0 END AS treated
           |  FROM u),
           |uy AS (
           |  SELECT stratum, treated,
           |    base // 1000 + 500 * stratum + 200 * treated AS y
           |  FROM ua),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_users,
           |    CAST(sum(treated) AS BIGINT) AS n_treated,
           |    CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
           |      AS sy1,
           |    CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
           |      AS sy0,
           |    CAST(sum(CASE WHEN stratum = 0 AND treated = 1 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n0t,
           |    CAST(sum(CASE WHEN stratum = 0 AND treated = 0 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n0c,
           |    CAST(sum(CASE WHEN stratum = 0 AND treated = 1 THEN y ELSE 0
           |      END) AS BIGINT) AS s0t,
           |    CAST(sum(CASE WHEN stratum = 0 AND treated = 0 THEN y ELSE 0
           |      END) AS BIGINT) AS s0c,
           |    CAST(sum(CASE WHEN stratum = 1 AND treated = 1 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n1t,
           |    CAST(sum(CASE WHEN stratum = 1 AND treated = 0 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n1c,
           |    CAST(sum(CASE WHEN stratum = 1 AND treated = 1 THEN y ELSE 0
           |      END) AS BIGINT) AS s1t,
           |    CAST(sum(CASE WHEN stratum = 1 AND treated = 0 THEN y ELSE 0
           |      END) AS BIGINT) AS s1c,
           |    CAST(sum(CASE WHEN stratum = 2 AND treated = 1 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n2t,
           |    CAST(sum(CASE WHEN stratum = 2 AND treated = 0 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n2c,
           |    CAST(sum(CASE WHEN stratum = 2 AND treated = 1 THEN y ELSE 0
           |      END) AS BIGINT) AS s2t,
           |    CAST(sum(CASE WHEN stratum = 2 AND treated = 0 THEN y ELSE 0
           |      END) AS BIGINT) AS s2c,
           |    CAST(sum(CASE WHEN stratum = 3 AND treated = 1 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n3t,
           |    CAST(sum(CASE WHEN stratum = 3 AND treated = 0 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n3c,
           |    CAST(sum(CASE WHEN stratum = 3 AND treated = 1 THEN y ELSE 0
           |      END) AS BIGINT) AS s3t,
           |    CAST(sum(CASE WHEN stratum = 3 AND treated = 0 THEN y ELSE 0
           |      END) AS BIGINT) AS s3c
           |  FROM uy)
           |SELECT n_users, n_treated,
           |  CAST((CASE WHEN n0t > 0 AND n0c > 0 THEN 1 ELSE 0 END)
           |    + (CASE WHEN n1t > 0 AND n1c > 0 THEN 1 ELSE 0 END)
           |    + (CASE WHEN n2t > 0 AND n2c > 0 THEN 1 ELSE 0 END)
           |    + (CASE WHEN n3t > 0 AND n3c > 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_covered_strata,
           |  round(CAST(sy1 AS DOUBLE) / CAST(n_treated AS DOUBLE)
           |    - CAST(sy0 AS DOUBLE) / CAST(n_users - n_treated AS DOUBLE),
           |    4) AS naive_diff,
           |  round((CASE WHEN n0t > 0 AND n0c > 0
           |      THEN CAST(n0t + n0c AS DOUBLE)
           |        * (CAST(s0t AS DOUBLE) / CAST(n0t AS DOUBLE)
           |          - CAST(s0c AS DOUBLE) / CAST(n0c AS DOUBLE))
           |      ELSE 0.0 END
           |    + CASE WHEN n1t > 0 AND n1c > 0
           |      THEN CAST(n1t + n1c AS DOUBLE)
           |        * (CAST(s1t AS DOUBLE) / CAST(n1t AS DOUBLE)
           |          - CAST(s1c AS DOUBLE) / CAST(n1c AS DOUBLE))
           |      ELSE 0.0 END
           |    + CASE WHEN n2t > 0 AND n2c > 0
           |      THEN CAST(n2t + n2c AS DOUBLE)
           |        * (CAST(s2t AS DOUBLE) / CAST(n2t AS DOUBLE)
           |          - CAST(s2c AS DOUBLE) / CAST(n2c AS DOUBLE))
           |      ELSE 0.0 END
           |    + CASE WHEN n3t > 0 AND n3c > 0
           |      THEN CAST(n3t + n3c AS DOUBLE)
           |        * (CAST(s3t AS DOUBLE) / CAST(n3t AS DOUBLE)
           |          - CAST(s3c AS DOUBLE) / CAST(n3c AS DOUBLE))
           |      ELSE 0.0 END)
           |    / (CASE WHEN n0t > 0 AND n0c > 0
           |        THEN CAST(n0t + n0c AS DOUBLE) ELSE 0.0 END
           |      + CASE WHEN n1t > 0 AND n1c > 0
           |        THEN CAST(n1t + n1c AS DOUBLE) ELSE 0.0 END
           |      + CASE WHEN n2t > 0 AND n2c > 0
           |        THEN CAST(n2t + n2c AS DOUBLE) ELSE 0.0 END
           |      + CASE WHEN n3t > 0 AND n3c > 0
           |        THEN CAST(n3t + n3c AS DOUBLE) ELSE 0.0 END), 4)
           |    AS adjusted_diff,
           |  CAST(200 AS BIGINT) AS planted_effect
           |FROM a""".stripMargin))

  /** SPRT constants, computed ONCE here and spliced into BOTH engines as
    * identical integer literals — no transcendental function ever runs
    * inside either engine, so the decision path is integer-exact
    * end-to-end (the q385 "no float touches the reject decision"
    * discipline applied to sequential testing). H0: p = 0.40 (the
    * fixture's measured per-user-day purchase rate), H1: p = 0.48,
    * α = β = 0.05.
    */
  private val sprtW1: Long = math.round(math.log(0.48 / 0.40) * 1e6) // per success
  private val sprtW0: Long = math.round(math.log(0.52 / 0.60) * 1e6) // per failure
  private val sprtA: Long = math.round(math.log(0.95 / 0.05) * 1e6) // reject H0 above
  private val sprtB: Long = math.round(math.log(0.05 / 0.95) * 1e6) // accept H0 below

  /** q394 — Wald sequential probability ratio test over daily conversion
    * cohorts (Wald 1945): the early-stopping A/B rule that monitors the
    * cumulative log-likelihood ratio after every day and stops the moment
    * either error bound is crossed, instead of waiting for q247's fixed
    * horizon. Unit = user-day (a user active that day), success = that
    * user purchased that day; arm = md5 parity. Arm 1 carries a planted
    * lift (an extra success when md5('lift'…) % 8 = 0 on otherwise
    * unconverted user-days ⇒ rate ≈ 0.40 + 0.60/8 ≈ 0.475), disclosed
    * ground truth: arm 1 should cross the REJECT-H0 bound, arm 0 should
    * drift toward ACCEPT-H0.
    *
    * Exactness: daily (trials, successes) are exact distinct counts; the
    * LLR is successes·w1 + failures·w0 with w1/w0/A/B integer micro-nat
    * LITERALS precomputed at build time (see [[sprtW1]]) — the cumulative
    * sum, bound comparisons, and crossing-day argmin are all BIGINT.
    *
    * Scale shape: corpus-scale work is one (user, day) partial agg + one
    * (arm, day) agg; the cumulative window runs on the ≤2·|calendar days|
    * row frame, partitioned by arm and CALENDAR-BOUNDED (the q246/q381
    * frame discipline — never corpus-sized). Decision extraction is a
    * conditional min over the same bounded frame.
    */
  val q394Sprt = GraftQuery(
    "q394_sprt",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ud = Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .groupBy("user_id", "day")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("purch"))
        .withColumn("arm",
          (conv(substring(md5(concat(lit("arm"),
            col("user_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2)
            .cast("int"))
        .withColumn("succ",
          greatest(col("purch"),
            when(col("arm") === 1 &&
              conv(substring(md5(concat_ws("_", lit("lift"),
                col("user_id").cast("string"), col("day").cast("string"))),
                1, 8), 16, 10).cast("long") % 8 === 0, 1).otherwise(0)))
      val daily = ud.groupBy("arm", "day")
        .agg(count(lit(1)).as("t"), sum("succ").cast("long").as("sc"))
        .localCheckpoint() // ≤ 2 · |calendar days| rows
      val w = Window.partitionBy("arm").orderBy("day")
      val cum = daily
        .withColumn("cum_t", sum("t").over(w))
        .withColumn("cum_s", sum("sc").over(w))
        .withColumn("llr_micro",
          col("cum_s") * lit(sprtW1) +
            (col("cum_t") - col("cum_s")) * lit(sprtW0))
      cum.groupBy("arm")
        .agg(count(lit(1)).as("n_days"),
          max("cum_t").as("trials"),
          max("cum_s").as("successes"),
          max_by(col("llr_micro"), col("day")).as("llr_final_micro"),
          min(when(col("llr_micro") >= sprtA, col("day"))).as("up_day"),
          min(when(col("llr_micro") <= sprtB, col("day"))).as("dn_day"))
        .select(col("arm"), col("n_days"), col("trials"), col("successes"),
          col("llr_final_micro"),
          when(col("up_day").isNotNull &&
            (col("dn_day").isNull || col("up_day") <= col("dn_day")),
            lit("reject_h0"))
            .when(col("dn_day").isNotNull, lit("accept_h0"))
            .otherwise(lit("continue")).as("decision"),
          coalesce(when(col("up_day").isNotNull &&
            (col("dn_day").isNull || col("up_day") <= col("dn_day")),
            col("up_day")).otherwise(col("dn_day")).cast("string"),
            lit("")).as("decision_day"))
        .orderBy("arm")
    },
    Some(s"""WITH ud AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS purch
           |  FROM events GROUP BY 1, 2),
           |ua AS (
           |  SELECT user_id, day, purch,
           |    CAST(CAST(concat('0x', substr(md5('arm'
           |      || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS INT)
           |      AS arm
           |  FROM ud),
           |us AS (
           |  SELECT arm, day,
           |    greatest(purch, CASE WHEN arm = 1
           |      AND CAST(concat('0x', substr(md5('lift_'
           |        || CAST(user_id AS VARCHAR) || '_'
           |        || strftime(day, '%Y-%m-%d')), 1, 8)) AS BIGINT) % 8 = 0
           |      THEN 1 ELSE 0 END) AS succ
           |  FROM ua),
           |daily AS (
           |  SELECT arm, day, CAST(count(*) AS BIGINT) AS t,
           |    CAST(sum(succ) AS BIGINT) AS sc
           |  FROM us GROUP BY 1, 2),
           |cum AS (
           |  SELECT arm, day,
           |    sum(t) OVER (PARTITION BY arm ORDER BY day) AS cum_t,
           |    sum(sc) OVER (PARTITION BY arm ORDER BY day) AS cum_s
           |  FROM daily),
           |llr AS (
           |  SELECT arm, day, cum_t, cum_s,
           |    cum_s * ($sprtW1) + (cum_t - cum_s) * ($sprtW0)
           |      AS llr_micro
           |  FROM cum),
           |agg AS (
           |  SELECT arm, CAST(count(*) AS BIGINT) AS n_days,
           |    CAST(max(cum_t) AS BIGINT) AS trials,
           |    CAST(max(cum_s) AS BIGINT) AS successes,
           |    CAST(arg_max(llr_micro, day) AS BIGINT) AS llr_final_micro,
           |    min(CASE WHEN llr_micro >= ($sprtA) THEN day END) AS up_day,
           |    min(CASE WHEN llr_micro <= ($sprtB) THEN day END) AS dn_day
           |  FROM llr GROUP BY 1)
           |SELECT arm, n_days, trials, successes, llr_final_micro,
           |  CASE WHEN up_day IS NOT NULL
           |      AND (dn_day IS NULL OR up_day <= dn_day) THEN 'reject_h0'
           |    WHEN dn_day IS NOT NULL THEN 'accept_h0'
           |    ELSE 'continue' END AS decision,
           |  coalesce(CASE WHEN up_day IS NOT NULL
           |      AND (dn_day IS NULL OR up_day <= dn_day)
           |      THEN strftime(up_day, '%Y-%m-%d')
           |      ELSE strftime(dn_day, '%Y-%m-%d') END, '')
           |    AS decision_day
           |FROM agg ORDER BY arm""".stripMargin))

  /** q386 — trimmed and winsorized means per event type: the robust
    * location estimates between q199's median/MAD (fully rank-based) and
    * the raw mean (fully outlier-exposed) — trim drops the tails beyond
    * the exact 5th/95th percentiles, winsorize CLAMPS them there (Tukey;
    * the standard treatment for heavy-tailed revenue/latency columns
    * before averaging).
    *
    * Exactness: values are integer cents; the exact per-type percentiles
    * come from [[ScaleFrames.groupedQuantileWideDomain]] (the q199
    * machinery — never a per-group percentile merge on one reducer) and
    * are then rounded to INTEGER cents, so the trim filter, the clamp,
    * and every sum run in pure BIGINT — no float accumulates anywhere,
    * and the three means are single final divisions rounded at 4.
    *
    * Scale shape: two grouped-quantile passes (each: per-(type, value)
    * partial agg + two-level cumulation), a broadcast threshold join
    * (|types| rows), one partial agg. No corpus-sized window, no collect.
    */
  val q386TrimmedWinsorized = GraftQuery(
    "q386_trimmed_winsorized",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val t05 = ScaleFrames.groupedQuantileWideDomain(
        ev, "event_type", "cents", 512.0, 0.05, "t05raw")
        .select(col("event_type").as("k05"),
          round(col("t05raw"), 0).cast("long").as("t05"))
      val t95 = ScaleFrames.groupedQuantileWideDomain(
        ev, "event_type", "cents", 512.0, 0.95, "t95raw")
        .select(col("event_type").as("k95"),
          round(col("t95raw"), 0).cast("long").as("t95"))
      ev.join(broadcast(t05), col("event_type") === col("k05"))
        .join(broadcast(t95), col("event_type") === col("k95"))
        .withColumn("w", least(greatest(col("cents"), col("t05")), col("t95")))
        .withColumn("kept",
          (col("cents") >= col("t05") && col("cents") <= col("t95"))
            .cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum((col("cents") < col("t05")).cast("long")).as("n_below"),
          sum((col("cents") > col("t95")).cast("long")).as("n_above"),
          max("t05").as("t05_cents"), max("t95").as("t95_cents"),
          round(sum("cents").cast("double") / count(lit(1)).cast("double"),
            4).as("mean_cents"),
          round(sum(when(col("kept") === 1, col("cents")).otherwise(0L))
            .cast("double") / sum("kept").cast("double"), 4)
            .as("trimmed_mean_cents"),
          round(sum("w").cast("double") / count(lit(1)).cast("double"), 4)
            .as("winsorized_mean_cents"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type,
           |    CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events),
           |th AS (
           |  SELECT event_type,
           |    CAST(round(quantile_cont(cents, 0.05), 0) AS BIGINT) AS t05,
           |    CAST(round(quantile_cont(cents, 0.95), 0) AS BIGINT) AS t95
           |  FROM ev GROUP BY 1),
           |j AS (
           |  SELECT ev.event_type, ev.cents, th.t05, th.t95,
           |    least(greatest(ev.cents, th.t05), th.t95) AS w,
           |    CASE WHEN ev.cents >= th.t05 AND ev.cents <= th.t95
           |      THEN 1 ELSE 0 END AS kept
           |  FROM ev JOIN th USING (event_type))
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN cents < t05 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_below,
           |  CAST(sum(CASE WHEN cents > t95 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_above,
           |  max(t05) AS t05_cents, max(t95) AS t95_cents,
           |  round(CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
           |    AS mean_cents,
           |  round(CAST(sum(CASE WHEN kept = 1 THEN cents ELSE 0 END)
           |    AS DOUBLE) / CAST(sum(kept) AS DOUBLE), 4)
           |    AS trimmed_mean_cents,
           |  round(CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
           |    AS winsorized_mean_cents
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q386TrimmedWinsorized, q388Chi2CramersV, q392PostStratification,
      q394Sprt)
}
