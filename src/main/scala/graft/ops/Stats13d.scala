package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-13 fourth-batch statistics I: consensus-based robust regression
  * (RANSAC — Fischler & Bolles 1981) and the stratified 2×2 association
  * test (Cochran-Mantel-Haenszel; Mantel & Haenszel 1959) with the MH
  * common odds ratio — the categorical-outcome sibling of q392's
  * continuous post-stratification.
  */
object Stats13d {

  /** Planted-line point cloud from the event stream (disclosed ground
    * truth, the q392/q394 discipline): x = event_id % 200; 80% of points
    * (md5-chosen) sit on y = 3x + 70 ± 5, the rest are uniform junk in
    * [1, 600]. Exactly the contamination regime where least squares
    * breaks and RANSAC's consensus count doesn't.
    */
  private def pointsFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, dir).select(col("event_id").as("id"))
      .withColumn("x", pmod(col("id"), lit(200L)))
      .withColumn("hin",
        conv(substring(md5(concat(lit("in"), col("id").cast("string"))),
          1, 8), 16, 10).cast("long") % 10)
      .withColumn("y",
        when(col("hin") < 8,
          lit(3L) * col("x") + 70 +
            conv(substring(md5(concat(lit("ns"), col("id").cast("string"))),
              1, 8), 16, 10).cast("long") % 11 - 5)
          .otherwise(conv(substring(md5(concat(lit("out"),
            col("id").cast("string"))), 1, 8), 16, 10).cast("long") % 600
            + 1))
      .withColumn("hsel",
        substring(md5(concat(lit("hsel"), col("id").cast("string"))), 1, 16))
      .select("id", "x", "y", "hsel")

  /** q396 — RANSAC line fit. 32 hypotheses come from a DETERMINISTIC
    * 64-point sample (the md5-ordered top-64, a TakeOrderedAndProject —
    * never a corpus-order dependence), consecutive pairs forming the
    * minimal sets; the driver holds only those 64 rows (the q328/q339
    * bounded-pick discipline) while the oracle derives the SAME pairs
    * with a QUALIFY rank. Every hypothesis is a RATIONAL line
    * (b = Δy/Δx, a·den kept as integers), so the inlier test
    * |y·den − (num·x + a_num)| ≤ 6·|den| is pure BIGINT — no float
    * touches the consensus count. The winner (max inliers, tie → lowest
    * hypothesis id) is REFIT by exact-integer least squares on its
    * consensus set (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from BIGINT
    * sums, the q87 drift-proof form), landing within noise of the
    * planted (3, 70) while the all-points LSQ fit — also reported — is
    * dragged off by the 20% junk.
    *
    * Scale shape: one TakeOrdered sample, one broadcast of ≤32 hypothesis
    * rows against one point scan (map-side 32× fan-out inside a partial
    * agg), one ≤32-row argmax, one refit scan. No corpus window, no
    * unbounded collect.
    */
  val q396RansacLine = GraftQuery(
    "q396_ransac_line",
    (s, dir) => {
      // pointsFrame computes 3 md5s per event row and is scanned THREE
      // times (sample pick, hypothesis scoring, winner refit) — persist so
      // the hash synthesis runs once and the two scoring passes read the
      // cached (id, x, y, hsel) rows (guide §5: cache the reused expensive
      // intermediate; ~32 bytes/row, corpus-linear)
      val pts = pointsFrame(s, dir).persist()
      val samp = pts.orderBy(col("hsel"), col("id")).limit(64)
        .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
      val hyps = samp.grouped(2).zipWithIndex.collect {
        case (Array((x1, y1), (x2, y2)), k) if x1 != x2 =>
          val bn = y2 - y1
          val bd = x2 - x1
          (k.toLong, bn, bd, y1 * bd - bn * x1)
      }.toSeq
      import s.implicits._
      val hypDf = hyps.toDF("k", "bnum", "bden", "anum")
      val scoredPts = pts.crossJoin(broadcast(hypDf))
        .withColumn("resid",
          col("y") * col("bden") - col("bnum") * col("x") - col("anum"))
        .withColumn("inlier",
          (abs(col("resid")) <= lit(6L) * abs(col("bden"))).cast("long"))
      val best = scoredPts.groupBy("k", "bnum", "bden", "anum")
        .agg(sum("inlier").as("n_inliers"))
        .orderBy(col("n_inliers").desc, col("k")).limit(1)
        .withColumnRenamed("k", "bk")
      val refit = pts.crossJoin(broadcast(best))
        .withColumn("inlier",
          (abs(col("y") * col("bden") - col("bnum") * col("x") -
            col("anum")) <= lit(6L) * abs(col("bden"))).cast("long"))
        .agg(count(lit(1)).as("n_points"),
          max("bk").as("best_k"),
          max("n_inliers").as("n_inliers"),
          round(max(col("bnum").cast("double") / col("bden").cast("double")),
            6).as("slope_sample"),
          sum(when(col("inlier") === 1, col("x"))).as("sx"),
          sum(when(col("inlier") === 1, col("y"))).as("sy"),
          sum(when(col("inlier") === 1, col("x") * col("y"))).as("sxy"),
          sum(when(col("inlier") === 1, col("x") * col("x"))).as("sxx"),
          sum("inlier").as("ni"),
          sum("x").as("tx"), sum("y").as("ty"),
          sum(col("x") * col("y")).as("txy"),
          sum(col("x") * col("x")).as("txx"))
      refit.select(col("n_points"), col("best_k"), col("n_inliers"),
        round(col("n_inliers").cast("double") /
          col("n_points").cast("double"), 6).as("inlier_share"),
        col("slope_sample"),
        round((col("ni") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("ni") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("slope_refit"),
        round((col("sy").cast("double") -
          (col("ni") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("ni") * col("sxx") - col("sx") * col("sx")).cast("double") *
            col("sx").cast("double")) / col("ni").cast("double"), 6)
          .as("intercept_refit"),
        round((col("n_points") * col("txy") - col("tx") * col("ty"))
          .cast("double") /
          (col("n_points") * col("txx") - col("tx") * col("tx"))
            .cast("double"), 6).as("slope_naive_lsq"),
        lit(3L).as("planted_slope"), lit(70L).as("planted_intercept"))
    },
    Some("""WITH pts AS MATERIALIZED (
           |  SELECT event_id AS id,
           |    event_id % 200 AS x,
           |    CASE WHEN CAST(concat('0x', substr(md5('in'
           |        || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
           |      THEN 3 * (event_id % 200) + 70
           |        + CAST(concat('0x', substr(md5('ns'
           |          || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 11
           |        - 5
           |      ELSE CAST(concat('0x', substr(md5('out'
           |        || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 600
           |        + 1 END AS y,
           |    substr(md5('hsel' || CAST(event_id AS VARCHAR)), 1, 16)
           |      AS hsel
           |  FROM events),
           |samp AS (
           |  SELECT x, y, row_number() OVER (ORDER BY hsel, id) AS rn
           |  FROM pts QUALIFY rn <= 64),
           |hyps AS (
           |  SELECT CAST((a.rn - 1) // 2 AS BIGINT) AS k,
           |    b.y - a.y AS bnum, b.x - a.x AS bden,
           |    a.y * (b.x - a.x) - (b.y - a.y) * a.x AS anum
           |  FROM samp a JOIN samp b
           |    ON b.rn = a.rn + 1 AND a.rn % 2 = 1 AND a.x <> b.x),
           |scored AS (
           |  SELECT h.k, h.bnum, h.bden, h.anum,
           |    CAST(sum(CASE WHEN abs(p.y * h.bden - h.bnum * p.x - h.anum)
           |      <= 6 * abs(h.bden) THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_inliers
           |  FROM pts p CROSS JOIN hyps h
           |  GROUP BY 1, 2, 3, 4),
           |best AS (
           |  SELECT * FROM scored ORDER BY n_inliers DESC, k LIMIT 1),
           |refit AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_points,
           |    max(b.k) AS best_k, max(b.n_inliers) AS n_inliers,
           |    round(max(CAST(b.bnum AS DOUBLE) / CAST(b.bden AS DOUBLE)),
           |      6) AS slope_sample,
           |    CAST(sum(CASE WHEN abs(p.y * b.bden - b.bnum * p.x - b.anum)
           |      <= 6 * abs(b.bden) THEN p.x ELSE 0 END) AS BIGINT) AS sx,
           |    CAST(sum(CASE WHEN abs(p.y * b.bden - b.bnum * p.x - b.anum)
           |      <= 6 * abs(b.bden) THEN p.y ELSE 0 END) AS BIGINT) AS sy,
           |    CAST(sum(CASE WHEN abs(p.y * b.bden - b.bnum * p.x - b.anum)
           |      <= 6 * abs(b.bden) THEN p.x * p.y ELSE 0 END) AS BIGINT)
           |      AS sxy,
           |    CAST(sum(CASE WHEN abs(p.y * b.bden - b.bnum * p.x - b.anum)
           |      <= 6 * abs(b.bden) THEN p.x * p.x ELSE 0 END) AS BIGINT)
           |      AS sxx,
           |    CAST(sum(CASE WHEN abs(p.y * b.bden - b.bnum * p.x - b.anum)
           |      <= 6 * abs(b.bden) THEN 1 ELSE 0 END) AS BIGINT) AS ni,
           |    CAST(sum(p.x) AS BIGINT) AS tx,
           |    CAST(sum(p.y) AS BIGINT) AS ty,
           |    CAST(sum(p.x * p.y) AS BIGINT) AS txy,
           |    CAST(sum(p.x * p.x) AS BIGINT) AS txx
           |  FROM pts p CROSS JOIN best b)
           |SELECT n_points, best_k, n_inliers,
           |  round(CAST(n_inliers AS DOUBLE) / CAST(n_points AS DOUBLE), 6)
           |    AS inlier_share,
           |  slope_sample,
           |  round(CAST(ni * sxy - sx * sy AS DOUBLE)
           |    / CAST(ni * sxx - sx * sx AS DOUBLE), 6) AS slope_refit,
           |  round((CAST(sy AS DOUBLE)
           |    - CAST(ni * sxy - sx * sy AS DOUBLE)
           |      / CAST(ni * sxx - sx * sx AS DOUBLE)
           |      * CAST(sx AS DOUBLE)) / CAST(ni AS DOUBLE), 6)
           |    AS intercept_refit,
           |  round(CAST(n_points * txy - tx * ty AS DOUBLE)
           |    / CAST(n_points * txx - tx * tx AS DOUBLE), 6)
           |    AS slope_naive_lsq,
           |  CAST(3 AS BIGINT) AS planted_slope,
           |  CAST(70 AS BIGINT) AS planted_intercept
           |FROM refit""".stripMargin))

  /** The planted per-(stratum, exposure) outcome thresholds (per-mille),
    * computed ONCE from baseline p_s = 0.10 + 0.03·s and a common odds
    * ratio 2.5, spliced into both engines as literals — the q394
    * constants discipline.
    */
  private val cmhThresholds: Seq[(Int, Long, Long)] = (0 to 4).map { st =>
    val p0 = 0.10 + 0.03 * st
    val odds1 = 2.5 * p0 / (1 - p0)
    val p1 = odds1 / (1 + odds1)
    (st, math.round(1000 * p0), math.round(1000 * p1))
  }

  /** q398 — Cochran-Mantel-Haenszel stratified 2×2 test + MH common odds
    * ratio over customers (stratum = nationkey % 5, exposure and outcome
    * md5-planted with a TRUE common OR of 2.5 against stratum-rising
    * baselines — disclosed ground truth). Per-stratum cells are exact
    * integers from one partial agg; the CMH accumulations Σ(a − E_s) and
    * ΣV_s and the MH sums Σ(ad/n), Σ(bc/n) enter as per-stratum
    * micro-integers (round once, then BIGINT sums — the q388 cell
    * discipline), so the statistic and OR̂_MH are order-free. Overflow
    * bound: r·c products stay exact doubles while n_s < 6.7·10⁷ per
    * stratum (the q388 bound), documented not wrapped.
    *
    * Scale shape: one scan → ≤5 stratum cell rows; everything downstream
    * is arithmetic on that bounded frame.
    */
  val q398CmhTest = GraftQuery(
    "q398_cmh_test",
    (s, dir) => {
      val thrExpr = cmhThresholds.foldLeft(lit(null).cast("long")) {
        case (acc, (st, t0, t1)) =>
          when(col("stratum") === st && col("exposed") === 0, lit(t0))
            .when(col("stratum") === st && col("exposed") === 1, lit(t1))
            .otherwise(acc)
      }
      val units = Tables.customer(s, dir)
        .select(col("c_custkey").as("ck"),
          pmod(col("c_nationkey"), lit(5)).cast("int").as("stratum"))
        .withColumn("exposed",
          (conv(substring(md5(concat(lit("ex"), col("ck").cast("string"))),
            1, 8), 16, 10).cast("long") % 2).cast("int"))
        .withColumn("thr", thrExpr)
        .withColumn("outcome",
          (conv(substring(md5(concat(lit("oc"), col("ck").cast("string"))),
            1, 8), 16, 10).cast("long") % 1000 < col("thr")).cast("int"))
      val cells = units.groupBy("stratum")
        .agg(sum(when(col("exposed") === 1 && col("outcome") === 1, 1L)
          .otherwise(0L)).as("a"),
          sum(when(col("exposed") === 1 && col("outcome") === 0, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("exposed") === 0 && col("outcome") === 1, 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("exposed") === 0 && col("outcome") === 0, 1L)
            .otherwise(0L)).as("d"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      val micro = cells.select(
        count(lit(1)).as("n_strata"), sum("n").as("n_units"),
        sum(col("a") * lit(1000000L)).as("a_micro"),
        sum(round((col("a") + col("b")).cast("double") *
          (col("a") + col("c")).cast("double") / col("n").cast("double") *
          lit(1e6), 0).cast("long")).as("e_micro"),
        sum(round((col("a") + col("b")).cast("double") *
          (col("c") + col("d")).cast("double") *
          (col("a") + col("c")).cast("double") *
          (col("b") + col("d")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            (col("n") - 1).cast("double")) * lit(1e6), 0).cast("long"))
          .as("v_micro"),
        sum(round(col("a").cast("double") * col("d").cast("double") /
          col("n").cast("double") * lit(1e6), 0).cast("long"))
          .as("ad_micro"),
        sum(round(col("b").cast("double") * col("c").cast("double") /
          col("n").cast("double") * lit(1e6), 0).cast("long"))
          .as("bc_micro"))
      micro.select(col("n_strata"), col("n_units"),
        round((col("a_micro") - col("e_micro")).cast("double") *
          (col("a_micro") - col("e_micro")).cast("double") /
          (lit(1e6) * col("v_micro").cast("double")), 4).as("cmh_chi2"),
        round(col("ad_micro").cast("double") /
          col("bc_micro").cast("double"), 4).as("or_mh"),
        round(lit(2.5), 4).as("planted_or"))
    },
    Some {
      val thrCase = cmhThresholds.map { case (st, t0, t1) =>
        s"WHEN stratum = $st AND exposed = 0 THEN $t0 " +
          s"WHEN stratum = $st AND exposed = 1 THEN $t1"
      }.mkString("CASE ", " ", " END")
      s"""WITH units AS (
         |  SELECT c_custkey AS ck,
         |    CAST(c_nationkey % 5 AS INT) AS stratum,
         |    CAST(CAST(concat('0x', substr(md5('ex'
         |      || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 2
         |      AS INT) AS exposed
         |  FROM customer),
         |uo AS (
         |  SELECT stratum, exposed,
         |    CASE WHEN CAST(concat('0x', substr(md5('oc'
         |        || CAST(ck AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
         |        < ($thrCase)
         |      THEN 1 ELSE 0 END AS outcome
         |  FROM units),
         |cells AS (
         |  SELECT stratum,
         |    CAST(sum(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0
         |      END) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0
         |      END) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0
         |      END) AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0
         |      END) AS BIGINT) AS d
         |  FROM uo GROUP BY 1),
         |cn AS (SELECT *, a + b + c + d AS n FROM cells),
         |micro AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
         |    CAST(sum(n) AS BIGINT) AS n_units,
         |    CAST(sum(a * 1000000) AS BIGINT) AS a_micro,
         |    CAST(sum(CAST(round(CAST(a + b AS DOUBLE)
         |      * CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE) * 1e6, 0)
         |      AS BIGINT)) AS BIGINT) AS e_micro,
         |    CAST(sum(CAST(round(CAST(a + b AS DOUBLE)
         |      * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)
         |      * CAST(b + d AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
         |        * CAST(n - 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)) AS BIGINT)
         |      AS v_micro,
         |    CAST(sum(CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
         |      / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT)) AS BIGINT)
         |      AS ad_micro,
         |    CAST(sum(CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
         |      / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT)) AS BIGINT)
         |      AS bc_micro
         |  FROM cn)
         |SELECT n_strata, n_units,
         |  round(CAST(a_micro - e_micro AS DOUBLE)
         |    * CAST(a_micro - e_micro AS DOUBLE)
         |    / (1e6 * CAST(v_micro AS DOUBLE)), 4) AS cmh_chi2,
         |  round(CAST(ad_micro AS DOUBLE) / CAST(bc_micro AS DOUBLE), 4)
         |    AS or_mh,
         |  round(CAST(2.5 AS DOUBLE), 4) AS planted_or
         |FROM micro""".stripMargin
    })

  val all: Seq[GraftQuery] = Seq(q396RansacLine, q398CmhTest)
}
