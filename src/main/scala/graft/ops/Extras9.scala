package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Ninth extras batch (round 11): non-parametric trend testing
  * (Mann-Kendall), probabilistic record linkage (Fellegi-Sunter),
  * an inverted-index compression audit (Elias gamma/delta vs varbyte),
  * isotonic calibration (pool-adjacent-violators via the max-min closed
  * form), and the Gopher within-document repetition filter.
  *
  * Batch-wide precision discipline (the q311-q318 contract): every
  * comparison that can flip a row — trend significance, link thresholds,
  * PAV pooling, repetition flags — is exact integer / DECIMAL(38,0)
  * arithmetic on both engines; doubles appear only in display columns,
  * produced by ONE division of two exact integers (plus IEEE sqrt, which
  * is correctly rounded and therefore engine-independent) and rounded
  * identically.
  */
object Extras9 {

  /** Mann-Kendall trend test (Mann 1945, Kendall 1975) with the standard
    * tie-corrected variance, per event type over the gap-filled hourly
    * count series (the q315 grid discipline: empty hours are real zeros,
    * so ties are heavy and the tie term is load-bearing).
    *
    * S = Σ_{i<j} sgn(x_j − x_i) and the tie term Σ t(t−1)(2t+5) are exact
    * BIGINTs; the only doubles are the final z = (S∓1)/√(Var) (BIGINT
    * division by 18.0 then one IEEE sqrt — both correctly rounded, so
    * cross-engine stable) and the 1.96 two-sided 5% gate, compared on
    * identical doubles. Var = 0 forces S = 0 (a constant series has no
    * discordant pair), so the z branches never divide by zero.
    *
    * Domain assumption (cf. q320's signed-domain expansion): the hour
    * bucketing pairs Spark's pmod-subtract floor with DuckDB's bare `//`,
    * which only coincide for NON-NEGATIVE epochs — `//` truncates toward
    * zero. Event timestamps are post-1970 by schema, so the assumption
    * holds by construction; pre-epoch data would need the
    * (x − ((x % k + k) % k)) // k expansion on the oracle side.
    *
    * Scale shape: the corpus-wide pass is ONE partial-agg groupBy to
    * (type, hour) counts; the O(H²) pair stage runs on the hourly
    * AGGREGATE, whose length is bounded by wall-clock span (719 h in the
    * fixture; ~10⁴ h/year at any corpus size), never by row count — an
    * equi-join on event type with an h₁<h₂ residual, ≤ 5 keys × H²/2
    * pairs. At multi-year spans the S computation refactors to the
    * O(H log H) inversion count; at the fixture's span the join is the
    * clearer plan and the 100 TB cost lives entirely in the first groupBy.
    */
  val q319MannKendall = GraftQuery(
    "q319_mann_kendall",
    (s, dir) => {
      val hrs = Tables.events(s, dir).select(
        col("event_type").as("et"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
          " div 3600000000").as("h"))
      val counts = hrs.groupBy("et", "h").agg(count(lit(1)).as("c"))
      val bounds = hrs.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = hrs.select("et").distinct().crossJoin(broadcast(bounds))
        .select(col("et"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val x = grid.join(counts, Seq("et", "h"), "left")
        .select(col("et"), col("h"), coalesce(col("c"), lit(0L)).as("x"))
        .persist()
      val b = x.select(col("et").as("et2"), col("h").as("h2"), col("x").as("x2"))
      val sStat = x.join(b, col("et") === col("et2") && col("h") < col("h2"))
        .groupBy("et")
        .agg(sum(when(col("x2") > col("x"), 1L)
          .when(col("x2") < col("x"), -1L).otherwise(0L)).as("s_stat"))
      val ties = x.groupBy("et", "x").agg(count(lit(1)).as("t"))
        .groupBy("et")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
      val n = x.groupBy("et").agg(count(lit(1)).as("n_hours"))
      val varCol = col("n_hours") * (col("n_hours") - 1) *
        (lit(2) * col("n_hours") + 5) - col("tie_term")
      val z = when(col("s_stat") > 0,
          (col("s_stat") - 1).cast("double") / sqrt(varCol.cast("double") / 18.0))
        .when(col("s_stat") < 0,
          (col("s_stat") + 1).cast("double") / sqrt(varCol.cast("double") / 18.0))
        .otherwise(lit(0.0))
      val out = n.join(sStat, "et").join(ties, "et")
        .select(col("et").as("event_type"), col("n_hours"), col("s_stat"),
          col("tie_term"), round(z, 6).as("z"),
          when(abs(z) > 1.96,
            when(col("s_stat") > 0, "increasing").otherwise("decreasing"))
            .otherwise("no trend").as("trend"))
        .orderBy("event_type")
        .localCheckpoint()
      x.unpersist()
      out
    },
    Some("""WITH hrs AS (
           |  SELECT event_type AS et,
           |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
           |  FROM events),
           |counts AS (SELECT et, h, count(*) AS c FROM hrs GROUP BY 1, 2),
           |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hrs),
           |grid AS (SELECT et, unnest(generate_series(h0, h1)) AS h
           |  FROM (SELECT DISTINCT et FROM hrs), bounds),
           |x AS (SELECT grid.et, grid.h, CAST(coalesce(c, 0) AS BIGINT) AS x
           |  FROM grid LEFT JOIN counts
           |    ON counts.et = grid.et AND counts.h = grid.h),
           |s AS (SELECT a.et,
           |    CAST(sum(CASE WHEN b.x > a.x THEN 1
           |                  WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
           |      AS s_stat
           |  FROM x a JOIN x b ON a.et = b.et AND a.h < b.h GROUP BY 1),
           |t AS (SELECT et,
           |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
           |  FROM (SELECT et, x, CAST(count(*) AS BIGINT) AS t
           |        FROM x GROUP BY 1, 2) GROUP BY 1),
           |n AS (SELECT et, CAST(count(*) AS BIGINT) AS n_hours
           |  FROM x GROUP BY 1),
           |j AS (SELECT n.et, n_hours, s_stat, tie_term,
           |    CAST(n_hours * (n_hours - 1) * (2 * n_hours + 5) - tie_term
           |      AS BIGINT) AS v18
           |  FROM n JOIN s ON s.et = n.et JOIN t ON t.et = n.et),
           |zc AS (SELECT et, n_hours, s_stat, tie_term,
           |    CASE WHEN s_stat > 0 THEN
           |           CAST(s_stat - 1 AS DOUBLE) / sqrt(v18 / 18.0)
           |         WHEN s_stat < 0 THEN
           |           CAST(s_stat + 1 AS DOUBLE) / sqrt(v18 / 18.0)
           |         ELSE 0.0 END AS zv
           |  FROM j)
           |SELECT et AS event_type, n_hours, s_stat, tie_term,
           |  round(zv, 6) AS z,
           |  CASE WHEN abs(zv) > 1.96 THEN
           |         CASE WHEN s_stat > 0 THEN 'increasing'
           |              ELSE 'decreasing' END
           |       ELSE 'no trend' END AS trend
           |FROM zc ORDER BY event_type""".stripMargin))

  /** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969)
    * between the customer table and a deterministically perturbed replica
    * of itself (the two-snapshots-of-one-CRM shape): the replica shifts
    * the balance by (custkey mod 7 − 3) cents and blanks the market
    * segment to 'UNKNOWN' for every 4th key, so ground truth (key
    * equality) is known and the m/u weights are ESTIMATED from data, not
    * assumed. Blocking on (nationkey, ADAPTIVE balance bucket — width
    * derived from one count(*) so expected block population stays ~256
    * at any corpus size; the original fixed $1000 bucket had a constant
    * block domain, i.e. a ~n² pair space, measured at 1.455 on q366 in
    * SCALING_r13B.json) reduces the pair space to per-block equi-join
    * work, linear in n; true pairs whose ±3-cent shift crosses a bucket
    * boundary are lost to blocking — the standard recall trade,
    * identical on both engines because the replica is derived, not
    * random. Balances shift +100000¢ before the divide so the domain is
    * strictly positive and floor = truncation in both engines (the
    * signed-domain positive-mod `//` expansion the fixed bucket needed
    * is retired with it — verify-skill lesson l documents that trap).
    *
    * Agreement pattern = 3 binary features (segment equal, balance
    * exactly equal, balance within 3 cents), so the score space is the 8
    * patterns, NOT the pair space: pairs reduce to per-pattern
    * match/non-match counts in one partial-agg groupBy, and the
    * likelihood-ratio arithmetic runs on ≤ 8 rows. m/u probabilities are
    * quantized to per-mille integers with deterministic round-half-up
    * ((2000a + M) div 2M, clamped to [1, 999] — the clamp is the standard
    * zero-frequency smoothing), so the ratio numerator/denominator are
    * exact BIGINTs ≤ 10⁹ at ANY scale (no DECIMAL(38) overflow cliff at
    * sf ≥ 1, which exact count products would hit) and the
    * link/possible/non-link decision (ratio ≷ 1000, ≶ 1/1000) is an
    * integer cross-multiplication. Display ratio is the one final double
    * division.
    *
    * Scale shape: derive replica (map) → blocked equi-join on
    * (nation, bucket) → ONE groupBy to 8 pattern rows + ONE 1-row global
    * agg for M/U/feature counts, broadcast back. Nothing downstream of
    * the join sees more than 8 rows.
    */
  val q320FellegiSunter = GraftQuery(
    "q320_fellegi_sunter",
    (s, dir) => {
      val bal = round(col("c_acctbal") * 100, 0).cast("long")
      val widthFrame = Tables.customer(s, dir)
        .agg(greatest(lit(100L),
          expr("(1100000L * 256L) div count(*)")).as("width"))
      val clean = Tables.customer(s, dir).select(
        col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"), bal.as("bal"))
        .crossJoin(broadcast(widthFrame))
      val dirty = clean.select(
        col("ck").as("dk"), col("nk").as("dnk"),
        when(pmod(col("ck"), lit(4)) === 0, lit("UNKNOWN"))
          .otherwise(col("seg")).as("dseg"),
        (col("bal") + pmod(col("ck"), lit(7)) - 3).as("dbal"),
        col("width").as("dwidth"))
      // adaptive width (see SCALING_r13B.json: the fixed $1000 bucket
      // measured a ~n^2 pair space at f3->f10) — expected block
      // population pinned at ~64 at any corpus size
      def bucket(c: String, w: String): Column =
        expr(s"($c + 100000L) div $w")
      val pairs = clean.withColumn("blk", bucket("bal", "width"))
        .join(dirty.withColumn("dblk", bucket("dbal", "dwidth")),
          col("nk") === col("dnk") && col("blk") === col("dblk"))
        .select(
          when(col("seg") === col("dseg"), 1).otherwise(0).as("f_seg"),
          when(col("bal") === col("dbal"), 1).otherwise(0).as("f_tight"),
          when(abs(col("bal") - col("dbal")) <= 3, 1).otherwise(0).as("f_bal"),
          when(col("ck") === col("dk"), 1L).otherwise(0L).as("m"))
        .persist()
      val stats = pairs.agg(
        sum("m").as("mt"), sum(lit(1L) - col("m")).as("ut"),
        sum(col("m") * col("f_seg")).as("ms"),
        sum((lit(1L) - col("m")) * col("f_seg")).as("us"),
        sum(col("m") * col("f_tight")).as("mg"),
        sum((lit(1L) - col("m")) * col("f_tight")).as("ug"),
        sum(col("m") * col("f_bal")).as("mb"),
        sum((lit(1L) - col("m")) * col("f_bal")).as("ub"))
      val patterns = pairs.groupBy("f_seg", "f_tight", "f_bal")
        .agg(sum("m").as("n_match"), sum(lit(1L) - col("m")).as("n_nonmatch"))
      def pm(a: String, tot: String): Column =
        least(greatest(
          expr(s"(2000 * $a + greatest($tot, 1)) div (2 * greatest($tot, 1))"),
          lit(1L)), lit(999L))
      def side(f: String, p: Column): Column =
        when(col(f) === 1, p).otherwise(lit(1000L) - p)
      val num = side("f_seg", pm("ms", "mt")) * side("f_tight", pm("mg", "mt")) *
        side("f_bal", pm("mb", "mt"))
      val den = side("f_seg", pm("us", "ut")) * side("f_tight", pm("ug", "ut")) *
        side("f_bal", pm("ub", "ut"))
      val out = patterns.crossJoin(broadcast(stats))
        .select(col("f_seg"), col("f_tight"), col("f_bal"),
          col("n_match"), col("n_nonmatch"),
          round(num.cast("double") / den.cast("double"), 6).as("ratio"),
          when(num > lit(1000L) * den, "link")
            .when(num * 1000L < den, "non-link")
            .otherwise("possible").as("decision"))
        .orderBy("f_seg", "f_tight", "f_bal")
        .localCheckpoint()
      pairs.unpersist()
      out
    },
    Some("""WITH clean AS (
           |  SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg,
           |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
           |  FROM customer),
           |dirty AS (
           |  SELECT ck AS dk, nk AS dnk,
           |    CASE WHEN ck % 4 = 0 THEN 'UNKNOWN' ELSE seg END AS dseg,
           |    bal + (ck % 7) - 3 AS dbal
           |  FROM clean),
           |bw AS (
           |  SELECT greatest(100, (1100000 * 256) // count(*)) AS width
           |  FROM customer),
           |pairs AS (
           |  SELECT CASE WHEN seg = dseg THEN 1 ELSE 0 END AS f_seg,
           |    CASE WHEN bal = dbal THEN 1 ELSE 0 END AS f_tight,
           |    CASE WHEN abs(bal - dbal) <= 3 THEN 1 ELSE 0 END AS f_bal,
           |    CASE WHEN ck = dk THEN 1 ELSE 0 END AS m
           |  FROM clean JOIN dirty
           |    ON nk = dnk
           |    AND (bal + 100000) // (SELECT width FROM bw)
           |      = (dbal + 100000) // (SELECT width FROM bw)),
           |stats AS (
           |  SELECT CAST(sum(m) AS BIGINT) AS mt,
           |    CAST(sum(1 - m) AS BIGINT) AS ut,
           |    CAST(sum(m * f_seg) AS BIGINT) AS ms,
           |    CAST(sum((1 - m) * f_seg) AS BIGINT) AS us,
           |    CAST(sum(m * f_tight) AS BIGINT) AS mg,
           |    CAST(sum((1 - m) * f_tight) AS BIGINT) AS ug,
           |    CAST(sum(m * f_bal) AS BIGINT) AS mb,
           |    CAST(sum((1 - m) * f_bal) AS BIGINT) AS ub
           |  FROM pairs),
           |pat AS (
           |  SELECT f_seg, f_tight, f_bal, CAST(sum(m) AS BIGINT) AS n_match,
           |    CAST(sum(1 - m) AS BIGINT) AS n_nonmatch
           |  FROM pairs GROUP BY 1, 2, 3),
           |w AS (
           |  SELECT pat.*,
           |    least(greatest((2000 * ms + greatest(mt, 1))
           |      // (2 * greatest(mt, 1)), 1), 999) AS pms,
           |    least(greatest((2000 * mg + greatest(mt, 1))
           |      // (2 * greatest(mt, 1)), 1), 999) AS pmg,
           |    least(greatest((2000 * mb + greatest(mt, 1))
           |      // (2 * greatest(mt, 1)), 1), 999) AS pmb,
           |    least(greatest((2000 * us + greatest(ut, 1))
           |      // (2 * greatest(ut, 1)), 1), 999) AS pus,
           |    least(greatest((2000 * ug + greatest(ut, 1))
           |      // (2 * greatest(ut, 1)), 1), 999) AS pug,
           |    least(greatest((2000 * ub + greatest(ut, 1))
           |      // (2 * greatest(ut, 1)), 1), 999) AS pub
           |  FROM pat, stats),
           |r AS (
           |  SELECT f_seg, f_tight, f_bal, n_match, n_nonmatch,
           |    (CASE WHEN f_seg = 1 THEN pms ELSE 1000 - pms END) *
           |    (CASE WHEN f_tight = 1 THEN pmg ELSE 1000 - pmg END) *
           |    (CASE WHEN f_bal = 1 THEN pmb ELSE 1000 - pmb END) AS num,
           |    (CASE WHEN f_seg = 1 THEN pus ELSE 1000 - pus END) *
           |    (CASE WHEN f_tight = 1 THEN pug ELSE 1000 - pug END) *
           |    (CASE WHEN f_bal = 1 THEN pub ELSE 1000 - pub END) AS den
           |  FROM w)
           |SELECT f_seg, f_tight, f_bal, n_match, n_nonmatch,
           |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ratio,
           |  CASE WHEN num > 1000 * den THEN 'link'
           |       WHEN num * 1000 < den THEN 'non-link'
           |       ELSE 'possible' END AS decision
           |FROM r ORDER BY f_seg, f_tight, f_bal""".stripMargin))

  /** Inverted-index compression audit: exact bit cost of the corpus
    * posting lists (term → sorted doc ids, delta-encoded) under Elias
    * gamma, Elias delta (Elias 1975), varbyte, and 64-bit fixed width,
    * reported per log₂ document-frequency bucket — the storage-planning
    * query behind every index layout decision ("how much does gamma
    * actually buy on OUR df distribution?").
    *
    * Bit lengths are exact integers on both engines via the binary-string
    * trick: ⌊log₂ g⌋ + 1 = length(bin(g)) — no floating log2 whose last
    * ulp could flip a boundary (log2(8) = 2.999… in a sloppy libm).
    * Gamma(g) = 2L−1, delta(g) = (L−1) + 2·length(bin(L)) − 1, varbyte =
    * 8·⌈L/7⌉ via (L+6) div 7; first gap = doc_id + 1 (ids are 0-based, so
    * every gap ≥ 1 and bin() never sees a non-positive input). The df
    * bucket is itself length(bin(df)) — a deterministic log₂ bucket with
    * no ntile tie ambiguity. The only double is the final gamma/fixed
    * ratio.
    *
    * Scale shape: ONE shuffle to distinct (term, doc) pairs, ONE window
    * pass partitioned by term (vocabulary keys — Heaps-sublinear in the
    * corpus; the lag and the df count share the same partitioning), ONE
    * partial-agg groupBy on the ≤ 64-value bucket key. Raw text never
    * shuffles — rows downstream of the explode are (term, doc_id) pairs.
    */
  val q321EliasPostings = GraftQuery(
    "q321_elias_postings",
    (s, dir) => {
      val posts = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val byTerm = Window.partitionBy("term")
      val gaps = posts.select(
        col("term"),
        coalesce(col("doc_id") - lag("doc_id", 1)
          .over(byTerm.orderBy("doc_id")), col("doc_id") + 1).as("g"),
        count(lit(1)).over(byTerm).as("df"))
      val bits = gaps.select(
        length(bin(col("df"))).cast("long").as("df_bucket"),
        col("term"), length(bin(col("g"))).cast("long").as("l"))
      val out = bits.groupBy("df_bucket").agg(
          countDistinct("term").as("n_terms"),
          count(lit(1)).as("n_postings"),
          sum(lit(2L) * col("l") - 1).as("gamma_bits"),
          sum(col("l") - 1 + lit(2L) * length(bin(col("l"))).cast("long") - 1)
            .as("delta_bits"),
          sum(lit(8L) * expr("(l + 6) div 7")).as("varbyte_bits"))
        .select(col("df_bucket"), col("n_terms"), col("n_postings"),
          col("gamma_bits"), col("delta_bits"), col("varbyte_bits"),
          (lit(64L) * col("n_postings")).as("fixed_bits"),
          round(col("gamma_bits").cast("double") /
            (lit(64L) * col("n_postings")).cast("double"), 6).as("gamma_ratio"))
        .orderBy("df_bucket")
      out
    },
    Some("""WITH posts AS (
           |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |gaps AS (
           |  SELECT term,
           |    coalesce(doc_id - lag(doc_id)
           |      OVER (PARTITION BY term ORDER BY doc_id), doc_id + 1) AS g,
           |    CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
           |  FROM posts),
           |bits AS (
           |  SELECT CAST(length(bin(df)) AS BIGINT) AS df_bucket, term,
           |    CAST(length(bin(g)) AS BIGINT) AS l
           |  FROM gaps),
           |agg AS (
           |  SELECT df_bucket,
           |    CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
           |    CAST(count(*) AS BIGINT) AS n_postings,
           |    CAST(sum(2 * l - 1) AS BIGINT) AS gamma_bits,
           |    CAST(sum(l - 1 + 2 * length(bin(l)) - 1) AS BIGINT) AS delta_bits,
           |    CAST(sum(8 * ((l + 6) // 7)) AS BIGINT) AS varbyte_bits
           |  FROM bits GROUP BY 1)
           |SELECT df_bucket, n_terms, n_postings, gamma_bits, delta_bits,
           |  varbyte_bits, 64 * n_postings AS fixed_bits,
           |  round(CAST(gamma_bits AS DOUBLE) /
           |    CAST(64 * n_postings AS DOUBLE), 6) AS gamma_ratio
           |FROM agg ORDER BY df_bucket""".stripMargin))

  /** Isotonic regression calibration (pool-adjacent-violators; Ayer et
    * al. 1955, Barlow & Brunk 1972) of a document-length score against
    * the English-language label, via the max-min closed form
    * fit_b = max_{i≤b} min_{j≥b} mean(y[i..j]) — the fitted curve is the
    * slope of the greatest convex minorant, so the output is provably
    * monotone (pinned by spec) and matches what PAV's sequential pooling
    * would produce, without PAV's inherently serial pass.
    *
    * Exactness: pooling picks argmin/argmax over RATIONALS p/n whose
    * floats could tie wrongly, so each range mean is scaled to
    * ⌊p·10¹⁸/n⌋ in DECIMAL(38,0) (HUGEINT in DuckDB — the pmod-subtract
    * floor on the Spark side is exact because p·10¹⁸ ≤ 10²⁵ « 10³⁸).
    * Distinct fractions with n ≤ 10⁸ differ by ≥ 10⁻¹⁶ = 100 scaled
    * units, while the floor error is < 1 unit — ordering cannot flip at
    * any reachable scale. Doubles appear only in the display columns
    * (raw_rate, fit_rate), one division each.
    *
    * Scale shape: ONE corpus-wide partial-agg groupBy to ≤ 20 length
    * buckets; everything after runs on that ≤ 20-row aggregate via
    * broadcast self-joins (the i≤j range enumeration is ≤ 20² rows × ≤ 20
    * members — BNLJ over broadcast singletons, never a shuffle cartesian
    * of unbounded sides) and two nested tiny groupBys for min-then-max.
    * No global window anywhere.
    */
  val q322IsotonicCalibration = GraftQuery(
    "q322_isotonic_calibration",
    (s, dir) => {
      val agg = Tables.documents(s, dir)
        .groupBy(least(expr("n_chars div 200"), lit(19L)).as("b"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(when(col("lang") === "en", 1L).otherwise(0L))
            .cast("decimal(38,0)").as("p"))
        .persist()
      val ranges = agg.select(col("b").as("i"))
        .join(agg.select(col("b").as("j")), col("i") <= col("j"))
        .join(agg, col("b").between(col("i"), col("j")))
        .groupBy("i", "j").agg(sum("p").as("rp"), sum("n").as("rn"))
        .select(col("i"), col("j"),
          expr("CAST((rp * CAST(1000000000000000000 AS DECIMAL(38,0))" +
            " - pmod(rp * CAST(1000000000000000000 AS DECIMAL(38,0)), rn))" +
            " / rn AS DECIMAL(38,0))").as("sc"))
      val fit = agg.select(col("b"))
        .join(ranges, col("i") <= col("b") && col("b") <= col("j"))
        .groupBy("b", "i").agg(min("sc").as("msc"))
        .groupBy("b").agg(max("msc").as("fsc"))
      val out = agg.join(fit, "b")
        .select(col("b").as("bucket"),
          col("n").cast("long").as("n_docs"),
          col("p").cast("long").as("n_en"),
          round(col("p").cast("double") / col("n").cast("double"), 6)
            .as("raw_rate"),
          round(col("fsc").cast("double") / 1e18, 6).as("fit_rate"))
        .orderBy("bucket")
        .localCheckpoint()
      agg.unpersist()
      out
    },
    Some("""WITH agg AS (
           |  SELECT least(n_chars // 200, 19) AS b,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS HUGEINT)
           |      AS p
           |  FROM documents GROUP BY 1),
           |ranges AS (
           |  SELECT a.b AS i, c.b AS j,
           |    (sum(g.p) * CAST(1000000000000000000 AS HUGEINT))
           |      // sum(g.n) AS sc
           |  FROM agg a JOIN agg c ON a.b <= c.b
           |    JOIN agg g ON g.b BETWEEN a.b AND c.b
           |  GROUP BY 1, 2),
           |fit AS (
           |  SELECT b, max(msc) AS fsc FROM (
           |    SELECT agg.b, r.i, min(r.sc) AS msc
           |    FROM agg JOIN ranges r ON r.i <= agg.b AND agg.b <= r.j
           |    GROUP BY 1, 2)
           |  GROUP BY 1)
           |SELECT CAST(agg.b AS BIGINT) AS bucket,
           |  CAST(n AS BIGINT) AS n_docs, CAST(p AS BIGINT) AS n_en,
           |  round(CAST(p AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
           |  round(CAST(fsc AS DOUBLE) / 1e18, 6) AS fit_rate
           |FROM agg JOIN fit ON fit.b = agg.b ORDER BY bucket""".stripMargin))

  /** Gopher-style within-document repetition screen (Rae et al. 2021,
    * Table A1): flag documents whose most-covering word n-gram (n = 2, 3,
    * 4) accounts for more than 20% / 18% / 16% of the document's
    * characters — the quality rule that catches boilerplate loops and
    * keyboard-mash pages that cross-document dedup (q24/q25/q300) cannot
    * see, because the repetition is INSIDE one document. Completes the
    * Gopher repetition family next to q101's top-WORD (1-gram frequency)
    * rule: phrase loops repeat n-grams while keeping every single word
    * under q101's 8% radar.
    *
    * Deviation from the paper, on purpose: Gopher takes the single most
    * FREQUENT n-gram's coverage, which is ill-defined under count ties
    * between grams of different lengths; this query takes
    * max over grams of (count × chars) — the maximum actual coverage —
    * which is deterministic, strictly more conservative (flags a
    * superset), and tie-free on both engines. Flags are exact integer
    * cross-multiplications (5·cov > chars, 50·cov > 9·chars,
    * 25·cov > 4·chars); the only double is the final pooled share.
    * Coverage is count × gram length without overlap discount, matching
    * the paper's accounting; n_chars is the fixture's own length column,
    * used identically on both engines.
    *
    * Scale shape: per-document map-side gram explosion (a document's
    * grams stay one row wide — no raw text shuffles beyond the gram
    * strings themselves), ONE groupBy on (doc, n, gram), ONE on (doc, n),
    * ONE on doc, then a per-source rollup; every key includes doc_id, so
    * parallelism is corpus-wide and no skew key exists.
    */
  val q323RepetitionFilter = GraftQuery(
    "q323_repetition_filter",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          split(col("text"), " ").as("w"))
      val grams = docs.select(col("doc_id"), col("n_chars"),
          explode(expr("""flatten(transform(array(2, 3, 4), n ->
            CASE WHEN size(w) >= n THEN
              transform(sequence(0, size(w) - n),
                i -> struct(n AS n, concat_ws(' ', slice(w, i + 1, n)) AS g))
            ELSE array() END))""")).as("t"))
        .select(col("doc_id"), col("n_chars"),
          col("t.n").as("n"), col("t.g").as("g"))
      val cov = grams.groupBy("doc_id", "n_chars", "n", "g")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n_chars", "n")
        .agg(max(col("c") * length(col("g")).cast("long")).as("cov"))
      val flags = cov.groupBy("doc_id").agg(
        max(when(col("n") === 2 && col("cov") * 5 > col("n_chars"), 1L)
          .otherwise(0L)).as("f2"),
        max(when(col("n") === 3 && col("cov") * 50 > col("n_chars") * 9, 1L)
          .otherwise(0L)).as("f3"),
        max(when(col("n") === 4 && col("cov") * 25 > col("n_chars") * 4, 1L)
          .otherwise(0L)).as("f4"))
      Tables.documents(s, dir).select(col("doc_id"), col("source"))
        .join(flags, Seq("doc_id"), "left")
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("f2"), lit(0L))).as("flagged_2"),
          sum(coalesce(col("f3"), lit(0L))).as("flagged_3"),
          sum(coalesce(col("f4"), lit(0L))).as("flagged_4"),
          sum(greatest(coalesce(col("f2"), lit(0L)),
            coalesce(col("f3"), lit(0L)),
            coalesce(col("f4"), lit(0L)))).as("flagged_any"))
        .select(col("source"), col("n_docs"), col("flagged_2"),
          col("flagged_3"), col("flagged_4"), col("flagged_any"),
          round(col("flagged_any").cast("double") /
            col("n_docs").cast("double"), 6).as("share_any"))
        .orderBy("source")
    },
    Some("""WITH base AS (
           |  SELECT doc_id, source, n_chars, string_split(text, ' ') AS ws
           |  FROM documents),
           |grams AS (
           |  SELECT doc_id, n_chars, n,
           |    unnest([array_to_string(ws[i : i + n - 1], ' ')
           |            FOR i IN generate_series(1, len(ws) - n + 1)]) AS g
           |  FROM base, (SELECT unnest([2, 3, 4]) AS n)),
           |cov AS (
           |  SELECT doc_id, n_chars, n, max(c * len) AS cov FROM (
           |    SELECT doc_id, n_chars, n, g, CAST(count(*) AS BIGINT) AS c,
           |      CAST(length(g) AS BIGINT) AS len
           |    FROM grams GROUP BY 1, 2, 3, 4)
           |  GROUP BY 1, 2, 3),
           |flags AS (
           |  SELECT doc_id,
           |    max(CASE WHEN n = 2 AND cov * 5 > n_chars
           |             THEN 1 ELSE 0 END) AS f2,
           |    max(CASE WHEN n = 3 AND cov * 50 > n_chars * 9
           |             THEN 1 ELSE 0 END) AS f3,
           |    max(CASE WHEN n = 4 AND cov * 25 > n_chars * 4
           |             THEN 1 ELSE 0 END) AS f4
           |  FROM cov GROUP BY 1)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(coalesce(f2, 0)) AS BIGINT) AS flagged_2,
           |  CAST(sum(coalesce(f3, 0)) AS BIGINT) AS flagged_3,
           |  CAST(sum(coalesce(f4, 0)) AS BIGINT) AS flagged_4,
           |  CAST(sum(greatest(coalesce(f2, 0), coalesce(f3, 0),
           |    coalesce(f4, 0))) AS BIGINT) AS flagged_any,
           |  round(CAST(sum(greatest(coalesce(f2, 0), coalesce(f3, 0),
           |      coalesce(f4, 0))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           |    AS share_any
           |FROM base LEFT JOIN flags USING (doc_id)
           |GROUP BY source ORDER BY source""".stripMargin))

  /** PageRank damping and fixed-point scale shared by q324's iterations:
    * score units are 10¹², teleport (1−d)·SCALE = 0.15·10¹² exactly.
    */
  private val TrScale = 1000000000L

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the word co-occurrence graph (window ±2 inside each document,
    * undirected, weighted by corpus-wide co-occurrence count), 5
    * iterations, top-10 keywords.
    *
    * Integer-exact iteration (the q314 HITS discipline extended to a
    * damped walk): scores are BIGINTs in 10⁻⁹ units; each step computes
    * the per-unit share s_u = r_u div wdeg_u ONCE per node (floor), then
    * r'_v = 0.15·SCALE + (85·Σ_u w_uv·s_u) div 100 — every div is a
    * positive floor with identical semantics in Spark (`div`) and DuckDB
    * (`//`), so all 5 iterations are bit-identical across engines and the
    * top-10 cut cannot flip on float noise. Overflow bound: Σ_v contrib_v
    * ≈ Σ_u r_u ≈ |V|·SCALE, so 85·contrib stays under 2⁶³ for vocabularies
    * to ~10⁸ words — comfortably past any real token vocabulary (the
    * earlier 10⁻¹² scale capped out near 10⁵, where Spark's non-ANSI
    * BIGINT multiply would wrap silently while DuckDB's checked
    * arithmetic errors; three orders of magnitude of headroom was worth
    * three digits of display resolution). The per-unit-share form keeps
    * any single product ≤ w_uv·s_u ≤ r_u.
    *
    * Scale shape: co-occurrence pairs come from TWO lead() columns in one
    * per-document window pass (no positional self-join of the corpus);
    * everything after the edge groupBy lives on the vocabulary — edges,
    * degrees, and 5 joins over Heaps-sublinear frames. Ranking is
    * orderBy+limit (TakeOrderedAndProject), never a global sort.
    */
  val q324TextRank = GraftQuery(
    "q324_textrank",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "p", "w")
      val byDoc = Window.partitionBy("doc_id").orderBy("p")
      // both lead() offsets come out of ONE window pass, and the
      // symmetrization references prs twice — persist it or the corpus
      // tokenize + window run four times (measured: ~2× the query)
      val prs = words.select(col("w").as("a"),
          lead("w", 1).over(byDoc).as("b1"),
          lead("w", 2).over(byDoc).as("b2"))
        .select(col("a"), explode(array(col("b1"), col("b2"))).as("b"))
        .where(col("b").isNotNull && col("a") =!= col("b"))
        .persist()
      val edges = prs.select(col("a").as("u"), col("b").as("v"))
        .unionAll(prs.select(col("b"), col("a")))
        .groupBy("u", "v").agg(count(lit(1)).as("w"))
        .persist()
      val deg = edges.groupBy("u").agg(sum("w").as("d"))
      // decorate each edge with its source's weighted degree ONCE before
      // the loop: every iteration then pays a single vocabulary join
      // (edgesD ⋈ r) instead of two (edges ⋈ r ⋈ deg) — 5 joins saved
      val edgesD = edges.join(deg, "u").persist()
      val nodes = words.select(col("w").as("word")).distinct().persist()
      var r = nodes.select(col("word"), lit(TrScale).as("r"))
      for (_ <- 1 to 5) {
        // r14: zero-contribution words enter the SAME per-round groupBy as
        // union rows (the q98/q237 union-into-groupBy shape) instead of a
        // nodes LEFT JOIN afterwards — one shuffle + one stage barrier
        // fewer per round; integer c + 0 is exact, and every edge endpoint
        // is in nodes, so the output word set is unchanged.
        // localCheckpoint flattens each round's lineage: the per-round
        // frame is vocabulary-sized (tiny), but an unchecked 5-deep join
        // chain makes round k's analysis/codegen replan rounds 1..k−1 —
        // the measured cost of this loop was plan depth, not data
        r = edgesD
          .join(r.select(col("word").as("u"), col("r").as("ru")), "u")
          .select(col("v").as("word"), (col("w") * expr("ru div d")).as("c"))
          .unionByName(nodes.select(col("word"), lit(0L).as("c")))
          .groupBy("word").agg(sum("c").as("c"))
          .select(col("word"),
            (lit(150000000L) + expr("(85 * c) div 100")).as("r"))
          .localCheckpoint()
      }
      val tot = r.agg(sum("r").as("tot"))
      val out = r.crossJoin(broadcast(tot))
        .select(col("word"), col("r").as("score"),
          round(col("r").cast("double") / col("tot").cast("double"), 6)
            .as("share"))
        .orderBy(desc("score"), col("word")).limit(10)
        .localCheckpoint()
      prs.unpersist(); edges.unpersist(); edgesD.unpersist(); nodes.unpersist()
      out
    },
    Some("""WITH base AS (
           |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |words AS (
           |  SELECT doc_id, unnest(generate_series(1, len(ws))) AS p,
           |    unnest(ws) AS w
           |  FROM base),
           |prs AS (
           |  SELECT a, b FROM (
           |    SELECT w AS a,
           |      lead(w, 1) OVER (PARTITION BY doc_id ORDER BY p) AS b
           |    FROM words
           |    UNION ALL
           |    SELECT w, lead(w, 2) OVER (PARTITION BY doc_id ORDER BY p)
           |    FROM words)
           |  WHERE b IS NOT NULL AND a <> b),
           |edges AS MATERIALIZED (
           |  SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM (
           |    SELECT a AS u, b AS v FROM prs
           |    UNION ALL SELECT b, a FROM prs)
           |  GROUP BY 1, 2),
           |deg AS (SELECT u, CAST(sum(w) AS BIGINT) AS d FROM edges GROUP BY 1),
           |nodes AS (SELECT DISTINCT w AS word FROM words),
           |r0 AS (SELECT word, CAST(1000000000 AS BIGINT) AS r FROM nodes),
           |it1 AS MATERIALIZED (
           |  SELECT n.word, 150000000 + (85 * coalesce(c.s, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.v AS word, CAST(sum(e.w * (x.r // d.d)) AS BIGINT) AS s
           |    FROM edges e JOIN r0 x ON x.word = e.u JOIN deg d ON d.u = e.u
           |    GROUP BY 1) c ON c.word = n.word),
           |it2 AS MATERIALIZED (
           |  SELECT n.word, 150000000 + (85 * coalesce(c.s, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.v AS word, CAST(sum(e.w * (x.r // d.d)) AS BIGINT) AS s
           |    FROM edges e JOIN it1 x ON x.word = e.u JOIN deg d ON d.u = e.u
           |    GROUP BY 1) c ON c.word = n.word),
           |it3 AS MATERIALIZED (
           |  SELECT n.word, 150000000 + (85 * coalesce(c.s, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.v AS word, CAST(sum(e.w * (x.r // d.d)) AS BIGINT) AS s
           |    FROM edges e JOIN it2 x ON x.word = e.u JOIN deg d ON d.u = e.u
           |    GROUP BY 1) c ON c.word = n.word),
           |it4 AS MATERIALIZED (
           |  SELECT n.word, 150000000 + (85 * coalesce(c.s, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.v AS word, CAST(sum(e.w * (x.r // d.d)) AS BIGINT) AS s
           |    FROM edges e JOIN it3 x ON x.word = e.u JOIN deg d ON d.u = e.u
           |    GROUP BY 1) c ON c.word = n.word),
           |it5 AS MATERIALIZED (
           |  SELECT n.word, 150000000 + (85 * coalesce(c.s, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.v AS word, CAST(sum(e.w * (x.r // d.d)) AS BIGINT) AS s
           |    FROM edges e JOIN it4 x ON x.word = e.u JOIN deg d ON d.u = e.u
           |    GROUP BY 1) c ON c.word = n.word),
           |tot AS (SELECT CAST(sum(r) AS BIGINT) AS tot FROM it5)
           |SELECT word, r AS score,
           |  round(CAST(r AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
           |FROM it5, tot ORDER BY score DESC, word LIMIT 10""".stripMargin))

  /** Kaplan-Meier survival estimator (Kaplan & Meier 1958) over user
    * lifetimes in the event stream: a user's lifetime is the whole days
    * between their first and last event; a user "dies" (churn proxy) when
    * an error event shares their final timestamp — a pure max-comparison
    * definition (max error-ts = max ts), so no argmax tie-break can
    * diverge across engines — and is right-censored otherwise. Output is
    * the daily risk set, deaths, censorings, and the product-limit
    * survival curve.
    *
    * Determinism: risk sets and death counts are exact integers (the risk
    * set is total − exclusive-prefix(d+c), a window cumsum over the day
    * table); the KM product is computed in log space over that SAME
    * deterministic day order, so the only cross-engine noise is libm ln
    * ulps (≤ ~30 of them at the fixture horizon), absorbed by round(6).
    * The degenerate all-remaining-die day (n_death = n_risk, factor 0 —
    * possible on the curve's last day) is guarded explicitly: a
    * cumulative zero flag pins km to 0 from that day on in BOTH engine
    * texts, because an unguarded log(0) is NULL-skipped by Spark's sum
    * (silently wrong) but a hard error in DuckDB (loudly divergent).
    *
    * Scale shape: ONE corpus-wide groupBy to per-user (first, last,
    * last-error) timestamps, ONE groupBy to per-day (deaths, censored)
    * counts; the ordered windows run on the DAY table, bounded by the
    * calendar horizon (≤31 rows in the fixture, ~365/year), never by
    * users — whitelisted in SinglePartitionSweepSpec with that bound.
    */
  val q325KaplanMeier = GraftQuery(
    "q325_kaplan_meier",
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
      val risk = perDay.crossJoin(broadcast(totalUsers))
        .withColumn("n_risk", col("tu") -
          coalesce(sum(col("n_death") + col("n_censored")).over(prior),
            lit(0L)))
      // once any day's deaths equal its risk set the factor is 0 and the
      // log-space product must pin km to 0 from that day on; an unguarded
      // log(0) is NULL in Spark (sum silently skips → spuriously positive
      // km) but THROWS in DuckDB — carry an explicit cumulative zero flag
      // and guard the log, identically in both engine texts
      val out = risk
        .withColumn("zero_seen",
          max(when(col("n_death") === col("n_risk"), 1).otherwise(0))
            .over(byDay))
        .select(col("day"), col("n_risk"), col("n_death"),
          col("n_censored"),
          round(when(col("zero_seen") === 1, lit(0.0))
            .otherwise(exp(sum(when(col("n_risk") > col("n_death"), log(
              (col("n_risk") - col("n_death")).cast("double") /
                col("n_risk").cast("double")))).over(byDay))), 6)
            .as("km"))
        .orderBy("day")
      out
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
           |  FROM per_day, tu)
           |SELECT day, n_risk, n_death, n_censored,
           |  round(CASE WHEN max(CASE WHEN n_death = n_risk
           |        THEN 1 ELSE 0 END) OVER (ORDER BY day) = 1 THEN 0.0
           |    ELSE exp(sum(CASE WHEN n_risk > n_death
           |        THEN ln(CAST(n_risk - n_death AS DOUBLE) /
           |          CAST(n_risk AS DOUBLE)) END) OVER (ORDER BY day))
           |    END, 6) AS km
           |FROM risk ORDER BY day""".stripMargin))

  /** Simple Good-Turing frequency smoothing (Good 1953; Gale & Sampson
    * 1995) over the corpus word-frequency distribution: for each observed
    * frequency r, the count-of-counts N_r, the smoothed frequency
    * r* = (r+1)·N_{r+1}/N_r, and the total probability mass GT assigns to
    * all words of frequency r, gt_share = (r+1)·N_{r+1}/T. The r = 0 row
    * is the estimator's whole point: its gt_share = N₁/T is the
    * probability mass reserved for UNSEEN words — the OOV-rate estimate a
    * tokenizer/LM pipeline needs before it meets new data (the q299/q139
    * vocabularies consume exactly this number as a held-out budget).
    *
    * Exactness: every N_r and T is an exact BIGINT; N_{r+1} arrives by a
    * self-join on r+1 (no window, no ordering ambiguity); the two display
    * columns are single divisions of exact integers. Scale shape: ONE
    * corpus groupBy to the Heaps-sublinear vocabulary, ONE groupBy to the
    * count-of-counts table (≤ distinct frequencies, ≲ √(2·vocab) rows by
    * the pigeonhole bound on Σr·N_r), a self-join and a broadcast total
    * on that tiny frame.
    */
  val q326GoodTuring = GraftQuery(
    "q326_good_turing",
    (s, dir) => {
      val freq = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("r"))
      val cc = freq.groupBy("r").agg(count(lit(1)).as("n_r")).persist()
      val tot = freq.agg(sum("r").as("t"))
      val withZero = cc.unionAll(
        cc.sparkSession.range(1).select(lit(0L).as("r"), lit(0L).as("n_r")))
      val nxt = cc.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
      val out = withZero.join(nxt, Seq("r"), "left")
        .na.fill(0L, Seq("n_next"))
        .crossJoin(broadcast(tot))
        .select(col("r"), col("n_r"), col("n_next"),
          when(col("n_r") > 0, round((col("r") + 1).cast("double") *
            col("n_next").cast("double") / col("n_r").cast("double"), 6))
            .otherwise(lit(0.0)).as("r_star"),
          round((col("r") + 1).cast("double") * col("n_next").cast("double")
            / col("t").cast("double"), 6).as("gt_share"))
        .orderBy("r")
        .localCheckpoint()
      cc.unpersist()
      out
    },
    Some("""WITH freq AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS r FROM (
           |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           |  GROUP BY 1),
           |cc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
           |  FROM freq GROUP BY 1),
           |tot AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM freq),
           |wz AS (SELECT r, n_r FROM cc
           |  UNION ALL SELECT 0, 0),
           |j AS (
           |  SELECT wz.r, wz.n_r, coalesce(nx.n_r, 0) AS n_next
           |  FROM wz LEFT JOIN cc nx ON nx.r = wz.r + 1)
           |SELECT r, n_r, n_next,
           |  CASE WHEN n_r > 0 THEN
           |    round((r + 1) * CAST(n_next AS DOUBLE) / CAST(n_r AS DOUBLE), 6)
           |  ELSE 0.0 END AS r_star,
           |  round((r + 1) * CAST(n_next AS DOUBLE) / CAST(t AS DOUBLE), 6)
           |    AS gt_share
           |FROM j, tot ORDER BY r""".stripMargin))

  /** Poisson-bootstrap confidence intervals (Chamandy et al. 2012 — the
    * bootstrap that actually runs at MapReduce scale) for the per-source
    * mean document length, fully DERANDOMIZED: replicate b's weight for a
    * document is Poisson(1)-distributed via the inverse CDF applied to an
    * md5-derived uniform in [0, 10⁶), so both engines draw the identical
    * "random" weights and the interval is a reproducible artifact, not a
    * seed-dependent one. B = 40 replicates put the 2.5%/97.5% percentile
    * bounds exactly at ranks 1 and 40 (each tail is 1/40 of the
    * replicate mass).
    *
    * Exactness: replicate sums Σw and Σw·len are exact BIGINTs; replicate
    * means are ordered by the q322 scaled-floor trick (⌊Σwx·10¹⁸/Σw⌋ in
    * DECIMAL(38,0)/HUGEINT — distinct means differ by ≫ the floor error
    * at any reachable scale), with the replicate id as tiebreak; doubles
    * appear only in the three display columns.
    *
    * Scale shape: the ×B row fan-out is MAP-SIDE (each unit row emits its
    * B weights and partial aggregation collapses them to (source, b)
    * groups before the shuffle), so the shuffle carries B rows per
    * source regardless of corpus size — the property that makes Poisson
    * bootstrap the at-scale resampling method. The ranking window runs
    * on B = 40 rows per source.
    */
  val q330PoissonBootstrap = GraftQuery(
    "q330_poisson_bootstrap",
    (s, dir) => {
      // Poisson(1) CDF cut points scaled to 1e6 (k = 0..6, else 7)
      val cuts = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L,
        999917L)
      def pois(u: Column): Column =
        cuts.zipWithIndex.foldRight(lit(7L): Column) { case ((c, k), e) =>
          when(u < c, k.toLong).otherwise(e)
        }
      val rep = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          explode(expr("sequence(1, 40)")).as("b"))
        .select(col("source"), col("n_chars"), col("b"),
          pois(expr("CAST(conv(substr(md5(concat_ws('_'," +
            " CAST(doc_id AS STRING), CAST(b AS STRING))), 1, 12), 16, 10)" +
            " AS BIGINT) % 1000000")).as("w"))
        .groupBy("source", "b")
        .agg(sum("w").as("sw"), sum(col("w") * col("n_chars")).as("swx"))
      val scaled = rep.select(col("source"), col("b"),
        expr("CAST((CAST(swx AS DECIMAL(38,0)) *" +
          " CAST(1000000000000000000 AS DECIMAL(38,0)) -" +
          " pmod(CAST(swx AS DECIMAL(38,0)) *" +
          " CAST(1000000000000000000 AS DECIMAL(38,0)), greatest(sw, 1)))" +
          " / greatest(sw, 1) AS DECIMAL(38,0))").as("m"))
      val bySrc = Window.partitionBy("source").orderBy("m", "b")
      val ranked = scaled.withColumn("rk", row_number().over(bySrc))
      val base = Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sx"))
      base
        .join(ranked.filter(col("rk") === 1)
          .select(col("source"), col("m").as("lo")), "source")
        .join(ranked.filter(col("rk") === 40)
          .select(col("source"), col("m").as("hi")), "source")
        .select(col("source"), col("n_docs"),
          round(col("sx").cast("double") / col("n_docs").cast("double"), 6)
            .as("mean_chars"),
          round(col("lo").cast("double") / 1e18, 6).as("boot_lo"),
          round(col("hi").cast("double") / 1e18, 6).as("boot_hi"))
        .orderBy("source")
    },
    Some("""WITH reps AS (SELECT unnest(generate_series(1, 40)) AS b),
           |u AS (
           |  SELECT source, n_chars, b,
           |    CAST(concat('0x', substr(md5(concat(doc_id, '_', b)), 1, 12))
           |      AS BIGINT) % 1000000 AS u
           |  FROM documents, reps),
           |w AS (
           |  SELECT source, n_chars, b,
           |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
           |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
           |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
           |         WHEN u < 999917 THEN 6 ELSE 7 END AS w
           |  FROM u),
           |rep AS (
           |  SELECT source, b, CAST(sum(w) AS BIGINT) AS sw,
           |    CAST(sum(w * n_chars) AS BIGINT) AS swx
           |  FROM w GROUP BY 1, 2),
           |scaled AS (
           |  SELECT source, b,
           |    (CAST(swx AS HUGEINT) * 1000000000000000000)
           |      // greatest(sw, 1) AS m
           |  FROM rep),
           |ranked AS (
           |  SELECT source, m,
           |    row_number() OVER (PARTITION BY source ORDER BY m, b) AS rk
           |  FROM scaled),
           |base AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS sx
           |  FROM documents GROUP BY 1)
           |SELECT base.source, n_docs,
           |  round(CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
           |    AS mean_chars,
           |  round(CAST(lo.m AS DOUBLE) / 1e18, 6) AS boot_lo,
           |  round(CAST(hi.m AS DOUBLE) / 1e18, 6) AS boot_hi
           |FROM base
           |JOIN ranked lo ON lo.source = base.source AND lo.rk = 1
           |JOIN ranked hi ON hi.source = base.source AND hi.rk = 40
           |ORDER BY base.source""".stripMargin))

  /** Peak concurrent sessions per day — the sweep-line interval-overlap
    * maximum (how many user sessions were simultaneously open at the
    * busiest instant), computed WITHOUT a global sort: the classic
    * formulation sorts all ±1 boundaries and takes the running-sum max,
    * a single-partition funnel at any real scale. Here the prefix sum is
    * split two-level (the q174 discipline): minute-bucket partial sums
    * roll up per (day, minute) — calendar-bounded windows — and the
    * intra-minute cumsum runs in per-(day, minute) partitions, so
    * concurrency at any boundary = exclusive minute-prefix + inclusive
    * intra-minute prefix, and no partition ever holds more than one
    * minute of one day's boundaries.
    *
    * Overlap semantics: sessions are CLOSED intervals [first event, last
    * event] of a user within a calendar day; at a shared instant t the
    * count includes sessions starting at t (starts inclusive) and
    * excludes sessions that ended strictly before t (ends exclusive via
    * the shifted cumsum) — so two sessions touching at one microsecond
    * DO overlap, the standard sweep convention. All counts are exact
    * BIGINTs; the peak instant reports the EARLIEST boundary achieving
    * the maximum (a min over equal integers — no tie ambiguity).
    *
    * Domain assumption (cf. q320's signed-domain expansion): day/minute
    * bucketing pairs Spark's pmod-subtract floor with DuckDB's truncating
    * `//`, which only coincide for NON-NEGATIVE epochs; timestamps are
    * post-1970 by schema, so the assumption holds by construction
    * (pre-epoch data would need the positive-mod floor expansion in the
    * oracle text).
    */
  val q333PeakConcurrency = GraftQuery(
    "q333_peak_concurrency",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
        .select(col("user_id"), col("t"),
          expr("t div 86400000000").as("day"))
      val sess = ev.groupBy("user_id", "day")
        .agg(min("t").as("st"), max("t").as("en")).persist()
      val bounds = sess.select(col("day"), col("st").as("t"),
          lit(1L).as("sc"), lit(0L).as("ec"))
        .unionAll(sess.select(col("day"), col("en"), lit(0L), lit(1L)))
        .groupBy(col("day"), expr("t div 60000000").as("m"), col("t"))
        .agg(sum("sc").as("sc"), sum("ec").as("ec"))
      val minute = bounds.groupBy("day", "m")
        .agg(sum("sc").as("msc"), sum("ec").as("mec"))
      val byDay = Window.partitionBy("day").orderBy("m")
        .rowsBetween(Window.unboundedPreceding, -1)
      val minutePrefix = minute.select(col("day"), col("m"),
        coalesce(sum("msc").over(byDay), lit(0L)).as("pmsc"),
        coalesce(sum("mec").over(byDay), lit(0L)).as("pmec"))
      val intra = Window.partitionBy("day", "m").orderBy("t")
      val conc = bounds.join(minutePrefix, Seq("day", "m"))
        .select(col("day"), col("t"),
          (col("pmsc") + sum("sc").over(
            intra.rowsBetween(Window.unboundedPreceding, 0)) -
            col("pmec") - coalesce(sum("ec").over(
              intra.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .as("conc"))
        .persist()
      val peak = conc.groupBy("day").agg(max("conc").as("peak"))
      val at = conc.join(peak, "day")
        .filter(col("conc") === col("peak"))
        .groupBy("day", "peak").agg(min("t").as("peak_at"))
      val nSess = sess.groupBy("day").agg(count(lit(1)).as("n_sessions"))
      val out = at.join(nSess, "day")
        .select(col("day"), col("n_sessions"), col("peak"), col("peak_at"))
        .orderBy("day")
        .localCheckpoint()
      sess.unpersist(); conc.unpersist()
      out
    },
    Some("""WITH ev AS (
           |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
           |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
           |  FROM events),
           |sess AS (
           |  SELECT user_id, day, min(t) AS st, max(t) AS en
           |  FROM ev GROUP BY 1, 2),
           |bounds AS (
           |  SELECT day, t, CAST(sum(sc) AS BIGINT) AS sc,
           |    CAST(sum(ec) AS BIGINT) AS ec
           |  FROM (
           |    SELECT day, st AS t, 1 AS sc, 0 AS ec FROM sess
           |    UNION ALL SELECT day, en, 0, 1 FROM sess)
           |  GROUP BY 1, 2),
           |conc AS (
           |  SELECT day, t,
           |    CAST(sum(sc) OVER (PARTITION BY day ORDER BY t
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      - coalesce(sum(ec) OVER (PARTITION BY day ORDER BY t
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS conc
           |  FROM bounds),
           |peak AS (SELECT day, max(conc) AS peak FROM conc GROUP BY 1),
           |at AS (
           |  SELECT conc.day, peak, min(t) AS peak_at
           |  FROM conc JOIN peak ON peak.day = conc.day AND conc = peak
           |  GROUP BY 1, 2),
           |ns AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions
           |  FROM sess GROUP BY 1)
           |SELECT at.day, n_sessions, peak, peak_at
           |FROM at JOIN ns ON ns.day = at.day ORDER BY at.day""".stripMargin))

  def all: Seq[GraftQuery] = Seq(
    q319MannKendall, q320FellegiSunter, q321EliasPostings,
    q322IsotonicCalibration, q323RepetitionFilter, q324TextRank,
    q325KaplanMeier, q326GoodTuring, q330PoissonBootstrap,
    q333PeakConcurrency)
}
