package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q342 — UNSUPERVISED Fellegi-Sunter record linkage: m/u estimated by EM
  * (Winkler 1988's application of Dempster-Laird-Rubin to the Fellegi &
  * Sunter 1969 model) with NO ground-truth label anywhere in the
  * estimation — the production shape q320 deliberately shortcut (its
  * scaladoc documents the supervised estimation as the textbook dodge; the
  * round-11 verdict asked for the real thing).
  *
  * Same derived-replica + blocking as q320 (the anchor the convergence
  * spec compares against): clean customers vs the deterministically
  * perturbed replica, blocked on (nationkey, adaptive balance bucket) with
  * the signed-domain positive-mod floor expansion in the oracle. The
  * pair space reduces to ≤ 8 agreement-pattern counts in ONE partial-agg
  * groupBy — and from there EM runs entirely on that 8-row aggregate:
  *
  *   E-step: per-pattern match posterior w_γ = pΠm / (pΠm + (1−p)Πu)
  *   M-step: p = Σn_γw_γ/N, m_k = Σn_γw_γγ_k/Σn_γw_γ, u_k likewise on 1−w
  *
  * Integer-exact replay (the q283/q297 unrolled-iteration discipline):
  * parameters are per-mille BIGINTs clamped to [1, 999] (the clamp is the
  * standard zero-frequency smoothing AND keeps every product positive, so
  * no division ever sees zero), posteriors are per-10⁶ BIGINTs, and every
  * quantization is deterministic round-half-up ((2Sa + b) div 2b) — so all
  * 20 EM iterations are bit-identical across engines and the only double
  * is the display ratio. Initialization is Winkler's standard
  * (p, m, u) = (0.1, 0.9, 0.1). Overflow bounds: the E-step's
  * 2·10⁶·p·Πside ≤ 2·10⁶·999⁴ < 2·10¹⁸ and the M-step's 2000·Σn_γw_γ ≤
  * 2·10⁹·N both stay under 2⁶³ for N to ~4.6·10⁹ blocked pairs — far past
  * any sane block size (blocking exists precisely to bound N).
  *
  * Scale shape: corpus-scale work is the blocked equi-join and ONE
  * groupBy to ≤ 8 rows; the EM loop runs driver-side on that bounded
  * 8-row state (the q328/q339 bounded-collect discipline — 20 scheduler-
  * free integer iterations beat 20 Spark jobs over 8-row frames). The
  * oracle replays all 20 EM levels as materialized CTE pairs (w_k, p_k)
  * plus a final E-step, the q297 chained-replay shape.
  */
object LinkageEm {

  private val Iters = 20

  private def clamp(x: Long): Long = math.min(math.max(x, 1L), 999L)
  private def sideL(f: Int, p: Long): Long = if (f == 1) p else 1000L - p

  private def emLvl(k: Int): String =
    s"""w$k AS MATERIALIZED (
       |  SELECT f_seg, f_tight, f_bal, n,
       |    (2000000 * mnum + mnum + unum) // (2 * (mnum + unum)) AS wq
       |  FROM (
       |    SELECT pat.*,
       |      p * (CASE WHEN f_seg = 1 THEN ms ELSE 1000 - ms END)
       |        * (CASE WHEN f_tight = 1 THEN mg ELSE 1000 - mg END)
       |        * (CASE WHEN f_bal = 1 THEN mb ELSE 1000 - mb END) AS mnum,
       |      (1000 - p) * (CASE WHEN f_seg = 1 THEN us ELSE 1000 - us END)
       |        * (CASE WHEN f_tight = 1 THEN ug ELSE 1000 - ug END)
       |        * (CASE WHEN f_bal = 1 THEN ub ELSE 1000 - ub END) AS unum
       |    FROM pat, p${k - 1})),
       |p$k AS MATERIALIZED (
       |  SELECT
       |    least(greatest((2000 * b + 1000000 * nn)
       |      // (2 * 1000000 * nn), 1), 999) AS p,
       |    least(greatest((2000 * asg + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS ms,
       |    least(greatest((2000 * atg + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS mg,
       |    least(greatest((2000 * abl + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS mb,
       |    least(greatest((2000 * dsg + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS us,
       |    least(greatest((2000 * dtg + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS ug,
       |    least(greatest((2000 * dbl + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS ub
       |  FROM (
       |    SELECT CAST(sum(n * wq) AS BIGINT) AS b,
       |      CAST(sum(n * (1000000 - wq)) AS BIGINT) AS c,
       |      CAST(sum(n * wq * f_seg) AS BIGINT) AS asg,
       |      CAST(sum(n * wq * f_tight) AS BIGINT) AS atg,
       |      CAST(sum(n * wq * f_bal) AS BIGINT) AS abl,
       |      CAST(sum(n * (1000000 - wq) * f_seg) AS BIGINT) AS dsg,
       |      CAST(sum(n * (1000000 - wq) * f_tight) AS BIGINT) AS dtg,
       |      CAST(sum(n * (1000000 - wq) * f_bal) AS BIGINT) AS dbl
       |    FROM w$k), tot)""".stripMargin

  val q342FellegiSunterEm = GraftQuery(
    "q342_fellegi_sunter_em",
    (s, dir) => {
      import s.implicits._
      // identical derived replica + blocking as q320 — but the label ck=dk
      // is NEVER computed: the estimation sees agreement patterns only
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
      val pat = clean.withColumn("blk", bucket("bal", "width"))
        .join(dirty.withColumn("dblk", bucket("dbal", "dwidth")),
          col("nk") === col("dnk") && col("blk") === col("dblk"))
        .select(
          when(col("seg") === col("dseg"), 1).otherwise(0).as("f_seg"),
          when(col("bal") === col("dbal"), 1).otherwise(0).as("f_tight"),
          when(abs(col("bal") - col("dbal")) <= 3, 1).otherwise(0).as("f_bal"))
        .groupBy("f_seg", "f_tight", "f_bal").agg(count(lit(1)).as("n"))
        .collect() // bounded: <= 8 agreement patterns, ever
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      val nTot = pat.map(_._4).sum

      // 20 integer-exact EM iterations on the 8-row state
      var P = 100L
      var m = Array(900L, 900L, 900L)
      var u = Array(100L, 100L, 100L)
      for (_ <- 1 to Iters) {
        var b = 0L; var c = 0L
        val a = Array(0L, 0L, 0L); val d = Array(0L, 0L, 0L)
        pat.foreach { case (fs, ft, fb, n) =>
          val f = Array(fs, ft, fb)
          val mnum = P * sideL(fs, m(0)) * sideL(ft, m(1)) * sideL(fb, m(2))
          val unum = (1000L - P) *
            sideL(fs, u(0)) * sideL(ft, u(1)) * sideL(fb, u(2))
          val wq = (2000000L * mnum + mnum + unum) / (2L * (mnum + unum))
          b += n * wq; c += n * (1000000L - wq)
          var i = 0
          while (i < 3) {
            a(i) += n * wq * f(i); d(i) += n * (1000000L - wq) * f(i); i += 1
          }
        }
        P = clamp((2000L * b + 1000000L * nTot) / (2L * 1000000L * nTot))
        val bp = math.max(b, 1L); val cp = math.max(c, 1L)
        for (i <- 0 until 3) {
          m(i) = clamp((2000L * a(i) + bp) / (2L * bp))
          u(i) = clamp((2000L * d(i) + cp) / (2L * cp))
        }
      }

      // final E-step + q320-style decision arithmetic from the EM params
      val rows = pat.toSeq.map { case (fs, ft, fb, n) =>
        val mnum = P * sideL(fs, m(0)) * sideL(ft, m(1)) * sideL(fb, m(2))
        val unum = (1000L - P) *
          sideL(fs, u(0)) * sideL(ft, u(1)) * sideL(fb, u(2))
        val wq = (2000000L * mnum + mnum + unum) / (2L * (mnum + unum))
        val num = sideL(fs, m(0)) * sideL(ft, m(1)) * sideL(fb, m(2))
        val den = sideL(fs, u(0)) * sideL(ft, u(1)) * sideL(fb, u(2))
        val decision =
          if (num > 1000L * den) "link"
          else if (num * 1000L < den) "non-link"
          else "possible"
        (fs, ft, fb, n, wq, num, den,
          decision, P, m(0), m(1), m(2), u(0), u(1), u(2))
      }
      rows.toDF("f_seg", "f_tight", "f_bal", "n_pairs", "w_ppm", "num",
          "den", "decision", "p_match", "m_seg", "m_tight", "m_bal",
          "u_seg", "u_tight", "u_bal")
        .select(col("f_seg"), col("f_tight"), col("f_bal"), col("n_pairs"),
          col("w_ppm"),
          // rounded by the engine's round(), not driver-side BigDecimal,
          // so the half-up semantics match q320's display column exactly
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .as("ratio"),
          col("decision"), col("p_match"), col("m_seg"), col("m_tight"),
          col("m_bal"), col("u_seg"), col("u_tight"), col("u_bal"))
        .orderBy("f_seg", "f_tight", "f_bal")
    },
    Some(s"""WITH clean AS (
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
           |pat AS MATERIALIZED (
           |  SELECT CASE WHEN seg = dseg THEN 1 ELSE 0 END AS f_seg,
           |    CASE WHEN bal = dbal THEN 1 ELSE 0 END AS f_tight,
           |    CASE WHEN abs(bal - dbal) <= 3 THEN 1 ELSE 0 END AS f_bal,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM clean JOIN dirty
           |    ON nk = dnk
           |    AND (bal + 100000) // (SELECT width FROM bw)
           |      = (dbal + 100000) // (SELECT width FROM bw)
           |  GROUP BY 1, 2, 3),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM pat),
           |p0 AS (SELECT CAST(100 AS BIGINT) AS p,
           |  CAST(900 AS BIGINT) AS ms, CAST(900 AS BIGINT) AS mg,
           |  CAST(900 AS BIGINT) AS mb, CAST(100 AS BIGINT) AS us,
           |  CAST(100 AS BIGINT) AS ug, CAST(100 AS BIGINT) AS ub),
           |${(1 to Iters).map(emLvl).mkString(",\n")},
           |wf AS (
           |  SELECT f_seg, f_tight, f_bal, n,
           |    (2000000 * mnum + mnum + unum) // (2 * (mnum + unum)) AS wq,
           |    mside, uside, p
           |  FROM (
           |    SELECT pat.*, p,
           |      (CASE WHEN f_seg = 1 THEN ms ELSE 1000 - ms END)
           |        * (CASE WHEN f_tight = 1 THEN mg ELSE 1000 - mg END)
           |        * (CASE WHEN f_bal = 1 THEN mb ELSE 1000 - mb END) AS mside,
           |      (CASE WHEN f_seg = 1 THEN us ELSE 1000 - us END)
           |        * (CASE WHEN f_tight = 1 THEN ug ELSE 1000 - ug END)
           |        * (CASE WHEN f_bal = 1 THEN ub ELSE 1000 - ub END) AS uside,
           |      p * (CASE WHEN f_seg = 1 THEN ms ELSE 1000 - ms END)
           |        * (CASE WHEN f_tight = 1 THEN mg ELSE 1000 - mg END)
           |        * (CASE WHEN f_bal = 1 THEN mb ELSE 1000 - mb END) AS mnum,
           |      (1000 - p) * (CASE WHEN f_seg = 1 THEN us ELSE 1000 - us END)
           |        * (CASE WHEN f_tight = 1 THEN ug ELSE 1000 - ug END)
           |        * (CASE WHEN f_bal = 1 THEN ub ELSE 1000 - ub END) AS unum
           |    FROM pat, p$Iters))
           |SELECT wf.f_seg, wf.f_tight, wf.f_bal, wf.n AS n_pairs,
           |  wf.wq AS w_ppm,
           |  round(CAST(wf.mside AS DOUBLE) / CAST(wf.uside AS DOUBLE), 6)
           |    AS ratio,
           |  CASE WHEN wf.mside > 1000 * wf.uside THEN 'link'
           |       WHEN wf.mside * 1000 < wf.uside THEN 'non-link'
           |       ELSE 'possible' END AS decision,
           |  wf.p AS p_match, pf.ms AS m_seg, pf.mg AS m_tight,
           |  pf.mb AS m_bal, pf.us AS u_seg, pf.ug AS u_tight, pf.ub AS u_bal
           |FROM wf, p$Iters pf
           |ORDER BY wf.f_seg, wf.f_tight, wf.f_bal""".stripMargin))

  // ---------------------------------------------------------------------
  // q366 — production-width comparison vector (the round-12 verdict ask)
  // ---------------------------------------------------------------------

  private def clampB(x: BigInt): BigInt =
    x.max(BigInt(1)).min(BigInt(999))
  private def sideB(f: Int, p: BigInt): BigInt =
    if (f == 1) p else BigInt(1000) - p

  /** One EM level over the ≤32-pattern aggregate, 5 features, HUGEINT
    * arithmetic (products reach 10²⁴ — past BIGINT — so every engine-side
    * number is exact at ANY pair count; the Scala twin runs BigInt).
    * u_seg is Winkler's value-specific frequency estimate and is HELD
    * through every M-step (the `us` pass-through).
    */
  private def emLvl5(k: Int): String =
    s"""w$k AS MATERIALIZED (
       |  SELECT f_seg, f_tight, f_bal, f_nex, f_nbd, n,
       |    CAST((2000000::HUGEINT * mnum + mnum + unum)
       |      // (2 * (mnum + unum)) AS BIGINT) AS wq
       |  FROM (
       |    SELECT pat.*,
       |      p::HUGEINT
       |        * (CASE WHEN f_seg = 1 THEN ms ELSE 1000 - ms END)
       |        * (CASE WHEN f_tight = 1 THEN mg ELSE 1000 - mg END)
       |        * (CASE WHEN f_bal = 1 THEN mb ELSE 1000 - mb END)
       |        * (CASE WHEN f_nex = 1 THEN mx ELSE 1000 - mx END)
       |        * (CASE WHEN f_nbd = 1 THEN my ELSE 1000 - my END) AS mnum,
       |      (1000 - p)::HUGEINT
       |        * (CASE WHEN f_seg = 1 THEN us ELSE 1000 - us END)
       |        * (CASE WHEN f_tight = 1 THEN ug ELSE 1000 - ug END)
       |        * (CASE WHEN f_bal = 1 THEN ub ELSE 1000 - ub END)
       |        * (CASE WHEN f_nex = 1 THEN ux ELSE 1000 - ux END)
       |        * (CASE WHEN f_nbd = 1 THEN uy ELSE 1000 - uy END) AS unum
       |    FROM pat, p${k - 1})),
       |p$k AS MATERIALIZED (
       |  SELECT
       |    CAST(least(greatest((2000::HUGEINT * b + 1000000::HUGEINT * nn)
       |      // (2 * 1000000::HUGEINT * nn), 1), 999) AS BIGINT) AS p,
       |    CAST(least(greatest((2000::HUGEINT * a1 + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS BIGINT) AS ms,
       |    CAST(least(greatest((2000::HUGEINT * a2 + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS BIGINT) AS mg,
       |    CAST(least(greatest((2000::HUGEINT * a3 + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS BIGINT) AS mb,
       |    CAST(least(greatest((2000::HUGEINT * a4 + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS BIGINT) AS mx,
       |    CAST(least(greatest((2000::HUGEINT * a5 + greatest(b, 1))
       |      // (2 * greatest(b, 1)), 1), 999) AS BIGINT) AS my,
       |    (SELECT us FROM p${k - 1}) AS us,
       |    CAST(least(greatest((2000::HUGEINT * d2 + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS BIGINT) AS ug,
       |    CAST(least(greatest((2000::HUGEINT * d3 + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS BIGINT) AS ub,
       |    CAST(least(greatest((2000::HUGEINT * d4 + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS BIGINT) AS ux,
       |    CAST(least(greatest((2000::HUGEINT * d5 + greatest(c, 1))
       |      // (2 * greatest(c, 1)), 1), 999) AS BIGINT) AS uy
       |  FROM (
       |    SELECT CAST(sum(n::HUGEINT * wq) AS HUGEINT) AS b,
       |      CAST(sum(n::HUGEINT * (1000000 - wq)) AS HUGEINT) AS c,
       |      CAST(sum(n::HUGEINT * wq * f_seg) AS HUGEINT) AS a1,
       |      CAST(sum(n::HUGEINT * wq * f_tight) AS HUGEINT) AS a2,
       |      CAST(sum(n::HUGEINT * wq * f_bal) AS HUGEINT) AS a3,
       |      CAST(sum(n::HUGEINT * wq * f_nex) AS HUGEINT) AS a4,
       |      CAST(sum(n::HUGEINT * wq * f_nbd) AS HUGEINT) AS a5,
       |      CAST(sum(n::HUGEINT * (1000000 - wq) * f_tight) AS HUGEINT) AS d2,
       |      CAST(sum(n::HUGEINT * (1000000 - wq) * f_bal) AS HUGEINT) AS d3,
       |      CAST(sum(n::HUGEINT * (1000000 - wq) * f_nex) AS HUGEINT) AS d4,
       |      CAST(sum(n::HUGEINT * (1000000 - wq) * f_nbd) AS HUGEINT) AS d5
       |    FROM w$k), tot)""".stripMargin

  /** q366 — q342's unsupervised EM widened to a PRODUCTION comparison
    * vector (the round-12 verdict's #3 ask): five binary features — the
    * original segment/exact-balance/±3-cent trio plus a NAME EXACT match
    * and a NAME LEVENSHTEIN ≤ 1 band (the q90 edit-distance machinery) —
    * and Winkler-style value-specific u for the segment feature, estimated
    * from the value-frequency distribution (u_seg = Σ_v n_v·d_v / N², the
    * chance-agreement probability) and HELD fixed through EM instead of
    * re-estimated.
    *
    * The replica perturbs names deterministically: every 3rd key's last
    * character becomes 'X' (edit distance 1 — inside the band), every 9th
    * key's last TWO become 'XX' (distance 2 — outside it), so the two
    * string features genuinely separate patterns; non-match blocked pairs
    * collide in the band exactly when their customer numbers differ in one
    * digit — realistic confusion, not a planted tautology.
    *
    * Pattern space: 2⁵ = 32 rows max — the corpus-scale work is still ONE
    * blocked equi-join + ONE groupBy; EM runs driver-side on that bounded
    * state. Arithmetic is BigInt/HUGEINT end to end (five per-mille factors
    * push E-step products to ~10²⁴, past the 3-feature query's BIGINT
    * budget), so there is NO overflow cliff at any pair count.
    */
  val q366FellegiSunterWide = GraftQuery(
    "q366_linkage_em_wide",
    (s, dir) => {
      val bal = round(col("c_acctbal") * 100, 0).cast("long")
      val widthFrame = Tables.customer(s, dir)
        .agg(greatest(lit(100L),
          expr("(1100000L * 256L) div count(*)")).as("width"))
      val clean = Tables.customer(s, dir).select(
        col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"), col("c_name").as("nm"), bal.as("bal"))
        .crossJoin(broadcast(widthFrame))
      val dirty = clean.select(
        col("ck").as("dk"), col("nk").as("dnk"),
        when(pmod(col("ck"), lit(4)) === 0, lit("UNKNOWN"))
          .otherwise(col("seg")).as("dseg"),
        when(pmod(col("ck"), lit(9)) === 0,
          concat(expr("substring(nm, 1, length(nm) - 2)"), lit("XX")))
          .when(pmod(col("ck"), lit(3)) === 0,
            concat(expr("substring(nm, 1, length(nm) - 1)"), lit("X")))
          .otherwise(col("nm")).as("dnm"),
        (col("bal") + pmod(col("ck"), lit(7)) - 3).as("dbal"),
        col("width").as("dwidth"))
      // adaptive width (see SCALING_r13B.json: the fixed $1000 bucket
      // measured a ~n^2 pair space at f3->f10) — expected block
      // population pinned at ~64 at any corpus size
      def bucket(c: String, w: String): Column =
        expr(s"($c + 100000L) div $w")

      // Winkler value-specific u for the segment feature: chance-agreement
      // probability from the two files' value-frequency tables (bounded:
      // ≤ 6 segment values a side), per-mille round-half-up in BigInt
      val cSeg = clean.groupBy("seg").agg(count(lit(1)).as("cn"))
        .collect().map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
      val dSeg = dirty.groupBy("dseg").agg(count(lit(1)).as("dn"))
        .collect().map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
      val sAgree = cSeg.map { case (v, cn) =>
        cn * dSeg.getOrElse(v, BigInt(0)) }.sum
      val tPairs = cSeg.values.sum * dSeg.values.sum
      val usegFreq = clampB((BigInt(2000) * sAgree + tPairs) / (2 * tPairs))

      val pat = clean.withColumn("blk", bucket("bal", "width"))
        .join(dirty.withColumn("dblk", bucket("dbal", "dwidth")),
          col("nk") === col("dnk") && col("blk") === col("dblk"))
        .select(
          when(col("seg") === col("dseg"), 1).otherwise(0).as("f_seg"),
          when(col("bal") === col("dbal"), 1).otherwise(0).as("f_tight"),
          when(abs(col("bal") - col("dbal")) <= 3, 1).otherwise(0).as("f_bal"),
          when(col("nm") === col("dnm"), 1).otherwise(0).as("f_nex"),
          when(levenshtein(col("nm"), col("dnm")) <= 1, 1).otherwise(0).as("f_nbd"))
        .groupBy("f_seg", "f_tight", "f_bal", "f_nex", "f_nbd")
        .agg(count(lit(1)).as("n"))
        .collect() // bounded: <= 32 agreement patterns, ever
        .map(r => (Array(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)), BigInt(r.getLong(5))))
      val nTot = pat.map(_._2).sum

      // 20 BigInt-exact EM iterations on the ≤32-row state; u(0) pinned
      var P = BigInt(100)
      val m = Array.fill(5)(BigInt(900))
      val u = Array(usegFreq, BigInt(100), BigInt(100), BigInt(100), BigInt(100))
      for (_ <- 1 to Iters) {
        var b = BigInt(0); var c = BigInt(0)
        val a = Array.fill(5)(BigInt(0)); val d = Array.fill(5)(BigInt(0))
        pat.foreach { case (f, n) =>
          val mnum = (0 until 5).map(i => sideB(f(i), m(i))).product * P
          val unum = (0 until 5).map(i => sideB(f(i), u(i))).product *
            (BigInt(1000) - P)
          val wq = (BigInt(2000000) * mnum + mnum + unum) / (2 * (mnum + unum))
          b += n * wq; c += n * (BigInt(1000000) - wq)
          for (i <- 0 until 5) {
            a(i) += n * wq * f(i); d(i) += n * (BigInt(1000000) - wq) * f(i)
          }
        }
        P = clampB((BigInt(2000) * b + BigInt(1000000) * nTot) /
          (2 * BigInt(1000000) * nTot))
        val bp = b.max(BigInt(1)); val cp = c.max(BigInt(1))
        for (i <- 0 until 5) {
          m(i) = clampB((BigInt(2000) * a(i) + bp) / (2 * bp))
          if (i > 0) u(i) = clampB((BigInt(2000) * d(i) + cp) / (2 * cp))
        }
      }

      val rows = pat.toSeq.map { case (f, n) =>
        val mside = (0 until 5).map(i => sideB(f(i), m(i))).product
        val uside = (0 until 5).map(i => sideB(f(i), u(i))).product
        val mnum = mside * P
        val unum = uside * (BigInt(1000) - P)
        val wq = (BigInt(2000000) * mnum + mnum + unum) / (2 * (mnum + unum))
        val decision =
          if (mside > BigInt(1000) * uside) "link"
          else if (mside * 1000 < uside) "non-link"
          else "possible"
        (f(0), f(1), f(2), f(3), f(4), n.toLong, wq.toLong,
          mside.toDouble, uside.toDouble, decision, P.toLong,
          m(0).toLong, m(1).toLong, m(2).toLong, m(3).toLong, m(4).toLong,
          u(0).toLong, u(1).toLong, u(2).toLong, u(3).toLong, u(4).toLong)
      }
      val s2 = s
      import s2.implicits._
      rows.toDF("f_seg", "f_tight", "f_bal", "f_nex", "f_nbd", "n_pairs",
          "w_ppm", "mside", "uside", "decision", "p_match",
          "m_seg", "m_tight", "m_bal", "m_nex", "m_nbd",
          "u_seg", "u_tight", "u_bal", "u_nex", "u_nbd")
        .select(col("f_seg"), col("f_tight"), col("f_bal"), col("f_nex"),
          col("f_nbd"), col("n_pairs"), col("w_ppm"),
          round(col("mside") / col("uside"), 6).as("ratio"),
          col("decision"), col("p_match"),
          col("m_seg"), col("m_tight"), col("m_bal"), col("m_nex"), col("m_nbd"),
          col("u_seg"), col("u_tight"), col("u_bal"), col("u_nex"), col("u_nbd"))
        .orderBy("f_seg", "f_tight", "f_bal", "f_nex", "f_nbd")
    },
    Some(s"""WITH clean AS (
           |  SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg,
           |    c_name AS nm, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
           |  FROM customer),
           |dirty AS (
           |  SELECT ck AS dk, nk AS dnk,
           |    CASE WHEN ck % 4 = 0 THEN 'UNKNOWN' ELSE seg END AS dseg,
           |    CASE WHEN ck % 9 = 0 THEN substr(nm, 1, length(nm) - 2) || 'XX'
           |         WHEN ck % 3 = 0 THEN substr(nm, 1, length(nm) - 1) || 'X'
           |         ELSE nm END AS dnm,
           |    bal + (ck % 7) - 3 AS dbal
           |  FROM clean),
           |bw AS (
           |  SELECT greatest(100, (1100000 * 256) // count(*)) AS width
           |  FROM customer),
           |useg AS (
           |  SELECT CAST(least(greatest((2000::HUGEINT * sa + tp) // (2 * tp), 1), 999)
           |      AS BIGINT) AS us
           |  FROM (
           |    SELECT CAST(sum(cn * dn) AS HUGEINT) AS sa,
           |      (SELECT count(*)::HUGEINT FROM clean)
           |        * (SELECT count(*)::HUGEINT FROM dirty) AS tp
           |    FROM (SELECT seg, count(*) AS cn FROM clean GROUP BY 1) c
           |    JOIN (SELECT dseg, count(*) AS dn FROM dirty GROUP BY 1) d
           |      ON c.seg = d.dseg)),
           |pat AS MATERIALIZED (
           |  SELECT CASE WHEN seg = dseg THEN 1 ELSE 0 END AS f_seg,
           |    CASE WHEN bal = dbal THEN 1 ELSE 0 END AS f_tight,
           |    CASE WHEN abs(bal - dbal) <= 3 THEN 1 ELSE 0 END AS f_bal,
           |    CASE WHEN nm = dnm THEN 1 ELSE 0 END AS f_nex,
           |    CASE WHEN levenshtein(nm, dnm) <= 1 THEN 1 ELSE 0 END AS f_nbd,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM clean JOIN dirty
           |    ON nk = dnk
           |    AND (bal + 100000) // (SELECT width FROM bw)
           |      = (dbal + 100000) // (SELECT width FROM bw)
           |  GROUP BY 1, 2, 3, 4, 5),
           |tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nn FROM pat),
           |p0 AS (SELECT CAST(100 AS BIGINT) AS p,
           |  CAST(900 AS BIGINT) AS ms, CAST(900 AS BIGINT) AS mg,
           |  CAST(900 AS BIGINT) AS mb, CAST(900 AS BIGINT) AS mx,
           |  CAST(900 AS BIGINT) AS my, (SELECT us FROM useg) AS us,
           |  CAST(100 AS BIGINT) AS ug, CAST(100 AS BIGINT) AS ub,
           |  CAST(100 AS BIGINT) AS ux, CAST(100 AS BIGINT) AS uy),
           |${(1 to Iters).map(emLvl5).mkString(",\n")},
           |wf AS (
           |  SELECT f_seg, f_tight, f_bal, f_nex, f_nbd, n,
           |    CAST((2000000::HUGEINT * mnum + mnum + unum)
           |      // (2 * (mnum + unum)) AS BIGINT) AS wq,
           |    mside, uside, p
           |  FROM (
           |    SELECT pat.*, p,
           |      1::HUGEINT
           |        * (CASE WHEN f_seg = 1 THEN ms ELSE 1000 - ms END)
           |        * (CASE WHEN f_tight = 1 THEN mg ELSE 1000 - mg END)
           |        * (CASE WHEN f_bal = 1 THEN mb ELSE 1000 - mb END)
           |        * (CASE WHEN f_nex = 1 THEN mx ELSE 1000 - mx END)
           |        * (CASE WHEN f_nbd = 1 THEN my ELSE 1000 - my END) AS mside,
           |      1::HUGEINT
           |        * (CASE WHEN f_seg = 1 THEN us ELSE 1000 - us END)
           |        * (CASE WHEN f_tight = 1 THEN ug ELSE 1000 - ug END)
           |        * (CASE WHEN f_bal = 1 THEN ub ELSE 1000 - ub END)
           |        * (CASE WHEN f_nex = 1 THEN ux ELSE 1000 - ux END)
           |        * (CASE WHEN f_nbd = 1 THEN uy ELSE 1000 - uy END) AS uside,
           |      p::HUGEINT
           |        * (CASE WHEN f_seg = 1 THEN ms ELSE 1000 - ms END)
           |        * (CASE WHEN f_tight = 1 THEN mg ELSE 1000 - mg END)
           |        * (CASE WHEN f_bal = 1 THEN mb ELSE 1000 - mb END)
           |        * (CASE WHEN f_nex = 1 THEN mx ELSE 1000 - mx END)
           |        * (CASE WHEN f_nbd = 1 THEN my ELSE 1000 - my END) AS mnum,
           |      (1000 - p)::HUGEINT
           |        * (CASE WHEN f_seg = 1 THEN us ELSE 1000 - us END)
           |        * (CASE WHEN f_tight = 1 THEN ug ELSE 1000 - ug END)
           |        * (CASE WHEN f_bal = 1 THEN ub ELSE 1000 - ub END)
           |        * (CASE WHEN f_nex = 1 THEN ux ELSE 1000 - ux END)
           |        * (CASE WHEN f_nbd = 1 THEN uy ELSE 1000 - uy END) AS unum
           |    FROM pat, p$Iters))
           |SELECT wf.f_seg, wf.f_tight, wf.f_bal, wf.f_nex, wf.f_nbd,
           |  wf.n AS n_pairs, wf.wq AS w_ppm,
           |  round(CAST(wf.mside AS DOUBLE) / CAST(wf.uside AS DOUBLE), 6)
           |    AS ratio,
           |  CASE WHEN wf.mside > 1000 * wf.uside THEN 'link'
           |       WHEN wf.mside * 1000 < wf.uside THEN 'non-link'
           |       ELSE 'possible' END AS decision,
           |  wf.p AS p_match, pf.ms AS m_seg, pf.mg AS m_tight,
           |  pf.mb AS m_bal, pf.mx AS m_nex, pf.my AS m_nbd,
           |  pf.us AS u_seg, pf.ug AS u_tight, pf.ub AS u_bal,
           |  pf.ux AS u_nex, pf.uy AS u_nbd
           |FROM wf, p$Iters pf
           |ORDER BY wf.f_seg, wf.f_tight, wf.f_bal, wf.f_nex, wf.f_nbd""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q342FellegiSunterEm, q366FellegiSunterWide)
}
