package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q384/q385 — round-13 third statistics batch: Wilson-lower-bound
  * ranking (the small-sample-safe "sort by rating" every marketplace and
  * quality dashboard needs) and a randomization test with EXACT
  * Benjamini-Hochberg FDR control (the multiple-testing gate a curation
  * pipeline needs before acting on 20 per-source comparisons at once).
  */
object Stats13b {

  /** Wilson score lower bound (Wilson 1927; z = 1.96) over per-brand
    * return rates — ranking by the raw rate promotes tiny-n flukes (2/2
    * returns "beats" 180/200); the Wilson lower bound is the classic
    * correction (what "sort by rating" should be, per the well-known
    * Evan Miller note). Successes k = lineitems with l_returnflag = 'R',
    * trials n = all lineitems of the brand.
    *
    * Exactness: k and n are exact BIGINTs from one partial agg; the bound
    * is per-row float arithmetic from exact integers with the IDENTICAL
    * expression tree in both engines (z entering as the same double
    * literal, squared in-engine; sqrt is IEEE-correctly-rounded), rounded
    * at 6. The brand frame is bounded by the brand domain (25), ordered
    * with unique tie-breakers.
    *
    * Scale shape: one scan → one partial-agg groupBy on a bounded
    * domain → per-row math. Nothing else.
    */
  val q384WilsonBound = GraftQuery(
    "q384_wilson_bound",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_partkey", "l_returnflag")
      val pt = Tables.part(s, dir).select("p_partkey", "p_brand")
      val agg = li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum((col("l_returnflag") === "R").cast("long")).as("k"))
      val z = lit(1.96)
      val z2 = z * z
      val nD = col("n").cast("double")
      val ph = col("k").cast("double") / nD
      agg.select(col("p_brand"), col("n"), col("k"),
        round(ph, 6).as("raw_rate"),
        round((ph + z2 / (nD * 2.0) -
          z * sqrt((ph * (lit(1.0) - ph) + z2 / (nD * 4.0)) / nD)) /
          (lit(1.0) + z2 / nD), 6).as("wilson_lb"))
        .orderBy(col("wilson_lb").desc, col("p_brand"))
        .limit(10)
    },
    Some("""WITH agg AS (
           |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS k
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  GROUP BY 1),
           |w AS (
           |  SELECT p_brand, n, k,
           |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
           |    CAST(1.96 AS DOUBLE) AS z,
           |    CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2,
           |    CAST(n AS DOUBLE) AS nd
           |  FROM agg)
           |SELECT p_brand, n, k, round(ph, 6) AS raw_rate,
           |  round((ph + z2 / (2.0 * nd) -
           |    z * sqrt((ph * (1.0 - ph) + z2 / (4.0 * nd)) / nd)) /
           |    (1.0 + z2 / nd), 6) AS wilson_lb
           |FROM w
           |ORDER BY wilson_lb DESC, p_brand LIMIT 10""".stripMargin))

  /** Randomization test + EXACT Benjamini-Hochberg FDR control: twenty
    * per-source hypotheses ("does arm A read longer documents than arm
    * B?"), each tested by re-randomizing the arm label 39 times
    * (deterministic md5 coins — the derandomized permutation-test
    * discipline of q281/q301) and counting how often the null beats the
    * observed gap: p = (1 + #{k : |Δ_k| ≥ |Δ_0|})/40, an EXACT fortieth.
    * A planted +40-char effect on arm A of every 7th source (disclosed
    * ground truth, the q310/q320 pattern) gives BH real discoveries to
    * make; the remaining sources are true nulls.
    *
    * The BH step is INTEGER-ONLY: with p = num/40, α = 1/4, m = 20
    * hypotheses, the acceptance condition p_(k) ≤ kα/m reduces to
    * 2·num ≤ k — no float ever enters the multiple-testing decision, so
    * the reject set is bit-exact by construction. Rejected = rank ≤
    * k* = max{k : 2·num_(k) ≤ k} (BH's step-up rule).
    *
    * Scale shape: the corpus-scale work is ONE scan exploded ×40 (the
    * permutation axis) into a partial agg on (source, perm, label);
    * everything after runs on the 20-source frame (two bounded windows,
    * the q191/q204 post-aggregate pattern).
    */
  val q385RandomizationBh = GraftQuery(
    "q385_randomization_bh",
    (s, dir) => {
      val planted = pmod(col("src_num"), lit(7)) === 0
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          regexp_replace(col("source"), "[^0-9]", "").cast("long")
            .as("src_num"),
          (conv(substring(md5(concat(lit("arm"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2).as("arm"))
        .withColumn("x",
          when(planted && col("arm") === 1, col("n_chars") + 40L)
            .otherwise(col("n_chars")))
      val perms = d.withColumn("k", explode(expr("sequence(0, 39)")))
        .withColumn("glabel",
          when(col("k") === 0, col("arm"))
            .otherwise(conv(substring(md5(concat(lit("perm"),
              col("k").cast("string"), lit("_"),
              col("doc_id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 2))
      val cells = perms.groupBy("source", "k", "glabel")
        .agg(sum("x").as("sx"), count(lit(1)).as("cx"))
      val byPerm = cells.groupBy("source", "k")
        .agg(
          sum(when(col("glabel") === 1, col("sx"))).as("s1"),
          sum(when(col("glabel") === 1, col("cx"))).as("c1"),
          sum(when(col("glabel") === 0, col("sx"))).as("s0"),
          sum(when(col("glabel") === 0, col("cx"))).as("c0"))
        .select(col("source"), col("k"),
          when(col("c1") > 0 && col("c0") > 0,
            col("s1").cast("double") / col("c1").cast("double") -
              col("s0").cast("double") / col("c0").cast("double"))
            .otherwise(lit(0.0)).as("diff"))
      val obs = byPerm.filter(col("k") === 0)
        .select(col("source"), col("diff").as("obs_diff"))
      val p = byPerm.filter(col("k") >= 1)
        .join(obs, "source")
        .groupBy("source")
        .agg((sum((abs(col("diff")) >= abs(col("obs_diff")))
          .cast("long")) + 1L).as("p_num"),
          first(col("obs_diff"), true).as("obs_diff"))
      // BH step-up on the bounded 20-source frame (post-aggregate
      // windows, the q191 pattern): rank by (p_num, source), accept
      // where 4*num <= rank, reject everything up to the last accept
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("p_num"), col("source"))
      val wAll = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      p.withColumn("bh_rank", row_number().over(wRank))
        .withColumn("ok",
          when(lit(2L) * col("p_num") <= col("bh_rank"), col("bh_rank"))
            .otherwise(lit(0L)))
        .withColumn("k_star", max("ok").over(wAll))
        .select(col("source"), round(col("obs_diff"), 6).as("obs_diff"),
          col("p_num"), col("bh_rank"),
          (col("bh_rank") <= col("k_star")).cast("int").as("rejected"))
        .orderBy("bh_rank")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source, n_chars,
           |    CAST(regexp_replace(source, '[^0-9]', '', 'g') AS BIGINT)
           |      AS src_num,
           |    CAST(concat('0x', substr(md5('arm' || doc_id::VARCHAR),
           |      1, 8)) AS BIGINT) % 2 AS arm
           |  FROM documents),
           |dx AS (
           |  SELECT doc_id, source,
           |    CASE WHEN src_num % 7 = 0 AND arm = 1 THEN n_chars + 40
           |      ELSE n_chars END AS x,
           |    arm
           |  FROM d),
           |perms AS (
           |  SELECT dx.source, kk.k,
           |    CASE WHEN kk.k = 0 THEN dx.arm
           |      ELSE CAST(concat('0x', substr(md5('perm' || kk.k::VARCHAR
           |        || '_' || dx.doc_id::VARCHAR), 1, 8)) AS BIGINT) % 2
           |      END AS glabel,
           |    dx.x
           |  FROM dx, (SELECT unnest(range(0, 40)) AS k) kk),
           |cells AS (
           |  SELECT source, k, glabel, CAST(sum(x) AS BIGINT) AS sx,
           |    CAST(count(*) AS BIGINT) AS cx
           |  FROM perms GROUP BY 1, 2, 3),
           |byperm AS (
           |  SELECT source, k,
           |    CASE WHEN sum(CASE WHEN glabel = 1 THEN cx END) > 0
           |        AND sum(CASE WHEN glabel = 0 THEN cx END) > 0
           |      THEN CAST(sum(CASE WHEN glabel = 1 THEN sx END) AS DOUBLE)
           |          / CAST(sum(CASE WHEN glabel = 1 THEN cx END) AS DOUBLE)
           |        - CAST(sum(CASE WHEN glabel = 0 THEN sx END) AS DOUBLE)
           |          / CAST(sum(CASE WHEN glabel = 0 THEN cx END) AS DOUBLE)
           |      ELSE 0.0 END AS diff
           |  FROM cells GROUP BY 1, 2),
           |obs AS (
           |  SELECT source, diff AS obs_diff FROM byperm WHERE k = 0),
           |p AS (
           |  SELECT b.source,
           |    CAST(sum(CASE WHEN abs(b.diff) >= abs(o.obs_diff)
           |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS p_num,
           |    max(o.obs_diff) AS obs_diff
           |  FROM byperm b JOIN obs o ON o.source = b.source
           |  WHERE b.k >= 1 GROUP BY 1),
           |ranked AS (
           |  SELECT source, obs_diff, p_num,
           |    CAST(row_number() OVER (ORDER BY p_num, source) AS BIGINT)
           |      AS bh_rank
           |  FROM p),
           |kstar AS (
           |  SELECT CAST(coalesce(max(CASE WHEN 2 * p_num <= bh_rank
           |    THEN bh_rank END), 0) AS BIGINT) AS k_star
           |  FROM ranked)
           |SELECT r.source, round(r.obs_diff, 6) AS obs_diff, r.p_num,
           |  r.bh_rank,
           |  CAST(r.bh_rank <= ks.k_star AS INT) AS rejected
           |FROM ranked r, kstar ks ORDER BY r.bh_rank""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q384WilsonBound, q385RandomizationBh)
}
