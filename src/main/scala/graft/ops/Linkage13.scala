package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** q374 — Jaro-Winkler candidate scoring over blocked linkage pairs: the
  * canonical string comparator of the record-linkage literature (Jaro
  * 1989, Winkler 1990 — the metric the Fellegi-Sunter weights of
  * q320/q342/q366 classically consume), computed by the engine's native
  * codegen expression (`functions/JaroWinkler.scala`) and hash-gated
  * against DuckDB's independent C++ `jaro_winkler_similarity` — the gate
  * checks the ALGORITHM itself across implementations, not a shared
  * library.
  */
object Linkage13 {

  /** Adaptive balance-bucket blocking key: +100000¢ shift makes the
    * domain strictly positive (floor = truncation in BOTH engines — no
    * signed-floor expansion), then divide by a data-derived width that
    * pins EXPECTED block population at ~64 regardless of corpus size
    * (width = max(100¢, ⌊span·64/n⌋) over the fixed TPC-H acctbal span).
    * A fixed bucket domain (the linkage family's original $1000 bucket)
    * makes the pair space grow ~n² — the first cut of q383 MEASURED a
    * f3→f10 exponent of 1.54 on exactly that, and the same audit then
    * caught q366 at 1.455, so the whole family (q320/q342/q366, now
    * target-256 for EM identification) adopted this adaptive key
    * (SCALING_r13B.json) — the q365 adaptive-cell discipline.
    */
  private def bucket(c: String, w: String): Column =
    expr(s"($c + 100000L) div $w")

  /** Jaro-Winkler banded linkage screen. A dirty replica of the customer
    * file perturbs names deterministically — every 9th key's last two
    * chars become 'XX' (JW ~0.95 on 18-char names), every 3rd key's last
    * char becomes 'X' (~0.98), every 5th key's last two chars SWAP (the
    * transposition case Levenshtein over-penalizes and JW half-counts) —
    * and candidate pairs come from a blocking join on (nationkey,
    * ADAPTIVE balance bucket — see [[jwPairs]]: width derived from the
    * corpus size so expected block population stays ~64 at any scale),
    * so the frame holds both planted same-key pairs and realistic
    * cross-key confusables (neighboring customer numbers differ in one
    * digit and score ≥0.97).
    *
    * The output is the per-band audit a linkage pipeline thresholds from:
    * exact integer pair counts and true-pair (same key) counts per JW
    * band, plus band min/max scores. Bands and extremes are
    * order-independent (no float accumulation anywhere: counts are exact,
    * min/max of bit-identical doubles are bit-identical), rounded at 6
    * for display.
    *
    * Scale shape: ONE blocked equi-join (the q320/q366 discipline — the
    * block key bounds the pair space), the comparator runs inside
    * whole-stage codegen per candidate pair, and one partial agg folds to
    * ≤6 band rows. No window, no collect, nothing corpus-sized beyond
    * the join.
    */
  /** The blocked, JW-scored candidate frame shared by q374 (band audit)
    * and q383 (mutual-best-match resolution): columns
    * (ck, dk, nm, dnm, jw). */
  private[ops] def jwPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    GraftFunctions.register(s)
    val bal = round(col("c_acctbal") * 100, 0).cast("long")
    val widthFrame = Tables.customer(s, dir)
      .agg(greatest(lit(100L),
        expr("(1100000L * 64L) div count(*)")).as("width"))
    val clean = Tables.customer(s, dir).select(
      col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
      col("c_name").as("nm"), bal.as("bal"))
      .crossJoin(broadcast(widthFrame))
    val swapLast2 = expr(
      """concat(substring(nm, 1, length(nm) - 2),
        |  substring(nm, length(nm), 1),
        |  substring(nm, length(nm) - 1, 1))""".stripMargin)
    val dirty = clean.select(
      col("ck").as("dk"), col("nk").as("dnk"),
      when(pmod(col("ck"), lit(9)) === 0,
        concat(expr("substring(nm, 1, length(nm) - 2)"), lit("XX")))
        .when(pmod(col("ck"), lit(3)) === 0,
          concat(expr("substring(nm, 1, length(nm) - 1)"), lit("X")))
        .when(pmod(col("ck"), lit(5)) === 0, swapLast2)
        .otherwise(col("nm")).as("dnm"),
      (col("bal") + pmod(col("ck"), lit(7)) - 3).as("dbal"),
      col("width").as("dwidth"))
    clean.withColumn("blk", bucket("bal", "width"))
      .join(dirty.withColumn("dblk", bucket("dbal", "dwidth")),
        col("nk") === col("dnk") && col("blk") === col("dblk"))
      .withColumn("jw", GraftFunctions.jaroWinkler(col("nm"), col("dnm")))
  }

  val q374JaroWinklerLinkage = GraftQuery(
    "q374_jaro_winkler_linkage",
    (s, dir) => {
      val pairs = jwPairs(s, dir)
        .withColumn("band",
          when(col("jw") === 1.0, "5_exact")
            .when(col("jw") >= 0.95, "4_very_high")
            .when(col("jw") >= 0.9, "3_high")
            .when(col("jw") >= 0.8, "2_medium")
            .when(col("jw") >= 0.7, "1_low")
            .otherwise("0_far"))
      pairs.groupBy("band")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("ck") === col("dk")).cast("long")).as("n_true"),
          round(min("jw"), 6).as("min_jw"),
          round(max("jw"), 6).as("max_jw"))
        .orderBy("band")
    },
    Some("""WITH clean AS (
           |  SELECT c_custkey AS ck, c_nationkey AS nk, c_name AS nm,
           |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
           |  FROM customer),
           |dirty AS (
           |  SELECT ck AS dk, nk AS dnk,
           |    CASE WHEN ck % 9 = 0
           |        THEN substr(nm, 1, length(nm) - 2) || 'XX'
           |      WHEN ck % 3 = 0
           |        THEN substr(nm, 1, length(nm) - 1) || 'X'
           |      WHEN ck % 5 = 0
           |        THEN substr(nm, 1, length(nm) - 2)
           |          || substr(nm, length(nm), 1)
           |          || substr(nm, length(nm) - 1, 1)
           |      ELSE nm END AS dnm,
           |    bal + ck % 7 - 3 AS dbal
           |  FROM clean),
           |w AS (
           |  SELECT greatest(100, (1100000 * 64) // count(*)) AS width
           |  FROM customer),
           |pairs AS (
           |  SELECT c.ck, d.dk, c.nm, d.dnm,
           |    jaro_winkler_similarity(c.nm, d.dnm) AS jw
           |  FROM clean c JOIN dirty d
           |    ON c.nk = d.dnk
           |    AND (c.bal + 100000) // (SELECT width FROM w)
           |      = (d.dbal + 100000) // (SELECT width FROM w)),
           |banded AS (
           |  SELECT ck, dk, jw,
           |    CASE WHEN jw = 1.0 THEN '5_exact'
           |      WHEN jw >= 0.95 THEN '4_very_high'
           |      WHEN jw >= 0.9 THEN '3_high'
           |      WHEN jw >= 0.8 THEN '2_medium'
           |      WHEN jw >= 0.7 THEN '1_low'
           |      ELSE '0_far' END AS band
           |  FROM pairs)
           |SELECT band, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(CASE WHEN ck = dk THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_true,
           |  round(min(jw), 6) AS min_jw,
           |  round(max(jw), 6) AS max_jw
           |FROM banded GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q383 — mutual-best-match entity resolution: the parallel 1:1
    * matching rule production ER systems run on a scored candidate frame
    * (each side keeps its argmax; a pair survives only when BOTH sides
    * chose each other — "reciprocal best hit", the same rule
    * bioinformatics uses for orthologs). Unlike greedy global matching
    * (inherently sequential), mutual-best is two keyed window ranks and
    * one join — embarrassingly parallel and deterministic: ranks order
    * by (jw DESC, partner key ASC), and jw doubles are bit-identical
    * cross-engine (JaroWinklerSpec), so tie handling is exact.
    *
    * Output is the resolution audit: candidate/matched/correct counts
    * with precision (correct/matched) and recall (correct/total clean
    * keys). Recall < 1 is structural — a planted pair whose ±3-cent
    * balance perturbation crosses its $1000 blocking bucket never enters
    * the candidate frame (the q366 blocking-loss note), and this query
    * MEASURES that loss instead of hiding it.
    *
    * Scale shape: q374's blocked join, two row_number windows keyed by
    * ck / dk (per-key candidate lists are block-bounded), one equi-join
    * of the two rank-1 frames, one partial agg.
    */
  val q383MutualBestMatch = GraftQuery(
    "q383_mutual_best_match",
    (s, dir) => {
      val pairs = jwPairs(s, dir).select("ck", "dk", "jw")
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy("ck").orderBy(col("jw").desc, col("dk"))
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy("dk").orderBy(col("jw").desc, col("ck"))
      val best = pairs
        .withColumn("rc", row_number().over(wC))
        .withColumn("rd", row_number().over(wD))
        .filter(col("rc") === 1 && col("rd") === 1)
      val nClean = Tables.customer(s, dir)
        .agg(count(lit(1)).as("n_clean"))
      best.agg(count(lit(1)).as("n_matched"),
        sum((col("ck") === col("dk")).cast("long")).as("n_correct"))
        .crossJoin(broadcast(nClean))
        .select(col("n_clean"), col("n_matched"), col("n_correct"),
          round(col("n_correct").cast("double") /
            col("n_matched").cast("double"), 6).as("precision"),
          round(col("n_correct").cast("double") /
            col("n_clean").cast("double"), 6).as("recall"))
    },
    Some("""WITH clean AS (
           |  SELECT c_custkey AS ck, c_nationkey AS nk, c_name AS nm,
           |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
           |  FROM customer),
           |dirty AS (
           |  SELECT ck AS dk, nk AS dnk,
           |    CASE WHEN ck % 9 = 0
           |        THEN substr(nm, 1, length(nm) - 2) || 'XX'
           |      WHEN ck % 3 = 0
           |        THEN substr(nm, 1, length(nm) - 1) || 'X'
           |      WHEN ck % 5 = 0
           |        THEN substr(nm, 1, length(nm) - 2)
           |          || substr(nm, length(nm), 1)
           |          || substr(nm, length(nm) - 1, 1)
           |      ELSE nm END AS dnm,
           |    bal + ck % 7 - 3 AS dbal
           |  FROM clean),
           |w AS (
           |  SELECT greatest(100, (1100000 * 64) // count(*)) AS width
           |  FROM customer),
           |pairs AS (
           |  SELECT c.ck, d.dk,
           |    jaro_winkler_similarity(c.nm, d.dnm) AS jw
           |  FROM clean c JOIN dirty d
           |    ON c.nk = d.dnk
           |    AND (c.bal + 100000) // (SELECT width FROM w)
           |      = (d.dbal + 100000) // (SELECT width FROM w)),
           |best AS (
           |  SELECT ck, dk FROM (
           |    SELECT ck, dk,
           |      row_number() OVER (PARTITION BY ck
           |        ORDER BY jw DESC, dk) AS rc,
           |      row_number() OVER (PARTITION BY dk
           |        ORDER BY jw DESC, ck) AS rd
           |    FROM pairs)
           |  WHERE rc = 1 AND rd = 1),
           |st AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_matched,
           |    CAST(sum(CASE WHEN ck = dk THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_correct
           |  FROM best),
           |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_clean FROM customer)
           |SELECT nc.n_clean, st.n_matched, st.n_correct,
           |  round(CAST(st.n_correct AS DOUBLE) /
           |    CAST(st.n_matched AS DOUBLE), 6) AS precision,
           |  round(CAST(st.n_correct AS DOUBLE) /
           |    CAST(nc.n_clean AS DOUBLE), 6) AS recall
           |FROM st, nc""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q374JaroWinklerLinkage, q383MutualBestMatch)
}
