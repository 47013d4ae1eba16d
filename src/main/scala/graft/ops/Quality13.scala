package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-13 text-quality batch: the per-document heuristic filters a
  * pretraining-corpus curation pipeline runs before any model sees a byte
  * (Rae et al. 2021 "Gopher" §A.1.1 rules; Flesch 1948 / Kincaid 1975
  * readability) — the "quality scoring (length/punct/stopword ratios)"
  * surface of the engine's training-data mandate.
  *
  * Discipline shared by both queries: every per-document statistic is an
  * EXACT INTEGER (token counts, summed lengths, regexp match counts), all
  * gate comparisons are integer cross-multiplications (10·Σlen ≥ 30·W
  * instead of a float mean), and the only floats are final display ratios
  * rounded at 4–6 — so the oracle replays bit-for-bit from the same
  * integers. Scale shape: one projection scan + one partial agg to
  * |sources| rows; no window, no join, no collect.
  */
object Quality13 {

  /** The 8-word function-word stoplist both engines inline as literals.
    * The fixture vocabulary contains exactly one of them ("the"), so the
    * has-a-stopword rule splits the corpus non-vacuously (docs without
    * any "the" fail — measured ~20% at sf0.01) instead of passing or
    * failing everything.
    */
  private val stops = "'the','a','of','to','and','in','is','it'"

  /** q389 — Gopher-style document quality gate: word count in [20, 800],
    * mean word length in [3, 10] (as 10·Σlen between 30·W and 100·W),
    * max word length ≤ 15, at least one stopword, stopword share ≤ 40%
    * (as 100·S ≤ 40·W). Output is the per-source curation audit: docs,
    * passes, and the two dominant failure reasons, each an exact count.
    */
  val q389GopherGate = GraftQuery(
    "q389_gopher_gate",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("wc", size(col("ws")).cast("long"))
        .withColumn("sumlen",
          expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))"))
        .withColumn("maxlen",
          expr("array_max(transform(ws, w -> length(w)))").cast("long"))
        .withColumn("nstop",
          expr(s"size(filter(ws, w -> w IN ($stops)))").cast("long"))
      val gated = d
        .withColumn("ok_wc", col("wc") >= 20 && col("wc") <= 800)
        .withColumn("ok_mean",
          lit(10) * col("sumlen") >= lit(30) * col("wc") &&
            lit(10) * col("sumlen") <= lit(100) * col("wc"))
        .withColumn("ok_max", col("maxlen") <= 15)
        .withColumn("ok_stop",
          col("nstop") >= 1 && lit(100) * col("nstop") <= lit(40) * col("wc"))
        .withColumn("pass",
          (col("ok_wc") && col("ok_mean") && col("ok_max") && col("ok_stop"))
            .cast("long"))
      gated.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("pass").as("n_pass"),
          sum((!col("ok_wc")).cast("long")).as("n_fail_wc"),
          sum((!col("ok_stop")).cast("long")).as("n_fail_stop"),
          round(sum("pass").cast("double") / count(lit(1)).cast("double"), 6)
            .as("pass_share"))
        .orderBy("source")
    },
    Some(s"""WITH d AS (
           |  SELECT source, string_split(text, ' ') AS ws FROM documents),
           |m AS (
           |  SELECT source,
           |    CAST(len(ws) AS BIGINT) AS wc,
           |    CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT)
           |      AS sumlen,
           |    CAST(list_max(list_transform(ws, w -> length(w))) AS BIGINT)
           |      AS maxlen,
           |    CAST(len(list_filter(ws, w -> w IN ($stops))) AS BIGINT)
           |      AS nstop
           |  FROM d),
           |g AS (
           |  SELECT source,
           |    (wc >= 20 AND wc <= 800) AS ok_wc,
           |    (10 * sumlen >= 30 * wc AND 10 * sumlen <= 100 * wc)
           |      AS ok_mean,
           |    (maxlen <= 15) AS ok_max,
           |    (nstop >= 1 AND 100 * nstop <= 40 * wc) AS ok_stop
           |  FROM m)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN ok_wc AND ok_mean AND ok_max AND ok_stop
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           |  CAST(sum(CASE WHEN ok_wc THEN 0 ELSE 1 END) AS BIGINT)
           |    AS n_fail_wc,
           |  CAST(sum(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS BIGINT)
           |    AS n_fail_stop,
           |  round(CAST(sum(CASE WHEN ok_wc AND ok_mean AND ok_max
           |      AND ok_stop THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE), 6) AS pass_share
           |FROM g GROUP BY source ORDER BY source""".stripMargin))

  /** q390 — Flesch reading-ease / Flesch-Kincaid grade per source, POOLED
    * from exact integer sums (Σwords, Σsyllables, Σsentences) rather than
    * averaging per-document floats — float sums are accumulation-order-
    * dependent, integer sums are not (the q243/q107 lesson). Syllables
    * use the standard vowel-group heuristic (#'[aeiouy]+' runs); sentence
    * count is max(1, #'[.!?]') per document so period-free synthetic text
    * degrades to the one-sentence reading of the formula instead of a
    * division by zero. Per-document extremes (min/max FRE) are rounded
    * per row BEFORE min/max, so both engines compare identical doubles.
    */
  val q390Readability = GraftQuery(
    "q390_readability",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("w", expr("regexp_count(lower(text), '[a-z]+')").cast("long"))
        .withColumn("syl",
          expr("regexp_count(lower(text), '[aeiouy]+')").cast("long"))
        .withColumn("sent",
          greatest(lit(1L), expr("regexp_count(text, '[.!?]')").cast("long")))
        .filter(col("w") > 0)
        .withColumn("fre",
          round(lit(206.835)
            - lit(1.015) * (col("w").cast("double") / col("sent").cast("double"))
            - lit(84.6) * (col("syl").cast("double") / col("w").cast("double")),
            4))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("w").as("sum_words"),
          sum("syl").as("sum_syll"),
          sum("sent").as("sum_sent"),
          round(lit(206.835)
            - lit(1.015) * (sum("w").cast("double") / sum("sent").cast("double"))
            - lit(84.6) * (sum("syl").cast("double") / sum("w").cast("double")),
            4).as("fre_pooled"),
          round(lit(0.39) * (sum("w").cast("double") / sum("sent").cast("double"))
            + lit(11.8) * (sum("syl").cast("double") / sum("w").cast("double"))
            - lit(15.59), 4).as("fk_grade"),
          min("fre").as("min_fre"),
          max("fre").as("max_fre"))
        .orderBy("source")
    },
    Some("""WITH m AS (
           |  SELECT source,
           |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
           |      AS w,
           |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
           |      AS BIGINT) AS syl,
           |    greatest(CAST(1 AS BIGINT),
           |      CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT))
           |      AS sent
           |  FROM documents),
           |f AS (
           |  SELECT source, w, syl, sent,
           |    round(206.835
           |      - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
           |      - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)), 4)
           |      AS fre
           |  FROM m WHERE w > 0)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(w) AS BIGINT) AS sum_words,
           |  CAST(sum(syl) AS BIGINT) AS sum_syll,
           |  CAST(sum(sent) AS BIGINT) AS sum_sent,
           |  round(206.835
           |    - 1.015 * (CAST(sum(w) AS DOUBLE) / CAST(sum(sent) AS DOUBLE))
           |    - 84.6 * (CAST(sum(syl) AS DOUBLE) / CAST(sum(w) AS DOUBLE)),
           |    4) AS fre_pooled,
           |  round(0.39 * (CAST(sum(w) AS DOUBLE) / CAST(sum(sent) AS DOUBLE))
           |    + 11.8 * (CAST(sum(syl) AS DOUBLE) / CAST(sum(w) AS DOUBLE))
           |    - 15.59, 4) AS fk_grade,
           |  min(fre) AS min_fre,
           |  max(fre) AS max_fre
           |FROM f GROUP BY source ORDER BY source""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q389GopherGate, q390Readability)
}
