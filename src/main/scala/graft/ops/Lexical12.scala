package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q362–q363 — lexical-diversity and rank-correlation additions: MATTR
  * (the windowed type-token ratio that, unlike raw TTR, doesn't collapse
  * with document length) and tie-corrected Spearman (the monotone
  * association test Pearson's linearity assumption can't cover).
  */
object Lexical12 {

  /** Moving-average type-token ratio (MATTR, Covington & McFall 2010)
    * with a 25-token window — the length-robust lexical-diversity signal
    * quality filters read (raw TTR decays mechanically with length, so
    * thresholding it biases against long documents; the windowed form
    * doesn't). Documents shorter than the window report plain TTR in a
    * separate pooled column. Both ratios pool EXACT integers per source
    * (Σ window-distinct counts / 25·Σ windows, and Σ distinct / Σ len)
    * with ONE display division each — no per-doc float averaging whose
    * accumulation order could drift.
    *
    * Scale shape: the window scan is a per-doc higher-order-function fold
    * (O(len·W) executor-side arithmetic, computed ONCE in a projection —
    * the q273/q274 HOF-reuse lesson), then one partial-agg groupBy per
    * source. Raw text never shuffles; the lambda index is cast BIGINT
    * before arithmetic (the q338 INT-lambda trap).
    */
  val q362Mattr = GraftQuery(
    "q362_mattr",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("source"),
          split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
            .as("ws"))
        .withColumn("len", size(col("ws")).cast("long"))
        // one projection computes the window-distinct sum ONCE
        .withColumn("wsum", expr(
          """CASE WHEN size(ws) >= 25 THEN
            |  aggregate(transform(sequence(1, size(ws) - 24),
            |    j -> size(array_distinct(slice(ws, j, 25)))),
            |    CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT))
            |ELSE CAST(0 AS BIGINT) END""".stripMargin))
        .withColumn("nwin",
          when(col("len") >= 25, col("len") - 24).otherwise(0L))
        .withColumn("sdist",
          when(col("len") < 25,
            size(array_distinct(col("ws"))).cast("long")).otherwise(0L))
        .withColumn("slen", when(col("len") < 25, col("len")).otherwise(0L))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("len") >= 25, 1L).otherwise(0L)).as("n_windowed"),
          sum("wsum").as("wdist"), sum("nwin").as("n_windows"),
          sum("sdist").as("short_dist"), sum("slen").as("short_len"))
        .select(col("source"), col("n_docs"), col("n_windowed"),
          col("n_windows"),
          when(col("n_windows") > 0,
            round(col("wdist").cast("double") /
              (lit(25.0) * col("n_windows").cast("double")), 6))
            .otherwise(lit(0.0)).as("mattr"),
          when(col("short_len") > 0,
            round(col("short_dist").cast("double") /
              col("short_len").cast("double"), 6))
            .otherwise(lit(0.0)).as("short_ttr"))
        .orderBy("source")
    },
    Some("""WITH d AS (
           |  SELECT source,
           |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
           |      ' ') AS ws
           |  FROM documents),
           |m AS (
           |  SELECT source, CAST(len(ws) AS BIGINT) AS len,
           |    CASE WHEN len(ws) >= 25 THEN
           |      CAST(list_sum(list_transform(range(1, len(ws) - 23),
           |        j -> len(list_distinct(ws[CAST(j AS INT) :
           |          CAST(j + 24 AS INT)])))) AS BIGINT)
           |    ELSE 0 END AS wsum,
           |    CASE WHEN len(ws) >= 25 THEN CAST(len(ws) - 24 AS BIGINT)
           |      ELSE 0 END AS nwin,
           |    CASE WHEN len(ws) < 25
           |      THEN CAST(len(list_distinct(ws)) AS BIGINT)
           |      ELSE 0 END AS sdist,
           |    CASE WHEN len(ws) < 25 THEN CAST(len(ws) AS BIGINT)
           |      ELSE 0 END AS slen
           |  FROM d)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN len >= 25 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_windowed,
           |  CAST(sum(nwin) AS BIGINT) AS n_windows,
           |  CASE WHEN sum(nwin) > 0 THEN
           |    round(CAST(sum(wsum) AS DOUBLE) /
           |      (25.0 * CAST(sum(nwin) AS DOUBLE)), 6)
           |  ELSE 0.0 END AS mattr,
           |  CASE WHEN sum(slen) > 0 THEN
           |    round(CAST(sum(sdist) AS DOUBLE) /
           |      CAST(sum(slen) AS DOUBLE), 6)
           |  ELSE 0.0 END AS short_ttr
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Tie-corrected Spearman rank correlation between per-document token
    * count and distinct-token count (does bigger mean more diverse, or
    * just more repetition?): average ranks with ties handled EXACTLY by
    * the doubled-rank trick — the average rank of value v is
    * (2·|{u < v}| + cnt_v + 1)/2, so 2·rank is an exact integer and ρ is
    * Pearson on the doubled ranks, with every moment accumulating in
    * DECIMAL(38,0)/HUGEINT (rank products reach (2n)² — BIGINT would wrap
    * at corpus scale) and ONE final float expression.
    *
    * Scale shape: two distinct-VALUE frames (bounded by the token-count
    * domain, ~hundreds of values regardless of corpus size) carry the
    * cumulative-below counts via a small non-equi aggregate join — never
    * a corpus-wide rank window; documents then equi-join their value's
    * rank and ONE partial agg produces the moments.
    */
  val q363SpearmanCorr = GraftQuery(
    "q363_spearman_corr",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
          .as("ws"))
        .select(size(col("ws")).cast("long").as("x"),
          size(array_distinct(col("ws"))).cast("long").as("y"))
        .persist()
      def rank2(c: String): org.apache.spark.sql.DataFrame = {
        val vals = d.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        val less = vals.select(col("v").as("v2"), col("cnt").as("c2"))
        vals.join(less, col("v2") < col("v"), "left")
          .groupBy("v", "cnt")
          .agg(coalesce(sum("c2"), lit(0L)).as("below"))
          .select(col("v").as(c),
            (lit(2L) * col("below") + col("cnt") + 1L).as(s"r$c"))
      }
      val ranked = d.join(rank2("x"), "x").join(rank2("y"), "y")
        .select(col("rx").cast("decimal(38,0)").as("rx"),
          col("ry").cast("decimal(38,0)").as("ry"))
      val m = ranked.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(expr("rx * rx")).as("sxx"), sum(expr("ry * ry")).as("syy"),
        sum(expr("rx * ry")).as("sxy"))
      val out = m.select(col("n").cast("long").as("n"),
        round(expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          (sqrt(expr("CAST(n * sxx - sx * sx AS DOUBLE)")) *
            sqrt(expr("CAST(n * syy - sy * sy AS DOUBLE)"))), 6)
          .as("rho")).localCheckpoint()
      d.unpersist()
      out
    },
    Some("""WITH d AS MATERIALIZED (
           |  SELECT CAST(len(ws) AS BIGINT) AS x,
           |    CAST(len(list_distinct(ws)) AS BIGINT) AS y
           |  FROM (SELECT string_split(trim(regexp_replace(text, '\s+',
           |    ' ', 'g')), ' ') AS ws FROM documents)),
           |vx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
           |  FROM d GROUP BY 1),
           |rx AS (
           |  SELECT a.v AS x,
           |    2 * CAST(coalesce(sum(b.cnt), 0) AS BIGINT) + a.cnt + 1
           |      AS rx
           |  FROM vx a LEFT JOIN vx b ON b.v < a.v
           |  GROUP BY a.v, a.cnt),
           |vy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
           |  FROM d GROUP BY 1),
           |ry AS (
           |  SELECT a.v AS y,
           |    2 * CAST(coalesce(sum(b.cnt), 0) AS BIGINT) + a.cnt + 1
           |      AS ry
           |  FROM vy a LEFT JOIN vy b ON b.v < a.v
           |  GROUP BY a.v, a.cnt),
           |r AS (
           |  SELECT CAST(rx AS HUGEINT) AS rx, CAST(ry AS HUGEINT) AS ry
           |  FROM d JOIN rx USING (x) JOIN ry USING (y)),
           |m AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS n,
           |    sum(rx) AS sx, sum(ry) AS sy,
           |    sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
           |    sum(rx * ry) AS sxy
           |  FROM r)
           |SELECT CAST(n AS BIGINT) AS n,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
           |FROM m""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q362Mattr, q363SpearmanCorr)
}
