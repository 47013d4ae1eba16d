package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q399 — MinHash-LSH parameter planner: before running a q25-style
  * banded dedup at corpus scale, choose (bands b, rows-per-band r) with
  * b·r = 64 by evaluating the S-curve P(candidate | s) = 1 − (1 − s^r)^b
  * (Leskovec-Rajaraman-Ullman ch.3) against the corpus's OWN measured
  * pair-similarity distribution — the tuning step that decides whether
  * the banding recalls near-dups at the target threshold (t = 0.5)
  * without flooding the verifier with false candidates.
  *
  * The similarity distribution comes from an ADAPTIVE hash sample (the
  * lesson-w discipline): keep documents with md5 % max(1, n/64) = 0 —
  * expected 64 docs at ANY corpus size — and take exact token-set
  * Jaccards over that bounded pair set (~2k pairs), binned to 21
  * integer buckets via (20·|∩|) div |∪|. For each of the four 64-hash
  * configurations the expected false-positive / false-negative mass is
  * Σ over bins of round(10⁶·P)·count — per-bin micro-integers, then
  * BIGINT sums (order-free, the q388 cell discipline). s^r and
  * (1−s^r)^b are computed by explicit SQUARING CHAINS (s², s⁴, s⁸, s¹⁶
  * …), never pow() — the same IEEE-deterministic multiplication DAG in
  * both engines.
  *
  * Output: per config, sampled FP/FN rates and the recommended argmin
  * of fp+fn (every cost-tied config is flagged). On the fixture
  * the shared synthetic vocabulary pushes most pair similarity into the
  * 0.3–0.6 bins, so the configs genuinely trade off (r = 2 floods, r =
  * 16 starves) — the decision is non-vacuous.
  *
  * Scale shape: one scan to hash-filter ~64 docs (map-side), one bounded
  * self-join (≤64² pairs), one ≤21-row bin agg, then literal-frame
  * arithmetic. Nothing corpus-sized past the filter.
  */
object Dedup13 {

  private val configs = Seq((32, 2), (16, 4), (8, 8), (4, 16))

  /** Squaring-chain powers: s^r for r ∈ {2,4,8,16} and q^b for
    * b ∈ {4,8,16,32}, as SQL CASE over precomputed chain columns.
    */
  private def chainSql(base: String, exps: Seq[Int], pick: String): String = {
    def p(e: Int): String = e match {
      case 1 => s"($base)"
      case n => val h = p(n / 2); s"($h * $h)"
    }
    exps.map(e => s"WHEN $pick = $e THEN ${p(e)}")
      .mkString("CASE ", " ", " ELSE NULL END")
  }

  val q399LshPlanner = GraftQuery(
    "q399_lsh_planner",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
      val nFrame = docs.agg(
        greatest(lit(1L), expr("count(*) div 64")).as("bmod"))
      val samp = docs.crossJoin(broadcast(nFrame))
        .filter(conv(substring(md5(concat(lit("smp"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") %
          col("bmod") === 0)
        .select(col("doc_id"), col("toks"))
        .localCheckpoint() // expected ~64 docs at any SF
      val b = samp.select(col("doc_id").as("bid"), col("toks").as("btoks"))
      val pairs = samp.join(broadcast(b), col("doc_id") < col("bid"))
        .withColumn("inter",
          size(array_intersect(col("toks"), col("btoks"))).cast("long"))
        .withColumn("uni",
          (size(col("toks")) + size(col("btoks"))).cast("long") -
            col("inter"))
        .withColumn("bin", expr("(20L * inter) div uni"))
      val bins = pairs.groupBy("bin").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // ≤ 21 rows
      val confDf = configs.toDF("b", "r")
      val sExpr = "least((CAST(bin AS DOUBLE) + 0.5) / 20.0, 1.0)"
      val srExpr = chainSql(sExpr, Seq(2, 4, 8, 16), "r")
      val qExpr = s"(1.0 - ($srExpr))"
      val pExpr = s"(1.0 - ${chainSql(qExpr, Seq(4, 8, 16, 32), "b")})"
      val scored = bins.crossJoin(broadcast(confDf))
        .withColumn("p_micro",
          expr(s"CAST(round(($pExpr) * 1e6, 0) AS BIGINT)"))
        .withColumn("fp_micro",
          when(col("bin") < 10, col("p_micro") * col("cnt")).otherwise(0L))
        .withColumn("fn_micro",
          when(col("bin") >= 10,
            (lit(1000000L) - col("p_micro")) * col("cnt")).otherwise(0L))
        .withColumn("below", when(col("bin") < 10, col("cnt")).otherwise(0L))
        .withColumn("above", when(col("bin") >= 10, col("cnt")).otherwise(0L))
        .groupBy("b", "r")
        .agg(sum("cnt").as("n_pairs"),
          sum("fp_micro").as("fp_sum_micro"),
          sum("fn_micro").as("fn_sum_micro"),
          sum("below").as("n_below"), sum("above").as("n_above"))
      val ranked = scored
        .withColumn("cost", col("fp_sum_micro") + col("fn_sum_micro"))
      val bestCost = ranked.agg(min("cost").as("mincost"))
      ranked.crossJoin(broadcast(bestCost))
        .select(col("b"), col("r"), col("n_pairs"),
          round(col("fp_sum_micro").cast("double") / lit(1e6) /
            col("n_below").cast("double"), 6).as("fp_rate"),
          round(col("fn_sum_micro").cast("double") / lit(1e6) /
            col("n_above").cast("double"), 6).as("fn_rate"),
          (col("cost") === col("mincost")).cast("int").as("recommended"))
        .orderBy(col("r"))
    },
    Some {
      val sExpr = "least((CAST(bin AS DOUBLE) + 0.5) / 20.0, 1.0)"
      val srExpr = chainSql(sExpr, Seq(2, 4, 8, 16), "r")
      val qExpr = s"(1.0 - ($srExpr))"
      val pExpr = s"(1.0 - ${chainSql(qExpr, Seq(4, 8, 16, 32), "b")})"
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
         |  FROM documents),
         |nm AS (SELECT greatest(1, count(*) // 64) AS bmod FROM docs),
         |samp AS MATERIALIZED (
         |  SELECT doc_id, toks FROM docs, nm
         |  WHERE CAST(concat('0x', substr(md5('smp'
         |    || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % bmod = 0),
         |pairs AS (
         |  SELECT CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
         |      AS inter,
         |    CAST(len(a.toks) + len(b.toks) AS BIGINT)
         |      - CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
         |      AS uni
         |  FROM samp a JOIN samp b ON a.doc_id < b.doc_id),
         |bins AS (
         |  SELECT (20 * inter) // uni AS bin,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM pairs GROUP BY 1),
         |conf(b, r) AS (VALUES (32, 2), (16, 4), (8, 8), (4, 16)),
         |scored AS (
         |  SELECT conf.b, conf.r,
         |    CAST(sum(cnt) AS BIGINT) AS n_pairs,
         |    CAST(sum(CASE WHEN bin < 10
         |      THEN CAST(round(($pExpr) * 1e6, 0) AS BIGINT) * cnt
         |      ELSE 0 END) AS BIGINT) AS fp_sum_micro,
         |    CAST(sum(CASE WHEN bin >= 10
         |      THEN (1000000 - CAST(round(($pExpr) * 1e6, 0) AS BIGINT))
         |        * cnt ELSE 0 END) AS BIGINT) AS fn_sum_micro,
         |    CAST(sum(CASE WHEN bin < 10 THEN cnt ELSE 0 END) AS BIGINT)
         |      AS n_below,
         |    CAST(sum(CASE WHEN bin >= 10 THEN cnt ELSE 0 END) AS BIGINT)
         |      AS n_above
         |  FROM bins CROSS JOIN conf
         |  GROUP BY 1, 2),
         |mc AS (
         |  SELECT min(fp_sum_micro + fn_sum_micro) AS mincost FROM scored)
         |SELECT b, r, n_pairs,
         |  round(CAST(fp_sum_micro AS DOUBLE) / 1e6
         |    / CAST(n_below AS DOUBLE), 6) AS fp_rate,
         |  round(CAST(fn_sum_micro AS DOUBLE) / 1e6
         |    / CAST(n_above AS DOUBLE), 6) AS fn_rate,
         |  CAST(fp_sum_micro + fn_sum_micro = mc.mincost AS INT)
         |    AS recommended
         |FROM scored, mc ORDER BY r""".stripMargin
    })

  val all: Seq[GraftQuery] = Seq(q399LshPlanner)
}
