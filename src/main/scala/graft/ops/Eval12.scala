package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** q359–q361 — round-12 evaluation/screening batch: embedding-dimension
  * truncation audit (the Matryoshka question), whole-word blocklist
  * screening (the C4-style curation gate), and chance-corrected
  * inter-annotator agreement (the annotation-quality companion to q340's
  * budget allocation).
  */
object Eval12 {

  /** Matryoshka/truncation recall audit (Kusupati et al. 2022's question,
    * asked of any embedding column: how much exact-cosine recall does a
    * 4× cheaper 16-dim prefix keep vs the full 64 dims?). For each of 5
    * query vectors: exact cosine top-10 under both dimensionalities, and
    * the overlap between the two top-10 sets — the measured recall a
    * truncated first-stage retriever would achieve against a full-dim
    * ground truth. Similarities round to 5 decimals BEFORE ranking (the
    * q112 round-before-rank discipline) with ties to the smaller id, so
    * the two rankings are bit-stable on both engines.
    *
    * Scale shape: queries broadcast (5 rows); the candidate pass is one
    * map-side dot-product scan per query (the documented brute-force
    * ground-truth form — q157/q255 hold the IVF scale path); rank windows
    * are keyed per query. The truncated prefix is sliced from the SAME
    * vector column — no second embedding table.
    */
  val q359TruncationRecall = GraftQuery(
    "q359_truncation_recall",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("vt", slice(col("v"), 1, 16))
        .select(col("vec_id"), col("v"), col("vt"),
          GraftFunctions.normL2(col("v")).as("nf"),
          GraftFunctions.normL2(col("vt")).as("nt"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("vt").as("qvt"), col("nf").as("qnf"), col("nt").as("qnt"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          round(GraftFunctions.dot(col("qv"), col("v")) /
            (col("qnf") * col("nf")), 5).as("sf"),
          round(GraftFunctions.dot(col("qvt"), col("vt")) /
            (col("qnt") * col("nt")), 5).as("st"))
      val wf = Window.partitionBy("qid").orderBy(desc("sf"), col("cid"))
      val wt = Window.partitionBy("qid").orderBy(desc("st"), col("cid"))
      scored
        .withColumn("rf", row_number().over(wf))
        .withColumn("rt", row_number().over(wt))
        .filter(col("rf") <= 10 || col("rt") <= 10)
        .groupBy("qid")
        .agg(sum(when(col("rf") <= 10 && col("rt") <= 10, 1L).otherwise(0L))
            .as("n_common"),
          // denominator = the achievable top-k: max(rf) over the kept rows
          // is the candidate-pool size whenever the pool is short of 10
          // (all rows kept) and >= 10 otherwise, so least(10, max(rf))
          // keeps the recall definition honest on sub-11-vector corpora
          // (round-12 ADVICE; identity on every real fixture)
          round(sum(when(col("rf") <= 10 && col("rt") <= 10, 1L)
            .otherwise(0L)).cast("double") /
            least(lit(10L), max(col("rf"))).cast("double"), 2)
            .as("recall_at_10"))
        .orderBy("qid")
    },
    Some("""WITH e AS MATERIALIZED (
           |  SELECT vec_id, embedding::DOUBLE[] AS v,
           |    (embedding::DOUBLE[])[1:16] AS vt,
           |    sqrt(list_sum(list_transform(embedding::DOUBLE[],
           |      x -> x * x))) AS nf,
           |    sqrt(list_sum(list_transform((embedding::DOUBLE[])[1:16],
           |      x -> x * x))) AS nt
           |  FROM embeddings),
           |q AS (SELECT vec_id AS qid, v AS qv, vt AS qvt, nf AS qnf,
           |    nt AS qnt
           |  FROM e WHERE vec_id < 5),
           |sc AS (
           |  SELECT qid, e.vec_id AS cid,
           |    round(list_sum(list_transform(range(1, 65),
           |      i -> qv[CAST(i AS INT)] * v[CAST(i AS INT)]))
           |      / (qnf * nf), 5) AS sf,
           |    round(list_sum(list_transform(range(1, 17),
           |      i -> qvt[CAST(i AS INT)] * vt[CAST(i AS INT)]))
           |      / (qnt * nt), 5) AS st
           |  FROM e, q WHERE e.vec_id <> qid),
           |rk AS (
           |  SELECT qid, cid,
           |    row_number() OVER (PARTITION BY qid ORDER BY sf DESC, cid)
           |      AS rf,
           |    row_number() OVER (PARTITION BY qid ORDER BY st DESC, cid)
           |      AS rt
           |  FROM sc)
           |SELECT qid,
           |  CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_common,
           |  round(CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1
           |    ELSE 0 END) AS DOUBLE)
           |    / CAST(least(10, max(rf)) AS DOUBLE), 2) AS recall_at_10
           |FROM rk WHERE rf <= 10 OR rt <= 10
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Whole-word blocklist screen (the C4-style curation gate: documents
    * containing flagged terms are held out of the corpus): exact TOKEN
    * match against a broadcast blocklist — never a substring regex, which
    * false-positives on innocent supersets — with per-source flag rates
    * and total hit counts. The fixture blocklist ('dup', 'slow') mixes a
    * rare and a common term so both the flagged and clean paths carry
    * mass at every scale.
    *
    * Scale shape: tokenize map-side, equi-join the token stream against
    * the broadcast blocklist (hits only survive), ONE per-doc partial
    * agg, left join back to documents so zero-hit docs count, ONE
    * per-source agg. Raw text never shuffles.
    */
  val q360BlocklistScreen = GraftQuery(
    "q360_blocklist_screen",
    (s, dir) => {
      import s.implicits._
      val blocked = Seq("dup", "slow").toDF("w")
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
            .as("ws"))
      val hits = d.select(col("doc_id"), explode(col("ws")).as("w"))
        .join(broadcast(blocked), "w")
        .groupBy("doc_id").agg(count(lit(1)).as("nh"))
      d.join(hits, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("nh").isNotNull, 1L).otherwise(0L)).as("n_flagged"),
          sum(coalesce(col("nh"), lit(0L))).as("n_hits"))
        .withColumn("flag_rate",
          round(col("n_flagged").cast("double") /
            col("n_docs").cast("double"), 6))
        .orderBy("source")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source,
           |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
           |      ' ') AS ws
           |  FROM documents),
           |hits AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nh
           |  FROM (SELECT doc_id, unnest(ws) AS w FROM d)
           |  WHERE w IN ('dup', 'slow')
           |  GROUP BY 1)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN nh IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_flagged,
           |  CAST(sum(coalesce(nh, 0)) AS BIGINT) AS n_hits,
           |  round(CAST(sum(CASE WHEN nh IS NOT NULL THEN 1 ELSE 0 END)
           |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS flag_rate
           |FROM d LEFT JOIN hits USING (doc_id)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Cohen's kappa inter-annotator agreement (Cohen 1960) between the
    * embedding labels and a deterministically perturbed second annotator
    * (label+1 mod 10 for every 7th vector — a known ~14% disagreement,
    * so the statistic is verifiable by construction): the
    * chance-corrected score every labeling pipeline reports before
    * trusting its annotation budget (q340 decides WHERE to label; kappa
    * decides whether the labels are worth anything).
    *
    * Exactness: kappa = (N·agree − Σ_c rowN_c·colN_c) /
    * (N² − Σ_c rowN_c·colN_c) — both numerator and denominator are exact
    * BIGINTs from two marginal aggregates joined on the ≤10-row class
    * key, and the display po/pe/kappa are single divisions.
    */
  val q361CohenKappa = GraftQuery(
    "q361_cohen_kappa",
    (s, dir) => {
      val d = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("a"),
          pmod(col("label") +
            when(pmod(col("vec_id"), lit(7)) === 0, 1L).otherwise(0L),
            lit(10L)).as("b"))
      val base = d.agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
      val rowN = d.groupBy(col("a").as("c")).agg(count(lit(1)).as("ra"))
      val colN = d.groupBy(col("b").as("c")).agg(count(lit(1)).as("rb"))
      val pe = rowN.join(colN, "c")
        .agg(sum(col("ra") * col("rb")).as("pe_num"))
      base.crossJoin(broadcast(pe))
        .select(col("n"), col("agree"),
          round(col("agree").cast("double") / col("n").cast("double"), 6)
            .as("po"),
          round(col("pe_num").cast("double") /
            (col("n") * col("n")).cast("double"), 6).as("pe"),
          round((col("n") * col("agree") - col("pe_num")).cast("double") /
            (col("n") * col("n") - col("pe_num")).cast("double"), 6)
            .as("kappa"))
    },
    Some("""WITH d AS (
           |  SELECT vec_id, CAST(label AS BIGINT) AS a,
           |    (CAST(label AS BIGINT) + CASE WHEN vec_id % 7 = 0
           |      THEN 1 ELSE 0 END) % 10 AS b
           |  FROM embeddings),
           |base AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
           |      AS agree
           |  FROM d),
           |rowN AS (SELECT a AS c, CAST(count(*) AS BIGINT) AS ra
           |  FROM d GROUP BY 1),
           |colN AS (SELECT b AS c, CAST(count(*) AS BIGINT) AS rb
           |  FROM d GROUP BY 1),
           |pe AS (SELECT CAST(sum(ra * rb) AS BIGINT) AS pe_num
           |  FROM rowN JOIN colN USING (c))
           |SELECT n, agree,
           |  round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
           |  round(CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
           |    AS pe,
           |  round(CAST(n * agree - pe_num AS DOUBLE) /
           |    CAST(n * n - pe_num AS DOUBLE), 6) AS kappa
           |FROM base, pe""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q359TruncationRecall, q360BlocklistScreen,
    q361CohenKappa)
}
