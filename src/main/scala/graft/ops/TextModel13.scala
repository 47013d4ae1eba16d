package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q391 — multinomial Naive Bayes language identification trained and
  * evaluated inside the engine (the fastText-style cheap classifier every
  * corpus pipeline runs for routing/filtering; McCallum & Nigam 1998 for
  * the event model): Laplace-smoothed per-language token likelihoods fit
  * on a hash-split train fold, argmax posterior on the held-out fold,
  * per-language accuracy against the fixture's true labels.
  *
  * Planted signal (disclosed ground truth, the q310/q392 discipline): the
  * fixture's five languages share ONE synthetic vocabulary whose mixes
  * are nearly uninformative — measured, a prior-weighted NB collapses to
  * the majority class and a uniform-prior NB scores ≈ chance — so the
  * query appends each language's characteristic function word ("the"/
  * "el"/"der"/"le"/"ma") to 75% of documents (md5-chosen, so 25% stay
  * unmarked noise). The classifier must LEARN that association from the
  * train fold; held-out accuracy beating the ~53% majority baseline — and
  * the unmarked quarter keeping it honestly below 100% — is the measured
  * evidence it did.
  *
  * Integer-exact scoring (the q342 per-10⁶ discipline): every log —
  * priors ln(n_lang/n) and token likelihoods ln((c+1)/(tot+V)) — is
  * rounded ONCE to integer micro-nats; a document's per-language score is
  * then prior + Σ count·weight, a pure BIGINT sum (order-free), and the
  * argmax is tie-broken lexicographically. The only transcendental is
  * that single rounded ln per (lang, token) — the established
  * cross-engine-safe pattern (q222/q327 ln parity; micro-rounding leaves
  * ~10⁻¹⁰ boundary exposure per value).
  *
  * Scale shape: corpus-scale work is two token-level partial aggs (train
  * counts, test doc×token counts); the weight table is |vocab|×|langs|
  * (31×5 here) and BROADCASTS — with an open production vocabulary it
  * would be capped to the q357 top-k via TakeOrderedAndProject, a
  * documented extension, not a plan change. Per-document posterior
  * ranking is a |langs|-row window per key. No collect anywhere.
  */
object TextModel13 {

  val q391NbLangid = GraftQuery(
    "q391_nb_langid",
    (s, dir) => {
      val marker = when(col("lang") === "en", " the")
        .when(col("lang") === "es", " el")
        .when(col("lang") === "de", " der")
        .when(col("lang") === "fr", " le")
        .otherwise(" ma")
      val marked = Tables.documents(s, dir)
        .withColumn("mtext",
          when(conv(substring(md5(concat(lit("mk"),
            col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 4
            < 3, concat(col("text"), marker))
            .otherwise(col("text")))
      val toks = marked
        .select(col("doc_id"), col("lang"),
          explode(split(col("mtext"), " ")).as("tok"))
        .withColumn("is_test",
          conv(substring(md5(concat(lit("split"),
            col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 8
            === 0)
      val trainCnt = toks.filter(!col("is_test"))
        .groupBy(col("lang").as("wl"), col("tok").as("wt"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤ |vocab| × |langs| rows
      val totals = trainCnt.groupBy("wl").agg(sum("c").as("tot"))
      val vocab = trainCnt.agg(countDistinct("wt").as("v"))
      val prior = Tables.documents(s, dir)
        .withColumn("is_test",
          conv(substring(md5(concat(lit("split"),
            col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 8
            === 0)
        .filter(!col("is_test"))
        .groupBy(col("lang").as("pl")).agg(count(lit(1)).as("nd"))
        .crossJoin(broadcast(Tables.documents(s, dir)
          .withColumn("is_test",
            conv(substring(md5(concat(lit("split"),
              col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 8
              === 0)
          .filter(!col("is_test")).agg(count(lit(1)).as("ntot"))))
        .withColumn("prior_micro",
          round(log(col("nd").cast("double") / col("ntot").cast("double"))
            * lit(1e6), 0).cast("long"))
        .select("pl", "prior_micro")
      val weights = trainCnt
        .join(broadcast(totals.withColumnRenamed("wl", "tl")),
          col("wl") === col("tl"))
        .drop("tl")
        .crossJoin(broadcast(vocab))
        .withColumn("w_micro",
          round(log((col("c") + 1).cast("double") /
            (col("tot") + col("v")).cast("double")) * lit(1e6), 0)
            .cast("long"))
        .select("wl", "wt", "w_micro")
      val defaults = totals.crossJoin(broadcast(vocab))
        .withColumn("w0_micro",
          round(log(lit(1.0) / (col("tot") + col("v")).cast("double"))
            * lit(1e6), 0).cast("long"))
        .select(col("wl").as("dl"), col("w0_micro"))
      val testToks = toks.filter(col("is_test"))
        .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tc"))
      val langs = totals.select(col("wl").as("sl"))
      val scored = testToks
        .crossJoin(broadcast(langs))
        .join(broadcast(weights),
          col("sl") === col("wl") && col("tok") === col("wt"), "left")
        .join(broadcast(defaults), col("sl") === col("dl"))
        .withColumn("wm", coalesce(col("w_micro"), col("w0_micro")))
        .groupBy("doc_id", "lang", "sl")
        .agg(sum(col("tc") * col("wm")).as("like_micro"))
        .join(broadcast(prior), col("sl") === col("pl"))
        .withColumn("score_micro", col("like_micro") + col("prior_micro"))
      val wr = Window.partitionBy("doc_id")
        .orderBy(desc("score_micro"), col("sl"))
      val pred = scored.withColumn("rk", row_number().over(wr))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("lang"), col("sl").as("pred"))
      pred.groupBy("lang")
        .agg(count(lit(1)).as("n_test"),
          sum((col("pred") === col("lang")).cast("long")).as("n_correct"),
          round(sum((col("pred") === col("lang")).cast("long"))
            .cast("double") / count(lit(1)).cast("double"), 4)
            .as("accuracy"))
        .orderBy("lang")
    },
    Some("""WITH marked AS (
           |  SELECT doc_id, lang,
           |    CASE WHEN CAST(concat('0x', substr(md5('mk'
           |        || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 < 3
           |      THEN text || (CASE lang WHEN 'en' THEN ' the'
           |        WHEN 'es' THEN ' el' WHEN 'de' THEN ' der'
           |        WHEN 'fr' THEN ' le' ELSE ' ma' END)
           |      ELSE text END AS mtext
           |  FROM documents),
           |toks AS MATERIALIZED (
           |  SELECT doc_id, lang, unnest(string_split(mtext, ' ')) AS tok,
           |    CAST(concat('0x', substr(md5('split'
           |      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 = 0
           |      AS is_test
           |  FROM marked),
           |traincnt AS MATERIALIZED (
           |  SELECT lang AS wl, tok AS wt, CAST(count(*) AS BIGINT) AS c
           |  FROM toks WHERE NOT is_test GROUP BY 1, 2),
           |totals AS (SELECT wl, CAST(sum(c) AS BIGINT) AS tot
           |  FROM traincnt GROUP BY 1),
           |vocab AS (SELECT CAST(count(DISTINCT wt) AS BIGINT) AS v
           |  FROM traincnt),
           |dsplit AS (
           |  SELECT doc_id, lang,
           |    CAST(concat('0x', substr(md5('split'
           |      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 = 0
           |      AS is_test
           |  FROM documents),
           |prior AS (
           |  SELECT lang AS pl,
           |    CAST(round(ln(CAST(count(*) AS DOUBLE)
           |      / CAST((SELECT count(*) FROM dsplit WHERE NOT is_test)
           |        AS DOUBLE)) * 1e6) AS BIGINT) AS prior_micro
           |  FROM dsplit WHERE NOT is_test GROUP BY 1),
           |weights AS (
           |  SELECT wl, wt,
           |    CAST(round(ln(CAST(c + 1 AS DOUBLE)
           |      / CAST(tot + v AS DOUBLE)) * 1e6) AS BIGINT) AS w_micro
           |  FROM traincnt JOIN totals USING (wl) CROSS JOIN vocab),
           |defaults AS (
           |  SELECT wl AS dl,
           |    CAST(round(ln(CAST(1.0 AS DOUBLE)
           |      / CAST(tot + v AS DOUBLE)) * 1e6) AS BIGINT) AS w0_micro
           |  FROM totals CROSS JOIN vocab),
           |testtok AS (
           |  SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tc
           |  FROM toks WHERE is_test GROUP BY 1, 2, 3),
           |scored AS (
           |  SELECT t.doc_id, t.lang, l.wl AS sl,
           |    CAST(sum(t.tc * coalesce(w.w_micro, d.w0_micro)) AS BIGINT)
           |      + max(p.prior_micro) AS score_micro
           |  FROM testtok t
           |  CROSS JOIN (SELECT wl FROM totals) l
           |  LEFT JOIN weights w ON w.wl = l.wl AND w.wt = t.tok
           |  JOIN defaults d ON d.dl = l.wl
           |  JOIN prior p ON p.pl = l.wl
           |  GROUP BY 1, 2, 3),
           |pred AS (
           |  SELECT doc_id, lang, sl AS pred
           |  FROM (SELECT doc_id, lang, sl,
           |      row_number() OVER (PARTITION BY doc_id
           |        ORDER BY score_micro DESC, sl) AS rk
           |    FROM scored)
           |  WHERE rk = 1)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_test,
           |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_correct,
           |  round(CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)
           |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS accuracy
           |FROM pred GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q391NbLangid)
}
