package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** Round-13 text-hygiene additions: Unicode normalization + confusable
  * screening (q370, backed by the native [[graft.functions.NfcNormalize]]
  * codegen expression) and shingle-containment quotation/excerpt detection
  * (q371). Both synthesize their dirty inputs deterministically from
  * `documents` (the q273/q274/q275 self-contained-input discipline).
  */
object Text13 {

  private val Acute = "́" // combining acute accent
  private val CyrO = "о" // Cyrillic small o — Latin 'o' homoglyph
  private val CyrA = "а" // Cyrillic small a — Latin 'a' homoglyph

  /** Unicode text hygiene — the normalization/confusable screen a corpus
    * runs before any byte- or char-keyed dedup (UAX #15 + UTS #39): NFC
    * normalization via the native [[graft.functions.NfcNormalize]]
    * expression (Spark ships none; the JDK Normalizer and DuckDB's
    * utf8proc implement the same published algorithm) and a
    * Cyrillic-script confusable count (the homoglyph spam vector — 'о'/'а'
    * lookalikes poison char-hash dedup and tokenizers alike).
    *
    * Perturbations are planted deterministically: every 3rd doc's 'e'
    * becomes a decomposed e+COMBINING-ACUTE (NFC composes it back to é —
    * a 1-codepoint shrink the audit counts), every 4th doc's 'o' and every
    * 5th doc's 'a' become their Cyrillic homoglyphs (NFC-invariant, caught
    * only by the script screen; repair is one `translate` back to Latin,
    * exercised in Round13Spec). Per-source counts make the screen a
    * routing decision: which ingestion sources need the expensive
    * normalization pass at all.
    *
    * Scale: map-only string work (NFC is codegen'd, no HOF chain) + one
    * partial-agg groupBy to ≤|sources| rows.
    */
  val q370UnicodeHygiene = GraftQuery(
    "q370_unicode_hygiene",
    (s, dir) => {
      GraftFunctions.register(s)
      val d = col("doc_id")
      val t1 = when(d % 3 === 0, regexp_replace(col("text"), "e", "e" + Acute))
        .otherwise(col("text"))
      val t2 = when(d % 4 === 0, regexp_replace(t1, "o", CyrO)).otherwise(t1)
      val t3 = when(d % 5 === 0, regexp_replace(t2, "a", CyrA)).otherwise(t2)
      val base = Tables.documents(s, dir)
        .select(col("source"), t3.as("t"))
        .withColumn("nt", GraftFunctions.nfc(col("t")))
        .select(col("source"), length(col("t")).as("l1"),
          length(col("nt")).as("l2"),
          length(regexp_replace(col("nt"),
            "[^Ѐ-ӿ]", "")).as("cyr"))
      base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("l1") =!= col("l2"), 1L).otherwise(0L))
          .as("nfc_changed_docs"),
        sum(col("l1") - col("l2")).as("nfc_composed_chars"),
        sum(when(col("cyr") > 0, 1L).otherwise(0L)).as("homoglyph_docs"),
        sum(col("cyr")).as("homoglyph_chars"),
        round(sum(col("cyr")).cast("double") /
          sum(col("l2")).cast("double"), 6).as("homoglyph_ratio"))
        .orderBy("source")
    },
    Some("""WITH t3 AS (
           |  SELECT source,
           |    CASE WHEN doc_id % 5 = 0 THEN replace(
           |      CASE WHEN doc_id % 4 = 0 THEN replace(
           |        CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769)) ELSE text END,
           |        'o', chr(1086)) ELSE
           |        CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769)) ELSE text END END,
           |      'a', chr(1072)) ELSE
           |      CASE WHEN doc_id % 4 = 0 THEN replace(
           |        CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769)) ELSE text END,
           |        'o', chr(1086)) ELSE
           |        CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769)) ELSE text END END
           |    END AS t
           |  FROM documents),
           |n AS (SELECT source, t, nfc_normalize(t) AS nt FROM t3),
           |m AS (SELECT source, length(t) AS l1, length(nt) AS l2,
           |    length(regexp_replace(nt, '[^\x{0400}-\x{04FF}]', '', 'g')) AS cyr
           |  FROM n)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN l1 <> l2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS nfc_changed_docs,
           |  CAST(sum(l1 - l2) AS BIGINT) AS nfc_composed_chars,
           |  CAST(sum(CASE WHEN cyr > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS homoglyph_docs,
           |  CAST(sum(cyr) AS BIGINT) AS homoglyph_chars,
           |  round(CAST(sum(cyr) AS DOUBLE) / CAST(sum(l2) AS DOUBLE), 6)
           |    AS homoglyph_ratio
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Shingle CONTAINMENT detection — the superset/quotation screen Jaccard
    * misses: an excerpt shares only a small Jaccard with its source (the
    * source is long) but its shingle set is ~fully CONTAINED, so boilerplate
    * extraction, quotation chains, and partial scrapes need
    * C(A→B) = |S(A)∩S(B)| / |S(A)| (Broder's containment, the other half
    * of the resemblance paper). Excerpts are planted deterministically:
    * every 11th doc contributes its first ~40% of words (≥3) under
    * id + 2,000,000, so ground truth is exact — each excerpt's 3-gram set
    * is a subset of its source's and containment is 1.0 there, while
    * natural cross-doc containment stays far below the 0.8 gate.
    *
    * Scale: distinct shingles per doc (map + explode), ONE postings
    * equi-join on the shingle key (only co-occurring pairs materialize —
    * the q152 discipline), partial-agg pair counts, and a broadcast-size
    * join back to |S(A)|. No all-pairs stage.
    */
  val q371ShingleContainment = GraftQuery(
    "q371_shingle_containment",
    (s, dir) => {
      val ws = split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), ws.as("ws"))
      val exc = base.filter(pmod(col("doc_id"), lit(11)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          slice(col("ws"), lit(1),
            greatest(expr("(size(ws) * 2) div 5"), lit(3))).as("ws"))
      val corpus = base.unionAll(exc)
      val grams = corpus.select(col("doc_id"), explode(array_distinct(expr(
        """CASE WHEN size(ws) >= 3 THEN
          |  transform(sequence(0, size(ws) - 3),
          |    i -> concat_ws(' ', slice(ws, i + 1, 3)))
          |ELSE array() END""".stripMargin))).as("g"))
      val sa = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = grams.filter(col("doc_id") >= 2000000L)
        .select(col("doc_id").as("qa"), col("g"))
        .join(grams.filter(col("doc_id") < 2000000L)
          .select(col("doc_id").as("qb"), col("g")), "g")
        .groupBy("qa", "qb").agg(count(lit(1)).as("inter"))
      inter.join(sa.select(col("doc_id").as("qa"), col("sz")), "qa")
        .withColumn("containment",
          col("inter").cast("double") / col("sz").cast("double"))
        .filter(col("containment") >= 0.8)
        .select(col("qa").as("excerpt_id"), col("qb").as("src_id"),
          col("inter"), col("sz").as("n_shingles"),
          round(col("containment"), 6).as("containment"))
        .orderBy("excerpt_id", "src_id")
    },
    Some("""WITH base AS (
           |  SELECT doc_id,
           |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
           |  FROM documents),
           |exc AS (SELECT doc_id + 2000000 AS doc_id,
           |    ws[1 : greatest((len(ws) * 2) // 5, 3)] AS ws
           |  FROM base WHERE doc_id % 11 = 0),
           |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM exc),
           |grams AS (
           |  SELECT doc_id, unnest(list_distinct(
           |    [array_to_string(ws[i : i + 2], ' ')
           |     FOR i IN generate_series(1, len(ws) - 2)])) AS g
           |  FROM corpus),
           |sa AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
           |  FROM grams GROUP BY 1),
           |inter AS (
           |  SELECT a.doc_id AS qa, b.doc_id AS qb,
           |    CAST(count(*) AS BIGINT) AS inter
           |  FROM grams a JOIN grams b ON a.g = b.g
           |  WHERE a.doc_id >= 2000000 AND b.doc_id < 2000000
           |  GROUP BY 1, 2)
           |SELECT qa AS excerpt_id, qb AS src_id, inter,
           |  sa.sz AS n_shingles,
           |  round(CAST(inter AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6)
           |    AS containment
           |FROM inter JOIN sa ON sa.doc_id = qa
           |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= 0.8
           |ORDER BY 1, 2""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q370UnicodeHygiene, q371ShingleContainment)
}
