package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** q386 — reciprocal-rank fusion of a lexical and a dense ranking
  * (Cormack, Clarke & Buettcher 2009): THE standard hybrid-retrieval
  * combiner — each ranker contributes 1/(k + rank), k = 60, so deep-tail
  * disagreements wash out while consistent top placements reinforce.
  * This is the fusion step the engine's retrieval family was missing
  * between its lexical scorers (q167 BM25, q327 Dirichlet QL) and its
  * dense search (q157/q255 IVFADC, q359).
  */
object Retrieval13b {

  /** Four fixed query documents (vec_id < 4, the q359 fixed-batch
    * discipline — the query set NEVER grows with the corpus). Candidates
    * are same-language documents; the lexical ranking orders by exact
    * distinct-token overlap with the query document (an integer — no
    * float enters the lexical leg at all), the dense ranking by full-dim
    * cosine rounded to 5 BEFORE ranking (the q112/q359 round-before-rank
    * discipline), both tie-broken by candidate id. The fused score is
    * kept INTEGER: rrf_micro = ⌊10⁶/(60+r_lex)⌋ + ⌊10⁶/(60+r_dense)⌋ —
    * order-free, overflow-free, and bit-identical across engines by
    * construction (exact integer ranks in, integer division out).
    *
    * Output: top-5 fused candidates per query with both leg ranks — the
    * audit showing fusion surfacing documents neither leg put first.
    *
    * Scale shape: the brute-force candidate pass is the documented
    * ground-truth form (queries broadcast, one map-side scan; q157/q255
    * hold the ANN scale path for the dense leg, q167's posting-list join
    * for the lexical leg); rank windows are keyed per query and the
    * top-5 filter compiles to WindowGroupLimit (map-side partial
    * limiting before the shuffle).
    */
  val q386RrfFusion = GraftQuery(
    "q386_rrf_fusion",
    (s, dir) => {
      GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
        .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"),
          array_distinct(split(col("text"), " ")).as("toks"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", GraftFunctions.normL2(col("v")))
      val q = docs.filter(col("doc_id") < 4)
        .select(col("doc_id").as("qid"), col("lang").as("qlang"),
          col("toks").as("qtoks"), col("v").as("qv"), col("nrm").as("qnrm"))
      val scored = docs.join(broadcast(q),
        col("lang") === col("qlang") && col("doc_id") =!= col("qid"))
        .select(col("qid"), col("doc_id").as("cid"),
          size(array_intersect(col("toks"), col("qtoks"))).cast("long")
            .as("overlap"),
          round(GraftFunctions.dot(col("qv"), col("v")) /
            (col("qnrm") * col("nrm")), 5).as("cos"))
      val wl = Window.partitionBy("qid").orderBy(desc("overlap"), col("cid"))
      val wd = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
      val ranked = scored
        .withColumn("r_lex", row_number().over(wl).cast("long"))
        .withColumn("r_dense", row_number().over(wd).cast("long"))
        .withColumn("rrf_micro",
          expr("1000000L div (60L + r_lex) + 1000000L div (60L + r_dense)"))
      val wf = Window.partitionBy("qid")
        .orderBy(desc("rrf_micro"), col("cid"))
      ranked.withColumn("fused_rank", row_number().over(wf).cast("long"))
        .filter(col("fused_rank") <= 5)
        .select("qid", "fused_rank", "cid", "rrf_micro", "r_lex", "r_dense",
          "overlap", "cos")
        .orderBy("qid", "fused_rank")
    },
    Some("""WITH d AS MATERIALIZED (
           |  SELECT doc_id, lang,
           |    list_distinct(string_split(text, ' ')) AS toks,
           |    embedding::DOUBLE[] AS v,
           |    sqrt(list_sum(list_transform(embedding::DOUBLE[],
           |      x -> x * x))) AS nrm
           |  FROM documents JOIN embeddings ON doc_id = vec_id),
           |q AS (SELECT doc_id AS qid, lang AS qlang, toks AS qtoks,
           |    v AS qv, nrm AS qnrm
           |  FROM d WHERE doc_id < 4),
           |sc AS (
           |  SELECT qid, d.doc_id AS cid,
           |    CAST(len(list_intersect(d.toks, q.qtoks)) AS BIGINT)
           |      AS overlap,
           |    round(list_sum(list_transform(range(1, 65),
           |      i -> qv[CAST(i AS INT)] * v[CAST(i AS INT)]))
           |      / (qnrm * nrm), 5) AS cos
           |  FROM d, q WHERE d.lang = q.qlang AND d.doc_id <> q.qid),
           |rk AS (
           |  SELECT qid, cid, overlap, cos,
           |    CAST(row_number() OVER (PARTITION BY qid
           |      ORDER BY overlap DESC, cid) AS BIGINT) AS r_lex,
           |    CAST(row_number() OVER (PARTITION BY qid
           |      ORDER BY cos DESC, cid) AS BIGINT) AS r_dense
           |  FROM sc),
           |fused AS (
           |  SELECT qid, cid, overlap, cos, r_lex, r_dense,
           |    1000000 // (60 + r_lex) + 1000000 // (60 + r_dense)
           |      AS rrf_micro
           |  FROM rk)
           |SELECT qid,
           |  CAST(row_number() OVER (PARTITION BY qid
           |    ORDER BY rrf_micro DESC, cid) AS BIGINT) AS fused_rank,
           |  cid, CAST(rrf_micro AS BIGINT) AS rrf_micro, r_lex, r_dense,
           |  overlap, cos
           |FROM fused
           |QUALIFY fused_rank <= 5
           |ORDER BY qid, fused_rank""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q386RrfFusion)
}
