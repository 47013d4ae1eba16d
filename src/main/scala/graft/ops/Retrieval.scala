package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** Hybrid retrieval with reciprocal-rank fusion (RRF) — the standard RAG
  * retrieval primitive: candidates are ranked independently by lexical
  * overlap (word-set intersection) and by embedding cosine, then fused with
  * score = Σ 1/(60 + rank). One broadcast of the tiny query batch against a
  * single corpus scan computes both signals; ranks are computed per query
  * over rounded scores (float-drift-proof) and only the fused top-5 survive.
  */
object Retrieval {

  private def wordHashes(c: org.apache.spark.sql.Column) =
    sort_array(array_distinct(transform(split(c, " "),
      w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))))

  val q112HybridRrf = GraftQuery(
    "q112_hybrid_rrf",
    (s, dir) => {
      GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
        .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", GraftFunctions.normL2(col("v")))
        .withColumn("toks", wordHashes(col("text")))
        .select(col("doc_id"), col("toks"), col("v"), col("nrm"))
      val queries = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("toks").as("qt"),
          col("v").as("qv"), col("nrm").as("qn"))
      val scored = docs.join(broadcast(queries), col("doc_id") =!= col("qid"))
        .select(col("qid"), col("doc_id").as("cid"),
          GraftFunctions.intersectCount(col("qt"), col("toks")).as("overlap"),
          round(GraftFunctions.dot(col("qv"), col("v")) /
            (col("qn") * col("nrm")), 5).as("sim"))
      val wt = Window.partitionBy("qid").orderBy(desc("overlap"), col("cid"))
      val wv = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      val wf = Window.partitionBy("qid").orderBy(desc("rrf"), col("cid"))
      scored
        .withColumn("rank_text", row_number().over(wt))
        .withColumn("rank_vec", row_number().over(wv))
        .withColumn("rrf", round(lit(1.0) / (lit(60) + col("rank_text")) +
          lit(1.0) / (lit(60) + col("rank_vec")), 8))
        .withColumn("rn", row_number().over(wf))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("rn").as("rank"), col("cid"),
          col("overlap"), col("sim"), col("rrf"))
        .orderBy("qid", "rank")
    },
    Some("""WITH d AS (
           |  SELECT doc_id,
           |    list_sort(list_distinct(list_transform(string_split(text, ' '),
           |      w -> CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT)))) AS toks,
           |    e.embedding::DOUBLE[] AS v,
           |    sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x))) AS nrm
           |  FROM documents JOIN embeddings e ON doc_id = vec_id),
           |q AS (SELECT doc_id AS qid, toks AS qt, v AS qv, nrm AS qn FROM d WHERE doc_id < 5),
           |scored AS (
           |  SELECT q.qid, d.doc_id AS cid,
           |    CAST(len(list_filter(q.qt, t -> list_contains(d.toks, t))) AS BIGINT) AS overlap,
           |    round(list_sum(list_transform(range(1, 65), i -> q.qv[i] * d.v[i]))
           |      / (q.qn * d.nrm), 5) AS sim
           |  FROM d JOIN q ON d.doc_id <> q.qid),
           |ranked AS (
           |  SELECT *,
           |    row_number() OVER (PARTITION BY qid ORDER BY overlap DESC, cid) AS rank_text,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank_vec
           |  FROM scored),
           |fused AS (
           |  SELECT qid, cid, overlap, sim,
           |    round(1.0 / (60 + rank_text) + 1.0 / (60 + rank_vec), 8) AS rrf
           |  FROM ranked),
           |top AS (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS rank
           |  FROM fused)
           |SELECT qid, CAST(rank AS INT) AS rank, cid, overlap, sim, rrf
           |FROM top WHERE rank <= 5 ORDER BY qid, rank""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q112HybridRrf)
}
