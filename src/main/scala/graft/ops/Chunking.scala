package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Training-data preparation operators: document chunking (overlapping
  * token windows) and corpus term statistics (TF-IDF) — both single-scan
  * shapes whose only shuffles are the final aggregations.
  */
object Chunking {

  /** Chunk every document into 40-token windows with a 30-token stride
    * (10-token overlap). Chunks are materialized per row via a computed
    * index sequence + slice — no UDF, no driver loop; at 100 TB this is a
    * map-only operator. Chunk text is fingerprinted so the oracle verifies
    * content, not just counts.
    */
  val q49Chunking = GraftQuery(
    "q49_chunking",
    (s, dir) => {
      val window = 40
      val stride = 30
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n", size(col("toks")))
        // chunk starts: 0, stride, 2*stride, ... while start < n
        .withColumn("starts",
          sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
        .select(col("doc_id"), col("toks"), col("n"),
          posexplode(col("starts")).as(Seq("chunk_id", "start")))
        .withColumn("chunk_toks",
          slice(col("toks"), col("start") + 1, lit(window)))
        .withColumn("chunk_len", size(col("chunk_toks")))
        .withColumn("fp", substring(md5(concat_ws(" ", col("chunk_toks"))), 1, 12))
        .select("doc_id", "chunk_id", "chunk_len", "fp")
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, string_split(text, ' ') toks,
           |    len(string_split(text, ' ')) n
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, u.i AS chunk_id, u.i * 30 AS start, toks
           |  FROM t, LATERAL (SELECT unnest(range(0, (n + 29) // 30)) AS i) u)
           |SELECT doc_id, chunk_id,
           |  len(toks[start + 1 : start + 40]) AS chunk_len,
           |  substr(md5(array_to_string(toks[start + 1 : start + 40], ' ')), 1, 12) AS fp
           |FROM c ORDER BY doc_id, chunk_id""".stripMargin))

  /** TF-IDF top terms: document frequency across the corpus, term frequency
    * per language, tf·idf = tf · ln(N/df), top-3 terms per language.
    * Explode → two partial-agg passes; the idf join is a broadcast.
    */
  val q50TopTerms = GraftQuery(
    "q50_top_terms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val n = docs.count() // corpus size: tiny scalar, computed once
      // persisted: df and tf both consume the exploded terms — uncached, the
      // tokenize+explode lineage runs twice (cache cleared by Bench/Verify)
      val terms = docs
        .select(col("doc_id"), col("lang"), explode(array_distinct(split(col("text"), " "))).as("term"))
        .persist()
      val df = terms.groupBy("term").agg(countDistinct("doc_id").as("df"))
      val tf = terms.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
      val scored = tf.join(broadcast(df), "term")
        .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      val w = Window.partitionBy("lang").orderBy(desc("tfidf"), col("term"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("lang", "rnk", "term", "tf", "df", "tfidf")
        .orderBy("lang", "rnk")
    },
    Some("""WITH terms AS (
           |  SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) term
           |  FROM documents),
           |dfreq AS (SELECT term, count(DISTINCT doc_id) df FROM terms GROUP BY 1),
           |tfreq AS (SELECT lang, term, count(*) tf FROM terms GROUP BY 1, 2),
           |scored AS (
           |  SELECT lang, tfreq.term, tf, df,
           |    round(tf * ln((SELECT count(*) FROM documents)::DOUBLE / df), 6) tfidf
           |  FROM tfreq JOIN dfreq ON tfreq.term = dfreq.term),
           |r AS (SELECT lang, term, tf, df, tfidf,
           |  row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) rnk
           |  FROM scored)
           |SELECT lang, rnk, term, tf, df, tfidf FROM r WHERE rnk <= 3
           |ORDER BY lang, rnk""".stripMargin))

  /** GPT-style sequence packing: documents are concatenated in doc_id order
    * and cut into fixed 2048-token context blocks; documents crossing a
    * block boundary are split into segments (the standard pretraining
    * packing that wastes zero pad tokens). Output is one row per
    * (doc, block) segment: where in the block stream each document's
    * tokens land.
    *
    * All integer arithmetic: a running token count (window sum) gives each
    * doc its absolute token offset, and `div` cuts offsets into blocks —
    * deterministic, no float, so the oracle mirrors it exactly.
    *
    * Scale (100 TB): the packing stream is (lang, shard), with
    * shard = doc_id mod 8 — a deterministic split of each language into
    * independent sub-streams, so a single dominant language can never
    * serialize through one window task (the per-lang form did exactly
    * that). Packing quality is unaffected: blocks are full except each
    * sub-stream's final block, and block ids are scoped to their
    * (lang, shard) stream. One shuffle (the window), then map-side
    * explode. On a real cluster NSHARDS scales with executor count.
    */
  val q128SequencePacking = GraftQuery(
    "q128_sequence_packing",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 2048L
      val nShards = 8
      val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("shard", col("doc_id") % nShards)
        .withColumn("cb", coalesce(sum("tok").over(w), lit(0L)))
        .withColumn("block_id",
          explode(sequence(expr(s"cb div $cap"),
            expr(s"(cb + tok - 1) div $cap"))))
        .select(
          col("lang"), col("shard"), col("doc_id"), col("block_id"),
          greatest(lit(0L), col("block_id") * cap - col("cb")).as("seg_start"),
          (least(col("cb") + col("tok"), (col("block_id") + 1) * cap) -
            greatest(col("cb"), col("block_id") * cap)).as("seg_len"))
        .orderBy("lang", "shard", "doc_id", "block_id")
    },
    Some("""WITH t AS (
           |  SELECT lang, doc_id % 8 AS shard, doc_id,
           |    len(string_split(text, ' ')) AS tok
           |  FROM documents),
           |c AS (
           |  SELECT lang, shard, doc_id, tok,
           |    CAST(COALESCE(sum(tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
           |  FROM t),
           |seg AS (
           |  SELECT lang, shard, doc_id, tok, cb,
           |    unnest(range(cb // 2048, (cb + tok - 1) // 2048 + 1)) AS block_id
           |  FROM c)
           |SELECT lang, shard, doc_id, CAST(block_id AS BIGINT) AS block_id,
           |  CAST(greatest(0, block_id * 2048 - cb) AS BIGINT) AS seg_start,
           |  CAST(least(cb + tok, (block_id + 1) * 2048)
           |    - greatest(cb, block_id * 2048) AS BIGINT) AS seg_len
           |FROM seg ORDER BY lang, shard, doc_id, block_id""".stripMargin))

  /** Length-bucketed batch formation with padding-waste accounting — the
    * finetuning/inference counterpart to q128's zero-pad concatenation
    * packing: each document is padded to its batch's max length, so batches
    * are formed from length-homogeneous buckets (descending length within a
    * bucket) to minimize pad tokens. Output is one row per batch with its
    * fill statistics: n_docs, max_tok, real tokens, pad tokens, pad ratio.
    *
    * Scale (100 TB): bucket = tok div 16 (map-only integer math — no global
    * sort, no ntile over a single partition) and the batch stream is
    * (bucket, shard) with shard = doc_id mod 4, the q128 sub-stream split —
    * a dominant length bucket can never serialize through one window task.
    * One shuffle (the per-stream window), then partial-agg per batch.
    * pad_pct is per-row integer-derived math, safe at 6 digits.
    */
  val q138LengthBatches = GraftQuery(
    "q138_length_batches",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val batchSize = 8
      val nShards = 4
      val w = Window.partitionBy("bucket", "shard")
        .orderBy(desc("tok"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("bucket", least(expr("tok div 16"), lit(7L)))
        .withColumn("shard", col("doc_id") % nShards)
        .withColumn("rn", row_number().over(w) - 1)
        .withColumn("batch_id", expr(s"rn div $batchSize"))
        .groupBy("bucket", "shard", "batch_id")
        .agg(count(lit(1)).as("n_docs"), max("tok").as("max_tok"),
          sum("tok").as("tok_sum"))
        .withColumn("pad_tokens", col("n_docs") * col("max_tok") - col("tok_sum"))
        .withColumn("pad_pct", round(col("pad_tokens").cast("double") /
          (col("n_docs") * col("max_tok")), 6))
        .select("bucket", "shard", "batch_id", "n_docs", "max_tok", "tok_sum",
          "pad_tokens", "pad_pct")
        .orderBy("bucket", "shard", "batch_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents),
           |b AS (
           |  SELECT doc_id, tok, least(tok // 16, 7) AS bucket,
           |    doc_id % 4 AS shard FROM t),
           |r AS (
           |  SELECT bucket, shard, doc_id, tok,
           |    row_number() OVER (PARTITION BY bucket, shard
           |      ORDER BY tok DESC, doc_id) - 1 AS rn
           |  FROM b),
           |g AS (
           |  SELECT bucket, shard, rn // 8 AS batch_id, count(*) AS n_docs,
           |    max(tok) AS max_tok, CAST(sum(tok) AS BIGINT) AS tok_sum
           |  FROM r GROUP BY 1, 2, 3)
           |SELECT bucket, shard, batch_id, n_docs, max_tok, tok_sum,
           |  n_docs * max_tok - tok_sum AS pad_tokens,
           |  round((n_docs * max_tok - tok_sum)::DOUBLE / (n_docs * max_tok), 6) AS pad_pct
           |FROM g ORDER BY bucket, shard, batch_id""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q49Chunking, q50TopTerms, q128SequencePacking, q138LengthBatches)
}
