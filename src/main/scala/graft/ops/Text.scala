package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Text-analysis operators for the LLM-data-pipeline surface (SURVEY.md
  * §2.3): per-language stats, token counting (whitespace + BPE-ish regex),
  * quality scoring, language-ID heuristic, and document fingerprinting.
  *
  * All computations are codegen-friendly built-in functions / higher-order
  * expressions over the `documents` table — no UDFs, so at 100 TB every
  * query is a single scan + partial aggregation with pushdown intact.
  * Cross-engine determinism: md5 for fingerprints (identical everywhere),
  * integer ratios before float math, rounded float outputs.
  */
object Text {

  private[ops] def toks(c: Column): Column = split(c, " ")

  /** Per-language corpus stats: doc counts, token totals, char stats, and a
    * consistency count of the precomputed n_chars column vs length(text).
    */
  val q19TextStats = GraftQuery(
    "q19_text_stats",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(toks(col("text")))).as("n_tokens"),
          round(avg("n_chars"), 4).as("avg_chars"),
          max("n_chars").as("max_chars"),
          sum(when(col("n_chars") === length(col("text")), 1L).otherwise(0L)).as("n_consistent"))
        .orderBy("lang"),
    // CAST the integer sums: DuckDB sum(BIGINT) is HUGEINT, Spark emits LONG.
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           |  round(avg(n_chars), 4) AS avg_chars, max(n_chars) AS max_chars,
           |  CAST(sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (letter runs / digit runs / single non-space symbols).
    */
  val q20TokenCounts = GraftQuery(
    "q20_token_counts",
    (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 50)
        .select(
          col("doc_id"),
          size(toks(col("text"))).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|\\S"), lit(0))).as("n_bpe_tokens"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
           |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS n_bpe_tokens,
           |  length(text) AS n_chars
           |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin))

  /** Quality scoring: length saturation, stopword ratio, lexical diversity —
    * integer counts ratioed then combined with fixed weights, aggregated per
    * (lang, source).
    */
  val q21QualityScore = GraftQuery(
    "q21_quality_score",
    (s, dir) => {
      val t = toks(col("text"))
      val nTok = size(t).cast("double")
      val nStop = size(filter(t, x => x.isin("the", "a", "of", "in", "to"))).cast("double")
      val nUniq = size(array_distinct(t)).cast("double")
      val score =
        lit(0.4) * least(lit(1.0), size(t).cast("double") / 100.0) +
        lit(0.3) * (nStop / nTok) +
        lit(0.3) * (nUniq / nTok)
      Tables.documents(s, dir)
        .withColumn("score", score)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), round(avg("score"), 4).as("avg_quality"))
        .orderBy("lang", "source")
    },
    Some("""WITH scored AS (
           |  SELECT lang, source,
           |    0.4 * least(1.0, len(string_split(text,' '))::DOUBLE / 100.0) +
           |    0.3 * (len(list_filter(string_split(text,' '),
           |             x -> x IN ('the','a','of','in','to')))::DOUBLE
           |           / len(string_split(text,' '))) +
           |    0.3 * (len(list_distinct(string_split(text,' ')))::DOUBLE
           |           / len(string_split(text,' '))) AS score
           |  FROM documents)
           |SELECT lang, source, count(*) AS n_docs, round(avg(score), 4) AS avg_quality
           |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Language-ID heuristic (stopword n-gram matching) scored against the
    * labeled lang column as a confusion matrix.
    */
  val q22LangId = GraftQuery(
    "q22_lang_id",
    (s, dir) => {
      val padded = concat(lit(" "), col("text"), lit(" "))
      val pred = when(padded.contains(" the ") || padded.contains(" a "), "en")
        .when(padded.contains(" la ") || padded.contains(" el "), "es")
        .when(padded.contains(" der ") || padded.contains(" und "), "de")
        .otherwise("unk")
      Tables.documents(s, dir)
        .withColumn("pred", pred)
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    },
    Some("""SELECT lang,
           |  CASE WHEN ' '||text||' ' LIKE '% the %' OR ' '||text||' ' LIKE '% a %' THEN 'en'
           |       WHEN ' '||text||' ' LIKE '% la %' OR ' '||text||' ' LIKE '% el %' THEN 'es'
           |       WHEN ' '||text||' ' LIKE '% der %' OR ' '||text||' ' LIKE '% und %' THEN 'de'
           |       ELSE 'unk' END AS pred,
           |  count(*) AS n
           |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Document fingerprinting: md5-based content fingerprints rolled up per
    * source (unique-fingerprint counts = exact-dup detection input).
    */
  val q23Fingerprints = GraftQuery(
    "q23_fingerprints",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("fp", substring(md5(col("text")), 1, 16))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          min("fp").as("min_fp"))
        .orderBy("source"),
    Some("""SELECT source, count(*) AS n_docs,
           |  count(DISTINCT substr(md5(text), 1, 16)) AS n_unique,
           |  min(substr(md5(text), 1, 16)) AS min_fp
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Sentence splitting: boundaries at sentence-final punctuation followed
    * by whitespace, empties dropped. Shipped as a library transform with its
    * own spec (the synthetic fixture corpus carries no punctuation, so an
    * oracle query over it would be degenerate — every doc one sentence).
    */
  def sentences(text: Column): Column =
    filter(split(text, "[.!?] "), s => length(trim(s)) > 0)

  /** Perplexity-proxy quality scoring: per-document mean negative log
    * likelihood under the corpus's own unigram LM (count/total). Two passes:
    * token counts (one explode + partial agg), then a token⋈vocab join.
    * At 100 TB the vocab join is the shuffle to watch — vocab is Zipfian and
    * usually broadcastable after a min-count cut; here it's left to AQE.
    */
  val q60Perplexity = GraftQuery(
    "q60_perplexity",
    (s, dir) => {
      // persisted: the vocab count, the total, and the tok⋈vocab join all
      // re-read the exploded tokens (cache cleared by Bench/Verify)
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(toks(col("text"))).as("t"))
        .persist()
      val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      val total = vocab.agg(sum("c")).first().getLong(0).toDouble
      tok.join(vocab, "t")
        .withColumn("nl", -log(col("c").cast("double") / lit(total)))
        .groupBy("doc_id", "lang", "source")
        .agg(avg("nl").as("nll"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), round(avg("nll"), 3).as("avg_nll"))
        .orderBy("lang", "source")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) t
           |  FROM documents),
           |vocab AS (SELECT t, count(*) c FROM tok GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS DOUBLE) s FROM vocab),
           |perdoc AS (
           |  SELECT doc_id, lang, source, avg(-ln(c::DOUBLE / s)) nll
           |  FROM tok JOIN vocab USING (t), tot GROUP BY 1, 2, 3)
           |SELECT lang, source, count(*) AS n_docs, round(avg(nll), 3) AS avg_nll
           |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Corpus bigram frequencies: top-10 word pairs (unique tie-break on the
    * bigram string so both engines rank identically).
    */
  val q61Bigrams = GraftQuery(
    "q61_bigrams",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(explode(
          graft.functions.GraftFunctions.wordGrams(col("text"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("bigram"))
        .limit(10)
    },
    Some("""SELECT bigram, count(*) AS n FROM (
           |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
           |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) bigram
           |  FROM documents) b
           |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 10""".stripMargin))

  /** Per-language top trigram through the custom UDTF
    * ([[graft.functions.GramGenerator]]) in SQL `LATERAL VIEW` — the table-
    * function path: generate → aggregate → rank, all planned by Catalyst.
    */
  val q64TopTrigramUdtf = GraftQuery(
    "q64_top_trigram_udtf",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("docs_q64")
      s.sql("""SELECT lang, gram AS top_gram, n FROM (
              |  SELECT lang, gram, count(*) AS n,
              |    row_number() OVER (PARTITION BY lang
              |      ORDER BY count(*) DESC, gram) AS rn
              |  FROM docs_q64 LATERAL VIEW graft_gram_gen(text, 3) g AS pos, gram
              |  GROUP BY lang, gram) t
              |WHERE rn = 1 ORDER BY lang""".stripMargin)
    },
    Some("""WITH g AS (
           |  SELECT lang, unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
           |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
           |         string_split(text, ' ')[i+2])) gram
           |  FROM documents),
           |c AS (SELECT lang, gram, count(*) n FROM g GROUP BY 1, 2),
           |r AS (SELECT lang, gram, n,
           |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) rn FROM c)
           |SELECT lang, gram AS top_gram, n FROM r WHERE rn = 1 ORDER BY lang""".stripMargin))

  /** First BPE merge step (tokenizer training): count adjacent character
    * pairs across the corpus and rank the merge candidates. Done the way a
    * corpus-scale tokenizer trainer does it — pair counting runs over the
    * DEDUPLICATED vocabulary weighted by word frequency, not over raw text:
    * the word-count aggregation (classic partial-agg word count) collapses
    * 100 TB of text to a vocabulary-sized table first, and the quadratic-ish
    * pair explosion only ever touches distinct words. Top-20 pairs with a
    * deterministic (count desc, pair asc) tie-break.
    */
  val q130BpePairs = GraftQuery(
    "q130_bpe_pairs",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(explode(toks(col("text"))).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy("word").agg(count(lit(1)).as("wc"))
      words
        .select(col("word"), col("wc"),
          posexplode(sequence(lit(1), length(col("word")) - 1)))
        .select(expr("substr(word, col, 2)").as("pair"), col("wc"))
        .groupBy("pair").agg(sum("wc").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    },
    Some("""WITH w AS (
           |  SELECT word, count(*) AS wc FROM (
           |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           |  WHERE length(word) >= 2 GROUP BY word),
           |p AS (
           |  SELECT substr(word, CAST(i AS INT), 2) AS pair, wc
           |  FROM (SELECT word, wc, unnest(range(1, length(word))) AS i FROM w))
           |SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
           |FROM p GROUP BY pair
           |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin))

  /** Iterated BPE merge training (the actual tokenizer-training kernel —
    * q130 is a single step of this): starting from character symbols, K
    * times pick the most frequent adjacent symbol pair over the
    * frequency-weighted vocabulary and merge it everywhere, emitting the
    * merge table (the artifact a BPE tokenizer ships).
    *
    * Symbol sequences ride as delimited strings `(s1)(s2)…` over a
    * `[a-z]+` vocabulary, so applying a merge is a literal leftmost
    * non-overlapping `replace("(a)(b)" → "(ab)")` — exactly BPE's
    * left-to-right merge-application order, identical in Spark and DuckDB,
    * and boundary-safe because parens cannot occur inside symbols.
    *
    * Scale shape: the driver loop is K=5 rounds like q98_pagerank; each
    * round is one distributed pair-count over the VOCABULARY (not the
    * corpus — the word-count agg collapsed that first) and a top-1
    * `limit(1).collect()` of a single 16-byte row. The seq table is
    * localCheckpointed per round to keep lineage O(1).
    */
  /** Shared oracle CTE chain for the BPE queries: vocabulary → char-symbol
    * sequences → five unrolled merge rounds (pair count, top-1, replace),
    * leaving t1..t5 (per-round winners) and s5 (final encoded vocabulary)
    * in scope for the caller's final SELECT.
    */
  private def bpeOracleCtes: String = "WITH " + bpeMergeCtes("documents")

  /** The same CTE chain WITHOUT the leading WITH and with a caller-chosen
    * source relation, so composed oracles (q308) can train the replayed
    * BPE on their own intermediate CTE instead of the raw corpus.
    */
  private[ops] def bpeMergeCtes(src: String): String = {
    def round(k: Int): String =
      s"""p$k AS (
         |  SELECT '(' || sym[CAST(i AS INT)] || ')(' || sym[CAST(i AS INT) + 1] || ')' AS pair,
         |    CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM (SELECT sym, wc, unnest(range(1, len(sym))) AS i
         |        FROM (SELECT string_split(substr(seq, 2, length(seq) - 2), ')(') AS sym, wc
         |              FROM s${k - 1})
         |        WHERE len(sym) >= 2)
         |  GROUP BY 1),
         |t$k AS MATERIALIZED (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair LIMIT 1),
         |s$k AS MATERIALIZED (SELECT CASE WHEN (SELECT count(*) FROM t$k) = 0 THEN seq
         |    ELSE replace(seq, (SELECT pair FROM t$k),
         |      '(' || (SELECT replace(replace(pair, '(', ''), ')', '') FROM t$k) || ')')
         |    END AS seq, wc
         |  FROM s${k - 1})"""
    s"""w AS (
       |  SELECT word, count(*) AS wc FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM $src)
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) >= 2
       |  GROUP BY word),
       |s0 AS (
       |  SELECT '(' || array_to_string(list_transform(range(1, length(word) + 1),
       |    i -> substr(word, CAST(i AS INT), 1)), ')(') || ')' AS seq, wc
       |  FROM w),
       |${(1 to 5).map(round).mkString(",\n")}"""
  }

  /** The shared BPE training loop behind q132 (merge table) and q133
    * (encoded-corpus stats): K merge rounds over the delimited symbol
    * sequences, returning the learned merges and the final encoded
    * vocabulary.
    */
  private[graft] def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String,
      steps: Int): (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) =
    bpeTrainDocs(Tables.documents(s, dir), steps)

  /** Same training loop over an arbitrary frame with a `text` column — the
    * composable form the q308 pipeline capstone trains on its deduped
    * intermediate instead of the raw corpus.
    */
  private[graft] def bpeTrainDocs(docs: org.apache.spark.sql.DataFrame,
      steps: Int): (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    var seqs = docs
      .select(explode(toks(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(
        concat(lit("("),
          array_join(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"), ")("),
          lit(")")).as("seq"),
        col("wc"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to steps) {
      val top = seqs
        .select(col("wc"),
          split(expr("substring(seq, 2, length(seq) - 2)"), "\\)\\(").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("wc"), col("sym"),
          explode(sequence(lit(0), size(col("sym")) - 2)).as("i"))
        .select(col("wc"),
          concat(lit("("), element_at(col("sym"), col("i") + 1), lit(")("),
            element_at(col("sym"), col("i") + 2), lit(")")).as("pair"))
        .groupBy("pair").agg(sum("wc").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val merged = pair.replace("(", "").replace(")", "")
        merges += ((step, pair, merged, cnt))
        seqs = seqs
          .select(replace(col("seq"), lit(pair), lit(s"($merged)")).as("seq"),
            col("wc"))
          .localCheckpoint()
      }
    }
    (merges.toSeq, seqs)
  }

  /** Merge-table BPE encoder — the inference-side contract of [[bpeTrain]]:
    * a word (seen or HELD-OUT) starts as single-char symbols and each
    * learned merge applies in RANK ORDER, replacing occurrences
    * leftmost-first (String.replace scans left to right, exactly the
    * training loop's `replace(seq, pair, merged)` semantics). Re-encoding a
    * training word with the final merge table therefore reproduces the
    * training-side segmentation bit for bit — BpeEncoderSpec pins that
    * property plus symbol-closure on held-out words.
    */
  private[graft] def bpeEncodeWord(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var seq = word.map(c => s"($c)").mkString
    merges.foreach { case (pair, merged) => seq = seq.replace(pair, s"($merged)") }
    seq.substring(1, seq.length - 1).split("\\)\\(").toSeq
  }

  val q132BpeTrain = GraftQuery(
    "q132_bpe_train",
    (s, dir) => {
      import s.implicits._
      bpeTrain(s, dir, 5)._1.toDF("step", "pair", "merged", "cnt").orderBy("step")
    },
    Some(
      s"""$bpeOracleCtes
         |SELECT * FROM (
         |  SELECT 1 AS step, pair, replace(replace(pair, '(', ''), ')', '') AS merged, cnt FROM t1
         |  UNION ALL SELECT 2, pair, replace(replace(pair, '(', ''), ')', ''), cnt FROM t2
         |  UNION ALL SELECT 3, pair, replace(replace(pair, '(', ''), ')', ''), cnt FROM t3
         |  UNION ALL SELECT 4, pair, replace(replace(pair, '(', ''), ')', ''), cnt FROM t4
         |  UNION ALL SELECT 5, pair, replace(replace(pair, '(', ''), ')', ''), cnt FROM t5
         |) ORDER BY step""".stripMargin))

  /** BPE encoding stats — the inference side of q132's training: after the
    * K learned merges are applied to the vocabulary, how compressed is the
    * corpus? One summary row: vocabulary size, frequency-weighted character
    * total, frequency-weighted token total after merging, and the
    * tokens-per-char compression ratio (single per-corpus division — exact
    * BIGINT sums feed it, so 6-digit rounding is engine-stable).
    */
  val q133BpeEncode = GraftQuery(
    "q133_bpe_encode",
    (s, dir) => {
      val (_, seqs) = bpeTrain(s, dir, 5)
      seqs
        .select(col("wc"),
          length(replace(replace(col("seq"), lit("("), lit("")), lit(")"), lit("")))
            .cast("long").as("chars"),
          size(split(expr("substring(seq, 2, length(seq) - 2)"), "\\)\\("))
            .cast("long").as("toks"))
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("wc") * col("chars")).as("chars_total"),
          sum(col("wc") * col("toks")).as("tokens_total"),
          round(sum(col("wc") * col("toks")).cast("double") /
            sum(col("wc") * col("chars")), 6).as("tokens_per_char"))
    },
    Some(
      s"""$bpeOracleCtes
         |SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(wc * length(replace(replace(seq, '(', ''), ')', ''))) AS BIGINT) AS chars_total,
         |  CAST(sum(wc * len(string_split(substr(seq, 2, length(seq) - 2), ')('))) AS BIGINT) AS tokens_total,
         |  round(CAST(sum(wc * len(string_split(substr(seq, 2, length(seq) - 2), ')('))) AS BIGINT)::DOUBLE
         |    / CAST(sum(wc * length(replace(replace(seq, '(', ''), ')', ''))) AS BIGINT), 6) AS tokens_per_char
         |FROM s5""".stripMargin))

  /** Corpus tokenization under the trained BPE — the full train→apply loop:
    * q132 learns the merges, this applies them to EVERY document and reports
    * per-language token economics. The trick that makes application scale is
    * that merges act on words, so the corpus never re-runs the merge chain:
    * the encoded VOCABULARY (tiny — one row per distinct trainable word)
    * carries each word's post-merge token count, and application is a
    * broadcast join from the exploded corpus words to that vocabulary.
    * Words outside the trainable vocabulary (uppercase/digits/len<2 — the
    * training filter) take the character fallback, length(word) tokens.
    *
    * Scale: corpus side is one scan + explode + broadcast hash join +
    * partial agg; nothing corpus-sized shuffles except the final per-lang
    * agg. The vocabulary grows Heaps-sublinearly (~n^0.5) — at extreme
    * corpus scale, prune it to a min-frequency vocab (what production BPE
    * training does anyway) or drop the hint and let the word-keyed join
    * go shuffle; the corpus-side dataflow is identical either way.
    * tokens_per_word is one division over exact BIGINT sums — 6-digit
    * rounding is engine-stable.
    */
  val q139BpeEncodeDocs = GraftQuery(
    "q139_bpe_encode_docs",
    (s, dir) => {
      val (_, seqs) = bpeTrain(s, dir, 5)
      // stripping the delimiters recovers the word exactly (merges only
      // re-group symbols), so the encoded vocab keys by the original word
      val vocabEnc = seqs.select(
        replace(replace(col("seq"), lit("("), lit("")), lit(")"), lit("")).as("word"),
        size(split(expr("substring(seq, 2, length(seq) - 2)"), "\\)\\("))
          .cast("long").as("wtoks"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("word"))
        .join(broadcast(vocabEnc), Seq("word"), "left")
        .withColumn("tok", coalesce(col("wtoks"), length(col("word")).cast("long")))
        .groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("words_total"),
          sum("tok").as("tokens_total"))
        .withColumn("tokens_per_word",
          round(col("tokens_total").cast("double") / col("words_total"), 6))
        .select("lang", "n_docs", "words_total", "tokens_total", "tokens_per_word")
        .orderBy("lang")
    },
    Some(
      s"""$bpeOracleCtes,
         |venc AS (SELECT replace(replace(seq, '(', ''), ')', '') AS word,
         |  len(string_split(substr(seq, 2, length(seq) - 2), ')(')) AS wtoks FROM s5),
         |cw AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS words_total,
         |  CAST(sum(coalesce(wtoks, length(cw.word))) AS BIGINT) AS tokens_total,
         |  round(CAST(sum(coalesce(wtoks, length(cw.word))) AS BIGINT)::DOUBLE / count(*), 6) AS tokens_per_word
         |FROM cw LEFT JOIN venc ON cw.word = venc.word
         |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Interpolated bigram language-model scoring — the step past q60's
    * unigram proxy: P(w2|w1) = λ·c(w1 w2)/c(w1·) + (1−λ)·c(w2)/N with
    * λ = 0.75 (Jelinek-Mercer interpolation; the unigram back-off floor
    * keeps unseen continuations finite), per-document mean negative
    * log-likelihood aggregated per (lang, source). The corpus LM itself is
    * three count tables — bigram, bigram-left, unigram — each a partial
    * agg; scoring is three equi-joins from the exploded bigram stream
    * (count tables ≪ corpus → broadcast at scale) and per-row float math.
    * Rounding follows q60: two-level avg at 3 digits.
    */
  val q149BigramLm = GraftQuery(
    "q149_bigram_lm",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val bg = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(graft.functions.GraftFunctions.wordGrams(col("text"), 2)).as("bigram"))
        .withColumn("w1", element_at(split(col("bigram"), " "), 1))
        .withColumn("w2", element_at(split(col("bigram"), " "), 2))
        .persist()
      val un = Tables.documents(s, dir)
        .select(explode(toks(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
        .persist()
      val total = un.agg(sum("c")).first().getLong(0).toDouble
      val bc = bg.groupBy("bigram").agg(count(lit(1)).as("cb"))
      val lc = bg.groupBy(col("w1").as("lw")).agg(count(lit(1)).as("cl"))
      // fold the LM into ONE per-distinct-bigram probability table before
      // touching the corpus stream: the count-table joins are vocabulary-
      // sized, so the (huge) exploded stream shuffles once, not three times
      val probs = bc
        .withColumn("w1", element_at(split(col("bigram"), " "), 1))
        .withColumn("w2", element_at(split(col("bigram"), " "), 2))
        .join(lc, col("w1") === col("lw"))
        .join(un.select(col("t").as("rw"), col("c").as("c2")), col("w2") === col("rw"))
        .select(col("bigram"),
          (lit(0.75) * col("cb").cast("double") / col("cl") +
            lit(0.25) * col("c2").cast("double") / lit(total)).as("p"))
      bg.join(probs, "bigram")
        .groupBy("doc_id", "lang", "source")
        .agg(avg(-log(col("p"))).as("nll"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), round(avg("nll"), 3).as("avg_nll2"))
        .orderBy("lang", "source")
    },
    Some("""WITH bg AS (
           |  SELECT doc_id, lang, source, sp[i] AS w1, sp[i+1] AS w2,
           |    sp[i] || ' ' || sp[i+1] AS bigram
           |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') sp,
           |          unnest(range(1, len(string_split(text, ' ')))) i
           |        FROM documents)),
           |un AS (SELECT t, count(*) c FROM (
           |  SELECT unnest(string_split(text, ' ')) t FROM documents) GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS DOUBLE) s FROM un),
           |bc AS (SELECT bigram, count(*) cb FROM bg GROUP BY 1),
           |lc AS (SELECT w1 AS lw, count(*) cl FROM bg GROUP BY 1),
           |perdoc AS (
           |  SELECT doc_id, lang, source,
           |    avg(-ln(0.75 * cb::DOUBLE / cl + 0.25 * c2::DOUBLE / s)) nll
           |  FROM bg JOIN bc USING (bigram)
           |  JOIN lc ON bg.w1 = lc.lw
           |  JOIN (SELECT t AS rw, c AS c2 FROM un) u2 ON bg.w2 = u2.rw, tot
           |  GROUP BY 1, 2, 3)
           |SELECT lang, source, count(*) AS n_docs, round(avg(nll), 3) AS avg_nll2
           |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Interpolated Kneser-Ney bigram scoring — the smoothing that actually
    * ships in corpus-filtering LMs (KenLM's default), next to q149's
    * Jelinek-Mercer: instead of backing off to raw unigram frequency, the
    * lower-order distribution is the CONTINUATION probability
    * P_cont(w2) = N1+(·w2)/N1+(··) — "how many distinct contexts does w2
    * complete" — which famously stops high-frequency-but-context-bound
    * words (the "San Francisco" effect) from inflating back-off mass.
    * P(w2|w1) = (c(w1w2) − D)/c(w1·) + D·N1+(w1·)/c(w1·) · P_cont(w2),
    * D = 0.75; every scored bigram is observed, so the discount never
    * floors at zero.
    *
    * Scale (the q149 shape): the LM is four count tables — bigram, left,
    * continuation-types-from-w1, continuation-types-into-w2 — each a
    * partial agg over the exploded stream, folded into ONE per-distinct-
    * bigram probability table before the (huge) corpus stream joins it
    * once (vocabulary-sized → broadcast at scale). One driver scalar: the
    * distinct-bigram-type count. Rounding: two-level avg at 3.
    */
  val q163KneserNey = GraftQuery(
    "q163_kneser_ney",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val bg = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(graft.functions.GraftFunctions.wordGrams(col("text"), 2)).as("bigram"))
        .withColumn("w1", element_at(split(col("bigram"), " "), 1))
        .withColumn("w2", element_at(split(col("bigram"), " "), 2))
        .persist()
      val bc = bg.groupBy("bigram").agg(count(lit(1)).as("cb")).persist()
      val lc = bg.groupBy(col("w1").as("lw")).agg(count(lit(1)).as("cl"))
      val n1l = bg.groupBy(col("w1").as("fw")).agg(countDistinct("w2").as("nf"))
      val n1r = bg.groupBy(col("w2").as("pw")).agg(countDistinct("w1").as("np"))
      val types = bc.count().toDouble
      val probs = bc
        .withColumn("w1", element_at(split(col("bigram"), " "), 1))
        .withColumn("w2", element_at(split(col("bigram"), " "), 2))
        .join(lc, col("w1") === col("lw"))
        .join(n1l, col("w1") === col("fw"))
        .join(n1r, col("w2") === col("pw"))
        .select(col("bigram"),
          ((col("cb").cast("double") - lit(0.75)) / col("cl") +
            lit(0.75) * col("nf").cast("double") / col("cl") *
              (col("np").cast("double") / lit(types))).as("p"))
      bg.join(probs, "bigram")
        .groupBy("doc_id", "lang", "source")
        .agg(avg(-log(col("p"))).as("nll"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), round(avg("nll"), 3).as("avg_nll_kn"))
        .orderBy("lang", "source")
    },
    Some("""WITH bg AS (
           |  SELECT doc_id, lang, source, sp[i] AS w1, sp[i+1] AS w2,
           |    sp[i] || ' ' || sp[i+1] AS bigram
           |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') sp,
           |          unnest(range(1, len(string_split(text, ' ')))) i
           |        FROM documents)),
           |bc AS (SELECT bigram, count(*) cb FROM bg GROUP BY 1),
           |lc AS (SELECT w1 AS lw, count(*) cl FROM bg GROUP BY 1),
           |n1l AS (SELECT w1 AS fw, count(DISTINCT w2) nf FROM bg GROUP BY 1),
           |n1r AS (SELECT w2 AS pw, count(DISTINCT w1) np FROM bg GROUP BY 1),
           |tt AS (SELECT CAST(count(*) AS DOUBLE) nbt FROM bc),
           |perdoc AS (
           |  SELECT doc_id, lang, source,
           |    avg(-ln((cb::DOUBLE - 0.75) / cl
           |      + 0.75 * nf::DOUBLE / cl * (np::DOUBLE / nbt))) nll
           |  FROM bg JOIN bc USING (bigram)
           |  JOIN lc ON bg.w1 = lc.lw
           |  JOIN n1l ON bg.w1 = n1l.fw
           |  JOIN n1r ON bg.w2 = n1r.pw, tt
           |  GROUP BY 1, 2, 3)
           |SELECT lang, source, count(*) AS n_docs, round(avg(nll), 3) AS avg_nll_kn
           |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Zipf's-law fit over the corpus token distribution: rank terms by
    * frequency and OLS-fit ln(freq) against ln(rank) — the slope (~−1 on
    * natural language) plus r² is the one-glance diagnostic separating
    * organic text from templated/synthetic corpora (whose rank curves go
    * flat or stair-step), a standard corpus-health probe before training.
    *
    * Scale: term counting is a partial-agg scan; the rank is a window over
    * the VOCABULARY (not the corpus) — vocabulary-sized sort, corpus rows
    * never shuffle twice; the regression folds to one 6-number aggregate
    * state. regr_* accumulation is order-dependent → 3-digit rounding on
    * both sides (the repo float discipline).
    */
  val q191ZipfFit = GraftQuery(
    "q191_zipf_fit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(desc("cnt"), col("term"))))
      tf.agg(
        count(lit(1)).as("n_terms"),
        round(expr("regr_slope(ln(cnt), ln(rnk))"), 3).as("zipf_slope"),
        round(expr("regr_intercept(ln(cnt), ln(rnk))"), 3).as("zipf_intercept"),
        round(expr("regr_r2(ln(cnt), ln(rnk))"), 3).as("r2"))
    },
    Some("""WITH tf AS (SELECT term, count(*) AS cnt FROM (
           |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
           |  GROUP BY 1),
           |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
           |  FROM tf)
           |SELECT CAST(count(*) AS BIGINT) AS n_terms,
           |  round(regr_slope(ln(cnt), ln(rnk)), 3) AS zipf_slope,
           |  round(regr_intercept(ln(cnt), ln(rnk)), 3) AS zipf_intercept,
           |  round(regr_r2(ln(cnt), ln(rnk)), 3) AS r2
           |FROM rk""".stripMargin))

  /** Cross-source duplication matrix: for every pair of corpus sources,
    * how many distinct 5-word shingles they share, as containment
    * (shared / the smaller source's shingle set) and Jaccard — the
    * corpus-level view of contamination (q100 is the doc-level form):
    * "is my web crawl secretly re-hosting my books source?" drives
    * source-mixture decisions before any doc-level dedup runs.
    *
    * Scale: the (source, shingle) set is built with one explode + distinct
    * (partial-agg); the pair join is an inverted-postings equi-join keyed
    * by shingle whose per-key fan-out is bounded by the SOURCE count (each
    * shingle appears once per source after the distinct — at most S rows
    * per key, S² pair rows), so no hot key can explode it — unlike
    * doc-level postings, no df cap is even needed. Counts are integers;
    * the two ratios are single divisions (6-digit safe).
    */
  private[graft] def q198Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val sh0 = Tables.documents(s, dir)
        .select(col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(w)-5), i -> concat_ws(' ', slice(w, i+1, 5)))"))
          .as("sh"))
        .distinct()
      val sh = if (forPlan) sh0 else sh0.persist()
      val nsrc = sh.groupBy("source").agg(count(lit(1)).as("n"))
      val shared = sh.select(col("source").as("source_a"), col("sh"))
        .join(sh.select(col("source").as("source_b"), col("sh")), Seq("sh"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("shared"))
      val out = shared
        .join(nsrc.select(col("source").as("source_a"), col("n").as("na")), "source_a")
        .join(nsrc.select(col("source").as("source_b"), col("n").as("nb")), "source_b")
        .select(col("source_a"), col("source_b"), col("shared"),
          round(col("shared") / least(col("na"), col("nb")).cast("double"), 6)
            .as("containment"),
          round(col("shared") / (col("na") + col("nb") - col("shared")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("source_a", "source_b")
      if (forPlan) out
      else {
        // localCheckpoint, not count()+recompute: the verify/bench action
        // reads the materialized rows instead of re-executing the released plan
        val ckpt = out.localCheckpoint()
        sh.unpersist()
        ckpt
      }
  }

  val q198SourceOverlap = GraftQuery(
    "q198_source_overlap",
    (s, dir) => q198Df(s, dir),
    Some("""WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
           |sh AS MATERIALIZED (SELECT DISTINCT source, sh FROM (
           |  SELECT source, unnest(list_transform(range(0, len(w) - 4),
           |    i -> array_to_string(w[i + 1:i + 5], ' '))) AS sh
           |  FROM w WHERE len(w) >= 5)),
           |ns AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
           |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
           |    CAST(count(*) AS BIGINT) AS shared
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT source_a, source_b, shared,
           |  round(shared / least(na.n, nb.n)::DOUBLE, 6) AS containment,
           |  round(shared / (na.n + nb.n - shared)::DOUBLE, 6) AS jaccard
           |FROM pairs
           |JOIN ns na ON na.source = source_a
           |JOIN ns nb ON nb.source = source_b
           |ORDER BY source_a, source_b""".stripMargin))

  /** Heaps'-law vocabulary-growth fit — q191's companion diagnostic: as
    * the corpus grows, distinct vocabulary should grow as V(n) ≈ K·n^β
    * (β ≈ 0.4–0.6 for natural language); a β near 0 means the corpus has
    * stopped contributing new tokens (saturated/templated — more data
    * won't help a tokenizer or LM), β near 1 means unbounded junk vocab
    * (mangled encodings, random ids). Docs are swept in 25-doc buckets;
    * each checkpoint's cumulative token count is a windowed running sum
    * over per-bucket totals, and cumulative vocabulary counts terms by
    * their FIRST bucket of appearance (min-doc partial agg — no per-prefix
    * distinct, the trick that keeps the sweep one pass). The log-log OLS
    * over checkpoints gives (β, ln K, r²).
    *
    * Scale: two token-stream partial aggs (per-doc counts, per-term first
    * doc), then everything runs on bucket-cardinality rows; the windows
    * order by bucket index only. 3-digit rounding on the regr_* outputs.
    */
  val q204HeapsFit = GraftQuery(
    "q204_heaps_fit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .persist()
      val perb = toks.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
        .groupBy(floor(col("doc_id") / 25).as("b")).agg(sum("ntok").as("btok"))
      val newv = toks.groupBy("t").agg(min("doc_id").as("fd"))
        .groupBy(floor(col("fd") / 25).as("b")).agg(count(lit(1)).as("bvoc"))
      val wb = Window.orderBy("b")
      val pts = perb.join(newv, Seq("b"), "left")
        .na.fill(0, Seq("bvoc"))
        .select(col("b"), sum("btok").over(wb).as("cumtok"),
          sum("bvoc").over(wb).as("cumvoc"))
      val out = pts.agg(
        count(lit(1)).as("n_points"),
        round(expr("regr_slope(ln(cumvoc), ln(cumtok))"), 3).as("heaps_beta"),
        round(expr("regr_intercept(ln(cumvoc), ln(cumtok))"), 3).as("heaps_lnk"),
        round(expr("regr_r2(ln(cumvoc), ln(cumtok))"), 3).as("r2"))
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      toks.unpersist()
      ckpt
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
           |perb AS (SELECT b, sum(ntok) AS btok FROM (
           |  SELECT doc_id // 25 AS b, count(*) AS ntok FROM toks GROUP BY doc_id)
           |  GROUP BY 1),
           |newv AS (SELECT fd // 25 AS b, count(*) AS bvoc FROM (
           |  SELECT t, min(doc_id) AS fd FROM toks GROUP BY 1) GROUP BY 1),
           |pts AS (SELECT perb.b,
           |    sum(btok) OVER (ORDER BY perb.b) AS cumtok,
           |    sum(COALESCE(bvoc, 0)) OVER (ORDER BY perb.b) AS cumvoc
           |  FROM perb LEFT JOIN newv ON perb.b = newv.b)
           |SELECT CAST(count(*) AS BIGINT) AS n_points,
           |  round(regr_slope(ln(cumvoc), ln(cumtok)), 3) AS heaps_beta,
           |  round(regr_intercept(ln(cumvoc), ln(cumtok)), 3) AS heaps_lnk,
           |  round(regr_r2(ln(cumvoc), ln(cumtok)), 3) AS r2
           |FROM pts""".stripMargin))

  /** Pointwise-mutual-information collocations (Church & Hanks 1990) —
    * the statistical phrase detector behind "New York"-style token-merge
    * preprocessing: PMI = ln(p(ab) / (p(a)·p(b))) over word bigrams with
    * a min-support floor (count ≥ 5: bare PMI over-ranks hapax pairs).
    * Probabilities come from two partial-agg count tables (bigrams over
    * total bigrams, unigrams over total tokens); the two corpus totals are
    * single-row aggregates cross-joined in (broadcast literals at plan
    * time, never a driver round-trip). Top-20 selects on the 3-digit
    * ROUNDED score (the round-before-rank discipline), ties on the words.
    */
  val q208PmiCollocations = GraftQuery(
    "q208_pmi_collocations",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val uni = toks.groupBy("t").agg(count(lit(1)).as("cu")).persist()
      val nt = uni.agg(sum("cu").cast("double").as("ntok"))
      val bg = Tables.documents(s, dir)
        .select(explode(
          graft.functions.GraftFunctions.wordGrams(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cb"))
        .filter(col("cb") >= 5)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
      val nb = Tables.documents(s, dir)
        .select((size(split(col("text"), " ")) - 1).as("k"))
        .filter(col("k") > 0).agg(sum("k").cast("double").as("nbig"))
      val out = bg
        .join(uni.select(col("t").as("w1"), col("cu").as("c1")), "w1")
        .join(uni.select(col("t").as("w2"), col("cu").as("c2")), "w2")
        .crossJoin(nt).crossJoin(nb)
        .select(col("w1"), col("w2"), col("cb"),
          round(log((col("cb") / col("nbig")) /
            ((col("c1") / col("ntok")) * (col("c2") / col("ntok")))), 3).as("pmi"))
        .orderBy(desc("pmi"), col("w1"), col("w2"))
        .limit(20)
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      uni.unpersist()
      ckpt
    },
    Some("""WITH toks AS (
           |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
           |uni AS (SELECT t, CAST(count(*) AS BIGINT) cu FROM toks GROUP BY 1),
           |nt AS (SELECT CAST(sum(cu) AS DOUBLE) ntok FROM uni),
           |bg AS (SELECT bigram, CAST(count(*) AS BIGINT) cb FROM (
           |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
           |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) bigram
           |  FROM documents) b GROUP BY 1 HAVING count(*) >= 5),
           |nb AS (SELECT CAST(sum(len(string_split(text, ' ')) - 1) AS DOUBLE) nbig
           |  FROM documents WHERE len(string_split(text, ' ')) > 1),
           |sp AS (SELECT string_split(bigram, ' ')[1] w1,
           |    string_split(bigram, ' ')[2] w2, cb FROM bg)
           |SELECT sp.w1, sp.w2, sp.cb,
           |  round(ln((cb / nbig) / ((u1.cu / ntok) * (u2.cu / ntok))), 3) AS pmi
           |FROM sp JOIN uni u1 ON u1.t = sp.w1 JOIN uni u2 ON u2.t = sp.w2, nt, nb
           |ORDER BY pmi DESC, sp.w1, sp.w2 LIMIT 20""".stripMargin))

  /** Per-source signature terms — the cluster-labeling reduction (q50 is
    * corpus-global; this is the grouped form a corpus card prints per
    * source): tf-idf where the "documents" are whole SOURCES (tf = term
    * count within source, idf over sources), top-5 per source on the
    * ROUNDED weight (round-before-rank) with term ties. Source-level tf
    * collapses the token stream in one partial agg; idf is a tiny
    * per-term source count; ranking windows over the source-term table.
    */
  val q230SourceSignatureTerms = GraftQuery(
    "q230_source_signature_terms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("tf"))
        .persist()
      val nSrc = tf.select("source").distinct().count().toDouble
      val idf = tf.groupBy("t").agg(count(lit(1)).as("sf"))
        .filter(col("sf") < nSrc)
        .select(col("t"), log(lit(nSrc) / col("sf")).as("idf"))
      val w = Window.partitionBy("source").orderBy(desc("wt"), col("t"))
      val out = tf.join(idf, "t")
        .withColumn("wt", round(col("tf") * col("idf"), 3))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("source"), col("rnk"), col("t").as("term"), col("wt"))
        .orderBy("source", "rnk")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      tf.unpersist()
      ckpt
    },
    Some("""WITH tf AS (SELECT source, t, CAST(count(*) AS BIGINT) tf FROM (
           |    SELECT source, unnest(string_split(text, ' ')) t FROM documents)
           |  GROUP BY 1, 2),
           |ns AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) n FROM tf),
           |idf AS (SELECT t, ln(n / sf) idf FROM (
           |    SELECT t, count(*) sf FROM tf GROUP BY 1), ns WHERE sf < n),
           |wts AS (SELECT source, t, round(tf * idf, 3) wt
           |  FROM tf JOIN idf USING (t)),
           |r AS (SELECT source, t, wt, row_number() OVER (
           |    PARTITION BY source ORDER BY wt DESC, t) rnk FROM wts)
           |SELECT source, CAST(rnk AS INT) AS rnk, t AS term, wt
           |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin))

  /** Per-source character entropy — the compressibility proxy (Shannon's
    * source-coding bound: H bits/char lower-bounds any character-level
    * compressor) that separates organic prose (~4 bits) from templated or
    * binary-ish noise: explode to characters, count per (source, char),
    * fold −Σ p·log₂p from exact integer ratios. The character alphabet is
    * bounded, so the per-source distribution is ≤ |alphabet| cells — the
    * entropy fold is tiny regardless of corpus size; only the char
    * counting scans (one explode + partial agg).
    */
  val q233CharEntropy = GraftQuery(
    "q233_char_entropy",
    (s, dir) => {
      val chars = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy("source", "ch").agg(count(lit(1)).as("c"))
      val tot = chars.groupBy("source").agg(sum("c").as("n"))
      chars.join(tot, "source")
        .groupBy("source")
        .agg(first("n").as("n_chars"),
          count(lit(1)).as("alphabet"),
          round(-sum((col("c") / col("n")) *
            log(col("c") / col("n"))) / math.log(2.0), 3).as("entropy_bits"))
        .orderBy("source")
    },
    Some(s"""WITH chars AS (
            |  SELECT source, unnest(string_split_regex(text, '')) ch FROM documents),
            |cc AS (SELECT source, ch, CAST(count(*) AS BIGINT) c
            |  FROM chars WHERE ch <> '' GROUP BY 1, 2),
            |tot AS (SELECT source, CAST(sum(c) AS BIGINT) n FROM cc GROUP BY 1)
            |SELECT cc.source, any_value(tot.n) AS n_chars,
            |  CAST(count(*) AS BIGINT) AS alphabet,
            |  round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)) / ln(2), 3)
            |    AS entropy_bits
            |FROM cc JOIN tot USING (source)
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    q19TextStats, q20TokenCounts, q21QualityScore, q22LangId, q23Fingerprints,
    q60Perplexity, q61Bigrams, q64TopTrigramUdtf, q130BpePairs, q132BpeTrain,
    q133BpeEncode, q139BpeEncodeDocs, q149BigramLm, q163KneserNey, q191ZipfFit,
    q198SourceOverlap, q204HeapsFit, q208PmiCollocations, q230SourceSignatureTerms,
    q233CharEntropy)
}
