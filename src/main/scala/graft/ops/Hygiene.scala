package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Corpus-hygiene operators for the training-data pipeline: PII
  * pseudonymization, benchmark-contamination detection, and the
  * repeated-token quality filter. All pure column expressions — at 100 TB
  * each is one scan (plus an equi-join for contamination), codegen-friendly,
  * with md5/sha256-derived determinism so the oracle matches exactly.
  */
object Hygiene {

  /** PII redaction / pseudonymization over the customer table: the
    * identifying name is replaced by a sha256 digest (stable join key, no
    * plaintext) plus a masked display form keeping only the last 4
    * characters, while the analytic columns pass through untouched.
    */
  val q99PiiRedact = GraftQuery(
    "q99_pii_redact",
    (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_custkey") <= 100)
        .select(
          col("c_custkey"),
          sha2(col("c_name"), 256).as("name_key"),
          concat(lit("****"),
            substring(col("c_name"), length(col("c_name")) - 3, lit(4))).as("name_masked"),
          col("c_mktsegment"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, sha256(c_name) AS name_key,
           |  '****' || substr(c_name, length(c_name) - 3, 4) AS name_masked,
           |  c_mktsegment, round(c_acctbal, 2) AS acctbal
           |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin))

  /** md5-derived hash of one space-joined word 8-gram, Spark side. */
  private def gram8(words: Column, i: Column): Column =
    conv(substring(md5(concat_ws(" ", slice(words, i, lit(8)))), 1, 8), 16, 10).cast("long")

  /** Benchmark-contamination detection: docs whose id ≡ 0 (mod 97) stand in
    * for an eval benchmark; any OTHER doc sharing a verbatim word 8-gram
    * with them is contaminated and must be dropped before training. Shape:
    * explode both sides to 8-gram hashes, distinct the probe set, one
    * equi-semi-join — the 13-gram decontamination pipeline shape at scale
    * (probe side is small → broadcast).
    */
  val q100Contamination = GraftQuery(
    "q100_contamination",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 8)
        .withColumn("g", transform(sequence(lit(1), size(col("w")) - 7),
          i => gram8(col("w"), i)))
      val probeGrams = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(col("g")).as("gram")).distinct()
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val contaminated = train
        .select(col("doc_id"), col("lang"), explode(col("g")).as("gram"))
        .join(broadcast(probeGrams), Seq("gram"), "left_semi")
        .select("doc_id", "lang").distinct()
      train.select("lang").groupBy("lang").agg(count(lit(1)).as("n_train"))
        .join(contaminated.groupBy("lang").agg(count(lit(1)).as("n_contaminated")),
          Seq("lang"), "left")
        .select(col("lang"), col("n_train"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
           |  WHERE len(string_split(text, ' ')) >= 8),
           |g AS (
           |  SELECT doc_id, lang,
           |    list_transform(range(1, len(w) - 6),
           |      i -> CAST(concat('0x', substr(md5(array_to_string(w[i:i+7], ' ')), 1, 8)) AS BIGINT)) AS grams
           |  FROM d),
           |probe AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
           |train AS (SELECT * FROM g WHERE doc_id % 97 <> 0),
           |tg AS (SELECT doc_id, lang, unnest(grams) AS gram FROM train),
           |cont AS (SELECT DISTINCT doc_id, lang FROM tg
           |  WHERE gram IN (SELECT gram FROM probe))
           |SELECT t.lang, count(*) AS n_train,
           |  coalesce(any_value(c.n), 0) AS n_contaminated
           |FROM train t LEFT JOIN
           |  (SELECT lang, count(*) AS n FROM cont GROUP BY 1) c ON c.lang = t.lang
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Gopher-style repetition filter: per-document top-word frequency ratio;
    * documents whose single most frequent word exceeds 8% of all tokens are
    * flagged low-quality. explode → two partial-agg groupBys + one window
    * rank — no per-doc state bigger than a counter.
    */
  val q101Repetition = GraftQuery(
    "q101_repetition",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val counts = words.groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      val totals = words.groupBy("doc_id").agg(count(lit(1)).as("n_words"))
      val top = counts
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(desc("cnt"), col("w"))))
        .filter(col("rn") === 1)
      top.join(totals, "doc_id")
        .withColumn("ratio", round(col("cnt") / col("n_words"), 6))
        .filter(col("ratio") > 0.08)
        .select(col("doc_id"), col("w").as("top_word"), col("cnt").as("top_cnt"),
          col("n_words"), col("ratio"))
        .orderBy("doc_id")
    },
    Some("""WITH words AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
           |counts AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY 1, 2),
           |totals AS (SELECT doc_id, count(*) AS n_words FROM words GROUP BY 1),
           |top AS (SELECT doc_id, w, cnt,
           |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, w) AS rn
           |  FROM counts)
           |SELECT t.doc_id, t.w AS top_word, t.cnt AS top_cnt, tt.n_words,
           |  round(t.cnt / tt.n_words, 6) AS ratio
           |FROM top t JOIN totals tt USING (doc_id)
           |WHERE rn = 1 AND round(t.cnt / tt.n_words, 6) > 0.08
           |ORDER BY t.doc_id""".stripMargin))

  /** URL canonicalization + canonical-URL dedup — the crawl-hygiene pass
    * every web-scale corpus runs before content dedup. The fixture carries
    * no URL column, so each doc derives a deterministic MESSY url from
    * (source, doc_id) — four variants per logical page (doc_id div 3):
    * uppercase host + :443 + tracking param + fragment, doubled path
    * slashes, /index.html suffix, param-order shuffle. The operator then
    * canonicalizes FROM THE URL STRING ALONE: strip fragment, lowercase
    * host, drop default port and leading www., collapse duplicate path
    * slashes, drop /index.html and trailing slash, remove utm_*, gclid and
    * fbclid params, sort survivors. Docs collapsing to one canonical URL
    * are duplicates; per registered domain we report the collapse rate.
    *
    * Scale: pure per-row regexp/array expressions (one codegen scan), then
    * one partial-agg groupBy on domain — no join, no shuffle beyond the
    * final k-domain agg. The dedup itself is the q24 exact-hash shape keyed
    * on the canonical string.
    */
  val q185UrlCanonical = GraftQuery(
    "q185_url_canonical",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          expr("doc_id div 3").as("pid"),
          concat(col("source"), lit(".example.com")).as("dom"))
      val urls = docs.withColumn("url",
        when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://WWW."), upper(col("dom")), lit(":443/p/"),
            col("pid").cast("string"), lit("/?utm_source=feed&ref="),
            col("pid").cast("string"), lit("#top")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://"), col("dom"), lit("//p//"),
            col("pid").cast("string"), lit("?ref="),
            col("pid").cast("string"), lit("&utm_campaign=x")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://www."), col("dom"), lit("/p/"),
            col("pid").cast("string"), lit("/index.html?ref="),
            col("pid").cast("string")))
        .otherwise(
          concat(lit("https://"), col("dom"), lit(":443/p/"),
            col("pid").cast("string"), lit("?gclid=abc&ref="),
            col("pid").cast("string"))))
      val canon = urls
        .withColumn("nofrag", regexp_replace(col("url"), "#.*$", ""))
        .withColumn("host",
          regexp_replace(regexp_replace(regexp_replace(
            regexp_extract(lower(col("nofrag")), "^[a-z]+://([^/?#]+)", 1),
            ":(80|443)$", ""), "^www\\.", ""), ":(80|443)$", ""))
        .withColumn("path",
          regexp_replace(regexp_replace(regexp_replace(
            regexp_extract(col("nofrag"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
            "/{2,}", "/"), "/index\\.html$", ""), "/$", ""))
        .withColumn("params", array_sort(filter(
          split(regexp_extract(col("nofrag"), "\\?(.*)$", 1), "&"),
          p => !p.rlike("^(utm_[^=]*|gclid|fbclid)=") && p =!= lit(""))))
        .withColumn("canon", concat(lit("https://"), col("host"), col("path"),
          when(size(col("params")) > 0,
            concat(lit("?"), array_join(col("params"), "&"))).otherwise(lit(""))))
        .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      canon.groupBy("host", "domain").agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw_distinct"),
        countDistinct(col("canon")).as("n_canonical"),
        (count(lit(1)) - countDistinct(col("canon"))).as("n_dups_removed"),
        min(col("canon")).as("sample_canon"))
        .orderBy("host")
    },
    Some("""WITH u AS (
           |  SELECT doc_id, source, doc_id // 3 AS pid,
           |    source || '.example.com' AS dom FROM documents),
           |urls AS (SELECT doc_id,
           |    CASE doc_id % 4
           |      WHEN 0 THEN 'HTTPS://WWW.' || upper(dom) || ':443/p/' || pid
           |        || '/?utm_source=feed&ref=' || pid || '#top'
           |      WHEN 1 THEN 'http://' || dom || '//p//' || pid || '?ref='
           |        || pid || '&utm_campaign=x'
           |      WHEN 2 THEN 'https://www.' || dom || '/p/' || pid
           |        || '/index.html?ref=' || pid
           |      ELSE 'https://' || dom || ':443/p/' || pid || '?gclid=abc&ref='
           |        || pid END AS url
           |  FROM u),
           |c AS (SELECT doc_id, url,
           |    regexp_replace(url, '#.*$', '') AS nofrag FROM urls),
           |c2 AS (SELECT doc_id, url,
           |    regexp_replace(regexp_replace(regexp_replace(
           |      regexp_extract(lower(nofrag), '^[a-z]+://([^/?#]+)', 1),
           |      ':(80|443)$', ''), '^www\.', ''), ':(80|443)$', '') AS host,
           |    regexp_replace(regexp_replace(regexp_replace(
           |      regexp_extract(nofrag, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
           |      '/{2,}', '/', 'g'), '/index\.html$', ''), '/$', '') AS path,
           |    list_sort(list_filter(string_split(
           |      regexp_extract(nofrag, '\?(.*)$', 1), '&'),
           |      p -> NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)=')
           |        AND p <> '')) AS params
           |  FROM c),
           |c3 AS (SELECT doc_id, url, host,
           |    'https://' || host || path ||
           |      CASE WHEN len(params) > 0
           |        THEN '?' || array_to_string(params, '&') ELSE '' END AS canon,
           |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
           |  FROM c2)
           |SELECT host, domain, CAST(count(*) AS BIGINT) AS n_urls,
           |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
           |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
           |  CAST(count(*) - count(DISTINCT canon) AS BIGINT) AS n_dups_removed,
           |  min(canon) AS sample_canon
           |FROM c3 GROUP BY host, domain ORDER BY host""".stripMargin))

  /** k-anonymity audit over quasi-identifiers — the re-identification
    * check a dataset release (or a training-corpus metadata table) runs
    * before publication: every document falls into an equivalence class
    * on (lang, source, n_chars rounded to 100), and any class smaller
    * than k = 5 is a linkage risk (its members are distinguishable by
    * their quasi-identifiers alone). Output is the class-size histogram —
    * one row per distinct class size with how many classes and documents
    * sit at that size, plus a risk flag for sizes below k — compact
    * enough to eyeball, complete enough to compute k_min/risk-share from.
    *
    * Scale: two stacked partial aggregations (docs → classes → sizes),
    * both keyed and map-side combined; the histogram is at most
    * max-class-size rows. No joins, no windows, no driver state.
    */
  val q202KAnonymity = GraftQuery(
    "q202_k_anonymity",
    (s, dir) => {
      val classes = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"),
          (col("n_chars") - pmod(col("n_chars"), lit(100))).as("chars_bucket"))
        .agg(count(lit(1)).as("class_size"))
      classes.groupBy("class_size")
        .agg(count(lit(1)).as("n_classes"),
          (count(lit(1)) * col("class_size")).as("n_docs"))
        .withColumn("at_risk", (col("class_size") < 5).cast("int"))
        .select(col("class_size"), col("n_classes"), col("n_docs"),
          col("at_risk"))
        .orderBy("class_size")
    },
    Some("""WITH classes AS (
           |  SELECT lang, source, n_chars - (n_chars % 100) AS chars_bucket,
           |    count(*) AS class_size
           |  FROM documents GROUP BY 1, 2, 3)
           |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
           |  CAST(count(*) * class_size AS BIGINT) AS n_docs,
           |  CAST(class_size < 5 AS INT) AS at_risk
           |FROM classes GROUP BY class_size ORDER BY class_size""".stripMargin))

  /** k-anonymity generalization ladder (the Samarati lattice walk, one
    * dimension at a time) — q202 AUDITS the re-identification risk; this
    * op FIXES it: climb a predefined generalization ladder — L0 raw
    * (lang, source, 100-char bucket), L1 coarsen length to 500-char
    * buckets, L2 drop source, L3 drop length — and publish at the FIRST
    * level whose smallest quasi-identifier class reaches k = 5 (the
    * minimal-information-loss release). Each level is one partial-agg
    * over the corpus; the ladder is 4 fixed aggs and a scalar pick — no
    * iteration over data, so the walk costs the same at any scale.
    * Output: one row per level with its min/avg class size and a flag on
    * the chosen level.
    */
  val q224GeneralizationLadder = GraftQuery(
    "q224_generalization_ladder",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      def classes(level: Int, cols: Seq[org.apache.spark.sql.Column]) =
        d.groupBy(cols: _*).agg(count(lit(1)).as("cs"))
          .agg(lit(level).as("level"), count(lit(1)).as("n_classes"),
            min("cs").as("min_class"), round(avg("cs"), 3).as("avg_class"))
      val b100 = (col("n_chars") - pmod(col("n_chars"), lit(100)))
      val b500 = (col("n_chars") - pmod(col("n_chars"), lit(500)))
      val ladder = classes(0, Seq(col("lang"), col("source"), b100))
        .unionByName(classes(1, Seq(col("lang"), col("source"), b500)))
        .unionByName(classes(2, Seq(col("lang"), b500)))
        .unionByName(classes(3, Seq(col("lang"))))
      val chosen = ladder.filter(col("min_class") >= 5)
        .agg(coalesce(min("level"), lit(99)).as("pick"))
      ladder.crossJoin(chosen)
        .select(col("level"), col("n_classes"), col("min_class"),
          col("avg_class"), (col("level") === col("pick")).cast("int").as("published"))
        .orderBy("level")
    },
    Some("""WITH l0 AS (SELECT 0 AS level, CAST(count(*) AS BIGINT) n_classes,
           |    CAST(min(cs) AS BIGINT) min_class, round(avg(cs), 3) avg_class
           |  FROM (SELECT count(*) cs FROM documents
           |    GROUP BY lang, source, n_chars - (n_chars % 100))),
           |l1 AS (SELECT 1, CAST(count(*) AS BIGINT), CAST(min(cs) AS BIGINT),
           |    round(avg(cs), 3)
           |  FROM (SELECT count(*) cs FROM documents
           |    GROUP BY lang, source, n_chars - (n_chars % 500))),
           |l2 AS (SELECT 2, CAST(count(*) AS BIGINT), CAST(min(cs) AS BIGINT),
           |    round(avg(cs), 3)
           |  FROM (SELECT count(*) cs FROM documents
           |    GROUP BY lang, n_chars - (n_chars % 500))),
           |l3 AS (SELECT 3, CAST(count(*) AS BIGINT), CAST(min(cs) AS BIGINT),
           |    round(avg(cs), 3)
           |  FROM (SELECT count(*) cs FROM documents GROUP BY lang)),
           |ladder AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1
           |  UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3),
           |pick AS (SELECT coalesce(min(level), 99) p FROM ladder
           |  WHERE min_class >= 5)
           |SELECT level, n_classes, min_class, avg_class,
           |  CAST(level = pick.p AS INT) AS published
           |FROM ladder, pick ORDER BY level""".stripMargin))

  /** Right-to-erasure (GDPR Art. 17) pass over the event log — the
    * deletion discipline a data-subject request actually requires: the
    * tombstone set (here users with user_id % 100 = 7) anti-joins the
    * log, the SURVIVING rows are physically rewritten to an erased/
    * directory (parquet can't delete in place — rewrite-and-swap is the
    * real mechanics, same shadow discipline as the rebalancer), and the
    * audit re-reads the rewritten files and semi-joins the tombstones to
    * prove ZERO residue. Output: before/after row counts, tombstoned
    * user count, and the residue count the re-read found (must be 0 —
    * and it's measured, not assumed).
    */
  val q240RightToErasure = GraftQuery(
    "q240_right_to_erasure",
    (s, dir) => {
      val base = graft.WorkDir.resolve(s, "erasure", dir)
      val out = s"$base/erased"
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val ev = Tables.events(s, dir)
      val victims = ev.select("user_id").distinct()
        .filter(col("user_id") % 100 === 7)
        .persist()
      val before = ev.count()
      val nVictims = victims.count()
      ev.join(victims, Seq("user_id"), "left_anti")
        .write.mode("overwrite").parquet(out)
      val kept = s.read.parquet(out)
      val after = kept.count()
      val residue = kept.join(victims, Seq("user_id"), "left_semi").count()
      victims.unpersist()
      import s.implicits._
      Seq((before, nVictims, after, residue))
        .toDF("rows_before", "tombstoned_users", "rows_after", "residue")
    },
    Some("""SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS rows_before,
           |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
           |   WHERE user_id % 100 = 7) AS tombstoned_users,
           |  (SELECT CAST(count(*) AS BIGINT) FROM events
           |   WHERE user_id % 100 <> 7) AS rows_after,
           |  CAST(0 AS BIGINT) AS residue""".stripMargin))

  /** q285 — contrastive negative sampling: for every anchor document, pick
    * k = 3 deterministic hard-ish negatives from OTHER sources, the pair
    * generator behind contrastive/embedding training (in-batch negatives
    * replaced by corpus-level mining). Candidates come from the anchor's
    * hash bucket (max(16, ⌈n/64⌉) buckets, so ~64 candidates per anchor at
    * any corpus size) and the SELECTION is a per-anchor rank ≤ 3 window —
    * which Spark plans as WindowGroupLimit: each task keeps 3 rows per
    * anchor BEFORE the shuffle, so the unbounded candidate stream never
    * materializes past the map side. The pair order is a deterministic
    * integer mix of (anchor, candidate) ids, replayed exactly by the
    * oracle; a real pipeline swaps the mix for semantic distance and keeps
    * the identical plan shape.
    *
    * 100 TB note: the bucket count is DERIVED from the corpus count —
    * buckets = max(16, ⌈n/64⌉), the q141 semantic-dedup discipline — so
    * within-bucket candidates stay ~64 per bucket at ANY corpus size and
    * per-task pair generation is O(64·n/buckets) = linear in n, not
    * O(n²/constant). The count comes from one count() scan (driver state =
    * 1 long, broadcast back as a literal); the WindowGroupLimit + equi-join
    * shape is invariant in the bucket count. NegBucketGrowthSpec pins the
    * linear growth.
    */
  /** buckets = max(16, ⌈n/64⌉): bounds within-bucket candidates at ~64
    * regardless of corpus size (the q141 discipline). */
  private[graft] def negBucketCount(n: Long): Long = math.max(16L, (n + 63L) / 64L)

  val q285NegativeSampling = GraftQuery(
    "q285_negative_sampling",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val M = 2147483647L
      val nb = negBucketCount(Tables.documents(s, dir).count())
      // ids reduce mod M BEFORE any multiply so every product stays under
      // 2^62 at ANY id range — int64 overflow wraps silently in Spark but
      // errors in other engines, so the mix must never reach it
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (col("doc_id") % M * 1103515245L % M % nb).as("bucket"))
      val anchors = docs.select(col("doc_id").as("a_id"),
        col("source").as("a_src"), col("bucket"))
      val cands = docs.select(col("doc_id").as("c_id"),
        col("source").as("c_src"), col("bucket"))
      val mix = ((col("a_id") % M * 1103515245L % M + col("c_id") % M) % M
        * 784588716L + 11L) % M
      val pairs = anchors.join(cands, "bucket")
        .filter(col("a_src") =!= col("c_src"))
        .withColumn("h", mix)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("a_id")).orderBy(col("h"), col("c_id"))))
        .filter(col("rk") <= 3)
      pairs.groupBy(col("a_id"), col("a_src"))
        .agg(
          count(lit(1)).as("n_negatives"),
          array_join(transform(array_sort(collect_list(col("c_id"))),
            _.cast("string")), ",").as("negative_ids"),
          countDistinct(col("c_src")).as("n_neg_sources"))
        .orderBy("a_id")
    },
    Some("""WITH nb AS (SELECT greatest(16, (count(*) + 63) // 64) AS b
           |  FROM documents),
           |d AS (SELECT doc_id, source,
           |    doc_id % 2147483647 * 1103515245 % 2147483647
           |      % (SELECT b FROM nb) AS bucket
           |  FROM documents),
           |p AS (SELECT a.doc_id AS a_id, a.source AS a_src,
           |    c.doc_id AS c_id, c.source AS c_src,
           |    ((a.doc_id % 2147483647 * 1103515245 % 2147483647
           |        + c.doc_id % 2147483647) % 2147483647
           |      * 784588716 + 11) % 2147483647 AS h
           |  FROM d a JOIN d c USING (bucket) WHERE a.source <> c.source),
           |r AS (SELECT *, row_number() OVER
           |    (PARTITION BY a_id ORDER BY h, c_id) AS rk FROM p)
           |SELECT a_id, a_src, CAST(count(*) AS BIGINT) AS n_negatives,
           |  array_to_string(list_sort(list(c_id)), ',') AS negative_ids,
           |  count(DISTINCT c_src) AS n_neg_sources
           |FROM r WHERE rk <= 3 GROUP BY 1, 2 ORDER BY a_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q99PiiRedact, q100Contamination, q101Repetition,
    q185UrlCanonical, q202KAnonymity, q224GeneralizationLadder,
    q240RightToErasure, q285NegativeSampling)
}
