package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-13 pipeline operators: weighted sampling (q367), URL
  * canonicalization (q368), and the end-to-end SRP near-dup dedup
  * composition (q369).
  *
  * Reference scope note: none of these exist in the 408-line reference —
  * they are training-data-pipeline extensions per the build brief
  * (Efraimidis & Spirakis 2006 weighted reservoir sampling; the
  * CommonCrawl-style URL normalization every web corpus runs before
  * host-level aggregation; SemDeDup-style survivor election over q364's
  * banded pairs).
  */
object Pipeline13 {

  /** Weighted random sampling without replacement (Efraimidis & Spirakis
    * 2006, the exponential-race / A-ES formulation): each document draws
    * key = −ln(u)/w with u uniform in (0, 1] and w its character mass, and
    * the k smallest keys are a w-proportional sample without replacement —
    * the curation primitive behind "sample 1M docs proportional to token
    * count". u comes from the q201 md5-uniform discipline ((hex32 + 1) /
    * 2³², so u > 0 and ln never sees zero), making both engines draw
    * identical randomness.
    *
    * Scale: key assignment is map-only; selection is orderBy + limit —
    * TakeOrderedAndProject, a per-partition top-k + driver merge of k
    * rows, never a global sort of the corpus. The rank window runs on the
    * 25-row post-limit frame.
    */
  val q367WeightedSample = GraftQuery(
    "q367_weighted_sample",
    (s, dir) => {
      val u = (conv(substring(md5(concat(lit("ws_"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        .cast("double") + lit(1.0)) / lit(4294967296.0)
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("w", greatest(col("n_chars"), lit(1L)))
        .withColumn("skey", -log(u) / col("w"))
      keyed.orderBy("skey", "doc_id").limit(25)
        .withColumn("rank",
          row_number().over(Window.orderBy("skey", "doc_id")))
        .select(col("rank"), col("doc_id"), col("source"), col("w"),
          round(col("skey") * 1e6, 6).as("skey_ppm"))
        .orderBy("rank")
    },
    Some("""WITH keyed AS (
           |  SELECT doc_id, source, greatest(n_chars, 1) AS w,
           |    -ln((CAST(concat('0x', substr(md5('ws_' || doc_id::VARCHAR), 1, 8)) AS BIGINT)
           |          + CAST(1.0 AS DOUBLE))
           |        / CAST(4294967296.0 AS DOUBLE)) / greatest(n_chars, 1) AS skey
           |  FROM documents),
           |top AS (SELECT * FROM keyed ORDER BY skey, doc_id LIMIT 25)
           |SELECT row_number() OVER (ORDER BY skey, doc_id) AS rank,
           |  doc_id, source, w, round(skey * 1e6, 6) AS skey_ppm
           |FROM top ORDER BY rank""".stripMargin))

  /** URL canonicalization + host-level dup accounting — the normalization
    * pass every web-corpus pipeline runs before URL-keyed dedup. Sibling
    * of q185 (`ops/Hygiene.scala`), which audits the per-domain COLLAPSE
    * RATE over regex-normalized URLs; this query is the per-host top-3
    * collapse histogram over a structured split_part parse with a wider
    * noise surface (nonstandard ports, param sort) — the frontier-dedup
    * readout vs q185's corpus-health readout (RFC 3986
    * §6 syntax-based normalization plus the standard crawl conventions):
    * lowercase scheme and host, strip default ports (http:80 / https:443,
    * keep others), strip a leading `www.`, drop fragments, drop trailing
    * path slash, drop tracking parameters (`utm_*`, `ref=`) and SORT the
    * survivors. URLs are synthesized deterministically from `documents`
    * (the q273/q274/q275 self-contained-input discipline) with every noise
    * axis populated: case, default/explicit/nonstandard ports, trailing
    * slash, utm/ref tails, fragments — and the canonicalizer sees only the
    * assembled string, so the parse is load-bearing.
    *
    * The parse is structured split_part/HOF work, not a regex zoo: both
    * engines run the identical literal-delimiter splits and the identical
    * sorted param filter, so the canonical string is byte-equal. Output:
    * per host, the 3 most-collapsed canonical URLs with raw counts plus
    * host totals — the collapse histogram a crawl-frontier dedup reads.
    *
    * Scale: map-only strings → one groupBy (host, canon) → host-keyed
    * top-3 window (WindowGroupLimit) — no global stage.
    */
  val q368UrlCanonicalize = GraftQuery(
    "q368_url_canonicalize",
    (s, dir) => {
      val d = col("doc_id")
      val url = concat(
        when(d % 3 === 0, lit("HTTP")).otherwise(lit("https")), lit("://"),
        when(d % 2 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".Example.COM"),
        when(d % 3 === 0, lit(":80"))
          .when(d % 5 === 0, lit(":8080")).otherwise(lit(":443")),
        lit("/cat/"), (d % 50).cast("string"),
        when(d % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?id="), (d % 100).cast("string"),
        when(d % 2 === 0, lit("&utm_source=feed")).otherwise(lit("")),
        when(d % 7 === 0, lit("&ref=rss")).otherwise(lit("")),
        when(d % 6 === 0, lit("#sec2")).otherwise(lit("")))
      val withUrl = Tables.documents(s, dir).select(col("doc_id"), url.as("url"))
      val nofrag = split_part(col("url"), lit("#"), lit(1))
      val parsed = withUrl
        .withColumn("scheme", lower(split_part(nofrag, lit("://"), lit(1))))
        .withColumn("rest", split_part(nofrag, lit("://"), lit(2)))
        .withColumn("hostport", split_part(col("rest"), lit("/"), lit(1)))
        .withColumn("pathq",
          substring(col("rest"), length(col("hostport")) + 1, lit(1000000)))
        .withColumn("host0", lower(split_part(col("hostport"), lit(":"), lit(1))))
        .withColumn("port", split_part(col("hostport"), lit(":"), lit(2)))
        .withColumn("host",
          when(col("host0").startsWith("www."), expr("substring(host0, 5)"))
            .otherwise(col("host0")))
        .withColumn("keep_port",
          col("port") =!= "" &&
            !(col("scheme") === "https" && col("port") === "443") &&
            !(col("scheme") === "http" && col("port") === "80"))
        .withColumn("path0", split_part(col("pathq"), lit("?"), lit(1)))
        .withColumn("path",
          when(col("path0") =!= "/" && col("path0").endsWith("/"),
            expr("substring(path0, 1, length(path0) - 1)"))
            .otherwise(col("path0")))
        .withColumn("params", array_sort(filter(
          split(split_part(col("pathq"), lit("?"), lit(2)), "&"),
          p => !p.startsWith("utm_") && !p.startsWith("ref=") && p =!= "")))
        .withColumn("canon", concat(
          col("scheme"), lit("://"), col("host"),
          when(col("keep_port"), concat(lit(":"), col("port"))).otherwise(lit("")),
          col("path"),
          when(size(col("params")) > 0,
            concat(lit("?"), array_join(col("params"), "&"))).otherwise(lit(""))))
      val perCanon = parsed.groupBy("host", "canon")
        .agg(count(lit(1)).as("n_raw"))
      val hostTot = parsed.groupBy("host")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct("canon").as("n_canonical"))
      val w = Window.partitionBy("host").orderBy(desc("n_raw"), col("canon"))
      perCanon.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .join(hostTot, "host")
        .select(col("host"), col("rk"), col("canon"), col("n_raw"),
          col("n_urls"), col("n_canonical"))
        .orderBy("host", "rk")
    },
    Some("""WITH u AS (
           |  SELECT doc_id,
           |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END) || '://'
           |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
           |    || source || '.Example.COM'
           |    || (CASE WHEN doc_id % 3 = 0 THEN ':80'
           |             WHEN doc_id % 5 = 0 THEN ':8080' ELSE ':443' END)
           |    || '/cat/' || (doc_id % 50)::VARCHAR
           |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
           |    || '?id=' || (doc_id % 100)::VARCHAR
           |    || (CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed' ELSE '' END)
           |    || (CASE WHEN doc_id % 7 = 0 THEN '&ref=rss' ELSE '' END)
           |    || (CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END) AS url
           |  FROM documents),
           |p1 AS (
           |  SELECT doc_id,
           |    lower(split_part(split_part(url, '#', 1), '://', 1)) AS scheme,
           |    split_part(split_part(url, '#', 1), '://', 2) AS rest
           |  FROM u),
           |p2 AS (
           |  SELECT *, split_part(rest, '/', 1) AS hostport,
           |    substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
           |  FROM p1),
           |p3 AS (
           |  SELECT *,
           |    CASE WHEN starts_with(lower(split_part(hostport, ':', 1)), 'www.')
           |      THEN substr(lower(split_part(hostport, ':', 1)), 5)
           |      ELSE lower(split_part(hostport, ':', 1)) END AS host,
           |    split_part(hostport, ':', 2) AS port,
           |    split_part(pathq, '?', 1) AS path0,
           |    list_sort(list_filter(string_split(split_part(pathq, '?', 2), '&'),
           |      p -> NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'ref=')
           |        AND p <> '')) AS params
           |  FROM p2),
           |p4 AS (
           |  SELECT host,
           |    scheme || '://' || host
           |    || (CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
           |          AND NOT (scheme = 'http' AND port = '80')
           |        THEN ':' || port ELSE '' END)
           |    || (CASE WHEN path0 <> '/' AND ends_with(path0, '/')
           |        THEN substr(path0, 1, length(path0) - 1) ELSE path0 END)
           |    || (CASE WHEN len(params) > 0
           |        THEN '?' || array_to_string(params, '&') ELSE '' END) AS canon
           |  FROM p3),
           |pc AS (SELECT host, canon, CAST(count(*) AS BIGINT) AS n_raw
           |  FROM p4 GROUP BY 1, 2),
           |ht AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
           |    CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical
           |  FROM p4 GROUP BY 1),
           |rk AS (SELECT pc.*, row_number() OVER (
           |    PARTITION BY host ORDER BY n_raw DESC, canon) AS rk FROM pc)
           |SELECT rk.host, CAST(rk.rk AS INT) AS rk, rk.canon, rk.n_raw,
           |  ht.n_urls, ht.n_canonical
           |FROM rk JOIN ht USING (host) WHERE rk.rk <= 3
           |ORDER BY rk.host, rk.rk""".stripMargin))

  /** End-to-end SRP near-dup DEDUP — q364's banded pair generation
    * composed with connected components and min-id survivor election: the
    * complete "drop the near-duplicate embeddings" operator a pipeline
    * actually runs (q364 emits the audited pair set; this emits the
    * cluster decision per affected vector). Same planted corpus, so
    * ground truth is exact: every cluster is one base vector + its
    * replica, the base id survives.
    *
    * Scale: everything up to the pairs is q364's banded plan; components
    * run on the pair set (tiny relative to the corpus — near-dup graphs
    * collapse after banding), via the adaptive union-find/star CC.
    */
  val q369SrpDedup = GraftQuery(
    "q369_srp_dedup",
    (s, dir) => {
      val pairs = Vector13.srpVerifiedPairs(s, dir).select("i", "j")
      val lbl = Dedup.connectedComponents(pairs)
      val sz = lbl.groupBy(col("lbl").as("c2")).agg(count(lit(1)).as("n_members"))
      lbl.join(sz, col("lbl") === col("c2"))
        .select(col("v").as("vec_id"), col("lbl").as("cluster_id"),
          col("n_members"),
          (col("v") === col("lbl")).cast("int").as("survivor"))
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE ${Vector13.rlSql},
           |${Vector13.corpusSql},
           |cn AS (SELECT vec_id, v,
           |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM corpus),
           |bits AS (SELECT c.vec_id, rl.k,
           |    CASE WHEN list_sum(list_transform(range(1, 65), i -> c.v[i]*rl.wv[i])) > 0
           |      THEN 1::BIGINT ELSE 0::BIGINT END AS bit
           |  FROM corpus c, rl),
           |sig AS (SELECT vec_id,
           |    CAST(sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b0,
           |    CAST(sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b1,
           |    CAST(sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b2,
           |    CAST(sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b3
           |  FROM bits GROUP BY vec_id),
           |p AS (SELECT a.vec_id i, b.vec_id j,
           |    bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
           |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS ham
           |  FROM sig a, sig b WHERE a.vec_id < b.vec_id),
           |pairs AS (SELECT c.i, c.j
           |  FROM (SELECT i, j FROM p WHERE ham <= 3) c
           |  JOIN cn av ON av.vec_id = c.i JOIN cn bv ON bv.vec_id = c.j
           |  WHERE list_sum(list_transform(range(1, 65), q -> av.v[q]*bv.v[q]))
           |      / (av.nrm * bv.nrm) >= 0.99),
           |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
           |reach(a, b) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a AND e2.b <> r.a),
           |lbl AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
           |sz AS (SELECT cluster_id, count(*) AS n_members FROM lbl GROUP BY 1)
           |SELECT l.vec_id, l.cluster_id, sz.n_members,
           |  CAST(l.vec_id = l.cluster_id AS INT) AS survivor
           |FROM lbl l JOIN sz USING (cluster_id)
           |ORDER BY l.vec_id""".stripMargin))

  /** Mergeable-MinHash incremental maintenance — the sketch analogue of
    * q213's IVM contract: MinHash is an elementwise-min sketch, so
    * sig(A ∪ Δ) = zip_with(min)(sig(A), sig(Δ)) — a corpus snapshot's
    * per-source signature updates from the DELTA's signature alone, never
    * re-reading the existing dump (the cross-dump incremental-dedup
    * primitive: each monthly crawl merges into the standing sketch in
    * O(sources · k)). The query computes per-source signatures of the
    * base slice (doc_id % 10 ≠ 0) and delta slice separately, merges at
    * the (source, hash-position) grain, and hash-proves the merge EQUAL
    * to a from-scratch recompute over the union — per position, not per
    * summary, so all 24·|sources| values are pinned.
    *
    * Scale: one corpus pass builds per-doc signatures (the fused q25/q338
    * kernels); each side is a partial-agg min groupBy to |sources|·24
    * rows; the merge is a keyed join of those bounded frames.
    */
  val q372MinhashMerge = GraftQuery(
    "q372_minhash_merge",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val ex = Dedup.shingleHashed(docs, 8)
        .join(docs.select(col("doc_id"), col("source"),
          (pmod(col("doc_id"), lit(10)) === 0).as("isdelta")), "doc_id")
        .withColumn("sig", graft.functions.GraftFunctions.minhash(
          col("tints"), Dedup.NUM_HASHES))
        .select(col("source"), col("isdelta"), posexplode(col("sig")))
        .withColumnRenamed("col", "sigv")
      val base = ex.filter(!col("isdelta"))
        .groupBy("source", "pos").agg(min("sigv").as("hb"))
      val delta = ex.filter(col("isdelta"))
        .groupBy("source", "pos").agg(min("sigv").as("hd"))
      val full = ex.groupBy("source", "pos").agg(min("sigv").as("h_full"))
      full.join(base, Seq("source", "pos"), "left")
        .join(delta, Seq("source", "pos"), "left")
        .withColumn("h_merged",
          least(coalesce(col("hb"), lit(2147483647L)),
            coalesce(col("hd"), lit(2147483647L))))
        .select(col("source"), col("pos"), col("h_full"), col("h_merged"),
          (col("h_full") === col("h_merged")).cast("int").as("ivm_ok"))
        .orderBy("source", "pos")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents),
           |ti AS (SELECT doc_id,
           |    list_transform(g, t -> CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT)) tints
           |  FROM toks WHERE len(g) > 0),
           |ex AS (SELECT d.source, t.doc_id % 10 = 0 AS isdelta, h.h AS pos,
           |    list_min(list_transform(t.tints,
           |      x -> (x*(2*h.h+1) + h.h*1000000007 + 12345) % 2147483647)) AS sigv
           |  FROM ti t JOIN documents d USING (doc_id), range(0, 24) h(h)),
           |base AS (SELECT source, pos, min(sigv) AS hb
           |  FROM ex WHERE NOT isdelta GROUP BY 1, 2),
           |delta AS (SELECT source, pos, min(sigv) AS hd
           |  FROM ex WHERE isdelta GROUP BY 1, 2),
           |fullr AS (SELECT source, pos, min(sigv) AS h_full
           |  FROM ex GROUP BY 1, 2)
           |SELECT f.source, CAST(f.pos AS INT) AS pos, f.h_full,
           |  least(coalesce(b.hb, 2147483647), coalesce(dl.hd, 2147483647))
           |    AS h_merged,
           |  CAST(f.h_full = least(coalesce(b.hb, 2147483647),
           |    coalesce(dl.hd, 2147483647)) AS INT) AS ivm_ok
           |FROM fullr f LEFT JOIN base b USING (source, pos)
           |  LEFT JOIN delta dl USING (source, pos)
           |ORDER BY 1, 2""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q367WeightedSample, q368UrlCanonicalize, q369SrpDedup,
      q372MinhashMerge)
}
