package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Data-pipeline hygiene operators: reproducible sampling, incremental
  * dedup of a new batch against an existing corpus, and quantile-based
  * outlier filtering — the cleaning steps that precede training-data
  * publication.
  */
object Pipeline {

  /** Deterministic 10% sample: membership is md5-derived from the key, so
    * the same rows are sampled on every engine, every run, at every
    * parallelism — unlike rand()-seeded sampling, this is reproducible and
    * join-stable (two tables sampled by the same key stay aligned).
    */
  val q52HashSample = GraftQuery(
    "q52_hash_sample",
    (s, dir) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
      Tables.documents(s, dir)
        .withColumn("sampled", (bucket < 10).cast("int"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("sampled").as("n_sampled"),
          min(when(col("sampled") === 1, col("doc_id"))).as("first_sampled"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 4)) AS BIGINT)
           |             % 100 < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           |  min(CASE WHEN CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 4)) AS BIGINT)
           |             % 100 < 10 THEN doc_id END) AS first_sampled
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Incremental near-dup dedup: a "new batch" (doc_id ≡ 0 mod 5) is checked
    * against the existing corpus only — the LSH band join is new×old, never
    * old×old, which is what keeps re-ingestion cost proportional to the
    * batch, not the corpus.
    */
  val q53IncrementalDedup = GraftQuery(
    "q53_incremental_dedup",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // signature build + exact verify are Dedup.minhashPairs' machinery
      // (sortedInts / NUM_HASHES / bandKeys / verifyJaccard) — only the
      // candidate join differs: new×old instead of the full self-join
      val sh = Dedup.shingleHashed(Tables.documents(s, dir), 8)
        .withColumn("ti", Dedup.sortedInts(col("tints")))
        .withColumn("sig",
          graft.functions.GraftFunctions.minhash(col("tints"), Dedup.NUM_HASHES))
        .select(col("doc_id"), col("ti"), col("sig"))
        .persist()
      val bands = Dedup.bandKeys(sh)
      val newB = bands.filter(col("doc_id") % 5 === 0)
      val oldB = bands.filter(col("doc_id") % 5 =!= 0)
      val cand = newB.as("n")
        .join(oldB.as("o"), col("n.band") === col("o.band") && col("n.key") === col("o.key"))
        .select(col("n.doc_id").as("i"), col("o.doc_id").as("j"))
        .distinct()
      Dedup.verifyJaccard(cand, sh.select(col("doc_id"), col("ti")), 0.5)
        .select(col("i").as("new_id"), col("j").as("old_id"),
          round(col("jac"), 6).as("jac"))
        .orderBy("new_id", "old_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents WHERE len(string_split(text,' ')) >= 3),
           |ti AS (SELECT doc_id, g,
           |  list_transform(g, t -> CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT)) tints FROM toks),
           |sig AS (SELECT doc_id, g, tints, list_transform(range(0,24), h ->
           |  list_min(list_transform(tints, t -> (t*(2*h+1) + h*1000000007 + 12345) % 2147483647))) s
           |  FROM ti),
           |bands AS (SELECT doc_id, b.b AS band,
           |  s[3*b.b+1]::VARCHAR||','||s[3*b.b+2]::VARCHAR||','||s[3*b.b+3]::VARCHAR AS key
           |  FROM sig, range(0,8) b(b)),
           |cand AS (SELECT DISTINCT n.doc_id new_id, o.doc_id old_id
           |  FROM bands n JOIN bands o ON n.band=o.band AND n.key=o.key
           |  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0),
           |tset AS (SELECT doc_id, list_distinct(tints) ti FROM ti),
           |ver AS (SELECT new_id, old_id,
           |  len(list_filter(x.ti, e -> list_contains(y.ti, e)))::DOUBLE /
           |  (len(x.ti)+len(y.ti)-len(list_filter(x.ti, e -> list_contains(y.ti, e)))) jac
           |  FROM cand JOIN tset x ON x.doc_id=new_id JOIN tset y ON y.doc_id=old_id)
           |SELECT new_id, old_id, round(jac, 6) AS jac FROM ver WHERE jac >= 0.5
           |ORDER BY new_id, old_id""".stripMargin))

  /** Quantile outlier filter: flag event values outside the per-type
    * [p05, p95] band. The quantiles are a tiny broadcast; the scan stays
    * one pass.
    */
  val q54OutlierFilter = GraftQuery(
    "q54_outlier_filter",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val bounds = ev.groupBy(col("event_type").as("bt"))
        .agg(
          expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(bounds), col("event_type") === col("bt"))
        .withColumn("kept", (col("value") >= col("lo") && col("value") <= col("hi")).cast("int"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum("kept").as("n_kept"),
          round(sum(when(col("kept") === 1, col("value")).otherwise(0.0)), 2).as("kept_value"))
        .orderBy("event_type")
    },
    Some("""WITH bounds AS (
           |  SELECT event_type bt, quantile_cont(value, 0.05) lo,
           |    quantile_cont(value, 0.95) hi
           |  FROM events GROUP BY 1)
           |SELECT event_type, count(*) AS n,
           |  CAST(sum(CASE WHEN value >= lo AND value <= hi THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  round(sum(CASE WHEN value >= lo AND value <= hi THEN value ELSE 0 END), 2) AS kept_value
           |FROM events JOIN bounds ON event_type = bt
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Stratified deterministic sampling: exactly k docs per language, chosen
    * by md5-hash order (reproducible across engines/runs/parallelism, unlike
    * rand()); complements q52's uniform hash sample. At scale this is one
    * window per stratum — partition-by the stratum key, no global sort.
    */
  val q65StratifiedSample = GraftQuery(
    "q65_stratified_sample",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_sampled"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },
    Some("""WITH ranked AS (
           |  SELECT lang, doc_id,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
           |  FROM documents)
           |SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_doc,
           |  max(doc_id) AS max_doc, CAST(sum(doc_id) AS BIGINT) AS id_sum
           |FROM ranked WHERE rn <= 20 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Deterministic WEIGHTED sampling (A-ES / Efraimidis-Spirakis): each doc
    * draws u = md5(doc_id)/2^32 ∈ (0,1) and keys on u^(1/w) with w = n_chars,
    * so longer documents are proportionally likelier to be kept, yet the
    * sample is fully reproducible (no RNG state, any engine agrees). One
    * scan + a top-k — the distributed form of weighted reservoir sampling.
    */
  val q97WeightedSample = GraftQuery(
    "q97_weighted_sample",
    (s, dir) => {
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
      Tables.documents(s, dir)
        .filter(col("n_chars") > 0)
        .withColumn("skey", round(pow(u, lit(1.0) / col("n_chars")), 8))
        .orderBy(desc("skey"), col("doc_id"))
        .limit(30)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("skey"))
    },
    Some("""SELECT doc_id, lang, n_chars,
           |  round(pow(CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
           |    / 4294967296.0, 1.0 / n_chars), 8) AS skey
           |FROM documents WHERE n_chars > 0
           |ORDER BY skey DESC, doc_id LIMIT 30""".stripMargin))

  /** Source-mixture sampling — the data-mixing step that shapes a
    * pretraining corpus: each source gets a token budget from its mixture
    * weight, over-budget sources are down-sampled to fit, under-budget
    * sources pass through whole. Everything is integer arithmetic so both
    * engines agree bit-for-bit:
    *
    *   - weight (per-mille) derives from the source id;
    *   - budget_s = (15000 · w_s) div 1000 target tokens;
    *   - threshold_s = min(1000, budget_s·1000 div tokens_s);
    *   - a doc survives iff its md5 bucket (mod 1000) < threshold_s — the
    *     same reproducible hash-gate as q52, so samples are join-stable
    *     across runs and engines.
    *
    * Scale: the per-source token total is a PARTIAL AGGREGATE broadcast
    * back into the doc stream — not a window partitioned by `source`
    * (r8 fix: with a handful of sources, a per-source window funnels
    * ~n/|sources| rows through one task each — the q205 defect class;
    * the tiny totals table joins map-side instead), then one groupBy.
    */
  val q129MixtureSample = GraftQuery(
    "q129_mixture_sampling",
    (s, dir) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 1000
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
      val totals = docs.groupBy("source")
        .agg(sum("tok").as("tokens_total"))
      docs
        .withColumn("weight_pm",
          lit(25L) + lit(25L) * (expr("CAST(substr(source, 4) AS LONG)") % 4))
        .join(broadcast(totals), "source")
        .withColumn("thr",
          least(lit(1000L),
            expr("((15000 * weight_pm) div 1000) * 1000 div tokens_total")))
        .withColumn("sampled", (bucket < col("thr")).cast("long"))
        .groupBy("source")
        .agg(
          first(col("weight_pm")).as("weight_pm"),
          first(col("tokens_total")).as("tokens_total"),
          first(col("thr")).as("thr"),
          count(lit(1)).as("n_docs"),
          sum("sampled").as("n_sampled"),
          sum(col("sampled") * col("tok")).as("tokens_sampled"))
        .orderBy("source")
    },
    Some("""WITH t AS (
           |  SELECT source, doc_id, len(string_split(text, ' ')) AS tok,
           |    25 + 25 * (CAST(substr(source, 4) AS BIGINT) % 4) AS weight_pm
           |  FROM documents),
           |c AS (
           |  SELECT *, CAST(sum(tok) OVER (PARTITION BY source) AS BIGINT)
           |    AS tokens_total FROM t),
           |g AS (
           |  SELECT *,
           |    least(1000, ((15000 * weight_pm) // 1000) * 1000 // tokens_total)
           |      AS thr,
           |    CASE WHEN CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 4))
           |        AS BIGINT) % 1000
           |      < least(1000, ((15000 * weight_pm) // 1000) * 1000 // tokens_total)
           |      THEN 1 ELSE 0 END AS sampled
           |  FROM c)
           |SELECT source,
           |  CAST(min(weight_pm) AS BIGINT) AS weight_pm,
           |  min(tokens_total) AS tokens_total,
           |  CAST(min(thr) AS BIGINT) AS thr,
           |  count(*) AS n_docs,
           |  CAST(sum(sampled) AS BIGINT) AS n_sampled,
           |  CAST(sum(sampled * tok) AS BIGINT) AS tokens_sampled
           |FROM g GROUP BY source ORDER BY source""".stripMargin))

  /** Deterministic per-epoch corpus reshuffle — the data-ordering operator
    * of a pretraining run: every epoch must present documents in a fresh
    * pseudo-random order, reproducibly (job restarts and re-runs see the
    * identical order), sharded so each trainer rank reads its own stream.
    *
    * Order key = md5(epoch || doc_id): a new permutation per epoch, no
    * rand() (engine-/partitioning-dependent), join-stable. Shard =
    * key-hash mod 8, position = rank within (epoch, shard) by the order
    * key. The window partitions by (epoch, shard) — 16 independent
    * sub-streams here, #epochs × #ranks in production — so no global sort
    * ever happens; at 100 TB each shard's order is produced by its own
    * task, which is exactly how per-rank epoch streams are consumed.
    */
  val q136EpochShuffle = GraftQuery(
    "q136_epoch_shuffle",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // epoch fan-out is a map-side explode, not a join — 2 rows per doc
      // with zero shuffle until the per-(epoch, shard) window
      val epochs = Tables.documents(s, dir).select(col("doc_id"),
        explode(sequence(lit(0), lit(1))).as("epoch"))
      val keyed = epochs.withColumn("okey",
        md5(concat(col("epoch").cast("string"), lit("_"), col("doc_id").cast("string"))))
        .withColumn("shard",
          (conv(substring(col("okey"), 1, 4), 16, 10).cast("long") % 8).cast("int"))
      val w = Window.partitionBy("epoch", "shard").orderBy("okey")
      keyed
        .withColumn("pos", row_number().over(w) - 1)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), col("epoch"), col("shard"), col("pos").cast("long").as("pos"))
        .orderBy("doc_id", "epoch")
    },
    Some("""WITH k AS (
           |  SELECT doc_id, epoch,
           |    md5(epoch::VARCHAR || '_' || doc_id::VARCHAR) AS okey
           |  FROM documents, (SELECT unnest([0, 1]) AS epoch)),
           |sh AS (SELECT doc_id, epoch, okey,
           |  CAST(('0x' || substr(okey, 1, 4))::BIGINT % 8 AS INT) AS shard FROM k),
           |p AS (SELECT doc_id, epoch, shard,
           |  row_number() OVER (PARTITION BY epoch, shard ORDER BY okey) - 1 AS pos
           |  FROM sh)
           |SELECT doc_id, epoch, shard, CAST(pos AS BIGINT) AS pos
           |FROM p WHERE doc_id < 40 ORDER BY doc_id, epoch""".stripMargin))

  /** CDC snapshot diff — classify every key across two table versions as
    * insert / delete / update by a full outer join on the key, comparing
    * value columns COLUMN-WISE (never a stringified row hash: float/date
    * formatting differs across engines, column equality doesn't). This is
    * the change-capture primitive incremental ingestion is built on: the
    * diff of yesterday's and today's snapshot IS the day's CDC stream when
    * the source can't emit one.
    *
    * The "new" snapshot is synthesized deterministically from orders
    * (keys %97 deleted, %13 repriced +10, %89 re-inserted under shifted
    * keys), so both engines reconstruct identical versions with no staged
    * state. Scale: one key-keyed full outer join (sort-merge on the key,
    * AQE-skew-safe) + per-row comparisons; the unchanged majority is
    * filtered before any further processing, so downstream cost is
    * proportional to the CHANGE volume, not the snapshot.
    */
  val q181SnapshotDiff = GraftQuery(
    "q181_snapshot_diff",
    (s, dir) => {
      val v1 = Tables.orders(s, dir).filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
          col("o_totalprice").as("price"))
      val v2 = v1.filter(col("k") % 97 =!= 0) // deletes
        .withColumn("price",
          when(col("k") % 13 === 0, col("price") + 10.0).otherwise(col("price")))
        .unionByName(v1.filter(col("k") % 89 === 0) // inserts under new keys
          .select((col("k") + 10000000L).as("k"), col("cust"), col("price")))
      val a = v1.select(col("k"), col("cust").as("cust_old"), col("price").as("price_old"))
      val b = v2.select(col("k"), col("cust").as("cust_new"), col("price").as("price_new"))
      a.join(b, Seq("k"), "full_outer")
        .withColumn("change_type",
          when(col("cust_old").isNull, lit("insert"))
            .when(col("cust_new").isNull, lit("delete"))
            .when(col("cust_old") =!= col("cust_new") ||
              col("price_old") =!= col("price_new"), lit("update"))
            .otherwise(lit("unchanged")))
        .filter(col("change_type") =!= "unchanged")
        .select(col("change_type"), col("k"),
          round(col("price_old"), 2).as("price_old"),
          round(col("price_new"), 2).as("price_new"))
        .orderBy("k", "change_type")
    },
    Some("""WITH v1 AS (
           |  SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS price
           |  FROM orders WHERE o_orderkey < 3000),
           |v2 AS (
           |  SELECT k, cust,
           |    CASE WHEN k % 13 = 0 THEN price + 10.0 ELSE price END AS price
           |  FROM v1 WHERE k % 97 <> 0
           |  UNION ALL
           |  SELECT k + 10000000, cust, price FROM v1 WHERE k % 89 = 0),
           |d AS (
           |  SELECT coalesce(a.k, b.k) AS k,
           |    a.cust AS cust_old, a.price AS price_old,
           |    b.cust AS cust_new, b.price AS price_new
           |  FROM v1 a FULL OUTER JOIN v2 b ON a.k = b.k)
           |SELECT CASE WHEN cust_old IS NULL THEN 'insert'
           |            WHEN cust_new IS NULL THEN 'delete'
           |            ELSE 'update' END AS change_type,
           |  k, round(price_old, 2) AS price_old, round(price_new, 2) AS price_new
           |FROM d
           |WHERE cust_old IS NULL OR cust_new IS NULL
           |   OR cust_old <> cust_new OR price_old <> price_new
           |ORDER BY k, change_type""".stripMargin))

  /** Leakage-safe train/val/test split: assigning docs to splits by a hash
    * of their OWN id leaks near-duplicates across the eval boundary — the
    * classic contamination bug. Here the split key is the near-dup GROUP:
    * connected components over the q25 MinHash-verified pair graph
    * (singletons are their own group), bucketed md5(group) % 10 →
    * 8/1/1 train/val/test, so a whole duplicate family always lands in one
    * split. `leaked_groups` (groups spanning >1 split) is computed from
    * the output itself and must be 0 — the audit is part of the operator.
    *
    * Scale: the group table is the q59 CC machinery (banded LSH + bounded
    * CC dispatch); assignment is one hash expression; the audit is one
    * partial-agg groupBy on group id. Nothing new shuffles beyond the CC
    * labels themselves.
    */
  val q188GroupSplit = GraftQuery(
    "q188_group_split",
    (s, dir) => {
      val pairs = Dedup.minhashPairs(s, dir).select(col("i"), col("j"))
      val lbl = Dedup.connectedComponents(pairs)
      val grp = Tables.documents(s, dir).select(col("doc_id"))
        .join(lbl.select(col("v").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
        .withColumn("grp", coalesce(col("lbl"), col("doc_id")))
      val bucket = conv(substring(md5(col("grp").cast("string")), 1, 4), 16, 10)
        .cast("long") % 10
      val split = grp.withColumn("split",
        when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test"))
      val perGroup = split.groupBy("grp").agg(
        count(lit(1)).as("gsz"), countDistinct("split").as("nsplits"))
      val leak = perGroup.agg(
        sum(when(col("nsplits") > 1, 1L).otherwise(0L)).as("leaked_groups"))
      split.join(perGroup.select("grp", "gsz"), "grp")
        .groupBy("split").agg(
          count(lit(1)).as("n_docs"),
          countDistinct("grp").as("n_groups"),
          sum(when(col("gsz") >= 2, 1L).otherwise(0L)).as("n_grouped_docs"))
        .crossJoin(broadcast(leak))
        .orderBy("split")
    },
    Some(s"""WITH RECURSIVE pairs AS (SELECT i, j FROM (
            |${Dedup.q25DedupMinhash.oracle.get}) q25),
            |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
            |reach(a, b) AS (
            |  SELECT a, b FROM edges
            |  UNION
            |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a AND e.b <> r.a),
            |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            |  FROM reach GROUP BY a),
            |g AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS grp
            |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id),
            |sp AS (SELECT doc_id, grp,
            |    CASE WHEN CAST(concat('0x', substr(md5(grp::VARCHAR), 1, 4)) AS BIGINT)
            |           % 10 <= 7 THEN 'train'
            |         WHEN CAST(concat('0x', substr(md5(grp::VARCHAR), 1, 4)) AS BIGINT)
            |           % 10 = 8 THEN 'val'
            |         ELSE 'test' END AS split
            |  FROM g),
            |gg AS (SELECT grp, count(*) AS gsz, count(DISTINCT split) AS nsplits
            |  FROM sp GROUP BY 1),
            |lk AS (SELECT CAST(sum(CASE WHEN nsplits > 1 THEN 1 ELSE 0 END) AS BIGINT)
            |  AS leaked_groups FROM gg)
            |SELECT sp.split, CAST(count(*) AS BIGINT) AS n_docs,
            |  CAST(count(DISTINCT sp.grp) AS BIGINT) AS n_groups,
            |  CAST(sum(CASE WHEN gg.gsz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_grouped_docs,
            |  any_value(lk.leaked_groups) AS leaked_groups
            |FROM sp JOIN gg USING (grp), lk
            |GROUP BY sp.split ORDER BY sp.split""".stripMargin))

  /** The end-to-end curation funnel — the composition a training-data
    * pipeline actually ships, reported as the per-stage retention table
    * every data card publishes: raw corpus → exact text dedup (keep the
    * lowest doc_id per text) → near-dup removal (MinHash→CC clusters from
    * the q59 pipeline, corpus-wide; only each cluster's minimum doc
    * survives) → quality floor (n_chars ≥ 120) → script filter (drop zh
    * for a latin-script tokenizer run). Each stage row carries surviving
    * docs AND surviving token mass, so the cost of every rule is visible
    * in both units. Set algebra over the full corpus with each stage a
    * semi/anti-join against a keyed survivor set — the funnel adds no
    * shuffle beyond the dedup machinery it audits.
    */
  val q217CurationFunnel = GraftQuery(
    "q217_curation_funnel",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
        .persist()
      val s1 = docs.withColumn("rn", row_number().over(
          Window.partitionBy("text").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn")
      val nonSurvivors = Dedup.connectedComponents(
          Dedup.minhashPairs(s, dir).select(col("i"), col("j")))
        .filter(col("v") =!= col("lbl"))
        .select(col("v").as("doc_id"))
      val s2 = s1.join(nonSurvivors, Seq("doc_id"), "left_anti")
      val s3 = s2.filter(col("n_chars") >= 120)
      val s4 = s3.filter(col("lang") =!= "zh")
      def stage(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(lit(tag).as("stage"), count(lit(1)).as("docs"),
          sum("toks").as("tokens"))
      val out = stage("0_raw", docs)
        .unionByName(stage("1_exact_dedup", s1))
        .unionByName(stage("2_near_dedup", s2))
        .unionByName(stage("3_quality", s3))
        .unionByName(stage("4_lang", s4))
        .orderBy("stage")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      docs.unpersist()
      ckpt
    },
    Some(s"""WITH RECURSIVE pairs AS (SELECT i, j FROM (
            |${graft.ops.Dedup.q25DedupMinhash.oracle.get}) q25),
            |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
            |reach(a, b) AS (
            |  SELECT a, b FROM edges
            |  UNION
            |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a AND e.b <> r.a),
            |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            |  FROM reach GROUP BY a),
            |drops AS (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id),
            |d0 AS (SELECT doc_id, text, lang, n_chars,
            |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
            |  FROM documents),
            |s1 AS (SELECT * FROM (SELECT *, row_number() OVER (
            |    PARTITION BY text ORDER BY doc_id) rn FROM d0) WHERE rn = 1),
            |s2 AS (SELECT s1.* FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
            |s3 AS (SELECT * FROM s2 WHERE n_chars >= 120),
            |s4 AS (SELECT * FROM s3 WHERE lang <> 'zh')
            |SELECT stage, docs, tokens FROM (
            |  SELECT '0_raw' stage, CAST(count(*) AS BIGINT) docs,
            |    CAST(sum(toks) AS BIGINT) tokens FROM d0
            |  UNION ALL SELECT '1_exact_dedup', CAST(count(*) AS BIGINT),
            |    CAST(sum(toks) AS BIGINT) FROM s1
            |  UNION ALL SELECT '2_near_dedup', CAST(count(*) AS BIGINT),
            |    CAST(sum(toks) AS BIGINT) FROM s2
            |  UNION ALL SELECT '3_quality', CAST(count(*) AS BIGINT),
            |    CAST(sum(toks) AS BIGINT) FROM s3
            |  UNION ALL SELECT '4_lang', CAST(count(*) AS BIGINT),
            |    CAST(sum(toks) AS BIGINT) FROM s4)
            |ORDER BY stage""".stripMargin))

  /** Incremental sessionization — q53's incremental discipline applied to
    * a NON-trivially-mergeable operator: day-20 splits the event log into
    * processed history and a new arrival batch; sessions (30-minute
    * inactivity gap) are counted independently on each side, and the only
    * cross-boundary state needed is ONE row per user (last historical
    * event time vs first new event time): a boundary gap ≤ 30 min means
    * the user's first new session EXTENDS their last historical session,
    * so the merged total subtracts one per such user. The oracle counts
    * sessions by full-batch gap logic over the whole log, so the hash
    * gate proves incremental-merge ≡ full-recompute — the property that
    * lets a 100 TB event log sessionize one day at a time. Both sides
    * compare integer epoch-second gaps (no interval-type semantics in
    * play).
    */
  val q226IncrementalSessions = GraftQuery(
    "q226_incremental_sessions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id")).persist()
      val cut = ev.agg(date_add(to_date(min("ts")), 20).as("c"))
      val tagged = ev.crossJoin(cut)
        .withColumn("is_new", (to_date(col("ts")) >= col("c")).cast("int"))
      def sessionCount(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        df.withColumn("gap_s",
            col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
          .withColumn("ns",
            when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
          .groupBy("user_id").agg(sum("ns").as("n_sessions"),
            min("ts").as("first_ts"), max("ts").as("last_ts"))
      }
      val base = sessionCount(tagged.filter(col("is_new") === 0))
      val delta = sessionCount(tagged.filter(col("is_new") === 1))
      val joinedUsers = base.select(col("user_id"), col("last_ts"))
        .join(delta.select(col("user_id"), col("first_ts")), "user_id")
        .filter(col("first_ts").cast("long") - col("last_ts").cast("long") <= 1800)
      val m = joinedUsers.agg(count(lit(1)).as("boundary_merges"))
      val totals = base.select(col("user_id"), col("n_sessions"))
        .unionByName(delta.select(col("user_id"), col("n_sessions")))
        .agg(countDistinct("user_id").as("n_users"),
          sum("n_sessions").as("raw_sessions"))
      val out = totals.crossJoin(m)
        .select(col("n_users"),
          (col("raw_sessions") - col("boundary_merges")).as("total_sessions"),
          col("boundary_merges"))
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      ev.unpersist()
      ckpt
    },
    Some("""WITH cut AS (SELECT CAST(min(ts) AS DATE) + 20 AS c FROM events),
           |g AS (SELECT user_id, ts,
           |    CASE WHEN lag(ts) OVER w IS NULL
           |      OR date_diff('second', lag(ts) OVER w, ts) > 1800
           |      THEN 1 ELSE 0 END AS ns
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |per AS (SELECT user_id, CAST(sum(ns) AS BIGINT) n_sessions
           |  FROM g GROUP BY 1),
           |lb AS (SELECT user_id, max(ts) lt FROM events, cut
           |  WHERE CAST(ts AS DATE) < c GROUP BY 1),
           |fd AS (SELECT user_id, min(ts) ft FROM events, cut
           |  WHERE CAST(ts AS DATE) >= c GROUP BY 1),
           |m AS (SELECT CAST(count(*) AS BIGINT) boundary_merges
           |  FROM lb JOIN fd USING (user_id)
           |  WHERE date_diff('second', lt, ft) <= 1800)
           |SELECT CAST(count(*) AS BIGINT) AS n_users,
           |  CAST(sum(n_sessions) AS BIGINT) AS total_sessions,
           |  any_value(m.boundary_merges) AS boundary_merges
           |FROM per, m""".stripMargin))

  /** Dataset card, per source — the one-table summary a corpus release
    * publishes (and the first thing a consumer reads): docs, token mass,
    * language spread (count + modal language with lexicographic ties),
    * exact mean length, and the within-source exact-duplicate rate
    * (docs − distinct texts, the q24 definition scoped per source).
    * Everything is stacked partial aggs plus one modal-language window
    * over (source, lang) cells; the only floats are exact integer ratios.
    */
  val q251DatasetCard = GraftQuery(
    "q251_dataset_card",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
        .persist()
      val base = d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("text").as("n_distinct"),
        sum("n_chars").as("sum_chars"))
      val langMode = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(desc("c"), col("lang"))))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"))
      val out = base.join(langMode, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
          col("top_lang"),
          round(col("sum_chars") / col("n_docs").cast("double"), 3)
            .as("mean_chars"),
          (col("n_docs") - col("n_distinct")).as("exact_dups"))
        .orderBy("source")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      d.unpersist()
      ckpt
    },
    Some("""WITH d AS (SELECT source, lang, text, n_chars,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) toks
           |  FROM documents),
           |base AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
           |    CAST(sum(toks) AS BIGINT) n_tokens,
           |    CAST(count(DISTINCT lang) AS BIGINT) n_langs,
           |    CAST(count(DISTINCT text) AS BIGINT) n_distinct,
           |    CAST(sum(n_chars) AS BIGINT) sum_chars
           |  FROM d GROUP BY 1),
           |lm AS (SELECT source, lang AS top_lang FROM (
           |  SELECT source, lang, row_number() OVER (PARTITION BY source
           |    ORDER BY count(*) DESC, lang) rn
           |  FROM d GROUP BY source, lang) WHERE rn = 1)
           |SELECT base.source, n_docs, n_tokens, n_langs, lm.top_lang,
           |  round(sum_chars / n_docs::DOUBLE, 3) AS mean_chars,
           |  n_docs - n_distinct AS exact_dups
           |FROM base JOIN lm USING (source) ORDER BY source""".stripMargin))

  /** q305 — temperature-scaled multilingual sampling (the mT5/XLM-R
    * recipe): per-language weights w_l ∝ n_l^α with α = 0.3 UPSAMPLE
    * low-resource languages relative to proportional sampling, budgets
    * B_l = round(T·w_l) for a 40%-of-corpus token budget T (capped at
    * n_l), and the realization is the q52 deterministic md5 hash gate so
    * the sample is join-stable and the oracle replays it. q129 budgets
    * from FIXED per-source weights; this derives the weights FROM the
    * data — the standard low-resource balancing step.
    *
    * Float discipline: the only float is n^α (libm pow, ~1 ulp) flowing
    * into the budget; the budget rounds through a 6-digit guard, and the
    * per-doc gate then compares EXACT INTEGERS (bucket·n_l < B_l·65536 —
    * a cross-multiplied rational, no float threshold). Scale shape: one
    * count aggregate → ≤|langs| rows broadcast back over the corpus
    * stream, one gate scan, one partial-agg count. Nothing grows with
    * data.
    */
  val q305TemperatureMixture = GraftQuery(
    "q305_temperature_mixture",
    (s, dir) => {
      val counts = Tables.documents(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(
        sum(pow(col("n_docs").cast("double"), lit(0.3))).as("wtot"),
        sum("n_docs").as("ntot"))
      val budgets = counts.crossJoin(broadcast(tot))
        .withColumn("w",
          pow(col("n_docs").cast("double"), lit(0.3)) / col("wtot"))
        .withColumn("budget",
          least(round(round(col("w") * expr("ntot * 2 div 5"), 6))
            .cast("long"), col("n_docs")))
        .select("lang", "n_docs", "w", "budget")
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long")
      val sampled = Tables.documents(s, dir).select("doc_id", "lang")
        .join(broadcast(budgets), "lang")
        .withColumn("keep",
          (bucket * col("n_docs") < col("budget") * 65536L).cast("int"))
        .groupBy("lang").agg(sum("keep").cast("long").as("n_sampled"))
      budgets.join(sampled, "lang")
        .select(col("lang"), col("n_docs"),
          round(round(col("w"), 6), 4).as("w"), col("budget"),
          col("n_sampled"))
        .orderBy("lang")
    },
    Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           |           FROM documents GROUP BY 1),
           |t AS (SELECT sum(pow(n_docs, 0.3)) AS wtot,
           |        CAST(sum(n_docs) AS BIGINT) AS ntot FROM c),
           |b AS (
           |  SELECT lang, n_docs, pow(n_docs, 0.3) / wtot AS w,
           |    least(CAST(round(round(pow(n_docs, 0.3) / wtot
           |        * (ntot * 2 // 5), 6)) AS BIGINT), n_docs) AS budget
           |  FROM c CROSS JOIN t),
           |smp AS (
           |  SELECT d.lang,
           |    CAST(sum(CASE WHEN
           |        CAST(concat('0x', substr(md5(d.doc_id::VARCHAR), 1, 4))
           |          AS BIGINT) * b.n_docs < b.budget * 65536
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
           |  FROM documents d JOIN b USING (lang) GROUP BY 1)
           |SELECT b.lang, b.n_docs, round(round(b.w, 6), 4) AS w,
           |  b.budget, smp.n_sampled
           |FROM b JOIN smp USING (lang) ORDER BY b.lang""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q52HashSample, q53IncrementalDedup, q54OutlierFilter,
    q65StratifiedSample, q97WeightedSample, q129MixtureSample, q136EpochShuffle,
    q181SnapshotDiff, q188GroupSplit, q217CurationFunnel, q226IncrementalSessions,
    q251DatasetCard, q305TemperatureMixture)
}
