package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q352–q358 — round-12 training-data curation batch: the bookkeeping
  * operators a production pretraining-data build runs AROUND the dedup /
  * mixture / packing core that earlier rounds landed — leakage-safe
  * splits, repetition-capped epoch budgeting, padding-waste accounting,
  * per-source quality caps, offline changepoint detection, vocabulary
  * coverage sizing, and soft-dedup effective-size reporting.
  *
  * Batch precision discipline: every comparison that can flip a row
  * (split boundaries, epoch caps, bucket edges, argmax splits) is exact
  * integer arithmetic or a fixed-shape expression over exact integers
  * evaluated identically on both engines; doubles appear only in display
  * columns as ONE division of two exact integers rounded identically.
  */
object Curation12 {

  private def normT: Column =
    trim(regexp_replace(col("text"), "\\s+", " "))
  private def nTok(t: Column): Column =
    when(t === "", 0L).otherwise(size(split(t, " ")).cast("long"))

  /** Leakage-safe train/val/test split (the contamination concern behind
    * every public eval: near-identical documents must NOT straddle
    * train and test). Exact-duplicate clusters (normalized-text md5) are
    * the atomic unit: each cluster is assigned WHOLE to one split, so a
    * duplicated document can never leak across the boundary — while a
    * naive per-document hash split would scatter its copies. Stratified
    * by the cluster representative's source with cumulative-rounding
    * 80/10/10 boundaries (rank ≤ (8n+5) div 10 → train, ≤ (9n+5) div 10
    * → val — deterministic round-half-up thresholds, Σ = n exactly).
    *
    * The audit column makes the operator's value measurable: n_naive_leak
    * counts documents in MULTI-document clusters whose per-document hash
    * split disagrees with their cluster representative's hash split —
    * exactly the duplicates a naive per-document splitter would scatter
    * across the boundary. The fixture's duplicate mass lives at sf0.1
    * (8 cross-source duplicate clusters; smaller fixtures have none), so
    * the leak pin in Curation12Spec runs at that scale.
    *
    * Scale shape: ONE groupBy to clusters (fp shuffle), rank windows
    * partitioned per stratum (clusters per source — never global), one
    * equi-join back to docs on fp. Nothing wider than the cluster list
    * shuffles.
    */
  val q352LeakageSafeSplit = GraftQuery(
    "q352_leakage_safe_split",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), md5(normT).as("fp"),
          nTok(normT).as("n_tok"))
      val cl = d.groupBy("fp")
        .agg(min("doc_id").as("rep_id"),
          min_by(col("source"), col("doc_id")).as("rep_source"),
          count(lit(1)).as("csz"))
      val bySrc = Window.partitionBy("rep_source").orderBy("rep_id")
      val cnt = Window.partitionBy("rep_source")
      def bucket(c: Column): Column =
        pmod(conv(substring(md5(c.cast("string")), 1, 4), 16, 10)
          .cast("long"), lit(10L))
      val sp = cl
        .withColumn("rk", row_number().over(bySrc))
        .withColumn("n", count(lit(1)).over(cnt))
        .select(col("fp"), col("csz"), bucket(col("rep_id")).as("rep_b"),
          when(col("rk") <= expr("(8 * n + 5) div 10"), "train")
            .when(col("rk") <= expr("(9 * n + 5) div 10"), "val")
            .otherwise("test").as("split"))
      d.join(sp, "fp")
        .groupBy("split")
        .agg(countDistinct("fp").as("n_clusters"),
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          sum(when(col("csz") > 1, 1L).otherwise(0L)).as("n_multi_docs"),
          sum(when(col("csz") > 1 &&
            bucket(col("doc_id")) =!= col("rep_b"), 1L).otherwise(0L))
            .as("n_naive_leak"))
        .orderBy("split")
    },
    Some("""WITH d AS MATERIALIZED (
           |  SELECT doc_id, source,
           |    md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
           |    CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = ''
           |      THEN 0 ELSE CAST(len(string_split(
           |        trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           |        AS BIGINT) END AS n_tok
           |  FROM documents),
           |cl AS (
           |  SELECT fp, min(doc_id) AS rep_id,
           |    arg_min(source, doc_id) AS rep_source,
           |    CAST(count(*) AS BIGINT) AS csz
           |  FROM d GROUP BY 1),
           |rk AS (
           |  SELECT fp, csz, rep_id,
           |    row_number() OVER (PARTITION BY rep_source ORDER BY rep_id)
           |      AS rk,
           |    count(*) OVER (PARTITION BY rep_source) AS n
           |  FROM cl),
           |sp AS (
           |  SELECT fp, csz,
           |    CAST(concat('0x', substr(md5(rep_id::VARCHAR), 1, 4))
           |      AS BIGINT) % 10 AS rep_b,
           |    CASE WHEN rk <= (8 * n + 5) // 10 THEN 'train'
           |         WHEN rk <= (9 * n + 5) // 10 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM rk),
           |dd AS (
           |  SELECT d.fp, d.n_tok, sp.split, sp.csz, sp.rep_b,
           |    CAST(concat('0x', substr(md5(d.doc_id::VARCHAR), 1, 4))
           |      AS BIGINT) % 10 AS b
           |  FROM d JOIN sp USING (fp))
           |SELECT split, CAST(count(DISTINCT fp) AS BIGINT) AS n_clusters,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |  CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_multi_docs,
           |  CAST(sum(CASE WHEN csz > 1 AND b <> rep_b THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_naive_leak
           |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Repetition-capped epoch allocation under a token budget (the
    * data-constrained-scaling bookkeeping of Muennighoff et al. 2023:
    * when the corpus is smaller than the compute budget, small
    * high-value sources repeat — but only up to a cap before returns
    * degrade). Budget B = 3× total corpus tokens; per-source weights
    * w = ⌊√tokens⌋ up-weight small sources sub-linearly; the budget
    * apportions by Hamilton's method in DECIMAL(38,0)/HUGEINT (quotas
    * B·w div W, remainder seats by descending B·w mod W with ties to the
    * smaller source — Σ budget = B EXACTLY, the q340 discipline); epochs
    * quantize to per-mille integers capped at 5000 (5 epochs), and the
    * realized token draw floors back through the same integers. The
    * leftover the caps strand (Σ budget − Σ realized) is reported on
    * every row — the amount a second allocation pass would route to
    * uncapped sources.
    *
    * Scale shape: ONE corpus partial-agg groupBy to per-source token
    * sums; everything after runs on the ≤|sources| aggregate (the
    * remainder-rank window is post-aggregate and bounded).
    */
  val q353EpochAllocation = GraftQuery(
    "q353_epoch_allocation",
    (s, dir) => {
      val t = Tables.documents(s, dir)
        .select(col("source"), nTok(normT).as("n_tok"))
        .groupBy("source").agg(sum("n_tok").as("toks"))
      val w = t.select(col("source"), col("toks"),
        floor(sqrt(col("toks").cast("double"))).cast("long").as("w"))
      val tot = w.agg(sum("w").as("bigw"), (sum("toks") * 3L).as("b"))
      val quotas = w.crossJoin(broadcast(tot))
        .select(col("source"), col("toks"), col("w"), col("b"),
          expr("CAST((CAST(b AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0)))" +
            " div CAST(bigw AS DECIMAL(38,0)) AS BIGINT)").as("fl"),
          expr("CAST(pmod(CAST(b AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))," +
            " CAST(bigw AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("rem"))
      val byRem = Window.orderBy(desc("rem"), col("source"))
      val leftSeats = quotas.agg((max("b") - sum("fl")).as("r"))
      val alloc = quotas.crossJoin(broadcast(leftSeats))
        .withColumn("rk", row_number().over(byRem))
        .withColumn("budget",
          col("fl") + when(col("rk") <= col("r"), 1L).otherwise(0L))
        .withColumn("epochs_milli",
          least(lit(5000L), expr("(1000 * budget) div greatest(toks, 1)")))
        .withColumn("realized", expr("(epochs_milli * toks) div 1000"))
      val stranded = alloc.agg((sum("budget") - sum("realized")).as("leftover"))
      alloc.crossJoin(broadcast(stranded))
        .select(col("source"), col("toks"), col("w"), col("budget"),
          col("epochs_milli"),
          (col("epochs_milli") === 5000L).cast("long").as("capped"),
          col("realized"), col("leftover"))
        .orderBy("source")
    },
    Some("""WITH t AS (
           |  SELECT source,
           |    CAST(sum(CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g'))
           |      = '' THEN 0 ELSE len(string_split(
           |        trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END)
           |      AS BIGINT) AS toks
           |  FROM documents GROUP BY 1),
           |w AS (SELECT source, toks,
           |    CAST(floor(sqrt(CAST(toks AS DOUBLE))) AS BIGINT) AS w
           |  FROM t),
           |tot AS (SELECT CAST(sum(w) AS HUGEINT) AS bigw,
           |    CAST(sum(toks) * 3 AS BIGINT) AS b FROM w),
           |quotas AS (
           |  SELECT source, toks, w, b,
           |    CAST((CAST(b AS HUGEINT) * CAST(w AS HUGEINT)) // bigw
           |      AS BIGINT) AS fl,
           |    (CAST(b AS HUGEINT) * CAST(w AS HUGEINT)) % bigw AS rem
           |  FROM w, tot),
           |lo AS (SELECT CAST(max(b) - sum(fl) AS BIGINT) AS r FROM quotas),
           |alloc AS (
           |  SELECT source, toks, w, b,
           |    CAST(fl + CASE WHEN
           |      row_number() OVER (ORDER BY rem DESC, source) <= r
           |      THEN 1 ELSE 0 END AS BIGINT) AS budget
           |  FROM quotas, lo),
           |ep AS (
           |  SELECT source, toks, w, budget,
           |    least(5000, (1000 * budget) // greatest(toks, 1))
           |      AS epochs_milli
           |  FROM alloc),
           |re AS (
           |  SELECT *, CAST((epochs_milli * toks) // 1000 AS BIGINT)
           |    AS realized
           |  FROM ep),
           |st AS (SELECT CAST(sum(budget) - sum(realized) AS BIGINT)
           |    AS leftover FROM re)
           |SELECT source, toks, w, budget,
           |  CAST(epochs_milli AS BIGINT) AS epochs_milli,
           |  CAST(CASE WHEN epochs_milli = 5000 THEN 1 ELSE 0 END AS BIGINT)
           |    AS capped,
           |  realized, leftover
           |FROM re, st ORDER BY source""".stripMargin))

  /** Sequence-packing padding-waste audit: documents chunk into
    * 1024-token segments; full segments pad nothing, the remainder
    * segment pads up to the next power-of-two bucket (min 16) — the
    * length-bucketed batching every trainer runs to keep padding FLOPs
    * bounded. Bucket edges are exact bit arithmetic (2^len(bin(rem−1)),
    * the q321 binary-length trick — no float log2 whose last ulp could
    * flip a boundary). Output: per-bucket segment counts, token mass,
    * padding mass, and the padding share.
    *
    * Scale shape: two partial-agg groupBys over per-doc arithmetic (full
    * segments and remainder segments aggregated separately, unioned on
    * the ≤8-row bucket key). No joins, no windows.
    */
  val q354PaddingWaste = GraftQuery(
    "q354_padding_waste",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(nTok(normT).as("n"))
        .filter(col("n") > 0)
      val full = d.filter(expr("n div 1024") > 0)
        .agg(sum(expr("n div 1024")).as("n_segments"),
          (sum(expr("n div 1024")) * 1024L).as("tok"))
        .select(lit(1024L).as("bucket"), col("n_segments"), col("tok"),
          lit(0L).as("padding"))
        .filter(col("n_segments").isNotNull) // empty agg -> one null row
      val rem = d.select(expr("n % 1024").as("r")).filter(col("r") > 0)
        .select(when(col("r") <= 16L, 16L)
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(r - 1)) AS INT))"))
          .as("bucket"),
          col("r"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_segments"), sum("r").as("tok"),
          (count(lit(1)) * col("bucket") - sum("r")).as("padding"))
      full.unionByName(rem)
        .groupBy("bucket")
        .agg(sum("n_segments").as("n_segments"), sum("tok").as("tokens"),
          sum("padding").as("padding"))
        .withColumn("padding_pct",
          round(col("padding").cast("double") /
            (col("tokens") + col("padding")).cast("double"), 6))
        .orderBy("bucket")
    },
    Some("""WITH d AS (
           |  SELECT CAST(len(string_split(
           |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           |      AS BIGINT) AS n
           |  FROM documents
           |  WHERE trim(regexp_replace(text, '\s+', ' ', 'g')) <> ''),
           |fullb AS (
           |  SELECT CAST(1024 AS BIGINT) AS bucket,
           |    CAST(sum(n // 1024) AS BIGINT) AS n_segments,
           |    CAST(sum(n // 1024) * 1024 AS BIGINT) AS tok,
           |    CAST(0 AS BIGINT) AS padding
           |  FROM d WHERE n // 1024 > 0),
           |remb AS (
           |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_segments,
           |    CAST(sum(r) AS BIGINT) AS tok,
           |    CAST(count(*) * bucket - sum(r) AS BIGINT) AS padding
           |  FROM (
           |    SELECT CASE WHEN r <= 16 THEN 16
           |      ELSE 1 << CAST(length(bin(r - 1)) AS INT) END AS bucket, r
           |    FROM (SELECT n % 1024 AS r FROM d) WHERE r > 0)
           |  GROUP BY 1),
           |u AS (SELECT * FROM fullb WHERE n_segments IS NOT NULL
           |  UNION ALL SELECT * FROM remb)
           |SELECT bucket, CAST(sum(n_segments) AS BIGINT) AS n_segments,
           |  CAST(sum(tok) AS BIGINT) AS tokens,
           |  CAST(sum(padding) AS BIGINT) AS padding,
           |  round(CAST(sum(padding) AS DOUBLE) /
           |    CAST(sum(tok) + sum(padding) AS DOUBLE), 6) AS padding_pct
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Per-source quality cap (the C4/Gopher-style domain cap: no single
    * domain may dominate the corpus): keep the top 20 documents per
    * source by token count (ties to the smaller doc_id), report what the
    * cap keeps and drops. The rank window is keyed PER SOURCE — the
    * per-key top-k every curation pipeline runs, never a global sort.
    */
  val q355SourceQualityCap = GraftQuery(
    "q355_source_quality_cap",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), nTok(normT).as("n_tok"))
      val byQ = Window.partitionBy("source")
        .orderBy(desc("n_tok"), col("doc_id"))
      d.withColumn("rk", row_number().over(byQ))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= 20, 1L).otherwise(0L)).as("n_kept"),
          sum("n_tok").as("tok_total"),
          sum(when(col("rk") <= 20, col("n_tok")).otherwise(0L))
            .as("tok_kept"))
        .withColumn("kept_share",
          round(col("tok_kept").cast("double") /
            col("tok_total").cast("double"), 6))
        .orderBy("source")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source,
           |    CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = ''
           |      THEN 0 ELSE CAST(len(string_split(
           |        trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           |        AS BIGINT) END AS n_tok
           |  FROM documents),
           |rk AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY source ORDER BY n_tok DESC, doc_id) AS rk
           |  FROM d)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  CAST(sum(n_tok) AS BIGINT) AS tok_total,
           |  CAST(sum(CASE WHEN rk <= 20 THEN n_tok ELSE 0 END) AS BIGINT)
           |    AS tok_kept,
           |  round(CAST(sum(CASE WHEN rk <= 20 THEN n_tok ELSE 0 END)
           |    AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE), 6) AS kept_share
           |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Offline single-changepoint detection by binary segmentation (the
    * first split of Scott & Knott / binary-seg CPD) over each event
    * type's gap-filled hourly count series: the boundary minimizing
    * within-segment SSE ⟺ maximizing (ΣL)²/nL + (ΣR)²/nR. Prefix sums
    * are exact integers from ONE keyed window pass; each candidate
    * boundary's score is a FIXED-SHAPE expression over those integers
    * ((a²q + b²p)/(pq) as one double) — identical operand bits on both
    * engines, so the argmax (ties to the earlier hour) cannot diverge.
    * Complements q246's sequential CUSUM with the retrospective answer.
    *
    * Scale shape: the corpus-wide pass is ONE partial-agg groupBy to
    * (type, hour) counts; windows and the argmax run on the hourly
    * aggregate, calendar-bounded per type (the q319 grid discipline).
    *
    * Overflow discipline (round-12 ADVICE): the score numerator
    * a²(n−p) + (tot−a)²p is accumulated in DECIMAL(38,0) / HUGEINT (the
    * q363 pattern), good to prefix sums of ~10¹⁷ events per type — and
    * past that BOTH engines raise instead of Spark wrapping silently
    * while DuckDB errors (the divergence the BIGINT form risked).
    */
  val q356BinsegChangepoint = GraftQuery(
    "q356_binseg_changepoint",
    (s, dir) => {
      val hrs = Tables.events(s, dir).select(
        col("event_type").as("et"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
          " div 3600000000").as("h"))
      val counts = hrs.groupBy("et", "h").agg(count(lit(1)).as("c"))
      val bounds = hrs.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = hrs.select("et").distinct().crossJoin(broadcast(bounds))
        .select(col("et"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val x = grid.join(counts, Seq("et", "h"), "left")
        .select(col("et"), col("h"), coalesce(col("c"), lit(0L)).as("x"))
      val byH = Window.partitionBy("et").orderBy("h")
      val pre = x
        .withColumn("a", sum("x").over(byH))
        .withColumn("p", row_number().over(byH).cast("long"))
        .withColumn("tot", sum("x").over(Window.partitionBy("et")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("et")))
        .filter(col("p") < col("n")) // boundary after position p
        .withColumn("score",
          ((col("a").cast("decimal(38,0)") * col("a") * (col("n") - col("p")) +
            (col("tot") - col("a")).cast("decimal(38,0)") *
              (col("tot") - col("a")) * col("p"))
            .cast("double")) /
            (col("p") * (col("n") - col("p"))).cast("double"))
      val best = Window.partitionBy("et").orderBy(desc("score"), col("h"))
      pre.withColumn("brk", row_number().over(best))
        .filter(col("brk") === 1)
        .select(col("et").as("event_type"), col("h").as("split_hour"),
          col("p").as("n_left"), (col("n") - col("p")).as("n_right"),
          round(col("a").cast("double") / col("p").cast("double"), 6)
            .as("mean_left"),
          round((col("tot") - col("a")).cast("double") /
            (col("n") - col("p")).cast("double"), 6).as("mean_right"),
          round(col("score"), 4).as("score"))
        .orderBy("event_type")
    },
    Some("""WITH hrs AS (
           |  SELECT event_type AS et,
           |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
           |  FROM events),
           |counts AS (SELECT et, h, CAST(count(*) AS BIGINT) AS c
           |  FROM hrs GROUP BY 1, 2),
           |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hrs),
           |grid AS (SELECT et, unnest(generate_series(h0, h1)) AS h
           |  FROM (SELECT DISTINCT et FROM hrs), bounds),
           |x AS (SELECT grid.et, grid.h,
           |    CAST(coalesce(c, 0) AS BIGINT) AS x
           |  FROM grid LEFT JOIN counts
           |    ON counts.et = grid.et AND counts.h = grid.h),
           |pre AS (
           |  SELECT et, h,
           |    CAST(sum(x) OVER (PARTITION BY et ORDER BY h) AS BIGINT) AS a,
           |    CAST(row_number() OVER (PARTITION BY et ORDER BY h)
           |      AS BIGINT) AS p,
           |    CAST(sum(x) OVER (PARTITION BY et) AS BIGINT) AS tot,
           |    CAST(count(*) OVER (PARTITION BY et) AS BIGINT) AS n
           |  FROM x),
           |sc AS (
           |  SELECT *, CAST(a::HUGEINT * a * (n - p)
           |      + (tot - a)::HUGEINT * (tot - a) * p
           |      AS DOUBLE) / CAST(p * (n - p) AS DOUBLE) AS score
           |  FROM pre WHERE p < n),
           |best AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY et ORDER BY score DESC, h) AS brk
           |  FROM sc)
           |SELECT et AS event_type, h AS split_hour, p AS n_left,
           |  CAST(n - p AS BIGINT) AS n_right,
           |  round(CAST(a AS DOUBLE) / CAST(p AS DOUBLE), 6) AS mean_left,
           |  round(CAST(tot - a AS DOUBLE) / CAST(n - p AS DOUBLE), 6)
           |    AS mean_right,
           |  round(score, 4) AS score
           |FROM best WHERE brk = 1 ORDER BY event_type""".stripMargin))

  /** Vocabulary coverage curve (tokenizer sizing): what share of corpus
    * trigram mass do the top-k types cover, for k in powers of two — the
    * Zipf-integral question behind every vocab-size decision. The top
    * 4096 types come via orderBy+limit (TakeOrderedAndProject — never a
    * global rank window over the full vocabulary, which at corpus scale
    * is billions of types); the cumulative curve then runs on that
    * BOUNDED 4096-row frame, and total mass comes from one scalar agg.
    * Short documents are guarded with the q323/q339 CASE (a <3-word doc
    * contributes no trigrams on either engine).
    */
  val q357VocabCoverage = GraftQuery(
    "q357_vocab_coverage",
    (s, dir) => {
      import s.implicits._
      val grams = Tables.documents(s, dir)
        .select(split(normT, " ").as("ws"))
        .select(explode(expr(
          """CASE WHEN size(ws) >= 3 THEN
            |  transform(sequence(0, size(ws) - 3),
            |    i -> concat_ws(' ', slice(ws, i + 1, 3)))
            |ELSE array() END""".stripMargin)).as("g"))
      val freq = grams.groupBy("g").agg(count(lit(1)).as("f"))
      val tot = freq.agg(sum("f").as("total"), count(lit(1)).as("v"))
      val top = freq.orderBy(desc("f"), col("g")).limit(4096)
      val byRank = Window.orderBy(desc("f"), col("g"))
      val cum = top
        .withColumn("rk", row_number().over(byRank).cast("long"))
        .withColumn("cum", sum("f").over(byRank))
      val ks = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L,
        2048L, 4096L).toDF("k")
      ks.crossJoin(broadcast(tot))
        .withColumn("cap", least(col("k"), col("v")))
        .join(cum.select(col("rk"), col("cum")), col("cap") === col("rk"))
        .select(col("k"), col("cap").as("n_types"), col("cum").as("mass"),
          round(col("cum").cast("double") / col("total").cast("double"), 6)
            .as("coverage"))
        .orderBy("k")
    },
    Some("""WITH base AS (
           |  SELECT string_split(trim(regexp_replace(text, '\s+', ' ',
           |    'g')), ' ') AS ws
           |  FROM documents),
           |grams AS (
           |  SELECT unnest([array_to_string(ws[i : i + 2], ' ')
           |    FOR i IN generate_series(1, len(ws) - 2)]) AS g
           |  FROM base),
           |freq AS (SELECT g, CAST(count(*) AS BIGINT) AS f
           |  FROM grams GROUP BY 1),
           |tot AS (SELECT CAST(sum(f) AS BIGINT) AS total,
           |    CAST(count(*) AS BIGINT) AS v FROM freq),
           |top AS (SELECT g, f FROM freq ORDER BY f DESC, g LIMIT 4096),
           |cum AS (
           |  SELECT CAST(row_number() OVER (ORDER BY f DESC, g) AS BIGINT)
           |      AS rk,
           |    CAST(sum(f) OVER (ORDER BY f DESC, g) AS BIGINT) AS cum
           |  FROM top),
           |ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
           |    1024, 2048, 4096]) AS k)
           |SELECT CAST(k AS BIGINT) AS k,
           |  CAST(least(k, v) AS BIGINT) AS n_types, cum AS mass,
           |  round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
           |    AS coverage
           |FROM ks CROSS JOIN tot JOIN cum ON cum.rk = least(ks.k, tot.v)
           |ORDER BY k""".stripMargin))

  /** Effective dataset size under soft dedup (the SemDeDup-adjacent
    * accounting: instead of DROPPING duplicates, weight each document by
    * 1/cluster-size so a text repeated 50 times contributes one
    * document's worth of mass): per-source exact-duplicate cluster
    * weights in per-mille integers ((1000·n_tok) div size — one floor
    * per doc, deterministic), with the discount ratio as the display
    * column. The gap between tok_total and eff_tokens_milli/1000 is the
    * repetition mass a naive token count overstates.
    *
    * Scale shape: one fp groupBy for cluster sizes, one equi-join back,
    * one per-source partial agg — the q24 dedup shapes, repurposed for
    * accounting.
    */
  val q358EffectiveSize = GraftQuery(
    "q358_effective_size",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), md5(normT).as("fp"),
          nTok(normT).as("n_tok"))
      val sz = d.groupBy("fp").agg(count(lit(1)).as("sz"))
      d.join(sz, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("fp").as("n_clusters"),
          sum("n_tok").as("tok_total"),
          sum(expr("(1000 * n_tok) div sz")).as("eff_tokens_milli"))
        .withColumn("discount",
          round(col("eff_tokens_milli").cast("double") /
            (lit(1000.0) * col("tok_total").cast("double")), 6))
        .orderBy("source")
    },
    Some("""WITH d AS MATERIALIZED (
           |  SELECT doc_id, source,
           |    md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
           |    CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = ''
           |      THEN 0 ELSE CAST(len(string_split(
           |        trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           |        AS BIGINT) END AS n_tok
           |  FROM documents),
           |sz AS (SELECT fp, CAST(count(*) AS BIGINT) AS sz
           |  FROM d GROUP BY 1)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT d.fp) AS BIGINT) AS n_clusters,
           |  CAST(sum(n_tok) AS BIGINT) AS tok_total,
           |  CAST(sum((1000 * n_tok) // sz) AS BIGINT) AS eff_tokens_milli,
           |  round(CAST(sum((1000 * n_tok) // sz) AS DOUBLE) /
           |    (1000.0 * CAST(sum(n_tok) AS DOUBLE)), 6) AS discount
           |FROM d JOIN sz USING (fp)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q352LeakageSafeSplit, q353EpochAllocation,
    q354PaddingWaste, q355SourceQualityCap, q356BinsegChangepoint,
    q357VocabCoverage, q358EffectiveSize)
}
