package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Data-quality constraint audit — the validation pass a pipeline runs
  * before promoting a batch: row counts, primary-key uniqueness, null rates,
  * and referential-integrity orphans, emitted as one (check, value) row per
  * constraint. Each check is a scan-plus-aggregate or an anti-join — no
  * driver-side row iteration, so the audit shape survives 100 TB.
  */
object Quality {

  val q96DqChecks = GraftQuery(
    "q96_dq_checks",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val li = Tables.lineitem(s, dir)
      val checks = Seq(
        o.agg(count(lit(1)).as("value")).select(lit("orders_rows").as("check_name"), col("value")),
        o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("value"))
          .select(lit("orders_pk_dups").as("check_name"), col("value")),
        o.agg(sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("value"))
          .select(lit("orders_custkey_nulls").as("check_name"), col("value")),
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit("orders_custkey_orphans").as("check_name"), col("value")),
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit("lineitem_orderkey_orphans").as("check_name"), col("value")),
        li.agg(sum(when(col("l_quantity") < 0, 1L).otherwise(0L)).as("value"))
          .select(lit("lineitem_negative_qty").as("check_name"), col("value")))
      checks.reduce(_.unionAll(_)).orderBy("check_name")
    },
    Some("""SELECT * FROM (
           |  SELECT 'orders_rows' AS check_name, count(*) AS value FROM orders
           |  UNION ALL
           |  SELECT 'orders_pk_dups', count(*) - count(DISTINCT o_orderkey) FROM orders
           |  UNION ALL
           |  SELECT 'orders_custkey_nulls', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           |  UNION ALL
           |  SELECT 'orders_custkey_orphans', count(*) FROM orders
           |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
           |  UNION ALL
           |  SELECT 'lineitem_orderkey_orphans', count(*) FROM lineitem
           |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
           |  UNION ALL
           |  SELECT 'lineitem_negative_qty', CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           |) ORDER BY check_name""".stripMargin))

  /** Population-stability-index (PSI) drift monitor: the reference slice
    * (even event ids) defines equi-depth bin cutpoints via exact deciles;
    * both slices are histogrammed into those bins with a higher-order
    * `filter` count (no join, no explode), and per-bin PSI terms
    * (p−q)·ln(p/q) quantify the shift. The production data-drift alarm for
    * a feature column, as one scan per slice plus a 10-row aggregate.
    */
  val q113PsiDrift = GraftQuery(
    "q113_psi_drift",
    (s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "value")
      val ref = ev.filter(col("event_id") % 2 === 0)
      val cur = ev.filter(col("event_id") % 2 =!= 0)
      val cuts = ref.agg(expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")).head()
        .getSeq[Double](0)
      val cutsLit = typedLit(cuts)
      def binned(df: org.apache.spark.sql.DataFrame, n: String) = df
        .withColumn("bin", size(filter(cutsLit, c => col("value") > c)))
        .groupBy("bin").agg(count(lit(1)).as(n))
      binned(ref, "n_ref").join(binned(cur, "n_cur"), Seq("bin"), "full")
        .withColumn("p", coalesce(col("n_ref"), lit(0L)) /
          sum(coalesce(col("n_ref"), lit(0L))).over())
        .withColumn("q", coalesce(col("n_cur"), lit(0L)) /
          sum(coalesce(col("n_cur"), lit(0L))).over())
        .select(col("bin"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"),
          round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi_term"))
        .orderBy("bin")
    },
    Some("""WITH ref AS (SELECT value FROM events WHERE event_id % 2 = 0),
           |cur AS (SELECT value FROM events WHERE event_id % 2 <> 0),
           |cuts AS (SELECT quantile_cont(value,
           |  [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c FROM ref),
           |rb AS (SELECT len(list_filter(cuts.c, x -> value > x)) AS bin,
           |  count(*) AS n_ref FROM ref, cuts GROUP BY 1),
           |cb AS (SELECT len(list_filter(cuts.c, x -> value > x)) AS bin,
           |  count(*) AS n_cur FROM cur, cuts GROUP BY 1),
           |j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
           |  coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
           |  FROM rb FULL JOIN cb ON rb.bin = cb.bin)
           |SELECT CAST(bin AS INT) AS bin, n_ref, n_cur,
           |  round((n_ref / CAST(sum(n_ref) OVER () AS DOUBLE)
           |      - n_cur / CAST(sum(n_cur) OVER () AS DOUBLE))
           |    * ln((n_ref / CAST(sum(n_ref) OVER () AS DOUBLE))
           |      / (n_cur / CAST(sum(n_cur) OVER () AS DOUBLE))), 6) AS psi_term
           |FROM j ORDER BY bin""".stripMargin))

  /** Rank-based AUC (Mann-Whitney U) — the evaluation op for the data-
    * quality classifiers a training pipeline trains (how well does doc
    * length separate English from the rest, per source?). Exact to the last
    * bit: with average ranks for ties, 2·rank = cnt_less + cnt_leq + 1 is
    * an INTEGER per row, so the whole statistic stays in integer arithmetic
    * — AUC = (Σ_pos 2r − P(P+1)) / (2PN) — until one final division. No
    * float accumulation, no rounding drift.
    *
    * Scale (r8): rows first collapse to per-(source, score) counts — a
    * partial agg whose output is bounded by the score domain (doc-length
    * values), not the corpus — and the rank algebra runs over THAT table:
    * for every row at score v, 2·avg_rank = 2·cumc(v) − c(v) + 1, so
    * Σ_pos 2r = Σ_v p(v)·(2·cumc(v) − c(v) + 1). The round-7 form ran
    * the RANGE window over the raw rows partitioned by the handful of
    * sources — ~n/|sources| rows through one task each, the q205 defect
    * class; the collapsed window input is value-domain-bounded. Identical
    * integer arithmetic, oracle unchanged.
    */
  val q153Auc = GraftQuery(
    "q153_auc",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byV = Tables.documents(s, dir)
        .select(col("source"),
          (col("lang") === "en").cast("long").as("y"),
          length(col("text")).cast("long").as("score"))
        .groupBy("source", "score")
        .agg(count(lit(1)).as("c"), sum("y").as("p"))
      val wLeq = Window.partitionBy("source").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byV
        .withColumn("cumc", sum("c").over(wLeq))
        .groupBy("source")
        .agg(
          sum("p").as("n_pos"),
          (sum("c") - sum("p")).as("n_neg"),
          sum(col("p") * (col("cumc") - col("c") + col("cumc") + 1)).as("s2"))
        .filter(col("n_pos") > 0 && col("n_neg") > 0)
        .withColumn("auc",
          round((col("s2") - col("n_pos") * (col("n_pos") + 1))
            .cast("double") / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
        .select(col("source"), col("n_pos"), col("n_neg"), col("auc"))
        .orderBy("source")
    },
    Some("""WITH d AS (
           |  SELECT source, CAST(lang = 'en' AS BIGINT) y,
           |    CAST(length(text) AS BIGINT) score
           |  FROM documents),
           |ranked AS (
           |  SELECT source, y,
           |    count(*) OVER (PARTITION BY source ORDER BY score
           |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_leq,
           |    count(*) OVER (PARTITION BY source, score) AS peers
           |  FROM d),
           |agg AS (
           |  SELECT source, CAST(sum(y) AS BIGINT) n_pos,
           |    CAST(count(*) - sum(y) AS BIGINT) n_neg,
           |    CAST(sum(y * (cnt_leq - peers + cnt_leq + 1)) AS BIGINT) s2
           |  FROM ranked GROUP BY 1)
           |SELECT source, n_pos, n_neg,
           |  round((s2 - n_pos * (n_pos + 1))::DOUBLE / (2.0 * n_pos * n_neg), 6) AS auc
           |FROM agg WHERE n_pos > 0 AND n_neg > 0
           |ORDER BY source""".stripMargin))

  /** DSIR data selection — hashed n-gram importance resampling (Xie et al.
    * 2023, the DoReMi-era recipe behind most "select raw web data that
    * looks like the target corpus" pipelines): word unigrams + bigrams are
    * feature-HASHED into B = 256 buckets, bag-of-words categorical models
    * are fitted for the TARGET distribution (here lang = 'en' docs, the
    * paper's "formal text" stand-in) and the RAW distribution (the whole
    * corpus) with add-1 smoothing, and every document scores
    * log ŵ = Σ_grams [ln p̂_target(b) − ln p̂_raw(b)] over its gram
    * occurrences; the top-m by log-weight are selected.
    *
    * Scale: feature hashing is the whole point — model state is EXACTLY
    * 2·B counts no matter how many distinct n-grams 100 TB of text holds,
    * so both models are two shuffle-light partial aggs over one gram scan
    * (persisted, reused for scoring), the 256-row log-ratio table joins the
    * gram stream as a BROADCAST hash join (map-side, no corpus shuffle),
    * and selection is one TakeOrderedAndProject top-m, never a global sort.
    * Per-doc score is an order-dependent float sum → rounded at 3 (q149
    * discipline) with doc_id tiebreaks.
    */
  val q168DsirSelect = GraftQuery(
    "q168_dsir_select",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grams = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("lang"),
          explode(concat(col("w"), expr(
            "zip_with(slice(w, 1, greatest(size(w) - 1, 0)), " +
              "slice(w, 2, greatest(size(w) - 1, 0)), (a, b) -> concat(a, ' ', b))")))
            .as("g"))
        .select(col("doc_id"), col("lang"),
          pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"), lit(256))
            .as("b"))
        .persist()
      val tot = grams.agg(
        count(lit(1)).cast("double").as("tr"),
        sum((col("lang") === "en").cast("long")).cast("double").as("tt")).first()
      val (tRaw, tTgt) = (tot.getDouble(0), tot.getDouble(1))
      val model = grams.groupBy("b").agg(
        count(lit(1)).as("cr"),
        sum((col("lang") === "en").cast("long")).as("ct"))
        .select(col("b"),
          (log((col("ct") + 1.0) / (tTgt + 256.0)) -
            log((col("cr") + 1.0) / (tRaw + 256.0))).as("lr"))
      val scored = grams.join(broadcast(model), "b")
        .groupBy("doc_id").agg(round(sum("lr"), 3).as("logw"))
      scored.orderBy(desc("logw"), col("doc_id")).limit(25)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("logw"), col("doc_id"))))
        .join(Tables.documents(s, dir).select("doc_id", "lang"), "doc_id")
        .select(col("rank"), col("doc_id"), col("lang"), col("logw"))
        .orderBy("rank")
    },
    Some("""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
           |grams AS (
           |  SELECT doc_id, lang, unnest(w) g FROM d
           |  UNION ALL
           |  SELECT doc_id, lang,
           |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) g
           |  FROM d),
           |hashed AS (SELECT doc_id, lang,
           |    CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % 256 b
           |  FROM grams),
           |tot AS (SELECT CAST(count(*) AS DOUBLE) tr,
           |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) tt
           |  FROM hashed),
           |model AS (SELECT b,
           |    ln((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1.0) / (tt + 256.0))
           |      - ln((count(*) + 1.0) / (tr + 256.0)) lr
           |  FROM hashed, tot GROUP BY b, tt, tr),
           |scored AS (SELECT doc_id, round(sum(lr), 3) logw
           |  FROM hashed JOIN model USING (b) GROUP BY 1),
           |top AS (SELECT doc_id, logw,
           |    row_number() OVER (ORDER BY logw DESC, doc_id) rank
           |  FROM scored)
           |SELECT CAST(rank AS INT) AS rank, top.doc_id, d2.lang, logw
           |FROM top JOIN documents d2 ON top.doc_id = d2.doc_id
           |WHERE rank <= 25 ORDER BY rank""".stripMargin))

  /** One-pass dataset profiler (the Deequ/TFDV "column statistics" op):
    * every column's row count, null count, exact distinct count, and — for
    * numerics — min/max/mean/stddev, computed as ONE wide aggregation over
    * a single scan and then stacked to a (column, stats) long format. The
    * point at 100 TB is the single pass: profiling k columns as k separate
    * queries rescans the table k times, while one agg row carries all
    * k×6 partial aggregates through one shuffle of exactly one row per
    * partition. mean/stddev are accumulation-order-dependent → round 3;
    * min/max/counts are exact.
    */
  val q182ColumnProfile = GraftQuery(
    "q182_column_profile",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val nums = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val strs = Seq("l_returnflag", "l_linestatus")
      val aggs =
        Seq(count(lit(1)).as("n_rows")) ++
        (nums ++ strs).flatMap { c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
          countDistinct(col(c)).as(s"dist_$c"))
        } ++
        nums.flatMap { c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          round(avg(col(c)), 3).as(s"mean_$c"),
          round(stddev_samp(col(c)), 3).as(s"std_$c"))
        }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val stackArgs = (
        nums.map(c =>
          s"'$c', n_rows, null_$c, dist_$c, min_$c, max_$c, mean_$c, std_$c") ++
        strs.map(c =>
          s"'$c', n_rows, null_$c, dist_$c, " +
            "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
            "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
      ).mkString(", ")
      one.select(expr(
        s"stack(6, $stackArgs) AS (col_name, n_rows, n_null, n_distinct, " +
          "min_v, max_v, mean_v, std_v)"))
        .orderBy("col_name")
    },
    Some {
      val num = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min($c) AS min_v, max($c) AS max_v,
           |  round(avg($c), 3) AS mean_v, round(stddev_samp($c), 3) AS std_v
           |FROM lineitem""".stripMargin
      }
      val str = Seq("l_returnflag", "l_linestatus").map { c =>
        s"""SELECT '$c', count(*), CAST(count(*) - count($c) AS BIGINT),
           |  count(DISTINCT $c),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           |FROM lineitem""".stripMargin
      }
      (num ++ str).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })

  /** Quantile normalization of a per-document score across sources — the
    * standard cross-domain score-equalization step before mixing corpora
    * (a length/quality score calibrated on web text is NOT comparable to
    * one on code; quantile-mapping both onto a shared reference
    * distribution is the fix, same recipe as microarray quantile norm):
    * rank each doc's n_chars WITHIN its source into 10 ntile buckets
    * (ties broken by doc_id so the bucketing is total), take the
    * cross-source mean per bucket as the reference distribution, and map
    * every doc to its bucket's reference value.
    *
    * Scale: one window shuffle partitioned by source plus a 10-row
    * broadcast join back. With few giant sources the per-source window is
    * the hot spot at 100 TB — the production variant is REGISTERED as
    * q267 (per-source approx_percentile boundary frame, same join shape,
    * no window); this exact-ntile form is the bounded sibling q267's
    * buckets and reference distribution are validated against.
    */
  val q193QuantileNorm = GraftQuery(
    "q193_quantile_norm",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val b = d.withColumn("q", ntile(10).over(
        Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))))
      val ref = b.groupBy("q").agg(round(avg("n_chars"), 3).as("norm_score"))
      b.join(ref, Seq("q"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("q"),
          col("norm_score"))
        .orderBy("doc_id")
    },
    Some("""WITH b AS (SELECT doc_id, source, n_chars,
           |    ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS q
           |  FROM documents),
           |ref AS (SELECT q, round(avg(n_chars), 3) AS norm_score FROM b GROUP BY 1)
           |SELECT doc_id, source, n_chars, b.q, norm_score
           |FROM b JOIN ref USING (q) ORDER BY doc_id""".stripMargin))

  /** Sketch-boundary quantile normalization — the production variant
    * q193's scaladoc promises: the same bucket→reference-mean join shape,
    * but the per-source decile boundaries come from `approx_percentile`
    * (Greenwald-Khanna, accuracy 10000) whose state is FIXED-SIZE per
    * source at any corpus volume — where q193's exact per-source window
    * ranks every row. Because the GK sketch isn't cross-engine stable, the
    * oracle-checkable output follows the q123 discipline: buckets and the
    * reference distribution are computed from the EXACT value-decile
    * boundaries (a value function — no window, just a grouped percentile
    * frame of ≤9 boundaries per source broadcast back), and each row
    * carries a `sketch_ok` boolean asserting the sketch boundary lies
    * BETWEEN THE ADJACENT EXACT DECILES (min/max at the edges) — the
    * value-domain shadow of GK's rank guarantee (error ≤ n/accuracy
    * ranks, ≪ the n/10 decile width at any n; a value-percentage band
    * would be meaningless on a 25-doc source where neighboring order
    * statistics differ by 17%). A sketch regression flips the boolean
    * and the hash; the oracle emits literal TRUE.
    *
    * Scale: two grouped aggregates + one broadcast join; boundary state is
    * 2×9 doubles per source. QuantileNormSketchSpec pins the bounded
    * frame and the broadcast, window-free plan.
    */
  val q267QuantileNormSketch = GraftQuery(
    "q267_quantile_norm_sketch",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val bounds = quantileNormBounds(s, dir)
      val withQ = d.join(broadcast(bounds), "source")
        .withColumn("q",
          (size(filter(col("eb"), x => col("n_chars") > x)) + 1).cast("int"))
      val ref = withQ.groupBy("q")
        .agg(round(avg("n_chars"), 3).as("norm_score"))
      val lo = when(col("q") === 1, col("mn"))
        .otherwise(element_at(col("eb"), col("q") - 1))
      val hi = when(col("q") === 9, col("mx"))
        .otherwise(element_at(col("eb"), col("q") + 1))
      withQ.groupBy("source", "q")
        .agg(count(lit(1)).as("n_docs"),
          first(when(col("q") <= 9,
            element_at(col("ab"), col("q")).between(lo, hi))
            .otherwise(lit(true)))
            .as("sketch_ok"))
        .join(broadcast(ref), "q")
        .select(col("source"), col("q"), col("n_docs"), col("norm_score"),
          col("sketch_ok"))
        .orderBy("source", "q")
    },
    Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
           |b AS (SELECT source,
           |    list_transform(quantile_cont(n_chars,
           |      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]), x -> round(x, 6)) eb
           |  FROM d GROUP BY 1),
           |q AS (SELECT d.source, n_chars,
           |    len(list_filter(b.eb, x -> n_chars > x)) + 1 AS q
           |  FROM d JOIN b USING (source)),
           |ref AS (SELECT q, round(avg(n_chars), 3) norm_score
           |  FROM q GROUP BY 1)
           |SELECT q.source, CAST(q.q AS INT) AS q,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  any_value(ref.norm_score) AS norm_score, TRUE AS sketch_ok
           |FROM q JOIN ref USING (q)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** The per-source boundary frame behind q267: exact decile boundaries
    * (rounded 6 — the literal both engines compare against) next to the
    * approx_percentile sketch boundaries. One grouped aggregate; ≤ 2×9
    * doubles per source regardless of corpus size.
    */
  private[graft] def quantileNormBounds(s: SparkSession, dir: String): DataFrame = {
    val fr = (1 to 9).map(_ / 10.0)
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(
        expr(s"transform(percentile(n_chars, array(${fr.mkString(",")})), " +
          "x -> round(x, 6))").as("eb"),
        approx_percentile(col("n_chars"),
          array(fr.map(lit): _*), lit(10000)).as("ab"),
        min("n_chars").cast("double").as("mn"),
        max("n_chars").cast("double").as("mx"))
  }

  /** Calibration curve (reliability diagram) of a probability-like score
    * against observed outcomes — the companion to q153's AUC: AUC says the
    * score RANKS well, calibration says its VALUES mean what they claim,
    * which is what a threshold-based data filter actually relies on. The
    * score is a logistic over ship-delay days (l_shipdate − o_orderdate,
    * centered at 60); the outcome is whether the line came back returned
    * (l_returnflag = 'R'). Rows bucket into
    * value-decile bins of the INTEGER day delta (nine exact percentile
    * thresholds as a literal frame — the q254 pattern, ScaleFrames — so
    * binning is a map-side comparison chain and equal deltas always share
    * a bin), then each bin reports mean predicted probability vs empirical
    * positive rate and the gap — per-bin |gap| summed is ECE if the caller
    * wants one number.
    *
    * Scale: one threshold-aggregate scan plus one partial-agg scan — no
    * global window, no `Exchange SinglePartition` (the round-7 ntile form
    * funneled every row through ONE sort task; this is its scale-safe
    * replacement, hash-equivalent up to the documented tie discipline).
    * Positive rates are integer ratios (safe at 6); avg(score)
    * accumulates floats → 3 digits.
    */
  private[graft] def q196Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        (datediff(col("l_shipdate"), col("o_orderdate")) - lit(60)).as("dd"),
        (col("l_returnflag") === "R").cast("int").as("late"))
    val li = if (forPlan) base else base.persist()
    val ts = ScaleFrames.thresholds(li, "dd", (1 to 9).map(_ / 10.0))
    val out = li
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("dd") / lit(30.0))))
      .withColumn("bin", ScaleFrames.binAsc(col("dd"), ts))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        round(avg("score"), 3).as("avg_score"),
        round(avg(col("late").cast("double")), 6).as("pos_rate"),
        round(avg("score") - avg(col("late").cast("double")), 3).as("gap"))
      .orderBy("bin")
    if (forPlan) out
    else {
      val r = out.localCheckpoint() // ≤10 rows; frees the cached base
      li.unpersist()
      r
    }
  }

  val q196Calibration = GraftQuery(
    "q196_calibration",
    (s, dir) => q196Df(s, dir),
    Some(s"""WITH li AS (SELECT
           |    datediff('day', o_orderdate, l_shipdate) - 60 AS dd,
           |    CAST(l_returnflag = 'R' AS INT) AS late
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |th AS (${ScaleFrames.thresholdCte("dd", (1 to 9).map(_ / 10.0), "li")}),
           |sc AS (SELECT late, 1.0 / (1.0 + exp(-dd / 30.0)) AS score,
           |    ${ScaleFrames.binSqlAsc("dd", 9)} AS bin
           |  FROM li, th)
           |SELECT bin, CAST(count(*) AS BIGINT) AS n,
           |  round(avg(score), 3) AS avg_score,
           |  round(avg(late::DOUBLE), 6) AS pos_rate,
           |  round(avg(score) - avg(late::DOUBLE), 3) AS gap
           |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Robust outlier detection via median/MAD modified z-score (Iglewicz &
    * Hoaglin's 0.6745·(x−med)/MAD > 3.5 rule) per event type — the
    * heavy-tail-safe sibling of q54's percentile clip: mean/stddev bounds
    * are themselves dragged by the outliers they're hunting, while the
    * double-median breaks down only past 50% contamination. Two grouped
    * exact medians (one for the median, one for the MAD over the
    * broadcast-joined residuals) and a final count. The values are
    * CONTINUOUS (near-unique), so the one-shot grouped `percentile`
    * would merge ~n/|types| distinct-value entries on each group's
    * reducer — the medians instead come from
    * [[ScaleFrames.groupedQuantileWideDomain]] (r8: per-(type, value)
    * counts, two-level cumulative ranks, the same two-order-statistic
    * interpolation bit-for-bit — no cross-row float accumulation, the
    * q54-proven `percentile`/`quantile_cont` pairing), so 6-digit rounding
    * holds.
    */
  val q199MadOutliers = GraftQuery(
    "q199_mad_outliers",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = ScaleFrames
        .groupedQuantileWideDomain(ev, "event_type", "value", 32.0, 0.5, "med")
        .withColumnRenamed("event_type", "mt")
      // dev feeds the MAD quantile AND the final outlier scan — persist so
      // the events scan + median join run once, not twice
      val dev = ev.join(broadcast(med), col("event_type") === col("mt"))
        .withColumn("adev", abs(col("value") - col("med")))
        .persist()
      val mad = ScaleFrames
        .groupedQuantileWideDomain(dev, "event_type", "adev", 32.0, 0.5, "mad")
      dev.join(broadcast(mad.select(col("event_type").as("kt"),
          col("mad"))), col("event_type") === col("kt"))
        .withColumn("out",
          (lit(0.6745) * col("adev") / col("mad") > 3.5).cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(first("med"), 6).as("med"),
          round(first("mad"), 6).as("mad"), sum("out").as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           |  FROM events GROUP BY 1),
           |dev AS (SELECT e.event_type, e.value, m.med,
           |    abs(e.value - m.med) AS adev
           |  FROM events e JOIN med m USING (event_type)),
           |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
           |  FROM dev GROUP BY 1)
           |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(any_value(d.med), 6) AS med,
           |  round(any_value(mad.mad), 6) AS mad,
           |  CAST(sum(CAST(0.6745 * d.adev / mad.mad > 3.5 AS INT)) AS BIGINT)
           |    AS n_outliers
           |FROM dev d JOIN mad USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Weight-of-evidence / information-value feature diagnostics — the
    * credit-scoring-lineage screen for "does this feature separate the
    * classes, monotonically, and where": score deciles (q196's
    * threshold-frame value binning — no global window, ScaleFrames) each
    * report WOE = ln((pos_share)/(neg_share)) with
    * Laplace 0.5 smoothing (a pure-one-class bin would be ±∞), and the
    * per-bin IV term (pos% − neg%)·WOE sums to the feature's information
    * value (rule of thumb: <0.02 useless, >0.3 strong). Everything after
    * the decile binning is integer counts and one ln of an exact rational
    * — bit-identical cross-engine, rounded only for display.
    *
    * Scale: threshold scan + partial-agg scan, zero single-partition
    * exchanges; the ≤10-row bin table localCheckpoints so the totals
    * crossJoin and the verify pass read materialized rows.
    */
  private[graft] def q210Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        (datediff(col("l_shipdate"), col("o_orderdate")) - lit(60)).as("dd"),
        (col("l_returnflag") === "R").cast("long").as("pos"))
    val li = if (forPlan) base else base.persist()
    val ts = ScaleFrames.thresholds(li, "dd", (1 to 9).map(_ / 10.0))
    val per0 = li.withColumn("bin", ScaleFrames.binAsc(col("dd"), ts))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val per =
      if (forPlan) per0
      else {
        val p = per0.localCheckpoint() // ≤10 rows; frees the cached base
        li.unpersist()
        p
      }
    val tot = per.agg(sum("pos").as("p_all"), sum("neg").as("n_all"))
    per.crossJoin(tot)
      .withColumn("woe", log(((col("pos") + 0.5) / col("p_all")) /
        ((col("neg") + 0.5) / col("n_all"))))
      .select(col("bin"), col("n"), col("pos"), col("neg"),
        round(col("woe"), 6).as("woe"),
        round(((col("pos") / col("p_all")) - (col("neg") / col("n_all")))
          * col("woe"), 6).as("iv_term"))
      .orderBy("bin")
  }

  val q210WoeIv = GraftQuery(
    "q210_woe_iv",
    (s, dir) => q210Df(s, dir),
    Some(s"""WITH li AS (SELECT
           |    datediff('day', o_orderdate, l_shipdate) - 60 AS dd,
           |    CAST(l_returnflag = 'R' AS BIGINT) AS pos
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |th AS (${ScaleFrames.thresholdCte("dd", (1 to 9).map(_ / 10.0), "li")}),
           |b AS (SELECT pos, ${ScaleFrames.binSqlAsc("dd", 9)} AS bin
           |  FROM li, th),
           |per AS (SELECT bin, CAST(count(*) AS BIGINT) n,
           |    CAST(sum(pos) AS BIGINT) pos,
           |    CAST(count(*) - sum(pos) AS BIGINT) neg
           |  FROM b GROUP BY 1),
           |tot AS (SELECT CAST(sum(pos) AS BIGINT) p_all,
           |    CAST(sum(neg) AS BIGINT) n_all FROM per),
           |w AS (SELECT per.*, p_all, n_all,
           |    ln(((pos + 0.5)::DOUBLE / p_all) / ((neg + 0.5)::DOUBLE / n_all)) AS woe
           |  FROM per, tot)
           |SELECT bin, n, pos, neg, round(woe, 6) AS woe,
           |  round((pos::DOUBLE / p_all - neg::DOUBLE / n_all) * woe, 6) AS iv_term
           |FROM w ORDER BY bin""".stripMargin))

  /** Mutual information between corpus facets (lang × source) — the
    * dependence screen a mixture designer runs before treating facets as
    * independent sampling axes: MI = Σ p(l,s)·ln(p(l,s)/(p(l)p(s))),
    * reported with both marginal entropies and the normalized
    * MI/√(H_l·H_s) ∈ [0,1]. High NMI means the facets are redundant (e.g.
    * each source is monolingual) and stratifying on both double-counts.
    * Counts are three stacked partial aggs over ≤ |langs|·|sources|
    * cells; every probability is an exact integer ratio, so the few-cell
    * float fold rounds safely at 6.
    */
  val q223MutualInfo = GraftQuery(
    "q223_mutual_info",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val joint = d.groupBy("lang", "source").agg(count(lit(1)).as("c"))
        .persist()
      val n = joint.agg(sum("c").cast("double").as("n"))
      val pl = joint.groupBy("lang").agg(sum("c").as("cl"))
      val ps = joint.groupBy("source").agg(sum("c").as("cs"))
      val cells = joint.join(pl, "lang").join(ps, "source").crossJoin(n)
      val out = cells.agg(
        round(sum((col("c") / col("n")) *
          log((col("c") * col("n")) / (col("cl") * col("cs")))), 6).as("mi"))
      // marginal entropies fold the pl/ps marginals of the persisted joint
      // table (the oracle's own shape) — not two extra scans of documents
      val hl = pl.crossJoin(n)
        .agg(round(-sum((col("cl") / col("n")) * log(col("cl") / col("n"))), 6)
          .as("h_lang"))
      val hs = ps.crossJoin(n)
        .agg(round(-sum((col("cs") / col("n")) * log(col("cs") / col("n"))), 6)
          .as("h_source"))
      val res = hl.crossJoin(hs).crossJoin(out.select("mi"))
        .select(col("h_lang"), col("h_source"), col("mi"),
          round(col("mi") / sqrt(col("h_lang") * col("h_source")), 6).as("nmi"))
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = res.localCheckpoint()
      joint.unpersist()
      ckpt
    },
    Some("""WITH j AS (SELECT lang, source, CAST(count(*) AS BIGINT) c
           |  FROM documents GROUP BY 1, 2),
           |n AS (SELECT CAST(sum(c) AS DOUBLE) n FROM j),
           |pl AS (SELECT lang, CAST(sum(c) AS BIGINT) cl FROM j GROUP BY 1),
           |ps AS (SELECT source, CAST(sum(c) AS BIGINT) cs FROM j GROUP BY 1),
           |mi AS (SELECT round(sum((c / n.n) * ln((c * n.n) / (cl * cs))), 6) mi
           |  FROM j JOIN pl USING (lang) JOIN ps USING (source), n),
           |hl AS (SELECT round(-sum((cl / n.n) * ln(cl / n.n)), 6) h_lang
           |  FROM pl, n),
           |hs AS (SELECT round(-sum((cs / n.n) * ln(cs / n.n)), 6) h_source
           |  FROM ps, n)
           |SELECT h_lang, h_source, mi,
           |  round(mi / sqrt(h_lang * h_source), 6) AS nmi
           |FROM hl, hs, mi""".stripMargin))

  /** Split-conformal prediction intervals (Vovk; Lei et al.) — the
    * distribution-free uncertainty wrapper modern pipelines put around
    * ANY point predictor: hash-split lineitem three ways (train/cal/test
    * on md5 buckets — leakage-free by construction, the q188 discipline),
    * fit the point model on TRAIN (OLS of extendedprice on quantity via
    * regr_slope/intercept), take the 90th-percentile absolute residual on
    * CAL as the interval half-width q̂, and report the TEST coverage of
    * prediction ± q̂ — the conformal guarantee says ≈90% regardless of
    * the model being right. Fit parameters round to 6 BEFORE scoring
    * (shared literals both sides, the round-before-use discipline), so
    * residuals are per-row arithmetic on identical coefficients.
    */
  val q242Conformal = GraftQuery(
    "q242_conformal",
    (s, dir) => {
      val bucket = conv(substring(md5(concat(col("l_orderkey").cast("string"),
        lit("_"), col("l_linenumber").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 3
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        .withColumn("b", bucket).persist()
      val fit = li.filter(col("b") === 0).agg(
        round(expr("regr_slope(y, x)"), 6).as("m"),
        round(expr("regr_intercept(y, x)"), 6).as("c")).head()
      val (m, c) = (fit.getDouble(0), fit.getDouble(1))
      val resid = abs(col("y") - (lit(m) * col("x") + lit(c)))
      // r8: the calibration residuals are continuous (near-unique), so the
      // one-shot exact percentile would buffer ~n/3 values on one reducer —
      // the 0.9 quantile comes from the two-level wide-domain path instead
      // (same interpolation + HALF_UP rounding, bit-identical)
      val qhat = ScaleFrames.thresholdsWideDomain(
        li.filter(col("b") === 1).select(resid.as("resid")),
        "resid", 1000.0, Seq(0.9)).head
      val out = li.filter(col("b") === 2)
        .agg(count(lit(1)).as("n_test"),
          sum((resid <= qhat).cast("long")).as("n_covered"))
        .select(lit(m).as("slope"), lit(c).as("intercept"),
          lit(qhat).as("q_hat"), col("n_test"),
          round(col("n_covered") / col("n_test").cast("double"), 6)
            .as("coverage"))
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      li.unpersist()
      ckpt
    },
    Some("""WITH li AS (SELECT l_quantity x, l_extendedprice y,
           |    CAST(concat('0x', substr(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR), 1, 8)) AS BIGINT) % 3 AS b
           |  FROM lineitem),
           |fit AS (SELECT round(regr_slope(y, x), 6) m,
           |    round(regr_intercept(y, x), 6) c
           |  FROM li WHERE b = 0),
           |qh AS (SELECT round(quantile_cont(abs(y - (m * x + c)), 0.9), 6) q
           |  FROM li, fit WHERE b = 1)
           |SELECT any_value(fit.m) AS slope, any_value(fit.c) AS intercept,
           |  any_value(qh.q) AS q_hat, CAST(count(*) AS BIGINT) AS n_test,
           |  round(sum(CAST(abs(y - (fit.m * x + fit.c)) <= qh.q AS INT))
           |    / count(*)::DOUBLE, 6) AS coverage
           |FROM li, fit, qh WHERE b = 2""".stripMargin))

  /** Two-sample Kolmogorov-Smirnov statistic between two sources' length
    * distributions — the nonparametric drift test next to q113's binned
    * PSI (KS needs no bin choice and is sensitive anywhere on the CDF):
    * D = max |F_A(v) − F_B(v)| over the pooled values. The ECDFs are
    * exact integer rationals; D is their max — deterministic bit-for-bit,
    * rounded only for display.
    *
    * Scale: the ECDF cumsum is TWO-LEVEL (the q174 twoLevelRank shape on
    * a numeric axis) — rows first collapse to per-distinct-value counts
    * (a partial agg; the value domain is bounded by the max document
    * length at any corpus size), the cumulative sum runs inside
    * fixed-width value buckets (a PARTITIONED window, parallel), and the
    * bounded per-bucket totals cumulate through a triangle join instead
    * of a global window — the plan carries no `Exchange SinglePartition`.
    * Grouping by value first is exactly the round-7 RANGE frame's tie
    * semantics (F(v) counts every row with value ≤ v), so the oracle is
    * unchanged.
    */
  private[graft] def q243Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val d = Tables.documents(s, dir)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), col("n_chars").cast("double").as("v"))
      val byV0 = d.groupBy("v").agg(
        sum((col("source") === "src0").cast("long")).as("a"),
        sum((col("source") === "src1").cast("long")).as("b"))
        .withColumn("bkt", floor(col("v") / 256).cast("long"))
      // ≤ distinct-lengths rows, bounded by max doc length
      val byV = if (forPlan) byV0 else byV0.localCheckpoint()
      val counts = byV.agg(sum("a").as("na"), sum("b").as("nb")).head()
      val (na, nb) = (counts.getLong(0), counts.getLong(1))
      ScaleFrames.twoLevelCumsum(byV, Seq.empty, "bkt", "v",
          Seq("a" -> "ca", "b" -> "cb"))
        .agg(max(abs(col("ca") / lit(na.toDouble) - col("cb") / lit(nb.toDouble)))
          .as("d"))
        .select(lit(na).as("n_a"), lit(nb).as("n_b"),
          round(col("d"), 6).as("ks_d"))
  }

  val q243KsTest = GraftQuery(
    "q243_ks_test",
    (s, dir) => q243Df(s, dir),
    Some("""WITH d AS (SELECT source, n_chars::DOUBLE v FROM documents
           |  WHERE source IN ('src0', 'src1')),
           |n AS (SELECT CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) na,
           |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) nb
           |  FROM d),
           |e AS (SELECT
           |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) OVER (
           |      ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ca,
           |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) OVER (
           |      ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cb
           |  FROM d)
           |SELECT n.na AS n_a, n.nb AS n_b,
           |  round(max(abs(ca / n.na::DOUBLE - cb / n.nb::DOUBLE)), 6) AS ks_d
           |FROM e, n GROUP BY 1, 2""".stripMargin))

  /** ROC curve points at decile thresholds — the curve q153's AUC
    * integrates and q196's calibration complements: nine exact decile
    * thresholds of the ship-delay score, each reporting TPR/FPR for the
    * "predict returned if delay ≥ t" rule. Thresholds are exact
    * percentiles of the INTEGER delay (the q54-proven pairing, rounded
    * to 6 before use so both engines compare against identical
    * literals-by-construction); TPR/FPR are integer-count ratios.
    * One base scan, one 9-row threshold frame, one crossJoin + partial
    * agg per threshold group.
    */
  val q254RocPoints = GraftQuery(
    "q254_roc_points",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate"), col("o_orderdate")).as("dd"),
          (col("l_returnflag") === "R").cast("long").as("pos"))
        .persist()
      val thresholds = (1 to 9).map { k =>
        round(expr(s"percentile(dd, ${k / 10.0})"), 6).as(s"t$k")
      }
      val tRow = li.agg(thresholds.head, thresholds.tail: _*).head()
      import s.implicits._
      val tDf = (1 to 9).map(k => (k, tRow.getDouble(k - 1))).toDF("k", "t")
      val out = li.crossJoin(tDf)
        .groupBy("k", "t")
        .agg(
          round(sum(when(col("dd") >= col("t"), col("pos")).otherwise(0L)) /
            sum("pos").cast("double"), 6).as("tpr"),
          round(sum(when(col("dd") >= col("t"), lit(1L) - col("pos")).otherwise(0L)) /
            sum(lit(1L) - col("pos")).cast("double"), 6).as("fpr"))
        .select(col("k"), round(col("t"), 6).as("threshold"),
          col("tpr"), col("fpr"))
        .orderBy("k")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      li.unpersist()
      ckpt
    },
    Some("""WITH li AS (SELECT datediff('day', o_orderdate, l_shipdate) dd,
           |    CAST(l_returnflag = 'R' AS BIGINT) pos
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |th0 AS (SELECT round(quantile_cont(dd, 0.1), 6) t1,
           |    round(quantile_cont(dd, 0.2), 6) t2,
           |    round(quantile_cont(dd, 0.3), 6) t3,
           |    round(quantile_cont(dd, 0.4), 6) t4,
           |    round(quantile_cont(dd, 0.5), 6) t5,
           |    round(quantile_cont(dd, 0.6), 6) t6,
           |    round(quantile_cont(dd, 0.7), 6) t7,
           |    round(quantile_cont(dd, 0.8), 6) t8,
           |    round(quantile_cont(dd, 0.9), 6) t9 FROM li),
           |th AS (SELECT 1 k, t1 t FROM th0 UNION ALL SELECT 2, t2 FROM th0
           |  UNION ALL SELECT 3, t3 FROM th0 UNION ALL SELECT 4, t4 FROM th0
           |  UNION ALL SELECT 5, t5 FROM th0 UNION ALL SELECT 6, t6 FROM th0
           |  UNION ALL SELECT 7, t7 FROM th0 UNION ALL SELECT 8, t8 FROM th0
           |  UNION ALL SELECT 9, t9 FROM th0)
           |SELECT CAST(th.k AS INT) AS k, round(th.t, 6) AS threshold,
           |  round(sum(CASE WHEN dd >= th.t THEN pos ELSE 0 END)
           |    / sum(pos)::DOUBLE, 6) AS tpr,
           |  round(sum(CASE WHEN dd >= th.t THEN 1 - pos ELSE 0 END)
           |    / sum(1 - pos)::DOUBLE, 6) AS fpr
           |FROM li, th GROUP BY 1, 2 ORDER BY 1""".stripMargin))

  /** Cumulative gains (lift) chart — the targeting readout next to q254's
    * ROC: bin by the score descending into value deciles (nine exact
    * percentile thresholds at descending fractions — the ScaleFrames
    * threshold frame, decile 1 = highest scores, equal scores share a
    * decile), report what share of all positives the top-k deciles
    * capture and the lift over random (gain share / population share).
    * Gains are integer ratios rounded at 6.
    *
    * Scale: threshold scan + partial-agg scan, then the cumulative sums
    * run through a 10×10 triangle join over the localCheckpointed decile
    * table — no global window anywhere, no `Exchange SinglePartition`.
    */
  private[graft] def q261Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val base = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(
          datediff(col("l_shipdate"), col("o_orderdate")).as("dd"),
          (col("l_returnflag") === "R").cast("long").as("pos"))
      val li = if (forPlan) base else base.persist()
      val ts = ScaleFrames.thresholds(li, "dd", (1 to 9).map(k => (10 - k) / 10.0))
      val per0 = li.withColumn("decile", ScaleFrames.binDesc(col("dd"), ts))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("pos").as("pos"))
      val per =
        if (forPlan) per0
        else {
          val p = per0.localCheckpoint() // ≤10 rows; frees the cached base
          li.unpersist()
          p
        }
      val prior = per.select(col("decile").as("d2"), col("n").as("n2"),
        col("pos").as("p2"))
      per.crossJoin(prior)
        .groupBy("decile", "n", "pos")
        .agg(sum(when(col("d2") <= col("decile"), col("p2")).otherwise(0L))
            .as("cum_pos"),
          sum(when(col("d2") <= col("decile"), col("n2")).otherwise(0L))
            .as("cum_n"),
          sum("p2").as("tot_pos"), sum("n2").as("tot_n"))
        .select(col("decile"), col("n"), col("pos"),
          round(col("cum_pos") / col("tot_pos").cast("double"), 6).as("gain"),
          round((col("cum_pos") / col("tot_pos").cast("double")) /
            (col("cum_n") / col("tot_n").cast("double")), 6).as("lift"))
        .orderBy("decile")
  }

  val q261CumulativeGains = GraftQuery(
    "q261_cumulative_gains",
    (s, dir) => q261Df(s, dir),
    Some(s"""WITH li AS (SELECT
           |    datediff('day', o_orderdate, l_shipdate) dd,
           |    CAST(l_returnflag = 'R' AS BIGINT) pos
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |th AS (${ScaleFrames.thresholdCte("dd",
             (1 to 9).map(k => (10 - k) / 10.0), "li")}),
           |b AS (SELECT pos, ${ScaleFrames.binSqlDesc("dd", 9)} decile
           |  FROM li, th),
           |per AS (SELECT decile, CAST(count(*) AS BIGINT) n,
           |    CAST(sum(pos) AS BIGINT) pos FROM b GROUP BY 1)
           |SELECT decile, n, pos,
           |  round(sum(pos) OVER (ORDER BY decile)
           |    / (sum(pos) OVER ())::DOUBLE, 6) AS gain,
           |  round((sum(pos) OVER (ORDER BY decile) / (sum(pos) OVER ())::DOUBLE)
           |    / (sum(n) OVER (ORDER BY decile) / (sum(n) OVER ())::DOUBLE), 6)
           |    AS lift
           |FROM per ORDER BY decile""".stripMargin))

  /** Dead-letter routing — the ingestion-robustness pattern every
    * pipeline front door needs: rows whose JSON payload fails to parse
    * (here every 50th event's props loses its closing brace before
    * parsing, simulating upstream truncation) route to a quarantine
    * aggregate WITH A REASON instead of poisoning the main flow;
    * from_json returns null on malformed input (the try-parse
    * discipline), so routing is one null test — no exceptions, no task
    * retries. Output: rows landed per route with distinct reasons.
    */
  val q262DeadLetter = GraftQuery(
    "q262_dead_letter",
    (s, dir) => {
      val damaged = Tables.events(s, dir)
        .withColumn("raw",
          when(col("event_id") % 50 === 0,
            regexp_replace(col("props"), "\\}$", "")).otherwise(col("props")))
        .withColumn("parsed",
          from_json(col("raw"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
      damaged
        .withColumn("route",
          when(col("parsed").isNull, "dead_letter").otherwise("main"))
        .withColumn("reason",
          when(col("parsed").isNull, "malformed_json").otherwise("ok"))
        .groupBy("route", "reason")
        .agg(count(lit(1)).as("n"), countDistinct("event_type").as("n_types"))
        .orderBy("route")
    },
    Some("""WITH d AS (SELECT event_type,
           |    CASE WHEN event_id % 50 = 0 THEN regexp_replace(props, '}$', '') ELSE props END AS raw
           |  FROM events),
           |p AS (SELECT event_type,
           |    CASE WHEN json_valid(raw) THEN 'main' ELSE 'dead_letter' END route,
           |    CASE WHEN json_valid(raw) THEN 'ok' ELSE 'malformed_json' END reason
           |  FROM d)
           |SELECT route, reason, CAST(count(*) AS BIGINT) n,
           |  CAST(count(DISTINCT event_type) AS BIGINT) n_types
           |FROM p GROUP BY 1, 2 ORDER BY route""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q96DqChecks, q113PsiDrift, q153Auc, q168DsirSelect,
    q182ColumnProfile, q193QuantileNorm, q196Calibration, q199MadOutliers,
    q210WoeIv, q223MutualInfo, q242Conformal, q243KsTest, q254RocPoints,
    q261CumulativeGains, q262DeadLetter, q267QuantileNormSketch)
}
