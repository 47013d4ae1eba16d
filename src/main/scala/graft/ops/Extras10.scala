package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Tenth extras batch (round 11): the four remaining classic TPC-H
  * decorrelation shapes the inventory had not yet demonstrated — Q13's
  * outer-join count DISTRIBUTION (the filter-in-ON trap), Q15's
  * scalar-max view with tie preservation, Q16's NOT-IN anti join over a
  * distinct-count rollup, and Q22's cross-multiplied scalar-average gate
  * plus NOT-EXISTS anti join. Fixture adaptations are explicit per query
  * (the schema has no comment/phone/partsupp columns); every predicate
  * that decides a row is exact integer arithmetic — revenue and balances
  * are cents reconstructions, the Q22 average gate is cross-multiplied,
  * and the only doubles are final display divisions.
  */
object Extras10 {

  /** Exact money helpers: cents and the 10⁻⁴-dollar revenue unit
    * extprice·(1−discount) = extcents·(100 − discpct).
    */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")
  private def revE4: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  /** TPC-H Q13 analogue (customer order-count distribution): how many
    * customers placed 0, 1, 2, … qualifying orders. The famous trap this
    * query exists to pin: the order FILTER must live in the JOIN
    * CONDITION, not a WHERE — a post-join WHERE silently deletes the
    * zero-order customers that are the distribution's whole left tail.
    * Adaptation: the reference's `o_comment NOT LIKE '%special
    * %requests%'` exclusion becomes "exclude 5-LOW priority orders" (the
    * fixture has no comment column); the shape — left outer join with an
    * ON-clause residual, count of the null-able side, count-of-counts
    * rollup — is exactly Q13's.
    *
    * Scale shape: one shuffle each side of the outer join on custkey,
    * then two partial-agg groupBys on narrowing keys (custkey →
    * c_count). Counts are exact; there are no doubles at all.
    */
  val q334TpchQ13 = GraftQuery(
    "q334_tpch_q13",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select(col("o_custkey"), col("o_orderkey"))
      val perCust = Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""WITH per_cust AS (
           |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
           |  FROM customer LEFT JOIN orders
           |    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
           |  GROUP BY 1)
           |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
           |FROM per_cust GROUP BY 1
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** TPC-H Q15 analogue (top supplier by quarterly revenue, TIES KEPT):
    * the revenue "view" is one partial-agg groupBy over a shipdate
    * quarter, and the scalar `max(total_revenue)` joins back as a
    * broadcast single-row aggregate — the decorrelation of Q15's
    * `WHERE total_revenue = (SELECT max(...) FROM revenue)`. Revenue is
    * the exact 10⁻⁴-dollar integer reconstruction, so the max-equality
    * match cannot drop or add a tied supplier through float accumulation
    * — the property Q15's semantics (report ALL maximal suppliers)
    * depends on. The one double is the display division.
    *
    * Scale shape: scan → filtered partial-agg groupBy on suppkey →
    * 1-row max broadcast → equality filter → broadcast-able supplier
    * dimension join. Never a sort; never a second scan of lineitem.
    */
  val q335TpchQ15 = GraftQuery(
    "q335_tpch_q15",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01'" +
          " AND l_shipdate < TIMESTAMP '1996-04-01'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(revE4).as("rev_e4"))
      val mx = rev.agg(max("rev_e4").as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_e4") === col("mx"))
        .join(Tables.supplier(s, dir),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          round(col("rev_e4").cast("double") / 1e4, 2).as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (
           |  SELECT l_suppkey AS supplier_no,
           |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
           |      (100 - CAST(round(l_discount * 100) AS BIGINT)))
           |      AS BIGINT) AS rev_e4
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |    AND l_shipdate < TIMESTAMP '1996-04-01'
           |  GROUP BY 1),
           |mx AS (SELECT max(rev_e4) AS mx FROM rev)
           |SELECT s_suppkey, s_name, s_nationkey,
           |  round(CAST(rev_e4 AS DOUBLE) / 1e4, 2) AS total_revenue
           |FROM rev, mx
           |JOIN supplier ON supplier_no = s_suppkey
           |WHERE rev_e4 = mx
           |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q16 analogue (supplier diversity per part class, with a
    * NOT-IN exclusion): for each (brand, type, size) class surviving the
    * Q16-style predicate stack (one brand excluded, one type family
    * excluded, an 8-value size whitelist), count DISTINCT suppliers that
    * ship the part — excluding a blacklisted supplier set via anti join
    * (the decorrelation of Q16's `ps_suppkey NOT IN (SELECT ...)`).
    * Adaptations: the part↔supplier relation is the distinct
    * (l_partkey, l_suppkey) pairs of lineitem (the fixture has no
    * partsupp), and "suppliers with complaints" becomes the
    * deterministic stand-in s_suppkey ≡ 0 (mod 5) (no comment column).
    *
    * Scale shape: distinct pair projection (one shuffle on the pair),
    * broadcast-able anti join against the small exclusion set, broadcast
    * dimension join to part, one partial-agg distinct-count groupBy.
    * All counts exact; no doubles anywhere.
    */
  val q336TpchQ16 = GraftQuery(
    "q336_tpch_q16",
    (s, dir) => {
      val rel = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val excluded = Tables.supplier(s, dir)
        .filter(pmod(col("s_suppkey"), lit(5)) === 0)
        .select(col("s_suppkey"))
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      rel.join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""WITH rel AS (
           |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
           |surv AS (
           |  SELECT rel.* FROM rel
           |  WHERE l_suppkey NOT IN
           |    (SELECT s_suppkey FROM supplier WHERE s_suppkey % 5 = 0))
           |SELECT p_brand, p_type, p_size,
           |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           |FROM surv JOIN part ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
           |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
           |GROUP BY 1, 2, 3
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** TPC-H Q22 analogue (global sales opportunity): customers in chosen
    * cohorts with an above-average positive balance and NO orders at all
    * — the double decorrelation of Q22's scalar-average subquery (a
    * broadcast 1-row (Σ, n) aggregate, compared CROSS-MULTIPLIED:
    * bal·n > Σ, so the "above average" gate never touches a float) and
    * its NOT EXISTS over the customer's RECENT orders (a left anti join
    * on custkey against the date-filtered key projection — Q22's
    * seven-year recency window, here "since 2000-01-01"; the unscoped
    * form is vacuous on this fixture, where every customer has SOME
    * order). Adaptation: the phone country codes become cohort =
    * custkey mod 7 ∈ {1, 3, 5} (no phone column); the
    * aggregate-over-the-same-filtered-set structure is Q22's exactly.
    *
    * Scale shape: one pass builds the cohort projection; the average is
    * ONE broadcast row; the anti join shuffles on custkey against the
    * orders key projection; final rollup is a ≤3-row groupBy. Doubles
    * only in the display column.
    */
  val q337TpchQ22 = GraftQuery(
    "q337_tpch_q22",
    (s, dir) => {
      val cohort = Tables.customer(s, dir)
        .select(col("c_custkey"), pmod(col("c_custkey"), lit(7)).as("code"),
          cents(col("c_acctbal")).as("bal"))
        .filter(col("code").isin(1, 3, 5))
      val avgRow = cohort.filter(col("bal") > 0)
        .agg(sum("bal").as("s_bal"), count(lit(1)).as("n_bal"))
      val eligible = cohort.crossJoin(broadcast(avgRow))
        .filter(col("bal") * col("n_bal") > col("s_bal"))
      val out = eligible.join(
          Tables.orders(s, dir)
            .filter(expr("o_orderdate >= TIMESTAMP '2000-01-01'"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("code")
        .agg(count(lit(1)).as("numcust"), sum("bal").as("tot_cents"))
        .select(col("code"), col("numcust"),
          round(col("tot_cents").cast("double") / 100.0, 2).as("totacctbal"))
        .orderBy("code")
      out
    },
    Some("""WITH cohort AS (
           |  SELECT c_custkey, c_custkey % 7 AS code,
           |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
           |  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)),
           |avg_row AS (
           |  SELECT CAST(sum(bal) AS BIGINT) AS s_bal,
           |    CAST(count(*) AS BIGINT) AS n_bal
           |  FROM cohort WHERE bal > 0),
           |eligible AS (
           |  SELECT c_custkey, code, bal FROM cohort, avg_row
           |  WHERE bal * n_bal > s_bal)
           |SELECT code, CAST(count(*) AS BIGINT) AS numcust,
           |  round(CAST(sum(bal) AS DOUBLE) / 100.0, 2) AS totacctbal
           |FROM eligible
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = eligible.c_custkey
           |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** b-bit MinHash accuracy audit (Li & König 2010): how much Jaccard
    * accuracy survives when each of the 24 minhash components keeps only
    * its LOWEST BIT — the 32→1 bit compression that makes billion-doc
    * signature stores feasible. Over the q25-verified near-dup pairs
    * (identical shingle/hash/signature arithmetic to q25's oracle, so the
    * audit measures the REAL pipeline), each pair reports the exact
    * Jaccard, the full-width estimate (equal components / 24), and the
    * 1-bit estimate with the large-universe bias correction Ĵ = 2·m̂ − 1
    * clamped at 0 (the r ≪ 1 simplification of Li & König eq. 3.5 —
    * honest for md5-spread shingle sets, documented here). Bucketed by
    * Jaccard decile: pair counts are exact; the two mean-absolute-error
    * columns are order-dependent float averages → round 3 (the q149
    * discipline).
    *
    * Scale shape: one signature pass (per-doc HOF arithmetic, map-side),
    * the q25 LSH candidate/verify chain for pairs, two signature joins
    * keyed by doc id, one ≤10-row groupBy. Nothing touches more than the
    * candidate pairs after banding.
    */
  val q338BbitMinhash = GraftQuery(
    "q338_bbit_minhash",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // ONE corpus pass builds shingle sets AND signatures (the fused
      // q25 kernels); banding, verification, and both estimators all read
      // the persisted slim frame — the audit never tokenizes twice
      val sh = Dedup.shingleHashed(Tables.documents(s, dir), 8)
        .withColumn("ti", Dedup.sortedInts(col("tints")))
        .withColumn("sig",
          graft.functions.GraftFunctions.minhash(col("tints"),
            Dedup.NUM_HASHES))
        .select(col("doc_id"), col("ti"), col("sig"))
        .persist()
      val bands = Dedup.bandKeys(sh)
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .distinct()
      val pairs = Dedup.verifyJaccard(cand,
        sh.select(col("doc_id"), col("ti")), 0.5)
      val est = pairs
        .join(sh.select(col("doc_id").as("i"), col("sig").as("si")), "i")
        .join(sh.select(col("doc_id").as("j"), col("sig").as("sj")), "j")
        .select(col("jac"),
          expr("aggregate(zip_with(si, sj, (a, b) ->" +
            " CASE WHEN a = b THEN 1 ELSE 0 END), 0, (acc, x) -> acc + x)")
            .as("k_eq"),
          expr("aggregate(zip_with(si, sj, (a, b) ->" +
            " CASE WHEN a % 2 = b % 2 THEN 1 ELSE 0 END), 0," +
            " (acc, x) -> acc + x)").as("k_bit"))
        .select(col("jac"),
          (col("k_eq").cast("double") / 24.0).as("full_est"),
          greatest(lit(0.0),
            lit(2.0) * col("k_bit").cast("double") / 24.0 - 1.0)
            .as("bbit_est"))
      val out = est
        .groupBy(round(col("jac"), 1).as("jac_bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(abs(col("full_est") - col("jac"))), 3).as("mae_full"),
          round(avg(abs(col("bbit_est") - col("jac"))), 3).as("mae_bbit"))
        .orderBy("jac_bucket")
        .localCheckpoint()
      sh.unpersist()
      out
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents),
           |ti AS (SELECT doc_id, g,
           |  list_transform(g, t -> CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT)) tints FROM toks),
           |sig AS (SELECT doc_id, g, tints, list_transform(range(0,24), h ->
           |  list_min(list_transform(tints, t -> (t*(2*h+1) + h*1000000007 + 12345) % 2147483647))) s
           |  FROM ti),
           |bands AS (SELECT doc_id, b.b AS band,
           |  s[3*b.b+1]::VARCHAR||','||s[3*b.b+2]::VARCHAR||','||s[3*b.b+3]::VARCHAR AS key
           |  FROM sig, range(0,8) b(b)),
           |cand AS (SELECT DISTINCT a.doc_id i, c.doc_id j
           |  FROM bands a JOIN bands c ON a.band=c.band AND a.key=c.key AND a.doc_id < c.doc_id),
           |tset AS (SELECT doc_id, list_distinct(tints) ti FROM ti),
           |ver AS (SELECT i, j,
           |  len(list_filter(x.ti, e -> list_contains(y.ti, e)))::DOUBLE /
           |  (len(x.ti)+len(y.ti)-len(list_filter(x.ti, e -> list_contains(y.ti, e)))) jac
           |  FROM cand JOIN tset x ON x.doc_id=i JOIN tset y ON y.doc_id=j),
           |pairs AS (SELECT i, j, jac FROM ver WHERE jac >= 0.5),
           |est AS (
           |  SELECT p.jac,
           |    list_sum(list_transform(range(1, 25), h ->
           |      CASE WHEN a.s[h] = b.s[h] THEN 1 ELSE 0 END))::DOUBLE / 24.0
           |      AS full_est,
           |    greatest(0.0,
           |      2.0 * list_sum(list_transform(range(1, 25), h ->
           |        CASE WHEN a.s[h] % 2 = b.s[h] % 2 THEN 1 ELSE 0 END
           |      ))::DOUBLE / 24.0 - 1.0) AS bbit_est
           |  FROM pairs p JOIN sig a ON a.doc_id = p.i
           |    JOIN sig b ON b.doc_id = p.j)
           |SELECT round(jac, 1) AS jac_bucket,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  round(avg(abs(full_est - jac)), 3) AS mae_full,
           |  round(avg(abs(bbit_est - jac)), 3) AS mae_bbit
           |FROM est GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Greedy maximum-coverage source selection (the (1 − 1/e)-approximate
    * greedy of Nemhauser, Wolsey & Fisher 1978) — the data-curation
    * question "which 5 sources buy the most n-gram coverage?", the
    * submodular shape behind corpus source selection and dedup-aware
    * acquisition. Coverage units are distinct word TRIGRAMS (the unigram
    * vocabulary saturates after one pick on any corpus — trigram space is
    * where sources genuinely differ); each step picks the source adding
    * the most uncovered trigrams (ties to the smaller source id), and
    * saturated steps legitimately pick a zero-gain source (the left join
    * keeps them rankable instead of vanishing in the anti join).
    *
    * Determinism: marginal gains are exact distinct counts. One
    * distributed pass folds each gram's containing sources into a BIGINT
    * bitmask (bit_or) and counts grams per mask; the 5-step greedy then
    * replays on the driver over that bounded (mask, cnt) table with
    * integer math — identical picks and counts to the stepwise
    * frame-side anti-join it replaced. The oracle unrolls the 5 steps as
    * materialized CTE levels.
    *
    * Short documents are guarded: a text with < 3 words contributes no
    * trigrams (`CASE WHEN size(ws) >= 3`), matching the oracle's empty
    * `generate_series(1, len - 2)` — without the guard Spark's
    * `sequence(0, size - 3)` would DESCEND for start > stop and
    * `slice(ws, 0, 3)` would throw (SQL arrays are 1-based).
    *
    * Scale shape: ONE corpus pass (explode → per-gram bit_or → per-mask
    * count), one bounded collect of min(2^|sources|, |vocab|) rows; the
    * greedy itself is driver arithmetic — no per-step jobs, never a
    * growing frame.
    */
  val q339MaxCoverage = GraftQuery(
    "q339_max_coverage",
    (s, dir) => {
      // r14 optimization (guide §2.4 + §5): the stepwise frame-side greedy
      // (distinct+persist, a vocab count, a source collect, then 5×
      // anti-join+agg+collect and 4× covered-increment localCheckpoints —
      // ~14 driver-sequenced jobs) collapses to ONE distributed pass: per
      // gram, bit_or the sources containing it into a bitmask, then count
      // grams per mask and collect that bounded frame. Every step-k gain
      // is Σ cnt over masks containing the source and no picked source —
      // an exact distinct-gram count — so the driver replays the identical
      // greedy with integer math: same picks, same counts, bit-identical
      // output (the oracle CTEs are unchanged). Driver state is
      // min(2^|sources|, |vocab|) rows — source-combination-bounded, NOT
      // corpus-bounded (sources are a curated handful by construction; the
      // previous shape already collected per-source rows every step).
      // Sources with >= 1 trigram == sources with >= 1 doc of >= 3 words
      // (cheap pass over documents, no explode), sorted ascending. NOTE:
      // JVM String ordering (UTF-16 code units) and Spark's frame-side
      // UTF-8 binary ordering diverge only for strings containing
      // supplementary-plane characters; source names are fixture-ASCII
      // ("web-crawl" etc. — TESTDATA.md), where the two orders coincide.
      // If sources ever go non-ASCII, sort by UTF-8 byte comparator here.
      val docs = Tables.documents(s, dir)
        .select(col("source"), split(col("text"), " ").as("ws"))
      val allSources = docs.filter(size(col("ws")) >= 3)
        .select("source").distinct()
        .collect().map(_.getString(0)).sorted
      require(allSources.length <= 62,
        "q339 bitmask greedy packs sources into one BIGINT (<= 62 sources)")
      val srcIdx: Map[String, Int] = allSources.zipWithIndex.toMap
      val srcBit: Map[String, Long] =
        srcIdx.map { case (sc, i) => sc -> (1L << i) }
      val byMask = docs
        .select(
          element_at(typedLit(srcBit), col("source")).as("bit"),
          explode(expr(
            """CASE WHEN size(ws) >= 3 THEN
              |  transform(sequence(0, size(ws) - 3),
              |    i -> concat_ws(' ', slice(ws, i + 1, 3)))
              |ELSE array() END""".stripMargin))
            .as("w"))
        .groupBy("w").agg(bit_or(col("bit")).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val vocab = byMask.map(_._2).sum
      var pickedBits = 0L
      var picked = Vector.empty[String]
      val steps = scala.collection.mutable.ArrayBuffer[
        (Int, String, Long, Long)]()
      var cumulative = 0L
      for (step <- 1 to 5) {
        // gain(src) = exact count of distinct grams containing src and no
        // already-picked source; maxBy keeps the FIRST maximum over the
        // ascending-sorted candidates = (gain desc, source asc), the same
        // pick order as the replaced frame-side argmax and the oracle
        val (src, gain) = allSources.filterNot(picked.contains)
          .map { sc =>
            val bit = 1L << srcIdx(sc)
            sc -> byMask.iterator.collect {
              case (m, c) if (m & bit) != 0 && (m & pickedBits) == 0 => c
            }.sum
          }
          .maxBy(_._2)
        picked :+= src
        pickedBits |= 1L << srcIdx(src)
        cumulative += gain
        steps += ((step, src, gain, cumulative))
      }
      import s.implicits._
      steps.toSeq.toDF("step", "source", "newly_covered", "cum_covered")
        .select(col("step"), col("source"), col("newly_covered"),
          col("cum_covered"),
          round(col("cum_covered").cast("double") / vocab.toDouble, 6)
            .as("coverage_share"))
        .orderBy("step")
    },
    Some {
      def lvl(k: Int): String = {
        val prevSel = (1 until k).map(i => s"SELECT source FROM sel$i")
          .mkString(" UNION ALL ")
        val prevCov = (1 until k).map(i =>
          s"SELECT w FROM sw WHERE source IN (SELECT source FROM sel$i)")
          .mkString(" UNION ALL ")
        val notPicked =
          if (k == 1) "" else s"WHERE source NOT IN ($prevSel)"
        val notCovered =
          if (k == 1) "" else s"AND w NOT IN ($prevCov)"
        s"""sel$k AS MATERIALIZED (
           |  SELECT $k AS step, s.source,
           |    CAST(coalesce(g.gain, 0) AS BIGINT) AS gain
           |  FROM (SELECT DISTINCT source FROM sw $notPicked) s
           |  LEFT JOIN (
           |    SELECT source, count(*) AS gain FROM sw
           |    ${if (k == 1) "" else s"WHERE source NOT IN ($prevSel) $notCovered"}
           |    GROUP BY source) g ON g.source = s.source
           |  ORDER BY gain DESC, s.source LIMIT 1)"""
          .stripMargin
      }
      s"""WITH sw AS MATERIALIZED (
         |  SELECT DISTINCT source,
         |    unnest([array_to_string(ws[i : i + 2], ' ')
         |            FOR i IN generate_series(1, len(ws) - 2)]) AS w
         |  FROM (SELECT source, string_split(text, ' ') AS ws
         |        FROM documents)),
         |vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM sw),
         |${lvl(1)},
         |${lvl(2)},
         |${lvl(3)},
         |${lvl(4)},
         |${lvl(5)},
         |allsel AS (
         |  SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
         |  UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
         |  UNION ALL SELECT * FROM sel5),
         |cum AS (
         |  SELECT step, source, gain AS newly_covered,
         |    CAST(sum(gain) OVER (ORDER BY step) AS BIGINT) AS cum_covered
         |  FROM allsel)
         |SELECT CAST(step AS INT) AS step, source, newly_covered,
         |  cum_covered,
         |  round(CAST(cum_covered AS DOUBLE) / CAST(v AS DOUBLE), 6)
         |    AS coverage_share
         |FROM cum, vocab ORDER BY step""".stripMargin
    })

  /** Neyman-optimal sample allocation (Neyman 1934) of a 1000-item
    * labeling budget across source strata, with largest-remainder
    * (Hamilton) apportionment — the survey-sampling answer to "where do
    * my annotation dollars buy the most variance reduction": n_h ∝
    * N_h·σ_h, so big AND internally-diverse sources get labeled more.
    *
    * Exactness chain: N_h·σ_h = √(N_h·Σx² − (Σx)²) — the radicand K_h is
    * an exact DECIMAL(38,0) integer (the squares overflow BIGINT at
    * corpus scale); the ONLY float step is one correctly-rounded IEEE
    * sqrt + multiply + floor per stratum, quantizing the weight to an
    * integer w_h = ⌊√K_h·10⁶⌋ identical on both engines. Everything
    * after is integer: quotas B·w_h div W, remainders B·w_h mod W ranked
    * descending (ties to the smaller source) for the leftover seats —
    * Hamilton's method verbatim, so Σ alloc = B EXACTLY (spec-pinned),
    * never the ±1 drift of independently rounded shares.
    *
    * Scale shape: ONE corpus partial-agg groupBy to (N, Σx, Σx²) per
    * stratum; apportionment runs on the ≤|sources| aggregate (the rank
    * window there is post-aggregate and bounded, whitelisted with that
    * bound). Display columns (sd, share) are the only doubles emitted.
    */
  val q340NeymanAllocation = GraftQuery(
    "q340_neyman_allocation",
    (s, dir) => {
      val budget = 1000L
      val agg = Tables.documents(s, dir)
        .select(col("source"), col("n_chars").cast("decimal(38,0)").as("x"))
        .groupBy("source")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum("x").as("sx"), sum(expr("x * x")).as("sxx"))
        .select(col("source"), col("n"),
          expr("n * sxx - sx * sx").as("k"))
      val w = agg.select(col("source"), col("n"),
        floor(sqrt(col("k").cast("double")) * 1e6).cast("long").as("w"),
        round(sqrt(col("k").cast("double")) / col("n").cast("double"), 4)
          .as("sd"))
      val tot = w.agg(sum("w").as("bigw"))
      val quotas = w.crossJoin(broadcast(tot))
        .select(col("source"), col("n").cast("long").as("n_docs"), col("sd"),
          expr(s"CAST(($budget * CAST(w AS DECIMAL(38,0))) div" +
            " CAST(bigw AS DECIMAL(38,0)) AS BIGINT)").as("fl"),
          expr(s"CAST(pmod($budget * CAST(w AS DECIMAL(38,0))," +
            " CAST(bigw AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("rem"),
          round(col("w").cast("double") / col("bigw").cast("double"), 6)
            .as("share"))
      val byRem = Window.orderBy(desc("rem"), col("source"))
      val leftover = quotas.agg((lit(budget) - sum("fl")).as("r"))
      quotas.crossJoin(broadcast(leftover))
        .withColumn("rk", row_number().over(byRem))
        .select(col("source"), col("n_docs"), col("sd"), col("share"),
          (col("fl") + when(col("rk") <= col("r"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy("source")
    },
    Some("""WITH agg AS (
           |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
           |    CAST(sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
           |      AS HUGEINT) AS sxx
           |  FROM documents GROUP BY 1),
           |w AS (
           |  SELECT source, n,
           |    CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * 1e6)
           |      AS BIGINT) AS w,
           |    round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
           |      / CAST(n AS DOUBLE), 4) AS sd
           |  FROM agg),
           |tot AS (SELECT CAST(sum(w) AS HUGEINT) AS bigw FROM w),
           |quotas AS (
           |  SELECT source, CAST(n AS BIGINT) AS n_docs, sd,
           |    CAST((1000 * CAST(w AS HUGEINT)) // bigw AS BIGINT) AS fl,
           |    (1000 * CAST(w AS HUGEINT)) % bigw AS rem,
           |    round(CAST(w AS DOUBLE) / CAST(bigw AS DOUBLE), 6) AS share
           |  FROM w, tot),
           |lo AS (SELECT 1000 - CAST(sum(fl) AS BIGINT) AS r FROM quotas),
           |rk AS (
           |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
           |  FROM quotas)
           |SELECT source, n_docs, sd, share,
           |  CAST(fl + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
           |    AS alloc
           |FROM rk, lo ORDER BY source""".stripMargin))

  def all: Seq[GraftQuery] = Seq(
    q334TpchQ13, q335TpchQ15, q336TpchQ16, q337TpchQ22, q338BbitMinhash,
    q339MaxCoverage, q340NeymanAllocation)
}
