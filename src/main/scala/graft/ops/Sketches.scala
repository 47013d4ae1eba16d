package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Sketch operators built compositionally from deterministic (md5-derived)
  * hashing, so every counter and bit is reproducible in any engine and the
  * DuckDB oracle checks them EXACTLY — unlike opaque HLL registers (q37),
  * these sketches are plain aggregations over hash buckets.
  *
  * Scale story: both sketches are one scan + a partial aggregation whose
  * state is the sketch size (d×w counters / m bits), independent of input
  * rows — the canonical 100 TB profile-then-prune building blocks.
  */
object Sketches {

  /** First 8 md5 hex chars of `s` as a non-negative int (same construction
    * as DuckDB's CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)).
    */
  private def md5Int(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Count-min sketch of part-key frequencies (depth 4 × width 256): each
    * row increments one counter per hash row; a key's estimate is the MIN of
    * its 4 counters — always ≥ the true count, with collisions only ever
    * inflating it. Built as explode(4 hash rows) → groupBy(row, bucket),
    * then 20 probe keys join the sketch and take their min counter next to
    * the exact count for an in-query error audit.
    */
  val q94CmsFreq = GraftQuery(
    "q94_cms_freq",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // pre-aggregate to distinct keys first: the 4-way hash explosion then
      // touches |keys| rows instead of |input| rows, and the counters are
      // identical (sum of per-key counts per bucket == raw row count)
      val freq = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      val sketch = freq
        .select(explode(sequence(lit(0), lit(3))).as("r"), col("l_partkey"), col("cnt"))
        .withColumn("bucket",
          md5Int(concat(col("r").cast("string"), lit("_"), col("l_partkey").cast("string"))) % 256)
        .groupBy("r", "bucket").agg(sum("cnt").as("c"))
      val probes = freq.filter(col("l_partkey") <= 20)
        .select(col("l_partkey"), col("cnt").as("exact"))
      val probeHashes = probes
        .select(col("l_partkey"), col("exact"),
          explode(sequence(lit(0), lit(3))).as("r"))
        .withColumn("bucket",
          md5Int(concat(col("r").cast("string"), lit("_"), col("l_partkey").cast("string"))) % 256)
      probeHashes.join(sketch, Seq("r", "bucket"))
        .groupBy("l_partkey", "exact").agg(min("c").as("cms_est"))
        .select(col("l_partkey"), col("exact"), col("cms_est"),
          (col("cms_est") - col("exact")).as("overcount"))
        .orderBy("l_partkey")
    },
    Some("""WITH sk AS (
           |  SELECT r.r, CAST(concat('0x', substr(md5(r.r::VARCHAR || '_' || l_partkey::VARCHAR), 1, 8)) AS BIGINT) % 256 AS bucket,
           |    count(*) AS c
           |  FROM lineitem, range(0, 4) r(r) GROUP BY 1, 2),
           |probes AS (SELECT l_partkey, count(*) AS exact FROM lineitem
           |  WHERE l_partkey <= 20 GROUP BY 1),
           |ph AS (SELECT p.l_partkey, p.exact, r.r,
           |    CAST(concat('0x', substr(md5(r.r::VARCHAR || '_' || p.l_partkey::VARCHAR), 1, 8)) AS BIGINT) % 256 AS bucket
           |  FROM probes p, range(0, 4) r(r))
           |SELECT ph.l_partkey, ph.exact, min(sk.c) AS cms_est,
           |  min(sk.c) - ph.exact AS overcount
           |FROM ph JOIN sk ON sk.r = ph.r AND sk.bucket = ph.bucket
           |GROUP BY 1, 2 ORDER BY 1""".stripMargin))

  /** Bloom-filter membership (k=3 hashes, m=4096 bits) built as data: the
    * filter is the DISTINCT (hash row, bit) set of urgent-order keys; a
    * probe key "might be present" iff all 3 of its bits are set — checked by
    * counting matched bits in a join. The result audits the filter against
    * exact membership: true positives, plus any false positives with their
    * bit collisions (none may be missed — Bloom filters never false-negate).
    */
  val q95BloomMembership = GraftQuery(
    "q95_bloom_membership",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val bits = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(explode(sequence(lit(0), lit(2))).as("r"), col("o_orderkey"))
        .select((md5Int(concat(col("r").cast("string"), lit("b"),
          col("o_orderkey").cast("string"))) % 4096).as("bit"))
        .distinct()
      val probes = o.filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          (col("o_orderpriority") === "1-URGENT").as("is_member"))
      val probeBits = probes
        .select(col("o_orderkey"), col("is_member"),
          explode(sequence(lit(0), lit(2))).as("r"))
        .select(col("o_orderkey"), col("is_member"),
          (md5Int(concat(col("r").cast("string"), lit("b"),
            col("o_orderkey").cast("string"))) % 4096).as("bit"))
      probeBits.join(bits, Seq("bit"), "left_semi")
        .groupBy("o_orderkey", "is_member").agg(count(lit(1)).as("bits_set"))
        .filter(col("bits_set") === 3)
        .groupBy("is_member")
        .agg(count(lit(1)).as("n_pass"))
        .orderBy("is_member")
    },
    Some("""WITH bits AS (
           |  SELECT DISTINCT CAST(concat('0x', substr(md5(r.r::VARCHAR || 'b' || o_orderkey::VARCHAR), 1, 8)) AS BIGINT) % 4096 AS bit
           |  FROM orders, range(0, 3) r(r) WHERE o_orderpriority = '1-URGENT'),
           |pb AS (
           |  SELECT o_orderkey, o_orderpriority = '1-URGENT' AS is_member,
           |    CAST(concat('0x', substr(md5(r.r::VARCHAR || 'b' || o_orderkey::VARCHAR), 1, 8)) AS BIGINT) % 4096 AS bit
           |  FROM orders, range(0, 3) r(r) WHERE o_orderkey <= 300),
           |hits AS (
           |  SELECT o_orderkey, is_member, count(*) AS bits_set
           |  FROM pb WHERE bit IN (SELECT bit FROM bits)
           |  GROUP BY 1, 2 HAVING count(*) = 3)
           |SELECT is_member, count(*) AS n_pass FROM hits
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** KMV (k-minimum-values) distinct sketch, k = 64: keep the k smallest
    * hash values of a set's distinct elements; the distinct count is
    * estimated as (k−1)·2³² / h_k (Bar-Yossef et al., Beyer et al.). Unlike
    * opaque HLL registers the sketch is plain rows, so it composes: the
    * UNION of two sets is sketched by the k smallest of the merged
    * sketches, and the INTERSECTION estimate is Jaccard-by-sketch
    * (|K(A∪B) ∩ K_A ∩ K_B| / k) times the union estimate — the classic
    * mergeable-summary trick for distinct-intersection without a rescan.
    *
    * Output: one row per order priority (exact distinct customers vs KMV
    * estimate) plus one URGENT∩HIGH intersection row in the same schema.
    *
    * Scale: the per-group k-min is a rank-≤-k window, which Spark's
    * InferWindowGroupLimit rewrites to a map-side partial top-k per group
    * (each task forwards at most k rows per group before the shuffle —
    * the same WindowGroupLimit shape q71/q72 pin). Everything downstream
    * of the sketches touches O(k) rows per set; only scalar estimates and
    * k-row sketch joins, nothing proportional to the corpus.
    */
  val q172KmvSketch = GraftQuery(
    "q172_kmv_sketch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val a = "1-URGENT"; val b = "2-HIGH"
      val el = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"), col("o_custkey").as("v"))
        .distinct().persist()
      val hashed = el.withColumn("h", md5Int(col("v").cast("string")))
      val sk = hashed
        .withColumn("rn", row_number().over(
          Window.partitionBy("grp").orderBy(col("h"), col("v"))))
        .filter(col("rn") <= 64).persist()
      val base = sk.groupBy("grp").agg(max("h").as("hk"))
        .join(el.groupBy("grp").agg(count(lit(1)).as("exact_dv")), "grp")
        .select(col("grp"), col("exact_dv"),
          round(lit(63.0) * lit(4294967296.0) / col("hk"), 3).as("kmv_est"))
      val uel = el.filter(col("grp").isin(a, b)).select("v").distinct()
      val usk = uel.withColumn("h", md5Int(col("v").cast("string")))
        .withColumn("rn", row_number().over(Window.orderBy(col("h"), col("v"))))
        .filter(col("rn") <= 64).persist()
      val udv = usk.agg(max("h").as("uhk"))
        .select((lit(63.0) * lit(4294967296.0) / col("uhk")).as("udv"))
      val rho = usk
        .join(sk.filter(col("grp") === a).select("v"), Seq("v"), "left_semi")
        .join(sk.filter(col("grp") === b).select("v"), Seq("v"), "left_semi")
        .agg(count(lit(1)).as("nboth"))
      val iexact = el.filter(col("grp") === a).select("v")
        .intersect(el.filter(col("grp") === b).select("v"))
        .agg(count(lit(1)).as("iex"))
      val irow = rho.crossJoin(udv).crossJoin(iexact)
        .select(lit("URGENT_x_HIGH").as("grp"), col("iex").as("exact_dv"),
          round(col("nboth") / lit(64.0) * col("udv"), 3).as("kmv_est"))
      base.unionAll(irow).orderBy("grp")
    },
    Some("""WITH el AS MATERIALIZED (
           |  SELECT DISTINCT o_orderpriority AS grp, o_custkey AS v FROM orders),
           |h AS (SELECT grp, v,
           |    CAST(concat('0x', substr(md5(v::VARCHAR), 1, 8)) AS BIGINT) AS h
           |  FROM el),
           |sk AS MATERIALIZED (SELECT grp, v, h FROM (
           |    SELECT grp, v, h,
           |      row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rn FROM h)
           |  WHERE rn <= 64),
           |base AS (
           |  SELECT sk.grp, ex.exact_dv,
           |    round(63.0 * 4294967296.0 / max(sk.h), 3) AS kmv_est
           |  FROM sk JOIN (SELECT grp, count(*) AS exact_dv FROM el GROUP BY 1) ex
           |    ON ex.grp = sk.grp
           |  GROUP BY 1, 2),
           |uel AS (SELECT DISTINCT v FROM el WHERE grp IN ('1-URGENT', '2-HIGH')),
           |usk AS MATERIALIZED (SELECT v, h FROM (
           |    SELECT v, CAST(concat('0x', substr(md5(v::VARCHAR), 1, 8)) AS BIGINT) AS h,
           |      row_number() OVER (ORDER BY CAST(concat('0x', substr(md5(v::VARCHAR), 1, 8)) AS BIGINT), v) AS rn
           |    FROM uel)
           |  WHERE rn <= 64),
           |rho AS (SELECT count(*) AS nboth FROM usk
           |  WHERE v IN (SELECT v FROM sk WHERE grp = '1-URGENT')
           |    AND v IN (SELECT v FROM sk WHERE grp = '2-HIGH')),
           |udv AS (SELECT 63.0 * 4294967296.0 / max(h) AS udv FROM usk),
           |iexact AS (SELECT count(*) AS iex FROM (
           |  SELECT v FROM el WHERE grp = '1-URGENT'
           |  INTERSECT SELECT v FROM el WHERE grp = '2-HIGH')),
           |irow AS (SELECT 'URGENT_x_HIGH' AS grp, iex AS exact_dv,
           |    round(nboth / 64.0 * udv, 3) AS kmv_est
           |  FROM rho, udv, iexact)
           |SELECT grp, exact_dv, kmv_est FROM
           |  (SELECT * FROM base UNION ALL SELECT * FROM irow)
           |ORDER BY grp""".stripMargin))

  /** Per-partition Misra-Gries candidate generation (Misra & Gries 1982;
    * the "frequent" / space-saving family): each partition keeps at most
    * `k` counters over its token stream — on a full table, an unseen token
    * decrements every counter and drops the zeros instead of entering.
    * The classic guarantee is per-partition: any term with partition
    * frequency > N_p/(k+1) still holds a counter at the end, and by
    * pigeonhole any GLOBAL term with frequency > N/(k+1) exceeds that
    * local bar in at least one partition — so the union of per-partition
    * survivors is a SUPERSET of the global heavy hitters, at O(parts·k)
    * candidate rows instead of one row per distinct term.
    */
  private[graft] def misraGriesCandidates(terms: DataFrame, k: Int): DataFrame = {
    val s = terms.sparkSession
    import s.implicits._
    terms.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counts.contains(t)) counts(t) += 1
        else if (counts.size < k) counts(t) = 1L
        else {
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.filterInPlace((_, c) => c > 0)
        }
      }
      counts.keysIterator
    }.toDF("term").distinct()
  }

  /** Exact corpus heavy hitters (tokens with frequency > N/200) through the
    * scale-right two-phase shape: a Misra-Gries candidate sweep
    * ([[misraGriesCandidates]], k = 512 ≥ the 200 the threshold needs, so
    * the superset guarantee holds with margin), then exact counts for the
    * candidates ONLY via a broadcast semi-join — the full token stream is
    * never globally grouped by term. The final exact filter makes the
    * output partition-independent (any MG false positives fail the exact
    * bar), which is what lets a deterministic oracle check a
    * partitioning-dependent sketch. HeavyHittersSpec pins the superset
    * property and the candidate-volume bound separately.
    */
  private[graft] def q189Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      val toks0 = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
      val toks = if (forPlan) toks0 else toks0.persist()
      val cands = misraGriesCandidates(toks, k = 512)
      val total = toks.agg(count(lit(1)).as("n"))
      val out = toks.join(broadcast(cands), Seq("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .crossJoin(total)
        .filter(col("cnt") * 200 > col("n"))
        .select(col("term"), col("cnt"))
        .orderBy(desc("cnt"), col("term"))
      if (forPlan) out
      else {
        // localCheckpoint, not count()+recompute: the verify/bench action
        // reads the materialized rows instead of re-executing the released plan
        val ckpt = out.localCheckpoint()
        toks.unpersist()
        ckpt
      }
  }

  val q189HeavyHitters = GraftQuery(
    "q189_heavy_hitters",
    (s, dir) => q189Df(s, dir),
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
           |n AS (SELECT count(*) AS n FROM t)
           |SELECT term, count(*) AS cnt FROM t, n
           |GROUP BY term, n.n HAVING count(*) * 200 > n.n
           |ORDER BY cnt DESC, term""".stripMargin))

  /** Bitmap-word distinct counting (the ClickHouse `groupBitmap` /
    * roaring-bitmap rollup shape): user ids pack into fixed-width words —
    * word = id div 63, bit = id mod 63 — aggregated per (event_type,
    * word) with bit_or, then popcounted. Unlike the KMV/HLL estimators
    * (q172 and friends) this is EXACT, and unlike count(DISTINCT) its
    * shuffle rows are (type, word) pairs whose cardinality is
    * id-range/63, not event count — the rollup that lets a 100 TB fact
    * table answer per-dimension distinct-user questions with bounded
    * intermediate state, and the bitmap words themselves are reusable
    * (union across dimensions = bit_or again, no rescan). 63-bit words,
    * not 64: both engines' checked BIGINT arithmetic rejects 1 << 63, and
    * a one-bit-narrower word costs 1.6% space for overflow-free parity.
    *
    * Domain assumption (cf. q320's signed-domain expansion): word/bit
    * decomposition pairs Spark's div/pmod (floor) with DuckDB's
    * truncating `//` and signed `%`, which only coincide for NON-NEGATIVE
    * ids — a negative user_id would mismatch word boundaries on Spark and
    * feed `<<` a negative shift (an error) in DuckDB. user_id is a
    * non-negative surrogate key by schema, so the assumption holds by
    * construction; a signed id domain would need the
    * (x − ((x % k + k) % k)) // k expansion on the oracle side.
    *
    * Everything is integer-exact: the audit column pins bitmap_dv ==
    * exact_dv on every row (popcount identity, also spec-pinned); density
    * is the one display division.
    *
    * Scale shape: one partial-agg groupBy to (type, word) bitmap words
    * (bit_or combines map-side), one groupBy to per-type popcount sums,
    * one broadcast-joined exact count(DISTINCT) for the audit. No joins
    * on the fact table, no windows.
    */
  val q332BitmapDistinct = GraftQuery(
    "q332_bitmap_distinct",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"))
      val words = ev
        .select(col("event_type"),
          expr("user_id div 63").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 63) AS INT))")
            .as("bit"))
        .groupBy("event_type", "word")
        .agg(expr("bit_or(bit)").as("bm"))
      val bitmap = words.groupBy("event_type")
        .agg(sum(bit_count(col("bm")).cast("long")).as("bitmap_dv"),
          count(lit(1)).as("n_words"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_dv"))
      bitmap.join(exact, "event_type")
        .select(col("event_type"), col("exact_dv"), col("bitmap_dv"),
          col("n_words"),
          round(col("bitmap_dv").cast("double") /
            (lit(63L) * col("n_words")).cast("double"), 6).as("density"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, user_id FROM events),
           |words AS (
           |  SELECT event_type, user_id // 63 AS word,
           |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS bm
           |  FROM ev GROUP BY 1, 2),
           |bitmap AS (
           |  SELECT event_type,
           |    CAST(sum(bit_count(bm)) AS BIGINT) AS bitmap_dv,
           |    CAST(count(*) AS BIGINT) AS n_words
           |  FROM words GROUP BY 1),
           |exact AS (
           |  SELECT event_type,
           |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_dv
           |  FROM ev GROUP BY 1)
           |SELECT event_type, exact_dv, bitmap_dv, n_words,
           |  round(CAST(bitmap_dv AS DOUBLE) /
           |    CAST(63 * n_words AS DOUBLE), 6) AS density
           |FROM bitmap JOIN exact USING (event_type)
           |ORDER BY event_type""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q94CmsFreq, q95BloomMembership, q172KmvSketch,
    q189HeavyHitters, q332BitmapDistinct)
}
