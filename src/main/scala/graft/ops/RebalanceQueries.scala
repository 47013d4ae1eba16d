package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.rebalance.Rebalancer

/** End-to-end rebalance verification queries: physically redistribute a
  * fixture table through [[Rebalancer]] (staging write + swap), read the
  * result back, and emit a distribution summary the DuckDB oracle can compute
  * directly from the ORIGINAL table — proving the redistribution preserved
  * the row multiset (the reference's core guarantee for its bulk
  * `INSERT INTO … SELECT *` rebalance, `sharding_recreation.py:159-160`).
  */
object RebalanceQueries {

  private def workDir(s: org.apache.spark.sql.SparkSession, sfDir: String,
      tag: String): String =
    graft.WorkDir.resolve(s, s"rebalance_$tag", sfDir)

  /** Hash-scatter lineitem into 8 shards on l_orderkey, then verify bucket
    * counts and quantity sums survive the move.
    */
  val q17RebalanceHash = GraftQuery(
    "q17_rebalance_hash",
    (s, dir) => {
      val dest = workDir(s, dir, "hash")
      Rebalancer.redistribute(Tables.lineitem(s, dir), Rebalancer.ByHash("l_orderkey"), 8, dest)
      s.read.parquet(dest)
        .groupBy(pmod(col("l_orderkey"), lit(8L)).as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("bucket")
    },
    Some("""SELECT l_orderkey % 8 AS bucket, count(*) AS n,
           |  round(sum(l_quantity), 2) AS sum_qty
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Range-partition orders into 4 shards on o_orderdate (sorted layout →
    * partition pruning on date predicates), verify monthly distribution.
    */
  val q18RebalanceRange = GraftQuery(
    "q18_rebalance_range",
    (s, dir) => {
      val dest = workDir(s, dir, "range")
      Rebalancer.redistribute(Tables.orders(s, dir), Rebalancer.ByRange("o_orderdate"), 4, dest)
      s.read.parquet(dest)
        .groupBy(date_format(date_trunc("year", col("o_orderdate")), "yyyy").as("year"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("year")
    },
    Some("""SELECT strftime(date_trunc('year', o_orderdate), '%Y') AS year,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS total
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Round-robin scatter (ClickHouse rand() sharding analogue): placement is
    * intentionally key-free, so the oracle checks multiset preservation via
    * content-independent aggregates.
    */
  val q51RebalanceRoundRobin = GraftQuery(
    "q51_rebalance_roundrobin",
    (s, dir) => {
      val dest = workDir(s, dir, "rr")
      Rebalancer.redistribute(Tables.customer(s, dir), Rebalancer.RoundRobin, 6, dest)
      s.read.parquet(dest)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"),
          round(sum("c_acctbal"), 2).as("bal_sum"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           |  round(sum(c_acctbal), 2) AS bal_sum
           |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Join-key skew report — the diagnostic a rebalance/partitioning
    * decision actually reads (choose hash vs range vs salted, size the salt
    * factor): per-key row counts for lineitem.l_partkey collapsed into one
    * summary row of n_keys, total rows, the hottest key's count and share,
    * the Gini coefficient of the key-count distribution (0 = perfectly
    * even, →1 = one hot key holds everything; computed from the ranked-sum
    * identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over counts sorted
    * ascending), and the derived salt factor ⌈max/avg⌉ that
    * [[graft.ops.Skew.saltedEquiJoin]] would need to level the hottest key.
    *
    * Scale: per-key counts are a partial-agg scan; everything after runs
    * over the KEY set (window rank by count, then one fold to a single
    * row) — key-cardinality-sized, never row-sized. Gini stays in integer
    * arithmetic (i·xᵢ sums of longs) until the final division, so both
    * engines agree bit-exactly; the two float outputs are one-division
    * per-row math, safe at 6 digits.
    */
  val q194SkewReport = GraftQuery(
    "q194_skew_report",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.lineitem(s, dir)
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .withColumn("i", row_number().over(
          Window.orderBy(col("cnt"), col("l_partkey"))))
      counts.agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("total_rows"),
        max("cnt").as("max_cnt"),
        sum(col("i") * col("cnt")).as("ranked_sum"))
        .select(col("n_keys"), col("total_rows"), col("max_cnt"),
          round(col("max_cnt").cast("double") / col("total_rows"), 6)
            .as("top_share"),
          round(lit(2.0) * col("ranked_sum") / (col("n_keys") * col("total_rows"))
            - (col("n_keys") + lit(1.0)) / col("n_keys"), 6).as("gini"),
          ceil(col("max_cnt") * col("n_keys").cast("double") / col("total_rows"))
            .cast("long").as("salt_factor"))
    },
    Some("""WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
           |r AS (SELECT cnt, l_partkey,
           |    row_number() OVER (ORDER BY cnt, l_partkey) AS i FROM c),
           |a AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |    CAST(sum(cnt) AS BIGINT) AS total_rows,
           |    CAST(max(cnt) AS BIGINT) AS max_cnt,
           |    CAST(sum(i * cnt) AS BIGINT) AS ranked_sum FROM r)
           |SELECT n_keys, total_rows, max_cnt,
           |  round(max_cnt::DOUBLE / total_rows, 6) AS top_share,
           |  round(2.0 * ranked_sum / (n_keys::DOUBLE * total_rows)
           |    - (n_keys + 1.0) / n_keys, 6) AS gini,
           |  CAST(ceil(max_cnt * n_keys::DOUBLE / total_rows) AS BIGINT) AS salt_factor
           |FROM a""".stripMargin))

  /** Consistent-hashing vs modulo migration cost for a shard expansion —
    * the quantitative argument BEHIND the reference's whole rebalance
    * workflow: growing 8 → 10 shards under modulo placement remaps
    * ~(1 − gcd-share) of all keys (every one of which the reference's
    * INSERT…SELECT pass must physically move), while a hash ring with 64
    * virtual nodes per shard remaps only ~2/10. Both placements compute
    * per order key: modulo is one pmod; ring ownership scans a SORTED
    * broadcast-literal vnode array (the ring is md5-derived in the driver
    * — 512/640 bounded literals — and the first vnode hash ≥ the key hash
    * owns it, wrapping to the ring's first entry). Output: key count,
    * moved counts and rates for both strategies. One scan, no joins —
    * the ring lookup is per-row array search against literals.
    */
  val q258ConsistentHashMigration = GraftQuery(
    "q258_consistent_hash_migration",
    (s, dir) => {
      def md5Long(str: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(str.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
      }
      // ring: 64 virtual nodes per shard, position = md5(shard:vnode)
      def ring(nShards: Int): Seq[(Long, Int)] =
        (for (sh <- 0 until nShards; vn <- 0 until 64)
          yield (md5Long(s"${sh}_$vn"), sh)).sorted
      def ownerCol(r: Seq[(Long, Int)], kh: org.apache.spark.sql.Column) = {
        val arr = array(r.map { case (h, sh) =>
          struct(lit(h).as("h"), lit(sh).as("sh"))
        }: _*) // sorted ascending by hash
        // get() is null-on-empty (0-based), so the filtered array is
        // evaluated ONCE per row — a size() guard + element_at would run
        // the 512-entry filter twice (HOF trees get no subexpression reuse)
        val ge = filter(arr, e => e("h") >= kh)
        coalesce(get(ge, lit(0)).getField("sh"),
          element_at(arr, 1).getField("sh"))
      }
      val kh = conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val keys = Tables.orders(s, dir).select(col("o_orderkey"))
        .withColumn("kh", kh)
      keys
        .withColumn("mod8", pmod(col("o_orderkey"), lit(8)))
        .withColumn("mod10", pmod(col("o_orderkey"), lit(10)))
        .withColumn("ring8", ownerCol(ring(8), col("kh")))
        .withColumn("ring10", ownerCol(ring(10), col("kh")))
        .agg(count(lit(1)).as("n_keys"),
          sum((col("mod8") =!= col("mod10")).cast("long")).as("moved_modulo"),
          sum((col("ring8") =!= col("ring10")).cast("long")).as("moved_ring"))
        .select(col("n_keys"), col("moved_modulo"), col("moved_ring"),
          round(col("moved_modulo") / col("n_keys").cast("double"), 6)
            .as("modulo_rate"),
          round(col("moved_ring") / col("n_keys").cast("double"), 6)
            .as("ring_rate"))
    },
    Some("""WITH vn8 AS (SELECT s.s AS sh,
           |    CAST(concat('0x', substr(md5(s.s::VARCHAR || '_' || v.v::VARCHAR), 1, 8)) AS BIGINT) AS h
           |  FROM range(0, 8) s(s), range(0, 64) v(v)),
           |vn10 AS (SELECT s.s AS sh,
           |    CAST(concat('0x', substr(md5(s.s::VARCHAR || '_' || v.v::VARCHAR), 1, 8)) AS BIGINT) AS h
           |  FROM range(0, 10) s(s), range(0, 64) v(v)),
           |k AS (SELECT o_orderkey,
           |    CAST(concat('0x', substr(md5(o_orderkey::VARCHAR), 1, 8)) AS BIGINT) AS kh
           |  FROM orders),
           |own8 AS (SELECT o_orderkey, coalesce(
           |    (SELECT min_by(sh, h) FROM vn8 WHERE h >= kh),
           |    (SELECT min_by(sh, h) FROM vn8)) AS ring8
           |  FROM k),
           |own10 AS (SELECT o_orderkey, coalesce(
           |    (SELECT min_by(sh, h) FROM vn10 WHERE h >= kh),
           |    (SELECT min_by(sh, h) FROM vn10)) AS ring10
           |  FROM k)
           |SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(sum(CAST(k.o_orderkey % 8 <> k.o_orderkey % 10 AS INT)) AS BIGINT)
           |    AS moved_modulo,
           |  CAST(sum(CAST(own8.ring8 <> own10.ring10 AS INT)) AS BIGINT)
           |    AS moved_ring,
           |  round(sum(CAST(k.o_orderkey % 8 <> k.o_orderkey % 10 AS INT))
           |    / count(*)::DOUBLE, 6) AS modulo_rate,
           |  round(sum(CAST(own8.ring8 <> own10.ring10 AS INT))
           |    / count(*)::DOUBLE, 6) AS ring_rate
           |FROM k JOIN own8 USING (o_orderkey) JOIN own10 USING (o_orderkey)""".stripMargin))

  /** Rendezvous (highest-random-weight) hashing placement audit (Thaler &
    * Ravishankar 1998) vs naive mod-N, under a shard-count change 8 → 9 —
    * the reference tool's whole reason to exist is that its cluster uses
    * mod-N placement, which moves ~N/(N+1) of ALL rows on every resize
    * (`sharding_recreation.py` rebuilds entire tables); HRW moves exactly
    * the keys whose argmax flips to the NEW shard, ≈ 1/(N+1), with no ring
    * state at all (each owner is argmax over per-shard hashes). This query
    * measures both strategies' movement and the post-resize load spread on
    * the same key population, quantifying what the reference's full-table
    * rebuild wastes.
    *
    * Determinism: shard weights are 60-bit md5-derived BIGINTs (the q176
    * `conv`/`0x` pairing), the argmax is a first-match CASE over
    * greatest(...) so any (astronomically unlikely) tie resolves to the
    * smallest shard id identically on both engines, and counts are exact —
    * the only doubles are the two final display divisions.
    *
    * Scale shape: pure map-side expression work per key (N+1 hashes), two
    * partial-agg groupBys (movement flags, per-shard loads), a 2-row
    * output. No join, no window, no shuffle wider than the shard-id key.
    */
  val q329RendezvousPlacement = {
    // per-shard weight columns are materialized ONCE (h0..h8), so the
    // argmax CASE never re-derives an md5 — no reliance on subexpression
    // elimination for the ~N² hash references a naive inline form has
    def argmax(n: Int): String = {
      val g = (0 until n).map(s => s"h$s").mkString("greatest(", ", ", ")")
      (0 until n).map(s => s"WHEN h$s = $g THEN $s")
        .mkString("CASE ", " ", " END")
    }
    GraftQuery(
      "q329_rendezvous_placement",
      (s, dir) => {
        val hashed = Tables.customer(s, dir)
          .select(col("c_custkey").as("k")).distinct()
          .select(col("k") +: (0 until 9).map(sh =>
            expr(s"CAST(conv(substr(md5(concat_ws('_', CAST(k AS STRING)," +
              s" '$sh')), 1, 15), 16, 10) AS BIGINT)").as(s"h$sh")): _*)
        val keys = hashed.select(col("k"),
            pmod(col("k"), lit(8)).as("mod_old"),
            pmod(col("k"), lit(9)).as("mod_new"),
            expr(argmax(8)).as("hrw_old"),
            expr(argmax(9)).as("hrw_new"))
          .persist()
        def audit(name: String, oldC: String, newC: String) = {
          val loads = keys.groupBy(col(newC).as("shard"))
            .agg(count(lit(1)).as("cnt"))
            .agg(min("cnt").as("min_load"), max("cnt").as("max_load"))
          keys.agg(count(lit(1)).as("n_keys"),
              sum(when(col(oldC) =!= col(newC), 1L).otherwise(0L))
                .as("n_moved"))
            .crossJoin(broadcast(loads))
            .select(lit(name).as("strategy"), col("n_keys"), col("n_moved"),
              round(col("n_moved").cast("double") /
                col("n_keys").cast("double"), 6).as("moved_frac"),
              col("min_load"), col("max_load"))
        }
        val out = audit("hrw", "hrw_old", "hrw_new")
          .unionAll(audit("mod", "mod_old", "mod_new"))
          .orderBy("strategy")
          .localCheckpoint()
        keys.unpersist()
        out
      },
      Some(s"""WITH k AS (
              |  SELECT DISTINCT c_custkey AS k FROM customer),
              |hashed AS (
              |  SELECT k, ${(0 until 9).map(sh =>
                  s"CAST(concat('0x', substr(md5(concat(k, '_', '$sh')), 1, 15)) AS BIGINT) AS h$sh")
                  .mkString(",\n              |    ")}
              |  FROM k),
              |placed AS (
              |  SELECT k, k % 8 AS mod_old, k % 9 AS mod_new,
              |    ${argmax(8)} AS hrw_old,
              |    ${argmax(9)} AS hrw_new
              |  FROM hashed),
              |audit AS (
              |  SELECT 'hrw' AS strategy,
              |    CAST(count(*) AS BIGINT) AS n_keys,
              |    CAST(sum(CASE WHEN hrw_old <> hrw_new THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_moved
              |  FROM placed
              |  UNION ALL
              |  SELECT 'mod', CAST(count(*) AS BIGINT),
              |    CAST(sum(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
              |      AS BIGINT)
              |  FROM placed),
              |loads AS (
              |  SELECT 'hrw' AS strategy, CAST(min(cnt) AS BIGINT) min_load,
              |    CAST(max(cnt) AS BIGINT) max_load
              |  FROM (SELECT hrw_new, count(*) cnt FROM placed GROUP BY 1)
              |  UNION ALL
              |  SELECT 'mod', CAST(min(cnt) AS BIGINT),
              |    CAST(max(cnt) AS BIGINT)
              |  FROM (SELECT mod_new, count(*) cnt FROM placed GROUP BY 1))
              |SELECT a.strategy, n_keys, n_moved,
              |  round(CAST(n_moved AS DOUBLE) / CAST(n_keys AS DOUBLE), 6)
              |    AS moved_frac,
              |  min_load, max_load
              |FROM audit a JOIN loads l ON l.strategy = a.strategy
              |ORDER BY a.strategy""".stripMargin))
  }

  val all: Seq[GraftQuery] =
    Seq(q17RebalanceHash, q18RebalanceRange, q51RebalanceRoundRobin,
      q194SkewReport, q258ConsistentHashMigration, q329RendezvousPlacement)
}
