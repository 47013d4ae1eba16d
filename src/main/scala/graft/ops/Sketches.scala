package graft.ops

import org.apache.spark.sql.Column
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

  val all: Seq[GraftQuery] = Seq(q94CmsFreq, q95BloomMembership)
}
