package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-13 storage-layout continuation: the per-column lightweight-
  * encoding advisor a columnar engine's writer runs when choosing between
  * PLAIN, dictionary, and frame-of-reference/bit-packed layouts (Abadi et
  * al. 2006 "Integrating Compression and Execution"; the parquet/ORC
  * encoding decision) — the complement of the engine's existing PHYSICAL
  * layout family (q93 z-order, q187 compaction, q298 zone maps): those
  * choose row placement, this chooses the byte layout within a column
  * chunk.
  */
object Layout13b {

  /** q393 — encoding advisor over eight lineitem columns (keys, line
    * number, quantity, price cents, discount percent, plus a derived
    * snowflake-style `sparse_wide_id` — 16 distinct values spread over a
    * 2⁴⁴ span, the "few IDs from a wide domain" shape where dictionary
    * beats bit-packing): for each column,
    * exact n / NDV / min / max from one unpivoted scan, then the three
    * candidate sizes in EXACT BYTES —
    *
    *   plain = 8n (64-bit values);
    *   FOR   = ⌈n·bits(max−min)⌉/8 bit-packed offsets from min
    *           (frame-of-reference);
    *   dict  = ⌈n·bits(NDV−1)⌉/8 codes + 8·NDV dictionary entries
    *
    * — where bits(v) = length(bin(v)) is the integer bit length both
    * engines evaluate without any float log2 (log2 at exact powers of two
    * is the classic off-by-one trap; `bin` is string-exact). The
    * recommendation is the argmin with the deterministic tie order
    * for > dict > plain, and the savings share is the only float, rounded
    * at 6. The fixture exercises both winning regimes: tiny domains
    * (l_linenumber/l_quantity/l_discount → FOR at ≤6 bits/value), wide
    * near-dense keys (FOR at word-ish widths — bit-packing never loses
    * to plain on non-negative 64-bit values), and the sparse wide ID
    * (dict: 4-bit codes + a 16-entry dictionary vs 44-bit offsets).
    *
    * Scale shape: one projection scan fanned 7× by the unpivot stack —
    * map-side, no shuffle amplification beyond the (col, value) partial
    * agg — then exact-distinct aggregation per column name (≤7 groups
    * whose per-group state is the distinct-value set, shuffled as
    * (col, value) partials first — never a driver collect).
    */
  val q393EncodingAdvisor = GraftQuery(
    "q393_encoding_advisor",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("l_quantity"), 0).cast("long").as("qty"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("price_cents"),
        round(col("l_discount") * 100, 0).cast("long").as("disc_pct"),
        (pmod(col("l_suppkey"), lit(16)) * lit(1099511627776L) + 12345)
          .as("sparse_wide_id"))
      val unpivoted = li.select(expr(
        """stack(8,
          |  'l_orderkey', l_orderkey,
          |  'l_partkey', l_partkey,
          |  'l_suppkey', l_suppkey,
          |  'l_linenumber', l_linenumber,
          |  'l_quantity', qty,
          |  'l_price_cents', price_cents,
          |  'l_discount_pct', disc_pct,
          |  'sparse_wide_id', sparse_wide_id) AS (colname, v)""".stripMargin))
      val stats = unpivoted.groupBy("colname")
        .agg(count(lit(1)).as("n"),
          countDistinct("v").as("ndv"),
          min("v").as("minv"), max("v").as("maxv"))
      val bitsFor = when(col("maxv") === col("minv"), 0L)
        .otherwise(length(bin(col("maxv") - col("minv"))).cast("long"))
      val bitsDict = when(col("ndv") <= 1, 0L)
        .otherwise(length(bin(col("ndv") - 1)).cast("long"))
      val sized = stats
        .withColumn("bits_for", bitsFor)
        .withColumn("bits_dict", bitsDict)
        .withColumn("bytes_plain", lit(8L) * col("n"))
        .withColumn("bytes_for",
          expr("(n * bits_for + 7) div 8"))
        .withColumn("bytes_dict",
          expr("(n * bits_dict + 7) div 8") + lit(8L) * col("ndv"))
      sized.select(col("colname"), col("n"), col("ndv"),
        col("minv"), col("maxv"), col("bits_for"), col("bits_dict"),
        col("bytes_plain"), col("bytes_for"), col("bytes_dict"),
        when(col("bytes_for") <= col("bytes_plain") &&
          col("bytes_for") <= col("bytes_dict"), "for")
          .when(col("bytes_dict") < col("bytes_for") &&
            col("bytes_dict") <= col("bytes_plain"), "dict")
          .otherwise("plain").as("recommended"),
        round(lit(1.0) -
          least(col("bytes_plain"), col("bytes_for"), col("bytes_dict"))
            .cast("double") / col("bytes_plain").cast("double"), 6)
          .as("savings_share"))
        .orderBy("colname")
    },
    Some("""WITH src AS (
           |  SELECT l_orderkey, l_partkey, l_suppkey,
           |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
           |    CAST(round(l_quantity) AS BIGINT) AS qty,
           |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
           |    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
           |    (l_suppkey % 16) * 1099511627776 + 12345 AS sparse_wide_id
           |  FROM lineitem),
           |u AS (
           |  SELECT 'l_orderkey' AS colname, l_orderkey AS v FROM src
           |  UNION ALL SELECT 'l_partkey', l_partkey FROM src
           |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM src
           |  UNION ALL SELECT 'l_linenumber', l_linenumber FROM src
           |  UNION ALL SELECT 'l_quantity', qty FROM src
           |  UNION ALL SELECT 'l_price_cents', price_cents FROM src
           |  UNION ALL SELECT 'l_discount_pct', disc_pct FROM src
           |  UNION ALL SELECT 'sparse_wide_id', sparse_wide_id FROM src),
           |st AS (
           |  SELECT colname, CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           |    min(v) AS minv, max(v) AS maxv
           |  FROM u GROUP BY 1),
           |sized AS (
           |  SELECT colname, n, ndv, minv, maxv,
           |    CASE WHEN maxv = minv THEN 0
           |      ELSE CAST(length(bin(maxv - minv)) AS BIGINT) END
           |      AS bits_for,
           |    CASE WHEN ndv <= 1 THEN 0
           |      ELSE CAST(length(bin(ndv - 1)) AS BIGINT) END AS bits_dict,
           |    8 * n AS bytes_plain
           |  FROM st),
           |sz AS (
           |  SELECT *,
           |    (n * bits_for + 7) // 8 AS bytes_for,
           |    (n * bits_dict + 7) // 8 + 8 * ndv AS bytes_dict
           |  FROM sized)
           |SELECT colname, n, ndv, minv, maxv, bits_for, bits_dict,
           |  bytes_plain, bytes_for, bytes_dict,
           |  CASE WHEN bytes_for <= bytes_plain AND bytes_for <= bytes_dict
           |      THEN 'for'
           |    WHEN bytes_dict < bytes_for AND bytes_dict <= bytes_plain
           |      THEN 'dict'
           |    ELSE 'plain' END AS recommended,
           |  round(1.0 - CAST(least(bytes_plain, bytes_for, bytes_dict)
           |    AS DOUBLE) / CAST(bytes_plain AS DOUBLE), 6)
           |    AS savings_share
           |FROM sz ORDER BY colname""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q393EncodingAdvisor)
}
