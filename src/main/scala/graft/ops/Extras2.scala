package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Final surface fill-ins: ORC source/sink, RANGE window frames, and
  * order-normalized collect aggregation.
  */
object Extras2 {

  /** ORC sink → source round-trip (columnar format #2); oracle reads the
    * original parquet, proving the ORC path preserves data.
    */
  val q55OrcRoundtrip = GraftQuery(
    "q55_orc_roundtrip",
    (s, dir) => {
      val out = s"${sys.props("java.io.tmpdir")}/graft_orc/${dir.replaceAll("[^0-9a-zA-Z.]", "_")}"
      Tables.supplier(s, dir)
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("bal"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
           |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin))

  /** RANGE window frame: trailing 30-day spend per customer — a
    * value-range frame (not row-count), keyed on epoch microseconds.
    */
  val q56RangeFrame = GraftQuery(
    "q56_range_frame",
    (s, dir) => {
      val month = 30L * 24 * 3600 * 1000000 // 30 days in microseconds
      val w = Window.partitionBy("o_custkey").orderBy("us")
        .rangeBetween(-month, Window.currentRow)
      Tables.orders(s, dir)
        // o_orderdate arrives as TIMESTAMP_NTZ; UTC session makes the cast
        // value-preserving, matching DuckDB's epoch_us
        .withColumn("us", unix_micros(col("o_orderdate").cast("timestamp")))
        .withColumn("trailing_30d", round(sum("o_totalprice").over(w), 2))
        .withColumn("trailing_n", count(lit(1)).over(w))
        .select("o_custkey", "o_orderkey", "trailing_30d", "trailing_n")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  round(sum(o_totalprice) OVER w, 2) AS trailing_30d,
           |  count(*) OVER w AS trailing_n
           |FROM (SELECT *, epoch_us(o_orderdate) us FROM orders) t
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY us
           |  RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Collect aggregation normalized to deterministic order: the distinct
    * event types each user produced, as a sorted joined string (collect_set
    * order is engine/run-dependent; sort_array fixes it).
    */
  val q57CollectTypes = GraftQuery(
    "q57_collect_types",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
    Some("""SELECT user_id,
           |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
           |  count(*) AS n
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q55OrcRoundtrip, q56RangeFrame, q57CollectTypes)
}
