package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Remaining SURVEY.md §2.2 surface: non-parquet source/sink round-trip,
  * as-of join, and map functions.
  */
object Extras {

  /** CSV sink → CSV source round-trip (schema-carrying columns only), then
    * aggregate — proves the non-parquet source/sink path preserves data.
    */
  val q39CsvRoundtrip = GraftQuery(
    "q39_csv_roundtrip",
    (s, dir) => {
      val out = graft.WorkDir.resolve(s, "csv", dir)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG")
        .csv(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"),
          min("doc_id").as("min_doc"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |  min(doc_id) AS min_doc
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** As-of join: for every error event, the most recent click of the same
    * user strictly before it — expressed as a carry-forward window (no
    * custom operator needed; stays sorted within user partitions).
    */
  val q40AsofJoin = GraftQuery(
    "q40_asof_join",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("last_click_us",
          last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("us").as("error_us"),
          col("last_click_us"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id, event_type,
           |    epoch_us(CAST(ts AS TIMESTAMP)) us FROM events),
           |m AS (
           |  SELECT user_id, event_id, event_type, us,
           |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY us, event_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
           |  FROM ev)
           |SELECT user_id, event_id, us AS error_us, last_click_us
           |FROM m WHERE event_type = 'error' ORDER BY user_id, event_id""".stripMargin))

  /** Map functions: literal lookup map routing event types to categories. */
  val q41MapLookup = GraftQuery(
    "q41_map_lookup",
    (s, dir) => {
      val categories = map(
        lit("click"), lit("engage"), lit("view"), lit("engage"),
        lit("purchase"), lit("convert"), lit("signup"), lit("convert"),
        lit("error"), lit("fault"))
      Tables.events(s, dir)
        .withColumn("category", coalesce(element_at(categories, col("event_type")), lit("other")))
        .groupBy("category")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("category")
    },
    Some("""SELECT CASE event_type
           |    WHEN 'click' THEN 'engage' WHEN 'view' THEN 'engage'
           |    WHEN 'purchase' THEN 'convert' WHEN 'signup' THEN 'convert'
           |    WHEN 'error' THEN 'fault' ELSE 'other' END AS category,
           |  count(*) AS n, round(sum(value), 2) AS total_value
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Multiset set operations (ALL variants keep duplicates). */
  val q46MultisetOps = GraftQuery(
    "q46_multiset_ops",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val highQty = li.filter(col("l_quantity") >= 25).select(col("l_suppkey").as("k"))
      val lowDisc = li.filter(col("l_discount") <= 0.05).select(col("l_suppkey").as("k"))
      highQty.exceptAll(lowDisc).withColumn("tag", lit("hq_minus_ld"))
        .unionAll(highQty.intersectAll(lowDisc).withColumn("tag", lit("both")))
        .groupBy("tag", "k").agg(count(lit(1)).as("n"))
        .orderBy("tag", "k")
    },
    Some("""SELECT tag, k, count(*) AS n FROM (
           |  SELECT 'hq_minus_ld' AS tag, k FROM (
           |    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25
           |    EXCEPT ALL
           |    SELECT l_suppkey AS k FROM lineitem WHERE l_discount <= 0.05) a
           |  UNION ALL
           |  SELECT 'both' AS tag, k FROM (
           |    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25
           |    INTERSECT ALL
           |    SELECT l_suppkey AS k FROM lineitem WHERE l_discount <= 0.05) b) t
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** JSON-lines sink → source round-trip with a from_json(StructType) parse
    * of the nested props payload.
    */
  val q48JsonRoundtrip = GraftQuery(
    "q48_json_roundtrip",
    (s, dir) => {
      // cluster-valid scratch (NOT driver-local tmp): see graft.WorkDir
      val out = graft.WorkDir.resolve(s, "json", dir)
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").json(out)
      s.read
        .schema("event_id LONG, event_type STRING, value DOUBLE, props STRING")
        .json(out)
        .withColumn("parsed", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("parsed.k")).as("sum_k"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           |  round(sum(value), 2) AS total_value
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q39CsvRoundtrip, q40AsofJoin, q41MapLookup, q46MultisetOps, q48JsonRoundtrip)
}
