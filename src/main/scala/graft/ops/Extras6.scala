package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Sixth extras batch: arg-extreme aggregates (min_by/max_by) and the array
  * function long tail.
  */
object Extras6 {

  /** min_by / max_by with an explicit struct tie-break: "which event carried
    * the extreme value" is the arg-extreme pattern behind every
    * top-offender / best-example report. Spark's bare max_by(x, y) is
    * nondeterministic under ties, so the ordering key is (value, event_id) —
    * a total order. DuckDB 1.0's arg_max can't take a composite ordering
    * key, so the oracle expresses the same total order with row_number.
    */
  val q115ArgExtremes = GraftQuery(
    "q115_arg_extremes",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("max_by(event_id, struct(value, event_id))").as("top_id"),
          expr("min_by(event_id, struct(value, event_id))").as("bot_id"),
          round(max("value"), 2).as("max_value"),
          round(min("value"), 2).as("min_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""WITH ranked AS (
           |  SELECT event_type, event_id, value,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value DESC, event_id DESC) AS rt,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value ASC, event_id ASC) AS rb
           |  FROM events)
           |SELECT event_type,
           |  max(CASE WHEN rt = 1 THEN event_id END) AS top_id,
           |  max(CASE WHEN rb = 1 THEN event_id END) AS bot_id,
           |  round(max(value), 2) AS max_value,
           |  round(min(value), 2) AS min_value,
           |  count(*) AS n
           |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Array-function long tail over tokenized text: distinct+sort, slicing,
    * membership, size, and sequence generation — the building blocks the
    * dedup/chunking pipelines compose, exercised here as first-class
    * columns. All outputs are canonically ordered (sorted arrays) so the
    * cross-engine compare is exact.
    */
  val q116ArrayFuncs = GraftQuery(
    "q116_array_funcs",
    (s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          array_sort(array_distinct(toks)).as("vocab"),
          slice(array_sort(array_distinct(toks)), 1, 3).as("first3"),
          size(toks).cast("long").as("n_tokens"),
          array_contains(toks, "query").as("has_kw"),
          sequence(lit(1L), least(size(toks).cast("long"), lit(3L))).as("idx_seq"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  list_sort(list_distinct(string_split(text, ' '))) AS vocab,
           |  list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3) AS first3,
           |  len(string_split(text, ' ')) AS n_tokens,
           |  list_contains(string_split(text, ' '), 'query') AS has_kw,
           |  generate_series(1, least(len(string_split(text, ' ')), 3)) AS idx_seq
           |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q115ArgExtremes, q116ArrayFuncs)
}
