package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator inventory (one entry per operator
  * from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry. Column names/aliases match exactly on both sides —
  * the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** All registered engine queries, grouped by module. */
  def allQueries: Seq[GraftQuery] =
    ops.Relational.all ++ ops.RebalanceQueries.all ++ ops.Text.all ++
      ops.Dedup.all ++ ops.Vectors.all ++ ops.Multimodal.all ++
      ops.StreamingQueries.all ++ ops.Aggregates.all ++ ops.Extras.all ++
      ops.Stats.all ++ ops.Chunking.all ++ ops.Pipeline.all ++ ops.Extras2.all ++
      ops.CustomPlans.all ++ ops.Extras3.all ++ ops.Layout.all ++ ops.Extras4.all ++
      ops.Sketches.all ++ ops.Quality.all ++ ops.Graph.all ++ ops.Hygiene.all ++
      ops.Upsert.all ++ ops.Extras5.all ++ ops.TypedOps.all ++ ops.Retrieval.all ++
      ops.Extras6.all ++ ops.Html.all ++ ops.Warc.all ++ ops.Robots.all ++
      ops.MpegAudioQueries.all ++ ops.RleVideoQueries.all ++
      ops.MpegVideoQueries.all ++ ops.MpegL3Queries.all ++
      ops.Training.all ++ ops.Encoding.all ++ ops.AudioFpQueries.all ++
      ops.SceneCutQueries.all ++ ops.Spectral.all ++ ops.Extras7.all ++
      ops.Unigram.all ++ ops.ExactSpans.all ++ ops.Capstone.all ++
      ops.Extras8.all ++ ops.Extras9.all ++ ops.Extras10.all ++
      ops.MediaCapstone.all ++ ops.LinkageEm.all ++ ops.TpchRemainder.all ++
      ops.Curation12.all ++ ops.Eval12.all ++ ops.Lexical12.all ++
      ops.Vector13.all ++ ops.Pipeline13.all ++ ops.Text13.all ++
      ops.Stats13.all ++ ops.Extras13.all ++ ops.Linkage13.all ++
      ops.Graph13.all ++ ops.Spatial13.all ++ ops.Stats13b.all ++
      ops.Quality13.all ++ ops.Stats13c.all ++ ops.Layout13b.all ++
      ops.Phonetic13.all ++ ops.TextModel13.all ++ ops.Survival13.all ++
      ops.Stats13d.all ++ ops.Ewma13.all ++ ops.Dedup13.all ++
      ops.Ts13.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
