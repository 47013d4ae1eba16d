package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine query: a Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * fixtures. Queries with `oracle = None` get a weaker rows-only check from
  * the driver.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Fixture-table loaders. All test inputs are driver-generated parquet under
  * `sfDir` (see TESTDATA.md / FIXTURES.md); every query function receives the
  * scale-factor directory and loads through here so schema handling stays in
  * one place.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * parquet across fixture generations, so normalize by the type that
    * actually arrives: nanos (read as long — Spark's vectorized reader
    * rejects nanos timestamps) truncate to micros exactly like DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast; naive micros (TIMESTAMP_NTZ) cast to
    * TimestampType under the repo's fixed UTC session timezone (a pure
    * re-tag of the same micros value), so every downstream query sees one
    * stable TimestampType column either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
