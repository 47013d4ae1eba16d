package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval (time-window) join.
  *
  * Spark plans a non-equi condition like
  * `r.t BETWEEN l.t - window AND l.t` as a broadcast-nested-loop join —
  * quadratic per key and only viable while one side broadcasts. The
  * standard scale rewrite is temporal bucketing: quantize time into cells
  * of the window width, equi-join on (key, cell) with each left row probing
  * its two covering cells, then refine with the exact predicate. The join
  * becomes a shuffled hash/sort-merge join whose cost is
  * O(rows × bucket occupancy), the same trick the LSH (q31) and IVF (q47)
  * paths use in vector space.
  *
  * Result is row-identical to the naive non-equi join (spec-verified, and
  * q73's DuckDB oracle runs the naive form).
  */
object IntervalJoin {

  /** All (left, right) pairs with equal `key` and
    * `right.timeCol` ∈ [left.timeCol − windowUs, left.timeCol]; time columns
    * are epoch-microsecond longs. Emits left columns + right columns.
    */
  def lookback(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTimeUs: String,
      rightTimeUs: String,
      windowUs: Long): DataFrame = {
    // left probes the cell of (t - window) and of t (≤2 distinct cells);
    // right publishes its own cell once
    val probe = left.withColumn("__cell",
      explode(array_distinct(array(
        floor((col(leftTimeUs) - windowUs) / windowUs),
        floor(col(leftTimeUs) / windowUs)))))
    val build = right.withColumn("__cell", floor(col(rightTimeUs) / windowUs))
    probe.join(build,
        probe("__cell") === build("__cell") &&
          probe(key) === build(key) &&
          col(rightTimeUs) >= col(leftTimeUs) - windowUs &&
          col(rightTimeUs) <= col(leftTimeUs))
      .drop("__cell")
      .drop(build(key))
  }
}
