package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The threshold-frame replacement for global-window bucketing (ntile /
  * cumulative rank over `Window.orderBy` with no partition key): instead of
  * funneling every row through one `Exchange SinglePartition` sort task,
  * compute the ≤9 exact percentile boundaries as a tiny frame (one
  * aggregate scan) and bucket each row with a map-side literal comparison
  * chain. Spark `percentile` and DuckDB `quantile_cont` interpolate the
  * same two order statistics (the q54/q254-proven pairing), and rounding
  * to 6 digits BEFORE use means both engines compare identical literals —
  * so the oracle reproduces the bucketing bit-for-bit with its own
  * `quantile_cont` CTE.
  *
  * Ties: equal values always land in the same bucket (a value-function,
  * unlike ntile's tie-splitting row count balance) — the documented tie
  * discipline of every query that uses this frame.
  */
object ScaleFrames {

  /** Exact percentile thresholds of `value`, rounded to 6, as literals.
    * One aggregate scan of `df`; the frame itself is ≤ fracs.size values
    * regardless of input size.
    */
  def thresholds(df: DataFrame, value: String, fracs: Seq[Double]): Seq[Double] = {
    val exprs = fracs.zipWithIndex.map { case (f, i) =>
      round(expr(s"percentile($value, $f)"), 6).as(s"t$i")
    }
    val r = df.agg(exprs.head, exprs.tail: _*).head()
    fracs.indices.map(r.getDouble)
  }

  /** Ascending bucket id: 1 + Σ [v > t_k] — bucket 1 holds the smallest
    * values. Pure map-side arithmetic against literal thresholds.
    */
  def binAsc(v: Column, ts: Seq[Double]): Column =
    ts.foldLeft(lit(1)) { (acc, t) => acc + (v > lit(t)).cast("int") }
      .cast("int")

  /** Descending bucket id: 1 + Σ [v < t_k] with `ts` taken at descending
    * fractions (0.9, 0.8, …) — bucket 1 holds the LARGEST values (the
    * "top decile first" orientation of gains/RFM charts).
    */
  def binDesc(v: Column, ts: Seq[Double]): Column =
    ts.foldLeft(lit(1)) { (acc, t) => acc + (v < lit(t)).cast("int") }
      .cast("int")

  /** The matching oracle fragment: `1 + CAST(v > t1 AS INT) + …` over a
    * one-row `quantile_cont` CTE named `th` with columns t1..tn.
    */
  def binSqlAsc(v: String, n: Int): String =
    (1 to n).map(k => s"CAST($v > th.t$k AS INT)").mkString("1 + ", " + ", "")

  def binSqlDesc(v: String, n: Int): String =
    (1 to n).map(k => s"CAST($v < th.t$k AS INT)").mkString("1 + ", " + ", "")

  /** One-row threshold CTE body: `SELECT round(quantile_cont(v, f1), 6) t1, …
    * FROM src`.
    */
  def thresholdCte(v: String, fracs: Seq[Double], src: String): String =
    fracs.zipWithIndex.map { case (f, i) =>
      s"round(quantile_cont($v, $f), 6) t${i + 1}"
    }.mkString("SELECT ", ",\n    ", s" FROM $src")
}
