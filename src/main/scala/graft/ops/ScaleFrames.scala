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

  /** Two-level cumulative sums — THE shared machinery behind every
    * global-window replacement here (and q205/q243): `byV` holds one row
    * per (group…, `value`) with a fixed-width bucket id `bucket`;
    * for each (in → out) pair in `sums`, append `out` = the running total
    * of `in` ordered by `value` within each group, WITHOUT a global
    * window. Shape: a window partitioned by (group…, bucket) computes
    * within-bucket cumsums in parallel; the bounded per-bucket totals
    * cumulate through a triangle self-join; the ≤|buckets| offset frame
    * broadcast-joins back. No `Exchange SinglePartition` anywhere —
    * the plan the SinglePartitionSweepSpec enforces.
    *
    * Types: `coalesce(sum(x), lit(0))` promotes to the summed type
    * (long counts stay long — exact ranks; double weights stay double).
    */
  def twoLevelCumsum(byV: DataFrame, group: Seq[String], bucket: String,
      value: String, sums: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = group :+ bucket
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(value)
    val within = sums.foldLeft(byV) { case (d, (in, _)) =>
      d.withColumn(s"__cw_$in", sum(in).over(wb))
    }
    val totAggs = sums.map { case (in, _) => sum(in).as(s"__t_$in") }
    val offs = byV.groupBy(keys.map(col): _*).agg(totAggs.head, totAggs.tail: _*)
    val prior = offs.select(keys.map(k => col(k).as(s"__p_$k")) ++
      sums.map { case (in, _) => col(s"__t_$in").as(s"__pt_$in") }: _*)
    val cond = group.map(g => col(s"__p_$g") === col(g))
      .foldLeft(col(s"__p_$bucket") < col(bucket))(_ && _)
    val offAggs = sums.map { case (in, _) =>
      coalesce(sum(s"__pt_$in"), lit(0)).as(s"__o_$in")
    }
    val off = offs.join(prior, cond, "left")
      .groupBy(keys.map(col): _*).agg(offAggs.head, offAggs.tail: _*)
    val joined = within.join(broadcast(off), keys)
    sums.foldLeft(joined) { case (d, (in, out)) =>
      d.withColumn(out, col(s"__cw_$in") + col(s"__o_$in"))
    }.drop(sums.flatMap { case (in, _) =>
      Seq(s"__cw_$in", s"__t_$in", s"__o_$in")
    }: _*)
  }

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

  /** Exact percentile thresholds for a WIDE-domain numeric column — the
    * scale path where [[thresholds]]' `percentile()` aggregate breaks
    * down: Spark's exact percentile merges a value→count map on ONE
    * reducer, so a near-unique fact-table column (e.g. 6M distinct
    * prices at sf0.1 — 15 s in the r8 bench; the whole domain at 100 TB)
    * funnels through a single task. Here the rows collapse to
    * per-distinct-value counts (parallel partial agg), cumulative ranks
    * come from the two-level shape (bucket-partitioned windows +
    * triangle-join offsets — the q243 machinery), and each threshold is
    * the same linear interpolation `percentile()` defines —
    * lo + (pos − ⌊pos⌋)·(hi − lo) at pos = f·(n−1) — evaluated from the
    * two bracketing order statistics, which are min-aggregates over the
    * cum table against a ≤18-row broadcast rank frame. Identical doubles
    * to `percentile`/`quantile_cont`, so oracles keep their
    * `quantile_cont` CTEs unchanged.
    */
  def thresholdsWideDomain(df: DataFrame, value: String, bucketWidth: Double,
      fracs: Seq[Double]): Seq[Double] = {
    val byV = df.groupBy(col(value).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bkt", floor(col("v") / bucketWidth).cast("long"))
      .localCheckpoint() // ≤ distinct-value-domain rows
    val n = byV.agg(sum("c")).head().getLong(0)
    val cum = twoLevelCumsum(byV, Seq.empty, "bkt", "v", Seq("c" -> "cum"))
      .select("v", "cum")
    // bracketing 1-based ranks for every fraction (driver math on n only)
    val targets = fracs.map { f =>
      val pos = f * (n - 1) // 0-based fractional index, percentile()'s def
      (f, math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1, pos - math.floor(pos))
    }
    val ranks = targets.flatMap(t => Seq(t._2, t._3)).distinct
    val s = df.sparkSession
    import s.implicits._
    val rankDf = ranks.toDF("r")
    // order statistic at rank r = min v with cum ≥ r (partial-agg min per r)
    val at = cum.crossJoin(broadcast(rankDf))
      .filter(col("cum") >= col("r"))
      .groupBy("r").agg(min("v").as("v"))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    targets.map { case (_, rlo, rhi, frac) =>
      val lo = at(rlo); val hi = at(rhi)
      val t = lo + frac * (hi - lo)
      // Spark's round(_, 6) semantics exactly (BigDecimal HALF_UP on the
      // decimal string value) so the literal matches what the one-shot
      // percentile() path would have produced
      java.math.BigDecimal.valueOf(t)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }

  /** Grouped exact quantile over a wide-domain (near-unique) numeric
    * column, fully distributed — the grouped sibling of
    * [[thresholdsWideDomain]]: Spark's exact grouped `percentile` merges
    * each group's distinct-value map on that group's reducer, so with a
    * handful of groups over an unbounded column (q199's per-event-type
    * median over continuous values) one task holds ~n/|groups| entries.
    * Same two-level machinery, carried per group: per-(group, value)
    * counts → bucket-partitioned cumsums + per-(group, bucket) triangle
    * offsets → the two bracketing order statistics per group → the exact
    * `percentile` interpolation lo + (pos − ⌊pos⌋)·(hi − lo) at
    * pos = f·(n_g − 1). Returns (group, `out`) with the UNROUNDED double
    * — bit-identical to `percentile(value, f)` / `quantile_cont`, so
    * downstream arithmetic and oracles are unchanged.
    */
  def groupedQuantileWideDomain(df: DataFrame, group: String, value: String,
      bucketWidth: Double, frac: Double, out: String): DataFrame = {
    val byV = df.groupBy(col(group).as("g"), col(value).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bkt", floor(col("v") / bucketWidth).cast("long"))
      .localCheckpoint() // ≤ |groups| × distinct-value-domain rows
    val cum = twoLevelCumsum(byV, Seq("g"), "bkt", "v", Seq("c" -> "cum"))
      .select("g", "v", "cum")
    val ranks = byV.groupBy("g").agg(sum("c").as("n"))
      .withColumn("pos", lit(frac) * (col("n") - 1).cast("double"))
      .withColumn("rlo", floor(col("pos")).cast("long") + 1)
      .withColumn("rhi", ceil(col("pos")).cast("long") + 1)
      .select(col("g").as("gr"), col("pos"), col("rlo"), col("rhi"))
    val lo = cum.join(broadcast(ranks), col("gr") === col("g") &&
        col("cum") >= col("rlo"))
      .groupBy("g").agg(min("v").as("vlo"))
    val hi = cum.join(broadcast(ranks), col("gr") === col("g") &&
        col("cum") >= col("rhi"))
      .groupBy("g").agg(min("v").as("vhi"))
    lo.join(hi, "g")
      .join(broadcast(ranks), col("gr") === col("g"))
      .select(col("g").as(group),
        (col("vlo") + (col("pos") - floor(col("pos"))) *
          (col("vhi") - col("vlo"))).as(out))
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
