package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Frequency-domain seasonality detection — the discrete periodogram over
  * per-type hourly event counts. q231 SCREENS against an assumed weekly
  * profile; this DISCOVERS the dominant cycle: DFT power
  * P(k) = (Σ c_t·cos(2πkt/N))² + (Σ c_t·sin(2πkt/N))² over the hour-bucket
  * series, top-3 spectral lines per event type. Time indices are relative
  * to the corpus' first hour (power is shift-invariant, and small angles
  * keep libm range reduction exact across engines).
  *
  * Scale design (100 TB of events): the raw scan collapses to (type, hour)
  * counts FIRST — the only pass over the data, an ordinary partial-agg
  * hash aggregate — and everything after runs on horizon-bounded series
  * (≤ N rows per type regardless of corpus size). The candidate-frequency
  * fan-out (≤60 k's) multiplies the bounded series, never the raw events,
  * and the [h0, h1] frame is a broadcast 1-row aggregate. Top-3 ranking is
  * a per-type window. Float discipline: integer counts, one product per
  * term, guard-digit rounding (6 then 3) on the power — the q283 class.
  */
object Spectral {

  /** Highest candidate frequency (cycles per horizon) scanned. */
  val MaxK = 60

  val q295Periodogram = GraftQuery(
    "q295_periodogram",
    (s, dir) => {
      // FLOOR division to match DuckDB's `//` on pre-epoch timestamps:
      // `div` truncates toward zero, so subtract the positive remainder
      // first (x - pmod(x, d) is exactly divisible, making div == floor)
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
            " div 3600000000").as("h"))
      val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
      val bounds = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val terms = counts.crossJoin(broadcast(bounds))
        .withColumn("t", col("h") - col("h0"))
        .withColumn("n", col("h1") - col("h0") + lit(1L))
        .withColumn("k", explode(sequence(lit(1), lit(MaxK))))
        .filter(col("k") * 2 <= col("n"))
        .withColumn("ang",
          lit(2.0 * math.Pi) * col("k") * col("t") / col("n"))
      val spec = terms.groupBy("event_type", "k", "n")
        .agg(sum(col("cnt") * cos(col("ang"))).as("sr"),
          sum(col("cnt") * sin(col("ang"))).as("si"))
        .withColumn("pwr",
          round(round(col("sr") * col("sr") + col("si") * col("si"), 6), 3))
      val rnk = row_number().over(
        Window.partitionBy("event_type").orderBy(col("pwr").desc, col("k")))
      spec.withColumn("rnk", rnk).filter(col("rnk") <= 3)
        .select(col("event_type"), col("rnk"), col("k"),
          round(col("n").cast("double") / col("k"), 2).as("period_hours"),
          col("pwr"))
        .orderBy("event_type", "rnk")
    },
    Some(s"""WITH e AS (
           |  SELECT event_type,
           |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
           |  FROM events),
           |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
           |c AS (SELECT event_type, h, count(*) AS cnt FROM e GROUP BY 1, 2),
           |t AS (
           |  SELECT event_type, h - h0 AS t, h1 - h0 + 1 AS n, cnt
           |  FROM c CROSS JOIN b),
           |ks AS (SELECT unnest(range(1, ${MaxK + 1})) AS k),
           |terms AS (
           |  SELECT event_type, ks.k AS k, n, cnt,
           |    2 * pi() * ks.k * t.t / n AS ang
           |  FROM t CROSS JOIN ks WHERE ks.k * 2 <= n),
           |spec AS (
           |  SELECT event_type, k, n,
           |    sum(cnt * cos(ang)) AS sr, sum(cnt * sin(ang)) AS si
           |  FROM terms GROUP BY 1, 2, 3),
           |p AS (
           |  SELECT event_type, k, n,
           |    round(round(sr * sr + si * si, 6), 3) AS pwr
           |  FROM spec),
           |r AS (
           |  SELECT *, row_number() OVER (PARTITION BY event_type
           |    ORDER BY pwr DESC, k) AS rnk
           |  FROM p)
           |SELECT event_type, rnk, k,
           |  round(CAST(n AS DOUBLE) / k, 2) AS period_hours, pwr
           |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q295Periodogram)
}
