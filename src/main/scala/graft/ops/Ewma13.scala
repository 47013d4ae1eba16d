package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q397 — EWMA control chart (Roberts 1959; the SPC drift detector
  * between q246's CUSUM, which reacts to small sustained shifts, and a
  * Shewhart rule, which reacts to single spikes) over daily event volumes
  * per type, with λ = 1/4 and 3σ limits.
  *
  * The whole chart is RATIONAL-EXACT, no pow() anywhere (pow is the one
  * libm call with real cross-engine variance): with λ = 1/4 the
  * recurrence z_t = x_t/4 + 3·z_{t−1}/4, z_1 = x_1 scales to the integer
  * form
  *
  *   4^t·z_t = Σ_{j=2..t} 4^{j−1}·3^{t−j}·x_j + 4·3^{t−1}·x_1
  *
  * where 3^k comes from a spliced literal table (3⁰..3³¹ — the q394
  * constants discipline) and 4^k is a BIGINT shift; each term multiplies
  * into DECIMAL(38,0)/HUGEINT (the q363 pattern — weights reach 2⁶⁰),
  * and z_t is ONE exact-integer-to-double conversion divided by 2^{2t}
  * (a power of two — the division is exact scaling). The variance factor
  * (1−λ)^{2t} = (3^t)²/(4^t)² likewise uses only exact integer-valued
  * doubles (3^t < 2⁵³) and IEEE multiplies/divides; σ and μ₀ come from
  * exact BIGINT Σx/Σx². The only transcendental is the final sqrt (IEEE
  * correctly-rounded). Horizon bound: t ≤ 31 days keeps every shift ≤ 62
  * bits and 3^t exact — documented; longer horizons re-anchor the chart.
  *
  * Scale shape: one corpus scan → the calendar-bounded (type, day)
  * frame; the EWMA closed form is a triangle join of that ≤|types|·31
  * frame with itself (j ≤ t within type — the q229 triangle-cumulation
  * shape), never a corpus-sized window; per-type stats broadcast.
  */
object Ewma13 {

  private val pow3: IndexedSeq[Long] =
    (0 to 31).scanLeft(1L)((a, _) => a * 3).take(32).toIndexedSeq

  private val pow3Arr = s"array(${pow3.mkString("L,")}L)"
  private val pow3List = s"[${pow3.mkString(",")}]"

  val q397EwmaChart = GraftQuery(
    "q397_ewma_chart",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("t",
          row_number().over(Window.partitionBy("event_type").orderBy("day"))
            .cast("long"))
        .localCheckpoint() // ≤ |types| × |calendar days| rows
      val stats = daily.groupBy(col("event_type").as("st"))
        .agg(count(lit(1)).as("nd"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      val a = daily.select(col("event_type").as("jt"), col("t").as("j"),
        col("x").as("xj"))
      val zed = daily
        .join(a, col("event_type") === col("jt") && col("j") <= col("t"))
        .withColumn("w",
          when(col("j") === 1,
            lit(4L) * expr(s"element_at($pow3Arr, CAST(t AS INT))"))
            .otherwise(
              expr("shiftleft(1L, CAST(2 * j - 2 AS INT))") *
                expr(s"element_at($pow3Arr, CAST(t - j + 1 AS INT))")))
        .withColumn("term", col("w").cast("decimal(38,0)") * col("xj"))
        .groupBy("event_type", "day", "t", "x")
        .agg(sum("term").as("zraw"))
        .withColumn("z",
          col("zraw").cast("double") /
            expr("CAST(shiftleft(1L, CAST(2 * t AS INT)) AS DOUBLE)"))
      val out = zed.join(broadcast(stats), col("event_type") === col("st"))
        .withColumn("mu0",
          col("sx").cast("double") / col("nd").cast("double"))
        .withColumn("sigma",
          sqrt((col("nd").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
            (col("nd").cast("double") * (col("nd") - 1).cast("double"))))
        .withColumn("p3",
          expr(s"CAST(element_at($pow3Arr, CAST(t AS INT) + 1) AS DOUBLE)"))
        .withColumn("p4",
          expr("CAST(shiftleft(1L, CAST(2 * t AS INT)) AS DOUBLE)"))
        .withColumn("hw",
          lit(3.0) * col("sigma") *
            sqrt((lit(1.0) - col("p3") * col("p3") / (col("p4") * col("p4")))
              / lit(7.0)))
      out.select(col("event_type"),
        col("day").cast("string").as("day"), col("t"), col("x"),
        round(col("z"), 4).as("ewma"),
        round(col("mu0") + col("hw"), 4).as("ucl"),
        round(col("mu0") - col("hw"), 4).as("lcl"),
        (col("z") > col("mu0") + col("hw") ||
          col("z") < col("mu0") - col("hw")).cast("int").as("ooc"))
        .orderBy("event_type", "t")
    },
    Some(s"""WITH daily AS MATERIALIZED (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS x,
           |    CAST(row_number() OVER (PARTITION BY event_type
           |      ORDER BY CAST(ts AS DATE)) AS BIGINT) AS t
           |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
           |zed AS (
           |  SELECT d.event_type, d.day, d.t, d.x,
           |    sum(CAST(CASE WHEN a.t = 1
           |        THEN 4 * ($pow3List)[CAST(d.t AS INT)]
           |        ELSE (CAST(1 AS BIGINT) << CAST(2 * a.t - 2 AS INT))
           |          * ($pow3List)[CAST(d.t - a.t + 1 AS INT)]
           |        END AS HUGEINT) * a.x) AS zraw
           |  FROM daily d JOIN daily a
           |    ON a.event_type = d.event_type AND a.t <= d.t
           |  GROUP BY 1, 2, 3, 4),
           |st AS (
           |  SELECT event_type AS s_t, CAST(count(*) AS BIGINT) AS nd,
           |    CAST(sum(x) AS BIGINT) AS sx,
           |    CAST(sum(x * x) AS BIGINT) AS sxx
           |  FROM daily GROUP BY 1),
           |j AS (
           |  SELECT z.event_type, z.day, z.t, z.x,
           |    CAST(z.zraw AS DOUBLE)
           |      / CAST(CAST(1 AS BIGINT) << CAST(2 * z.t AS INT)
           |        AS DOUBLE) AS zz,
           |    CAST(st.sx AS DOUBLE) / CAST(st.nd AS DOUBLE) AS mu0,
           |    sqrt((CAST(st.nd AS DOUBLE) * CAST(st.sxx AS DOUBLE)
           |      - CAST(st.sx AS DOUBLE) * CAST(st.sx AS DOUBLE))
           |      / (CAST(st.nd AS DOUBLE) * CAST(st.nd - 1 AS DOUBLE)))
           |      AS sigma,
           |    CAST(($pow3List)[CAST(z.t AS INT) + 1] AS DOUBLE) AS p3v,
           |    CAST(CAST(1 AS BIGINT) << CAST(2 * z.t AS INT) AS DOUBLE)
           |      AS p4v
           |  FROM zed z JOIN st ON st.s_t = z.event_type),
           |lim AS (
           |  SELECT event_type, day, t, x, zz, mu0,
           |    3.0 * sigma * sqrt((1.0 - p3v * p3v / (p4v * p4v)) / 7.0)
           |      AS hw
           |  FROM j)
           |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, t, x,
           |  round(zz, 4) AS ewma,
           |  round(mu0 + hw, 4) AS ucl,
           |  round(mu0 - hw, 4) AS lcl,
           |  CAST(zz > mu0 + hw OR zz < mu0 - hw AS INT) AS ooc
           |FROM lim ORDER BY event_type, t""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q397EwmaChart)
}
