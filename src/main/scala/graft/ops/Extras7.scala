package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Round-10 relational additions: the hardest TPC-H decorrelation shape
  * not yet in the inventory.
  */
object Extras7 {

  /** TPC-H Q21 analogue (suppliers-who-kept-orders-waiting): for finished
    * orders, count per supplier the late lineitems (shipped > 60 days
    * after the order date) on MULTI-supplier orders where that supplier
    * was the ONLY late one — the classic EXISTS + NOT-EXISTS correlated
    * pair. The fixture has no receipt/commit dates, so lateness is
    * ship-vs-order-date (semantics preserved: a per-order lateness
    * predicate correlating two other lineitem scans).
    *
    * Spark-first decorrelation: both correlated subqueries become
    * orderkey-equi semi/anti joins with a `suppkey <>` residual — hash
    * joins at any scale (never nested loops), shuffling only the late
    * subset on the narrow orderkey. The top-20 is TakeOrderedAndProject,
    * not a global sort.
    */
  val q296TpchQ21 = GraftQuery(
    "q296_tpch_q21",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > date_add(col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
      val l1 = late.as("l1")
      val other = li.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
      val otherLate = late.select(col("l_orderkey").as("o3_orderkey"),
        col("l_suppkey").as("o3_suppkey"))
      val waited = l1
        .join(other,
          col("l1.l_orderkey") === col("o2_orderkey") &&
            col("l1.l_suppkey") =!= col("o2_suppkey"), "leftsemi")
        .join(otherLate,
          col("l1.l_orderkey") === col("o3_orderkey") &&
            col("l1.l_suppkey") =!= col("o3_suppkey"), "leftanti")
      waited.join(Tables.supplier(s, dir),
          col("l1.l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""WITH late AS (
           |  SELECT l_orderkey, l_suppkey
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE o_orderstatus = 'F'
           |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
           |SELECT s_name, n_name, count(*) AS numwait
           |FROM late l1
           |JOIN supplier ON l1.l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE EXISTS (
           |    SELECT 1 FROM lineitem l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM late l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey)
           |GROUP BY 1, 2
           |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin))

  /** Absorption-probability fixpoint for the q297 Markov chain: start the
    * value vector at the absorbing states (purchase = 1, NOCONV = 0) and
    * iterate v(s) ← Σ_b P(s→b)·v(b) over the transient states. `removed`
    * blocks every transition INTO that channel WITHOUT renormalizing (the
    * removal-effect convention: blocked mass is lost conversion, not
    * redistributed). Deterministic accumulation order (sorted targets).
    */
  private[graft] def absorptionCvr(counts: Map[(String, String), Long],
      removed: Option[String], iters: Int): Double = {
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val transient = ("START" +: counts.keys.map(_._1).toSeq).distinct
      .filter(s => s != "purchase" && s != "NOCONV").sorted
    var v = transient.map(_ -> 0.0).toMap +
      ("purchase" -> 1.0) + ("NOCONV" -> 0.0)
    for (_ <- 1 to iters) {
      v = v ++ transient.map { st =>
        val out = counts.toSeq
          .collect { case ((f, t), c) if f == st && !removed.contains(t) =>
            (t, c)
          }
          .sortBy(_._1)
        st -> out.map { case (t, c) =>
          c.toDouble / totals(st) * v.getOrElse(t, 0.0)
        }.sum
      }
    }
    v.getOrElse("START", 0.0)
  }

  private def guard4(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Markov-chain (removal-effect) multi-touch attribution — the
    * principled alternative to q235's fractional split: per-user event
    * journeys (terminated by each purchase; non-converting tails absorb
    * in NOCONV) become a first-order transition matrix, conversion is the
    * START-state absorption probability, and each channel's credit is its
    * removal effect — how much conversion disappears when paths through
    * that channel are blocked (Anderl et al. 2014's framework, standard in
    * marketing analytics).
    *
    * Scale shape (the q283 discipline): the UNBOUNDED work — ordering
    * events per user and counting (from, to) transitions — is windowed
    * per user + one partial-agg groupBy down to ≤ (k+3)² rows for k
    * channels; the absorption fixpoint then iterates on that bounded
    * table driver-side (collect of ≤49 rows, documented) in deterministic
    * sorted order, 25 iterations (geometric convergence — the chain is
    * substochastic). Transition probabilities are single divisions of
    * exact integer counts, so the only cross-engine float divergence vs
    * the oracle's unrolled-CTE replay is ~1e-15 summation order, absorbed
    * by guard-digit rounding (6 then 4) at the output edge.
    */
  val q297MarkovAttribution = GraftQuery(
    "q297_markov_attribution",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val byJourney =
        Window.partitionBy("user_id", "j").orderBy("ts", "event_id")
      val ev = Tables.events(s, dir)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("j", coalesce(
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .over(byUser.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)))
        .withColumn("prev", lag("event_type", 1).over(byJourney))
        .withColumn("nxt", lead("event_type", 1).over(byJourney))
      val steps = ev.select(coalesce(col("prev"), lit("START")).as("f"),
        col("event_type").as("t"))
      val tails = ev.filter(col("nxt").isNull && col("event_type") =!= "purchase")
        .select(col("event_type").as("f"), lit("NOCONV").as("t"))
      val counts = steps.unionByName(tails).groupBy("f", "t")
        .agg(count(lit(1)).as("c"))
        .collect() // bounded: ≤ (channels + START/purchase/NOCONV)² rows
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // fixed channel universe, matching the oracle's literal scenario
      // list — deriving it from observed data would silently diverge from
      // the oracle on a fixture missing a type (the q280 lesson); a
      // channel with no transitions scores removal_effect 0 on both sides
      val channels = Seq("click", "error", "signup", "view")
      val base = absorptionCvr(counts, None, iters = 25)
      val re = channels.map { c =>
        val r = absorptionCvr(counts, Some(c), iters = 25)
        // zero-purchase fixture ⇒ base = 0; guard the division like the
        // attribution_share CASE below (oracle's ch CTE mirrors this)
        (c, r, if (base > 0) math.max(0.0, (base - r) / base) else 0.0)
      }
      val totRe = re.map(_._3).sum
      val rows = re.map { case (c, r, e) =>
        Row(c, guard4(base), guard4(r), guard4(e),
          guard4(if (totRe > 0) e / totRe else 0.0))
      }
      val schema = StructType(Seq(
        StructField("channel", StringType),
        StructField("cvr_base", DoubleType),
        StructField("cvr_removed", DoubleType),
        StructField("removal_effect", DoubleType),
        StructField("attribution_share", DoubleType)))
      s.createDataFrame(
        s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("channel")
    },
    Some {
      // every CTE in the 25-deep chain is MATERIALIZED: DuckDB otherwise
      // inlines the chain into one enormous nested plan whose join-order
      // search blows up super-linearly (observed: 17 CPU-minutes inlined
      // vs 0.13 s materialized on the sf0.01 fixture)
      val iterCtes = (1 to 25).map { i =>
        s"""v$i AS MATERIALIZED (
           |  SELECT st.scen, st.state,
           |    CASE WHEN st.state = 'purchase' THEN CAST(1 AS DOUBLE)
           |         WHEN st.state = 'NOCONV' THEN CAST(0 AS DOUBLE)
           |         ELSE coalesce(sum(t.p * v.val), 0) END AS val
           |  FROM states st
           |  LEFT JOIN trans t ON t.scen = st.scen AND t.f = st.state
           |  LEFT JOIN v${i - 1} v ON v.scen = t.scen AND v.state = t.t
           |  GROUP BY st.scen, st.state)""".stripMargin
      }.mkString(",\n")
      s"""WITH wj AS MATERIALIZED (
         |  SELECT user_id, ts, event_id, event_type,
         |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS j
         |  FROM events),
         |sq AS MATERIALIZED (
         |  SELECT user_id, j, event_type,
         |    lag(event_type) OVER w AS prev, lead(event_type) OVER w AS nxt
         |  FROM wj WINDOW w AS (PARTITION BY user_id, j ORDER BY ts, event_id)),
         |steps AS MATERIALIZED (
         |  SELECT coalesce(prev, 'START') AS f, event_type AS t FROM sq
         |  UNION ALL
         |  SELECT event_type, 'NOCONV' FROM sq
         |  WHERE nxt IS NULL AND event_type <> 'purchase'),
         |cnts AS MATERIALIZED (SELECT f, t, count(*) AS c FROM steps GROUP BY 1, 2),
         |tots AS MATERIALIZED (SELECT f, sum(c) AS tot FROM cnts GROUP BY 1),
         |scens AS MATERIALIZED (SELECT * FROM (VALUES ('base'), ('click'), ('error'),
         |  ('signup'), ('view')) AS s(scen)),
         |states AS MATERIALIZED (
         |  SELECT scen, state FROM scens CROSS JOIN (VALUES ('START'),
         |    ('click'), ('error'), ('signup'), ('view'), ('purchase'),
         |    ('NOCONV')) AS st(state)),
         |trans AS MATERIALIZED (
         |  SELECT s.scen, c.f, c.t, CAST(c.c AS DOUBLE) / tt.tot AS p
         |  FROM cnts c JOIN tots tt ON tt.f = c.f
         |  CROSS JOIN scens s
         |  WHERE s.scen = 'base' OR c.t <> s.scen),
         |v0 AS MATERIALIZED (
         |  SELECT scen, state,
         |    CASE WHEN state = 'purchase' THEN CAST(1 AS DOUBLE)
         |         ELSE CAST(0 AS DOUBLE) END AS val
         |  FROM states),
         |$iterCtes,
         |res AS MATERIALIZED (SELECT scen, val FROM v25 WHERE state = 'START'),
         |b AS MATERIALIZED (SELECT val AS bv FROM res WHERE scen = 'base'),
         |ch AS MATERIALIZED (
         |  SELECT scen AS channel,
         |    CASE WHEN bv > 0 THEN greatest(0, (bv - val) / bv)
         |         ELSE 0 END AS re, val, bv
         |  FROM res CROSS JOIN b WHERE scen <> 'base'),
         |tre AS MATERIALIZED (SELECT sum(re) AS s FROM ch)
         |SELECT channel,
         |  round(round(bv, 6), 4) AS cvr_base,
         |  round(round(val, 6), 4) AS cvr_removed,
         |  round(round(re, 6), 4) AS removal_effect,
         |  round(round(CASE WHEN s > 0 THEN re / s ELSE 0 END, 6), 4)
         |    AS attribution_share
         |FROM ch CROSS JOIN tre ORDER BY channel""".stripMargin
    })

  /** Materialized-view advisor — the warehouse-operations decision q213
    * (IVM) and q244 (pre-agg contract) assume has already been made: given
    * a weighted query workload over a 4-dimension lattice, rank every
    * candidate group-by MV by benefit. ALL 16 candidate cardinalities come
    * from ONE cube pass (grouping() bits identify each lattice node — the
    * same scan a planner's statistics collector would run); a query is
    * answerable from an MV iff its dimension mask is a subset of the MV's
    * (qmask & mvmask = qmask), benefit = Σ answerable weight·(N − mv_rows)
    * against a full-scan baseline, penalized by the MV's own maintenance
    * row count. Integer-exact end to end; the workload is a literal frame.
    *
    * Scale shape: one cube scan (partial aggs per lattice node) collapses
    * to 16 cardinality rows; the 8-query workload joins against those 16
    * rows broadcast-side. Nothing after the scan grows with data.
    */
  val q303MvAdvisor = GraftQuery(
    "q303_mv_advisor",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
        year(col("l_shipdate")).as("yr"),
        (col("l_suppkey") % 10).as("sb"))
      val cube = li.cube(col("flag"), col("status"), col("yr"), col("sb"))
        .agg(count(lit(1)).as("c"),
          grouping(col("flag")).as("gf"), grouping(col("status")).as("gs"),
          grouping(col("yr")).as("gy"), grouping(col("sb")).as("gb"))
      val mvs = cube.select(
          ((lit(1) - col("gf")) * 8 + (lit(1) - col("gs")) * 4 +
            (lit(1) - col("gy")) * 2 + (lit(1) - col("gb"))).as("mvmask"))
        .groupBy("mvmask").agg(count(lit(1)).as("mv_rows"))
      val base = li.agg(count(lit(1)).as("n_base"))
      val workload = Seq(
        ("by_flag", 8, 10L), ("by_status", 4, 8L), ("by_flag_status", 12, 6L),
        ("by_year", 2, 12L), ("by_year_flag", 10, 4L), ("by_bucket", 1, 5L),
        ("total", 0, 20L), ("by_all", 15, 1L))
        .toDF("qname", "qmask", "w")
      val scored = mvs.crossJoin(broadcast(base))
        .join(broadcast(workload),
          col("qmask").bitwiseAND(col("mvmask")) === col("qmask"), "left")
        .groupBy("mvmask", "mv_rows")
        .agg(count(col("qname")).as("n_answerable"),
          coalesce(sum(col("w") * (col("n_base") - col("mv_rows"))), lit(0L))
            .as("benefit"))
        .withColumn("score", col("benefit") - col("mv_rows"))
      val dims = concat_ws("+",
        when(col("mvmask").bitwiseAND(8) =!= 0, lit("flag")),
        when(col("mvmask").bitwiseAND(4) =!= 0, lit("status")),
        when(col("mvmask").bitwiseAND(2) =!= 0, lit("yr")),
        when(col("mvmask").bitwiseAND(1) =!= 0, lit("sb")))
      scored.select(col("mvmask"), dims.as("mv_dims"), col("mv_rows"),
          col("n_answerable"), col("score"))
        .orderBy(col("score").desc, col("mvmask")).limit(5)
    },
    Some("""WITH li AS (
           |  SELECT l_returnflag AS flag, l_linestatus AS status,
           |    CAST(year(l_shipdate) AS BIGINT) AS yr, l_suppkey % 10 AS sb
           |  FROM lineitem),
           |cb AS (
           |  SELECT (1 - grouping(flag)) * 8 + (1 - grouping(status)) * 4
           |    + (1 - grouping(yr)) * 2 + (1 - grouping(sb)) AS mvmask
           |  FROM li GROUP BY CUBE (flag, status, yr, sb)),
           |mvs AS (SELECT mvmask, CAST(count(*) AS BIGINT) AS mv_rows
           |        FROM cb GROUP BY 1),
           |base AS (SELECT CAST(count(*) AS BIGINT) AS n_base FROM li),
           |wl AS (
           |  SELECT * FROM (VALUES
           |    ('by_flag', 8, 10), ('by_status', 4, 8),
           |    ('by_flag_status', 12, 6), ('by_year', 2, 12),
           |    ('by_year_flag', 10, 4), ('by_bucket', 1, 5),
           |    ('total', 0, 20), ('by_all', 15, 1))
           |    AS t(qname, qmask, w)),
           |sc AS (
           |  SELECT mvmask, mv_rows,
           |    CAST(count(qname) AS BIGINT) AS n_answerable,
           |    CAST(coalesce(sum(w * (n_base - mv_rows)), 0) AS BIGINT)
           |      AS benefit
           |  FROM mvs CROSS JOIN base
           |  LEFT JOIN wl ON (qmask & mvmask) = qmask
           |  GROUP BY 1, 2)
           |SELECT mvmask,
           |  concat_ws('+',
           |    CASE WHEN mvmask & 8 <> 0 THEN 'flag' END,
           |    CASE WHEN mvmask & 4 <> 0 THEN 'status' END,
           |    CASE WHEN mvmask & 2 <> 0 THEN 'yr' END,
           |    CASE WHEN mvmask & 1 <> 0 THEN 'sb' END) AS mv_dims,
           |  mv_rows, n_answerable,
           |  CAST(benefit - mv_rows AS BIGINT) AS score
           |FROM sc ORDER BY score DESC, mvmask LIMIT 5""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q296TpchQ21, q297MarkovAttribution, q303MvAdvisor)
}
