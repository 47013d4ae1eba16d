package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q376 — grid-bucketed spatial near-join: the geospatial radius-join
  * primitive (geohash/S2-cell bucketing as every spatial engine ships it),
  * expressed in EXACT integer micro-degrees so the cross-engine gate has
  * no transcendental to drift on: points live on a 10⁻⁶-degree integer
  * lattice, distance is squared Euclidean in BIGINT, and the cell join is
  * pigeonhole-EXACT (radius < cell edge ⇒ every true pair is a 3×3
  * neighbor-cell candidate — the q156/q364 banding proof applied to 2-D).
  */
object Spatial13 {

  /** Signed floor division by 10⁶ (cells): Spark pmod-subtract; the
    * oracle replays the positive-mod expansion (verify-skill lesson l).
    */
  private def cell(c: String): Column =
    expr(s"($c - pmod($c, 1000000)) div 1000000")

  private def mdInt(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Points: every customer gets a deterministic md5-lattice coordinate
    * (lat ∈ ±60°, lon ∈ ±180°, micro-degree integers), and every 5th
    * customer additionally plants a nearby replica (offsets up to
    * ±0.3° per axis — inside the 0.5° radius), the q310/q320
    * derived-replica pattern: natural near-pairs are too rare at fixture
    * density for a non-vacuous gate, planted ones give exact ground
    * truth.
    */
  private[ops] def points(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(
      col("c_custkey").as("pid"),
      (mdInt("lat", col("c_custkey")) % 120000001L - 60000000L).as("latm"),
      (mdInt("lon", col("c_custkey")) % 360000001L - 180000000L).as("lonm"),
      lit(0).as("planted"))
    // two-step rename before the shift: deriving the offset from a column
    // spelled like the shifted alias walks the mod cycle via Spark's
    // lateral-column-alias resolution (verify-skill lesson t)
    val replicas = base.filter(pmod(col("pid"), lit(5)) === 0)
      .select(col("pid").as("src_pid"), col("latm").as("src_lat"),
        col("lonm").as("src_lon"))
      .select((col("src_pid") + 1000000000L).as("pid"),
        (col("src_lat") + (pmod(col("src_pid"), lit(7)) - 3) * 100000L)
          .as("latm"),
        (col("src_lon") - 100000L).as("lonm"),
        lit(1).as("planted"))
    base.unionAll(replicas)
  }

  /** Radius join at r = 0.5° on the micro-degree lattice. One side
    * explodes its 3×3 neighbor-cell keys (constant ×9 fan-out), the
    * candidate join is a pure equi-join on (cell_x, cell_y), and the
    * exact BIGINT distance filter keeps d² ≤ r². Output: pair counts and
    * distance extremes split by planted-vs-natural — every planted
    * replica pair MUST appear (pigeonhole), natural collisions are the
    * fixture's own density.
    *
    * Scale shape: candidates come from a keyed equi-join whose per-cell
    * load is the data's spatial density (the skew story of any spatial
    * index); nothing is ever all-pairs and no float enters before the
    * final display rounding. At 100 TB the same plan holds with finer
    * cells sized to density (cell edge just must stay > r).
    */
  val q376GridSpatialJoin = GraftQuery(
    "q376_grid_spatial_join",
    (s, dir) => {
      val r2 = 250000000000L // (500000 micro-deg)²
      val pts = points(s, dir)
      val lhs = pts.select(col("pid").as("a_pid"), col("latm").as("a_lat"),
        col("lonm").as("a_lon"), col("planted").as("a_pl"))
        .withColumn("cx0", cell("a_lat")).withColumn("cy0", cell("a_lon"))
        .withColumn("off", explode(expr(
          "array(-1L, 0L, 1L)")))
        .withColumn("off2", explode(expr("array(-1L, 0L, 1L)")))
        .select(col("a_pid"), col("a_lat"), col("a_lon"), col("a_pl"),
          (col("cx0") + col("off")).as("cx"),
          (col("cy0") + col("off2")).as("cy"))
      val rhs = pts.select(col("pid").as("b_pid"), col("latm").as("b_lat"),
        col("lonm").as("b_lon"), col("planted").as("b_pl"))
        .withColumn("cx", cell("b_lat")).withColumn("cy", cell("b_lon"))
      val pairs = lhs.join(rhs, Seq("cx", "cy"))
        .filter(col("a_pid") < col("b_pid"))
        .withColumn("d2",
          (col("a_lat") - col("b_lat")) * (col("a_lat") - col("b_lat")) +
            (col("a_lon") - col("b_lon")) * (col("a_lon") - col("b_lon")))
        .filter(col("d2") <= r2)
      pairs
        .withColumn("kind",
          when(col("b_pid") === col("a_pid") + 1000000000L, "planted")
            .otherwise("natural"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_pairs"),
          min("d2").as("min_d2"), max("d2").as("max_d2"))
        .orderBy("kind")
    },
    Some("""WITH base AS (
           |  SELECT c_custkey AS pid,
           |    CAST(concat('0x', substr(md5('lat' || c_custkey::VARCHAR),
           |      1, 15)) AS BIGINT) % 120000001 - 60000000 AS latm,
           |    CAST(concat('0x', substr(md5('lon' || c_custkey::VARCHAR),
           |      1, 15)) AS BIGINT) % 360000001 - 180000000 AS lonm,
           |    0 AS planted
           |  FROM customer),
           |repl AS (
           |  SELECT pid AS src_pid, latm AS src_lat, lonm AS src_lon
           |  FROM base WHERE pid % 5 = 0),
           |pts AS (
           |  SELECT * FROM base
           |  UNION ALL
           |  SELECT src_pid + 1000000000 AS pid,
           |    src_lat + (src_pid % 7 - 3) * 100000 AS latm,
           |    src_lon - 100000 AS lonm,
           |    1 AS planted
           |  FROM repl),
           |lhs AS (
           |  SELECT pid AS a_pid, latm AS a_lat, lonm AS a_lon,
           |    (latm - ((latm % 1000000 + 1000000) % 1000000)) // 1000000
           |      + ox.o AS cx,
           |    (lonm - ((lonm % 1000000 + 1000000) % 1000000)) // 1000000
           |      + oy.o AS cy
           |  FROM pts, (VALUES (-1), (0), (1)) ox(o),
           |    (VALUES (-1), (0), (1)) oy(o)),
           |rhs AS (
           |  SELECT pid AS b_pid, latm AS b_lat, lonm AS b_lon,
           |    (latm - ((latm % 1000000 + 1000000) % 1000000)) // 1000000
           |      AS cx,
           |    (lonm - ((lonm % 1000000 + 1000000) % 1000000)) // 1000000
           |      AS cy
           |  FROM pts),
           |pairs AS (
           |  SELECT a_pid, b_pid,
           |    (a_lat - b_lat) * (a_lat - b_lat)
           |      + (a_lon - b_lon) * (a_lon - b_lon) AS d2
           |  FROM lhs JOIN rhs USING (cx, cy)
           |  WHERE a_pid < b_pid)
           |SELECT CASE WHEN b_pid = a_pid + 1000000000 THEN 'planted'
           |    ELSE 'natural' END AS kind,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(min(d2) AS BIGINT) AS min_d2,
           |  CAST(max(d2) AS BIGINT) AS max_d2
           |FROM pairs WHERE d2 <= 250000000000
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q376GridSpatialJoin)
}
