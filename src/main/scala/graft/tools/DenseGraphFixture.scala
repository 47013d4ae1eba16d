package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Densifying graph fixture — the round-12 verdict's ask #6: the id-offset
  * derived corpora keep m/n CONSTANT (copies are disjoint subgraphs,
  * measured 453.6 at factors 1/10/30), so the graph-family scaling
  * exponents only ever measured the easy linear regime. This tool overlays
  * the derived lineitem with SYNTHETIC TWO-LINE ORDERS whose supplier
  * endpoints are sampled degree-proportionally from the base co-purchase
  * degree ladder (a static preferential-attachment / Chung-Lu draw:
  * P[endpoint = v] ∝ deg_base(v), copy chosen uniformly) — each synthetic
  * order contributes exactly one cross- or intra-copy co-purchase edge, so
  * the union graph genuinely densifies:
  *
  *   extra(f) = ⌈m₀ · (f^1.5 − f) / 4⌉    (m₀ = base co-purchase edges)
  *
  * putting the edge total on an m ∝ f^1.25-ish trajectory between the
  * audited factors (f3: m/n ≈ 1.18×, f10: ≈ 1.5× the disjoint-copy
  * ratio). Endpoint draws use splitmix64 (public-domain mix), so the
  * fixture is bit-reproducible.
  *
  * Usage: runMain graft.tools.DenseGraphFixture
  *          <baseSfDir> <derivedDir> <outDir> <factor>
  * Writes lineitem.parquet (derived ∪ overlay) plus pass-through copies of
  * supplier/orders into <outDir>; prints a one-line JSON with the measured
  * n_nodes / m_edges of the dense co-purchase graph.
  */
object DenseGraphFixture {

  private val OFF = 10000000L
  private val SYNTH_ORDER_BASE = 5000000000L

  /** splitmix64 — deterministic 64-bit mix (Steele et al. 2014). */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def pmod(x: Long, m: Long): Long = ((x % m) + m) % m

  def main(args: Array[String]): Unit = {
    val Array(baseDir, derivedDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 2, s"factor must be >= 2, got $factor")
    require(!outDir.startsWith("/root/testdata") &&
      !outDir.startsWith("/root/reference"), "outDir must be scratch")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // base co-purchase graph: degree ladder + edge count
    val ps = graft.Tables.lineitem(spark, baseDir)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")).distinct()
    val edges = ps.as("a").join(ps.as("b"),
        col("a.o") === col("b.o") && col("a.s") < col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v")).distinct()
      .persist()
    val m0 = edges.count()
    val deg = edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .orderBy("n").as[(Long, Long)].collect()
    val ids = deg.map(_._1)
    val cum = deg.scanLeft(0L)(_ + _._2).tail // cum(i) = Σ deg(0..i)
    val total = cum.last

    val extra = math.ceil(m0 * (math.pow(factor, 1.5) - factor) / 4.0).toLong
    println(s"[dense] base m0=$m0 nodes=${ids.length} extra=$extra")

    // synthetic two-line orders: endpoints ∝ base degree, copies uniform
    val bIds = spark.sparkContext.broadcast(ids)
    val bCum = spark.sparkContext.broadcast(cum)
    val f = factor.toLong
    val synth = spark.range(extra).mapPartitions { it =>
      val idsL = bIds.value; val cumL = bCum.value
      def pick(p: Long): Long = {
        var lo = 0; var hi = cumL.length - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cumL(mid) > p) hi = mid else lo = mid + 1
        }
        idsL(lo)
      }
      it.flatMap { r =>
        val k: Long = r
        val u = pick(pmod(mix64(4L * k), total)) + OFF * pmod(mix64(4L * k + 1), f)
        val v = pick(pmod(mix64(4L * k + 2), total)) + OFF * pmod(mix64(4L * k + 3), f)
        if (u == v) Iterator.empty
        else Iterator((SYNTH_ORDER_BASE + k, u), (SYNTH_ORDER_BASE + k, v))
      }
    }.toDF("l_orderkey", "l_suppkey")

    // widen to the full lineitem schema with type-appropriate defaults —
    // graph queries read (l_orderkey, l_suppkey); the rest just has to
    // parse (and keeps the fixture readable by every other operator)
    val li = graft.Tables.lineitem(spark, derivedDir)
    val widened = synth.select(li.schema.fields.map { fd =>
      fd.name match {
        case "l_orderkey" | "l_suppkey" => col(fd.name).cast(fd.dataType)
        // one distinct part per synthetic order: the part co-purchase
        // graph (q184/q215) densifies with the SAME overlay edges instead
        // of collapsing onto a single hub part (a lit default here would
        // wire every overlay line through one partkey — a fake supernode)
        case "l_partkey" => col("l_orderkey").cast(fd.dataType)
        case _ => (fd.dataType match {
          case _: StringType => lit("PA")
          case _: DateType => lit("1996-01-01").cast("date")
          case _: TimestampType => lit("1996-01-01 00:00:00").cast("timestamp")
          case _: TimestampNTZType =>
            lit("1996-01-01 00:00:00").cast("timestamp_ntz")
          case dt => lit(1).cast(dt)
        }).as(fd.name)
      }
    }: _*)

    def write(name: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[dense] $name done")
    }
    write("lineitem", li.unionAll(widened))
    write("supplier", graft.Tables.supplier(spark, derivedDir))
    write("orders", graft.Tables.orders(spark, derivedDir))

    // measure the dense graph so the audit can read exponents against m
    val ps2 = spark.read.parquet(s"$outDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")).distinct()
    val e2 = ps2.as("a").join(ps2.as("b"),
        col("a.o") === col("b.o") && col("a.s") < col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v")).distinct()
    val m = e2.count()
    val n = e2.select(col("u").as("n")).unionAll(e2.select(col("v").as("n")))
      .distinct().count()
    println(s"""{"metric":"dense_graph_fixture","factor":$factor,""" +
      s""""n_nodes":$n,"m_edges":$m,"m_over_n":${math.round(m * 100.0 / n) / 100.0},""" +
      s""""base_m0":$m0,"overlay_edges":$extra}""")
    spark.stop()
  }
}
