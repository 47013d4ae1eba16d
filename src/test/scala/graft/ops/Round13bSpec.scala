package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-13 second-batch pins: q375's per-edge triangle support against a
  * hand-computed graph, q376's pigeonhole exact-recall claim against a
  * brute-force all-pairs sweep, and q382's closed-form existential chain
  * against explicit chain enumeration.
  */
class Round13bSpec extends AnyFunSuite with SparkSpec {

  private val sf0001 = "/root/testdata/sf0.001"

  test("q375 edgeSupport matches hand-computed triangle counts") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // two triangles sharing edge (2,3), plus an isolated edge (5,6):
    // support: (2,3)=2; (1,2),(1,3),(2,4),(3,4)=1; (5,6)=0
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L)).toDF("u", "v")
    val sup = Graph13.edgeSupport(edges)
      .select(col("ek"), col("support")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ek(a: Long, b: Long): Long = a * 2147483648L + b
    assert(sup(ek(2L, 3L)) == 2L)
    assert(sup(ek(1L, 2L)) == 1L)
    assert(sup(ek(1L, 3L)) == 1L)
    assert(sup(ek(2L, 4L)) == 1L)
    assert(sup(ek(3L, 4L)) == 1L)
    // a zero-triangle edge whose higher endpoint has no out-neighbors is
    // ABSENT rather than present-with-0 — callers (the peel, the oracle)
    // treat absence as support 0, which this pin makes explicit
    assert(sup.get(ek(5L, 6L)).forall(_ == 0L))
    assert(sup.values.sum == 6L) // 2 triangles x 3 legs
  }

  test("q376 banded candidate join recovers EXACTLY the brute-force pairs") {
    val pts = Spatial13.points(spark, sf0001)
      .select("pid", "latm", "lonm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r2 = 250000000000L
    val brute = (for {
      (a, alat, alon) <- pts
      (b, blat, blon) <- pts
      if a < b
      d2 = (alat - blat) * (alat - blat) + (alon - blon) * (alon - blon)
      if d2 <= r2
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture must plant at least one near pair")
    val banded = SpecRuns.q376Pairs(spark, sf0001)
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} — pigeonhole violated")
  }

  test("q385 BH makes non-vacuous discoveries at sf0.1 and they include " +
    "a planted source") {
    val rows = Extras13.q382SequenceMatch.fn(spark, sf0001) // warm session
    rows.count()
    val bh = Stats13b.q385RandomizationBh.fn(spark, "/root/testdata/sf0.1")
      .select("source", "rejected").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val rejected = bh.filter(_._2 == 1).keySet
    assert(rejected.nonEmpty, "BH rejected nothing at sf0.1 — vacuous gate")
    val plantedSrcs = bh.keySet.filter(s =>
      s.replaceAll("[^0-9]", "").toLong % 7 == 0)
    assert(rejected.exists(plantedSrcs.contains),
      s"no planted source among rejections: $rejected vs $plantedSrcs")
  }

  test("q382 closed form equals explicit chain enumeration at sf0.001") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def matchedUsers(windowSec: Long): Set[Long] = {
      val byUser = ev.groupBy(_._1)
      byUser.collect { case (u, rows)
        if {
          val sus = rows.filter(_._2 == "signup").map(_._3)
          val cls = rows.filter(_._2 == "click").map(_._3)
          val pus = rows.filter(_._2 == "purchase").map(_._3)
          // explicit existential: any (s, c, p) with s < c <= s+W < ... p > c
          sus.exists(sv => cls.exists(cv => cv > sv && cv <= sv + windowSec &&
            pus.exists(_ > cv)))
        } => u
      }.toSet
    }
    val out = Extras13.q382SequenceMatch.fn(spark, sf0001)
      .select("window_hours", "n_matched").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == matchedUsers(3600L).size.toLong)
    assert(out(24) == matchedUsers(86400L).size.toLong)
  }
}

/** Spark-side replay of q376's candidate generation, returning the matched
  * pid pairs (the query itself folds to band counts, so the spec rebuilds
  * the pair set through the same cell join).
  */
private object SpecRuns {
  def q376Pairs(spark: org.apache.spark.sql.SparkSession,
      dir: String): Set[(Long, Long)] = {
    val pts = Spatial13.points(spark, dir)
    def cell(c: String) = expr(s"($c - pmod($c, 1000000)) div 1000000")
    val lhs = pts.select(col("pid").as("a_pid"), col("latm").as("a_lat"),
      col("lonm").as("a_lon"))
      .withColumn("cx0", cell("a_lat")).withColumn("cy0", cell("a_lon"))
      .withColumn("off", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("off2", explode(expr("array(-1L, 0L, 1L)")))
      .select(col("a_pid"), col("a_lat"), col("a_lon"),
        (col("cx0") + col("off")).as("cx"),
        (col("cy0") + col("off2")).as("cy"))
    val rhs = pts.select(col("pid").as("b_pid"), col("latm").as("b_lat"),
      col("lonm").as("b_lon"))
      .withColumn("cx", cell("b_lat")).withColumn("cy", cell("b_lon"))
    lhs.join(rhs, Seq("cx", "cy"))
      .filter(col("a_pid") < col("b_pid"))
      .withColumn("d2",
        (col("a_lat") - col("b_lat")) * (col("a_lat") - col("b_lat")) +
          (col("a_lon") - col("b_lon")) * (col("a_lon") - col("b_lon")))
      .filter(col("d2") <= 250000000000L)
      .select("a_pid", "b_pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }
}
