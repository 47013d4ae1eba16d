package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}

/** The round-11 verdict's convergence ask for q342: the UNSUPERVISED EM
  * weights must land near the SUPERVISED q320 weights on the same
  * derived-replica fixture. Runs at sf0.01, not sf0.001 — EM needs the
  * unmatch class populated, and the sf0.001 blocking yields only ~64
  * non-match pairs (the match/unmatch balance there starves the u
  * estimates; by sf0.01 the blocked pair space is ~10⁴ with a 1:5 ratio
  * and the EM fixed point sits within tens of per-mille of supervised).
  */
class LinkageEmSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q342: EM-estimated m/u/p converge to (near) the supervised q320 " +
    "weights, and the decision surface separates the extreme patterns") {
    val em = SparkEntry.queries("q342_fellegi_sunter_em")(spark, sf).collect()
    assert(em.nonEmpty)
    val h = em.head
    val (pEm, mEm, uEm) = (h.getAs[Long]("p_match"),
      Seq(h.getAs[Long]("m_seg"), h.getAs[Long]("m_tight"),
        h.getAs[Long]("m_bal")),
      Seq(h.getAs[Long]("u_seg"), h.getAs[Long]("u_tight"),
        h.getAs[Long]("u_bal")))

    // supervised reference: q320's estimation replicated WITH the ck=dk
    // label (the exact per-mille quantization q320 uses)
    val bal = round(col("c_acctbal") * 100, 0).cast("long")
    val clean = Tables.customer(spark, sf).select(
      col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
      col("c_mktsegment").as("seg"), bal.as("bal"))
    val dirty = clean.select(
      col("ck").as("dk"), col("nk").as("dnk"),
      when(pmod(col("ck"), lit(4)) === 0, lit("UNKNOWN"))
        .otherwise(col("seg")).as("dseg"),
      (col("bal") + pmod(col("ck"), lit(7)) - 3).as("dbal"))
    // the supervised reference must block EXACTLY like q342 — adaptive
    // width (see SCALING_r13B.json), not the retired fixed $1000 bucket
    val widthFrame = Tables.customer(spark, sf)
      .agg(greatest(lit(100L),
        expr("(1100000L * 256L) div count(*)")).as("width"))
    val st = clean.crossJoin(broadcast(widthFrame))
      .withColumn("blk", expr("(bal + 100000L) div width"))
      .join(dirty.crossJoin(broadcast(
        widthFrame.select(col("width").as("dwidth"))))
        .withColumn("dblk", expr("(dbal + 100000L) div dwidth")),
        col("nk") === col("dnk") && col("blk") === col("dblk"))
      .select(
        when(col("seg") === col("dseg"), 1L).otherwise(0L).as("f_seg"),
        when(col("bal") === col("dbal"), 1L).otherwise(0L).as("f_tight"),
        when(abs(col("bal") - col("dbal")) <= 3, 1L).otherwise(0L).as("f_bal"),
        when(col("ck") === col("dk"), 1L).otherwise(0L).as("m"))
      .agg(count(lit(1)).as("n"), sum("m").as("mt"),
        sum(col("m") * col("f_seg")).as("ms"),
        sum(col("m") * col("f_tight")).as("mg"),
        sum(col("m") * col("f_bal")).as("mb"),
        sum((lit(1L) - col("m")) * col("f_seg")).as("us"),
        sum((lit(1L) - col("m")) * col("f_tight")).as("ug"),
        sum((lit(1L) - col("m")) * col("f_bal")).as("ub"))
      .collect().head
    def pm(a: Long, tot: Long): Long = {
      val t = math.max(tot, 1L)
      math.min(math.max((2000L * a + t) / (2L * t), 1L), 999L)
    }
    val n = st.getAs[Long]("n"); val mt = st.getAs[Long]("mt")
    val ut = n - mt
    val pSup = pm(mt, n)
    val mSup = Seq(pm(st.getAs[Long]("ms"), mt), pm(st.getAs[Long]("mg"), mt),
      pm(st.getAs[Long]("mb"), mt))
    val uSup = Seq(pm(st.getAs[Long]("us"), ut), pm(st.getAs[Long]("ug"), ut),
      pm(st.getAs[Long]("ub"), ut))

    assert(math.abs(pEm - pSup) <= 30,
      s"p: em=$pEm sup=$pSup (per-mille)")
    mEm.zip(mSup).zipWithIndex.foreach { case ((e, s2), i) =>
      assert(math.abs(e - s2) <= 120, s"m[$i]: em=$e sup=$s2")
    }
    uEm.zip(uSup).zipWithIndex.foreach { case ((e, s2), i) =>
      assert(math.abs(e - s2) <= 30, s"u[$i]: em=$e sup=$s2")
    }

    // the learned decision surface separates the extremes without labels
    val byPat = em.map(r => ((r.getAs[Int]("f_seg"), r.getAs[Int]("f_tight"),
      r.getAs[Int]("f_bal")), r)).toMap
    byPat.get((1, 1, 1)).foreach { r =>
      assert(r.getAs[String]("decision") == "link", s"$r")
      assert(r.getAs[Long]("w_ppm") >= 990000L, s"$r")
    }
    byPat.get((0, 0, 0)).foreach { r =>
      assert(r.getAs[String]("decision") == "non-link", s"$r")
      assert(r.getAs[Long]("w_ppm") <= 10000L, s"$r")
    }
  }
}
