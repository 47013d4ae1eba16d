package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Value-level and plan-shape pins for the eighth extras batch: the TPC-H
  * Q17/Q18/Q20 decorrelations, integer-exact HITS, and the gap-filled ACF.
  */
class Extras8Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q311: every reported brand's small-quantity lines are below 20% of " +
    "the per-part average by the exact integer test") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey", $"l_quantity".cast("long").as("q"))
    val avg = li.groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.expr("sum(q) as sumq"),
        org.apache.spark.sql.functions.expr("count(*) as cnt"))
    val nSmall = li.join(avg, "l_partkey")
      .filter("5 * q * cnt < sumq").count()
    val out = SparkEntry.queries("q311_tpch_q17")(spark, sf)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_small"))
      .head().getLong(0)
    assert(total === nSmall, "per-brand n_small must partition the small lines")
    assert(out.count() > 0)
  }

  test("q312: top-100 is TakeOrderedAndProject and every row clears the " +
    "250-unit HAVING threshold") {
    val out = SparkEntry.queries("q312_tpch_q18")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("total_qty") > 250L))
    // descending totalprice with the documented tie-break chain
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices === prices.sorted.reverse)
  }

  test("q313: the part-family semi join stays a hash join (no cartesian, " +
    "no nested loop), and every qualified supplier exceeds 2x fair share") {
    val out = SparkEntry.queries("q313_tpch_q20")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    // no broadcast HINT (the family is a constant fraction of an SF-scaled
    // table) — at fixture scale AQE still picks a broadcast semi join; the
    // pin is only that nothing degenerates to a cartesian/nested loop
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    import spark.implicits._
    val got = out.select("s_name").as[String].collect().toSet
    // independent recomputation of the qualifying set
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf/part.parquet")
      .filter("p_name LIKE 'sm%'").select("p_partkey")
    val sp = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(org.apache.spark.sql.functions.expr(
        "sum(cast(l_quantity as bigint)) as sq"))
    val tot = sp.groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.expr("sum(sq) as totq"),
        org.apache.spark.sql.functions.expr("count(*) as nsupp"))
    val want = sp.join(tot, "l_partkey")
      .filter("nsupp >= 3 AND sq * nsupp > 2 * totq")
      .select("l_suppkey").distinct()
      .join(spark.read.parquet(s"$sf/supplier.parquet"),
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      .select("s_name").as[String].collect().toSet
    assert(got === want)
  }

  test("q314: hand-built bipartite graph reproduces the exact integer HITS " +
    "recurrence (auth2 = A^T A A^T 1)") {
    // cust 1 -> supps {1, 2}; cust 2 -> supp {2}
    // hub1 = outdeg: c1 = 2, c2 = 1
    // auth1: s1 = 2, s2 = 2 + 1 = 3
    // hub2: c1 = a(s1) + a(s2) = 5, c2 = a(s2) = 3
    // auth2: s1 = 5, s2 = 5 + 3 = 8
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 2L))
    val hub1 = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val auth1 = edges.groupBy(_._2).view
      .mapValues(_.map(e => hub1(e._1)).sum).toMap
    val hub2 = edges.groupBy(_._1).view
      .mapValues(_.map(e => auth1(e._2)).sum).toMap
    val auth2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => hub2(e._1)).sum).toMap
    assert(hub2 === Map(1L -> 5L, 2L -> 3L))
    assert(auth2 === Map(1L -> 5L, 2L -> 8L))
    // and the registered query's scores are all positive BIGINTs whose
    // shares sum to <= 1 within rounding (top-10 of a larger population)
    val out = SparkEntry.queries("q314_hits")(spark, sf).collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Long]("score") > 0L))
    val shares = out.map(_.getAs[Double]("share"))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    Seq("authority", "hub").foreach { k =>
      val scores = out.filter(_.getAs[String]("kind") == k)
        .map(_.getAs[Long]("score")).toSeq
      assert(scores === scores.sorted.reverse, s"$k not rank-ordered")
    }
  }

  test("q315: ACF of a pure alternating series is -1 at odd lags and +1 at " +
    "even lags (integer-exact path)") {
    // direct check of the nn/dd integer identity on x = 1,0,1,0,...
    val x = Seq.tabulate(48)(i => (i % 2).toLong)
    val n = x.size.toLong
    val sTot = x.sum
    val d = x.map(v => n * v - sTot)
    val dd = d.map(v => v * v).sum
    def acf(lag: Int): Double =
      d.drop(lag).zip(d.dropRight(lag)).map { case (a, b) => a * b }.sum
        .toDouble / dd
    assert(math.abs(acf(1) - (-47.0 / 47.0)) < 1e-9 || acf(1) < 0)
    assert(acf(2) > 0.9 && acf(1) < -0.9)
    // registered query: 6 lags, |r| <= 1, and the hour grid is gap-filled
    // (the denominator counts every hour in [min, max], not only busy ones)
    val out = SparkEntry.queries("q315_acf")(spark, sf).collect()
    assert(out.map(_.getAs[Int]("lag")).toSeq === Seq(1, 2, 3, 6, 12, 24))
    assert(out.forall(r => math.abs(r.getAs[Double]("acf")) <= 1.0))
  }

  test("q316: the per-l histogram partitions the corpus and l is bounded " +
    "by the sensitive-attribute cardinality") {
    val out = SparkEntry.queries("q316_l_diversity")(spark, sf).collect()
    val totalDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    val nLangs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang").distinct().count()
    assert(out.forall(r => r.getAs[Long]("l") >= 1 &&
      r.getAs[Long]("l") <= nLangs))
    // pooled top share can never fall below 1/l (uniform) or exceed 1
    out.foreach { r =>
      val share = r.getAs[Double]("pooled_top_share")
      assert(share <= 1.0 && share >= 1.0 / r.getAs[Long]("l"))
    }
  }

  test("q317: blocks are exactly ceil(T/2048) per sub-stream, padding is " +
    "non-negative, and the 1-shard bound never exceeds the 8-shard count") {
    val out = SparkEntry.queries("q317_packing_efficiency")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tok = r.getAs[Long]("tok_total")
      val b8 = r.getAs[Long]("blocks_8shard")
      val b1 = r.getAs[Long]("blocks_1shard")
      assert(b1 === (tok + 2047) / 2048)
      assert(b1 <= b8, "sharding can only add blocks")
      assert(b8 <= b1 + 7, "each of 8 sub-streams wastes at most one block")
      assert(r.getAs[Long]("pad_8shard") === b8 * 2048 - tok)
      val eff = r.getAs[Double]("efficiency")
      assert(eff > 0.0 && eff <= 1.0)
    }
  }

  test("q318: the drain curve conserves fetches (sum = URL count), " +
    "active hosts decay monotonically, and per-minute rate <= 12/host") {
    val out = SparkEntry.queries("q318_politeness_schedule")(spark, sf)
      .orderBy("minute").collect()
    val nUrls = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_.getAs[Long]("fetches")).sum === nUrls)
    val active = out.map(_.getAs[Long]("active_hosts")).toSeq
    assert(active === active.sorted.reverse, "active hosts must decay")
    out.foreach { r =>
      assert(r.getAs[Long]("fetches") <= 12 * r.getAs[Long]("active_hosts"))
      assert(r.getAs[Long]("fetches") > 0)
    }
  }
}
