package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}

/** Round-13 pins: q364's banding is non-cartesian AND exactly recalls a
  * driver-side brute force (the pigeonhole claim, proven, not assumed);
  * q365 stays non-cartesian and its kept set is measured against q141's
  * (the exact-vs-ANN SemDeDup delta); q366's string features are
  * load-bearing on the decision surface and its u_seg is the Winkler
  * frequency estimate, held through EM.
  */
class Round13Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q364: no cartesian or broadcast nested loop — candidates come " +
    "from the band equi-join") {
    val p = SparkEntry.queries("q364_srp_banded_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q364: banded pair set EQUALS the brute-forced (ham<=3, cos>=0.99) " +
    "pair set — exact recall by pigeonhole — and every planted replica " +
    "lands a pair on this fixture") {
    val out = SparkEntry.queries("q364_srp_banded_neardup")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"), r.getAs[Long]("ham")))
      .toSet

    // driver-side brute force: same arithmetic (left-fold dots, the exact
    // perturbation expression) over base + derived replicas
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray))
    val reps = base.filter(_._1 % 5 == 0).map { case (id, v) =>
      (id + 1000000L,
        Array.tabulate(64)(i => v(i) + ((id + i) % 7 - 3) * 1e-4))
    }
    val corpus = base ++ reps
    val planes = Vector13.srpPlanes.map(_.toArray)
    def dotA(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }; s
    }
    val sigs = corpus.map { case (id, v) =>
      var sig = 0L
      for (k <- 0 until 64) if (dotA(v, planes(k)) > 0) sig |= (1L << k)
      (id, v, math.sqrt(dotA(v, v)), sig)
    }
    val brute = (for {
      a <- sigs; b <- sigs if a._1 < b._1
      ham = java.lang.Long.bitCount(a._4 ^ b._4)
      if ham <= 3 && dotA(a._2, b._2) / (a._3 * b._3) >= 0.99
    } yield (a._1, b._1, ham.toLong)).toSet

    assert(out == brute,
      s"banded=${out.size} brute=${brute.size}; " +
        s"missed=${(brute -- out).take(5)} extra=${(out -- brute).take(5)}")
    // fixture truth: all 100 planted pairs survive (SRP flip prob ~8e-4)
    assert(out.size == base.count(_._1 % 5 == 0),
      s"${out.size} pairs vs planted replicas")
  }

  test("q365: no cartesian; within-cell pairing only") {
    val p = SparkEntry.queries("q365_ivf_semdedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q365 vs q141: the exact-vs-ANN SemDeDup kept-set delta is real " +
    "but bounded (measured Jaccard ~0.55 on this fixture)") {
    val all = Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    def kept(name: String): Set[Long] = {
      val rows = SparkEntry.queries(name)(spark, sf).collect()
      val dropped = rows.filter(_.getAs[Int]("survivor") == 0)
        .map(_.getAs[Long]("vec_id")).toSet
      all -- dropped
    }
    val k141 = kept("q141_semantic_dedup_kmeans")
    val k365 = kept("q365_ivf_semdedup")
    assert(k141.size < all.size, "q141 dropped nothing — vacuous")
    assert(k365.size < all.size, "q365 dropped nothing — vacuous")
    val jac = (k141 & k365).size.toDouble / (k141 | k365).size
    assert(jac >= 0.40 && jac <= 1.0,
      s"kept-set Jaccard $jac outside the stability floor " +
        s"(|q141|=${k141.size} |q365|=${k365.size})")
  }

  test("q369: every SRP-dedup cluster on the planted fixture is one base " +
    "vector + its replica, and the base id survives") {
    val rows = SparkEntry.queries("q369_srp_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") == 2L, r.toString)
      val v = r.getAs[Long]("vec_id"); val c = r.getAs[Long]("cluster_id")
      assert(c == v || c == v - 1000000L, r.toString)
      assert((r.getAs[Int]("survivor") == 1) == (v == c), r.toString)
    }
    // one cluster per planted replica
    assert(rows.count(_.getAs[Int]("survivor") == 1) == rows.length / 2)
  }

  test("q370: NFC composes the planted decomposed sequences (native " +
    "expression vs JDK Normalizer), and the homoglyph repair is one " +
    "translate") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val dirty = "caf" + "e" + "́" + " " + "о" + "k" // café (decomposed) + Cyrillic о
    val out = Seq(dirty).toDF("t")
      .select(graft.functions.GraftFunctions.nfc(col("t")).as("nt"))
      .withColumn("repaired", translate(col("nt"), "оа", "oa"))
      .collect().head
    assert(out.getAs[String]("nt") ==
      java.text.Normalizer.normalize(dirty, java.text.Normalizer.Form.NFC))
    assert(out.getAs[String]("nt").contains("café"))
    assert(out.getAs[String]("repaired") == "café ok")
    // and the registered query finds the planted noise
    val agg = SparkEntry.queries("q370_unicode_hygiene")(spark, sf).collect()
    assert(agg.map(_.getAs[Long]("nfc_composed_chars")).sum > 0)
    assert(agg.map(_.getAs[Long]("homoglyph_chars")).sum > 0)
  }

  test("q371: every planted excerpt is found contained in its own source " +
    "at containment 1.0") {
    val rows = SparkEntry.queries("q371_shingle_containment")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val found = rows.map(r => (r.getAs[Long]("excerpt_id"),
      r.getAs[Long]("src_id"), r.getAs[Double]("containment")))
    val own = found.filter { case (e, b, _) => e - 2000000L == b }
    assert(own.nonEmpty, "no excerpt matched its own source")
    own.foreach { case (_, _, c) => assert(c == 1.0, s"containment $c != 1.0") }
    // every excerpt that produced shingles maps home
    val excerptIds = found.map(_._1).toSet
    assert(own.map(_._1).toSet == excerptIds,
      "an excerpt matched something >= 0.8 but not its own source")
  }

  test("q365: the SRP sub-bucket arithmetic bounds expected cell size in " +
    "(32, 64] at every corpus size — the sawtooth is an oscillating " +
    "constant, not a compounding term") {
    def ceilLog2(f: Long): Int =
      if (f <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(f - 1L)
    var n = 1024L
    while (n <= 1000000000000L) {
      val b = ceilLog2((math.ceil(n / 64.0).toLong + 15L) / 16L)
      val cells = 16L * (1L << b)
      val expCell = n.toDouble / cells
      assert(expCell <= 64.0, s"n=$n b=$b expected cell $expCell > 64")
      assert(expCell > 16.0 || n < 2048,
        s"n=$n b=$b expected cell $expCell too small — wasted cells")
      n = (n * 3) / 2
    }
  }

  test("q366: the string features change decisions — patterns equal on " +
    "(seg, tight, bal) but split by the levenshtein band get different " +
    "decisions; u_seg is the held Winkler frequency estimate") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q366_linkage_em_wide")(spark, sf01).collect()
    val byKey = rows.groupBy(r => (r.getAs[Int]("f_seg"),
      r.getAs[Int]("f_tight"), r.getAs[Int]("f_bal")))
    val split = byKey.values.exists { g =>
      g.map(_.getAs[String]("decision")).distinct.length > 1
    }
    assert(split, "no (seg,tight,bal) group is split by the string features")

    // u_seg == the chance-agreement frequency estimate, recomputed
    val clean = Tables.customer(spark, sf01).select(
      col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
    val dirtySeg = clean.select(
      when(pmod(col("ck"), lit(4)) === 0, lit("UNKNOWN"))
        .otherwise(col("seg")).as("dseg"))
    val cn = clean.groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dn = dirtySeg.groupBy("dseg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sAgree = cn.map { case (v, c) => BigInt(c) * BigInt(dn.getOrElse(v, 0L)) }.sum
    val t = BigInt(cn.values.sum) * BigInt(dn.values.sum)
    val useg = ((BigInt(2000) * sAgree + t) / (2 * t)).max(BigInt(1)).min(BigInt(999))
    rows.foreach { r =>
      assert(r.getAs[Long]("u_seg") == useg.toLong,
        s"u_seg=${r.getAs[Long]("u_seg")} != frequency estimate $useg")
    }
  }
}
