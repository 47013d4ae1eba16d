package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins for the q279 batch perceptron and the q281 randomized-response
  * mechanism: the distributed aggregate trace must equal a sequential
  * whole-dataset fold (integer exactness = partitioning invariance), and
  * the DP mechanism must be replayable row by row from its hash.
  */
class TrainingSpec extends AnyFunSuite with SparkSpec {

  /** Sequential reference: one batch-perceptron epoch is Σ y·x over rows
    * with y·(w·x) ≤ 0, applied to w. */
  private def reference(rows: Seq[(Long, Seq[Long])],
      epochs: Int): Seq[(Int, Long, Seq[Long])] = {
    val d = rows.head._2.length
    var w = Seq.fill(d)(0L)
    (1 to epochs).map { ep =>
      val mis = rows.filter { case (y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L
      }
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + mis.map { case (y, x) => y * x(i) }.sum
      }
      (ep, mis.size.toLong, w)
    }
  }

  test("distributed trace equals the sequential fold on planted data, " +
    "at 1 and 8 partitions") {
    // planted near-separable data: y = +1 iff x1 > x2, with two rows the
    // first-epoch weights misclassify so later epochs actually move
    val rows: Seq[(Long, Seq[Long])] = Seq(
      (1L, Seq(1L, 9L, 2L)), (1L, Seq(1L, 7L, 1L)), (1L, Seq(1L, 5L, 4L)),
      (-1L, Seq(1L, 2L, 8L)), (-1L, Seq(1L, 1L, 6L)), (-1L, Seq(1L, 4L, 5L)),
      (1L, Seq(1L, 6L, 5L)), (-1L, Seq(1L, 3L, 3L)))
    val want = reference(rows, 4)
    import spark.implicits._
    for (parts <- Seq(1, 8)) {
      val f = rows.map { case (y, x) => (y, x(0), x(1), x(2)) }
        .toDF("y", "x0", "x1", "x2").repartition(parts)
      val got = Training.trainTrace(f, Seq("x0", "x1", "x2"), epochs = 4)
      assert(got == want, s"parts=$parts")
    }
    // and the trace is non-trivial: weights move after epoch 1
    assert(want(1)._3 != want(0)._3)
  }

  test("q279 on the fixture: epoch-1 update is Σ y·x over ALL rows") {
    val out = graft.SparkEntry
      .queries("q279_perceptron_train")(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getInt(0))
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("lang", "text", "n_chars").collect()
    def occ(t: String, w: String) = (t.length - t.replace(w, "").length) / w.length
    val expected = docs.map { r =>
      val y = if (r.getString(0) == "en") 1L else -1L
      val t = r.getString(1)
      (y, Seq(1L, t.split(" ", -1).length.toLong, r.getLong(2),
        occ(t, "table").toLong, occ(t, "data").toLong))
    }
    val e1 = out.head
    assert(e1.getLong(1) == docs.length.toLong) // w0=0 ⇒ all misclassified
    (0 until 5).foreach { i =>
      assert(e1.getLong(2 + i) == expected.map { case (y, x) => y * x(i) }.sum,
        s"w$i")
    }
  }

  test("property: distributed trace equals the sequential fold on random " +
    "integer datasets at 1 and 8 partitions (20 seeded samples)") {
    // the integer-exactness claim generalized: ANY dataset of small-int
    // features must produce a bit-identical trace at any parallelism
    import spark.implicits._
    val rnd = new scala.util.Random(0x9279)
    for (sampleIdx <- 0 until 20) {
      val n = 5 + rnd.nextInt(40)
      val rows: Seq[(Long, Seq[Long])] = Seq.fill(n) {
        val y = if (rnd.nextBoolean()) 1L else -1L
        (y, Seq(1L, rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong))
      }
      val want = reference(rows, 3)
      for (parts <- Seq(1, 8)) {
        val f = rows.map { case (y, x) => (y, x(0), x(1), x(2)) }
          .toDF("y", "x0", "x1", "x2").repartition(parts)
        val got = Training.trainTrace(f, Seq("x0", "x1", "x2"), epochs = 3)
        assert(got == want, s"sample#$sampleIdx parts=$parts")
      }
    }
  }

  test("Bradley-Terry MM recovers a planted skill ordering and fits " +
    "closed-form two-player odds") {
    // two players, 30 battles: A wins 20. The stationary point of the MM
    // iteration satisfies w_A/w_B = 20/10 = 2, and with mean-1
    // normalization that is w_A = 4/3, w_B = 2/3.
    val g2 = Map((0, 1) -> 30L, (1, 0) -> 30L)
    val r2 = Training.bradleyTerry(g2, Map(0 -> 20L, 1 -> 10L), iters = 50)
    assert(math.abs(r2(0) - 4.0 / 3) < 1e-9 && math.abs(r2(1) - 2.0 / 3) < 1e-9, r2)
    // three players with a planted strength order 2 > 1 > 0 from
    // consistent head-to-head records must rank in that order
    val g3 = Map((0, 1) -> 20L, (1, 0) -> 20L, (1, 2) -> 20L, (2, 1) -> 20L,
      (0, 2) -> 20L, (2, 0) -> 20L)
    val r3 = Training.bradleyTerry(g3,
      Map(0 -> 9L, 1 -> 23L, 2 -> 28L), iters = 30)
    assert(r3(2) > r3(1) && r3(1) > r3(0), r3)
    // ratings stay normalized to mean 1
    assert(math.abs(r3.values.sum / 3 - 1.0) < 1e-9)
  }

  test("q288 upweights the hardest domain: weight/base uplift orders by loss") {
    val out = graft.SparkEntry.queries("q288_doremi_weights")(
      spark, "/root/testdata/sf0.001").collect()
    val uplift = out.map(r =>
      r.getDouble(2) -> r.getDouble(4) / r.getDouble(3)) // loss -> w/base
    // monotone: a strictly higher loss never gets a lower uplift
    for (Seq((l1, u1), (l2, u2)) <- uplift.sortBy(_._1).toSeq.sliding(2)) {
      assert(l1 == l2 || u1 <= u2 + 1e-9, s"loss $l1->$l2 uplift $u1->$u2")
    }
    // weights stay a distribution
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-3)
  }

  test("q290 iteration: weights chase the max-loss domain monotonically " +
    "and converge onto the minimax support") {
    val base = Seq(0.4, 0.3, 0.2, 0.1)
    val losses = Seq(5.0, 6.0, 7.0, 9.0)
    val trace = Training.doremiIterate(base, losses, rounds = 20)
    // every round: weights are a distribution
    trace.foreach { case (_, _, w) =>
      assert(math.abs(w.sum - 1.0) < 1e-4, w)
    }
    // the hardest domain's weight grows monotonically round over round
    val hard = trace.map(_._3.last)
    for (Seq(a, b) <- (base.last +: hard).sliding(2))
      assert(b >= a - 1e-9, s"hard-domain weight fell: $a -> $b")
    // mixture loss is non-decreasing (the mixture chases the max)
    for (Seq(a, b) <- trace.map(_._1).sliding(2))
      assert(b >= a - 1e-3, s"mixture loss fell: $a -> $b")
    // with a fixed loss vector the minimax equilibrium is all mass on the
    // max-loss domain; the update stalls asymptotically as the mixture
    // loss approaches the max (excess → 0), so pin "essentially there"
    // rather than exact: > 95% of the mass after 20 rounds
    assert(hard.last > 0.95, s"expected convergence to max-loss domain, got ${trace.last._3}")
    // a domain at the mixture loss or below has zero excess in that round
    trace.foreach { case (m, ex, _) =>
      ex.lazyZip(losses).foreach { (e, l) =>
        if (l <= m) assert(e == 0.0, s"loss $l <= mix $m but excess $e")
      }
    }
  }

  test("q281 mechanism replays row-by-row and the estimator debiases") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q281_randomized_response")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val langs = Seq("de", "en", "es", "fr", "zh")
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // row-by-row replay of the deterministic mechanism
    val reported = docs.map { case (id, lang) =>
      val h = (id % 2147483647L * 2654435761L) % 4294967296L
      if (h % 4 != 0) lang else langs(((h / 4) % 5).toInt)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val trueCounts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toDouble
    langs.foreach { l =>
      val (nTrue, nRep, est) = out(l)
      assert(nTrue == trueCounts(l), s"$l true")
      assert(nRep == reported(l), s"$l reported")
      val want = BigDecimal((nRep - n / 20.0) / 0.75)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(est - want) < 1e-9, s"$l est=$est want=$want")
      // utility: the debiased estimate lands nearer truth than the raw
      // noisy count can drift — within 3·binomial-sd of the true count
      val sd = math.sqrt(n * 0.25 * 0.75) / 0.75
      assert(math.abs(est - nTrue) <= 3 * sd + 1, s"$l est=$est true=$nTrue")
    }
  }
}
