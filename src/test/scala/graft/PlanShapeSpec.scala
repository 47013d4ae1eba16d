package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the plan shapes the 100 TB design depends on: if a
  * refactor breaks filter pushdown, column pruning, a broadcast, or a
  * rank-limit rewrite, these assertions fail before any benchmark notices.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: filter is pushed to the parquet scan and columns are pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    // 6 of 11 lineitem columns read
    val schema = "ReadSchema:.*".r.findFirstIn(p).getOrElse("")
    assert(schema.contains("l_returnflag") && !schema.contains("l_comment"), schema)
  }

  test("q3: dimension join broadcasts; aggregation is partial then shuffled") {
    // (at fixture scale AQE may broadcast the fact-fact join too, so only
    // the broadcast and the two-phase aggregate are stable plan facts)
    val p = plan("q3_segment_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
    assert(p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("q2: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q2_top_revenue_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q6: rank<=k filter becomes a WindowGroupLimit (partial before shuffle)") {
    val p = plan("q6_window_top_per_supplier")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("q121: the per-user 5-prefix is a WindowGroupLimit, so the path " +
    "collect_list is bounded at 5 structs per user") {
    val p = plan("q121_session_paths")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("q68: correlated scalar subqueries decorrelate into aggregate joins") {
    val p = plan("q68_correlated_scalar")
    assert(!p.contains("ScalarSubquery"), p.take(2000))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p.take(2000))
  }

  test("q1 stays inside whole-stage codegen (final adaptive plan)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // AQE only materializes the final plan on execution
    val p = df.queryExecution.executedPlan.toString
    // codegen spans print as "*(n) Operator" in the simple plan string
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p.take(2000))
  }

  test("BROADCAST hint forces a broadcast join below the auto threshold") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).createOrReplaceTempView("graft_hint_orders")
      Tables.lineitem(spark, sf).createOrReplaceTempView("graft_hint_lineitem")
      val hinted = spark.sql(
        """SELECT /*+ BROADCAST(o) */ o.o_orderpriority, count(*) AS n
          |FROM graft_hint_lineitem l JOIN graft_hint_orders o
          |  ON l.l_orderkey = o.o_orderkey
          |GROUP BY 1""".stripMargin)
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      val unhinted = spark.sql(
        """SELECT o.o_orderpriority, count(*) AS n
          |FROM graft_hint_lineitem l JOIN graft_hint_orders o
          |  ON l.l_orderkey = o.o_orderkey
          |GROUP BY 1""".stripMargin)
      assert(!unhinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At 100 TB a selective dim filter should also prune the fact scan at
    // runtime (semi-join reduction). Spark's InjectRuntimeFilter does this
    // with a bloom filter; thresholds are sized for clusters, so shrink them
    // to fixture scale to pin the rule's behavior.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val orders = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sf)
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("BloomFilterMightContain") ||
        p.contains("might_contain"), p.take(3000))
      assert(joined.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q118: retention is join-free — one aggregation pipeline, no second " +
    "full-data exchange") {
    val p = plan("q118_retention")
    assert(!p.contains("Join"), p.take(2000))
    // exactly one exchange keyed on the full event stream (user_id); the
    // later exchanges key the already-reduced cohort matrix / final sort
    val full = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(full == 1, s"expected 1 user_id exchange, got $full\n${p.take(2000)}")
  }

  test("q128: packing shuffles the documents ONCE, keyed by (lang, shard)") {
    val p = plan("q128_sequence_packing")
    // the packing window must partition by both lang and the doc_id shard —
    // partitioning by lang alone serializes a dominant language through a
    // single task (the round-4 scale-killer)
    val winExchanges = "Exchange hashpartitioning\\(lang[^)]*shard".r.findAllIn(p).length
    assert(winExchanges == 1,
      s"expected exactly one (lang, shard) exchange, got $winExchanges\n${p.take(2000)}")
    // a lang-only window partitioning must NOT reappear
    assert(!"Window .*partitionBy=\\[lang#\\d+\\]".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("q131: content decode is map-only — no exchange before the sort") {
    val p = plan("q131_multimodal_decode")
    // decode runs partition-parallel; the only exchange allowed is the
    // final presentation orderBy's range partitioning
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("q135: winnow selection is map-side — no per-doc window shuffle") {
    val p = plan("q135_substring_winnow")
    // selection must run inside the scan stage (WinnowPositions generator):
    // no Window operator and no doc_id-keyed exchange may reappear — only
    // the cross-document gram aggregation shuffles
    assert(!p.contains("Window"), p.take(2000))
    assert(!"Exchange hashpartitioning\\(doc_id".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert(p.contains("graft_winnow"), p.take(2000))
    // the cross-document group must shuffle the narrow (h, fp) key, never
    // the 40-char gram string (WinnowGroupingSpec proves row parity)
    assert(!"Exchange hashpartitioning\\(gram".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  test("pair generation is keyed, never cartesian: q148/q150/q152") {
    // each of these enumerates pairs of a self-joined corpus; the entire
    // scale story is that candidates come from EQUI-joins (wedge closure,
    // prefix tokens, shared postings) — a cartesian/NLJ in any of them
    // means the pruning silently stopped reaching the planner
    for (q <- Seq("q148_triangle_count", "q150_prefix_jaccard_join",
        "q152_tfidf_cosine_pairs", "q156_banded_perceptual_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q\n${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q\n${p.take(2000)}")
    }
  }

  test("q157/q161: IVFADC search is a broadcast probe join, never cartesian") {
    // q157/q255 return a localCheckpoint (concurrency isolation), which
    // hides the search plan behind an RDD scan — so q157's pin inspects
    // the shared search builder directly; q161 still plans inline
    val plans = Seq(
      "q157_ivfadc(search)" ->
        ops.Vectors.ivfAdcSearch(spark, sf, 5)
          .queryExecution.executedPlan.toString,
      "q161_ivfadc_residual" -> plan("q161_ivfadc_residual"))
    for ((q, p) <- plans) {
      // the query batch must broadcast to the code table and join on cell
      // id; a cartesian/NLJ here means the cell equi-join stopped reaching
      // the planner and search degraded to scanning every code per query
      assert(p.contains("BroadcastHashJoin"), s"$q\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q\n${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q\n${p.take(2000)}")
    }
  }

  test("q151: perceptual hashing is map-side; NN argmin partial-aggregates") {
    val p = plan("q151_perceptual_dedup")
    // decode+dhash run inside the scan stage (no exchange keyed by doc_id
    // before the pair join) and the per-vid argmin must collapse map-side
    // (partial max over the struct) before its shuffle
    assert(p.contains("partial_max") || p.contains("partial max"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("round-7 pair/postings generators are keyed, never cartesian") {
    // q198 joins source shingle sets on the shingle, q200 runs three
    // inverted-postings joins on term — both lose their scale story if
    // the equi-key stops reaching the planner. These queries return a
    // localCheckpoint (verify-pass isolation), so the pins inspect the
    // pre-checkpoint builders (forPlan = true), not the RDD scan.
    val builders = Seq(
      "q198_source_overlap" -> (() => ops.Text.q198Df(spark, sf, forPlan = true)),
      "q200_rocchio_prf" -> (() => ops.Retrieval.q200Df(spark, sf, forPlan = true)))
    for ((q, build) <- builders) {
      val p = build().queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q\n${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q\n${p.take(2000)}")
    }
    // q203's IVF side must stay a cell equi-join; its ground-truth side is
    // a DELIBERATE broadcast NLJ (bounded 10-query brute force), so only
    // cartesian is banned there
    assert(!ops.Vectors.q203Df(spark, sf, forPlan = true)
      .queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("q189: heavy-hitter exact phase joins the candidate set broadcast") {
    // the MG candidates are O(parts * k) rows; if this ever becomes a
    // shuffle join the full token stream reshuffles by term — exactly what
    // the sketch exists to avoid. Pin reads the pre-checkpoint builder.
    val p = ops.Sketches.q189Df(spark, sf, forPlan = true)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q273: HTML extraction is a map-only scan — no data exchange before the sort") {
    val p = plan("q273_html_extract")
    // synthesis + prune + classify + extract are all expressions over one
    // scan; the only exchange is the final orderBy's range partitioning
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
    assert(!p.contains("BatchEvalPython") && !p.contains("SQLUDF"), p.take(2000))
  }

  test("q275: robots matching has no per-row regex and no cartesian") {
    val p = plan("q275_robots_filter")
    // the glob fold compiles to HOF expressions (startsWith/locate), so a
    // regression to rlike/regexp-based matching (per-row Pattern.compile
    // with a column pattern) shows up as RLike in the plan
    assert(!p.contains("RLike") && !p.contains("regexp"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q282: the fact scan carries a dynamic partition-pruning filter") {
    val p = plan("q282_dynamic_partition_pruning")
    // the dim's month set must reach the fact scan as a runtime partition
    // filter (DPP subquery); losing it means every month directory of a
    // 100 TB fact table gets read to serve a ~1-in-12 month selection
    assert(p.contains("dynamicpruning"), p.take(3000))
    assert(p.contains("PartitionFilters"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q285: the per-anchor top-3 is a WindowGroupLimit over a keyed join") {
    val p = plan("q285_negative_sampling")
    // candidates come from a bucket equi-join and the rank<=3 must prune
    // map-side — losing either turns negative mining into an n² shuffle
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q284: the fingerprint is one scan into a partial aggregate") {
    val p = plan("q284_dataset_fingerprint")
    // digest/count/checksum must combine map-side (partial_*) — the whole
    // point of the XOR fold is that per-bucket state is O(1) per task
    assert(p.contains("partial_bit_xor") || p.contains("partial bit_xor"),
      p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
  }

  test("q286: BOTH replica and primary scans are scoped by broadcast " +
    "semi-joins on the mismatched-bucket frame") {
    val p = plan("q286_replica_diff")
    // the ≤64-row digest-mismatch frame must broadcast and semi-join BOTH
    // sides BEFORE the row-level count diff — pruning only one side still
    // shuffles a full table at 100 TB (the round-9 review catch)
    val semis = "LeftSemi".r.findAllIn(p).length
    assert(semis >= 2, s"expected 2 semi-join prunes, got $semis\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q138: batch aggregation reuses the stream window's partitioning") {
    val p = plan("q138_length_batches")
    // one (bucket, shard) exchange feeds BOTH the window and the batch
    // aggregate — hash partitioning on a subset of the grouping keys
    // satisfies the aggregate's distribution, so no second data shuffle
    val dataExchanges = "Exchange hashpartitioning\\(bucket".r.findAllIn(p).length
    assert(dataExchanges == 1,
      s"expected exactly one (bucket, shard) exchange, got $dataExchanges\n${p.take(2000)}")
  }
}
