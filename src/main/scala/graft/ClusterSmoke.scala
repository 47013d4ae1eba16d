package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke: runs the most shuffle-heavy registered queries
  * under `local-cluster[2,16,…]` — two real executor JVMs with separate
  * heaps, real serialization, and real broadcast transport — to catch the
  * assumptions single-JVM `local[n]` hides (closure serializability,
  * broadcast-literal sizes, executor-side class resolution, block fetch
  * across processes). The round-7 verdict's stretch item.
  *
  * Emits one BENCH-style JSON line:
  * `{"metric":"cluster_smoke","executors":2,"queries":{...},"value":N}`.
  *
  * Needs the application jar on the executor classpath: pass it via
  * `-Dgraft.jar=<path>` (workers are separate JVMs — unlike local mode
  * they do not inherit the launcher's classpath for user classes).
  *
  * The DRIVER java invocation must also carry Spark's JDK-17 module
  * options (the `--add-opens` list from
  * `org.apache.spark.launcher.JavaModuleOptions` — same list build.sbt
  * applies to forked runs): spark-submit injects them, a raw `java -cp`
  * does not, and the workers' executors get them from spark-class — so
  * without them the failure is asymmetric and query-selective (executor
  * side fine, driver-side row DECODE of a DateType via
  * `sun.util.calendar.ZoneInfo` throws IllegalAccessException — found by
  * the first full-inventory run: 269/270 green, q244 alone red).
  */
object ClusterSmoke {

  /** Shuffle-heavy / serialization-sensitive picks across families:
    * graph Pregel rounds, fact⋈fact joins, postings self-joins, ANN
    * probe pipelines, k-means training loops, windowed funnels, the
    * rebalance path, the heaviest aggregation shapes — plus two
    * STREAMING pipelines (micro-batch state stores, watermark eviction,
    * stream-stream join state) whose executor-side state machinery
    * local[n] exercises only in-process, and the mapPartitions codec
    * path (executor-side class resolution for the pure-JVM decoders).
    */
  private[graft] val picks = Seq(
    "q3_segment_revenue", "q17_rebalance_hash", "q59_dedup_clusters",
    "q98_pagerank", "q103_tpch_q3", "q104_tpch_q10", "q118_retention",
    "q128_sequence_packing", "q137_kmeans", "q141_semantic_dedup_kmeans",
    "q145_streaming_dedup", "q148_triangle_count", "q152_tfidf_cosine_pairs",
    "q154_stream_stream_join", "q157_ivfadc", "q167_bm25_topk", "q184_sssp",
    "q186_label_prop", "q194_skew_report", "q198_source_overlap",
    "q212_association_rules", "q214_mix_shift", "q215_assortativity",
    "q227_local_supplier_volume", "q270_mjpeg_frames",
    // r11: the composed pipeline (multi-stage shuffles + broadcast vocab +
    // executor-side WARC/HTML/UTF-8 parsers in one lineage) and the
    // right-outer streaming join's two-store state machinery
    "q308_pipeline_capstone", "q309_stream_right_outer_join",
    "q310_streaming_corpus_ingest")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // SPARK_GRAFT_SMOKE=all runs the ENTIRE registered inventory under the
    // two-executor cluster — the definitive multi-executor artifact; a
    // comma-separated name list reproduces individual cluster-only
    // failures; the default stays the curated shuffle-heavy picks.
    val names = sys.env.get("SPARK_GRAFT_SMOKE") match {
      case Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(list)  => list.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      case None        => picks
    }
    val jar = sys.props.get("graft.jar")
    // SPARK_GRAFT_CLUSTER overrides the topology, e.g. "4,8,6144" for four
    // executor JVMs × 8 cores — more real block-fetch/broadcast edges than
    // the default two-executor layout (executor memory scales to match)
    val topo = sys.env.getOrElse("SPARK_GRAFT_CLUSTER", "2,16,8192")
    val execMem = topo.split(",")(2).trim.toInt
    val builder = SparkSession.builder()
      .master(s"local-cluster[$topo]")
      .appName("graft-cluster-smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", s"${math.max(execMem - 1024, 2048)}m")
    val spark = jar.fold(builder)(j => builder.config("spark.jars", j))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // untimed warmup (the Bench discipline): executor launch, parquet
    // footer reads, codegen, and broadcast machinery otherwise land on
    // whichever query happens to run first and distort its number
    try {
      SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
      spark.catalog.clearCache()
    } catch { case e: Throwable =>
      System.err.println(s"[cluster-smoke] warmup skipped: ${e.getMessage}")
    }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      val n =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch {
          case e: Throwable =>
            System.err.println(s"[cluster-smoke] $name FAILED: ${e.getMessage}")
            e.printStackTrace()
            -1L
        }
      spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[cluster-smoke] $name%-28s rows=$n%6d ${sec}%8.2f s")
      (name, n, if (n < 0) -1.0 else math.round(sec * 1000) / 1000.0)
    }
    val nFail = results.count(_._2 < 0)
    val total = math.round(results.filter(_._2 >= 0).map(_._3).sum * 1000) / 1000.0
    val qs = results.map { case (k, _, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val Array(nExec, nCores, _) = topo.split(",").map(_.trim)
    println(s"""{"metric":"cluster_smoke","executors":$nExec,"cores_per_executor":$nCores,""" +
      s""""sf_dir":"$sfDir","failures":$nFail,"queries":$qs,""" +
      s""""value":$total,"unit":"sec"}""")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
