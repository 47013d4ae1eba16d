package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained streaming-throughput + state-size audit — the round-11
  * verdict's ask #4: the interval-join matrix and q310 are
  * correctness-gated but latency-dominated (~5 s of micro-batch
  * scheduling each), so nothing measured whether the streaming path is
  * BOUNDED-STATE under a long replay. This tool runs the q310 pipeline
  * shape (stream-static fingerprint anti-join admission +
  * `dropDuplicatesWithinWatermark` re-delivery suppression) over an
  * N×-replicated, many-file, mtime-pinned replay with
  * `Trigger.AvailableNow`, and records per micro-batch: input rows,
  * trigger wall time, dedup-state rows and bytes.
  *
  * The replay is built so the state-store claim is falsifiable:
  *  - event time advances ~rowsPerFile seconds per file while the
  *    watermark horizon is TWO files of event time, so the watermark
  *    passes early keys mid-replay and `dropDuplicatesWithinWatermark`
  *    MUST evict — a
  *    leak shows as monotonically growing state_rows instead of a
  *    plateau;
  *  - every file k ≥ 1 also re-delivers an exact 1/7 slice of file k−1's
  *    rows (same identity, same event time, one event-time file behind —
  *    inside the horizon), so the suppression path stays load-bearing
  *    across every batch boundary: the sink must hold each admitted
  *    identity EXACTLY once, which the tool asserts by re-reading it;
  *  - arrivals replicate the WHOLE corpus under fresh identities while
  *    the static fingerprint side is the doc_id % 3 == 0 corpus slice,
  *    so the anti-join rejects a third of every batch (admission, not
  *    pass-through).
  *
  * Usage: runMain graft.tools.StreamThroughput <sfDir> <outJson>
  *          [replicas=400] [files=24] [provider=hdfs|rocksdb]
  * `provider=rocksdb` swaps the state store for
  * RocksDBStateStoreProvider — the store a production cluster runs when
  * dedup state outgrows executor heap — so the same replay proves the
  * plateau on both backends (the round-12 verdict's ask #5).
  * Output: STREAMTHROUGH JSON (one object) written to <outJson> and
  * echoed on stdout.
  */
object StreamThroughput {

  private def stageFile(s: SparkSession, base: String, src: String,
      name: String, mtime: Long, df: DataFrame): Unit = {
    val conf = s.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    val tmp = s"$base/tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(src))
    val dest = new org.apache.hadoop.fs.Path(s"$src/$name.parquet")
    fs.rename(part, dest)
    fs.setTimes(dest, mtime, -1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 400
    val nFiles = if (args.length > 3) args(3).toInt else 24
    val provider = if (args.length > 4) args(4) else "hdfs"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // sized from the replay, not a constant: every file batch plus the
      // re-delivery margin must fit or early batches silently drop out of
      // input_rows/busy_secs/state_rows_max and state_bounded can read
      // true spuriously (round-12 ADVICE)
      .config("spark.sql.streaming.numRecentProgressUpdates",
        (2 * nFiles + 20).toString)
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.Path
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft_streamthrough"
    val (src, dest, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    val hconf = spark.sessionState.newHadoopConf()
    for (d <- Seq(src, dest, ckpt)) {
      val p = new Path(d); p.getFileSystem(hconf).delete(p, true)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
    val nDocs = docs.count()
    val totalRows = nDocs * replicas
    val rowsPerFile = (totalRows + nFiles - 1) / nFiles
    val horizonSecs = rowsPerFile * 2

    // replicate under fresh identities; global row id g orders event time
    // at one row per second, so each file spans ~rowsPerFile seconds
    val rep = spark.range(replicas).crossJoin(docs)
      .withColumn("g", col("id") * nDocs + col("doc_id"))
      .select((col("doc_id") + col("id") * 10000000L).as("doc_id"),
        col("source"), col("lang"), col("t"), col("g"),
        timestamp_micros(col("g") * 1000000L).as("ts"),
        (col("g") / rowsPerFile).cast("int").as("file_idx"))
      .persist()

    val t0stage = System.nanoTime()
    for (k <- 0 until nFiles) {
      val cur = rep.filter(col("file_idx") === k)
        .select("doc_id", "source", "lang", "t", "ts")
      // re-deliver an exact 1/7 slice of the PREVIOUS file: same identity,
      // same event time, one file behind — inside the two-file horizon, so
      // the dedup state must suppress every one of them
      val redeliver =
        if (k == 0) cur.limit(0)
        else rep.filter(col("file_idx") === (k - 1) &&
            pmod(col("doc_id"), lit(7)) === 1)
          .select("doc_id", "source", "lang", "t", "ts")
      stageFile(spark, base, src, f"f$k%03d",
        1000000000000L + k * 60000L, cur.unionAll(redeliver))
    }
    val stageSecs = (System.nanoTime() - t0stage) / 1e9
    rep.unpersist()

    val staticFp = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(md5(trim(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
      .distinct()
    val schema = spark.read.parquet(src).schema

    val admitted = graft.streaming.StreamingDedup.dedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("fp", md5(col("t")))
        .join(staticFp, Seq("fp"), "left_anti"),
      Seq("doc_id"), "ts", s"$horizonSecs seconds")

    val t0 = System.nanoTime()
    val q = admitted
      .select(col("doc_id"), col("source"), col("lang"), col("fp"),
        size(split(col("t"), " ")).cast("long").as("n_tok"))
      .writeStream
      .format("parquet")
      .option("path", dest)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wallSecs = (System.nanoTime() - t0) / 1e9

    val progress = q.recentProgress.filter(_.numInputRows > 0)
    val batches = progress.map { p =>
      val st = p.stateOperators.headOption
      val trig = p.durationMs.getOrDefault("triggerExecution", 0L)
      (p.batchId, p.numInputRows, trig / 1000.0,
        st.map(_.numRowsTotal).getOrElse(0L),
        st.map(_.memoryUsedBytes).getOrElse(0L))
    }
    val inputRows = batches.map(_._2).sum
    val busySecs = batches.map(_._3).sum

    // correctness gate on the replay itself: each admitted identity lands
    // exactly once (re-deliveries suppressed), and admission rejected the
    // static-matching third
    val sink = spark.read.parquet(dest)
    val sinkRows = sink.count()
    val sinkIds = sink.select("doc_id").distinct().count()
    require(sinkRows == sinkIds,
      s"re-delivery leaked into the sink: $sinkRows rows, $sinkIds ids")
    // batch replay of the admission join: what a correct stream must admit
    val expected = replicas * docs
      .withColumn("fp", md5(col("t")))
      .join(staticFp, Seq("fp"), "left_anti").count()
    require(sinkRows == expected,
      s"admission drift: sink=$sinkRows expected=$expected")

    // a fully-empty progress list means the source was mis-staged or the
    // schema didn't match — fail with THAT, not NoSuchElementException
    // from the summary math (round-12 ADVICE)
    require(batches.nonEmpty,
      s"no micro-batch reported input rows — source staging under $src " +
        "or the replay schema is broken")
    val maxState = batches.map(_._4).max
    val finalState = batches.last._4
    val batchJson = batches.map { case (id, rows, secs, srows, sbytes) =>
      s"""{"batch":$id,"rows":$rows,"secs":${math.round(secs * 1000) / 1000.0},""" +
        s""""state_rows":$srows,"state_bytes":$sbytes}"""
    }.mkString("[", ",", "]")
    val loadavg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val json =
      s"""{"metric":"stream_throughput","sf":"$sfDir","provider":"$provider","replicas":$replicas,""" +
        s""""files":$nFiles,"total_rows":$totalRows,"input_rows":$inputRows,""" +
        s""""admitted_rows":$sinkRows,"stage_secs":${math.round(stageSecs * 10) / 10.0},""" +
        s""""wall_secs":${math.round(wallSecs * 10) / 10.0},""" +
        s""""busy_secs":${math.round(busySecs * 10) / 10.0},""" +
        s""""rows_per_sec":${math.round(inputRows / wallSecs)},""" +
        s""""rows_per_busy_sec":${math.round(inputRows / busySecs)},""" +
        s""""state_rows_max":$maxState,"state_rows_final":$finalState,""" +
        s""""state_bounded":${maxState <= 4 * rowsPerFile},""" +
        s""""loadavg":${math.round(loadavg * 100) / 100.0},""" +
        s""""batches":$batchJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
