package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Physical-layout operators — the storage-side design levers that matter at
  * 100 TB: raw text ingestion, partitioned (hive-layout) sinks with partition
  * pruning, bucketed co-located joins, and schema evolution across parquet
  * batches.
  */
object Layout {

  private def workDir(s: org.apache.spark.sql.SparkSession, sfDir: String,
      tag: String): String =
    graft.WorkDir.resolve(s, s"layout_$tag", sfDir)

  /** Raw text-file ingestion: the corpus arrives as newline-delimited text
    * (one doc per line, tab-separated id), the common landing format before
    * any columnar conversion. spark.read.text → split → typed columns.
    */
  val q83TextSource = GraftQuery(
    "q83_text_source",
    (s, dir) => {
      val out = workDir(s, dir, "text")
      Tables.documents(s, dir)
        .select(concat_ws("\t", col("doc_id"),
          regexp_replace(col("text"), "[\\t\\n]", " ")).as("value"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .withColumn("doc_id", split(col("value"), "\t").getItem(0).cast("long"))
        .withColumn("body", split(col("value"), "\t").getItem(1))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("body"))).as("chars"),
          min("doc_id").as("min_id"))
        .orderBy("bucket")
    },
    // the oracle applies the same tab/newline scrub the text sink roundtrip
    // forces (those bytes are the line format's delimiters)
    Some("""SELECT doc_id % 10 AS bucket, count(*) AS n,
           |  CAST(sum(length(regexp_replace(text, '[\t\n]', ' ', 'g'))) AS BIGINT) AS chars,
           |  min(doc_id) AS min_id
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Hive-layout partitioned sink + partition-pruned scan: events land
    * partitioned by event_type, and a type-filtered read touches ONLY that
    * partition's files — at 100 TB the difference between scanning one
    * directory and scanning them all. PlanShapeSpec asserts the pruning.
    */
  val q84PartitionedWrite = GraftQuery(
    "q84_partitioned_write",
    (s, dir) => {
      val out = workDir(s, dir, "part")
      Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .filter(col("event_type") === "click")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          round(sum("value"), 2).as("total"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |  count(DISTINCT user_id) AS n_users, round(sum(value), 2) AS total
           |FROM events WHERE event_type = 'click'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Bucketed co-located join: orders and lineitem both bucketed 8 ways on
    * the join key at write time, so the join needs NO shuffle — each task
    * reads matching buckets from both sides (verified by LayoutSpec: no
    * Exchange under the join). This is Spark's answer to the reference's
    * sharding-expression co-location.
    */
  val q85BucketedJoin = GraftQuery(
    "q85_bucketed_join",
    (s, dir) => {
      val suffix = dir.replaceAll("[^0-9a-zA-Z]", "_")
      val (ot, lt) = (s"graft_bkt_orders_$suffix", s"graft_bkt_lineitem_$suffix")
      // the in-memory catalog dies with the JVM but warehouse dirs persist;
      // clear any orphaned location so CREATE doesn't trip over it
      Seq(ot, lt).filterNot(s.catalog.tableExists).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/$t")
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      }
      // repartition on the bucket key into numBuckets partitions: Spark's
      // repartition hash == bucket hash (murmur3 pmod n), so every task holds
      // exactly one bucket and writes ONE file — without this, each of the 32
      // input partitions spills a file per bucket it sees (256 small files)
      if (!s.catalog.tableExists(ot)) {
        Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
          .repartition(8, col("o_orderkey"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable(ot)
      }
      if (!s.catalog.tableExists(lt)) {
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity", "l_extendedprice")
          .repartition(8, col("l_orderkey"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable(lt)
      }
      s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_orderkey") % 4).as("bucket"))
        .agg(
          count(lit(1)).as("n_lines"),
          round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("bucket")
    },
    Some("""SELECT o_orderkey % 4 AS bucket, count(*) AS n_lines,
           |  round(sum(l_extendedprice), 2) AS revenue
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Schema evolution: two parquet batches with different column sets (the
    * later batch adds a quality score) merge into one logical table via
    * mergeSchema; old rows surface NULL for the new column. The everyday
    * data-lake reality of append-only corpora whose schema grows.
    */
  val q86SchemaEvolution = GraftQuery(
    "q86_schema_evolution",
    (s, dir) => {
      val out = workDir(s, dir, "evo")
      val docs = Tables.documents(s, dir)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$out/batch=0")
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") > 500).cast("int").as("long_doc"))
        .write.mode("overwrite").parquet(s"$out/batch=1")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n"),
          count(col("long_doc")).as("n_scored"),
          sum(coalesce(col("long_doc"), lit(0))).cast("long").as("n_long"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n,
           |  count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS n_scored,
           |  CAST(sum(CASE WHEN doc_id % 2 <> 0 AND n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Morton (z-order) bit-spread of a 10-bit value: classic mask-shift
    * doubling, expressible identically in any engine with `<<`, `|`, `&`.
    */
  private[ops] def spreadBits(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order clustering: interleave the bits of two filter dimensions
    * (order key, part key) into one Morton code, then range-partition and
    * sort the sink on it — every output file covers a narrow z-range, so a
    * 2-D predicate prunes row groups on BOTH dimensions at 100 TB (the
    * multi-dimension answer to 1-D sort keys; LayoutSpec asserts the
    * per-file span). The oracled result is pure z arithmetic, invariant to
    * the physical layout.
    */
  val q93ZOrder = GraftQuery(
    "q93_zorder",
    (s, dir) => {
      val out = workDir(s, dir, "zorder")
      val withZ = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_quantity")
        .withColumn("z", spreadBits(col("l_orderkey") % 1024)
          .bitwiseOR(shiftleft(spreadBits(col("l_partkey") % 1024), 1)))
      withZ.repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(shiftright(col("z"), 14).as("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          min("z").as("min_z"),
          max("z").as("max_z"),
          round(sum("l_quantity"), 2).as("qty"))
        .orderBy("zbucket")
    },
    Some("""WITH sp AS (
           |  SELECT l_quantity,
           |    ((((l_orderkey % 1024) | ((l_orderkey % 1024) << 8)) & 16711935)) AS xa,
           |    ((((l_partkey  % 1024) | ((l_partkey  % 1024) << 8)) & 16711935)) AS ya
           |  FROM lineitem),
           |sp2 AS (SELECT l_quantity,
           |    (((xa | (xa << 4)) & 252645135)) AS xb,
           |    (((ya | (ya << 4)) & 252645135)) AS yb FROM sp),
           |sp3 AS (SELECT l_quantity,
           |    (((xb | (xb << 2)) & 858993459)) AS xc,
           |    (((yb | (yb << 2)) & 858993459)) AS yc FROM sp2),
           |z AS (SELECT l_quantity,
           |    (((xc | (xc << 1)) & 1431655765))
           |      | ((((yc | (yc << 1)) & 1431655765)) << 1) AS z FROM sp3)
           |SELECT z >> 14 AS zbucket, count(*) AS n, min(z) AS min_z, max(z) AS max_z,
           |  round(sum(l_quantity), 2) AS qty
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Zone-map file-skipping audit — the quantified WHY behind q93/q180:
    * assign every lineitem row to one of 64 value-range "files" under two
    * layouts (linear: bucketed on x alone; z-order: bucketed on the Morton
    * code of (x, y)), compute each file's (min, max) zone map on BOTH
    * dimensions, and replay a 16-query 2-D range workload against the
    * zone maps counting which files a min/max-pruning scanner must read.
    * Linear layout prunes only its sort dimension; z-order prunes both —
    * this query measures the gap as scanned-file counts and a skip
    * percentage, the number that decides a 100 TB table's layout. The
    * audit is purely statistical (bucketing is arithmetic value-range
    * assignment, no global windows, no physical write — q93/q180 already
    * pin the physical clustering; LayoutSpec pins per-file spans).
    *
    * Scale shape: two column-pruned scans collapse to 64-row zone-map
    * tables; the 16-query workload is a broadcast literal frame probed
    * with a nested-loop overlap join against 64 rows. Everything after
    * the scans is integer algebra on bounded frames.
    */
  val q298SkippingAudit = GraftQuery(
    "q298_skipping_audit",
    (s, dir) => {
      import s.implicits._
      val xy = Tables.lineitem(s, dir)
        .select((col("l_orderkey") % 1024).as("x"),
          (col("l_partkey") % 1024).as("y"))
        .withColumn("z", spreadBits(col("x"))
          .bitwiseOR(shiftleft(spreadBits(col("y")), 1)))
      val queries = (0 until 16).map { q =>
        val xlo = (q * 5 % 16) * 64L
        val ylo = (q * 11 % 16) * 64L
        (q, xlo, xlo + 63L, ylo, ylo + 63L)
      }.toDF("qid", "xlo", "xhi", "ylo", "yhi")
      def audit(layout: String, fileCol: org.apache.spark.sql.Column) = {
        val zones = xy.groupBy(fileCol.as("file_id"))
          .agg(min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
        val scanned = zones.join(broadcast(queries),
            col("min_x") <= col("xhi") && col("max_x") >= col("xlo") &&
              col("min_y") <= col("yhi") && col("max_y") >= col("ylo"))
          .agg(count(lit(1)).as("files_scanned"))
        zones.agg(count(lit(1)).as("n_files"))
          .crossJoin(broadcast(scanned)) // 1-row agg: BNLJ, never a shuffle cartesian
          .select(lit(layout).as("layout"), col("n_files"),
            (col("n_files") * 16).as("max_scans"), col("files_scanned"),
            round(lit(100.0) * (lit(1.0) -
              col("files_scanned") / (col("n_files") * 16)), 2).as("skip_pct"))
      }
      audit("linear", expr("x div 16"))
        .unionByName(audit("zorder", shiftright(col("z"), 14)))
        .orderBy("layout")
    },
    Some("""WITH sp AS (
           |  SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y,
           |    (((l_orderkey % 1024) | ((l_orderkey % 1024) << 8)) & 16711935) AS xa,
           |    (((l_partkey  % 1024) | ((l_partkey  % 1024) << 8)) & 16711935) AS ya
           |  FROM lineitem),
           |sp2 AS (SELECT x, y, ((xa | (xa << 4)) & 252645135) AS xb,
           |    ((ya | (ya << 4)) & 252645135) AS yb FROM sp),
           |sp3 AS (SELECT x, y, ((xb | (xb << 2)) & 858993459) AS xc,
           |    ((yb | (yb << 2)) & 858993459) AS yc FROM sp2),
           |zz AS (SELECT x, y,
           |    ((xc | (xc << 1)) & 1431655765)
           |      | (((yc | (yc << 1)) & 1431655765) << 1) AS z FROM sp3),
           |fl AS (
           |  SELECT 'linear' AS layout, x // 16 AS file_id, x, y FROM zz
           |  UNION ALL
           |  SELECT 'zorder', z >> 14, x, y FROM zz),
           |zones AS (
           |  SELECT layout, file_id, min(x) AS min_x, max(x) AS max_x,
           |    min(y) AS min_y, max(y) AS max_y
           |  FROM fl GROUP BY 1, 2),
           |qs AS (
           |  SELECT q, (q * 5 % 16) * 64 AS xlo, (q * 5 % 16) * 64 + 63 AS xhi,
           |    (q * 11 % 16) * 64 AS ylo, (q * 11 % 16) * 64 + 63 AS yhi
           |  FROM (SELECT unnest(range(16)) AS q)),
           |sc AS (
           |  SELECT layout, count(*) AS files_scanned
           |  FROM zones JOIN qs
           |    ON min_x <= xhi AND max_x >= xlo AND min_y <= yhi AND max_y >= ylo
           |  GROUP BY 1),
           |nf AS (SELECT layout, count(*) AS n_files FROM zones GROUP BY 1)
           |SELECT nf.layout, n_files, n_files * 16 AS max_scans, files_scanned,
           |  round(100.0 * (1.0 - CAST(files_scanned AS DOUBLE) / (n_files * 16)), 2)
           |    AS skip_pct
           |FROM nf JOIN sc ON nf.layout = sc.layout
           |ORDER BY nf.layout""".stripMargin))

  /** DataSource V2 generator table (ClickHouse `system.numbers` analogue):
    * fully parallel synthetic rows with deterministic md5-derived hashes —
    * see [[graft.sources.NumbersSource]]. The aggregate is reproduced by the
    * oracle from `range()`, proving the source's values (not just counts).
    */
  val q102NumbersSource = GraftQuery(
    "q102_numbers_source",
    (s, _) =>
      s.read.format("graft.sources.NumbersSource")
        .option("end", "50000").option("splits", "8").load()
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          sum("id").as("id_sum"),
          sum("hash").as("hash_sum"))
        .orderBy("bucket"),
    Some("""SELECT CAST(id % 10 AS INT) AS bucket, count(*) AS n,
           |  CAST(sum(id) AS BIGINT) AS id_sum,
           |  CAST(sum(CAST(concat('0x', substr(md5(id::VARCHAR), 1, 8)) AS BIGINT)) AS BIGINT) AS hash_sum
           |FROM range(0, 50000) t(id) GROUP BY 1 ORDER BY 1""".stripMargin))

  /** V2 sink round-trip: orders stream through the custom two-phase-commit
    * sharded sink ([[graft.sources.ShardedCsvSink]]), are read back from the
    * committed shards, and must aggregate identically to the source table —
    * proving the commit protocol loses and duplicates nothing. Doubles
    * round-trip exactly (Java toString ↔ parse).
    */
  val q105V2SinkRoundtrip = GraftQuery(
    "q105_v2_sink_roundtrip",
    (s, dir) => {
      val out = workDir(s, dir, "v2sink")
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.format("graft.sources.ShardedCsvSink")
        .option("path", out).mode("overwrite").save()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType)))
      s.read.schema(schema).csv(s"$out/part-*.csv")
        .groupBy((col("o_custkey") % 7).as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum("o_orderkey").as("key_sum"),
          round(sum("o_totalprice"), 2).as("price_sum"))
        .orderBy("bucket")
    },
    Some("""SELECT o_custkey % 7 AS bucket, count(*) AS n,
           |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           |  round(sum(o_totalprice), 2) AS price_sum
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Append Hilbert-index columns (x_out, y_out intermediates collapse into
    * one final `hd`) for an `order`-level curve over a 2^order × 2^order
    * grid, via the standard xy→d walk (one rotation + quadrant digit per
    * level, MSB first). Each level is materialized as NAMED columns through
    * withColumn — the per-level expressions reference the previous level's
    * x/y twice, so substituting them inline (one giant expression) would
    * grow the tree 3^order; named columns keep the plan linear and
    * Catalyst's CollapseProject declines to re-inline multiply-referenced
    * non-trivial expressions. HilbertSpec pins the curve property.
    */
  private[ops] def withHilbert(df0: org.apache.spark.sql.DataFrame,
      xCol: org.apache.spark.sql.Column, yCol: org.apache.spark.sql.Column,
      order: Int): org.apache.spark.sql.DataFrame = {
    var df = df0.withColumn("hx", xCol.cast("long"))
      .withColumn("hy", yCol.cast("long"))
      .withColumn("hd", lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = when(col("hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      df = df
        .withColumn("hrx", rx).withColumn("hry", ry)
        .withColumn("hd",
          col("hd") + lit(s * s) * (lit(3L) * col("hrx")).bitwiseXOR(col("hry")))
        .withColumn("hx2",
          when(col("hry") === 0,
            when(col("hrx") === 1, lit(s - 1) - col("hy")).otherwise(col("hy")))
            .otherwise(col("hx")))
        .withColumn("hy2",
          when(col("hry") === 0,
            when(col("hrx") === 1, lit(s - 1) - col("hx")).otherwise(col("hx")))
            .otherwise(col("hy")))
        .withColumn("hx", col("hx2")).withColumn("hy", col("hy2"))
        .drop("hx2", "hy2", "hrx", "hry")
      s >>= 1
    }
    df.drop("hx", "hy")
  }

  /** Hilbert-curve clustered layout — z-order's (q93) stronger sibling: the
    * Hilbert walk never takes the long diagonal jumps Morton order takes
    * between quadrant boundaries, so EVERY pair of consecutive indices is
    * an adjacent grid cell (HilbertSpec pins exactly that) and range reads
    * over either key touch fewer files at the same file count. Same
    * discipline as q93: compute the index, repartitionByRange + sort on it,
    * write, and audit the committed layout by index bucket. The oracle
    * replays the identical 10-level rotation walk as chained MATERIALIZED
    * CTEs (each level reads the previous one's x/y twice — inlining would
    * double the plan per level, the q171 lesson).
    */
  val q180HilbertLayout = GraftQuery(
    "q180_hilbert_layout",
    (s, dir) => {
      val out = workDir(s, dir, "hilbert")
      val withH = withHilbert(
        Tables.lineitem(s, dir).select("l_orderkey", "l_partkey", "l_quantity"),
        col("l_orderkey") % 1024, col("l_partkey") % 1024, 10)
      withH.repartitionByRange(8, col("hd"))
        .sortWithinPartitions("hd")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(shiftright(col("hd"), 14).as("hbucket"))
        .agg(
          count(lit(1)).as("n"),
          min("hd").as("min_hd"),
          max("hd").as("max_hd"),
          round(sum("l_quantity"), 2).as("qty"))
        .orderBy("hbucket")
    },
    Some {
      val levels = (0 until 10).map { i =>
        val s = 1L << (9 - i)
        val p = i // previous level index; l0 is the seed
        s"""h${i + 1} AS MATERIALIZED (SELECT l_quantity,
           |  d$p + ${s * s} * xor(3 * (CASE WHEN (x$p & $s) > 0 THEN 1 ELSE 0 END),
           |                       (CASE WHEN (y$p & $s) > 0 THEN 1 ELSE 0 END)) AS d${i + 1},
           |  CASE WHEN (y$p & $s) = 0 THEN
           |    CASE WHEN (x$p & $s) > 0 THEN ${s - 1} - y$p ELSE y$p END
           |  ELSE x$p END AS x${i + 1},
           |  CASE WHEN (y$p & $s) = 0 THEN
           |    CASE WHEN (x$p & $s) > 0 THEN ${s - 1} - x$p ELSE x$p END
           |  ELSE y$p END AS y${i + 1}
           |FROM h$p)""".stripMargin
      }.mkString(",\n")
      s"""WITH h0 AS (
         |  SELECT l_quantity, l_orderkey % 1024 AS x0, l_partkey % 1024 AS y0,
         |    CAST(0 AS BIGINT) AS d0
         |  FROM lineitem),
         |$levels
         |SELECT d10 >> 14 AS hbucket, count(*) AS n,
         |  min(d10) AS min_hd, max(d10) AS max_hd,
         |  round(sum(l_quantity), 2) AS qty
         |FROM h10 GROUP BY 1 ORDER BY 1""".stripMargin
    })

  /** Small-file compaction planner — the lakehouse maintenance op (Iceberg
    * rewrite_data_files binpack / Delta OPTIMIZE) that groups undersized
    * files into target-size rewrite bins, partition by partition. Orders
    * stands in for the file manifest: file_id = o_orderkey, partition =
    * order month, size = ⌊o_totalprice⌋ bytes, target bin = 400 kB. Files
    * already ≥ target pass through untouched (reported as bin −1); the
    * rest are packed size-descending by running-total quantile: bin =
    * (cumulative bytes before this file) div target — the deterministic,
    * one-window equivalent of the greedy accumulate-until-full scan, so
    * every bin but a partition's last lands in [target, target + max_file).
    *
    * Scale: planning a billion-file manifest is one window (partitioned by
    * the table partition — manifests are naturally partition-bounded) plus
    * one partial agg: no collect, no loop, no join. The plan output is
    * bin-granular (what a rewrite job consumes), not file-granular.
    */
  val q187CompactionPlan = GraftQuery(
    "q187_compaction_plan",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = 400000L
      val files = Tables.orders(s, dir).select(
        col("o_orderkey").as("file_id"),
        substring(col("o_orderdate").cast("string"), 1, 7).as("part"),
        floor(col("o_totalprice")).as("bytes"))
      val small = files.filter(col("bytes") < target)
        .withColumn("cum_before",
          sum("bytes").over(Window.partitionBy("part")
            .orderBy(desc("bytes"), col("file_id"))) - col("bytes"))
        .withColumn("bin", expr(s"cum_before div ${target}L"))
      val keep = files.filter(col("bytes") >= target)
        .withColumn("bin", lit(-1L))
      small.select("part", "bin", "file_id", "bytes")
        .unionByName(keep.select("part", "bin", "file_id", "bytes"))
        .groupBy("part", "bin")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"))
        .orderBy("part", "bin")
    },
    Some("""WITH f AS (
           |  SELECT o_orderkey AS file_id,
           |    substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS part,
           |    CAST(floor(o_totalprice) AS BIGINT) AS bytes
           |  FROM orders),
           |small AS (SELECT part, file_id, bytes,
           |    sum(bytes) OVER (PARTITION BY part
           |      ORDER BY bytes DESC, file_id) - bytes AS cum_before
           |  FROM f WHERE bytes < 400000),
           |plan AS (
           |  SELECT part, CAST(cum_before // 400000 AS BIGINT) AS bin,
           |    file_id, bytes FROM small
           |  UNION ALL
           |  SELECT part, CAST(-1 AS BIGINT), file_id, bytes
           |  FROM f WHERE bytes >= 400000)
           |SELECT part, bin, CAST(count(*) AS BIGINT) AS n_files,
           |  CAST(sum(bytes) AS BIGINT) AS bin_bytes
           |FROM plan GROUP BY part, bin ORDER BY part, bin""".stripMargin))

  /** Write-audit-publish (the WAP release gate): the cleaned orders slice
    * writes to a STAGING directory, three audits run against the staged
    * files as read back from disk (null-key scan, minimum-volume floor,
    * date-domain bounds 1990–2005 — the q96 constraint classes applied at the
    * release boundary), and only a full pass promotes staging to the
    * published location with one atomic filesystem rename (the same
    * swap primitive the rebalancer's shadow tables use); any failure
    * deletes staging and publishes nothing. The oracle recomputes the
    * expected staged set and audit verdicts relationally, so the hash
    * gate proves the files that landed in `published/` are exactly the
    * rows the contract promised.
    */
  /** The WAP engine behind q225, reusable so the FAILURE path is
    * spec-testable (WapSpec): write `data` to `<base>/staging`, run every
    * audit against the re-read staged files, and either atomically rename
    * staging → `<base>/published` (all pass) or delete staging (any
    * fail — nothing half-published survives). Returns
    * (stagedRows, auditsPassed, published?, publishedRows).
    */
  private[ops] def wapPublish(
      s: org.apache.spark.sql.SparkSession,
      base: String,
      data: org.apache.spark.sql.DataFrame,
      audits: Seq[org.apache.spark.sql.DataFrame => Boolean])
      : (Long, Int, Boolean, Long) = {
    val staging = s"$base/staging"
    val published = s"$base/published"
    val conf = s.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    for (d <- Seq(staging, published))
      fs.delete(new org.apache.hadoop.fs.Path(d), true)
    data.write.mode("overwrite").parquet(staging)
    val staged = s.read.parquet(staging).persist()
    val stagedRows = staged.count()
    val passed = audits.count(_(staged))
    staged.unpersist()
    val ok = passed == audits.size
    if (ok)
      fs.rename(new org.apache.hadoop.fs.Path(staging),
        new org.apache.hadoop.fs.Path(published))
    else fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    val pubRows = if (ok) s.read.parquet(published).count() else 0L
    (stagedRows, passed, ok, pubRows)
  }

  /** Standard q225/WapSpec audit set: null-key scan, minimum-volume
    * floor, date-domain bounds 1990–2005 (the q96 constraint classes at
    * the release boundary). */
  private[ops] def wapAudits: Seq[org.apache.spark.sql.DataFrame => Boolean] = Seq(
    df => df.filter(col("o_orderkey").isNull).count() == 0L,
    df => df.count() >= 100L,
    df => {
      val r = df.agg(min(year(col("o_orderdate"))),
        max(year(col("o_orderdate")))).head()
      // min/max over an empty slice are NULL — an empty dataset FAILS the
      // bounds audit (returning false) rather than NPE-ing out of wapPublish
      !r.isNullAt(0) && !r.isNullAt(1) &&
        r.getInt(0) >= 1990 && r.getInt(1) <= 2005
    })

  val q225WriteAuditPublish = GraftQuery(
    "q225_write_audit_publish",
    (s, dir) => {
      val cleaned = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 0 && col("o_custkey").isNotNull)
      val (stagedRows, passed, ok, pubRows) =
        wapPublish(s, workDir(s, dir, "wap"), cleaned, wapAudits)
      import s.implicits._
      Seq((stagedRows, passed, if (ok) 1 else 0, pubRows))
        .toDF("staged_rows", "audits_passed", "published", "published_rows")
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS staged_rows,
           |  CAST(3 AS INT) AS audits_passed, CAST(1 AS INT) AS published,
           |  CAST(count(*) AS BIGINT) AS published_rows
           |FROM orders
           |WHERE o_totalprice > 0 AND o_custkey IS NOT NULL""".stripMargin))

  /** Age-based storage-tiering plan — the lifecycle policy a lakehouse
    * applies to event data (hot NVMe ≤ 7 days, warm object store ≤ 21,
    * cold archive beyond): rows bucket by age relative to the log's max
    * day, and the plan reports per-tier day span, row count, share, and
    * an estimated byte footprint (rows × a fixed row-width constant —
    * the sizing input a capacity planner actually consumes). One scan,
    * partial aggs; the tier ladder is a CASE over an integer age.
    */
  val q249TieringPlan = GraftQuery(
    "q249_tiering_plan",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(to_date(col("ts")).as("d"))
      val mx = ev.agg(max("d").as("md"))
      ev.crossJoin(mx)
        .withColumn("age", datediff(col("md"), col("d")))
        .withColumn("tier",
          when(col("age") <= 7, "1_hot")
            .when(col("age") <= 21, "2_warm").otherwise("3_cold"))
        .groupBy("tier")
        .agg(countDistinct("d").as("n_days"), count(lit(1)).as("n_rows"))
        .withColumn("total", sum("n_rows").over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("tier"), col("n_days"), col("n_rows"),
          round(col("n_rows") / col("total").cast("double"), 6).as("row_share"),
          (col("n_rows") * 64L).as("est_bytes"))
        .orderBy("tier")
    },
    Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS d FROM events),
           |mx AS (SELECT max(d) md FROM ev),
           |t AS (SELECT CASE WHEN datediff('day', d, md) <= 7 THEN '1_hot'
           |    WHEN datediff('day', d, md) <= 21 THEN '2_warm'
           |    ELSE '3_cold' END AS tier, d
           |  FROM ev, mx),
           |per AS (SELECT tier, CAST(count(DISTINCT d) AS BIGINT) n_days,
           |    CAST(count(*) AS BIGINT) n_rows FROM t GROUP BY 1)
           |SELECT tier, n_days, n_rows,
           |  round(n_rows / (sum(n_rows) OVER ())::DOUBLE, 6) AS row_share,
           |  CAST(n_rows * 64 AS BIGINT) AS est_bytes
           |FROM per ORDER BY tier""".stripMargin))

  /** Orphan-file garbage collection (the VACUUM half of table
    * maintenance): a table directory accumulates files that no manifest
    * references — crashed writers, abandoned speculative tasks — and a
    * GC pass must remove exactly those WITHOUT touching live data. The
    * query writes the table (4 fixed partitions), records the live file
    * set as a manifest, plants an orphan (a copied part file under a
    * non-manifest name — the realistic residue shape), then GCs by
    * listing the directory against the manifest and deleting
    * non-members. The output re-reads the table after GC, so the row
    * count proves live data survived while the counted orphans died.
    */
  val q263OrphanGc = GraftQuery(
    "q263_orphan_gc",
    (s, dir) => {
      val base = workDir(s, dir, "gc")
      val table = s"$base/table"
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      Tables.nation(s, dir).repartition(4)
        .write.mode("overwrite").parquet(table)
      def partFiles = fs.listStatus(new org.apache.hadoop.fs.Path(table))
        .map(_.getPath).filter(_.getName.startsWith("part-"))
      val manifest = partFiles.map(_.getName).toSet
      // plant an orphan: copy a live part file under an abandoned name
      val src = partFiles.head
      val orphan = new org.apache.hadoop.fs.Path(table,
        "part-orphaned-attempt-000.snappy.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, orphan, false, conf)
      val before = partFiles.length
      val orphans = partFiles.filterNot(p => manifest.contains(p.getName))
      orphans.foreach(p => fs.delete(p, false))
      val after = partFiles.length
      val rows = s.read.parquet(table).count()
      import s.implicits._
      Seq((manifest.size, before, orphans.length, after, rows))
        .toDF("live_files", "files_before_gc", "orphans_removed",
          "files_after_gc", "rows_intact")
    },
    Some("""SELECT CAST(4 AS INT) AS live_files, CAST(5 AS INT) AS files_before_gc,
           |  CAST(1 AS INT) AS orphans_removed, CAST(4 AS INT) AS files_after_gc,
           |  CAST(count(*) AS BIGINT) AS rows_intact
           |FROM nation""".stripMargin))

  /** Dynamic partition pruning: the fact table lands Hive-partitioned by
    * ship month, and a join against a dim derived at RUNTIME (the months
    * that saw an urgent order) prunes fact partitions through Catalyst's
    * DPP subquery — the broadcast result of the dim side is replayed as a
    * partition filter on the fact scan, so only the qualifying month
    * directories are read. q84 proves STATIC pruning (literal filter);
    * this is the dynamic case that matters at 100 TB, where the selective
    * predicate lives on the dimension and the fact filter only exists at
    * runtime. PlanShapeSpec pins the `dynamicpruning` expression in the
    * fact scan's partition filters.
    */
  val q282DynamicPartitionPruning = GraftQuery(
    "q282_dynamic_partition_pruning",
    (s, dir) => {
      val out = workDir(s, dir, "dpp")
      // build the partitioned fact once per fixture dir (the q85 pattern):
      // the query is about the PRUNED READ, so re-runs measure that, not
      // a rebuild of 83 month directories
      val marker = new org.apache.hadoop.fs.Path(s"$out/_SUCCESS")
      if (!marker.getFileSystem(s.sessionState.newHadoopConf()).exists(marker)) {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
            date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          // cluster by the partition column before the write: without this
          // every input split spills a file per month it touches (splits ×
          // months small files); with it each month lands in one task
          .repartition(col("ship_month"))
          .write.mode("overwrite").partitionBy("ship_month").parquet(out)
      }
      val fact = s.read.parquet(out)
      // runtime dim: months containing at least one urgent January order
      // (~1 month in 12 qualifies) — unknowable at plan time, discovered
      // by scanning orders, so the fact-side partition filter can only
      // exist as a DPP subquery
      val dim = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          month(col("o_orderdate")) === 1)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
        .distinct()
      // revenue accumulates as EXACT integer (cents × (100 − discount pct))
      // — a float sum's accumulation order differs between Spark tasks and
      // the oracle, so a value near a .xx5 boundary could flip round(…, 2);
      // the division + round happens once at the output edge (the
      // lineitemRowHash cents discipline)
      fact.join(broadcast(dim), fact("ship_month") === dim("m"))
        .groupBy("ship_month")
        .agg(
          count(lit(1)).as("n_lines"),
          round(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            / 10000.0, 2).as("revenue"))
        .orderBy("ship_month")
    },
    Some("""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           |  count(*) AS n_lines,
           |  round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
           |    / 10000.0, 2) AS revenue
           |FROM lineitem
           |WHERE strftime(l_shipdate, '%Y-%m') IN (
           |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
           |  FROM orders WHERE o_orderpriority = '1-URGENT'
           |    AND month(o_orderdate) = 1)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q284 — content-addressed dataset fingerprint: a Merkle-style digest
    * manifest that lets two replicas (or two versions) of a 100 TB table
    * prove equality bucket by bucket WITHOUT moving data — compare 64
    * digest rows instead of re-reading either side, and a mismatched
    * bucket localizes the diff to 1/64 of the table. Per-row hashes fold
    * into per-bucket digests with XOR, which is ORDER-INDEPENDENT — the
    * digest is stable under repartitioning, task reordering, and file
    * compaction, exactly what a storage-layout-insensitive content check
    * needs (and why a naive concat-then-hash is wrong at scale).
    *
    * The row hash is an integer LCG mix of the row's canonical integer
    * form (prices in exact cents), kept below 2^62 at every step so the
    * oracle replays it in overflow-checked BIGINT arithmetic; a production
    * deployment swaps in a 128-bit hash Expression, same plan. Shape: one
    * scan → partial XOR/count/sum per bucket → 64 rows.
    */
  /** 2^31 − 1: reducing mod FP_M before every multiply keeps each product
    * below 2^62, so the mix never overflows int64 in ANY engine. */
  private val FP_M = 2147483647L

  private def mixStep(acc: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (acc * 1103515245L % FP_M + v) % FP_M

  /** The canonical lineitem row hash shared by q284 (fingerprint) and q286
    * (replica diff) — ONE definition so the diff's digest compare can never
    * drift from the manifest it claims to read. */
  private def lineitemRowHash: org.apache.spark.sql.Column =
    mixStep(mixStep(mixStep(
      col("l_orderkey") % FP_M,
      col("l_linenumber").cast("long")),
      col("l_quantity").cast("long")),
      round(col("l_extendedprice") * 100, 0).cast("long"))

  val q284DatasetFingerprint = GraftQuery(
    "q284_dataset_fingerprint",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .select((col("l_orderkey") % 64).as("bucket"), lineitemRowHash.as("h"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("digest"),
          (sum(col("h") % 1000003L) % 1000003L).as("checksum"))
        .orderBy("bucket")
    },
    Some("""WITH r AS (SELECT l_orderkey % 64 AS bucket,
           |    ((((l_orderkey % 2147483647) * 1103515245
           |        % 2147483647 + l_linenumber)
           |      % 2147483647 * 1103515245
           |        % 2147483647 + CAST(l_quantity AS BIGINT))
           |      % 2147483647 * 1103515245
           |        % 2147483647
           |        + CAST(round(l_extendedprice * 100, 0) AS BIGINT))
           |      % 2147483647 AS h
           |  FROM lineitem)
           |SELECT bucket, count(*) AS n_rows,
           |  CAST(bit_xor(h) AS BIGINT) AS digest,
           |  CAST(sum(h % 1000003) % 1000003 AS BIGINT) AS checksum
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q286 — replica diff localization, the operational payoff of q284's
    * fingerprint: given a primary and a drifted replica (rows corrupted in
    * transit, synthesized deterministically), compare the 64 bucket
    * digests first, then run the expensive row-level diff ONLY inside the
    * buckets whose digests disagree. At 100 TB that turns "diff two
    * tables" from a full-table shuffle into a 64-row digest compare plus a
    * repair read over the drifted fraction of BOTH sides — each side's
    * scan semi-joins the broadcast ≤64-row mismatch frame before anything
    * row-level happens, so untouched buckets never leave the map side.
    *
    * The row diff is a SYMMETRIC MULTISET count compare on the full (key,
    * row-hash) identity — (l_orderkey, l_linenumber) is not unique in this
    * fixture, and count-diff semantics stay correct under duplicate
    * identities and even under hash coincidences between a drifted row and
    * an existing one (where an anti-join would silently undercount). Both
    * directions are reported: rows the replica added (n_added) AND rows it
    * is missing (n_missing) — a deletion-only drift has no added rows, so a
    * one-sided diff would localize the bucket in the digest compare and
    * then silently report nothing; mism LEFT-joins the row diff so such a
    * bucket still surfaces (with zero counts only under an XOR collision).
    * The oracle replays the same multiset algebra. Output: per mismatched
    * bucket, both digests plus added/missing counts and per-direction key
    * sums — what a repair job needs to fetch exactly the bad rows.
    */
  val q286ReplicaDiff = GraftQuery(
    "q286_replica_diff",
    (s, dir) => {
      def hashed(df: org.apache.spark.sql.DataFrame) = df.select(
        (col("l_orderkey") % 64).as("bucket"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        lineitemRowHash.as("h"))
      val primary = hashed(Tables.lineitem(s, dir))
      // the drifted replica: every line-1 row of orderkeys 7/135/263 took
      // a +1 quantity hit in transit. All three keys are ≡ 7 mod 64 — one
      // bucket carries every diff, the other 63 must prune away
      val replica = hashed(
        Tables.lineitem(s, dir).withColumn("l_quantity",
          when(col("l_linenumber") === 1 &&
            (col("l_orderkey") === 7L || col("l_orderkey") === 135L ||
              col("l_orderkey") === 263L),
            col("l_quantity") + 1).otherwise(col("l_quantity"))))
      def digest(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("bucket").agg(expr("bit_xor(h)").as("d"))
      val mism = digest(primary).as("p")
        .join(digest(replica).as("r"), Seq("bucket"))
        .filter(col("p.d") =!= col("r.d"))
        .select(col("bucket"), col("p.d").as("d_primary"), col("r.d").as("d_replica"))
      // BOTH sides prune to mismatched buckets before the row-level work
      val mismBuckets = mism.select("bucket")
      def scoped(df: org.apache.spark.sql.DataFrame) =
        df.join(broadcast(mismBuckets), Seq("bucket"), "left_semi")
          .groupBy("bucket", "ok", "ln", "h").agg(count(lit(1)).as("c"))
      val drifted = scoped(replica).withColumnRenamed("c", "c2")
        .join(scoped(primary).withColumnRenamed("c", "c1"),
          Seq("bucket", "ok", "ln", "h"), "full_outer")
        .withColumn("dd",
          coalesce(col("c2"), lit(0L)) - coalesce(col("c1"), lit(0L)))
        .filter(col("dd") =!= 0L)
      val perBucket = drifted.groupBy("bucket").agg(
        sum(when(col("dd") > 0, col("dd")).otherwise(0L)).as("n_added"),
        sum(when(col("dd") < 0, -col("dd")).otherwise(0L)).as("n_missing"),
        sum(when(col("dd") > 0, col("ok") * col("dd")).otherwise(0L))
          .as("key_sum_added"),
        sum(when(col("dd") < 0, col("ok") * -col("dd")).otherwise(0L))
          .as("key_sum_missing"))
      mism.join(perBucket, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("n_added"), lit(0L)).as("n_added"),
          coalesce(col("n_missing"), lit(0L)).as("n_missing"),
          coalesce(col("key_sum_added"), lit(0L)).as("key_sum_added"),
          coalesce(col("key_sum_missing"), lit(0L)).as("key_sum_missing"),
          col("d_primary"), col("d_replica"))
        .orderBy("bucket")
    },
    // the oracle carries both hashes per ROW and replays the multiset
    // count-diff exactly; the digests come from the real XOR folds
    Some("""WITH r AS (SELECT l_orderkey % 64 AS bucket, l_orderkey AS ok,
           |    l_linenumber AS ln,
           |    ((((l_orderkey % 2147483647) * 1103515245
           |        % 2147483647 + l_linenumber)
           |      % 2147483647 * 1103515245
           |        % 2147483647 + CAST(l_quantity AS BIGINT))
           |      % 2147483647 * 1103515245
           |        % 2147483647
           |        + CAST(round(l_extendedprice * 100, 0) AS BIGINT))
           |      % 2147483647 AS h,
           |    ((((l_orderkey % 2147483647) * 1103515245
           |        % 2147483647 + l_linenumber)
           |      % 2147483647 * 1103515245
           |        % 2147483647 + CAST(l_quantity AS BIGINT)
           |        + CASE WHEN l_linenumber = 1 AND l_orderkey IN (7, 135, 263)
           |          THEN 1 ELSE 0 END)
           |      % 2147483647 * 1103515245
           |        % 2147483647
           |        + CAST(round(l_extendedprice * 100, 0) AS BIGINT))
           |      % 2147483647 AS h2
           |  FROM lineitem),
           |dig AS (SELECT bucket, CAST(bit_xor(h) AS BIGINT) AS d_primary,
           |    CAST(bit_xor(h2) AS BIGINT) AS d_replica
           |  FROM r GROUP BY 1),
           |mism AS (SELECT * FROM dig WHERE d_primary <> d_replica),
           |rep AS (SELECT bucket, ok, ln, h2 AS h, count(*) AS c2
           |  FROM r WHERE bucket IN (SELECT bucket FROM mism) GROUP BY 1, 2, 3, 4),
           |pri AS (SELECT bucket, ok, ln, h, count(*) AS c1
           |  FROM r WHERE bucket IN (SELECT bucket FROM mism) GROUP BY 1, 2, 3, 4),
           |diff AS (SELECT coalesce(rep.bucket, pri.bucket) AS bucket,
           |    coalesce(rep.ok, pri.ok) AS ok,
           |    coalesce(rep.c2, 0) - coalesce(pri.c1, 0) AS dd
           |  FROM rep FULL JOIN pri ON rep.bucket = pri.bucket
           |    AND rep.ok = pri.ok AND rep.ln = pri.ln AND rep.h = pri.h
           |  WHERE coalesce(rep.c2, 0) <> coalesce(pri.c1, 0)),
           |agg AS (SELECT bucket,
           |    CAST(sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) AS BIGINT) AS n_added,
           |    CAST(sum(CASE WHEN dd < 0 THEN -dd ELSE 0 END) AS BIGINT) AS n_missing,
           |    CAST(sum(CASE WHEN dd > 0 THEN ok * dd ELSE 0 END) AS BIGINT)
           |      AS key_sum_added,
           |    CAST(sum(CASE WHEN dd < 0 THEN ok * -dd ELSE 0 END) AS BIGINT)
           |      AS key_sum_missing
           |  FROM diff GROUP BY 1)
           |SELECT mism.bucket, coalesce(n_added, 0) AS n_added,
           |  coalesce(n_missing, 0) AS n_missing,
           |  coalesce(key_sum_added, 0) AS key_sum_added,
           |  coalesce(key_sum_missing, 0) AS key_sum_missing,
           |  d_primary, d_replica
           |FROM mism LEFT JOIN agg ON mism.bucket = agg.bucket
           |ORDER BY 1""".stripMargin))

  /** q287 — incremental fingerprint maintenance: the property that makes
    * q284's XOR-fold manifest operationally cheap on append-only corpora.
    * Because XOR is associative/commutative with identity 0, the digest of
    * a disjoint union is the XOR of the digests: manifest(base ∪ delta) =
    * manifest(base) ⊕ manifest(delta). So an ingest batch updates a 100 TB
    * table's manifest by scanning ONLY the batch — O(delta), no base
    * rescan — and this query PROVES it: it computes the merged manifest
    * (base digests ⊕ delta digests through a full outer join on bucket)
    * and the from-scratch full-table manifest, and emits a per-bucket
    * equality flag the oracle requires to be uniformly true.
    *
    * base/delta split: orderkeys ≡ 0 mod 97 are "today's appended batch"
    * (~1% of rows, hitting every bucket).
    */
  val q287FingerprintMerge = GraftQuery(
    "q287_fingerprint_merge",
    (s, dir) => {
      def manifest(df: org.apache.spark.sql.DataFrame) = df
        .select((col("l_orderkey") % 64).as("bucket"), lineitemRowHash.as("h"))
        .groupBy("bucket")
        .agg(expr("bit_xor(h)").as("d"), count(lit(1)).as("n"))
      val li = Tables.lineitem(s, dir)
      val base = manifest(li.filter(col("l_orderkey") % 97 =!= 0))
        .withColumnRenamed("d", "d_base").withColumnRenamed("n", "n_base")
      val delta = manifest(li.filter(col("l_orderkey") % 97 === 0))
        .withColumnRenamed("d", "d_delta").withColumnRenamed("n", "n_delta")
      val full = manifest(li)
        .withColumnRenamed("d", "d_full").withColumnRenamed("n", "n_full")
      // O(delta) maintenance: merge the two bounded manifests (≤64 rows
      // each), XOR digests, sum counts — a bucket absent from one side
      // contributes the XOR identity 0
      val merged = base.join(delta, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          (coalesce(col("d_base"), lit(0L))
            .bitwiseXOR(coalesce(col("d_delta"), lit(0L)))).as("d_merged"),
          (coalesce(col("n_base"), lit(0L)) +
            coalesce(col("n_delta"), lit(0L))).as("n_merged"))
      merged.join(full, Seq("bucket"))
        .select(col("bucket"), col("n_merged"), col("d_merged"), col("d_full"),
          (col("d_merged") === col("d_full") && col("n_merged") === col("n_full"))
            .as("merge_exact"))
        .orderBy("bucket")
    },
    Some("""WITH r AS (SELECT l_orderkey % 64 AS bucket,
           |    l_orderkey % 97 = 0 AS is_delta,
           |    ((((l_orderkey % 2147483647) * 1103515245
           |        % 2147483647 + l_linenumber)
           |      % 2147483647 * 1103515245
           |        % 2147483647 + CAST(l_quantity AS BIGINT))
           |      % 2147483647 * 1103515245
           |        % 2147483647
           |        + CAST(round(l_extendedprice * 100, 0) AS BIGINT))
           |      % 2147483647 AS h
           |  FROM lineitem),
           |m AS (SELECT bucket,
           |    CAST(coalesce(bit_xor(h) FILTER (WHERE NOT is_delta), 0)
           |      AS BIGINT) AS d_base,
           |    CAST(coalesce(bit_xor(h) FILTER (WHERE is_delta), 0)
           |      AS BIGINT) AS d_delta,
           |    CAST(bit_xor(h) AS BIGINT) AS d_full,
           |    CAST(count(*) AS BIGINT) AS n_full
           |  FROM r GROUP BY 1)
           |SELECT bucket, n_full AS n_merged,
           |  xor(d_base, d_delta) AS d_merged, d_full,
           |  xor(d_base, d_delta) = d_full AS merge_exact
           |FROM m ORDER BY bucket""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q83TextSource, q84PartitionedWrite,
    q85BucketedJoin, q86SchemaEvolution, q93ZOrder, q102NumbersSource,
    q105V2SinkRoundtrip, q180HilbertLayout, q187CompactionPlan,
    q225WriteAuditPublish, q249TieringPlan, q263OrphanGc,
    q282DynamicPartitionPruning, q284DatasetFingerprint, q286ReplicaDiff,
    q287FingerprintMerge, q298SkippingAudit)
}
