package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** Similarity-search and vector-aggregation operators (SURVEY.md §2.3) over
  * the `embeddings` table (ArrayType(FloatType), dim 64).
  *
  * - q29: brute-force cosine top-k — the exact baseline. The query set is
  *   broadcast, so the scan side never shuffles; at 100 TB this is the
  *   "small query batch × huge corpus" shape.
  * - q30: per-label centroids via posexplode + partial aggregation (no
  *   collect, no UDAF buffer bigger than one (label, dim) cell).
  * - q31: LSH-bucketed ANN — random-hyperplane signs pick a bucket, search
  *   only within the bucket (equi-join on bucket id instead of cross join;
  *   the 100 TB scale path). Hyperplanes are md5-derived arithmetic so the
  *   DuckDB oracle reproduces bucketing bit-for-bit.
  *
  * Float discipline: embeddings are cast to double before any math; dot
  * products fold left-to-right in both engines; outputs are rounded.
  */
object Vectors {

  private val DIM = 64
  private val NUM_PLANES = 4

  /** Deterministic pseudo-random hyperplanes: component d of plane h is
    * ((int(md5("p{h}_{d}")[0:8]) % 2001) - 1000) / 1000.0 ∈ [-1, 1] —
    * reproducible in any engine with md5.
    */
  private[ops] def planes: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NUM_PLANES).map { h =>
      (0 until DIM).map { d =>
        val hex = md.digest(s"p${h}_$d".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
      }
    }
  }

  // fused codegen'd loops (graft.functions.DotProduct); accumulation order
  // identical to the HOF fold so oracle parity is preserved
  private def dot(a: Column, b: Column): Column = GraftFunctions.dot(a, b)
  private def dotLit(a: Column, plane: Seq[Double]): Column =
    GraftFunctions.dot(a, typedLit(plane))
  private def norm(v: Column): Column = GraftFunctions.normL2(v)

  /** Brute-force cosine top-k for a broadcast query batch. */
  val q29AnnTopk = GraftQuery(
    "q29_ann_topk",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", norm(col("v")))
        .select(col("vec_id"), col("v"), col("nrm"))
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val sims = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("cid"), round(col("sim"), 5).as("sim"))
        .orderBy("qid", "rnk")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |q AS (SELECT vec_id qid, v qv, nrm qn FROM e WHERE vec_id < 3),
           |p AS (SELECT qid, e.vec_id cid,
           |  list_sum(list_transform(range(1, 65), i -> qv[i]*e.v[i])) / (qn*e.nrm) sim
           |  FROM q, e WHERE e.vec_id <> qid),
           |r AS (SELECT qid, cid, sim,
           |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rnk FROM p)
           |SELECT qid, rnk, cid, round(sim, 5) AS sim FROM r WHERE rnk <= 5
           |ORDER BY qid, rnk""".stripMargin))

  /** Per-label centroids: mean vector per class, one row per (label, dim). */
  val q30Centroids = GraftQuery(
    "q30_centroids",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("label"), col("pos").as("dim"))
        .agg(round(avg("col"), 5).as("c"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"), col("c"), col("n"))
        .orderBy("label", "dim"),
    Some("""SELECT label, d.d AS dim, round(avg((embedding::DOUBLE[])[d.d + 1]), 5) AS c,
           |  count(*) AS n
           |FROM embeddings, range(0, 64) d(d)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** LSH-bucketed ANN: sign-of-dot-product bucket id, search within bucket
    * only (equi-join replaces the cross join of q29).
    */
  val q31AnnLsh = GraftQuery(
    "q31_ann_lsh",
    (s, dir) => {
      GraftFunctions.register(s)
      val ps = planes
      val bucket = (0 until NUM_PLANES).map { h =>
        when(dotLit(col("v"), ps(h)) > 0, 1 << h).otherwise(0)
      }.reduce(_ + _)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("bucket", bucket)
        .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("bucket").as("qb"))
      val sims = e.join(broadcast(q),
          col("bucket") === col("qb") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("cid"), round(col("sim"), 5).as("sim"))
        .orderBy("qid", "rnk")
    },
    Some("""WITH pl AS (
           |  SELECT h.h, d.d,
           |    ((CAST(concat('0x', substr(md5('p'||h.h||'_'||d.d), 1, 8)) AS BIGINT) % 2001) - 1000)
           |      / 1000.0 AS w
           |  FROM range(0,4) h(h), range(0,64) d(d)),
           |e AS (SELECT vec_id, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |pw AS (SELECT h, list(w ORDER BY d) ws FROM pl GROUP BY 1),
           |dots AS (SELECT e.vec_id, pw.h,
           |  list_sum(list_transform(range(1, 65), i -> e.v[i] * pw.ws[i])) dp
           |  FROM e, pw),
           |bk AS (SELECT vec_id, sum(CASE WHEN dp > 0 THEN (1 << h) ELSE 0 END) bucket
           |  FROM dots GROUP BY 1),
           |eb AS (SELECT e.vec_id, e.v, e.nrm, bk.bucket FROM e JOIN bk USING (vec_id)),
           |q AS (SELECT vec_id qid, v qv, nrm qn, bucket qb FROM eb WHERE vec_id < 10),
           |p AS (SELECT qid, eb.vec_id cid,
           |  list_sum(list_transform(range(1, 65), i -> qv[i]*eb.v[i])) / (qn*eb.nrm) sim
           |  FROM q JOIN eb ON eb.bucket = qb AND eb.vec_id <> qid),
           |r AS (SELECT qid, cid, sim,
           |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rnk FROM p)
           |SELECT qid, rnk, cid, round(sim, 5) AS sim FROM r WHERE rnk <= 3
           |ORDER BY qid, rnk""".stripMargin))

  /** IVF-style ANN: per-label centroids act as the coarse quantizer
    * (computed with the typed VectorAvg Aggregator); every vector is
    * assigned to its nearest centroid cell, queries probe their 2 nearest
    * cells and brute-force only inside them. At 100 TB the corpus-side work
    * is one train scan (partial-agg to L centroid rows), one shuffle-free
    * assign scan against driver-inlined centroids, and an equi-join on cell
    * id — the classic IVF-flat search shape.
    */
  /** The IVF "train + assign" step shared by q47/q134/q203: per-label
    * centroids reduce to L ≈ #labels rows — tiny at any SF — so collect
    * them and inline as a literal; per-vector cell ranking is then a
    * map-side argmax (sort_array over (-sim, cell) structs — identical
    * tie discipline to a (desc sim, asc cell) window rank) with NO
    * per-vector shuffle and no N×L window. Expects `e` to carry
    * (label, v, nrm); returns the ranked-cells array column.
    */
  private def rankedCentroidCells(e: DataFrame): Column = {
    val vecAvg = udaf(new graft.functions.VectorAvg(DIM))
    val centsLit = array(
      e.groupBy("label").agg(vecAvg(col("v")).as("cvec")).collect().map { r =>
        val cvec = r.getSeq[Double](1)
        val cnrm = math.sqrt(cvec.foldLeft(0.0)((a, x) => a + x * x))
        struct(lit(r.getInt(0)).as("cell"),
          typedLit(cvec).as("cvec"), lit(cnrm).as("cnrm"))
      }.toIndexedSeq: _*)
    sort_array(transform(centsLit, c =>
      struct((-(dot(col("v"), c("cvec")) / (col("nrm") * c("cnrm")))).as("neg"),
        c("cell").as("cell"))))
  }

  val q47AnnIvf = GraftQuery(
    "q47_ann_ivf",
    (s, dir) => {
      GraftFunctions.register(s)
      // persisted: train (collect), assign and probe all read this frame —
      // without the cache the parquet scan + array cast + norm runs 3× (the
      // round-2 4.7× regression); callers (Bench/Verify) clear the cache
      // after each query
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", norm(col("v")))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))
        .persist()
      // IVF "train": per-label centroids reduce to L ≈ #labels rows — tiny at
      // any SF — so collect them and inline as a literal. Cell assignment then
      // becomes a per-row argmax over the literal (sort_array on
      // (-sim, cell) structs): NO per-vector shuffle, no N×L window — the
      // corpus side is two scans (train, assign+search) and one equi-join.
      val withCells = e.withColumn("cells", rankedCentroidCells(e))
      val assigned = withCells.select(
        col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"),
        element_at(col("cells"), 1).getField("cell").as("cell"))
      val probes = withCells.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          explode(slice(col("cells"), 1, 2)).as("pc"))
        .select(col("qid"), col("qv"), col("qn"), col("pc.cell").as("cell"))
      val sims = assigned.join(broadcast(probes),
          assigned("cell") === probes("cell") && col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
      val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("cid"), round(col("sim"), 5).as("sim"))
        .orderBy("qid", "rnk")
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |cd AS (SELECT label AS cell, d.d AS dim, avg(v[d.d + 1]) AS c
           |  FROM e, range(0, 64) d(d) GROUP BY 1, 2),
           |cents AS (SELECT cell, list(c ORDER BY dim) cvec,
           |  sqrt(list_sum(list_transform(list(c ORDER BY dim), x -> x*x))) cnrm
           |  FROM cd GROUP BY cell),
           |ranked AS (SELECT e.vec_id, e.v, e.nrm, cents.cell,
           |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |    list_sum(list_transform(range(1, 65), i -> e.v[i]*cents.cvec[i]))
           |      / (e.nrm*cents.cnrm) DESC, cents.cell) crn
           |  FROM e, cents),
           |assigned AS (SELECT vec_id cid, v cv, nrm cn, cell FROM ranked WHERE crn = 1),
           |probes AS (SELECT vec_id qid, v qv, nrm qn, cell FROM ranked
           |  WHERE vec_id < 10 AND crn <= 2),
           |p AS (SELECT qid, cid,
           |  list_sum(list_transform(range(1, 65), i -> qv[i]*cv[i])) / (qn*cn) sim
           |  FROM probes JOIN assigned USING (cell) WHERE cid <> qid),
           |r AS (SELECT qid, cid, sim,
           |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rnk FROM p)
           |SELECT qid, rnk, cid, round(sim, 5) AS sim FROM r WHERE rnk <= 3
           |ORDER BY qid, rnk""".stripMargin))

  /** Int8 vector quantization audit — the compression step before shipping
    * embeddings at scale: per-vector symmetric scale (127/max|x|), nearest
    * quantization via floor(x·scale + 0.5) (identical rounding on both
    * engines; `round()` tie rules differ), and reconstruction-error stats.
    * Every output is per-row arithmetic — no cross-row float accumulation,
    * so the oracle matches bit-for-bit.
    */
  val q70Int8Quantize = GraftQuery(
    "q70_int8_quantize",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") < 50)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
        .filter(col("mx") > 0)
        .withColumn("scale", lit(127.0) / col("mx"))
        .withColumn("q", transform(col("v"), x => floor(x * col("scale") + 0.5)))
        .select(
          col("vec_id"),
          round(col("mx"), 6).as("max_abs"),
          round(array_max(zip_with(col("v"), col("q"),
            (x, qq) => abs(x - qq / col("scale")))), 6).as("max_err"),
          size(filter(col("q"), x => abs(x) >= 127)).cast("long").as("n_sat"))
        .orderBy("vec_id"),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < 50),
           |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM e),
           |sc AS (SELECT vec_id, v, mx, 127.0 / mx scale FROM s WHERE mx > 0),
           |qz AS (SELECT vec_id, v, mx, scale,
           |  list_transform(v, x -> floor(x * scale + 0.5)) q FROM sc)
           |SELECT vec_id, round(mx, 6) AS max_abs,
           |  round(list_max(list_transform(range(1, 65), i -> abs(v[i] - q[i] / scale))), 6) AS max_err,
           |  CAST(len(list_filter(q, x -> abs(x) >= 127)) AS BIGINT) AS n_sat
           |FROM qz ORDER BY vec_id""".stripMargin))

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space, then compare pairs ONLY within a cluster
    * — pairwise cost drops from O(n²) to O(Σ n_cell²), the property that
    * makes semantic dedup tractable at corpus scale. Pipeline:
    * per-label centroids → argmax-cosine cell assignment (the q47 IVF
    * machinery) → within-cell pairwise cosine ≥ τ edges → connected
    * components ([[Dedup.connectedComponents]]: adaptive union-find /
    * large-star-small-star) → survivor = min vec_id per cluster.
    *
    * τ = 0.30 against the synthetic fixtures (which plant no true
    * near-identical vectors — the threshold exercises a non-degenerate
    * cluster structure; production SemDeDup uses ~0.95+ on real
    * embeddings). Pair sims are per-pair left-to-right folds over the
    * original vectors — bit-identical in both engines, so the edge set is
    * exact; only the displayed sim is rounded.
    *
    * RETIRED from the registered inventory (round 7): strictly dominated
    * by q141, whose `lloyd`-derived cells bound cell cardinality (label
    * cells grow with the corpus — O(n²/L) pairwise). Kept as the bounded
    * ground-truth sibling, exercised by TrainingPipelineSpec; the one
    * registered SemDeDup scale path is q141.
    */
  /** The q134/q141-shared collapse tail (the cell-decorated sibling of
    * Dedup's collapseClusters): component labels → sized clusters with
    * min-id survivor election, each member decorated with its cell.
    */
  private[ops] def collapseVecClusters(lbl: DataFrame,
      assigned: DataFrame): DataFrame = {
    val sz = lbl.groupBy(col("lbl").as("c2")).agg(count(lit(1)).as("n_members"))
    lbl.join(sz, col("lbl") === col("c2"))
      .join(assigned.select(col("vec_id"), col("cell")),
        lbl("v") === col("vec_id"))
      .select(col("vec_id"), col("cell"), col("lbl").as("cluster_id"),
        col("n_members"),
        (col("vec_id") === col("lbl")).cast("int").as("survivor"))
      .orderBy("vec_id")
  }

  val q134SemanticDedup = GraftQuery(
    "q134_semantic_dedup",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", norm(col("v")))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))
        .persist()
      val assigned = e
        .withColumn("cell",
          element_at(rankedCentroidCells(e), 1).getField("cell"))
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
        .persist()
      val pairs = assigned.as("a")
        .join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")) >= 0.30)
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      collapseVecClusters(Dedup.connectedComponents(pairs), assigned)
    },
    Some("""WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |cd AS (SELECT label AS cell, d.d AS dim, avg(v[d.d + 1]) AS c
           |  FROM e, range(0, 64) d(d) GROUP BY 1, 2),
           |cents AS (SELECT cell, list(c ORDER BY dim) cvec,
           |  sqrt(list_sum(list_transform(list(c ORDER BY dim), x -> x*x))) cnrm
           |  FROM cd GROUP BY cell),
           |ranked AS (SELECT e.vec_id, e.v, e.nrm, cents.cell,
           |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |    list_sum(list_transform(range(1, 65), i -> e.v[i]*cents.cvec[i]))
           |      / (e.nrm*cents.cnrm) DESC, cents.cell) crn
           |  FROM e, cents),
           |assigned AS (SELECT vec_id, v, nrm, cell FROM ranked WHERE crn = 1),
           |pairs AS (SELECT a.vec_id i, b.vec_id j
           |  FROM assigned a JOIN assigned b
           |    ON a.cell = b.cell AND a.vec_id < b.vec_id
           |  WHERE list_sum(list_transform(range(1, 65), k -> a.v[k]*b.v[k]))
           |      / (a.nrm*b.nrm) >= 0.30),
           |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
           |reach(a, b) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a AND e2.b <> r.a),
           |lbl AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
           |sz AS (SELECT cluster_id, count(*) AS n_members FROM lbl GROUP BY 1)
           |SELECT l.vec_id, asg.cell, l.cluster_id, sz.n_members,
           |  CAST(l.vec_id = l.cluster_id AS INT) AS survivor
           |FROM lbl l JOIN sz USING (cluster_id) JOIN assigned asg USING (vec_id)
           |ORDER BY l.vec_id""".stripMargin))

  /** Distributed Lloyd's k-means (k = 6, 3 iterations) — the clustering
    * stage SemDeDup/IVF pipelines train with (q47/q134 stand it in with
    * label centroids; this is the real estimator). Deterministic
    * throughout: init = the k lowest vec_ids' vectors, assignment =
    * argmin squared L2 with ties to the lower centroid index.
    *
    * Scale shape (the q98/q132 driver-loop pattern): each iteration is one
    * corpus scan — assignment happens against a BROADCAST-LITERAL centroid
    * array (k×64 doubles — k rows collected per iteration, never corpus
    * data), means reduce by partial aggregation. Nothing corpus-sized
    * touches the driver; iterations are O(k·dim) driver state.
    *
    * Float discipline: centroid means are partial-agg sums (order-
    * dependent at ~1e-13) — assignments only flip if two centroid
    * distances collide within that, which continuous fixtures never do
    * (the q47 argmax pattern, green since round 2); inertia is rounded to
    * 3 digits per the moment-aggregate discipline.
    */
  /** Lloyd's k-means core behind q137, extracted so specs can feed planted
    * clusters. Input needs columns (vec_id, v: array<double>) in that
    * position order; returns the final centroids and the assignment frame
    * (vec_id, v, j, d) where j is the winning centroid index and d the
    * squared L2 distance to it. Seeding = the k lowest vec_ids' vectors;
    * ties in assignment go to the lower centroid index; `rounds` mean
    * updates re-collect only k centroid rows each.
    */
  private[graft] def lloyd(e: DataFrame, k: Int, rounds: Int,
                           dim: Int = DIM): (Seq[(Int, Seq[Double])], DataFrame) = {
    val vecAvg = udaf(new graft.functions.VectorAvg(dim))
    // deterministic seeding: the k lowest vec_ids, centroid idx = rank
    var cents: Seq[(Int, Seq[Double])] = e.orderBy("vec_id").limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    def centsLit = array(cents.map { case (idx, cv) =>
      struct(lit(idx).as("idx"), typedLit(cv).as("cv"))
    }: _*)
    // squared L2 to centroid c: fold over zipped dims (left-to-right,
    // engine-stable)
    def dist2(c: Column) = aggregate(
      zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)
    def assigned = e.withColumn("best",
      element_at(sort_array(transform(centsLit,
        c => struct(dist2(c("cv")).as("d"), c("idx").as("idx")))), 1))
      .withColumn("j", col("best.idx")).withColumn("d", col("best.d"))
      .drop("best")
    for (_ <- 1 to rounds) {
      cents = assigned.groupBy("j").agg(vecAvg(col("v")).as("cv")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    }
    (cents, assigned)
  }

  /** SemDeDup with SCALE-PROOF cells: q134's pipeline with the cell
    * assignment coming from [[lloyd]] k-means instead of the fixed label
    * set — the actual SemDeDup recipe (Abbas et al. 2023 cluster with
    * k-means, not with labels). k grows with the corpus,
    * k = max(8, ceil(n / 64)), so expected cell cardinality stays bounded
    * (~64) and the within-cell pairwise join is O(n · cell_target) —
    * but the exact Lloyd ASSIGNMENT term is n·k·dim ∝ n² (see the
    * asymptotic-honesty paragraph below: the round-12 factor-30 audit
    * measured its tail exponent at 1.619), which is why this query is the
    * GROUND-TRUTH BRACKET of the family, not its scale path — q364's SRP
    * banding and q365's fixed-k IVF cells are the registered 100 TB
    * plans. q134's label cells were worse still, O(n²/L) in the pairwise
    * itself (the one `weak` scale grade of round 5). SemanticDedupSpec
    * pins the bounded-cell property on a skewed planted fixture.
    *
    * Per-iteration cost is one corpus scan against broadcast-literal
    * centroids plus a k-row collect (driver state O(k·dim), never corpus
    * rows). The CC + survivor tail is q134's, unchanged.
    *
    * Asymptotic honesty: with k ∝ n the exact Lloyd ASSIGNMENT term is
    * n·k·dim ∝ n², and the exact-SemDeDup trade (assignment n·k vs
    * within-cell pairs n²/k) bottoms out at k ∝ √n ⇒ Θ(n^1.5) — no exact
    * variant is linear. The round-12 THREE-point audit measured exactly
    * this prediction surfacing (SCALING_r12_final.json): the factor-3→10
    * exponent is 0.874 (dim constant still dominating) while the
    * factor-10→30 exponent is 1.619 (the n·k assignment term now in
    * charge, as this paragraph forecast a round earlier). At true 100 TB
    * the production recipe swaps the assignment for an ANN probe (the
    * q157 IVF machinery — coarse-quantize centroids, probe a fixed cell
    * fraction), which this engine ships as its own audited path
    * (q157/q161, factor-10→30 exponents ≈ flat). q141 keeps the EXACT
    * assignment because its oracle replays Lloyd bit-for-bit — it is the
    * ground-truth bracket, q157 the scale path.
    */
  val q141SemanticDedupKmeans = GraftQuery(
    "q141_semantic_dedup_kmeans",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", norm(col("v")))
        .select(col("vec_id"), col("v"), col("nrm"))
        .persist()
      val k = math.max(8, math.ceil(e.count() / 64.0).toInt)
      // lloyd reads (vec_id, v) positionally and passes extra columns
      // through, so nrm rides along into the assignment frame
      val (_, assigned0) = lloyd(e, k, rounds = 2)
      val assigned = assigned0
        .select(col("vec_id"), col("v"), col("nrm"), col("j").as("cell"))
        .persist()
      val pairs = assigned.as("a")
        .join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")) >= 0.30)
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      collapseVecClusters(Dedup.connectedComponents(pairs), assigned)
    },
    Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |kk AS (SELECT greatest(8, CAST(ceil(count(*) / 64.0) AS INT)) AS k FROM e),
           |c0 AS (SELECT idx, cv FROM (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv FROM e)
           |  WHERE idx < (SELECT k FROM kk)),
           |a1 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c0),
           |g1 AS (SELECT vec_id, v, idx AS j FROM a1 WHERE rn = 1),
           |c1 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g1, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a2 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c1),
           |g2 AS (SELECT vec_id, v, idx AS j FROM a2 WHERE rn = 1),
           |c2 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g2, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a3 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c2),
           |asg AS (SELECT a3.vec_id, a3.v, e.nrm, a3.idx AS cell
           |  FROM a3 JOIN e USING (vec_id) WHERE rn = 1),
           |pairs AS (SELECT a.vec_id i, b.vec_id j
           |  FROM asg a JOIN asg b
           |    ON a.cell = b.cell AND a.vec_id < b.vec_id
           |  WHERE list_sum(list_transform(range(1, 65), q -> a.v[q]*b.v[q]))
           |      / (a.nrm*b.nrm) >= 0.30),
           |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
           |reach(a, b) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a AND e2.b <> r.a),
           |lbl AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
           |sz AS (SELECT cluster_id, count(*) AS n_members FROM lbl GROUP BY 1)
           |SELECT l.vec_id, asg.cell, l.cluster_id, sz.n_members,
           |  CAST(l.vec_id = l.cluster_id AS INT) AS survivor
           |FROM lbl l JOIN sz USING (cluster_id) JOIN asg USING (vec_id)
           |ORDER BY l.vec_id""".stripMargin))

  val q137Kmeans = GraftQuery(
    "q137_kmeans",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"))
        .persist()
      // final assignment against the 2nd-iteration means; report cluster
      // sizes + inertia (3-digit rounding: cross-row float accumulation)
      val (_, assigned) = lloyd(e, k = 6, rounds = 2)
      assigned
        .groupBy("j").agg(count(lit(1)).as("n_members"),
          round(sum("d"), 3).as("inertia"))
        .select(col("j").as("cluster"), col("n_members"), col("inertia"))
        .orderBy("cluster")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
           |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv
           |  FROM e ORDER BY vec_id LIMIT 6),
           |a1 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c0),
           |g1 AS (SELECT vec_id, v, idx AS j FROM a1 WHERE rn = 1),
           |c1 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g1, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a2 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c1),
           |g2 AS (SELECT vec_id, v, idx AS j FROM a2 WHERE rn = 1),
           |c2 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g2, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a3 AS (SELECT vec_id, v, idx,
           |    list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))) AS d,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c2),
           |g3 AS (SELECT vec_id, idx AS j, d FROM a3 WHERE rn = 1)
           |SELECT j AS cluster, count(*) AS n_members, round(sum(d), 3) AS inertia
           |FROM g3 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Product quantization + asymmetric-distance (ADC) search (Jégou et al.
    * 2011, "Product Quantization for Nearest Neighbor Search") — the
    * compression stage that makes billion-vector ANN memory-feasible: the
    * 64-dim space splits into M=4 subspaces of 16 dims, each subspace gets
    * its own [[lloyd]] codebook (k=4, one refinement round, lowest-id
    * seeding), and every vector collapses to M one-byte codes. Queries stay
    * UNQUANTIZED: ADC distance = Σ_m ‖q_sub_m − codebook_m[code_m]‖², so
    * search touches only the 4-byte codes plus a literal codebook.
    *
    * Scale: codebooks train on per-subspace corpus scans (k-row collects,
    * the q137 discipline); encoding is one shuffle-free scan against
    * broadcast-literal codebooks; ADC search is a broadcast join from the
    * query batch to the code table — the corpus-side state is 16× smaller
    * than the raw vectors, which is the operator's entire point.
    *
    * Determinism: codes are argmin-by-(dist, position) over literal
    * codebooks; ADC sums fold left-to-right per row — both engines
    * reproduce them exactly (the q47/q137 float discipline).
    */
  val q147PqAdc = GraftQuery(
    "q147_pq_adc",
    (s, dir) => {
      GraftFunctions.register(s)
      val M = 4; val SUB = 16; val K = 4
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"))
        .persist()
      // per-subspace codebooks: positions in idx order (cells can only
      // vanish on duplicate seeds, symmetrically in the oracle)
      val books: Seq[Seq[Seq[Double]]] = (0 until M).map { m =>
        val sub = e.select(col("vec_id"), slice(col("v"), m * SUB + 1, SUB).as("v"))
        lloyd(sub, K, rounds = 1, dim = SUB)._1.sortBy(_._1).map(_._2)
      }
      def dist2(a: Column, cv: Seq[Double]): Column = aggregate(
        zip_with(a, typedLit(cv), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
      def code(m: Int): Column = {
        val ranked = sort_array(array(books(m).zipWithIndex.map { case (cv, pos) =>
          struct(dist2(slice(col("v"), m * SUB + 1, SUB), cv).as("d"),
            lit(pos).as("pos"))
        }: _*))
        element_at(ranked, 1).getField("pos")
      }
      val codes = e.select(
        (col("vec_id") +: (0 until M).map(m => code(m).as(s"k$m"))): _*)
      val queries = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      // ADC: per (query, code-row), sum the per-subspace table lookups —
      // the codebook rides along as a literal, the corpus side is codes only
      val adc = (0 until M).map { m =>
        val lut = array(books(m).map(cv => struct(typedLit(cv).as("cv"))): _*)
        aggregate(
          zip_with(slice(col("qv"), m * SUB + 1, SUB),
            element_at(lut, col(s"k$m") + 1).getField("cv"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d)
      }.reduce(_ + _)
      val sims = codes.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"), adc.as("adc"))
      val w = Window.partitionBy("qid").orderBy(asc("adc"), col("cid"))
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("cid"), round(col("adc"), 5).as("adc"))
        .orderBy("qid", "rnk")
    },
    Some {
      // one codebook block per subspace: seeds from the 4 lowest vec_ids'
      // subvectors, one assignment round, means, then positions in idx order
      def block(m: Int): String = {
        val lo = m * 16 + 1; val hi = m * 16 + 16
        s"""s$m AS (SELECT vec_id, v[$lo:$hi] AS sub FROM e),
           |c0_$m AS (SELECT idx, cv FROM (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, sub AS cv
           |  FROM s$m) WHERE idx < 4),
           |a1_$m AS (SELECT vec_id, sub, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 17), i -> (sub[i]-cv[i])*(sub[i]-cv[i]))), idx) rn
           |  FROM s$m, c0_$m),
           |c1_$m AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT idx AS j, d.d AS dim, avg(sub[d.d + 1]) AS c
           |  FROM a1_$m, range(0, 16) d(d) WHERE rn = 1 GROUP BY 1, 2) GROUP BY 1),
           |cp_$m AS (SELECT row_number() OVER (ORDER BY idx) - 1 AS pos, cv FROM c1_$m),
           |k_$m AS (SELECT vec_id, pos FROM (
           |  SELECT vec_id, pos, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 17), i -> (sub[i]-cv[i])*(sub[i]-cv[i]))), pos) rn
           |  FROM s$m, cp_$m) WHERE rn = 1)"""
      }
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |${(0 until 4).map(block).mkString(",\n")},
         |codes AS (SELECT e.vec_id, k_0.pos AS k0, k_1.pos AS k1, k_2.pos AS k2, k_3.pos AS k3
         |  FROM e JOIN k_0 USING (vec_id) JOIN k_1 USING (vec_id)
         |         JOIN k_2 USING (vec_id) JOIN k_3 USING (vec_id)),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
         |p AS (SELECT qid, codes.vec_id AS cid,
         |    list_sum(list_transform(range(1, 17), i -> (qv[i]-b0.cv[i])*(qv[i]-b0.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qv[i+16]-b1.cv[i])*(qv[i+16]-b1.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qv[i+32]-b2.cv[i])*(qv[i+32]-b2.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qv[i+48]-b3.cv[i])*(qv[i+48]-b3.cv[i]))) AS adc
         |  FROM q JOIN codes ON codes.vec_id <> qid
         |  JOIN cp_0 b0 ON b0.pos = codes.k0 JOIN cp_1 b1 ON b1.pos = codes.k1
         |  JOIN cp_2 b2 ON b2.pos = codes.k2 JOIN cp_3 b3 ON b3.pos = codes.k3),
         |r AS (SELECT qid, cid, adc,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc, cid) rnk FROM p)
         |SELECT qid, rnk, cid, round(adc, 5) AS adc FROM r WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin
    })

  /** Johnson-Lindenstrauss random projection 64 → 16 dims with a
    * distance-distortion audit — the dimensionality-reduction step
    * embedding pipelines run before expensive pairwise work (4× less data
    * movement for every operator downstream). The projection matrix is the
    * deterministic ±1/√16 sign matrix derived from md5 parity (the q31
    * hyperplane discipline — any engine reproduces it), so the projection
    * is one shuffle-free scan of 16 literal-vector dot products per row;
    * the audit emits per-pair original distance, projected distance, and
    * the distortion ratio JL says concentrates around 1.
    *
    * Scale: projection is map-only against a broadcast-literal matrix; the
    * all-pairs audit is the bounded ground-truth form (vec_id < 40) — in
    * production you audit a sample, project everything.
    */
  val q155JlProjection = GraftQuery(
    "q155_jl_projection",
    (s, dir) => {
      GraftFunctions.register(s)
      val md = java.security.MessageDigest.getInstance("MD5")
      // r(k, d) = +1 if the first 8 md5 nibbles of "r{k}_{d}" are even
      val rows: Seq[Seq[Double]] = (0 until 16).map { k =>
        (0 until DIM).map { d =>
          val hex = md.digest(s"r${k}_$d".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString
          if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
        }
      }
      val e = Tables.embeddings(s, dir).filter(col("vec_id") < 40)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("p", array(rows.map(r =>
          lit(0.25) * GraftFunctions.dot(col("v"), typedLit(r))): _*))
        .select(col("vec_id"), col("v"), col("p"))
      def dist2(a: Column, b: Column) = aggregate(
        zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
          dist2(col("a.v"), col("b.v")).as("d2o"),
          dist2(col("a.p"), col("b.p")).as("d2p"))
        .filter(col("d2o") > 0)
        .select(col("i"), col("j"),
          round(sqrt(col("d2o")), 5).as("dist_orig"),
          round(sqrt(col("d2p")), 5).as("dist_proj"),
          round(sqrt(col("d2p") / col("d2o")), 5).as("distortion"))
        .orderBy("i", "j")
    },
    Some("""WITH rl AS (
           |  SELECT k.k, list(CASE WHEN ('0x' || substr(md5('r'||k.k||'_'||d.d), 1, 8))::BIGINT % 2 = 0
           |      THEN 1.0 ELSE -1.0 END ORDER BY d.d) AS wv
           |  FROM range(0, 16) k(k), range(0, 64) d(d) GROUP BY k.k),
           |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < 40),
           |prk AS (SELECT e.vec_id, rl.k,
           |    0.25 * list_sum(list_transform(range(1, 65), i -> e.v[i] * rl.wv[i])) AS pk
           |  FROM e, rl),
           |pr AS (SELECT prk.vec_id, e.v, list(pk ORDER BY k) AS p
           |  FROM prk JOIN e USING (vec_id) GROUP BY prk.vec_id, e.v),
           |pairs AS (SELECT a.vec_id i, b.vec_id j,
           |    list_sum(list_transform(range(1, 65), q -> (a.v[q]-b.v[q])*(a.v[q]-b.v[q]))) d2o,
           |    list_sum(list_transform(range(1, 17), q -> (a.p[q]-b.p[q])*(a.p[q]-b.p[q]))) d2p
           |  FROM pr a, pr b WHERE a.vec_id < b.vec_id)
           |SELECT i, j, round(sqrt(d2o), 5) AS dist_orig,
           |  round(sqrt(d2p), 5) AS dist_proj,
           |  round(sqrt(d2p / d2o), 5) AS distortion
           |FROM pairs WHERE d2o > 0 ORDER BY i, j""".stripMargin))

  /** IVFADC — the inverted-file + product-quantization COMPOSITION (Jégou
    * et al. 2011 §IV): q47 probes cells but stores raw vectors; q147
    * ADC-scores codes but scans the whole corpus; the system a
    * billion-vector deployment actually runs does both. A coarse [[lloyd]]
    * quantizer (k=8, one refinement round) buckets every vector into a
    * cell; per-subspace [[lloyd]] codebooks (M=4 × 16 dims, k=4) collapse
    * it to 4 one-byte codes; a query ranks the 8 cell centroids, probes its
    * top-2 cells, and ADC-scores ONLY the codes inside those cells against
    * a broadcast-literal LUT.
    *
    * Scale: corpus-side state is cell id + 4 bytes per vector (the 16×
    * compression q147 buys) AND search touches ~2/8 of it (the selectivity
    * q47 buys) — training is k-row collects, encoding and probing are
    * shuffle-free scans against literals, search is one equi-join on cell
    * id from the broadcast query batch. No stage reads the raw corpus
    * after encoding.
    *
    * Determinism: both quantizers argmin over (dist, idx) structs; ADC
    * folds left-to-right — the q47/q137/q147 float discipline throughout.
    */
  /** q157 and q255 share [[ivfAdcSearch]]'s persisted lineage; under the
    * verify harness's concurrent lanes the overlapping persist/clearCache
    * produced a spurious analysis error, so the two executions serialize
    * on this lock (a few seconds each — negligible, and only these two
    * contend).
    */
  private val ivfAdcLock = new Object

  val q157IvfAdc = GraftQuery(
    "q157_ivfadc",
    (s, dir) => ivfAdcLock.synchronized {
      // eager localCheckpoint: the result's 15 rows materialize INSIDE the
      // lock and downstream consumers read checkpoint blocks, never the
      // shared search lineage
      ivfAdcSearch(s, dir, topk = 5)
        .select(col("qid"), col("rnk"), col("cid"), col("cell"),
          round(col("adc"), 5).as("adc"))
        .orderBy("qid", "rnk")
        .localCheckpoint()
    },
    q157OracleSql)

  /** q157's IVFADC search with a parameterized candidate depth, shared
    * with q255's exact-rerank second stage. Returns (qid, rnk, cid,
    * cell, adc) with adc UNROUNDED — callers format.
    */
  private[graft] def ivfAdcSearch(s: SparkSession, dir: String, topk: Int): DataFrame = {
      GraftFunctions.register(s)
      val M = 4; val SUB = 16; val K = 4; val KC = 8
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"))
        .persist()
      // coarse quantizer on the full vectors; `assigned` carries the final
      // per-vector cell in j
      val (cents, assigned) = lloyd(e, KC, rounds = 1)
      // per-subspace PQ codebooks — q147's training, unchanged
      val books: Seq[Seq[Seq[Double]]] = (0 until M).map { m =>
        val sub = e.select(col("vec_id"), slice(col("v"), m * SUB + 1, SUB).as("v"))
        lloyd(sub, K, rounds = 1, dim = SUB)._1.sortBy(_._1).map(_._2)
      }
      def dist2(a: Column, cv: Seq[Double]): Column = aggregate(
        zip_with(a, typedLit(cv), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
      def code(m: Int): Column = {
        val ranked = sort_array(array(books(m).zipWithIndex.map { case (cv, pos) =>
          struct(dist2(slice(col("v"), m * SUB + 1, SUB), cv).as("d"),
            lit(pos).as("pos"))
        }: _*))
        element_at(ranked, 1).getField("pos")
      }
      val codes = assigned.select(
        (col("vec_id") +: col("j").as("cell") +:
          (0 until M).map(m => code(m).as(s"k$m"))): _*)
      // query batch ranks the literal cell centroids and probes its top 2
      val centsLit = array(cents.map { case (idx, cv) =>
        struct(lit(idx).as("idx"), typedLit(cv).as("cv"))
      }: _*)
      def dist2c(a: Column, c: Column): Column = aggregate(
        zip_with(a, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
      val probes = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
        .withColumn("pc", explode(slice(sort_array(transform(centsLit,
          c => struct(dist2c(col("qv"), c("cv")).as("d"), c("idx").as("idx")))),
          1, 2)))
        .select(col("qid"), col("qv"), col("pc.idx").as("pcell"))
      val adc = (0 until M).map { m =>
        val lut = array(books(m).map(cv => struct(typedLit(cv).as("cv"))): _*)
        aggregate(
          zip_with(slice(col("qv"), m * SUB + 1, SUB),
            element_at(lut, col(s"k$m") + 1).getField("cv"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d)
      }.reduce(_ + _)
      val sims = codes.join(broadcast(probes),
          col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"), col("cell"), adc.as("adc"))
      val w = Window.partitionBy("qid").orderBy(asc("adc"), col("cid"))
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= topk)
        .select(col("qid"), col("rnk"), col("cid"), col("cell"), col("adc"))
  }

  private lazy val q157OracleSql: Option[String] = Some {
      // per-subspace codebook blocks: q147's oracle training, verbatim
      def block(m: Int): String = {
        val lo = m * 16 + 1; val hi = m * 16 + 16
        s"""s$m AS (SELECT vec_id, v[$lo:$hi] AS sub FROM e),
           |c0_$m AS (SELECT idx, cv FROM (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, sub AS cv
           |  FROM s$m) WHERE idx < 4),
           |a1_$m AS (SELECT vec_id, sub, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 17), i -> (sub[i]-cv[i])*(sub[i]-cv[i]))), idx) rn
           |  FROM s$m, c0_$m),
           |c1_$m AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT idx AS j, d.d AS dim, avg(sub[d.d + 1]) AS c
           |  FROM a1_$m, range(0, 16) d(d) WHERE rn = 1 GROUP BY 1, 2) GROUP BY 1),
           |cp_$m AS (SELECT row_number() OVER (ORDER BY idx) - 1 AS pos, cv FROM c1_$m),
           |k_$m AS (SELECT vec_id, pos FROM (
           |  SELECT vec_id, pos, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 17), i -> (sub[i]-cv[i])*(sub[i]-cv[i]))), pos) rn
           |  FROM s$m, cp_$m) WHERE rn = 1)"""
      }
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |cc0 AS (SELECT idx, cv FROM (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv FROM e)
         |  WHERE idx < 8),
         |ca1 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
         |  FROM e, cc0),
         |cc1 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
         |  SELECT idx AS j, d.d AS dim, avg(v[d.d + 1]) AS c FROM ca1, range(0, 64) d(d)
         |  WHERE rn = 1 GROUP BY 1, 2) GROUP BY 1),
         |cells AS (SELECT vec_id, idx AS cell FROM (
         |  SELECT vec_id, idx, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
         |  FROM e, cc1) WHERE rn = 1),
         |${(0 until 4).map(block).mkString(",\n")},
         |codes AS (SELECT e.vec_id, cells.cell,
         |    k_0.pos AS k0, k_1.pos AS k1, k_2.pos AS k2, k_3.pos AS k3
         |  FROM e JOIN cells USING (vec_id) JOIN k_0 USING (vec_id)
         |         JOIN k_1 USING (vec_id) JOIN k_2 USING (vec_id)
         |         JOIN k_3 USING (vec_id)),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
         |probe AS (SELECT qid, qv, idx AS cell FROM (
         |  SELECT qid, qv, idx, row_number() OVER (PARTITION BY qid
         |    ORDER BY list_sum(list_transform(range(1, 65), i -> (qv[i]-cv[i])*(qv[i]-cv[i]))), idx) crn
         |  FROM q, cc1) WHERE crn <= 2),
         |p AS (SELECT probe.qid, codes.vec_id AS cid, codes.cell,
         |    list_sum(list_transform(range(1, 17), i -> (qv[i]-b0.cv[i])*(qv[i]-b0.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qv[i+16]-b1.cv[i])*(qv[i+16]-b1.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qv[i+32]-b2.cv[i])*(qv[i+32]-b2.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qv[i+48]-b3.cv[i])*(qv[i+48]-b3.cv[i]))) AS adc
         |  FROM probe JOIN codes ON codes.cell = probe.cell AND codes.vec_id <> probe.qid
         |  JOIN cp_0 b0 ON b0.pos = codes.k0 JOIN cp_1 b1 ON b1.pos = codes.k1
         |  JOIN cp_2 b2 ON b2.pos = codes.k2 JOIN cp_3 b3 ON b3.pos = codes.k3),
         |r AS (SELECT qid, cid, cell, adc,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc, cid) rnk FROM p)
         |SELECT qid, rnk, cid, cell, round(adc, 5) AS adc FROM r WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin
  }

  /** RESIDUAL IVFADC — the full Jégou et al. 2011 §IV.A recipe: q157
    * quantizes raw vectors, but the production encoding quantizes the
    * RESIDUAL r = v − centroid(cell), which concentrates the PQ codebooks
    * on the within-cell distribution (much tighter than the global one —
    * the reason IVFADC beats IVF+PQ-on-raw at equal code budget). Search
    * becomes per-(query, cell) asymmetric: probing a cell first subtracts
    * that cell's centroid from the query, then ADC-scores the residual
    * codes inside it.
    *
    * Scale shape is identical to q157 (k-row collects for training,
    * shuffle-free encode against broadcast literals, keyed probe join);
    * the only addition is one zip_with subtraction per row and per probe.
    *
    * Determinism: the cell centroids are partial-agg means (~1e-13
    * order-dependence), so residual argmins inherit the q141/q147
    * discipline — continuous fixtures never tie within that; displayed
    * adc rounds at 5.
    */
  val q161IvfAdcResidual = GraftQuery(
    "q161_ivfadc_residual",
    (s, dir) => {
      GraftFunctions.register(s)
      val M = 4; val SUB = 16; val K = 4; val KC = 8
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"))
        .persist()
      val (cents, assigned) = lloyd(e, KC, rounds = 1)
      // every seed self-assigns at distance 0, so all KC cells survive the
      // mean update and centArr can be indexed by cell id directly
      require(cents.map(_._1) == (0 until KC),
        s"coarse cells not contiguous: ${cents.map(_._1)}")
      val centArr = array(cents.map { case (_, cv) => typedLit(cv) }: _*)
      val resid = assigned.select(col("vec_id"),
          zip_with(col("v"), element_at(centArr, col("j") + 1),
            (a, b) => a - b).as("rv"),
          col("j").as("cell"))
        .persist()
      // PQ codebooks train on RESIDUAL subvectors
      val books: Seq[Seq[Seq[Double]]] = (0 until M).map { m =>
        val sub = resid.select(col("vec_id"), slice(col("rv"), m * SUB + 1, SUB).as("v"))
        lloyd(sub, K, rounds = 1, dim = SUB)._1.sortBy(_._1).map(_._2)
      }
      def dist2(a: Column, cv: Seq[Double]): Column = aggregate(
        zip_with(a, typedLit(cv), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
      def code(m: Int): Column = {
        val ranked = sort_array(array(books(m).zipWithIndex.map { case (cv, pos) =>
          struct(dist2(slice(col("rv"), m * SUB + 1, SUB), cv).as("d"),
            lit(pos).as("pos"))
        }: _*))
        element_at(ranked, 1).getField("pos")
      }
      val codes = resid.select(
        (col("vec_id") +: col("cell") +:
          (0 until M).map(m => code(m).as(s"k$m"))): _*)
      def dist2c(a: Column, c: Column): Column = aggregate(
        zip_with(a, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
      val centsLit = array(cents.map { case (idx, cv) =>
        struct(lit(idx).as("idx"), typedLit(cv).as("cv"))
      }: _*)
      // probe top-2 cells, then subtract THAT cell's centroid from the query
      val probes = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
        .withColumn("pc", explode(slice(sort_array(transform(centsLit,
          c => struct(dist2c(col("qv"), c("cv")).as("d"), c("idx").as("idx")))),
          1, 2)))
        .select(col("qid"),
          zip_with(col("qv"), element_at(centArr, col("pc.idx") + 1),
            (a, b) => a - b).as("qres"),
          col("pc.idx").as("pcell"))
      val adc = (0 until M).map { m =>
        val lut = array(books(m).map(cv => struct(typedLit(cv).as("cv"))): _*)
        aggregate(
          zip_with(slice(col("qres"), m * SUB + 1, SUB),
            element_at(lut, col(s"k$m") + 1).getField("cv"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d)
      }.reduce(_ + _)
      val sims = codes.join(broadcast(probes),
          col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"), col("cell"), adc.as("adc"))
      val w = Window.partitionBy("qid").orderBy(asc("adc"), col("cid"))
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("cid"), col("cell"),
          round(col("adc"), 5).as("adc"))
        .orderBy("qid", "rnk")
    },
    Some {
      // per-subspace codebook blocks over RESIDUAL subvectors
      def block(m: Int): String = {
        val lo = m * 16 + 1; val hi = m * 16 + 16
        s"""s$m AS (SELECT vec_id, rv[$lo:$hi] AS sub FROM resid),
           |c0_$m AS (SELECT idx, cv FROM (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, sub AS cv
           |  FROM s$m) WHERE idx < 4),
           |a1_$m AS (SELECT vec_id, sub, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 17), i -> (sub[i]-cv[i])*(sub[i]-cv[i]))), idx) rn
           |  FROM s$m, c0_$m),
           |c1_$m AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT idx AS j, d.d AS dim, avg(sub[d.d + 1]) AS c
           |  FROM a1_$m, range(0, 16) d(d) WHERE rn = 1 GROUP BY 1, 2) GROUP BY 1),
           |cp_$m AS (SELECT row_number() OVER (ORDER BY idx) - 1 AS pos, cv FROM c1_$m),
           |k_$m AS (SELECT vec_id, pos FROM (
           |  SELECT vec_id, pos, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 17), i -> (sub[i]-cv[i])*(sub[i]-cv[i]))), pos) rn
           |  FROM s$m, cp_$m) WHERE rn = 1)"""
      }
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |cc0 AS (SELECT idx, cv FROM (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv FROM e)
         |  WHERE idx < 8),
         |ca1 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
         |  FROM e, cc0),
         |cc1 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
         |  SELECT idx AS j, d.d AS dim, avg(v[d.d + 1]) AS c FROM ca1, range(0, 64) d(d)
         |  WHERE rn = 1 GROUP BY 1, 2) GROUP BY 1),
         |cells AS (SELECT vec_id, idx AS cell FROM (
         |  SELECT vec_id, idx, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
         |  FROM e, cc1) WHERE rn = 1),
         |resid AS (SELECT e.vec_id, cells.cell,
         |    list_transform(range(1, 65), i -> e.v[i] - cc1.cv[i]) AS rv
         |  FROM e JOIN cells USING (vec_id) JOIN cc1 ON cc1.idx = cells.cell),
         |${(0 until 4).map(block).mkString(",\n")},
         |codes AS (SELECT resid.vec_id, resid.cell,
         |    k_0.pos AS k0, k_1.pos AS k1, k_2.pos AS k2, k_3.pos AS k3
         |  FROM resid JOIN k_0 USING (vec_id) JOIN k_1 USING (vec_id)
         |         JOIN k_2 USING (vec_id) JOIN k_3 USING (vec_id)),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
         |probe AS (SELECT qid, qv, idx AS cell FROM (
         |  SELECT qid, qv, idx, row_number() OVER (PARTITION BY qid
         |    ORDER BY list_sum(list_transform(range(1, 65), i -> (qv[i]-cv[i])*(qv[i]-cv[i]))), idx) crn
         |  FROM q, cc1) WHERE crn <= 2),
         |pq AS (SELECT qid, probe.cell,
         |    list_transform(range(1, 65), i -> qv[i] - cc1.cv[i]) AS qres
         |  FROM probe JOIN cc1 ON cc1.idx = probe.cell),
         |p AS (SELECT pq.qid, codes.vec_id AS cid, codes.cell,
         |    list_sum(list_transform(range(1, 17), i -> (qres[i]-b0.cv[i])*(qres[i]-b0.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qres[i+16]-b1.cv[i])*(qres[i+16]-b1.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qres[i+32]-b2.cv[i])*(qres[i+32]-b2.cv[i])))
         |  + list_sum(list_transform(range(1, 17), i -> (qres[i+48]-b3.cv[i])*(qres[i+48]-b3.cv[i]))) AS adc
         |  FROM pq JOIN codes ON codes.cell = pq.cell AND codes.vec_id <> pq.qid
         |  JOIN cp_0 b0 ON b0.pos = codes.k0 JOIN cp_1 b1 ON b1.pos = codes.k1
         |  JOIN cp_2 b2 ON b2.pos = codes.k2 JOIN cp_3 b3 ON b3.pos = codes.k3),
         |r AS (SELECT qid, cid, cell, adc,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc, cid) rnk FROM p)
         |SELECT qid, rnk, cid, cell, round(adc, 5) AS adc FROM r WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin
    })

  // q134SemanticDedup is deliberately absent: retired round 7, dominated
  /** One exact ALS half-step (Zhou et al. 2008): solve every user's rank-2
    * factor from FIXED item factors by per-user ridge normal equations,
    * u = (Σ v·vᵀ + λI)⁻¹ (Σ r·v) — at rank 2 the inverse is the
    * closed-form 2×2 adjugate, so the whole "training step" is five
    * partial-agg sums per user followed by per-row arithmetic: exactly
    * how distributed ALS scales (each user solve touches only that
    * user's interactions; item factors are a broadcast, here closed-form
    * md5-derived so both engines regenerate them identically instead of
    * shipping state). The interaction matrix is customer×part purchase
    * quantities through orders⋈lineitem, with the small filtered orders
    * side broadcast into the lineitem scan.
    *
    * Float discipline: ΣvvT/Σrv are accumulation-order-dependent, and the
    * solve divides by det ≥ λ² (ridge keeps it away from 0) — round 3.
    */
  val q178AlsStep = GraftQuery(
    "q178_als_step",
    (s, dir) => {
      val lam = 0.1
      val o = Tables.orders(s, dir).filter(col("o_custkey") < 200)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, dir).filter(col("l_partkey") < 500)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val inter = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("item"))
        .agg(sum("l_quantity").as("r"))
      def vdim(d: Int) =
        (conv(substring(md5(concat(col("item"), lit(s"_v$d"))), 1, 8), 16, 10)
          .cast("long") % 1000).cast("double") / 1000.0
      val sums = inter
        .withColumn("v0", vdim(0)).withColumn("v1", vdim(1))
        .groupBy("u")
        .agg(count(lit(1)).as("n_items"),
          sum(col("v0") * col("v0")).as("a00"),
          sum(col("v0") * col("v1")).as("a01"),
          sum(col("v1") * col("v1")).as("a11"),
          sum(col("r") * col("v0")).as("b0"),
          sum(col("r") * col("v1")).as("b1"))
      sums
        .withColumn("det",
          (col("a00") + lam) * (col("a11") + lam) - col("a01") * col("a01"))
        .select(col("u"), col("n_items"),
          round(((col("a11") + lam) * col("b0") - col("a01") * col("b1")) / col("det"), 3).as("u0"),
          round(((col("a00") + lam) * col("b1") - col("a01") * col("b0")) / col("det"), 3).as("u1"))
        .orderBy("u")
    },
    Some("""WITH inter AS (
           |  SELECT o.o_custkey AS u, l.l_partkey AS item, sum(l.l_quantity) AS r
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  WHERE o.o_custkey < 200 AND l.l_partkey < 500
           |  GROUP BY 1, 2),
           |v AS (SELECT u, item, r,
           |    (CAST(concat('0x', substr(md5(item::VARCHAR || '_v0'), 1, 8)) AS BIGINT) % 1000) / 1000.0 AS v0,
           |    (CAST(concat('0x', substr(md5(item::VARCHAR || '_v1'), 1, 8)) AS BIGINT) % 1000) / 1000.0 AS v1
           |  FROM inter),
           |sums AS (SELECT u, count(*) AS n_items,
           |    sum(v0*v0) AS a00, sum(v0*v1) AS a01, sum(v1*v1) AS a11,
           |    sum(r*v0) AS b0, sum(r*v1) AS b1
           |  FROM v GROUP BY 1),
           |solved AS (SELECT u, n_items,
           |    (a00 + 0.1) * (a11 + 0.1) - a01 * a01 AS det,
           |    a00, a01, a11, b0, b1
           |  FROM sums)
           |SELECT u, n_items,
           |  round(((a11 + 0.1) * b0 - a01 * b1) / det, 3) AS u0,
           |  round(((a00 + 0.1) * b1 - a01 * b0) / det, 3) AS u1
           |FROM solved ORDER BY u""".stripMargin))

  // by q141 (see its scaladoc) — spec-covered, not oracle-registered
  /** Centroid-based (simplified / "medoid-free") silhouette audit of the
    * q137 clustering — the cluster-quality score a training-data curation
    * pipeline reads before trusting k-means cells for SemDeDup or IVF:
    * per point a = L2 distance to its OWN final centroid, b = distance to
    * the nearest OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; report
    * per-cluster size and mean silhouette. This is the O(n·k) silhouette
    * variant (Rousseeuw's exact form is O(n²) pairwise — a non-starter at
    * corpus scale); it needs only the same broadcast-literal centroid
    * array the assignment pass already carries, so the whole audit is one
    * extra map over the assigned frame plus a k-row aggregate: no new
    * shuffle of the corpus beyond the final groupBy(j) on k keys.
    *
    * Determinism: distances fold left-to-right over literal centroids
    * (the q137 float discipline); the one cross-row aggregate (avg) is
    * rounded to 3 digits on both sides.
    */
  val q190Silhouette = GraftQuery(
    "q190_silhouette",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"))
        .persist()
      val (cents, assigned) = lloyd(e, k = 6, rounds = 2)
      val centsLit = array(cents.map { case (idx, cv) =>
        struct(lit(idx).as("idx"), typedLit(cv).as("cv"))
      }: _*)
      val allD = transform(centsLit, c => struct(c("idx").as("idx"),
        aggregate(zip_with(col("v"), c("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, dd) => acc + dd).as("dd")))
      val out = assigned
        .withColumn("a", sqrt(col("d")))
        .withColumn("b", sqrt(array_min(transform(
          filter(allD, c => c("idx") =!= col("j")), c => c("dd")))))
        .withColumn("sil",
          (col("b") - col("a")) / greatest(col("a"), col("b")))
        .groupBy("j").agg(count(lit(1)).as("n_members"),
          round(avg("sil"), 3).as("avg_sil"))
        .select(col("j").as("cluster"), col("n_members"), col("avg_sil"))
        .orderBy("cluster")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      e.unpersist()
      ckpt
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
           |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv
           |  FROM e ORDER BY vec_id LIMIT 6),
           |a1 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c0),
           |g1 AS (SELECT vec_id, v, idx AS j FROM a1 WHERE rn = 1),
           |c1 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g1, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a2 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c1),
           |g2 AS (SELECT vec_id, v, idx AS j FROM a2 WHERE rn = 1),
           |c2 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g2, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a3 AS (SELECT vec_id, v, idx,
           |    list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))) AS d,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c2),
           |own AS (SELECT vec_id, idx AS j, d AS a2d FROM a3 WHERE rn = 1),
           |oth AS (SELECT vec_id, min(d) AS b2d FROM a3 WHERE rn > 1 GROUP BY 1),
           |sil AS (SELECT own.j,
           |    (sqrt(b2d) - sqrt(a2d)) / greatest(sqrt(a2d), sqrt(b2d)) AS s
           |  FROM own JOIN oth USING (vec_id))
           |SELECT j AS cluster, count(*) AS n_members, round(avg(s), 3) AS avg_sil
           |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Dominant principal component of the embedding corpus via distributed
    * covariance + power iteration — the PCA-whitening / decorrelation
    * primitive an embedding pipeline runs before quantization (and the
    * standard first look at "is this embedding space collapsed?"). The
    * corpus-sized work is exactly two aggregations: the mean vector, then
    * the d×d covariance accumulated per partition in ONE primitive
    * double[d²] array inside mapPartitions (tight index loops, no boxing,
    * no per-row aggregation-buffer ser/de — a typed 4096-dim Aggregator
    * measured 150 s at sf0.1 for exactly that reason; this form is
    * sub-second) — each partition emits one (count, partial-sum) row, so
    * what leaves the executors is ≤ #partitions rows of d² doubles: the
    * Gram-matrix trick. The 64×64 eigen problem is then driver math on
    * the merged 4096-double matrix (the lloyd k-row-collect discipline):
    * 6 power-iteration rounds from the uniform unit vector, L2-normalized
    * each round.
    *
    * Determinism: both engines accumulate the covariance in their own
    * order (~1e-15 relative noise), which propagates linearly through the
    * normalized iteration — absorbed by the 3-digit rounding; `+ 0.0`
    * canonicalizes any −0.0 loading (the driver's typed hash distinguishes
    * signed zeros).
    */
  val q192PcaPower = GraftQuery(
    "q192_pca_power",
    (s, dir) => {
      import s.implicits._
      val dim = DIM
      val vecAvgD = udaf(new graft.functions.VectorAvg(dim))
      // localCheckpoint, not persist: immune to the verify harness's
      // periodic clearCache (the q245 race class — an emptied lineage
      // during the partial collect would zero the covariance silently)
      val e = Tables.embeddings(s, dir)
        .select(col("embedding").cast("array<double>").as("v"))
        .localCheckpoint()
      val muArr = e.agg(vecAvgD(col("v"))).head().getSeq[Double](0).toArray
      val partials = e.as[Seq[Double]].mapPartitions { it =>
        val acc = new Array[Double](dim * dim)
        val c = new Array[Double](dim)
        var n = 0L
        it.foreach { v =>
          var i = 0
          while (i < dim) { c(i) = v(i) - muArr(i); i += 1 }
          var a = 0
          while (a < dim) {
            val ca = c(a); val row = a * dim
            var b = 0
            while (b < dim) { acc(row + b) += ca * c(b); b += 1 }
            a += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator((n, acc.toSeq))
      }.collect() // bounded: one (count, d^2 partial) row per partition
      val nTotal = partials.map(_._1).sum.toDouble
      require(nTotal > 0, "covariance partials empty")
      val cov = new Array[Double](dim * dim)
      partials.foreach { case (_, p) =>
        var i = 0
        while (i < dim * dim) { cov(i) += p(i); i += 1 }
      }
      var ci = 0
      while (ci < dim * dim) { cov(ci) /= nTotal; ci += 1 }
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lambda = 0.0
      for (_ <- 1 to 6) {
        val w = Array.tabulate(dim) { i =>
          var acc = 0.0; var j = 0
          while (j < dim) { acc += cov(i * dim + j) * v(j); j += 1 }
          acc
        }
        lambda = math.sqrt(w.map(x => x * x).sum)
        v = w.map(_ / lambda)
      }
      def r3(x: Double): Double =
        BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      import s.implicits._
      v.toSeq.zipWithIndex
        .map { case (x, i) => (i, r3(x), r3(lambda)) }
        .toDF("dim", "loading", "eigval")
        .orderBy("dim")
    },
    Some {
      val rounds = (1 to 6).map { r =>
        s"""w$r AS (SELECT c.i, sum(c.c * v.x) AS w
           |  FROM c JOIN v${r - 1} v ON c.j = v.i GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i, w / sqrt((SELECT sum(w*w) FROM w$r)) AS x
           |  FROM w$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT embedding::DOUBLE[] v FROM embeddings),
         |mu AS MATERIALIZED (SELECT d.d AS i, avg(v[d.d + 1]) AS m
         |  FROM e, range(0, 64) d(d) GROUP BY 1),
         |c AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
         |    avg((v[a.i + 1] - a.m) * (v[b.i + 1] - b.m)) AS c
         |  FROM e, mu a, mu b GROUP BY 1, 2),
         |v0 AS (SELECT i, 1.0 / sqrt(64) AS x FROM range(0, 64) t(i)),
         |$rounds
         |SELECT CAST(v6.i AS INT) AS dim, round(v6.x, 3) + 0.0 AS loading,
         |  round((SELECT sqrt(sum(w*w)) FROM w6), 3) + 0.0 AS eigval
         |FROM v6 ORDER BY dim""".stripMargin
    })

  /** Nearest-class-mean classification of the embedding corpus against its
    * own labels, reported as a confusion matrix — the cheap linear probe
    * ("are these embeddings linearly separable by label?") an embedding
    * pipeline runs before spending on a trained head; also the assignment
    * primitive behind prototype-based label cleaning (mislabeled rows land
    * off-diagonal). Class centroids are one grouped VectorAvg (L-row
    * collect, L = label count — the lloyd discipline); assignment is a
    * map-only scan against the broadcast-literal centroid array with
    * argmin ties broken toward the smaller label; the confusion matrix is
    * a ≤L² partial agg. No corpus-sized shuffle anywhere.
    */
  val q195NcmConfusion = GraftQuery(
    "q195_ncm_confusion",
    (s, dir) => {
      val vecAvgD = udaf(new graft.functions.VectorAvg(DIM))
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .persist()
      val cents = e.groupBy("label").agg(vecAvgD(col("v")).as("cv")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val centsLit = array(cents.map { case (lbl, cv) =>
        struct(lit(lbl).as("plabel"), typedLit(cv).as("cv"))
      }: _*)
      val best = element_at(sort_array(transform(centsLit,
        c => struct(
          aggregate(zip_with(col("v"), c("cv"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, d) => acc + d).as("d"),
          c("plabel").as("plabel")))), 1)
      val out = e.withColumn("pred", best("plabel"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      e.unpersist()
      ckpt
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
           |c AS (SELECT label AS plabel, d.d AS dim, avg(v[d.d + 1]) AS c
           |  FROM e, range(0, 64) d(d) GROUP BY 1, 2),
           |cl AS (SELECT plabel, list(c ORDER BY dim) AS cv FROM c GROUP BY 1),
           |a AS (SELECT vec_id, label, plabel, row_number() OVER (
           |    PARTITION BY vec_id ORDER BY
           |      list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))),
           |      plabel) AS rn
           |  FROM e, cl)
           |SELECT label, plabel AS pred, CAST(count(*) AS BIGINT) AS n
           |FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Recall@5 audit of the IVF index (q47's probe-2 search) against exact
    * brute-force ground truth (q29's scan) — the evaluation loop every ANN
    * deployment runs before trusting an index: approximate search is only
    * as good as its measured recall, and the recall/probe-count curve is
    * how nprobe gets sized. Ground truth restricts to the query batch
    * (10 queries × full scan — the bounded-ground-truth form, same
    * discipline as q28/q151), the IVF side reuses q47's literal-centroid
    * cell assignment, and recall is the exact overlap of the two top-5
    * cid sets — integer counts, one division.
    */
  private[graft] def q203Df(s: SparkSession, dir: String,
      forPlan: Boolean = false): DataFrame = {
      GraftFunctions.register(s)
      val e0 = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", norm(col("v")))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))
      val e = if (forPlan) e0 else e0.persist()
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val wq = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
      val truth = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
        .withColumn("rnk", row_number().over(wq)).filter(col("rnk") <= 5)
        .select("qid", "cid")
      val withCells = e.withColumn("cells", rankedCentroidCells(e))
      val assigned = withCells.select(
        col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"),
        element_at(col("cells"), 1).getField("cell").as("cell"))
      val probes = withCells.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          explode(slice(col("cells"), 1, 2)).as("pc"))
        .select(col("qid"), col("qv"), col("qn"), col("pc.cell").as("cell"))
      val approx = assigned.join(broadcast(probes),
          assigned("cell") === probes("cell") && col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
        .withColumn("rnk", row_number().over(wq)).filter(col("rnk") <= 5)
        .select("qid", "cid")
      val hits = truth.join(approx, Seq("qid", "cid"))
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      val out = truth.groupBy("qid").agg(count(lit(1)).as("n_truth"))
        .join(hits, Seq("qid"), "left")
        .na.fill(0, Seq("n_hit"))
        .select(col("qid"), col("n_truth"), col("n_hit"),
          round(col("n_hit") / lit(5.0), 6).as("recall"))
        .orderBy("qid")
      if (forPlan) out
      else {
        // localCheckpoint, not count()+recompute: the verify/bench action
        // reads the materialized rows instead of re-executing the released plan
        val ckpt = out.localCheckpoint()
        e.unpersist()
        ckpt
      }
  }

  val q203IvfRecall = GraftQuery(
    "q203_ivf_recall",
    (s, dir) => q203Df(s, dir),
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |q AS (SELECT vec_id qid, v qv, nrm qn FROM e WHERE vec_id < 10),
           |tp AS (SELECT qid, e.vec_id cid,
           |  list_sum(list_transform(range(1, 65), i -> qv[i]*e.v[i])) / (qn*e.nrm) sim
           |  FROM q, e WHERE e.vec_id <> qid),
           |tr AS (SELECT qid, cid FROM (SELECT qid, cid,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rnk
           |  FROM tp) WHERE rnk <= 5),
           |cd AS (SELECT label AS cell, d.d AS dim, avg(v[d.d + 1]) AS c
           |  FROM e, range(0, 64) d(d) GROUP BY 1, 2),
           |cents AS (SELECT cell, list(c ORDER BY dim) cvec,
           |  sqrt(list_sum(list_transform(list(c ORDER BY dim), x -> x*x))) cnrm
           |  FROM cd GROUP BY cell),
           |ranked AS (SELECT e.vec_id, e.v, e.nrm, cents.cell,
           |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |    list_sum(list_transform(range(1, 65), i -> e.v[i]*cents.cvec[i]))
           |      / (e.nrm*cents.cnrm) DESC, cents.cell) crn
           |  FROM e, cents),
           |assigned AS (SELECT vec_id cid, v cv, nrm cn, cell FROM ranked WHERE crn = 1),
           |probes AS (SELECT vec_id qid, v qv, nrm qn, cell FROM ranked
           |  WHERE vec_id < 10 AND crn <= 2),
           |ip AS (SELECT qid, cid,
           |  list_sum(list_transform(range(1, 65), i -> qv[i]*cv[i])) / (qn*cn) sim
           |  FROM probes JOIN assigned USING (cell) WHERE cid <> qid),
           |ap AS (SELECT qid, cid FROM (SELECT qid, cid,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rnk
           |  FROM ip) WHERE rnk <= 5),
           |hits AS (SELECT tr.qid, CAST(count(*) AS BIGINT) h
           |  FROM tr JOIN ap USING (qid, cid) GROUP BY 1)
           |SELECT t.qid, CAST(count(*) AS BIGINT) AS n_truth,
           |  CAST(COALESCE(any_value(h), 0) AS BIGINT) AS n_hit,
           |  round(COALESCE(any_value(h), 0) / 5.0, 6) AS recall
           |FROM tr t LEFT JOIN hits ON hits.qid = t.qid
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Count-based word embedding via PPMI + dominant eigenvector (Levy &
    * Goldberg 2014's "neural word embedding as implicit matrix
    * factorization" — SGNS ≈ factorizing the shifted PMI matrix, so the
    * PPMI spectrum IS the count-based embedding): vocabulary = top-32
    * terms by frequency (integer-ranked, term ties), co-occurrence within
    * a ±2-token window restricted to the vocabulary, PPMI = max(0, PMI)
    * over matrix-marginal probabilities, and the principal direction from
    * 6 power-iteration rounds — each term's loading is its 1-d embedding
    * coordinate. Corpus-sized work: one positional token explode + one
    * doc-keyed self-join with bounded window fan-out (≤4 partners/token);
    * the 32×32 matrix collects bounded to the driver (the q192
    * discipline), and the oracle replays the identical matvec chain.
    */
  val q245PpmiEmbedding = GraftQuery(
    "q245_ppmi_embedding",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // localCheckpoint (not persist): the verify harness clearCache()s
      // periodically, and a cleared lineage racing the collect below once
      // produced an empty cell set (NaN downstream); checkpoint blocks are
      // immune to catalog cache clearing
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").as("p"), col("col").as("w"))
        .localCheckpoint()
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
        .withColumn("idx", row_number().over(
          Window.orderBy(desc("cnt"), col("w"))) - 1)
        .filter(col("idx") < 32)
        .select(col("w"), col("idx")).localCheckpoint()
      val a = tok.join(broadcast(vocab), "w")
        .select(col("doc_id"), col("p"), col("idx").as("i"))
      // partners materialize at their ±{1,2} SHIFTED positions, so the
      // pair generation is an equi-join on (doc, position) with fan-out
      // exactly 4 — never a per-doc cartesian with a post-filter
      val b = tok.join(broadcast(vocab), "w")
        .withColumn("d", explode(array(lit(-2), lit(-1), lit(1), lit(2))))
        .select(col("doc_id"), (col("p") + col("d")).as("p"),
          col("idx").as("j"))
      val cells = a.join(b, Seq("doc_id", "p"))
        .groupBy("i", "j").agg(count(lit(1)).as("c"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      val vocabArr = vocab.collect().map(r => (r.getInt(1), r.getString(0)))
        .sortBy(_._1).map(_._2)
      val dim = vocabArr.length
      val total = cells.values.sum.toDouble
      require(dim > 0 && total > 0,
        s"PPMI inputs degenerate: dim=$dim total=$total")
      val marg = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cells.getOrElse((i, j), 0L)).sum.toDouble)
      val ppmi = Array.tabulate(dim, dim) { (i, j) =>
        val c = cells.getOrElse((i, j), 0L).toDouble
        if (c == 0 || marg(i) == 0 || marg(j) == 0) 0.0
        else math.max(0.0, math.log(c * total / (marg(i) * marg(j))))
      }
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      for (_ <- 1 to 6) {
        val nv = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(0.0)((acc, j) => acc + ppmi(i)(j) * v(j)))
        val nrm = math.sqrt(nv.map(x => x * x).sum)
        v = nv.map(_ / nrm)
      }
      def r3(x: Double): Double =
        BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      import s.implicits._
      vocabArr.zipWithIndex.map { case (t, i) => (t, r3(v(i))) }
        .toSeq.sortBy(_._1).toDF("term", "loading")
    },
    Some {
      val rounds = (1 to 6).map { r =>
        s"""w$r AS (SELECT m.i, sum(m.v * x${r - 1}.x) AS wv
           |  FROM m JOIN x${r - 1} ON m.j = x${r - 1}.i GROUP BY 1),
           |x$r AS MATERIALIZED (SELECT i, wv / sqrt((SELECT sum(wv*wv) FROM w$r)) AS x
           |  FROM w$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
         |tok AS (SELECT doc_id, t.p AS p, t.w AS w FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
         |    i -> {'p': i, 'w': ws[i]})) t FROM ws)),
         |vocab AS (SELECT w, row_number() OVER (ORDER BY cnt DESC, w) - 1 AS idx
         |  FROM (SELECT w, count(*) cnt FROM tok GROUP BY 1)
         |  QUALIFY idx < 32),
         |cells AS (SELECT va.idx i, vb.idx j, CAST(count(*) AS BIGINT) c
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id
         |    AND a.p <> b.p AND abs(a.p - b.p) <= 2
         |  JOIN vocab va ON va.w = a.w JOIN vocab vb ON vb.w = b.w
         |  GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) t FROM cells),
         |mg AS (SELECT i, CAST(sum(c) AS DOUBLE) m FROM cells GROUP BY 1),
         |m AS MATERIALIZED (SELECT cells.i, cells.j,
         |    greatest(0.0, ln(c * tot.t / (mi.m * mj.m))) AS v
         |  FROM cells JOIN mg mi ON mi.i = cells.i
         |  JOIN mg mj ON mj.i = cells.j, tot),
         |x0 AS (SELECT idx AS i, 1.0 / sqrt(32) AS x FROM vocab),
         |$rounds
         |SELECT vocab.w AS term, round(x6.x, 3) + 0.0 AS loading
         |FROM x6 JOIN vocab ON vocab.idx = x6.i
         |ORDER BY term""".stripMargin
    })

  /** Embedding-norm quality control per label — the first screen an
    * embedding batch gets before indexing (truncated inputs and encoder
    * failures surface as norm anomalies; a collapsed model surfaces as
    * near-zero variance): per label, exact mean/median/P95 of the L2
    * norm plus a percentile-relative outlier count (norm > 1.5 × that
    * label's P95 — percentile-based so the rule is exact on both
    * engines, no stddev accumulation in the decision path). Norms are
    * per-row left-fold arithmetic; the median/P95 are the q54-proven
    * exact pairing, rounded to 6 before the comparison threshold.
    */
  val q253NormQc = GraftQuery(
    "q253_norm_qc",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("nrm", norm(col("embedding").cast("array<double>")))
        .select(col("vec_id"), col("label"), col("nrm"))
      val stats = e.groupBy(col("label").as("lb"))
        .agg(round(expr("percentile(nrm, 0.95)"), 6).as("p95"))
      e.join(broadcast(stats), col("label") === col("lb"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("nrm"), 3).as("mean_norm"),
          round(expr("percentile(nrm, 0.5)"), 6).as("median_norm"),
          first("p95").as("p95_norm"),
          sum((col("nrm") > lit(1.5) * col("p95")).cast("long")).as("n_outliers"))
        .orderBy("label")
    },
    Some("""WITH e AS (SELECT vec_id, label,
           |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm
           |  FROM embeddings),
           |st AS (SELECT label, round(quantile_cont(nrm, 0.95), 6) p95
           |  FROM e GROUP BY 1)
           |SELECT e.label, CAST(count(*) AS BIGINT) n,
           |  round(avg(nrm), 3) AS mean_norm,
           |  round(quantile_cont(nrm, 0.5), 6) AS median_norm,
           |  any_value(st.p95) AS p95_norm,
           |  CAST(sum(CAST(nrm > 1.5 * st.p95 AS INT)) AS BIGINT) AS n_outliers
           |FROM e JOIN st USING (label)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Two-stage IVFADC search: ADC shortlist → EXACT re-rank — the
    * production retrieval shape (FAISS's refine step): the compressed
    * index is only asked to produce a CANDIDATE set (top-10 by
    * asymmetric distance through q157's probe pipeline), and the final
    * order comes from exact L2 on the original vectors of just those
    * candidates — 10 full-vector reads per query instead of a scan,
    * which is the entire economics of quantized search. Rerank joins
    * are keyed id lookups (candidates ⋈ vectors); output is the exact
    * top-5 with true distances.
    */
  val q255IvfAdcRerank = GraftQuery(
    "q255_ivfadc_rerank",
    (s, dir) => ivfAdcLock.synchronized {
      GraftFunctions.register(s)
      val cand = ivfAdcSearch(s, dir, topk = 10)
        .select(col("qid"), col("cid"), col("cell"))
        .localCheckpoint() // 30 rows; frees the shared search lineage
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"))
      val rr = cand
        .join(e.select(col("vec_id").as("q2"), col("v").as("qv")),
          col("qid") === col("q2"))
        .join(e.select(col("vec_id").as("c2"), col("v").as("cv")),
          col("cid") === col("c2"))
        .withColumn("exact2", aggregate(
          zip_with(col("qv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d))
      val w = Window.partitionBy("qid").orderBy(asc("exact2"), col("cid"))
      rr.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("cid"), col("cell"),
          round(sqrt(col("exact2")), 5).as("exact_dist"))
        .orderBy("qid", "rnk")
    },
    Some {
      val base = q157OracleSql.get
      val tail = "SELECT qid, rnk, cid, cell, round(adc, 5) AS adc FROM r WHERE rnk <= 5\nORDER BY qid, rnk"
      require(base.endsWith(tail), "q157 oracle tail changed; update q255 surgery")
      base.dropRight(tail.length) + ", " +
        """cand AS (SELECT qid, cid, cell FROM r WHERE rnk <= 10),
          |rr AS (SELECT cand.qid, cand.cid, cand.cell,
          |    list_sum(list_transform(range(1, 65),
          |      i -> (eq.v[i]-ec.v[i])*(eq.v[i]-ec.v[i]))) AS exact2
          |  FROM cand JOIN e eq ON eq.vec_id = cand.qid
          |  JOIN e ec ON ec.vec_id = cand.cid),
          |rk AS (SELECT qid, cid, cell, exact2, row_number() OVER (
          |    PARTITION BY qid ORDER BY exact2, cid) rnk FROM rr)
          |SELECT qid, rnk, cid, cell, round(sqrt(exact2), 5) AS exact_dist
          |FROM rk WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    })

  /** Cluster purity against ground-truth labels — the EXTERNAL validity
    * score next to q190's internal silhouette: each q137 cluster takes
    * its majority label (lexicographic ties), contributes its majority
    * count to Σmax/n purity, and reports its own local purity — the
    * one-table answer to "did k-means rediscover the labels". Assignment
    * is q137's exact pipeline; everything after is integer counts plus
    * one mode window over (cluster, label) cells.
    */
  val q260ClusterPurity = GraftQuery(
    "q260_cluster_purity",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("label"), col("v"))
        .persist()
      val (_, assigned) = lloyd(e.select(col("vec_id"), col("v")), 6, 2)
      val mem = assigned.select(col("vec_id"), col("j"))
        .join(e.select(col("vec_id"), col("label")), "vec_id")
      val cells = mem.groupBy("j", "label").agg(count(lit(1)).as("c"))
      val top = cells.withColumn("rn", row_number().over(
          Window.partitionBy("j").orderBy(desc("c"), col("label"))))
        .filter(col("rn") === 1)
        .select(col("j"), col("label").as("top_label"), col("c").as("top_n"))
      val sizes = mem.groupBy("j").agg(count(lit(1)).as("n_members"))
      val out = sizes.join(top, "j")
        .select(col("j").as("cluster"), col("n_members"), col("top_label"),
          col("top_n"),
          round(col("top_n") / col("n_members").cast("double"), 6)
            .as("local_purity"))
        .orderBy("cluster")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      e.unpersist()
      ckpt
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
           |c0 AS (SELECT idx, cv FROM (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv
           |  FROM e ORDER BY vec_id LIMIT 6)),
           |a1 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c0),
           |g1 AS (SELECT vec_id, v, idx AS j FROM a1 WHERE rn = 1),
           |c1 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g1, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a2 AS (SELECT vec_id, v, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c1),
           |g2 AS (SELECT vec_id, v, idx AS j FROM a2 WHERE rn = 1),
           |c2 AS (SELECT j AS idx, list(c ORDER BY dim) AS cv FROM (
           |  SELECT j, d.d AS dim, avg(v[d.d + 1]) AS c FROM g2, range(0, 64) d(d)
           |  GROUP BY 1, 2) GROUP BY 1),
           |a3 AS (SELECT vec_id, idx, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY list_sum(list_transform(range(1, 65), i -> (v[i]-cv[i])*(v[i]-cv[i]))), idx) rn
           |  FROM e, c2),
           |mem AS (SELECT a3.vec_id, a3.idx AS j, e.label
           |  FROM a3 JOIN e USING (vec_id) WHERE rn = 1),
           |cells AS (SELECT j, label, CAST(count(*) AS BIGINT) c
           |  FROM mem GROUP BY 1, 2),
           |top AS (SELECT j, label AS top_label, c AS top_n FROM (
           |  SELECT j, label, c, row_number() OVER (PARTITION BY j
           |    ORDER BY c DESC, label) rn FROM cells) WHERE rn = 1),
           |sz AS (SELECT j, CAST(count(*) AS BIGINT) n_members FROM mem GROUP BY 1)
           |SELECT sz.j AS cluster, sz.n_members, top.top_label, top.top_n,
           |  round(top.top_n / sz.n_members::DOUBLE, 6) AS local_purity
           |FROM sz JOIN top USING (j) ORDER BY cluster""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q29AnnTopk, q30Centroids, q31AnnLsh, q47AnnIvf,
    q70Int8Quantize, q137Kmeans, q141SemanticDedupKmeans, q147PqAdc,
    q155JlProjection, q157IvfAdc, q161IvfAdcResidual, q178AlsStep,
    q190Silhouette, q192PcaPower, q195NcmConfusion, q203IvfRecall,
    q245PpmiEmbedding, q253NormQc, q255IvfAdcRerank, q260ClusterPurity)
}
