package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Iterative graph analytics on DataFrames: PageRank over the bipartite
  * customer↔supplier trade graph (an edge per distinct (custkey, suppkey)
  * pair traded through orders⋈lineitem, walked in both directions).
  *
  * Each iteration is one equi-join (ranks ⋈ edges) + one partial-agg
  * groupBy — the join-agg loop shape that scales to billion-edge graphs
  * (same dataflow GraphX's Pregel lowers to), with the edge list persisted
  * across iterations. Determinism: fixed iteration count, damping 0.85,
  * uniform init; the DuckDB oracle unrolls the same 3 iterations as chained
  * CTEs, and the output buckets ranks (sum per node-kind × degree decile,
  * rounded) so float accumulation order can't flip a top-k boundary.
  */
object Graph {

  /** Node ids: customers as +custkey, suppliers as -suppkey (disjoint).
    * private[ops]: RoundBodies rebuilds one loop round for plan audit. */
  private[ops] def edges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("cust"), (-col("l_suppkey")).as("supp"))
      .distinct()
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  val q98PageRank = GraftQuery(
    "q98_pagerank",
    (s, dir) => {
      val e = edges(s, dir).persist()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
      val withDeg = e.join(deg, "src").persist()
      // each round's new rank is 0.15 + 0.85·inflow — it does NOT read the
      // previous rank except through the contributions, so the "attach
      // zero-inflow nodes" left join of the original shape is one shuffle
      // and one stage barrier per round that a zero-contribution UNION
      // into the SAME partial-agg groupBy replaces for free (guide §2.4;
      // x + 0.0 is exact in IEEE arithmetic, so the inflow values are
      // unchanged). The per-round frame is node-cardinality (tiny);
      // persist each and release after the output materializes
      var ranks = deg.select(col("src").as("node"), lit(1.0).as("rank"))
      val rounds = scala.collection.mutable.Buffer[DataFrame]()
      for (_ <- 1 to 3) {
        ranks = withDeg.join(ranks, withDeg("src") === ranks("node"))
          .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
          .unionByName(deg.select(col("src").as("node"), lit(0.0).as("c")))
          .groupBy("node").agg(sum("c").as("inflow"))
          .select(col("node"),
            (lit(0.15) + lit(0.85) * col("inflow")).as("rank"))
          .persist()
        rounds += ranks
      }
      val out = ranks.join(deg, ranks("node") === deg("src"))
        .select(
          when(col("node") > 0, "customer").otherwise("supplier").as("kind"),
          least(lit(9L), expr("outdeg div 10")).as("deg_bucket"),
          col("rank"))
        .groupBy("kind", "deg_bucket")
        .agg(count(lit(1)).as("n"), round(sum("rank"), 4).as("rank_mass"))
        .orderBy("kind", "deg_bucket")
        // materialize the ≤20-row output BEFORE releasing the caches —
        // unpersisting a lazy plan would rebuild the edge list ~7× when
        // the caller finally executes it (the q184/q215 discipline)
        .localCheckpoint()
      e.unpersist()
      deg.unpersist()
      withDeg.unpersist()
      rounds.foreach(_.unpersist())
      out
    },
    Some("""WITH pairs AS (
           |  SELECT DISTINCT o_custkey AS cust, -l_suppkey AS supp
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS (SELECT cust AS src, supp AS dst FROM pairs
           |      UNION ALL SELECT supp, cust FROM pairs),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
           |c1 AS (SELECT e.dst, sum(r0.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
           |r1 AS (SELECT r0.node, 0.15 + 0.85 * coalesce(c1.inflow, 0) AS rank
           |  FROM r0 LEFT JOIN c1 ON c1.dst = r0.node),
           |c2 AS (SELECT e.dst, sum(r1.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
           |r2 AS (SELECT r1.node, 0.15 + 0.85 * coalesce(c2.inflow, 0) AS rank
           |  FROM r1 LEFT JOIN c2 ON c2.dst = r1.node),
           |c3 AS (SELECT e.dst, sum(r2.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
           |r3 AS (SELECT r2.node, 0.15 + 0.85 * coalesce(c3.inflow, 0) AS rank
           |  FROM r2 LEFT JOIN c3 ON c3.dst = r2.node)
           |SELECT CASE WHEN node > 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  least(9, outdeg // 10) AS deg_bucket,
           |  count(*) AS n, round(sum(rank), 4) AS rank_mass
           |FROM r3 JOIN deg ON deg.src = r3.node
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Distributed triangle counting with clustering coefficients over the
    * supplier co-purchase graph (an edge when two suppliers ship lines of
    * the same order). The algorithm is the degree-oriented wedge-closure
    * (Schank-Wagner / the MapReduce "node-iterator++"): orient every edge
    * from its lower-(degree, id) endpoint to the higher, enumerate wedges
    * only from each node's OUT-neighbors, and close them against the
    * oriented edge list.
    *
    * Scale: the orientation is the whole point — out-degrees are bounded by
    * O(√m) regardless of how skewed the raw degree distribution is, so the
    * wedge self-join (the quadratic step) is O(m^1.5) total and no hub node
    * explodes a partition. Both joins are keyed equi-joins (shuffle by node
    * / by edge endpoints); counts are exact integers, and the one float
    * (clustering coefficient = 2T / deg·(deg−1)) is per-row arithmetic.
    *
    * Round-12 three-point audit note (SCALING_r12_final.json): on the
    * id-offset derived corpora the co-purchase graph does NOT densify —
    * m/n is measured CONSTANT (453.6 at factor 1/10/30; copies are
    * disjoint subgraphs) — so wedge work per copy is constant and total
    * work is LINEAR on this family. The measured factor-3→10 exponent is
    * 0.449; the factor-10→30 point (1.23) runs 13.6M edges with ~3.5 KB
    * adjacency arrays per node through a fixed-heap 32-thread local
    * harness, i.e. a memory/GC constant, not the algorithm (the m^1.5
    * bound would require densification the measurement rules out).
    */
  /** Distinct co-purchase edges {u < v}: two keys sharing an order. The
    * (order, key) pairs are deduped BEFORE the self-join — raw lineitem
    * fans out per line item, the distinct bounds the per-order basket —
    * then pairs come from a join keyed on the order (fan-out = basket²,
    * bounded). Shared by q148 (suppliers), q215 (parts), q264 (suppliers).
    */
  private[ops] def coPurchaseEdges(li: DataFrame, orderCol: String,
      keyCol: String): DataFrame = {
    // one partial-agg groupBy gathers each order's distinct basket
    // (collect_set dedups the (order, key) pairs map-side), and the u < v
    // pairs come from a codegen HOF over the sorted in-row array — the
    // earlier distinct → self-join-on-order → distinct shape paid FOUR
    // exchanges (distinct by (o,k), re-shuffle both join sides by o,
    // distinct by (u,v)); this pays TWO (groupBy o, distinct (u,v)) for the
    // identical edge set (guide §2.4). Baskets are order-bounded (≤ 7
    // lineitems in TPC-H at any SF), so the in-row pair fan-out is a
    // constant, never a skew risk.
    li.groupBy(col(orderCol).as("o"))
      .agg(sort_array(collect_set(col(keyCol))).as("ks"))
      .select(explode(expr(
        """flatten(transform(ks, (x, i) ->
          |  transform(slice(ks, i + 2, size(ks) - i - 1),
          |    y -> named_struct('u', x, 'v', y))))""".stripMargin)).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .distinct()
  }

  val q148TriangleCount = GraftQuery(
    "q148_triangle_count",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val und = coPurchaseEdges(Tables.lineitem(s, dir),
        "l_orderkey", "l_suppkey").persist()
      val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      // orient {a, b} from lower (deg, id) to higher — a total order, so
      // each triangle has exactly one wedge-closing representation
      val dn = deg.select(col("n"), col("deg"))
      val oriented = und
        .join(dn.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(dn.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("dst"))
        .persist()
      // Edge-iterator closure (compact-forward): per-node OUT-adjacency
      // arrays — node-cardinality rows, each array Schank-bounded at
      // O(√m) — decorate each oriented edge (x, y), and the triangle
      // apexes through that edge are exactly z ∈ N⁺(x) ∩ N⁺(y). The
      // earlier wedge-enumeration shape materialized the O(m^1.5) wedge
      // stream and SORT-MERGE-joined it against the edge list — on the
      // near-complete sf0.1 co-supply graph that shuffled ~10⁸ rows.
      // Here nothing bigger than the edge list is ever shuffled: the
      // per-triangle rows exist only inside explode → partial agg, which
      // collapses map-side to ≤|V| groups per partition. Each triangle
      // {x→y, x→z, y→z} is found exactly once (on its (x, y) leg: z is
      // an out-neighbor of both ends), and every corner is credited in
      // the same pass. persisted: adj is joined onto both endpoints of
      // every oriented edge (r13 optimization round)
      val adj = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbr"))
        .persist()
      val dec = oriented
        .join(adj.select(col("src"), col("nbr").as("nx")), "src")
        .join(adj.select(col("src").as("dst"), col("nbr").as("ny")), "dst")
      // FUSED credit pass (r14): one codegen sorted-merge per decorated
      // edge emits all three corners of each triangle as BARE BIGINTS
      // straight into a partial agg (struct-wrapped streams allocated one
      // boxed object per triangle and aged-heap GC tripled the query; the
      // earlier TWO-leg shape — intersect-COUNT endpoint credits unioned
      // with an intersect-ARRAY apex explode — ran the merge twice,
      // re-derived the decoration joins under each leg, and paid an outer
      // join to combine the legs). A node with no triangles is absent =
      // zero, exactly what the old `n_tri > 0` filter produced.
      val perNode = dec
        .select(explode(graft.functions.GraftFunctions.triangleCredits(
          col("src"), col("dst"), col("nx"), col("ny"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("n_tri"))
      val out = deg.join(perNode, Seq("n"), "left")
        .select(col("n").as("suppkey"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          when(col("deg") >= 2,
            round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
              (col("deg") * (col("deg") - 1)), 6)).otherwise(lit(0.0))
            .as("clustering"))
        .orderBy("suppkey")
        // one row per supplier — materialize, then release the three
        // cached frames instead of leaving them pinned until the
        // harness's periodic clearCache
        .localCheckpoint()
      und.unpersist(); oriented.unpersist(); adj.unpersist()
      out
    },
    Some("""WITH und AS (
           |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
           |deg AS (SELECT n, count(*) AS deg FROM (
           |  SELECT u AS n FROM und UNION ALL SELECT v FROM und) GROUP BY 1),
           |oriented AS (
           |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
           |           THEN u ELSE v END AS src,
           |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
           |           THEN v ELSE u END AS dst
           |  FROM und JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
           |wedges AS (
           |  SELECT p.src AS x, p.dst AS y, q.dst AS z
           |  FROM oriented p JOIN oriented q ON p.src = q.src
           |  JOIN deg dy ON dy.n = p.dst JOIN deg dz ON dz.n = q.dst
           |  WHERE dy.deg < dz.deg OR (dy.deg = dz.deg AND p.dst < q.dst)),
           |tris AS (
           |  SELECT x, y, z FROM wedges
           |  JOIN oriented ON y = oriented.src AND z = oriented.dst),
           |pernode AS (SELECT n, count(*) AS n_tri FROM (
           |  SELECT x AS n FROM tris UNION ALL SELECT y FROM tris
           |  UNION ALL SELECT z FROM tris) GROUP BY 1)
           |SELECT deg.n AS suppkey, deg.deg,
           |  coalesce(pernode.n_tri, 0) AS n_tri,
           |  CASE WHEN deg.deg >= 2 THEN
           |    round(2.0 * coalesce(pernode.n_tri, 0) / (deg.deg * (deg.deg - 1)), 6)
           |  ELSE 0.0 END AS clustering
           |FROM deg LEFT JOIN pernode ON pernode.n = deg.n
           |ORDER BY suppkey""".stripMargin))

  /** Undirected tf-idf cosine ≥ 0.75 similarity edges over documents with
    * doc_id < 150 — q152's pair pipeline with identical arithmetic, so the
    * edge set matches the DuckDB oracle the same way q152's output does.
    * Returned persisted and materialized; intermediates already released.
    */
  def semanticEdges(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .persist()
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct("doc_id")).first().getLong(0).toDouble
    val w = tf.join(df, "t")
      .filter(col("df") < n)
      .select(col("doc_id"), col("t"),
        (col("tf") * log(lit(n) / col("df"))).as("w"))
      .persist()
    val nrm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val pairs = w.select(col("doc_id").as("i"), col("t"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("j"), col("t"), col("w").as("wb")),
        Seq("t"))
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(nrm.select(col("doc_id").as("i"), col("nrm").as("na")), "i")
      .join(nrm.select(col("doc_id").as("j"), col("nrm").as("nb")), "j")
      .filter(col("dot") / (col("na") * col("nb")) >= 0.75)
      .select(col("i"), col("j"))
    val edges = pairs.select(col("i").as("u"), col("j").as("v"))
      .unionAll(pairs.select(col("j").as("u"), col("i").as("v")))
    // localCheckpoint, not persist+count: downstream rounds read the
    // materialized edge blocks instead of re-executing the released plan
    val ckpt = edges.localCheckpoint()
    tf.unpersist(); w.unpersist()
    ckpt
  }

  /** Iterative k-core peel to fixpoint over an undirected edge list (both
    * directions present). Each round: partial-agg degree count, keep nodes
    * with degree ≥ k, two left-semi joins to drop edges touching peeled
    * nodes; only a scalar count() reaches the driver per round. Returns
    * (surviving edges, rounds to fixpoint — the round that first observed
    * no change).
    *
    * Each round is CHECKPOINTED, not just persisted: round r reads round
    * r−1 twice (degree count + edge join), so if cached blocks are ever
    * evicted (memory pressure, an unrelated clearCache), persist-only
    * lineage recomputes the predecessor twice per level — exponential in
    * peel depth, the same doubling that forces MATERIALIZED in the DuckDB
    * oracle. checkpoint() truncates lineage to the materialized files
    * (HDFS on a real cluster), the same interval-checkpoint discipline
    * GraphX's Pregel and ML's ALS apply to their iteration loops.
    */
  def kcorePeel(edges0: DataFrame, k: Int, maxRounds: Int): (DataFrame, Int) = {
    val sc = edges0.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(s"${sys.props("java.io.tmpdir")}/graft_checkpoint")
    var edges = edges0
    var nEdges = edges.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val keep = edges.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("u")
      val pruned = edges
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .checkpoint() // eager: materializes and truncates lineage
      val m = pruned.count()
      edges.unpersist()
      converged = m == nEdges
      nEdges = m
      edges = pruned
      rounds += 1
    }
    // The rounds live as checkpoint FILES under the fixed dir and nothing
    // deletes them (cleanCheckpoints defaults to false) — each run would
    // leak one edge-set directory per peel round for the life of the
    // container. Re-materialize the survivors into executor storage, then
    // remove the run's files: kcorePeel is this codebase's only
    // reliable-checkpoint writer, so the directory is exclusively ours.
    // (On a real cluster keep the HDFS files instead and register an
    // end-of-job cleanup — local mode has no executor-loss risk.)
    val out = edges.localCheckpoint()
    sc.getCheckpointDir.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
    }
    (out, rounds)
  }

  /** k-core extraction (k = 7) over the SEMANTIC similarity graph — the
    * q152 tf-idf cosine pairs (cosine ≥ 0.75) as edges — by iterative
    * peeling: drop every node with degree < k, remove its edges, repeat to
    * fixpoint. The k-core is the classic "dense cluster that survives
    * cascade removal" — on a corpus similarity graph it isolates tight
    * near-duplicate/template families that pairwise thresholds alone
    * overstate (a node kept by 7+ surviving neighbors, not by 7 raw hits).
    * The co-purchase graph q148 uses is complete on this fixture, so the
    * similarity graph is also the only fixture graph where peeling
    * actually cascades (3-4 rounds before fixpoint).
    *
    * Scale: each round is one partial-agg degree count + two left-semi
    * joins, all keyed on node — the PageRank join-agg loop shape — with
    * the per-round edge set checkpointed (see [[kcorePeel]]) and the
    * previous one released; round count is the peel depth (small for real
    * graphs), and the candidate edges come from q152's inverted index,
    * never an n² pair scan. The driver sees one count() per round (a
    * scalar), nothing row-sized. The oracle unrolls SIX peel rounds
    * (idempotent past the fixpoint — KcoreSpec pins fixture convergence
    * within that); Spark iterates to the true fixpoint, so both sides
    * agree exactly.
    */
  val q171KcoreSemantic = GraftQuery(
    "q171_kcore_semantic",
    (s, dir) => {
      val (edges, _) = kcorePeel(semanticEdges(s, dir), 7, 12)
      edges.groupBy("u").agg(count(lit(1)).as("core_deg"))
        .select(col("u").as("doc_id"), col("core_deg"))
        .orderBy("doc_id")
    },
    Some {
      // MATERIALIZED on every multiply-referenced CTE: DuckDB otherwise
      // inlines each e{r-1} into both its d{r} and e{r} consumers, doubling
      // the plan per peel round (>4 min at depth 6 vs 0.4 s materialized).
      val peel = (1 to 6).map { r =>
        s"""d$r AS MATERIALIZED (SELECT u, count(*) d FROM e${r - 1} GROUP BY 1),
           |k$r AS MATERIALIZED (SELECT u FROM d$r WHERE d >= 7),
           |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
           |  JOIN k$r a ON e.u = a.u JOIN k$r b ON e.v = b.u)""".stripMargin
      }.mkString(",\n")
      s"""WITH $semanticEdgesSql,
         |$peel
         |SELECT u AS doc_id, count(*) AS core_deg FROM e6
         |GROUP BY 1 ORDER BY 1""".stripMargin
    })

  /** The q171/q186 oracle's shared edge builder: tf-idf cosine ≥ 0.75
    * pairs over docs < 150, emitted both directions as e0 (mirrors
    * [[semanticEdges]] exactly). */
  private lazy val semanticEdgesSql: String =
    """tf AS MATERIALIZED (
      |  SELECT doc_id, t, count(*) tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) t
      |    FROM documents WHERE doc_id < 150) GROUP BY 1, 2),
      |df AS (SELECT t, count(*) df FROM tf GROUP BY 1),
      |nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) n FROM tf),
      |w AS MATERIALIZED (SELECT doc_id, t, tf * ln(n / df) AS w
      |  FROM tf JOIN df USING (t), nn WHERE df < n),
      |nrm AS (SELECT doc_id, sqrt(sum(w*w)) nrm FROM w GROUP BY 1),
      |dots AS (SELECT a.doc_id i, b.doc_id j, sum(a.w * b.w) dot
      |  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS MATERIALIZED (SELECT i, j
      |  FROM dots JOIN nrm x ON x.doc_id = i JOIN nrm y ON y.doc_id = j
      |  WHERE dot / (x.nrm * y.nrm) >= 0.75),
      |e0 AS MATERIALIZED (SELECT i u, j v FROM pairs UNION ALL SELECT j, i FROM pairs)""".stripMargin

  /** Synchronous label-propagation community detection over the semantic
    * similarity graph ([[semanticEdges]]): every node starts labeled with
    * its own id; each round it adopts the most frequent label among its
    * neighbors, ties broken toward the SMALLEST label. Four synchronous
    * rounds — the asynchronous/randomized LPA of Raghavan et al. is
    * non-deterministic by design, so this is the deterministic variant a
    * reproducible corpus pipeline needs (same tie-break GraphX's
    * LabelPropagation uses modulo hash order — here made total by the
    * (count desc, label asc) sort).
    *
    * Scale: per round one keyed equi-join (edges ⋈ labels, shuffled on
    * node id) + one partial-agg count + one per-node window top-1 — the
    * Pregel message/vote shape; label state is one row per node, never
    * collected to the driver. Fixed round count replays identically in the
    * oracle's unrolled CTEs.
    */
  val q186LabelProp = GraftQuery(
    "q186_label_prop",
    (s, dir) => {
      val e = semanticEdges(s, dir)
      var lab = e.select(col("u")).distinct()
        .select(col("u").as("node"), col("u").as("lbl"))
      for (_ <- 1 to 4) {
        val votes = e.join(lab, e("v") === lab("node"))
          .groupBy(e("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
        // argmax via max(struct): partial (map-side) aggregation collapses
        // the vote rows before the shuffle and skips the per-node sort a
        // row_number window paid each round (the q28 discipline); the
        // (cnt, −lbl) struct order IS (cnt desc, lbl asc) — identical
        // winner and tie-break, integer-exact
        lab = votes
          .groupBy(col("u"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("b"))
          .select(col("u").as("node"), (-col("b.neg")).as("lbl"))
      }
      val out = lab.select(col("node").as("doc_id"), col("lbl").as("community"))
        .orderBy("doc_id")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      e.unpersist()
      ckpt
    },
    Some {
      val rounds = (1 to 4).map { r =>
        s"""v$r AS (SELECT e.u, l.lbl, count(*) cnt
           |  FROM e0 e JOIN l${r - 1} l ON e.v = l.node GROUP BY 1, 2),
           |l$r AS MATERIALIZED (SELECT u AS node, lbl FROM (
           |  SELECT u, lbl, row_number() OVER (
           |    PARTITION BY u ORDER BY cnt DESC, lbl) rn FROM v$r) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $semanticEdgesSql,
         |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM e0),
         |$rounds
         |SELECT node AS doc_id, lbl AS community FROM l4 ORDER BY node""".stripMargin
    })

  /** Single-source shortest paths over the supplier co-supply graph
    * (suppliers are adjacent when they supply the same part; the edge
    * weight 1 + (s1+s2) % 7 is a deterministic symmetric cost). Four
    * Bellman-Ford relaxation rounds from supplier 1, each round one keyed
    * equi-join (frontier ⋈ edges) + one partial-agg min — the Pregel
    * dataflow shape, so a billion-edge graph relaxes with per-round
    * shuffles keyed by node id and no driver state beyond loop control.
    * The distance table carries REACHED nodes only (sparse frontier), so
    * early rounds shuffle a fraction of the node set. Determinism: a fixed
    * round count replayed identically by the oracle's unrolled CTEs —
    * integer weights keep every distance exact.
    */
  val q184Sssp = GraftQuery(
    "q184_sssp",
    (s, dir) => {
      // NOTE (r13 optimization round): the collect_set + in-row-pair-HOF
      // build that won on the order-keyed graphs (coPurchaseEdges) was
      // tried here and measured EQUAL within noise (10.4–10.9 s vs 10.4 s
      // in matched isolated runs at sf0.1; isolated runs of this query pay
      // ~4 s more JIT/codegen warmup than its slot inside a full bench
      // pass): per-part supplier sets are ~30 wide (vs ~4 per order), so
      // the in-row fan-out is ~870× and the HOF build loses its edge over
      // the shuffle-parallel self-join. Kept on the baseline-proven join
      // shape deliberately.
      val ps = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
      val e = ps.alias("a").join(ps.alias("b"), Seq("pk"))
        .filter(col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
        .withColumn("w", lit(1L) + (col("src") + col("dst")) % 7)
        .persist()
      // d is referenced twice per round (relax + the union), so an
      // unpersisted chain re-executes round i−1 in both branches —
      // 2^rounds leaf executions by round 4. Per-round frames are
      // node-cardinality; persist each, release after materialization
      var d = s.range(1).select(lit(1L).as("node"), lit(0L).as("dist"))
      val rounds = scala.collection.mutable.Buffer[DataFrame]()
      for (_ <- 1 to 4) {
        val relax = e.join(d, e("src") === d("node"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        d = d.unionByName(relax).groupBy("node").agg(min("dist").as("dist"))
          .persist()
        rounds += d
      }
      val out = d.filter(col("node") <= 60)
        .select(col("node").as("supp"), col("dist").cast("long").as("dist"))
        .orderBy("supp")
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      e.unpersist()
      rounds.foreach(_.unpersist())
      ckpt
    },
    Some {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM d${i - 1}
           |  UNION ALL
           |  SELECT e.dst, d.dist + e.w FROM d${i - 1} d JOIN ew e ON d.node = e.src)
           |GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
         |ew AS MATERIALIZED (
         |  SELECT src, dst, 1 + (src + dst) % 7 AS w FROM (
         |    SELECT DISTINCT a.sk AS src, b.sk AS dst
         |    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk <> b.sk)),
         |d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
         |$rounds
         |SELECT node AS supp, CAST(dist AS BIGINT) AS dist
         |FROM d4 WHERE node <= 60 ORDER BY supp""".stripMargin
    })

  /** Degree assortativity of the part co-purchase graph (Newman 2002):
    * the Pearson correlation of endpoint degrees over the symmetrized edge
    * list — positive means hubs attach to hubs (social-network shape),
    * negative means hub-and-spoke (infrastructure shape); it's the one-
    * number structure summary that tells a graph pipeline whether
    * degree-based partitioning (q148's orientation trick) will pay off.
    * One distinct-edge build, one degree partial agg, two keyed joins to
    * decorate edge endpoints, one corr fold — nothing beyond q148's
    * dataflow, and corr rounds at 3 (accumulation-order discipline).
    */
  val q215Assortativity = GraftQuery(
    "q215_assortativity",
    (s, dir) => {
      // parts co-ordered in the same order: sparse (small baskets), so
      // degrees VARY — the supplier graph is near-complete at fixture SF
      // (constant degree ⇒ zero variance ⇒ corr undefined)
      val und = coPurchaseEdges(Tables.lineitem(s, dir),
        "l_orderkey", "l_partkey").persist()
      val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy(col("u").as("n")).agg(count(lit(1)).as("deg"))
        .persist()
      val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
        round(avg("deg"), 3).as("avg_deg"))
      val dd = sym
        .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      val out = dd.agg((count(lit(1)) / 2).cast("long").as("n_edges"),
          round(corr("du", "dv"), 3).as("assortativity"))
        .crossJoin(nodeStats)
        .select(col("n_nodes"), col("n_edges"), col("avg_deg"),
          col("assortativity"))
      // localCheckpoint, not count()+recompute: the verify/bench action
      // reads the materialized rows instead of re-executing the released plan
      val ckpt = out.localCheckpoint()
      und.unpersist(); deg.unpersist()
      ckpt
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey o, l_partkey pk FROM lineitem),
           |und AS (SELECT DISTINCT a.pk u, b.pk v
           |  FROM li a JOIN li b ON a.o = b.o AND a.pk < b.pk),
           |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
           |deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) deg FROM sym GROUP BY 1),
           |ns AS (SELECT CAST(count(*) AS BIGINT) n_nodes,
           |    round(avg(deg), 3) avg_deg FROM deg),
           |dd AS (SELECT du.deg du, dv.deg dv FROM sym
           |  JOIN deg du ON du.n = sym.u JOIN deg dv ON dv.n = sym.v)
           |SELECT ns.n_nodes, CAST(count(*) / 2 AS BIGINT) AS n_edges,
           |  ns.avg_deg, round(corr(du, dv), 3) AS assortativity
           |FROM dd, ns GROUP BY ns.n_nodes, ns.avg_deg""".stripMargin))

  /** Personalized PageRank from a seed set (customers 1–20) over the
    * bipartite trade graph — the seeded-relevance primitive behind
    * graph-based label propagation and "expand this trusted set" curation
    * (random walks restart INTO the seeds, so mass concentrates around
    * them instead of spreading globally like q98): r ← 0.15·e_S + 0.85·Pᵀr
    * for 3 unrolled iterations, e_S uniform on the seeds. Same join-agg
    * Pregel dataflow and persisted edge list as q98; the output reports
    * the supplier side (nodes −1..−60) so the gate reads how seed mass
    * propagated across the bipartition — a fixed id range ordered by id,
    * no float-ranked top-k to flip.
    */
  val q237PersonalizedPagerank = GraftQuery(
    "q237_personalized_pagerank",
    (s, dir) => {
      val e = edges(s, dir).persist()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
      val withDeg = e.join(deg, "src").persist()
      val k = deg.filter(col("src") > 0 && col("src") <= 20).count().toDouble
      def teleport(node: org.apache.spark.sql.Column) =
        when(node > 0 && node <= 20, lit(1.0 / k)).otherwise(lit(0.0))
      var ranks = deg.select(col("src").as("node"),
        teleport(col("src")).as("rank"))
      // zero-contribution union into the round's groupBy in place of the
      // per-round left join back to the node set (the q98 rationale:
      // x + 0.0 is IEEE-exact, one shuffle + one stage barrier saved per
      // round)
      for (_ <- 1 to 3) {
        ranks = withDeg.join(ranks, withDeg("src") === ranks("node"))
          .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
          .unionByName(deg.select(col("src").as("node"), lit(0.0).as("c")))
          .groupBy("node").agg(sum("c").as("inflow"))
          .select(col("node"),
            (lit(0.15) * teleport(col("node")) +
              lit(0.85) * col("inflow")).as("rank"))
      }
      val out = ranks.filter(col("node") < 0 && col("node") >= -60)
        .select((-col("node")).as("supp"), round(col("rank"), 6).as("ppr"))
      // materialize via collect into a LocalRelation: the plain adaptive
      // path runs the 3-round rank chain with runtime broadcast of the
      // small ranks side, while BOTH persist() and localCheckpoint()
      // materializations execute the same chain ~3× slower (cached/
      // checkpointed plans skip AQE's join-strategy re-planning — measured
      // at sf0.1). The 60-row result is driver-bounded by construction
      // (suppliers ≤ 60), and a LocalRelation is immune to cache clears.
      // driver-side sort of the 60 rows preserves the documented
      // ordered-by-id contract without a SinglePartition exchange
      val rows = out.collect()
        .sortBy(_.getAs[Number]("supp").longValue)
      e.unpersist(); deg.unpersist(); withDeg.unpersist()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    },
    Some {
      val iters = (1 to 3).map { i =>
        s"""c$i AS (SELECT e.dst, sum(r${i - 1}.rank / deg.outdeg) AS inflow
           |  FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
           |  GROUP BY 1),
           |r$i AS (SELECT deg.src AS node,
           |    0.15 * (CASE WHEN deg.src > 0 AND deg.src <= 20
           |      THEN 1.0 / (SELECT k FROM ks) ELSE 0.0 END)
           |    + 0.85 * coalesce(c$i.inflow, 0) AS rank
           |  FROM deg LEFT JOIN c$i ON c$i.dst = deg.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey AS cust, -l_suppkey AS supp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT cust AS src, supp AS dst FROM pairs
         |      UNION ALL SELECT supp, cust FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |ks AS (SELECT CAST(count(*) AS DOUBLE) k FROM deg
         |  WHERE src > 0 AND src <= 20),
         |r0 AS (SELECT src AS node,
         |    CASE WHEN src > 0 AND src <= 20
         |      THEN 1.0 / (SELECT k FROM ks) ELSE 0.0 END AS rank
         |  FROM deg),
         |$iters
         |SELECT -node AS supp, round(rank, 6) AS ppr
         |FROM r3 WHERE node < 0 AND node >= -60 ORDER BY supp""".stripMargin
    })

  /** One round of neighbor feature propagation (the message-passing
    * primitive GNN feature engineering reduces to at tabular scale):
    * every supplier's raw feature is its shipped-quantity total, and the
    * propagated feature is the mean over its co-purchase neighbors —
    * smoothing node signals by graph structure before any model sees
    * them. One distinct-edge build, one symmetrize, one keyed join to
    * decorate neighbors, one partial-agg mean — the exact per-round
    * dataflow of q98/q184 with features instead of ranks. Output:
    * suppliers ≤ 60 with raw vs propagated feature and neighbor count
    * (means are exact integer rationals: sum/count of long totals).
    */
  val q264FeaturePropagation = GraftQuery(
    "q264_feature_propagation",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val feat = li.groupBy(col("l_suppkey").as("n"))
        .agg(sum("l_quantity").cast("long").as("f"))
      val und = coPurchaseEdges(li, "l_orderkey", "l_suppkey")
      val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      sym.join(feat.select(col("n").as("v"), col("f").as("nf")), "v")
        .groupBy("u")
        .agg(count(lit(1)).as("n_neighbors"),
          round(sum("nf") / count(lit(1)).cast("double"), 3).as("propagated_f"))
        .join(feat.select(col("n").as("u"), col("f").as("raw_f")), "u")
        .filter(col("u") <= 60)
        .select(col("u").as("supp"), col("raw_f"), col("n_neighbors"),
          col("propagated_f"))
        .orderBy("supp")
    },
    Some("""WITH feat AS (SELECT l_suppkey n, CAST(sum(l_quantity) AS BIGINT) f
           |  FROM lineitem GROUP BY 1),
           |ps AS (SELECT DISTINCT l_orderkey o, l_suppkey sk FROM lineitem),
           |und AS (SELECT DISTINCT a.sk u, b.sk v
           |  FROM ps a JOIN ps b ON a.o = b.o AND a.sk < b.sk),
           |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
           |agg AS (SELECT sym.u, CAST(count(*) AS BIGINT) n_neighbors,
           |    round(sum(nf.f) / count(*)::DOUBLE, 3) propagated_f
           |  FROM sym JOIN feat nf ON nf.n = sym.v GROUP BY 1)
           |SELECT agg.u AS supp, feat.f AS raw_f, n_neighbors, propagated_f
           |FROM agg JOIN feat ON feat.n = agg.u
           |WHERE agg.u <= 60 ORDER BY supp""".stripMargin))

  /** Newman-Girvan modularity (Newman & Girvan 2004; Newman 2006) of the
    * supplier co-purchase graph under the NATION partition — the
    * community-QUALITY score the graph family was missing: q186 produces
    * communities and q215 measures degree assortativity, but nothing
    * said how good a given partition is. Here the partition is the
    * supplier's nation (a metadata community), so the score answers "do
    * same-nation suppliers co-supply more than a degree-preserving random
    * graph would predict?" — the exact question a data-locality-aware
    * shard planner asks before co-locating by a dimension key.
    *
    * Integer-exact to the last division: with m edges, intra-community
    * edge counts m_c and community degree sums d_c,
    * Q = Σ_c (m_c/m − (d_c/2m)²) = Σ_c (4·m·m_c − d_c²) / (4m²) — the
    * numerator terms and 4m² are exact BIGINTs (d_c ≤ 2m, so d_c² needs
    * ~2log₂(2m) bits — fine to ~10⁹ edges), both engines divide the SAME
    * two integers once per community row and once pooled. A positive
    * pooled Q at 100 TB would justify nation-keyed bucketing; the
    * per-community rows show which nations drive it.
    *
    * Scale shape: the per-order co-purchase self-join (the q148 edge
    * builder), one broadcast dimension join for nations, two partial-agg
    * groupBys (per-community degree, per-community intra edges), and a
    * 25-row output. The 1-row total joins back via broadcast.
    */
  val q331Modularity = GraftQuery(
    "q331_modularity",
    (s, dir) => {
      val und = coPurchaseEdges(Tables.lineitem(s, dir),
        "l_orderkey", "l_suppkey").persist()
      val nat = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("n"), col("s_nationkey").as("c"))
      val deg = und.select(col("u").as("n"))
        .unionAll(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val dc = deg.join(nat, "n")
        .groupBy("c").agg(sum("deg").as("d_c"))
      val intra = und
        .join(nat.select(col("n").as("u"), col("c").as("cu")), "u")
        .join(nat.select(col("n").as("v"), col("c").as("cv")), "v")
        .filter(col("cu") === col("cv"))
        .groupBy(col("cu").as("c")).agg(count(lit(1)).as("m_c"))
      val m = und.agg(count(lit(1)).as("m"))
      val perC = dc.join(intra, Seq("c"), "left")
        .na.fill(0L, Seq("m_c"))
        .crossJoin(broadcast(m))
        .select(col("c").as("community"), col("m_c"), col("d_c"),
          (lit(4L) * col("m") * col("m_c") - col("d_c") * col("d_c"))
            .as("q_num"),
          (lit(4L) * col("m") * col("m")).as("q_den"))
      val out = perC.select(col("community"), col("m_c"), col("d_c"),
          round(col("q_num").cast("double") / col("q_den").cast("double"), 6)
            .as("q_part"))
        .orderBy("community")
        .localCheckpoint()
      und.unpersist()
      out
    },
    Some("""WITH ps AS (
           |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS k FROM lineitem),
           |und AS (
           |  SELECT DISTINCT a.k AS u, b.k AS v
           |  FROM ps a JOIN ps b ON b.o = a.o AND a.k < b.k),
           |nat AS (SELECT s_suppkey AS n, s_nationkey AS c FROM supplier),
           |deg AS (
           |  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
           |    SELECT u AS n FROM und UNION ALL SELECT v FROM und)
           |  GROUP BY 1),
           |dc AS (
           |  SELECT c, CAST(sum(deg) AS BIGINT) AS d_c
           |  FROM deg JOIN nat USING (n) GROUP BY 1),
           |intra AS (
           |  SELECT cu.c AS c, CAST(count(*) AS BIGINT) AS m_c
           |  FROM und JOIN nat cu ON cu.n = und.u
           |    JOIN nat cv ON cv.n = und.v
           |  WHERE cu.c = cv.c GROUP BY 1),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und)
           |SELECT dc.c AS community,
           |  CAST(coalesce(m_c, 0) AS BIGINT) AS m_c, d_c,
           |  round(CAST(4 * m.m * coalesce(m_c, 0) - d_c * d_c AS DOUBLE) /
           |    CAST(4 * m.m * m.m AS DOUBLE), 6) AS q_part
           |FROM dc LEFT JOIN intra ON intra.c = dc.c, m
           |ORDER BY community""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q98PageRank, q148TriangleCount, q171KcoreSemantic,
    q184Sssp, q186LabelProp, q215Assortativity, q237PersonalizedPagerank,
    q264FeaturePropagation, q331Modularity)
}
