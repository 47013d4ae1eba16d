package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** q375 — k-truss peeling (Cohen 2008): the EDGE-cohesion decomposition
  * next to q171's node-cohesion k-core — an edge survives the k-truss
  * iff it participates in ≥ k−2 triangles among surviving edges, so a
  * truss is a set of overlapping triangles ("social-circle" cores), while
  * a k-core can be triangle-free. Community detection and spam-graph
  * cleanup both peel trusses where cores are too blunt.
  */
object Graph13 {

  /** Undirected edge key packed into ONE BIGINT — explode streams stay
    * bare longs (the q148 GC lesson: struct-wrapped triangle streams
    * allocate one boxed object per triangle). Safe for any int32 node id:
    * least·2³¹ + greatest < 2⁶². */
  private[ops] def encodePair(a: Column, b: Column): Column =
    least(a, b) * lit(2147483648L) + greatest(a, b)

  /** Exact per-edge triangle support via the q148 edge-iterator: orient by
    * (degree, id), decorate each oriented edge with both endpoints'
    * out-adjacency arrays, and emit all three credits of each triangle
    * {x,y,z} (found once, on its base leg) from ONE fused sorted-merge
    * pass ([[graft.functions.TriangleCredits]]). Returns (ek, support);
    * a zero-triangle edge is ABSENT rather than present-with-0 — callers
    * treat absence as support 0, exactly like the oracle's sup-join
    * (Round13bSpec pins this).
    */
  private[ops] def edgeSupport(edges: DataFrame): DataFrame =
    edgeSupportWithCaches(edges)._1

  /** edgeSupport plus the two per-level cache handles (oriented edge list,
    * adjacency arrays) so the peel loop can release them after each level's
    * survivor frame materializes instead of pinning up to six
    * edge/node-cardinality caches until the harness-wide clearCache. */
  private[ops] def edgeSupportWithCaches(
      edges: DataFrame): (DataFrame, Seq[DataFrame]) = {
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    // oriented feeds the adjacency aggregate AND the decorated stream —
    // persist the edge list so orientation (2 degree joins) runs once per
    // level; adj is joined onto both endpoints, so persist it too.
    // The credit pass is the FUSED kernel (r14): one sorted-merge
    // intersection per decorated edge emits the base credit and both apex
    // credits together, where the two-leg shape (intersect-COUNT base leg
    // unioned with an intersect-ARRAY apex explode) ran the merge twice,
    // re-derived the decoration join pair under each leg, and paid an
    // extra exchange to combine the legs (2 Generate + 2 HashAggregate
    // trees + union → 1 Generate + 1 partial-agg groupBy). Edges with no
    // triangle are now ABSENT rather than present-with-support-0 — callers
    // already treat absence as 0 (Round13bSpec pins this contract).
    val orientedP = oriented.persist()
    val adj = orientedP.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbr"))
      .persist()
    val dec = orientedP
      .join(adj.select(col("src"), col("nbr").as("nx")), "src")
      .join(adj.select(col("src").as("dst"), col("nbr").as("ny")), "dst")
    val sup = dec
      .select(explode(GraftFunctions.trussCredits(
        col("src"), col("dst"), col("nx"), col("ny"))).as("ek"))
      .groupBy("ek").agg(count(lit(1)).as("support"))
    (sup, Seq(orientedP, adj))
  }

  /** 14-truss peel (support ≥ 12, the fixture graph's ~p60) over the part
    * co-purchase graph, THREE unrolled peel levels — the q98/q237/q314
    * fixed-iteration discipline: both engines replay exactly three
    * levels, the per-level removal counts ARE the output, and a zero
    * removal count is the converged flag. Each level recounts support
    * among survivors and drops edges below threshold (removals cascade:
    * a dropped edge erases its triangles, pushing neighbors below).
    *
    * Scale shape: per level, nothing bigger than the edge list shuffles —
    * orientation bounds out-degrees at O(√m), per-triangle rows exist
    * only inside a bare-long explode → partial agg, and each level's
    * survivor frame is localCheckpoint()ed (the q324 plan-depth lesson);
    * only scalar counts reach the driver. The oracle replays the same
    * three levels as MATERIALIZED CTEs (the q297 unrolled-fixpoint
    * discipline).
    */
  val q375Ktruss = GraftQuery(
    "q375_ktruss",
    (s, dir) => {
      GraftFunctions.register(s)
      val minSup = 12L
      // shared 2-exchange pair builder (see Graph.coPurchaseEdges) in place
      // of the 4-exchange distinct/self-join/distinct chain
      val e0 = Graph.coPurchaseEdges(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey")
        .localCheckpoint()
      var e = e0
      // level l's n_before IS level l−1's n_after — count each survivor
      // frame once instead of twice (3 fewer jobs over the checkpointed
      // edge sets)
      var nPrev = e0.count()
      val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      for (lvl <- 1 to 3) {
        val (sup, caches) = edgeSupportWithCaches(e)
        // survivors decode STRAIGHT off the support key — ek is least·2³¹ +
        // greatest of an edge of e, and e keeps u < v by construction
        // (coPurchaseEdges), so (ek div 2³¹, ek mod 2³¹) IS the edge and
        // the former semi-join back to e (one more scan + join per level)
        // is pure re-derivation of what the key already carries. Every
        // support key is a real e edge (base keys from the decoration,
        // apex keys from adjacency membership), and a kept edge has
        // support ≥ 12 ≥ 1 so it cannot be absent from sup.
        val kept = sup.filter(col("support") >= minSup)
          .select(expr("ek div 2147483648").as("u"),
            expr("ek % 2147483648").as("v"))
          .localCheckpoint()
        // the eager localCheckpoint above materialized everything that
        // reads the level's caches — release them now instead of pinning
        // up to six edge/node-cardinality caches until the harness-wide
        // clearCache (q148's unpersist discipline)
        caches.foreach(_.unpersist())
        val nAfter = kept.count()
        stats += ((lvl, nPrev, nAfter))
        nPrev = nAfter
        e = kept
      }
      import s.implicits._
      stats.toSeq.toDF("level", "n_before", "n_after")
        .select(col("level"), col("n_before"), col("n_after"),
          (col("n_before") - col("n_after")).as("n_removed"))
        .orderBy("level")
    },
    Some {
      def level(n: Int): String =
        s"""deg$n AS MATERIALIZED (
           |  SELECT n, count(*) AS deg FROM (
           |    SELECT u AS n FROM e$n UNION ALL SELECT v FROM e$n)
           |  GROUP BY 1),
           |o$n AS MATERIALIZED (
           |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
           |           THEN u ELSE v END AS src,
           |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
           |           THEN v ELSE u END AS dst
           |  FROM e$n JOIN deg$n du ON du.n = u JOIN deg$n dv ON dv.n = v),
           |tris$n AS MATERIALIZED (
           |  SELECT p.src AS x, p.dst AS y, q.dst AS z
           |  FROM o$n p JOIN o$n q ON p.src = q.src
           |  JOIN deg$n dy ON dy.n = p.dst JOIN deg$n dz ON dz.n = q.dst
           |  JOIN o$n c ON c.src = p.dst AND c.dst = q.dst
           |  WHERE dy.deg < dz.deg OR (dy.deg = dz.deg AND p.dst < q.dst)),
           |sup$n AS MATERIALIZED (
           |  SELECT least(a, b) AS u, greatest(a, b) AS v, count(*) AS s
           |  FROM (
           |    SELECT x AS a, y AS b FROM tris$n
           |    UNION ALL SELECT x, z FROM tris$n
           |    UNION ALL SELECT y, z FROM tris$n)
           |  GROUP BY 1, 2),
           |e${n + 1} AS MATERIALIZED (
           |  SELECT e.u, e.v FROM e$n e
           |  JOIN sup$n s ON s.u = e.u AND s.v = e.v AND s.s >= 12)""".stripMargin
      s"""WITH e1 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |${level(1)},
         |${level(2)},
         |${level(3)},
         |cnt AS (
         |  SELECT 1 AS level,
         |    (SELECT count(*) FROM e1) AS n_before,
         |    (SELECT count(*) FROM e2) AS n_after
         |  UNION ALL SELECT 2, (SELECT count(*) FROM e2),
         |    (SELECT count(*) FROM e3)
         |  UNION ALL SELECT 3, (SELECT count(*) FROM e3),
         |    (SELECT count(*) FROM e4))
         |SELECT CAST(level AS INT) AS level,
         |  CAST(n_before AS BIGINT) AS n_before,
         |  CAST(n_after AS BIGINT) AS n_after,
         |  CAST(n_before - n_after AS BIGINT) AS n_removed
         |FROM cnt ORDER BY level""".stripMargin
    })

  /** q378 — resource-allocation link prediction (Zhou, Lü & Zhang 2009):
    * score non-adjacent pairs by Σ_w 1/deg(w) over common neighbors w —
    * the strongest of the classic local similarity indices (it
    * down-weights promiscuous hubs harder than Adamic-Adar's 1/log).
    * Scores are EXACT integers: each center contributes
    * ⌊10⁶/deg(w)⌋ (the integer-scaled RA the q233/q314 exact-rational
    * discipline calls for — float Σ1/deg would be accumulation-order-
    * dependent), so ranking and ties are engine-independent.
    *
    * The analysis graph is a deterministic 1/16 md5 edge sparsification
    * of the part co-purchase graph (the fixture graph is near-complete —
    * every node ~p50 degree 90-120 — so UNSAMPLED it has almost no
    * non-adjacent 2-hop pairs for a predictor to rank; the sparsified
    * overlay has mean degree ~7 and a real prediction problem, and both
    * engines sample by the same md5 coin). Candidate generation
    * additionally fans out wedges ONLY from centers of degree ≤ 32 — the
    * standard hub-exclusion cap of large-scale link prediction (a hub's
    * common-neighbor signal is noise; its wedge fan-out is the quadratic
    * cost). The cap is part of the operator's SEMANTICS (both engines
    * apply it), documented like the q285 bucket prune.
    *
    * Scale shape: degree partial agg → capped wedge equi-join (per-center
    * fan-out ≤ 32² rows) → partial-agg score sum → anti-join against the
    * edge list → TakeOrderedAndProject top-20. Nothing unbounded, no
    * window over the corpus.
    */
  val q378LinkPrediction = GraftQuery(
    "q378_link_prediction",
    (s, dir) => {
      val und = Graph.coPurchaseEdges(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey")
        .filter(conv(substring(md5(concat(col("u").cast("string"),
          lit("_"), col("v").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 16 === 0)
        .localCheckpoint()
      val deg = und.select(col("u").as("n"))
        .unionAll(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      // symmetric adjacency restricted to low-degree centers.
      // NOTE (r14 optimization round): the coPurchaseEdges HOF pair build
      // (groupBy center + sorted collect_list + in-row cu < cv explode)
      // was tried here and measured SLOWER in matched isolated runs
      // (min/med 2.12/2.34 s join shape vs 2.80/3.06 s HOF shape at
      // sf0.1): kept centers fan out ≤ 496 in-row pairs in ONE task row
      // vs the shuffle-parallel self-join, the same ~30-wide-set loss as
      // q184's edge build. Kept on the measured-faster join shape.
      val half = und.select(col("u").as("w"), col("v").as("x"))
        .unionAll(und.select(col("v").as("w"), col("u").as("x")))
      val centers = half.join(deg.filter(col("deg") <= 32)
        .select(col("n").as("w"), col("deg")), "w")
        .withColumn("ra", expr("1000000L div deg"))
      val wedges = centers.as("p")
        .join(centers.as("q"),
          col("p.w") === col("q.w") && col("p.x") < col("q.x"))
        .select(col("p.x").as("cu"), col("q.x").as("cv"), col("p.ra"))
      val scored = wedges.groupBy("cu", "cv")
        .agg(sum("ra").as("ra_score"), count(lit(1)).as("n_common"))
      scored
        .join(und, scored("cu") === und("u") && scored("cv") === und("v"),
          "left_anti")
        .orderBy(col("ra_score").desc, col("cu"), col("cv"))
        .limit(20)
        .select(col("cu"), col("cv"), col("n_common"), col("ra_score"))
    },
    Some("""WITH und AS MATERIALIZED (
           |  SELECT u, v FROM (
           |    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           |    FROM lineitem a JOIN lineitem b
           |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
           |  WHERE CAST(concat('0x', substr(md5(u::VARCHAR || '_'
           |    || v::VARCHAR), 1, 8)) AS BIGINT) % 16 = 0),
           |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
           |  SELECT u AS n FROM und UNION ALL SELECT v FROM und) GROUP BY 1),
           |half AS (
           |  SELECT u AS w, v AS x FROM und
           |  UNION ALL SELECT v, u FROM und),
           |centers AS MATERIALIZED (
           |  SELECT h.w, h.x, d.deg FROM half h
           |  JOIN deg d ON d.n = h.w AND d.deg <= 32),
           |scored AS (
           |  SELECT p.x AS cu, q.x AS cv,
           |    CAST(sum(1000000 // p.deg) AS BIGINT) AS ra_score,
           |    CAST(count(*) AS BIGINT) AS n_common
           |  FROM centers p JOIN centers q
           |    ON p.w = q.w AND p.x < q.x
           |  GROUP BY 1, 2)
           |SELECT cu, cv, n_common, ra_score
           |FROM scored s
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM und e WHERE e.u = s.cu AND e.v = s.cv)
           |ORDER BY ra_score DESC, cu, cv LIMIT 20""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q375Ktruss, q378LinkPrediction)
}
