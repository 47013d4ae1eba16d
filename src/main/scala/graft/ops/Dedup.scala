package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Deduplication operators (SURVEY.md §2.3): exact (hash-group), MinHash+LSH
  * (shingle → minhash → band → bucket-join → exact-Jaccard verify), n-gram
  * Jaccard, SimHash, and embedding-cosine nearest-neighbor.
  *
  * Everything is deterministic, hash-family arithmetic included, so the
  * DuckDB oracle replicates each pipeline exactly: token ints come from md5
  * hex (identical in both engines), the minhash family is
  * `h_i(t) = (t·(2i+1) + i·1000000007 + 12345) mod 2147483647`, and Jaccard
  * is an exact integer ratio.
  *
  * Scale design (100 TB): no all-pairs joins in the LSH path — candidates
  * come from equi-joins on (band, key) buckets, so the shuffle is keyed by
  * band buckets and AQE handles skewed buckets; the exact-verify join only
  * touches candidate pairs. SimHash reduces docs to one 60-bit signature
  * (explode → partial-agg, two shuffles) before any pairing.
  */
object Dedup {

  private val P = 2147483647L // 2^31-1, Mersenne prime for the hash family
  private[ops] val NUM_HASHES = 24
  private val BANDS = 8 // r = 3 rows per band

  /** doc_id + word-3-gram md5-prefix hashes (distinct grams), via the fused
    * [[graft.functions.ShingleHashes]] kernel — one codegen'd pass instead of
    * the interpreted split/transform/distinct HOF chain (round-1 hot spot).
    */
  private[ops] def shingleHashed(docs: DataFrame, nibbles: Int): DataFrame =
    docs
      .withColumn("tints", graft.functions.GraftFunctions.shingle3(col("text"), nibbles))
      .filter(size(col("tints")) > 0) // <3-token docs: parity with oracle NULL bands
      .select(col("doc_id"), col("tints"))

  /** Sorted distinct shingle-hash sets — the layout
    * [[graft.functions.IntersectCountSorted]] requires for its merge loop.
    */
  private[ops] def sortedInts(ints: Column): Column = array_sort(array_distinct(ints))

  /** Exact dedup surface: per-source unique-content accounting via content
    * hash grouping (survivor selection = min doc_id per fingerprint).
    */
  val q24DedupExact = GraftQuery(
    "q24_dedup_exact",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"),
          min("doc_id").as("first_doc"))
        .orderBy("source"),
    Some("""SELECT source, count(*) AS n_docs,
           |  count(DISTINCT md5(text)) AS n_unique,
           |  count(*) - count(DISTINCT md5(text)) AS n_exact_dups,
           |  min(doc_id) AS first_doc
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The MinHash+LSH near-dup pair pipeline shared by q25 (pair listing) and
    * q59 (cluster collapsing): 24 minhashes, 8 bands × 3 rows, candidates
    * from band-bucket equi-joins, verified with exact Jaccard ≥ 0.5.
    * Returns (i, j, jac) with i < j.
    */
  /** (band, key) rows for LSH bucketing: key is xxhash64 over the band's
    * 3-row signature slice — a fixed-width long equi-join key instead of a
    * concatenated string. A hash collision can only ADD a candidate pair
    * (killed by the exact-Jaccard verify); equal slices always collide, so
    * no true pair is ever lost.
    */
  private[ops] def bandKeys(sh: DataFrame): DataFrame =
    sh.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(BANDS - 1)),
        b => xxhash64(b, slice(col("sig"), b * 3 + 1, lit(3))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")

  /** Exact-Jaccard verification of candidate (i, j) pairs: decorate both
    * sides with their sorted distinct int sets from `sets` (doc_id, ti),
    * compute J = I/(a+b−I) with the codegen'd merge intersect, keep pairs
    * with J ≥ tau. The shared tail of every keyed candidate generator
    * here (MinHash bands, prefix-filter, sorted-neighborhood) — exact
    * verification runs on CANDIDATES only, never the corpus cross join.
    */
  private[ops] def verifyJaccard(cand: DataFrame, sets: DataFrame,
      tau: Double): DataFrame = {
    val inter = graft.functions.GraftFunctions
      .intersectCount(col("ti_i"), col("ti_j")).cast("int")
    cand
      .join(sets.select(col("doc_id").as("i"), col("ti").as("ti_i")), "i")
      .join(sets.select(col("doc_id").as("j"), col("ti").as("ti_j")), "j")
      .withColumn("jac",
        inter.cast("double") / (size(col("ti_i")) + size(col("ti_j")) - inter))
      .filter(col("jac") >= tau)
      .select(col("i"), col("j"), col("jac"))
  }

  private[ops] def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsDocs(s, Tables.documents(s, dir))

  /** Same pipeline over an arbitrary (doc_id, text) frame — the composable
    * form the q308 pipeline capstone chains after its dedup stages.
    */
  private[ops] def minhashPairsDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // shingle+hash pipeline feeds signatures AND both sides of the verify
    // join — persist so it's computed once, not three times.
    // Signatures are computed BEFORE persist so the cached table carries
    // only (doc_id, ti, sig) — the raw shingle strings never hit storage.
    val sh = shingleHashed(docs, 8)
      .withColumn("ti", sortedInts(col("tints")))
      .withColumn("sig",
        graft.functions.GraftFunctions.minhash(col("tints"), NUM_HASHES))
      .select(col("doc_id"), col("ti"), col("sig"))
      .persist()
    val bands = bandKeys(sh)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    // (bands and both verify sides read the slim persisted table)
    verifyJaccard(cand, sh.select(col("doc_id"), col("ti")), 0.5)
  }

  /** Connected components over an undirected (i, j) edge list. Returns
    * (v, lbl) where lbl is the component's minimum vertex id.
    *
    * Adaptive: candidate-pair graphs usually collapse to a tiny edge set
    * after LSH banding, where a driver-side union-find beats any
    * distributed round; above `localThreshold` edges it delegates to
    * [[connectedComponentsStar]] — O(log n) rounds regardless of graph
    * diameter, the 100 TB path. ([[connectedComponentsMinLabel]] and
    * [[connectedComponentsGraphX]] remain as parity-specced alternatives.)
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50,
      localThreshold: Long = 200000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("i").as("a"), col("j").as("b"))
      .unionAll(edges.select(col("j").as("a"), col("i").as("b")))
    // single dispatch job: pull at most threshold+1 edges — a short result
    // IS the complete edge set (no separate count pass over the expensive
    // upstream pipeline), an overflow routes to the distributed star path.
    // Bounded: never materializes more than localThreshold+1 rows of
    // (long, long) on the driver (~3 MB at the 200k default).
    // clamp: limit() takes an Int, and a Long threshold above Int.MaxValue-1
    // would overflow to a negative limit (AnalysisException). Thresholds that
    // large can't be probed this way anyway — the driver couldn't hold the
    // edges — so they just cap at the widest probe that fits.
    val lim = math.min(localThreshold, (Int.MaxValue - 1).toLong).toInt
    val es = sym.select(col("a").cast("long"), col("b").cast("long"))
      .limit(lim + 1).as[(Long, Long)].collect()
    if (es.length <= lim) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      return parent.keys.toSeq.map(v => (v, find(v))).toDF("v", "lbl")
    }
    connectedComponentsStar(edges, maxRounds)
  }

  /** Min-label propagation variant: label(v) ← min(label(v), min over
    * neighbors), repeated to fixpoint (≤ graph diameter rounds). Each round
    * is one shuffle join + aggregate; `localCheckpoint` cuts the growing
    * lineage. O(diameter) rounds — fine for near-dup graphs (overwhelmingly
    * tiny components, so tiny diameter), pathological on long chains, which
    * is why [[connectedComponents]] prefers the star algorithm at scale.
    * On a real cluster use `checkpoint` to reliable storage instead of
    * `localCheckpoint` (executor loss loses local blocks).
    */
  def connectedComponentsMinLabel(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("i").as("a"), col("j").as("b"))
      .unionAll(edges.select(col("j").as("a"), col("i").as("b")))
      .persist()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint()
    // labels only ever decrease (least of self and neighbor minima), so the
    // label sum strictly decreases until fixpoint — one cheap aggregate per
    // round detects convergence instead of a change-detection join.
    var lblSum = labels.agg(sum("lbl")).first().getLong(0)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = sym.join(labels, sym("b") === labels("v"))
        .groupBy(sym("a").as("nv")).agg(min("lbl").as("nl"))
      val next = labels.join(neighborMin, labels("v") === col("nv"), "left")
        .select(labels("v").as("v"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val nextSum = next.agg(sum("lbl")).first().getLong(0)
      converged = nextSum == lblSum
      lblSum = nextSum
      labels = next
      round += 1
    }
    sym.unpersist()
    labels
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round alternative to min-label propagation for adversarially
    * long chains, where O(diameter) rounds would dominate. Each iteration
    * is two keyed groupBy+join passes:
    *
    *   - large-star: symmetrize; per node u compute m = min(Γ(u) ∪ {u});
    *     rewire every strictly-larger neighbor v > u to m;
    *   - small-star: orient each edge (max, min); per node u compute
    *     m = min(Γ(u) ∪ {u}); rewire u and its smaller neighbors to m.
    *
    * Converges when the small-star edge set is stable — checked with a
    * count + order-independent xxhash64-XOR checksum (one cheap aggregate;
    * the edge set is distinct so XOR is a sound set signature), at
    * which point the edges form a star forest (member → component-min).
    * Returns (v, lbl), the same contract as [[connectedComponents]].
    */
  def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.filter(col("u") =!= col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v"))
          .filter(col("u") =!= col("v")))
      val m = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
      val m = oriented.groupBy("u").agg(min(col("v")).as("m"))
      oriented.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .unionAll(m.select(col("u"), col("m").as("v")))
        .distinct()
    }
    var e = edges
      .select(col("i").cast("long").as("u"), col("j").cast("long").as("v"))
      .localCheckpoint()
    var sig = (-1L, -1L)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val row = e.select(xxhash64(col("u"), col("v")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).first()
      val next = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      converged = next == sig
      sig = next
      round += 1
    }
    // star forest: every remaining edge is (member, center); centers label
    // themselves
    e.select(col("u").as("v"), col("v").as("lbl"))
      .unionAll(e.select(col("v").as("v"), col("v").as("lbl")))
      .distinct()
  }

  /** GraphX variant of [[connectedComponents]] — same contract (component
    * label = minimum vertex id), Pregel-based: O(diameter) supersteps with
    * vertex-cut partitioning, the right tool when the near-dup graph has
    * adversarially long chains or the edge list no longer fits comfortably
    * in the join-per-round loop. Parity spec keeps the two interchangeable.
    */
  def connectedComponentsGraphX(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val tuples = edges.select(col("i").cast("long"), col("j").cast("long"))
      .as[(Long, Long)].rdd
    org.apache.spark.graphx.Graph.fromEdgeTuples(tuples, defaultValue = 0)
      .connectedComponents()
      .vertices
      .toDF("v", "lbl")
  }

  /** MinHash + LSH near-dup pair listing (the q59 cluster view collapses
    * these transitively).
    */
  val q25DedupMinhash = GraftQuery(
    "q25_dedup_minhash",
    (s, dir) =>
      minhashPairs(s, dir)
        .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
        .orderBy("i", "j"),
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents),
           |ti AS (SELECT doc_id, g,
           |  list_transform(g, t -> CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT)) tints FROM toks),
           |sig AS (SELECT doc_id, g, list_transform(range(0,24), h ->
           |  list_min(list_transform(tints, t -> (t*(2*h+1) + h*1000000007 + 12345) % 2147483647))) s
           |  FROM ti),
           |bands AS (SELECT doc_id, b.b AS band,
           |  s[3*b.b+1]::VARCHAR||','||s[3*b.b+2]::VARCHAR||','||s[3*b.b+3]::VARCHAR AS key
           |  FROM sig, range(0,8) b(b)),
           |cand AS (SELECT DISTINCT a.doc_id i, c.doc_id j
           |  FROM bands a JOIN bands c ON a.band=c.band AND a.key=c.key AND a.doc_id < c.doc_id),
           |tset AS (SELECT doc_id, list_distinct(tints) ti FROM ti),
           |ver AS (SELECT i, j,
           |  len(list_filter(x.ti, e -> list_contains(y.ti, e)))::DOUBLE /
           |  (len(x.ti)+len(y.ti)-len(list_filter(x.ti, e -> list_contains(y.ti, e)))) jac
           |  FROM cand JOIN tset x ON x.doc_id=i JOIN tset y ON y.doc_id=j)
           |SELECT i, j, round(jac, 6) AS jac FROM ver WHERE jac >= 0.5 ORDER BY i, j""".stripMargin))

  /** Character-4-gram Jaccard near-dup over one language partition —
    * ground-truth all-pairs form (usable where a partition column bounds the
    * pair count; the LSH path above is the unbounded-scale variant).
    */
  val q26DedupNgram = GraftQuery(
    "q26_dedup_ngram",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // both sides of the all-pairs join read this frame — persist so the
      // per-doc char-gram hashing (the expensive per-row kernel) runs once
      val de = Tables.documents(s, dir)
        .filter(col("lang") === "de")
        .withColumn("cg",
          sortedInts(graft.functions.GraftFunctions.charGrams(col("text"), 4, 8)))
        .select(col("doc_id"), col("cg"))
        .persist()
      val inter = graft.functions.GraftFunctions
        .intersectCount(col("ci"), col("cj")).cast("int")
      // exact pruning: J = I/(a+b-I) ≥ 0.5 and I ≤ min(a,b) force
      // max(a,b) ≤ 2·min(a,b), so size-incompatible pairs skip the
      // merge-count entirely (no false negatives)
      de.select(col("doc_id").as("i"), col("cg").as("ci"))
        .join(de.select(col("doc_id").as("j"), col("cg").as("cj")),
          col("i") < col("j") &&
            size(col("ci")) * 2 >= size(col("cj")) &&
            size(col("cj")) * 2 >= size(col("ci")))
        .withColumn("jac",
          inter.cast("double") / (size(col("ci")) + size(col("cj")) - inter))
        .filter(col("jac") >= 0.5)
        .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
        .orderBy("i", "j")
    },
    Some("""WITH de AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    list_transform(range(1, length(text)-2), i -> substr(text, i, 4)),
           |    t -> CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT))) cg
           |  FROM documents WHERE lang = 'de'),
           |p AS (SELECT a.doc_id i, b.doc_id j,
           |  len(list_filter(a.cg, e -> list_contains(b.cg, e)))::DOUBLE /
           |  (len(a.cg)+len(b.cg)-len(list_filter(a.cg, e -> list_contains(b.cg, e)))) jac
           |  FROM de a, de b WHERE a.doc_id < b.doc_id)
           |SELECT i, j, round(jac, 6) AS jac FROM p WHERE jac >= 0.5 ORDER BY i, j""".stripMargin))

  /** SimHash near-dup: 60-bit signatures from shingle hashes (explode →
    * per-bit partial aggregation → one long per doc), then low-Hamming pairs.
    */
  val q27DedupSimhash = GraftQuery(
    "q27_dedup_simhash",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // per-doc signature stays inside one projection (no explode shuffle):
      // the fused SimHash60 kernel folds all token hashes into one long
      val sig = shingleHashed(Tables.documents(s, dir), 15)
        .withColumn("h", graft.functions.GraftFunctions.simhash60(col("tints")))
        .select(col("doc_id"), col("h"))
        .persist() // both sides of the pair join read the tiny signature table
      sig.select(col("doc_id").as("i"), col("h").as("hi"))
        .join(sig.select(col("doc_id").as("j"), col("h").as("hj")), col("i") < col("j"))
        .withColumn("ham", bit_count(col("hi").bitwiseXOR(col("hj"))))
        .filter(col("ham") <= 10)
        .select(col("i"), col("j"), col("ham"))
        .orderBy("i", "j")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents),
           |ti AS (SELECT doc_id, unnest(list_transform(g,
           |  t -> CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT))) t FROM toks),
           |b AS (SELECT doc_id, r.bit, sum(((t >> r.bit) & 1)*2 - 1) bsum
           |  FROM ti, range(0,60) r(bit) GROUP BY 1, 2),
           |sh AS (SELECT doc_id, sum(CASE WHEN bsum > 0 THEN (1::BIGINT << bit) ELSE 0 END) h
           |  FROM b GROUP BY 1)
           |SELECT a.doc_id i, c.doc_id j, bit_count(xor(a.h, c.h)) ham
           |FROM sh a, sh c WHERE a.doc_id < c.doc_id AND bit_count(xor(a.h, c.h)) <= 10
           |ORDER BY i, j""".stripMargin))

  /** Embedding-cosine nearest neighbor per vector (near-dup when sim clears a
    * threshold; emitted unfiltered so the surface is non-degenerate on
    * fixtures without planted vector dups).
    */
  val q28EmbeddingNn = GraftQuery(
    "q28_embedding_nn",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", graft.functions.GraftFunctions.normL2(col("v")))
        .select(col("vec_id"), col("v"), col("nrm"))
      val dot = graft.functions.GraftFunctions.dot(col("a.v"), col("b.v"))
      val sims = e.as("a")
        .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(
          col("a.vec_id").as("vid"), col("b.vec_id").as("cid"),
          (dot / (col("a.nrm") * col("b.nrm"))).as("sim"))
      // argmax via max(struct): partial (map-side) aggregation collapses the
      // N² candidate rows before the shuffle — a window row_number would
      // shuffle+sort all N² rows. Ties break toward the SMALLER cid
      // (negated in the struct), matching ORDER BY sim DESC, cid ASC.
      sims.groupBy(col("vid"))
        .agg(max(struct(col("sim"), (-col("cid")).as("negcid"))).as("best"))
        .select(
          col("vid").as("vec_id"),
          (-col("best.negcid")).as("nn_id"),
          round(col("best.sim"), 5).as("sim"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |p AS (SELECT a.vec_id vid, b.vec_id cid,
           |  list_sum(list_transform(range(1, 65), i -> a.v[i]*b.v[i])) / (a.nrm*b.nrm) sim
           |  FROM e a, e b WHERE a.vec_id <> b.vec_id),
           |r AS (SELECT vid, cid, sim,
           |  row_number() OVER (PARTITION BY vid ORDER BY sim DESC, cid) rn FROM p)
           |SELECT vid AS vec_id, cid AS nn_id, round(sim, 5) AS sim
           |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin))

  /** Near-dup cluster collapsing: transitive closure over the verified
    * MinHash pairs (connected components), survivor = min doc_id per
    * cluster. This is the step that turns pairwise findings into a
    * keep/drop decision — without it a dup chain A~B~C keeps B twice.
    * Oracle: recursive-CTE reachability over the identical pair set.
    */
  /** Shared cluster-collapse tail: labels → sized clusters with survivor
    * election (min doc_id per cluster keeps).
    */
  private def collapseClusters(lbl: DataFrame): DataFrame = {
    val sz = lbl.groupBy(col("lbl").as("c2")).agg(count(lit(1)).as("n_members"))
    lbl.join(sz, col("lbl") === col("c2"))
      .select(
        col("v").as("doc_id"), col("lbl").as("cluster_id"), col("n_members"),
        (col("v") === col("lbl")).cast("int").as("survivor"))
      .orderBy("doc_id")
  }

  val q59DedupClusters = GraftQuery(
    "q59_dedup_clusters",
    (s, dir) => {
      val pairs = minhashPairs(s, dir).select(col("i"), col("j"))
      collapseClusters(connectedComponents(pairs))
    },
    Some(s"""WITH RECURSIVE pairs AS (SELECT i, j FROM (
            |${q25DedupMinhash.oracle.get}) q25),
            |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
            |reach(a, b) AS (
            |  SELECT a, b FROM edges
            |  UNION
            |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a AND e.b <> r.a),
            |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
            |sz AS (SELECT cluster_id, count(*) AS n_members FROM lbl GROUP BY 1)
            |SELECT l.doc_id, l.cluster_id, sz.n_members,
            |  CAST(l.doc_id = l.cluster_id AS INT) AS survivor
            |FROM lbl l JOIN sz USING (cluster_id) ORDER BY l.doc_id""".stripMargin))

  /** The q59 pipeline forced through the O(log n) large-star/small-star
    * path (no union-find shortcut): identical labels, identical oracle —
    * the distributed scale algorithm gets its own oracle gate instead of
    * riding on spec parity alone.
    */
  val q127DedupClustersStar = GraftQuery(
    "q127_dedup_clusters_star",
    (s, dir) => {
      val pairs = minhashPairs(s, dir).select(col("i"), col("j"))
      collapseClusters(connectedComponentsStar(pairs))
    },
    q59DedupClusters.oracle)

  /** Cross-document substring duplication via winnowing (Schleimer et al.
    * 2003, "Winnowing: local algorithms for document fingerprinting" — the
    * MOSS algorithm; the substring-level exact-dedup Lee et al. 2022 applies
    * to LLM training data): hash every 40-char gram, then per window of 8
    * consecutive positions keep only the minimum (ties to the leftmost) —
    * the winnowing guarantee is that any shared span of ≥ w+k-1 = 47 chars
    * still collides on at least one selected fingerprint, while the volume
    * leaving the map side drops ~8×. Selected grams are grouped by their
    * literal text (hash only selects; equality is exact), docs-sharing ≥ 2
    * surface as memorized/duplicated spans.
    *
    * Scale: selection is a pure per-document function computed map-side
    * over an in-row array (no gram row-explosion, no per-doc window
    * shuffle); only the ~1/win winnow-selected fingerprints leave the
    * mapper for the cross-document group — the 1/w shuffle reduction that
    * is the published point of winnowing.
    */
  /** Winnowing selection core: from (doc_id, text) rows, the selected
    * fingerprint positions — every per-window-of-`win` minimum (h, i)
    * over the k-gram hashes. Guarantee: two docs sharing an exact span of
    * ≥ win+k-1 chars share at least one selected gram (specced).
    */
  private[ops] def winnowSelected(docs: DataFrame, k: Int, win: Int): DataFrame = {
    // winnowing selection is a pure per-document function, so it runs
    // entirely map-side inside whole-stage codegen (WinnowPositions: one
    // JVM pass, one md5 per gram position, O(win) window scan): no gram
    // row-explosion, no per-doc window shuffle. Only the ~1/win selected
    // fingerprints ever leave the mapper — the published point of
    // winnowing. The earlier HOF formulation (transform + slice +
    // array_min) computed the same thing but paid an interpreted lambda
    // per gram position.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        explode(graft.functions.GraftFunctions
          .winnowPositions(col("text"), k, win)).as("i"))
      .select(col("doc_id"), col("i"),
        expr(s"substring(text, i, $k)").as("gram"))
  }

  val q135SubstringWinnow = GraftQuery(
    "q135_substring_winnow",
    (s, dir) => {
      // the 40-char gram string never shuffles: the cross-document group key
      // is (xxhash64(gram), 12-nibble md5 prefix) — 20 bytes vs 40+, and the
      // gap widens with k at corpus scale. The joint 112-bit key makes a
      // cross-gram collision (two DISTINCT grams in one group) negligible;
      // WinnowGroupingSpec verifies gram-level group purity against the
      // fixture by carrying the text, and pins that this narrow-key plan
      // equals the group-by-gram plan row for row.
      winnowSelected(Tables.documents(s, dir).select(col("doc_id"), col("text")),
        k = 40, win = 8)
        .select(col("doc_id"), xxhash64(col("gram")).as("h"),
          substring(md5(col("gram")), 1, 12).as("fp"))
        .groupBy("h", "fp")
        .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)
        .select(col("fp"), col("n_docs"), col("n_occ"))
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("fp"))
        .limit(20)
    },
    Some("""WITH g AS (
           |  SELECT doc_id, CAST(i AS INT) AS i, substr(text, CAST(i AS INT), 40) AS gram
           |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 38)) AS i
           |        FROM documents WHERE length(text) >= 40)),
           |h AS (SELECT doc_id, i, gram,
           |  ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h FROM g),
           |sel AS (SELECT DISTINCT doc_id, (m).i AS i, (m).gram AS gram FROM (
           |  SELECT doc_id, min({'h': h, 'i': i, 'gram': gram}) OVER (
           |    PARTITION BY doc_id ORDER BY i
           |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m
           |  FROM h)),
           |dup AS (SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
           |  FROM sel GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
           |SELECT substr(md5(gram), 1, 12) AS fp, n_docs, CAST(n_occ AS BIGINT) AS n_occ
           |FROM dup ORDER BY n_docs DESC, n_occ DESC, fp LIMIT 20""".stripMargin))

  /** Substring-span REMOVAL — the corpus surgery Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better") perform
    * after detection: q135 finds cross-document duplicated spans; this
    * clips them. Every winnow-selected gram occurring in ≥2 docs flags its
    * [i, i+k) char span; per document the flagged spans are merged
    * (classic running-max interval union, one window pass) and cut out,
    * and the query emits per-doc retained-char accounting plus an md5
    * fingerprint of the RECONSTRUCTED retained text — the oracle rebuilds
    * the same text in SQL, so any off-by-one in span math breaks the hash.
    *
    * Scale: detection is q135's map-side winnowing; the dup-gram list is a
    * narrow broadcast-sized frame; interval merge + gap extraction are
    * per-doc window functions (one shuffle by doc_id); reconstruction
    * never leaves the executor.
    */
  val q144SpanRemoval = GraftQuery(
    "q144_span_removal",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val sel = winnowSelected(docs, k = 40, win = 8) // (doc_id, i, gram)
      val dup = sel.groupBy("gram")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select(col("gram"))
      val hits = sel.join(broadcast(dup), "gram")
        .select(col("doc_id"), col("i").as("st"), (col("i") + 40).as("en"))
      // interval union: a span starts a new group iff it begins after the
      // running max end of everything before it
      val w = Window.partitionBy("doc_id").orderBy("st", "en")
      val merged = hits
        .withColumn("pmax",
          max("en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("newgrp",
          when(col("pmax").isNull || col("st") > col("pmax"), 1).otherwise(0))
        .withColumn("grp",
          sum("newgrp").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "grp")
        .agg(min("st").as("st"), max("en").as("en"))
      val stats = merged.groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        sum(col("en") - col("st")).cast("long").as("removed_chars"))
      // retained text = the gaps between merged spans: each span's end opens
      // a gap to the next span's start (head gap starts at 1, tail gap runs
      // to end-of-text), reassembled in position order
      val wg = Window.partitionBy("doc_id").orderBy("st")
      val gaps = merged
        .withColumn("gs", coalesce(lag("en", 1).over(wg), lit(1)))
        .select(col("doc_id"), col("gs"), col("st").as("ge"))
        .unionByName(merged.groupBy("doc_id").agg(max("en").as("gs"))
          .withColumn("ge", lit(null).cast("int")))
      val rec = gaps.join(docs, "doc_id")
        .withColumn("seg",
          expr("substring(text, gs, coalesce(ge - gs, length(text) - gs + 1))"))
        .groupBy("doc_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("gs"), col("seg")))),
            x => x.getField("seg")), "").as("retained"))
      docs.join(stats, Seq("doc_id"), "left")
        .join(rec, Seq("doc_id"), "left")
        .withColumn("len", length(col("text")).cast("long"))
        .select(
          col("doc_id"),
          col("len").as("orig_len"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
          (col("len") - coalesce(col("removed_chars"), lit(0L))).as("retained_chars"),
          substring(md5(coalesce(col("retained"), col("text"))), 1, 12).as("retained_fp"))
        .orderBy("doc_id")
    },
    Some("""WITH g AS (
           |  SELECT doc_id, CAST(i AS INT) AS i, substr(text, CAST(i AS INT), 40) AS gram
           |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 38)) AS i
           |        FROM documents WHERE length(text) >= 40)),
           |hsh AS (SELECT doc_id, i, gram,
           |  ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h FROM g),
           |sel AS (SELECT DISTINCT doc_id, (m).i AS i, (m).gram AS gram FROM (
           |  SELECT doc_id, min({'h': h, 'i': i, 'gram': gram}) OVER (
           |    PARTITION BY doc_id ORDER BY i
           |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m
           |  FROM hsh)),
           |dup AS (SELECT gram FROM sel GROUP BY gram
           |  HAVING count(DISTINCT doc_id) >= 2),
           |hits AS (SELECT s.doc_id, s.i AS st, s.i + 40 AS en
           |  FROM sel s JOIN dup USING (gram)),
           |m1 AS (SELECT doc_id, st, en,
           |  max(en) OVER (PARTITION BY doc_id ORDER BY st, en
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM hits),
           |m2 AS (SELECT doc_id, st, en,
           |  CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS newgrp FROM m1),
           |m3 AS (SELECT doc_id, st, en,
           |  sum(newgrp) OVER (PARTITION BY doc_id ORDER BY st, en
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m2),
           |mspans AS (SELECT doc_id, min(st) AS st, max(en) AS en
           |  FROM m3 GROUP BY doc_id, grp),
           |stats AS (SELECT doc_id, count(*) AS n_spans,
           |  CAST(sum(en - st) AS BIGINT) AS removed_chars FROM mspans GROUP BY doc_id),
           |gaps AS (
           |  SELECT doc_id,
           |    coalesce(lag(en) OVER (PARTITION BY doc_id ORDER BY st), 1) AS gs,
           |    st AS ge
           |  FROM mspans
           |  UNION ALL
           |  SELECT doc_id, max(en) AS gs, NULL AS ge FROM mspans GROUP BY doc_id),
           |rec AS (SELECT gp.doc_id,
           |    string_agg(substr(d.text, CAST(gs AS INT),
           |      CAST(coalesce(ge - gs, length(d.text) - gs + 1) AS INT)), ''
           |      ORDER BY gs) AS retained
           |  FROM gaps gp JOIN documents d USING (doc_id) GROUP BY gp.doc_id)
           |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS orig_len,
           |  coalesce(stats.n_spans, 0) AS n_spans,
           |  coalesce(stats.removed_chars, 0) AS removed_chars,
           |  CAST(length(d.text) AS BIGINT) - coalesce(stats.removed_chars, 0) AS retained_chars,
           |  substr(md5(coalesce(rec.retained, d.text)), 1, 12) AS retained_fp
           |FROM documents d
           |LEFT JOIN stats ON d.doc_id = stats.doc_id
           |LEFT JOIN rec ON d.doc_id = rec.doc_id
           |ORDER BY d.doc_id""".stripMargin))

  /** EXACT Jaccard threshold self-join via prefix filtering (Bayardo et al.
    * 2007 / PPJoin) — the third set-similarity family next to LSH
    * (probabilistic, q25) and bounded all-pairs (q26): order every
    * document's distinct-token set by global rarity (df asc, token), and
    * the prefix-filtering theorem says two sets with J ≥ τ MUST share a
    * token inside their first |x| − ⌈τ·|x|⌉ + 1 tokens — so candidates come
    * from an equi-join on PREFIX tokens only, sizes are pruned by the
    * J ≥ τ ⇒ |big| ≤ |small|/τ bound, and exact verification runs on
    * candidates alone. Unlike LSH this misses NOTHING: the output equals
    * the brute-force join, which is precisely what the oracle computes.
    *
    * Scale: the prefix join keys on rare tokens (df-ascending order makes
    * prefixes the least-frequent tokens), so bucket sizes stay small where
    * a naive token join would explode on stopwords; candidate count ≪ n²
    * (PrefixJoinSpec pins the pruning on the fixture).
    */
  /** Candidate pairs from prefix filtering over rarity-ordered token sets
    * (the pair-generating half of q150, extracted so PrefixJoinSpec can pin
    * the pruning). `sets` is (doc_id, ti: sorted distinct int array).
    */
  private[ops] def prefixCandidates(sets: DataFrame, tau: Double): DataFrame = {
    val d = sets.select(col("doc_id"), explode(col("ti")).as("t"))
    val df = d.groupBy("t").agg(count(lit(1)).as("df"))
    // per-doc canonical order: rarest token first, ties on the token —
    // any global total order satisfies the theorem, this one minimizes
    // prefix-bucket sizes
    val perDoc = d.join(df, "t")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("t")))).as("sorted"))
      .withColumn("sz", size(col("sorted")))
      .withColumn("pl", col("sz") - ceil(col("sz") * tau).cast("int") + 1)
    val prefix = perDoc
      .select(col("doc_id"), col("sz"),
        explode(expr("slice(sorted, 1, pl)")).as("pt"))
      .select(col("doc_id"), col("sz"), col("pt.t").as("t"))
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * lit(1.0 / tau) >= col("b.sz") &&
          col("b.sz") * lit(1.0 / tau) >= col("a.sz"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
  }

  /** q150's document → sorted-distinct-shingle-hash sets (shared with
    * PrefixJoinSpec so the spec exercises the identical representation).
    */
  private[ops] def prefixJoinSets(s: SparkSession, dir: String,
      maxDocId: Int): DataFrame =
    shingleHashed(
      Tables.documents(s, dir).filter(col("doc_id") < maxDocId), 8)
      .select(col("doc_id"), sortedInts(col("tints")).as("ti"))

  val q150PrefixJaccardJoin = GraftQuery(
    "q150_prefix_jaccard_join",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val tau = 0.5
      // sets are word-3-gram shingle hashes (q25's representation — word
      // sets are non-discriminative on a shared vocabulary) at HASHED-INT
      // level throughout (prefix, size pruning, verify, oracle) — one
      // consistent universe, so a hash collision can never desync
      // candidate generation from verification
      val sets = prefixJoinSets(s, dir, 200).persist()
      val cand = prefixCandidates(sets, tau)
      verifyJaccard(cand, sets, tau)
        .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
        .orderBy("i", "j")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents WHERE doc_id < 200),
           |d AS (SELECT doc_id, list_distinct(list_transform(g,
           |  t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))) ti
           |  FROM toks),
           |p AS (SELECT a.doc_id i, b.doc_id j,
           |  len(list_filter(a.ti, e -> list_contains(b.ti, e)))::DOUBLE /
           |  (len(a.ti) + len(b.ti) - len(list_filter(a.ti, e -> list_contains(b.ti, e)))) jac
           |  FROM d a, d b WHERE a.doc_id < b.doc_id
           |    AND len(a.ti) > 0 AND len(b.ti) > 0)
           |SELECT i, j, round(jac, 6) AS jac FROM p WHERE jac >= 0.5
           |ORDER BY i, j""".stripMargin))

  /** Candidate (i, j) pairs for containment C(i→j) = |T_i ∩ T_j| / |T_i|
    * ≥ t. The prefix theorem specializes asymmetrically: only the PROBE
    * side i needs a prefix (its first |T_i| − ⌈t·|T_i|⌉ + 1 tokens in
    * global df-ascending order — an overlap of ⌈t·|T_i|⌉ cannot avoid it),
    * joined against the FULL posting list of every candidate container j;
    * the one size bound is |T_j| ≥ ⌈t·|T_i|⌉ (a container can be
    * arbitrarily larger, never smaller than the required overlap).
    * Extracted so ContainmentJoinSpec can pin pruning + completeness.
    */
  private[ops] def containmentCandidates(sets: DataFrame, t: Double): DataFrame = {
    val d = sets.select(col("doc_id"), explode(col("ti")).as("t"))
    val df = d.groupBy("t").agg(count(lit(1)).as("df"))
    val need = ceil(col("sz") * t).cast("int")
    val perDoc = d.join(df, "t")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("t")))).as("sorted"))
      .withColumn("sz", size(col("sorted")))
      .withColumn("pl", col("sz") - need + 1)
    val probe = perDoc
      .select(col("doc_id").as("i"), col("sz").as("szi"),
        explode(expr("slice(sorted, 1, pl)")).as("pt"))
      .select(col("i"), col("szi"), col("pt.t").as("t"))
    val index = d.join(perDoc.select(col("doc_id"), col("sz").as("szj")), "doc_id")
      .select(col("doc_id").as("j"), col("szj"), col("t"))
    probe.join(index, Seq("t"))
      .filter(col("i") =!= col("j") &&
        col("szj") >= ceil(col("szi") * t).cast("int"))
      .select(col("i"), col("j"))
      .distinct()
  }

  /** EXACT containment (asymmetric Jaccard) join: directional pairs where
    * C(i→j) = |T_i ∩ T_j| / |T_i| ≥ 0.8 over word-3-gram shingle sets —
    * the "document i is mostly embedded in document j" detector that
    * symmetric Jaccard (q150) structurally misses: a short doc quoted
    * whole inside a long one has high containment but low Jaccard, and
    * it's exactly the boilerplate/quotation duplication a training-data
    * pipeline must catch. Same exactness contract as q150: prefix-filtered
    * candidates ([[containmentCandidates]]) + exact verification equals
    * the brute-force join the oracle computes, missing nothing.
    *
    * Scale: the probe side joins only its df-ascending PREFIX tokens
    * (rare by construction) against the full inverted index, so the hot
    * stopword postings are probed only by docs whose prefix genuinely
    * reaches them; the |T_j| ≥ ⌈t·|T_i|⌉ bound prunes small containers
    * before verification, and exact set intersection runs on candidates
    * only (codegen'd merge over sorted int arrays).
    */
  val q173ContainmentJoin = GraftQuery(
    "q173_containment_join",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val t = 0.8
      val sets = prefixJoinSets(s, dir, 200).persist()
      val cand = containmentCandidates(sets, t)
      val inter = graft.functions.GraftFunctions
        .intersectCount(col("ti_i"), col("ti_j")).cast("int")
      cand
        .join(sets.select(col("doc_id").as("i"), col("ti").as("ti_i")), "i")
        .join(sets.select(col("doc_id").as("j"), col("ti").as("ti_j")), "j")
        .withColumn("cont", inter.cast("double") / size(col("ti_i")))
        .filter(col("cont") >= t)
        .select(col("i"), col("j"), round(col("cont"), 6).as("cont"))
        .orderBy("i", "j")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents WHERE doc_id < 200),
           |d AS (SELECT doc_id, list_distinct(list_transform(g,
           |  t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))) ti
           |  FROM toks),
           |p AS (SELECT a.doc_id i, b.doc_id j,
           |  len(list_filter(a.ti, e -> list_contains(b.ti, e)))::DOUBLE / len(a.ti) cont
           |  FROM d a, d b WHERE a.doc_id <> b.doc_id
           |    AND len(a.ti) > 0 AND len(b.ti) > 0)
           |SELECT i, j, round(cont, 6) AS cont FROM p WHERE cont >= 0.8
           |ORDER BY i, j""".stripMargin))

  /** Global rank by (k, doc_id) WITHOUT a single-partition window: rank =
    * row_number within 2-char-prefix buckets (partitioned, parallel — a
    * fixed-length prefix respects the lexicographic order, so bucket order
    * equals global order) + cumulated bucket-count offsets (a bounded
    * ≤ alphabet² row table, broadcast). SnmRankSpec pins equality with the
    * single-partition global row_number. Input: (doc_id, k).
    */
  private[ops] def twoLevelRank(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = docs.withColumn("b", substring(col("k"), 1, 2))
    val offsets = bucketed.groupBy("b").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum("c").over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("b", "off")
    bucketed
      .withColumn("rn0", row_number().over(
        Window.partitionBy("b").orderBy(col("k"), col("doc_id"))))
      .join(broadcast(offsets), "b")
      .select(col("doc_id"), (col("rn0") + col("off")).as("rn"))
  }

  /** Sorted-neighborhood near-dup detection (Hernández & Stolfo's SNM) —
    * the FOURTH candidate-generation family next to LSH banding (q25,
    * probabilistic), prefix filtering (q150, exact), and bounded all-pairs
    * (q26): sort the corpus by a blocking key (first 24 chars of the
    * text), slide a fixed window (w = 6) down the sorted order, and emit
    * only pairs at rank distance < w; exact 3-gram Jaccard (≥ 0.5) then
    * verifies candidates. Candidates are O(n·w) by construction — the
    * cheapest family — at the documented cost of single-pass recall (a
    * near-dup pair whose texts diverge in the first 24 chars lands far
    * apart in the sort; production SNM runs multiple passes with
    * different keys). The oracle replicates the identical window, so
    * both sides agree exactly.
    *
    * Scale: the global rank is TWO-LEVEL — row_number within 2-char-prefix
    * buckets (a partitioned, parallel window; the prefix respects the
    * lexicographic sort so bucket order equals global order) plus
    * cumulated bucket-count offsets (a bounded ≤ alphabet² row table,
    * broadcast) — never a single-partition window over the corpus. Pair
    * generation is an equi-join on (rank + offset), keyed and
    * explode-bounded by w, and verification touches candidates only.
    */
  val q174SortedNeighborhood = GraftQuery(
    "q174_sorted_neighborhood",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val w = 6
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
        .select(col("doc_id"), substring(col("text"), 1, 24).as("k"))
      val ranked = twoLevelRank(docs).persist()
      val cand = ranked.select(col("doc_id").as("i"), col("rn"),
          explode(sequence(lit(1), lit(w - 1))).as("d"))
        .withColumn("rn_j", col("rn") + col("d"))
        .join(ranked.select(col("doc_id").as("j"), col("rn").as("rn_j")), "rn_j")
        .select("i", "j")
      val sets = prefixJoinSets(s, dir, 500).persist()
      verifyJaccard(cand, sets, 0.5)
        .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
        .orderBy("i", "j")
    },
    Some("""WITH r AS MATERIALIZED (
           |  SELECT doc_id, text, row_number() OVER (ORDER BY substr(text,1,24), doc_id) rn
           |  FROM documents WHERE doc_id < 500),
           |cand AS (SELECT a.doc_id i, b.doc_id j, a.text ta, b.text tb
           |  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 5),
           |g AS (SELECT i, j,
           |  list_distinct(list_transform(list_transform(range(1, len(string_split(ta,' '))-1),
           |    x -> string_split(ta,' ')[x]||' '||string_split(ta,' ')[x+1]||' '||string_split(ta,' ')[x+2]),
           |    t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))) ga,
           |  list_distinct(list_transform(list_transform(range(1, len(string_split(tb,' '))-1),
           |    x -> string_split(tb,' ')[x]||' '||string_split(tb,' ')[x+1]||' '||string_split(tb,' ')[x+2]),
           |    t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))) gb
           |  FROM cand),
           |jac AS (SELECT i, j,
           |  len(list_filter(ga, e -> list_contains(gb, e)))::DOUBLE /
           |  (len(ga) + len(gb) - len(list_filter(ga, e -> list_contains(gb, e)))) jc
           |  FROM g WHERE len(ga) > 0 AND len(gb) > 0)
           |SELECT i, j, round(jc, 6) AS jac FROM jac WHERE jc >= 0.5
           |ORDER BY i, j""".stripMargin))

  /** CCNet-style line-level dedup: the corpus is cut into fixed "lines"
    * (the fixture text carries no newlines, so a line is an aligned 12-word
    * chunk — the same role paragraph splits play in CCNet), every line is
    * counted across the corpus, and any line appearing verbatim in ≥ 2
    * distinct documents is removed from ALL of them (boilerplate headers,
    * navigation, license blurbs — content nobody wants twice in a training
    * set). Distinct from q135's winnowing: this is exact match on whole
    * normalized units with corpus-frequency evidence, not fingerprint
    * sampling of arbitrary substrings.
    *
    * Scale: explode → one groupBy on the line text (balanced: line hashes
    * are near-uniform keys), then one keyed equi-join of lines against the
    * duplicated-line set — never broadcast, since at 100 TB the boilerplate
    * set is itself huge. Reconstruction is a per-doc partial-agg
    * collect_list of the surviving lines, fingerprinted so the oracle
    * compares whole reconstructed texts without shipping them.
    */
  val q183LineDedup = GraftQuery(
    "q183_line_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val lines = docs
        .withColumn("ws", split(col("text"), " "))
        .withColumn("line_no",
          explode(sequence(lit(0), (ceil(size(col("ws")) / 12.0) - 1).cast("int"))))
        .select(col("doc_id"), col("line_no"),
          array_join(slice(col("ws"), col("line_no") * 12 + 1, lit(12)), " ").as("line"))
      val dup = lines.groupBy("line")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select(col("line"), lit(1).as("is_dup"))
      val marked = lines.join(dup, Seq("line"), "left")
      val rec = marked.filter(col("is_dup").isNull)
        .groupBy("doc_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            x => x.getField("line")), " ").as("retained"))
      val stats = marked.groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_removed"))
      docs.join(stats, "doc_id")
        .join(rec, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          substring(md5(coalesce(col("retained"), lit(""))), 1, 12).as("retained_fp"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |l AS (SELECT doc_id, CAST(i AS INT) AS line_no,
           |    array_to_string(ws[CAST(i*12+1 AS INT) : CAST(i*12+12 AS INT)], ' ') AS line
           |  FROM (SELECT doc_id, ws,
           |          unnest(range(0, CAST(ceil(len(ws)/12.0) AS BIGINT))) AS i FROM w)),
           |dup AS (SELECT line FROM l GROUP BY line
           |  HAVING count(DISTINCT doc_id) >= 2),
           |m AS (SELECT l.doc_id, l.line_no, l.line,
           |    CASE WHEN dup.line IS NULL THEN 0 ELSE 1 END AS is_dup
           |  FROM l LEFT JOIN dup ON l.line = dup.line),
           |rec AS (SELECT doc_id,
           |    string_agg(line, ' ' ORDER BY line_no) AS retained
           |  FROM m WHERE is_dup = 0 GROUP BY doc_id),
           |st AS (SELECT doc_id, count(*) AS n_lines,
           |    CAST(sum(is_dup) AS BIGINT) AS n_removed FROM m GROUP BY doc_id)
           |SELECT st.doc_id, st.n_lines, st.n_removed,
           |  substr(md5(coalesce(rec.retained, '')), 1, 12) AS retained_fp
           |FROM st LEFT JOIN rec ON st.doc_id = rec.doc_id
           |ORDER BY st.doc_id""".stripMargin))

  /** Golden-record consolidation over the q59 near-dup clusters — the
    * master-data-management step AFTER dedup finds the clusters: each
    * cluster collapses to one merged record whose attributes are resolved
    * by explicit per-attribute rules (lang = most frequent value with a
    * lexicographic tie-break, n_chars = max over members, provenance =
    * distinct source count) rather than blindly keeping the survivor's
    * row — conflict resolution is the part entity resolution actually
    * gets judged on. Cluster labels come from the same MinHash→CC
    * pipeline as q59; the merge itself is one grouped agg plus a per-
    * cluster mode window over (cluster, attribute-value) counts — both
    * cluster-cardinality-sized, nothing corpus-wide reshuffles twice.
    */
  val q209GoldenRecord = GraftQuery(
    "q209_golden_record",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = minhashPairs(s, dir).select(col("i"), col("j"))
      val lbl = connectedComponents(pairs)
      val mem = lbl.join(Tables.documents(s, dir),
        lbl("v") === col("doc_id"))
      val langMode = mem.groupBy(col("lbl"), col("lang"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lbl").orderBy(desc("c"), col("lang"))))
        .filter(col("rn") === 1)
        .select(col("lbl").as("lm"), col("lang").as("lang_mode"))
      mem.groupBy("lbl")
        .agg(count(lit(1)).as("n_members"), max("n_chars").as("max_chars"),
          countDistinct("source").as("n_sources"))
        .join(langMode, col("lbl") === col("lm"))
        .select(col("lbl").as("cluster_id"), col("n_members"),
          col("lang_mode"), col("max_chars"), col("n_sources"))
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE pairs AS (SELECT i, j FROM (
            |${q25DedupMinhash.oracle.get}) q25),
            |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
            |reach(a, b) AS (
            |  SELECT a, b FROM edges
            |  UNION
            |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a AND e.b <> r.a),
            |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
            |mem AS (SELECT l.cluster_id, d.lang, d.source, d.n_chars
            |  FROM lbl l JOIN documents d USING (doc_id)),
            |lc AS (SELECT cluster_id, lang, count(*) c FROM mem GROUP BY 1, 2),
            |lm AS (SELECT cluster_id, lang AS lang_mode FROM (
            |  SELECT cluster_id, lang, row_number() OVER (
            |    PARTITION BY cluster_id ORDER BY c DESC, lang) rn FROM lc)
            |  WHERE rn = 1),
            |agg AS (SELECT cluster_id, CAST(count(*) AS BIGINT) n_members,
            |    CAST(max(n_chars) AS BIGINT) max_chars,
            |    CAST(count(DISTINCT source) AS BIGINT) n_sources
            |  FROM mem GROUP BY 1)
            |SELECT agg.cluster_id, n_members, lm.lang_mode, max_chars, n_sources
            |FROM agg JOIN lm USING (cluster_id) ORDER BY cluster_id""".stripMargin))

  /** Dedup savings report — the cluster-size distribution plus what
    * removal actually buys, the number a dedup run is judged by before
    * anyone inspects pairs: per near-dup cluster size (from the q59
    * MinHash→CC pipeline), how many clusters, how many docs are
    * removable (size − 1 keeps the survivor), and the token mass those
    * removable docs carry. Cluster labels join the corpus once; the
    * histogram is at most max-cluster-size rows.
    */
  val q252DedupSavings = GraftQuery(
    "q252_dedup_savings",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lbl = connectedComponents(
        minhashPairs(s, dir).select(col("i"), col("j")))
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
      val mem = lbl.join(toks, lbl("v") === col("doc_id"))
        .withColumn("is_survivor", (col("v") === col("lbl")).cast("int"))
      val perCluster = mem.groupBy("lbl")
        .agg(count(lit(1)).as("cluster_size"),
          sum(when(col("is_survivor") === 0, col("toks")).otherwise(0L))
            .as("removable_toks"))
      perCluster.groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * (col("cluster_size") - 1)).as("docs_removable"),
          sum("removable_toks").as("tokens_removable"))
        .orderBy("cluster_size")
    },
    Some(s"""WITH RECURSIVE pairs AS (SELECT i, j FROM (
            |${q25DedupMinhash.oracle.get}) q25),
            |edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
            |reach(a, b) AS (
            |  SELECT a, b FROM edges
            |  UNION
            |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a AND e.b <> r.a),
            |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            |  FROM reach GROUP BY a),
            |mem AS (SELECT l.cluster_id, l.doc_id,
            |    CAST(len(string_split(d.text, ' ')) AS BIGINT) toks,
            |    CAST(l.doc_id = l.cluster_id AS INT) surv
            |  FROM lbl l JOIN documents d USING (doc_id)),
            |pc AS (SELECT cluster_id, CAST(count(*) AS BIGINT) cluster_size,
            |    CAST(sum(CASE WHEN surv = 0 THEN toks ELSE 0 END) AS BIGINT)
            |      removable_toks
            |  FROM mem GROUP BY 1)
            |SELECT cluster_size, CAST(count(*) AS BIGINT) n_clusters,
            |  CAST(count(*) * (cluster_size - 1) AS BIGINT) docs_removable,
            |  CAST(sum(removable_toks) AS BIGINT) tokens_removable
            |FROM pc GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    q24DedupExact, q25DedupMinhash, q26DedupNgram, q27DedupSimhash, q28EmbeddingNn,
    q59DedupClusters, q127DedupClustersStar, q135SubstringWinnow, q144SpanRemoval,
    q150PrefixJaccardJoin, q173ContainmentJoin, q174SortedNeighborhood, q183LineDedup,
    q209GoldenRecord, q252DedupSavings)
}
