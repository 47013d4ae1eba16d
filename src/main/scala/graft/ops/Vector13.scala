package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** Round-13 vector-dedup additions: the SRP-banded embedding near-dup
  * (q364) that replaces q141 as SURVEY §2.5's registered scale path for
  * semantic dedup, and the IVF/SRP-bucketed SemDeDup variant (q365) that
  * keeps q141's CC + survivor tail on linear-cost cells.
  *
  * Reference scope note: the reference
  * (pesto93/Clickhouse_data-rebalance) has no vector surface at all — its
  * data path is `sharding_recreation.py:159-160` — so these operators are
  * the training-data-pipeline extension mandated by the build brief,
  * following Charikar 2002 (SimHash / signed random projections) and
  * Abbas et al. 2023 (SemDeDup).
  */
object Vector13 {

  private val DIM = 64
  private val NBITS = 64 // 4 bands x 16 bits

  /** Deterministic signed-random-projection hyperplanes: component d of
    * plane k is +1 when the first 8 md5 nibbles of "srp{k}_{d}" are even,
    * else -1 (the q155 JL-matrix discipline — any engine reproduces it,
    * and the +-1 alphabet keeps every dot product an exact left-fold).
    */
  private[ops] def srpPlanes: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NBITS).map { k =>
      (0 until DIM).map { d =>
        val hex = md.digest(s"srp${k}_$d".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** bit k of the SRP signature: sign of <v, plane_k> (strictly-positive
    * convention on both engines; continuous fixtures never hit 0).
    */
  private def srpBit(v: Column, k: Int): Column =
    when(GraftFunctions.dot(v, typedLit(srpPlanes(k))) > 0, lit(1L))
      .otherwise(lit(0L))

  /** 16-bit band key b (bits 16b .. 16b+15 of the signature). */
  private def bandKey(v: Column, b: Int): Column =
    (0 until 16).map(j => srpBit(v, 16 * b + j) * lit(1L << j))
      .reduce(_ + _)

  /** The natural corpus plus PLANTED near-duplicates: the fixture
    * embeddings have max pairwise cosine 0.51 (no natural near-dups), so
    * every 5th vector gets a derived replica (id + 1,000,000) perturbed by
    * ((vec_id + d) mod 7 - 3) * 1e-4 per dimension — deterministic on both
    * engines (the q310/q320 derived-replica pattern), cosine >= 0.999999
    * to its source, so ground truth is exactly the planted pair set.
    */
  private def plantedCorpus(base: DataFrame): DataFrame = {
    // src_id: a distinct name — with the output alias also `vec_id`,
    // lateral-column-alias resolution would bind the lambda's reference to
    // the SHIFTED id (1000000 % 7 = 1 walks the perturbation cycle),
    // silently diverging from the oracle's source-id perturbation
    val rep = base.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id").as("src_id"), col("v"))
      .select((col("src_id") + lit(1000000L)).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + (pmod(col("src_id") + i.cast("long"), lit(7)) - 3)
            .cast("double") * lit(1e-4)).as("v"))
    base.select("vec_id", "v").unionAll(rep)
  }

  private[ops] val corpusSql =
    """base AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |rep AS (SELECT vec_id + 1000000 AS rid,
      |    list_transform(range(1, 65), i ->
      |      v[i] + ((vec_id + i - 1) % 7 - 3) * CAST(0.0001 AS DOUBLE)) AS rv
      |  FROM base WHERE vec_id % 5 = 0),
      |corpus AS (SELECT vec_id, v FROM base
      |  UNION ALL SELECT rid AS vec_id, rv AS v FROM rep)""".stripMargin

  private[ops] val rlSql =
    """rl AS (
      |  SELECT k.k, list(CASE WHEN ('0x' || substr(md5('srp'||k.k||'_'||d.d), 1, 8))::BIGINT % 2 = 0
      |      THEN 1.0 ELSE -1.0 END ORDER BY d.d) AS wv
      |  FROM range(0, 64) k(k), range(0, 64) d(d) GROUP BY k.k)""".stripMargin

  /** SRP/SimHash-banded embedding near-dup — the q151→q156 banding pattern
    * applied to VECTORS, and the registered scale path for semantic
    * near-dup candidate generation (it replaces q141's exact-Lloyd cells,
    * whose measured f10→f30 exponent of 1.619 and k ∝ n broadcast-literal
    * centroids the round-12 audit demoted; cf. `Vectors.scala` q141
    * scaladoc).
    *
    * Pipeline: 64 deterministic ±1 hyperplanes (CONSTANT plan size — the
    * fix for q141's corpus-proportional literal centroids) → 64-bit SRP
    * signature as 4×16-bit band keys → band equi-join for candidates → by
    * pigeonhole, any two signatures within Hamming 3 agree on a whole band,
    * so recall at ham ≤ 3 is EXACT — which is what the oracle proves: it
    * brute-forces ALL pairs of the bounded fixture and the banded
    * candidate set must equal it. Exact cosine (>= 0.99) verifies the
    * survivors; SRP gives P[bit flip] = angle/π ≈ 8·10⁻⁴ for the planted
    * pairs, so they band together with near-certainty while the natural
    * corpus (max cosine 0.51 → expected Hamming ≈ 21) never produces a
    * candidate.
    *
    * Scale: replica derivation + signatures are map-only against literal
    * planes; the only shuffles are the keyed band join and the candidate
    * distinct — no stage is all-pairs and no plan node grows with the
    * corpus (Round13PlanSpec pins non-cartesian). Band buckets over
    * near-orthogonal embeddings stay tiny; a degenerate all-identical
    * corpus would hot-spot one bucket, which AQE skew-join splits like any
    * keyed join.
    */
  /** The q364 pipeline up to the verified pair set (i, j, ham, cos) —
    * shared with q369's end-to-end dedup composition.
    */
  private[ops] def srpVerifiedPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    GraftFunctions.register(s)
    val base = Tables.embeddings(s, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"))
    val sigs = plantedCorpus(base)
        .select(col("vec_id"), col("v"), GraftFunctions.normL2(col("v")).as("nrm"),
          bandKey(col("v"), 0).as("b0"), bandKey(col("v"), 1).as("b1"),
          bandKey(col("v"), 2).as("b2"), bandKey(col("v"), 3).as("b3"))
        .persist()
      val slim = sigs.select("vec_id", "b0", "b1", "b2", "b3")
      val bands = slim.select(col("vec_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
        .select(col("vec_id"), col("b0"), col("b1"), col("b2"), col("b3"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = bands.select(col("vec_id").as("i"), col("b0").as("x0"),
          col("b1").as("x1"), col("b2").as("x2"), col("b3").as("x3"),
          col("band"), col("key"))
        .join(bands.select(col("vec_id").as("j"), col("b0").as("y0"),
          col("b1").as("y1"), col("b2").as("y2"), col("b3").as("y3"),
          col("band"), col("key")), Seq("band", "key"))
        .filter(col("i") < col("j"))
        .select("i", "j", "x0", "x1", "x2", "x3", "y0", "y1", "y2", "y3")
        .distinct()
      val ham = (0 until 4).map(b =>
        bit_count(col(s"x$b").bitwiseXOR(col(s"y$b")))).reduce(_ + _)
    val vi = sigs.select(col("vec_id").as("i"), col("v").as("va"), col("nrm").as("na"))
    val vj = sigs.select(col("vec_id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    cand.withColumn("ham", ham.cast("long")).filter(col("ham") <= 3)
      .select("i", "j", "ham")
      .join(vi, "i").join(vj, "j")
      .withColumn("cos",
        GraftFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.99)
  }

  val q364SrpBandedNearDup = GraftQuery(
    "q364_srp_banded_neardup",
    (s, dir) =>
      srpVerifiedPairs(s, dir)
        .select(col("i"), col("j"), col("ham"),
          round(col("cos"), 6).as("cos_sim"),
          (col("j") === col("i") + 1000000L).cast("int").as("planted"))
        .orderBy("i", "j"),
    Some(s"""WITH $rlSql,
           |$corpusSql,
           |cn AS (SELECT vec_id, v,
           |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM corpus),
           |bits AS (SELECT c.vec_id, rl.k,
           |    CASE WHEN list_sum(list_transform(range(1, 65), i -> c.v[i]*rl.wv[i])) > 0
           |      THEN 1::BIGINT ELSE 0::BIGINT END AS bit
           |  FROM corpus c, rl),
           |sig AS (SELECT vec_id,
           |    CAST(sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b0,
           |    CAST(sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b1,
           |    CAST(sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b2,
           |    CAST(sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b3
           |  FROM bits GROUP BY vec_id),
           |p AS (SELECT a.vec_id i, b.vec_id j,
           |    bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
           |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS ham
           |  FROM sig a, sig b WHERE a.vec_id < b.vec_id),
           |c AS (SELECT i, j, ham FROM p WHERE ham <= 3),
           |vv AS (SELECT c.i, c.j, CAST(c.ham AS BIGINT) AS ham,
           |    list_sum(list_transform(range(1, 65), q -> av.v[q]*bv.v[q]))
           |      / (av.nrm * bv.nrm) AS cos
           |  FROM c JOIN cn av ON av.vec_id = c.i JOIN cn bv ON bv.vec_id = c.j)
           |SELECT i, j, ham, round(cos, 6) AS cos_sim,
           |  CAST(j = i + 1000000 AS INT) AS planted
           |FROM vv WHERE cos >= 0.99 ORDER BY i, j""".stripMargin))

  /** Exact integer ceil(log2(f)) — must agree with the oracle's
    * `ceil(log2(f::DOUBLE))`, which it does everywhere: at powers of two
    * IEEE log2 is exact, and between them log2(f) sits far (≥ ~1e-6 for
    * any f < 2⁴⁰) from an integer, so the float ceil never straddles.
    */
  private def ceilLog2(f: Long): Int =
    if (f <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(f - 1L)

  /** IVF-assigned SemDeDup — q141's CC + survivor tail on LINEAR-cost
    * cells: a FIXED-k coarse quantizer (q157's IVF coarse stage: lloyd
    * k = 16, one refinement round, probe-1 assignment against 16 literal
    * centroids) sub-bucketed by the first b SRP sign bits, with
    * b = ⌈log₂⌈⌈n/64⌉/16⌉⌉ so the EXPECTED cell size stays ~64 at any
    * corpus size. This is the production answer to q141's two measured
    * scale-killers (f10→f30 exponent 1.619; k ∝ n broadcast-literal
    * centroids): here assignment is n·16 dots against a CONSTANT-size
    * literal array plus b ≤ 40 map-only sign bits — the plan never grows
    * with the corpus, and the within-cell pairwise stays n·64.
    *
    * The trade is SemDeDup's own (Abbas et al. 2023 run k-means cells as
    * an approximation to begin with): hash sub-buckets can split a true
    * near-dup pair across cells where exact Lloyd would not.
    * Round13Spec measures exactly that delta — kept-set overlap vs
    * q141 on the same corpus — instead of assuming it away.
    *
    * Cost SAWTOOTH (measured, round 13): because b is an integer,
    * expected cell size oscillates in (32, 64] — by construction
    * 16·2^b ≥ ⌈n/64⌉ ⇒ n/(16·2^b) ≤ 64, and halves the moment b
    * increments (Round13Spec pins the arithmetic across 10³..10¹²).
    * Between two scale points on the RISING flank the local exponent
    * reads > 1 (measured 1.13 on f10→f30, where cell size climbs 39→59)
    * and < 0.5 on the falling flank (0.355 on f3→f10, 47→39); the
    * asymptote is Θ(n·64·dim) — linear with an oscillating constant,
    * never compounding.
    *
    * Cross-engine: the coarse stage replays q137's unrolled-lloyd oracle
    * discipline at k = 16/rounds = 1; SRP bits reuse q364's md5-parity
    * planes; CC + collapse replay q141's recursive-CTE tail.
    */
  val q365IvfSemDedup = GraftQuery(
    "q365_ivf_semdedup",
    (s, dir) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", GraftFunctions.normL2(col("v")))
        .select(col("vec_id"), col("v"), col("nrm"))
        .persist()
      val n = e.count()
      val b = ceilLog2((math.ceil(n / 64.0).toLong + 15L) / 16L)
      // lloyd reads (vec_id, v) positionally; nrm rides along
      val (_, assigned0) = Vectors.lloyd(e, k = 16, rounds = 1)
      val prefix: Column =
        if (b == 0) lit(0L)
        else (0 until b).map(k => srpBit(col("v"), k) * lit(1L << k)).reduce(_ + _)
      val cells = assigned0
        .select(col("vec_id"), col("v"), col("nrm"),
          (col("j").cast("long") * lit(1L << b) + prefix).as("cell"))
        .persist()
      val pairs = cells.as("a")
        .join(cells.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .filter(GraftFunctions.dot(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")) >= 0.30)
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      Vectors.collapseVecClusters(Dedup.connectedComponents(pairs), cells)
    },
    Some(s"""WITH RECURSIVE $rlSql,
           |e AS (SELECT vec_id, embedding::DOUBLE[] v,
           |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm FROM embeddings),
           |bb AS (SELECT CASE WHEN f <= 1 THEN 0
           |    ELSE CAST(ceil(log2(CAST(f AS DOUBLE))) AS INT) END AS b
           |  FROM (SELECT (((count(*) + 63) // 64) + 15) // 16 AS f FROM e)),
           |c0 AS (SELECT idx, cv FROM (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv FROM e)
           |  WHERE idx < 16),
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
           |pre AS (SELECT e.vec_id,
           |    CAST(coalesce(sum(CASE WHEN rl.k < bb.b
           |      AND list_sum(list_transform(range(1, 65), i -> e.v[i]*rl.wv[i])) > 0
           |      THEN 1::BIGINT << rl.k ELSE 0::BIGINT END), 0) AS BIGINT) AS pre
           |  FROM e, rl, bb GROUP BY e.vec_id),
           |asg AS (SELECT a2.vec_id, a2.v, e.nrm,
           |    CAST(a2.idx AS BIGINT) * (1::BIGINT << bb.b) + pre.pre AS cell
           |  FROM a2 JOIN e USING (vec_id) JOIN pre ON pre.vec_id = a2.vec_id, bb
           |  WHERE a2.rn = 1),
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

  val all: Seq[GraftQuery] = Seq(q364SrpBandedNearDup, q365IvfSemDedup)
}
