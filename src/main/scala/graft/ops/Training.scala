package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}

/** Model-training operators a curation pipeline runs ON the corpus itself:
  * a distributed batch-perceptron quality/language classifier (the
  * linear-filter recipe behind GPT-3-style quality filtering — train a cheap
  * linear model, score every document, keep the top mass), and a
  * randomized-response locally-differentially-private frequency release.
  *
  * Scale discipline shared by both: per-pass driver state is O(d) model
  * weights (d = 5 here) or O(k) category counts — never rows. Each training
  * epoch is ONE corpus scan feeding a partial aggregate (map-side combine,
  * one bounded row per partition), exactly the k-means/q137 loop shape; the
  * weight update happens on the driver against collected d-long sums and is
  * re-broadcast as literals, so nothing grows with data volume.
  *
  * Float discipline: the perceptron is INTEGER-EXACT end to end — integer
  * features, integer weights, integer margins — so results are independent
  * of partitioning/accumulation order and the DuckDB oracle replays the
  * exact same algebra (no rounding anywhere). The DP estimator divides two
  * exact integers once per category (single IEEE op, no accumulation).
  */
object Training {

  /** Feature columns for the perceptron: small exact integers derivable
    * identically in Spark and DuckDB. x0 is the bias; token count, char
    * count, and two lexical substring counts separate `lang = 'en'` docs
    * from the rest well enough to drive weight movement across epochs.
    */
  private def featureFrame(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    // occurrences of `w` in text = (len(text) - len(text with w removed)) / |w|
    def occ(w: String): Column =
      ((length(t) - length(replace(t, lit(w)))) / w.length).cast("long")
    Tables.documents(s, dir).select(
      col("lang"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      size(split(t, " ")).cast("long").as("x1"),
      col("n_chars").cast("long").as("x2"),
      occ("table").as("x3"),
      occ("data").as("x4"))
  }

  /** q279 — distributed batch-perceptron training (3 epochs over the full
    * corpus), the cheap linear classifier a curation pipeline trains to
    * score document quality / language membership before filtering.
    *
    * Batch perceptron: epoch t computes the margin y·(w_{t-1}·x) per row,
    * sums y·x over the misclassified rows (margin ≤ 0) in one partial
    * aggregate, and updates w_t = w_{t-1} + Σ. With w_0 = 0 every epoch-1
    * margin is 0, so epoch 1's update is Σ y·x over ALL rows — which makes
    * the whole 3-epoch trace closed-form replayable as a chained-CTE oracle.
    * All features, margins and weights are exact longs: the result is
    * bit-identical at any parallelism (integer addition commutes), and the
    * overflow headroom is ~2^63 / (n·max|x|²) — at the 100 TB target the
    * margin magnitude is bounded by n·553² ≈ 3·10^15·n_epochs, still 4
    * orders under Long range at n = 10^9 docs.
    *
    * Scale shape: one corpus scan per epoch → partial agg of d+2 long sums
    * → 1 collected row → literal re-broadcast. Driver state is 5 longs.
    * Output: one row per epoch with the misclassified count seen under the
    * incoming weights and the post-update weight vector.
    */
  /** The batch-perceptron training loop: one partial aggregate per epoch
    * over a frame with a ±1 `y` column and long feature columns `xs`;
    * returns (epoch, misclassifiedUnderIncomingWeights, postUpdateWeights)
    * per epoch. Extracted so TrainingSpec can replay it against a
    * sequential fold on planted data.
    */
  private[graft] def trainTrace(f: DataFrame, xs: Seq[String],
      epochs: Int): Seq[(Int, Long, Seq[Long])] = {
    var w = Array.fill(xs.length)(0L)
    (1 to epochs).map { ep =>
      val margin = col("y") * xs.zipWithIndex
        .map { case (x, i) => col(x) * lit(w(i)) }
        .reduce(_ + _)
      val mis = margin <= 0L
      val aggs = sum(when(mis, 1L).otherwise(0L)).as("n_mis") +:
        xs.map(x => sum(when(mis, col("y") * col(x)).otherwise(0L)).as(s"d_$x"))
      val r = f.agg(aggs.head, aggs.tail: _*).head()
      val nMis = r.getLong(0)
      w = w.zipWithIndex.map { case (wi, i) => wi + r.getLong(i + 1) }
      (ep, nMis, w.toSeq)
    }
  }

  val q279PerceptronTrain = GraftQuery(
    "q279_perceptron_train",
    (s, dir) => {
      val f = featureFrame(s, dir).persist()
      val trace = trainTrace(f, Seq("x0", "x1", "x2", "x3", "x4"), epochs = 3)
        .map { case (ep, nMis, w) => Row(ep, nMis, w(0), w(1), w(2), w(3), w(4)) }
      f.unpersist()
      val schema = StructType(
        StructField("epoch", IntegerType, nullable = false) +:
          StructField("n_mis", LongType, nullable = false) +:
          Seq("w_bias", "w_tokens", "w_chars", "w_table", "w_data")
            .map(StructField(_, LongType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(trace, 1), schema)
        .orderBy("epoch")
    },
    // the same 3-epoch trace as chained CTEs: e1 sums over all rows
    // (w0 = 0 ⇒ margin 0 ⇒ everything misclassified), e2/e3 carry the
    // previous epoch's weights through a single-row cross join
    Some("""WITH f AS (
           |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
           |    CAST(1 AS BIGINT) AS x0,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
           |    CAST(n_chars AS BIGINT) AS x2,
           |    CAST((length(text) - length(replace(text, 'table', ''))) // 5 AS BIGINT) AS x3,
           |    CAST((length(text) - length(replace(text, 'data', ''))) // 4 AS BIGINT) AS x4
           |  FROM documents),
           |e1 AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_mis,
           |    CAST(sum(y*x0) AS BIGINT) AS w0, CAST(sum(y*x1) AS BIGINT) AS w1,
           |    CAST(sum(y*x2) AS BIGINT) AS w2, CAST(sum(y*x3) AS BIGINT) AS w3,
           |    CAST(sum(y*x4) AS BIGINT) AS w4
           |  FROM f),
           |e2 AS (
           |  SELECT
           |    CAST(sum(CASE WHEN m <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mis,
           |    CAST(w0 + sum(CASE WHEN m <= 0 THEN y*x0 ELSE 0 END) AS BIGINT) AS w0,
           |    CAST(w1 + sum(CASE WHEN m <= 0 THEN y*x1 ELSE 0 END) AS BIGINT) AS w1,
           |    CAST(w2 + sum(CASE WHEN m <= 0 THEN y*x2 ELSE 0 END) AS BIGINT) AS w2,
           |    CAST(w3 + sum(CASE WHEN m <= 0 THEN y*x3 ELSE 0 END) AS BIGINT) AS w3,
           |    CAST(w4 + sum(CASE WHEN m <= 0 THEN y*x4 ELSE 0 END) AS BIGINT) AS w4
           |  FROM (SELECT f.*, e1.w0, e1.w1, e1.w2, e1.w3, e1.w4,
           |          y*(e1.w0*x0 + e1.w1*x1 + e1.w2*x2 + e1.w3*x3 + e1.w4*x4) AS m
           |        FROM f CROSS JOIN e1)
           |  GROUP BY w0, w1, w2, w3, w4),
           |e3 AS (
           |  SELECT
           |    CAST(sum(CASE WHEN m <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mis,
           |    CAST(w0 + sum(CASE WHEN m <= 0 THEN y*x0 ELSE 0 END) AS BIGINT) AS w0,
           |    CAST(w1 + sum(CASE WHEN m <= 0 THEN y*x1 ELSE 0 END) AS BIGINT) AS w1,
           |    CAST(w2 + sum(CASE WHEN m <= 0 THEN y*x2 ELSE 0 END) AS BIGINT) AS w2,
           |    CAST(w3 + sum(CASE WHEN m <= 0 THEN y*x3 ELSE 0 END) AS BIGINT) AS w3,
           |    CAST(w4 + sum(CASE WHEN m <= 0 THEN y*x4 ELSE 0 END) AS BIGINT) AS w4
           |  FROM (SELECT f.*, e2.w0, e2.w1, e2.w2, e2.w3, e2.w4,
           |          y*(e2.w0*x0 + e2.w1*x1 + e2.w2*x2 + e2.w3*x3 + e2.w4*x4) AS m
           |        FROM f CROSS JOIN e2)
           |  GROUP BY w0, w1, w2, w3, w4)
           |SELECT 1 AS epoch, n_mis, w0 AS w_bias, w1 AS w_tokens,
           |  w2 AS w_chars, w3 AS w_table, w4 AS w_data FROM e1
           |UNION ALL
           |SELECT 2, n_mis, w0, w1, w2, w3, w4 FROM e2
           |UNION ALL
           |SELECT 3, n_mis, w0, w1, w2, w3, w4 FROM e3
           |ORDER BY epoch""".stripMargin))

  /** q281 — randomized-response frequency release (local differential
    * privacy): every document reports its language truthfully with
    * probability 3/4, or a uniform draw from the k = 5 known categories
    * otherwise (generalized randomized response, Warner 1965 / RAPPOR's
    * core). The aggregator sees only the noisy reports and debiases:
    * π̂_c = (n̂_c/n − (1−p)/k) / p. Per-mechanism ε = ln(p·k/(1−p) + 1)
    * = ln 16 ≈ 2.7726 — reported as a constant column.
    *
    * The "coin" is a deterministic Knuth multiplicative hash of doc_id so
    * the oracle replays the mechanism exactly in integer arithmetic: h =
    * ((doc_id mod 2^31−1) · 2654435761) mod 2^32; keep when h mod 4 ≠ 0, else report
    * category (h div 4) mod 5. Scale shape: one scan → k-row partial agg
    * for the noisy counts, one scan → k-row agg for the true counts (shown
    * for utility-loss audit only — a real release drops that branch), a
    * broadcast k×k join, and a single-row total carried by cross join.
    * The estimator divides exact integers once per category — no float
    * accumulation anywhere.
    */
  val q281RandomizedResponse = GraftQuery(
    "q281_randomized_response",
    (s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val docs = Tables.documents(s, dir).select("doc_id", "lang")
      // reduce the id below 2^31 BEFORE the Knuth multiply so the product
      // stays under 2^63 at any id range (int64 overflow wraps silently
      // here but errors in overflow-checked engines)
      val h = (col("doc_id") % 2147483647L * lit(2654435761L)) % lit(4294967296L)
      val idx = floor(h / 4L).cast("long") % 5L
      val reported = when(h % 4L =!= 0L, col("lang"))
        .otherwise(element_at(array(langs.map(lit): _*), (idx + 1L).cast("int")))
      val noisy = docs.select(reported.as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("n_reported"))
      val truth = docs.groupBy("lang").agg(count(lit(1)).as("n_true"))
      // n derives from the k-row truth frame — no third corpus scan
      val total = truth.agg(sum("n_true").as("n"))
      // LEFT join + coalesce: a category that happens to receive zero noisy
      // reports must still get a (debiased, negative-leaning) estimate — an
      // inner join would silently drop it from the release
      truth.join(noisy, Seq("lang"), "left").crossJoin(total)
        .select(
          col("lang"), col("n_true"),
          coalesce(col("n_reported"), lit(0L)).as("n_reported"),
          round((coalesce(col("n_reported"), lit(0L)) - col("n") / 20.0) / 0.75, 2)
            .as("est_count"),
          lit(2.7726).as("epsilon"))
        .orderBy("lang")
    },
    Some("""WITH r AS (
           |  SELECT lang,
           |    (doc_id % 2147483647 * 2654435761) % 4294967296 AS h
           |  FROM documents),
           |rep AS (
           |  SELECT CASE WHEN h % 4 <> 0 THEN lang
           |    ELSE list_extract(['de','en','es','fr','zh'],
           |                      CAST((h // 4) % 5 AS INT) + 1) END AS lang
           |  FROM r),
           |c AS (SELECT lang, count(*) AS n_reported FROM rep GROUP BY 1),
           |t AS (SELECT lang, count(*) AS n_true FROM documents GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM documents)
           |SELECT t.lang, n_true,
           |  coalesce(n_reported, 0) AS n_reported,
           |  round((coalesce(n_reported, 0) - n.n / 20.0) / 0.75, 2) AS est_count,
           |  CAST(2.7726 AS DOUBLE) AS epsilon
           |FROM t LEFT JOIN c USING (lang) CROSS JOIN n
           |ORDER BY lang""".stripMargin))

  /** The Bradley-Terry MM iteration (Hunter 2004): given symmetric game
    * counts n(i,j), win totals W(i), and current ratings w, one step is
    * w'_i = W_i / Σ_j n_ij/(w_i + w_j), then normalize to mean 1.
    * Deterministic iteration order (players ascending) so the trace is
    * exactly replayable; extracted for TrainingSpec.
    */
  private[graft] def bradleyTerry(games: Map[(Int, Int), Long],
      wins: Map[Int, Long], iters: Int): Map[Int, Double] = {
    val players = games.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    var w = players.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val u = players.map { i =>
        val denom = players.filter(j => games.contains((i, j)))
          .map(j => games((i, j)).toDouble / (w(i) + w(j))).sum
        i -> wins.getOrElse(i, 0L).toDouble / denom
      }.toMap
      val s = players.map(u).sum
      w = players.map(i => i -> u(i) * players.size / s).toMap
    }
    w
  }

  /** q283 — Bradley-Terry preference ranking: fit per-player skill from
    * pairwise win/loss outcomes, the model behind preference-data curation
    * (RLHF preference fits, LLM-arena leaderboards, annotator calibration).
    * Battles are synthesized deterministically from lineitem: within each
    * order, the line-1 and line-2 suppliers (mod 10 → 10 players) compete
    * and the higher extended price wins (ties to the lower player id).
    *
    * Scale shape: the UNBOUNDED part — extracting and aggregating battles —
    * is one keyed self-join on the order key (per-order fan-out = the
    * line-1 × line-2 duplicate product, bounded by the per-order line
    * count — (orderkey, linenumber) is NOT unique in this fixture) plus
    * a partial aggregate down to ≤ k² pair counts. The MM iteration then
    * runs on that bounded k×k table (k = 10 here; the centroid-collect
    * discipline — driver state never grows with data). Three iterations,
    * ratings normalized to mean 1, rounded at 4 only at the output edge:
    * pair counts are exact integers, so the only float divergence vs the
    * oracle's unrolled-CTE replay is summation order at ~1e-15.
    */
  val q283BradleyTerry = GraftQuery(
    "q283_bradley_terry",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          (col("l_suppkey") % 10).cast("int").as("p"), col("l_extendedprice").as("v"))
      val a = li.filter(col("ln") === 1).select(col("ok"), col("p").as("pa"), col("v").as("va"))
      val b = li.filter(col("ln") === 2).select(col("ok"), col("p").as("pb"), col("v").as("vb"))
      val battles = a.join(b, "ok").filter(col("pa") =!= col("pb"))
        .select(
          when(col("va") > col("vb"), col("pa"))
            .when(col("vb") > col("va"), col("pb"))
            .otherwise(least(col("pa"), col("pb"))).as("winner"),
          when(col("va") > col("vb"), col("pb"))
            .when(col("vb") > col("va"), col("pa"))
            .otherwise(greatest(col("pa"), col("pb"))).as("loser"))
      val pairRows = battles.groupBy("winner", "loser")
        .agg(count(lit(1)).as("c")).collect() // bounded ≤ k·(k−1) rows
      val winPairs = pairRows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val games = winPairs.foldLeft(Map.empty[(Int, Int), Long]) {
        case (m, ((i, j), c)) =>
          m.updated((i, j), m.getOrElse((i, j), 0L) + c)
            .updated((j, i), m.getOrElse((j, i), 0L) + c)
      }
      val wins = winPairs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val rating = bradleyTerry(games, wins, iters = 3)
      val players = rating.keys.toSeq.sorted
      val out = players.map { i =>
        val g = games.collect { case ((a2, _), c) if a2 == i => c }.sum
        // guard-digit rounding: round at 6 first, THEN at 4 — the two
        // engines' ~1e-15 accumulation-order divergence is absorbed at the
        // guard digit, so a rating near a .xxxx5 boundary can't flip the
        // final rounding between them
        Row(i, g, wins.getOrElse(i, 0L),
          BigDecimal(rating(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val schema = StructType(Seq(
        StructField("player", IntegerType, nullable = false),
        StructField("games", LongType, nullable = false),
        StructField("wins", LongType, nullable = false),
        StructField("rating", DoubleType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("player")
    },
    Some("""WITH la AS (SELECT l_orderkey AS ok, CAST(l_suppkey % 10 AS INT) AS p,
           |    l_extendedprice AS v FROM lineitem WHERE l_linenumber = 1),
           |lb AS (SELECT l_orderkey AS ok, CAST(l_suppkey % 10 AS INT) AS p,
           |    l_extendedprice AS v FROM lineitem WHERE l_linenumber = 2),
           |b AS (SELECT
           |    CASE WHEN la.v > lb.v THEN la.p WHEN lb.v > la.v THEN lb.p
           |      ELSE least(la.p, lb.p) END AS winner,
           |    CASE WHEN la.v > lb.v THEN lb.p WHEN lb.v > la.v THEN la.p
           |      ELSE greatest(la.p, lb.p) END AS loser
           |  FROM la JOIN lb USING (ok) WHERE la.p <> lb.p),
           |pairs AS (SELECT winner, loser, count(*) AS c FROM b GROUP BY 1, 2),
           |n AS (SELECT i, j, CAST(sum(c) AS BIGINT) AS g FROM (
           |    SELECT winner AS i, loser AS j, c FROM pairs
           |    UNION ALL SELECT loser, winner, c FROM pairs) GROUP BY 1, 2),
           |w AS (SELECT winner AS i, CAST(sum(c) AS BIGINT) AS wi
           |  FROM pairs GROUP BY 1),
           |players AS (SELECT DISTINCT i FROM n),
           |k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM players),
           |r0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS r FROM players),
           |u1 AS (SELECT n.i,
           |    coalesce(w.wi, 0) / sum(n.g / (ri.r + rj.r)) AS r
           |  FROM n JOIN r0 ri ON n.i = ri.i JOIN r0 rj ON n.j = rj.i
           |  LEFT JOIN w ON w.i = n.i GROUP BY n.i, w.wi),
           |r1 AS (SELECT i, r * (SELECT k FROM k) / (SELECT sum(r) FROM u1) AS r FROM u1),
           |u2 AS (SELECT n.i,
           |    coalesce(w.wi, 0) / sum(n.g / (ri.r + rj.r)) AS r
           |  FROM n JOIN r1 ri ON n.i = ri.i JOIN r1 rj ON n.j = rj.i
           |  LEFT JOIN w ON w.i = n.i GROUP BY n.i, w.wi),
           |r2 AS (SELECT i, r * (SELECT k FROM k) / (SELECT sum(r) FROM u2) AS r FROM u2),
           |u3 AS (SELECT n.i,
           |    coalesce(w.wi, 0) / sum(n.g / (ri.r + rj.r)) AS r
           |  FROM n JOIN r2 ri ON n.i = ri.i JOIN r2 rj ON n.j = rj.i
           |  LEFT JOIN w ON w.i = n.i GROUP BY n.i, w.wi),
           |r3 AS (SELECT i, r * (SELECT k FROM k) / (SELECT sum(r) FROM u3) AS r FROM u3)
           |SELECT players.i AS player,
           |  (SELECT CAST(sum(g) AS BIGINT) FROM n WHERE n.i = players.i) AS games,
           |  coalesce(w.wi, 0) AS wins,
           |  round(round(r3.r, 6), 4) AS rating
           |FROM players LEFT JOIN w ON w.i = players.i
           |JOIN r3 ON r3.i = players.i
           |ORDER BY player""".stripMargin))

  /** q288 — excess-loss domain reweighting (the DoReMi recipe, Xie et al.
    * 2023, reduced to its one-shot core): upweight the data domains the
    * reference model finds HARDEST, so the training mixture spends more of
    * its budget where loss is highest. Per-source loss is the corpus's own
    * unigram-LM mean NLL (the q60 pipeline — per-doc average, then the
    * per-source average rounded at 3, the proven two-level float
    * discipline); the reweighting is then pure bounded-state math on k =
    * |sources| rows: wᵢ ∝ baseᵢ · exp(η·(lossᵢ − min loss)), normalized.
    * q129 consumes fixed mixture weights; this is where those weights come
    * FROM.
    *
    * Scale shape: one explode + partial agg for the vocab, one vocab join
    * + two-level aggregate for per-source loss (exactly q60's plan), then
    * a k-row collect and driver-side weight math (centroid discipline —
    * state never grows with data). Float boundary: losses are ROUNDED at
    * 3 before entering the exp, so the iteration consumes identical
    * doubles in both engines; the final normalization sums k≈20 doubles
    * (order-diff ~1e-16) and rounds at 6.
    */
  /** Per-source unigram-LM mean NLL (the q60 pipeline): one explode +
    * partial agg for the vocab, one vocab join + two-level aggregate, then
    * a k-row collect. Shared by q288 (one-shot reweighting) and q290 (the
    * iterated minimax loop). Losses are ROUNDED at 3 here so every
    * downstream iteration consumes identical doubles in both engines.
    */
  private[graft] def sourceLosses(s: SparkSession, dir: String)
      : Array[(String, Long, Double)] = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("t"))
      .persist()
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c")).first().getLong(0).toDouble
    val perSrc = tok.join(vocab, "t")
      .withColumn("nl", -log(col("c").cast("double") / lit(total)))
      .groupBy("doc_id", "source").agg(avg("nl").as("nll"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), round(avg("nll"), 3).as("loss"))
      .collect() // bounded: one row per source
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    tok.unpersist()
    perSrc
  }

  val q288DoremiWeights = GraftQuery(
    "q288_doremi_weights",
    (s, dir) => {
      val perSrc = sourceLosses(s, dir)
      val nDocs = perSrc.map(_._2).sum.toDouble
      val minLoss = perSrc.map(_._3).min
      val nums = perSrc.map { case (src, n, loss) =>
        (src, n, loss, n / nDocs, n / nDocs * math.exp(loss - minLoss))
      }
      val z = nums.map(_._5).sum
      val rows = nums.map { case (src, n, loss, base, num) =>
        Row(src, n, loss,
          BigDecimal(base).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(num / z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val schema = StructType(Seq(
        StructField("source", StringType, nullable = false),
        StructField("n_docs", LongType, nullable = false),
        StructField("loss", DoubleType, nullable = false),
        StructField("base_share", DoubleType, nullable = false),
        StructField("weight", DoubleType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("source")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, source, unnest(string_split(text, ' ')) t
           |  FROM documents),
           |vocab AS (SELECT t, count(*) c FROM tok GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS DOUBLE) s FROM vocab),
           |perdoc AS (
           |  SELECT doc_id, source, avg(-ln(c::DOUBLE / s)) nll
           |  FROM tok JOIN vocab USING (t), tot GROUP BY 1, 2),
           |src AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
           |    round(avg(nll), 3) loss
           |  FROM perdoc GROUP BY 1),
           |nd AS (SELECT CAST(sum(n_docs) AS DOUBLE) nd FROM src),
           |ml AS (SELECT min(loss) ml FROM src),
           |num AS (SELECT source, n_docs, loss,
           |    n_docs / nd.nd AS base,
           |    n_docs / nd.nd * exp(loss - ml.ml) AS num
           |  FROM src, nd, ml),
           |z AS (SELECT sum(num) z FROM num)
           |SELECT source, n_docs, loss, round(base, 6) AS base_share,
           |  round(num / z.z, 6) AS weight
           |FROM num, z ORDER BY source""".stripMargin))

  /** Guard-digit round: round at `sc`+3 first, then at `sc` — absorbs the
    * two engines' ~1e-15 accumulation-order divergence at the guard digits
    * so a value near a half-up boundary can't flip between them. The SQL
    * replay is `round(round(x, sc+3), sc)`.
    */
  private def gr(x: Double, sc: Int): Double =
    BigDecimal(x).setScale(sc + 3, BigDecimal.RoundingMode.HALF_UP)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The iterated DoReMi / Group-DRO multiplicative-weights loop over a
    * FIXED per-domain loss vector: each round re-evaluates every domain's
    * excess over the CURRENT mixture's average loss and upweights
    * multiplicatively — αₜᵢ ∝ αₜ₋₁ᵢ · exp(max(0, Lᵢ − Σⱼ αₜ₋₁ⱼLⱼ)) — so the
    * mixture chases the hardest domains and converges onto the max-loss
    * support (the minimax equilibrium for fixed losses). Weights re-quantize
    * at 6 decimals each round so both engines iterate identical doubles.
    * Returns per round: (mixture loss, per-domain excess, post-update
    * weights). Extracted for TrainingSpec's convergence/monotonicity pins.
    */
  private[graft] def doremiIterate(base: Seq[Double], losses: Seq[Double],
      rounds: Int): Seq[(Double, Seq[Double], Seq[Double])] = {
    var a = base.map(gr(_, 6))
    (1 to rounds).map { _ =>
      val m = gr(a.lazyZip(losses).map(_ * _).sum, 3)
      val ex = losses.map(l => math.max(0.0, l - m))
      val raw = a.lazyZip(ex).map((ai, e) => ai * math.exp(e))
      val z = raw.sum
      a = raw.map(x => gr(x / z, 6))
      (m, ex, a)
    }
  }

  /** q290 — ITERATED DoReMi domain reweighting: the multi-round minimax
    * loop the published method runs (q288 ships the one-shot step). Per-
    * source losses come from the shared `sourceLosses` pipeline (unigram-LM
    * mean NLL, rounded at 3); the iteration is then pure bounded-state math
    * on k = |sources| rows — THREE rounds of excess-over-mixture
    * multiplicative updates, the trace emitted per (step, source) so the
    * oracle can replay every round as unrolled CTEs (the q283 discipline).
    *
    * Scale shape: identical to q288 — the corpus-scan part is one explode +
    * two-level aggregate; all iteration state is k rows on the driver.
    * Float boundary: losses exact at 3 decimals; each round's mixture loss
    * re-quantizes at 3 and weights at 6 (guard-digit rounding both sides),
    * so the exp inputs are identical doubles in both engines.
    */
  val q290DoremiIterated = GraftQuery(
    "q290_doremi_iterated",
    (s, dir) => {
      val perSrc = sourceLosses(s, dir)
      val nd = perSrc.map(_._2).sum.toDouble
      val losses = perSrc.map(_._3).toSeq
      val base = perSrc.map(_._2 / nd).toSeq
      val trace = doremiIterate(base, losses, rounds = 3)
      val rows = trace.zipWithIndex.flatMap { case ((m, ex, w), t) =>
        perSrc.indices.map { i =>
          Row(t + 1, perSrc(i)._1, losses(i), m, gr(ex(i), 6), w(i))
        }
      }
      val schema = StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("source", StringType, nullable = false),
        StructField("loss", DoubleType, nullable = false),
        StructField("mix_loss", DoubleType, nullable = false),
        StructField("excess", DoubleType, nullable = false),
        StructField("weight", DoubleType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("step", "source")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, source, unnest(string_split(text, ' ')) t
           |  FROM documents),
           |vocab AS (SELECT t, count(*) c FROM tok GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS DOUBLE) s FROM vocab),
           |perdoc AS (
           |  SELECT doc_id, source, avg(-ln(c::DOUBLE / s)) nll
           |  FROM tok JOIN vocab USING (t), tot GROUP BY 1, 2),
           |src AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
           |    round(avg(nll), 3) loss
           |  FROM perdoc GROUP BY 1),
           |nd AS (SELECT CAST(sum(n_docs) AS DOUBLE) nd FROM src),
           |a0 AS (SELECT source, loss,
           |    round(round(n_docs / nd.nd, 9), 6) a FROM src, nd),
           |m1 AS (SELECT round(round(sum(a * loss), 6), 3) m FROM a0),
           |e1 AS (SELECT source, loss, a,
           |    greatest(CAST(0 AS DOUBLE), loss - m1.m) ex FROM a0, m1),
           |z1 AS (SELECT sum(a * exp(ex)) z FROM e1),
           |a1 AS (SELECT source, loss, ex,
           |    round(round(a * exp(ex) / z1.z, 9), 6) a FROM e1, z1),
           |m2 AS (SELECT round(round(sum(a * loss), 6), 3) m FROM a1),
           |e2 AS (SELECT source, loss, a,
           |    greatest(CAST(0 AS DOUBLE), loss - m2.m) ex FROM a1, m2),
           |z2 AS (SELECT sum(a * exp(ex)) z FROM e2),
           |a2 AS (SELECT source, loss, ex,
           |    round(round(a * exp(ex) / z2.z, 9), 6) a FROM e2, z2),
           |m3 AS (SELECT round(round(sum(a * loss), 6), 3) m FROM a2),
           |e3 AS (SELECT source, loss, a,
           |    greatest(CAST(0 AS DOUBLE), loss - m3.m) ex FROM a2, m3),
           |z3 AS (SELECT sum(a * exp(ex)) z FROM e3),
           |a3 AS (SELECT source, loss, ex,
           |    round(round(a * exp(ex) / z3.z, 9), 6) a FROM e3, z3)
           |SELECT 1 AS step, a1.source, a1.loss, m1.m AS mix_loss,
           |  round(round(a1.ex, 9), 6) AS excess, a1.a AS weight
           |FROM a1, m1
           |UNION ALL
           |SELECT 2, a2.source, a2.loss, m2.m,
           |  round(round(a2.ex, 9), 6), a2.a FROM a2, m2
           |UNION ALL
           |SELECT 3, a3.source, a3.loss, m3.m,
           |  round(round(a3.ex, 9), 6), a3.a FROM a3, m3
           |ORDER BY step, source""".stripMargin))

  /** q301 — differentially private median via the exponential mechanism
    * (McSherry–Talwar), the order-statistic release next to q281's
    * categorical k-RR: candidate outputs are the 50 integer quantity
    * values, utility u(v) = −|2·rank_≤(v) − n| (integer, sensitivity-2
    * scaled), and the draw is the GUMBEL-MAX form — argmax over v of
    * u·ε/4 − ln(−ln(U_v)) — which IS the exponential mechanism, but in
    * log space where the inverse-CDF weights exp(u·ε/4) would all
    * underflow to zero once rank errors reach the hundreds. The
    * per-candidate uniform U_v is derandomized via the q281 Knuth-hash
    * coin on (group, v) so the oracle replays the mechanism exactly.
    *
    * Float discipline: utilities and ranks are exact integers from one
    * partial-agg pass; each score is a single float expression rounded at
    * 9 digits before the per-group argmax window (≤50 bounded rows,
    * never global), so a 1-ulp libm divergence in ln cannot reorder
    * generically separated scores — the accepted q283 risk class. Scale
    * shape: one scan → ≤(groups·50)-row value histogram; everything
    * after is bounded-frame algebra.
    */
  val q301DpQuantile = GraftQuery(
    "q301_dp_quantile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byFlag = Window.partitionBy("flag").orderBy("v")
      val whole = Window.partitionBy("flag")
      val cum = byFlag.rowsBetween(Window.unboundedPreceding, 0)
      val w = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("v"))
        .groupBy("flag", "v").agg(count(lit(1)).as("c"))
        .withColumn("cumc", sum("c").over(cum))
        .withColumn("n", sum("c").over(whole))
        .withColumn("u", -abs(lit(2) * col("cumc") - col("n")))
        // Gumbel-max form of the exponential mechanism: log-space scores
        // never underflow (inverse-CDF weights exp(u·ε/4) all round to 0
        // once rank errors reach the hundreds); the per-candidate Gumbel
        // is derandomized from the q281 Knuth-hash coin for oracle replay
        .withColumn("u01",
          (((ascii(col("flag")) * 53 + col("v")) % 2147483647L *
            lit(2654435761L)) % lit(4294967296L) + lit(1L)) /
            lit(4294967297.0))
        .withColumn("score",
          round(col("u").cast("double") / lit(4.0) -
            log(-log(col("u01"))), 9))
      val rn = org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("flag").orderBy(col("score").desc, col("v")))
      val dp = w.withColumn("rn", rn).filter(col("rn") === 1)
        .select(col("flag"), col("v").as("dp_median"))
      val truem = w.filter(lit(2) * col("cumc") >= col("n"))
        .groupBy("flag").agg(min("v").as("true_median"), max("n").as("n"))
      val errs = w.select(col("flag").as("eflag"), col("v").as("ev"),
        (-col("u")).as("dp_rank_err"))
      truem.join(dp, "flag")
        .join(errs,
          col("flag") === col("eflag") && col("dp_median") === col("ev"))
        .select(col("flag"), col("n"), col("true_median"),
          col("dp_median"), col("dp_rank_err"))
        .orderBy("flag")
    },
    Some("""WITH h AS (
           |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
           |    count(*) AS c
           |  FROM lineitem GROUP BY 1, 2),
           |w AS MATERIALIZED (
           |  SELECT flag, v, c,
           |    sum(c) OVER (PARTITION BY flag ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           |    sum(c) OVER (PARTITION BY flag) AS n
           |  FROM h),
           |w2 AS MATERIALIZED (
           |  SELECT flag, v, cumc, n, -abs(2 * cumc - n) AS u,
           |    ((((ascii(flag) * 53 + v) % 2147483647) * 2654435761)
           |      % 4294967296 + 1) / 4294967297.0 AS u01
           |  FROM w),
           |w3 AS MATERIALIZED (
           |  SELECT flag, v, u, cumc, n,
           |    round(CAST(u AS DOUBLE) / 4.0 - ln(-ln(u01)), 9) AS score
           |  FROM w2),
           |dp AS (
           |  SELECT flag, v AS dp_median FROM (
           |    SELECT flag, v, row_number() OVER (PARTITION BY flag
           |      ORDER BY score DESC, v) AS rn
           |    FROM w3) WHERE rn = 1),
           |tm AS (
           |  SELECT flag, min(v) AS true_median, max(n) AS n FROM w3
           |  WHERE 2 * cumc >= n GROUP BY 1)
           |SELECT tm.flag, CAST(tm.n AS BIGINT) AS n, tm.true_median, dp.dp_median,
           |  CAST(-w3.u AS BIGINT) AS dp_rank_err
           |FROM tm JOIN dp USING (flag)
           |JOIN w3 ON w3.flag = tm.flag AND w3.v = dp.dp_median
           |ORDER BY tm.flag""".stripMargin))

  /** q306 — margin-based data pruning (the difficulty-score curation of
    * Sorscher et al. 2022, "Beyond neural scaling laws"): score every
    * document by its signed margin under the q279 perceptron's final
    * integer weights, take each language's EXACT median margin as the
    * difficulty threshold, and keep the harder half (margin ≤ median —
    * hard/ambiguous examples carry the training signal at scale).
    *
    * Integer-exact scoring (features, weights, margins all longs), with
    * the per-language median computed by
    * [[ScaleFrames.groupedQuantileWideDomain]] — the two-level-cumsum
    * machinery, bit-identical to `quantile_cont`, so the threshold
    * compare is exact on both engines (medians of integer margins are
    * k or k+0.5 exactly). Scale shape: the q279 training loop (one
    * partial agg per epoch, 5-long driver state), one scoring scan, the
    * distributed grouped-median (no per-language window funnel — the
    * q205/q199 defect class), one bounded rollup.
    */
  val q306MarginPruning = GraftQuery(
    "q306_margin_pruning",
    (s, dir) => {
      val f = featureFrame(s, dir).persist()
      val w = trainTrace(f, Seq("x0", "x1", "x2", "x3", "x4"), epochs = 3)
        .last._3
      val scored = f.withColumn("m",
        col("y") * (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
          lit(w(2)) * col("x2") + lit(w(3)) * col("x3") +
          lit(w(4)) * col("x4")))
      val med = ScaleFrames.groupedQuantileWideDomain(
        scored, "lang", "m", bucketWidth = 1e6, frac = 0.5, out = "t")
      val out = scored.join(broadcast(med), "lang")
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("m") <= 0L, 1L).otherwise(0L)).as("n_hard"),
          sum(when(col("m") <= col("t"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("m") <= col("t"), col("m")).otherwise(0L))
            .as("sum_margin_kept"),
          round(max(col("t")), 1).as("t_med"))
        .orderBy("lang")
      f.unpersist()
      out
    },
    // weights replayed through the q279 chain, margins re-derived, the
    // median via quantile_cont (bit-identical to the Spark machinery)
    Some("""WITH f AS (
           |  SELECT lang, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
           |    CAST(1 AS BIGINT) AS x0,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
           |    CAST(n_chars AS BIGINT) AS x2,
           |    CAST((length(text) - length(replace(text, 'table', ''))) // 5 AS BIGINT) AS x3,
           |    CAST((length(text) - length(replace(text, 'data', ''))) // 4 AS BIGINT) AS x4
           |  FROM documents),
           |e1 AS (
           |  SELECT CAST(sum(y*x0) AS BIGINT) AS w0, CAST(sum(y*x1) AS BIGINT) AS w1,
           |    CAST(sum(y*x2) AS BIGINT) AS w2, CAST(sum(y*x3) AS BIGINT) AS w3,
           |    CAST(sum(y*x4) AS BIGINT) AS w4
           |  FROM f),
           |e2 AS (
           |  SELECT
           |    CAST(w0 + sum(CASE WHEN m <= 0 THEN y*x0 ELSE 0 END) AS BIGINT) AS w0,
           |    CAST(w1 + sum(CASE WHEN m <= 0 THEN y*x1 ELSE 0 END) AS BIGINT) AS w1,
           |    CAST(w2 + sum(CASE WHEN m <= 0 THEN y*x2 ELSE 0 END) AS BIGINT) AS w2,
           |    CAST(w3 + sum(CASE WHEN m <= 0 THEN y*x3 ELSE 0 END) AS BIGINT) AS w3,
           |    CAST(w4 + sum(CASE WHEN m <= 0 THEN y*x4 ELSE 0 END) AS BIGINT) AS w4
           |  FROM (SELECT f.*, e1.w0, e1.w1, e1.w2, e1.w3, e1.w4,
           |          y*(e1.w0*x0 + e1.w1*x1 + e1.w2*x2 + e1.w3*x3 + e1.w4*x4) AS m
           |        FROM f CROSS JOIN e1)
           |  GROUP BY w0, w1, w2, w3, w4),
           |e3 AS (
           |  SELECT
           |    CAST(w0 + sum(CASE WHEN m <= 0 THEN y*x0 ELSE 0 END) AS BIGINT) AS w0,
           |    CAST(w1 + sum(CASE WHEN m <= 0 THEN y*x1 ELSE 0 END) AS BIGINT) AS w1,
           |    CAST(w2 + sum(CASE WHEN m <= 0 THEN y*x2 ELSE 0 END) AS BIGINT) AS w2,
           |    CAST(w3 + sum(CASE WHEN m <= 0 THEN y*x3 ELSE 0 END) AS BIGINT) AS w3,
           |    CAST(w4 + sum(CASE WHEN m <= 0 THEN y*x4 ELSE 0 END) AS BIGINT) AS w4
           |  FROM (SELECT f.*, e2.w0, e2.w1, e2.w2, e2.w3, e2.w4,
           |          y*(e2.w0*x0 + e2.w1*x1 + e2.w2*x2 + e2.w3*x3 + e2.w4*x4) AS m
           |        FROM f CROSS JOIN e2)
           |  GROUP BY w0, w1, w2, w3, w4),
           |sc AS (
           |  SELECT lang, y*(w0*x0 + w1*x1 + w2*x2 + w3*x3 + w4*x4) AS m
           |  FROM f CROSS JOIN e3),
           |md AS (SELECT lang, quantile_cont(m, 0.5) AS t FROM sc GROUP BY 1)
           |SELECT sc.lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN m <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hard,
           |  CAST(sum(CASE WHEN m <= t THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(sum(CASE WHEN m <= t THEN m ELSE 0 END) AS BIGINT)
           |    AS sum_margin_kept,
           |  round(max(t), 1) AS t_med
           |FROM sc JOIN md ON md.lang = sc.lang
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q279PerceptronTrain, q281RandomizedResponse, q283BradleyTerry,
      q288DoremiWeights, q290DoremiIterated, q301DpQuantile,
      q306MarginPruning)
}

