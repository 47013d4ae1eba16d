package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, sqrt}

/** Column-level API for graft's native expressions, registered per session
  * (idempotent). Also injectable at session build time via
  * [[GraftExtensions]].
  */
object GraftFunctions {

  val DOT = "graft_dot"
  val INTERSECT_COUNT = "graft_intersect_count"
  val INTERSECT_SORTED = "graft_intersect_sorted"
  val MINHASH = "graft_minhash"
  val SIMHASH = "graft_simhash60"
  val SHINGLE3 = "graft_shingle3"
  val CHARGRAMS = "graft_chargrams"
  val WORDGRAMS = "graft_word_grams"
  val GRAM_GEN = "graft_gram_gen"
  val WINNOW = "graft_winnow"
  val NFC = "graft_nfc"
  val JARO_WINKLER = "graft_jaro_winkler"
  val TRIANGLE_CREDITS = "graft_triangle_credits"
  val TRUSS_CREDITS = "graft_truss_credits"
  val ROLLING_GRAMS = "graft_rolling_gram_keys"

  private[functions] def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** The single source of truth for every native function: name, the
    * Expression class (for ExpressionInfo), and the builder. Both
    * [[register]] and [[GraftExtensions]] iterate THIS table, so the two
    * registration paths cannot drift — the former hand-written pair of
    * lists once needed a "must stay in lockstep" comment to stay honest.
    */
  private[functions] val builders: Seq[(String, Class[_],
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    (DOT, classOf[DotProduct],
      exprs => DotProduct(exprs(0), exprs(1))),
    (INTERSECT_COUNT, classOf[IntersectCountSorted],
      exprs => IntersectCountSorted(exprs(0), exprs(1))),
    (INTERSECT_SORTED, classOf[IntersectSorted],
      exprs => IntersectSorted(exprs(0), exprs(1))),
    (MINHASH, classOf[MinHashSignature],
      exprs => MinHashSignature(exprs(0), intArg(exprs(1)))),
    (SIMHASH, classOf[SimHash60],
      exprs => SimHash60(exprs(0))),
    (SHINGLE3, classOf[ShingleHashes],
      exprs => ShingleHashes(exprs(0), intArg(exprs(1)))),
    (CHARGRAMS, classOf[CharGramHashes],
      exprs => CharGramHashes(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    (WORDGRAMS, classOf[WordGrams],
      exprs => WordGrams(exprs(0), intArg(exprs(1)))),
    (GRAM_GEN, classOf[GramGenerator],
      exprs => GramGenerator(exprs(0), intArg(exprs(1)))),
    (WINNOW, classOf[WinnowPositions],
      exprs => WinnowPositions(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    (NFC, classOf[NfcNormalize],
      exprs => NfcNormalize(exprs(0))),
    (JARO_WINKLER, classOf[JaroWinklerSim],
      exprs => JaroWinklerSim(exprs(0), exprs(1))),
    (TRIANGLE_CREDITS, classOf[TriangleCredits],
      exprs => TriangleCredits(exprs(0), exprs(1), exprs(2), exprs(3),
        emitPairs = false)),
    (TRUSS_CREDITS, classOf[TriangleCredits],
      exprs => TriangleCredits(exprs(0), exprs(1), exprs(2), exprs(3),
        emitPairs = true)),
    (ROLLING_GRAMS, classOf[RollingGramKeys],
      exprs => RollingGramKeys(exprs(0), intArg(exprs(1)))),
  )

  // synchronized: concurrent callers (Verify's parallel lanes) would race
  // the check-then-append on experimental.extraStrategies /
  // extraOptimizations and stack duplicate entries
  def register(spark: SparkSession): Unit = synchronized {
    // custom-plan strategy (as-of join); idempotent like the functions below
    spark match {
      case c: org.apache.spark.sql.classic.SparkSession =>
        if (!c.experimental.extraStrategies.contains(graft.plans.GraftStrategy))
          c.experimental.extraStrategies =
            c.experimental.extraStrategies :+ graft.plans.GraftStrategy
        if (!c.experimental.extraOptimizations.contains(graft.plans.JaccardSizePrefilter))
          c.experimental.extraOptimizations =
            c.experimental.extraOptimizations :+ graft.plans.JaccardSizePrefilter
      case _ => ()
    }
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Fused dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function(DOT, a, b)

  /** Unicode NFC normalization (requires [[register]]). */
  def nfc(s: Column): Column = call_function(NFC, s)

  /** Jaro-Winkler similarity (requires [[register]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JARO_WINKLER, a, b)

  /** L2 norm via the fused dot. */
  def normL2(v: Column): Column = sqrt(call_function(DOT, v, v))

  /** Merge-count of common elements of two sorted distinct long arrays. */
  def intersectCount(a: Column, b: Column): Column =
    call_function(INTERSECT_COUNT, a, b)

  /** Common elements of two sorted distinct long arrays (ascending). */
  def intersectSorted(a: Column, b: Column): Column =
    call_function(INTERSECT_SORTED, a, b)

  /** Rolling Rabin-Karp keys of every L-codepoint window (one array per
    * text; see [[RollingGramKeys]]). */
  def rollingGramKeys(text: Column, l: Int): Column =
    call_function(ROLLING_GRAMS, text, org.apache.spark.sql.functions.lit(l))

  /** Per-triangle NODE credits (src, dst, z per common neighbor z) for the
    * edge-iterator closure — one merge pass, see [[TriangleCredits]]. */
  def triangleCredits(src: Column, dst: Column, nx: Column, ny: Column): Column =
    call_function(TRIANGLE_CREDITS, src, dst, nx, ny)

  /** Per-triangle EDGE-KEY credits (ek(src,dst), ek(src,z), ek(dst,z) per
    * common neighbor z) for k-truss support counting. */
  def trussCredits(src: Column, dst: Column, nx: Column, ny: Column): Column =
    call_function(TRUSS_CREDITS, src, dst, nx, ny)

  /** Winnow-selected 1-based k-gram positions (requires [[register]]). */
  def winnowPositions(text: Column, k: Int, win: Int): Column =
    call_function(WINNOW, text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(win))

  /** MinHash signature array over token hashes. */
  def minhash(tokenHashes: Column, numHashes: Int): Column =
    call_function(MINHASH, tokenHashes, org.apache.spark.sql.functions.lit(numHashes))

  /** 60-bit SimHash signature over token hashes. */
  def simhash60(tokenHashes: Column): Column = call_function(SIMHASH, tokenHashes)

  /** Fused word-3-gram md5-prefix hashes (distinct grams, occurrence order). */
  def shingle3(text: Column, nibbles: Int): Column =
    call_function(SHINGLE3, text, org.apache.spark.sql.functions.lit(nibbles))

  /** Fused char-n-gram md5-prefix hashes (distinct grams, occurrence order). */
  def charGrams(text: Column, n: Int, nibbles: Int): Column =
    call_function(CHARGRAMS, text,
      org.apache.spark.sql.functions.lit(n), org.apache.spark.sql.functions.lit(nibbles))

  /** Fused word-n-gram strings (all occurrences, duplicates kept). */
  def wordGrams(text: Column, n: Int): Column =
    call_function(WORDGRAMS, text, org.apache.spark.sql.functions.lit(n))
}
