package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashing for the dedup pipelines.
  *
  * Replaces the interpreted HOF chain
  * `split → transform(concat_ws) → array_distinct → transform(md5+conv)`
  * (one boxed lambda invocation per token per layer — the dominant cost of
  * q25/q27/q53 in round 1) with one static call that stays inside
  * whole-stage codegen.
  *
  * Arithmetic is bit-for-bit the cross-engine definition the DuckDB oracles
  * use: gram strings are distinct-ed at STRING level (DuckDB
  * `list_distinct(g)`), each hashed as the first `nibbles` hex chars of its
  * md5 (== `conv(substring(md5(t),1,nibbles),16,10)`), emitted in first-
  * occurrence order WITHOUT int-level dedup — so md5-prefix collisions keep
  * their oracle-visible duplicates.
  */
object GraftHashUtil {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def prefixBits(digest: Array[Byte], nibbles: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (digest(k) & 0xffL); k += 1 }
    v >>> (64 - 4 * nibbles)
  }

  /** Word-3-gram hashes of `text` split on single spaces (Spark
    * `split(text, " ")` semantics: trailing empty tokens kept). Texts with
    * fewer than 3 tokens yield an empty array.
    */
  def shingle3Hashes(text: UTF8String, nibbles: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val m = md.get()
    val seen = new java.util.HashSet[String]()
    val out = new Array[Long](toks.length - 2)
    var nOut = 0
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - 3) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val s = sb.toString
      if (seen.add(s)) {
        m.reset()
        out(nOut) = prefixBits(m.digest(s.getBytes(StandardCharsets.UTF_8)), nibbles)
        nOut += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** All word-n-grams as strings (duplicates kept, occurrence order) —
    * Spark `split(text, " ")` token semantics, single-space joined.
    */
  def wordGrams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Character-n-gram hashes (grams of `n` consecutive chars, distinct at
    * string level, first-occurrence order). Texts shorter than `n` chars
    * yield an empty array. Gram boundaries are Java-char (UTF-16) positions,
    * matching Spark/DuckDB `substring` semantics on the fixture ASCII text.
    */
  def charGramHashes(text: UTF8String, n: Int, nibbles: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.emptyLongArray)
    val m = md.get()
    val seen = new java.util.HashSet[String]()
    val out = new Array[Long](s.length - n + 1)
    var nOut = 0
    var i = 0
    while (i <= s.length - n) {
      val g = s.substring(i, i + n)
      if (seen.add(g)) {
        m.reset()
        out(nOut) = prefixBits(m.digest(g.getBytes(StandardCharsets.UTF_8)), nibbles)
        nOut += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003): 1-based
    * positions of the per-window-of-`win` minimum k-gram hash, a minimum
    * taken at EVERY gram position with trailing windows truncated, hash
    * ties to the leftmost position. The hash is the 8-nibble md5 prefix —
    * `conv(substring(md5(gram),1,8),16,10)` — so any engine reproduces the
    * selection. Output is distinct ascending (the sliding argmin is
    * non-decreasing). O(n·win) time, one md5 per gram position.
    *
    * Positions are Java UTF-16 unit offsets; the Spark/DuckDB `substring`
    * consuming them counts codepoints. Identical only for ASCII input —
    * an invariant the fixtures satisfy and FixtureInvariantSpec pins (a
    * non-ASCII fixture must switch this to codepoint counting).
    */
  def winnowPositions(text: UTF8String, k: Int, win: Int): ArrayData = {
    val s = text.toString
    if (s.length < k) return new GenericArrayData(Array.emptyIntArray)
    val n = s.length - k + 1
    val m = md.get()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      m.reset()
      hs(i) = prefixBits(m.digest(
        s.substring(i, i + k).getBytes(StandardCharsets.UTF_8)), 8)
      i += 1
    }
    val out = new Array[Int](n)
    var nOut = 0
    var last = -1
    var p = 0
    while (p < n) {
      val end = math.min(p + win, n)
      var best = p
      var q = p + 1
      while (q < end) {
        if (hs(q) < hs(best)) best = q
        q += 1
      }
      if (best != last) {
        out(nOut) = best + 1 // 1-based, Spark/DuckDB substring positions
        nOut += 1
        last = best
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}

/** string → array<string>: ALL word-n-grams (space-joined, occurrence order,
  * duplicates kept — frequency analyses need multiplicity). One pass
  * replacing `transform(sequence(...), concat_ws)` interpreted lambdas.
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and a positive gram size")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override def nullSafeEval(input: Any): Any =
    GraftHashUtil.wordGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GraftHashUtil.wordGrams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** string → array<bigint>: md5-prefix hashes of distinct word-3-grams. */
case class ShingleHashes(child: Expression, nibbles: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if nibbles > 0 && nibbles <= 15 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and 1..15 hex nibbles")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle3"

  override def nullSafeEval(input: Any): Any =
    GraftHashUtil.shingle3Hashes(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GraftHashUtil.shingle3Hashes($a, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** string → array<int>: winnow-selected 1-based k-gram positions (one JVM
  * pass; the HOF formulation — transform + slice + array_min per position —
  * pays an interpreted lambda per element and was the q135 hot spot).
  */
case class WinnowPositions(child: Expression, k: Int, win: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 && win > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, positive gram size and window")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    GraftHashUtil.winnowPositions(input.asInstanceOf[UTF8String], k, win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GraftHashUtil.winnowPositions($a, $k, $win);")

  override protected def withNewChildInternal(newChild: Expression): WinnowPositions =
    copy(child = newChild)
}

/** string → array<bigint>: md5-prefix hashes of distinct char-n-grams. */
case class CharGramHashes(child: Expression, n: Int, nibbles: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && nibbles > 0 && nibbles <= 15 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, positive gram size, 1..15 nibbles")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargrams"

  override def nullSafeEval(input: Any): Any =
    GraftHashUtil.charGramHashes(input.asInstanceOf[UTF8String], n, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GraftHashUtil.charGramHashes($a, $n, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}
