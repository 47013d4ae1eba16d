package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
