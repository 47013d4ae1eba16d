package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling keys for every L-codepoint window of a text column —
  * q300's one-pass replacement for one md5 per position: element i is the
  * key of text[i, i+L), for i in 0 .. numChars−L (empty array when the
  * text is shorter than L).
  *
  * The key packs TWO independent 31-bit polynomial hashes over CODEPOINTS
  * (h1·2³¹ + h2, moduli the primes 2³¹−1 and 2³¹−19, bases 1000003 and
  * 1000033): every intermediate stays under 2⁵⁷, so the DuckDB oracle can
  * replay the identical arithmetic per position with plain BIGINT ops (no
  * 128-bit mulmod on either engine), and the combined ~62-bit key keeps
  * the same collision story as the md5-prefix-64 key it replaces — a
  * collision is a shared semantic false positive, identical in both
  * engines, never a cross-engine divergence. Codepoint indexing matches
  * Spark `length`/`substring` and DuckDB `substr`/`ord` exactly.
  *
  * One O(n) pass per document instead of O(n·L) digest work; evaluated
  * once per row (the per-position stream comes from posexplode of the
  * result), so interpreted eval is off the hot path — CodegenFallback.
  */
case class RollingGramKeys(child: Expression, l: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && l >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, positive window), got " +
        s"${child.dataType.simpleString}, L=$l")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_gram_keys"

  // drop-term factors B^(L−1) mod M for THIS window length
  @transient private lazy val p1 = RollingGramKeys.pow(RollingGramKeys.B1,
    l - 1, RollingGramKeys.M1)
  @transient private lazy val p2 = RollingGramKeys.pow(RollingGramKeys.B2,
    l - 1, RollingGramKeys.M2)

  override def nullSafeEval(t: Any): Any = {
    val cps = t.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < l)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - l + 1)
    var h1 = 0L
    var h2 = 0L
    var j = 0
    while (j < l) { // initial window: Horner fold
      h1 = (h1 * RollingGramKeys.B1 + cps(j)) % RollingGramKeys.M1
      h2 = (h2 * RollingGramKeys.B2 + cps(j)) % RollingGramKeys.M2
      j += 1
    }
    out(0) = h1 * 2147483648L + h2
    var i = 1
    while (i <= n - l) {
      // slide: drop cps(i−1)·B^(L−1), shift, add cps(i+L−1); the +M keeps
      // the subtraction non-negative so % is a true mod on both steps
      h1 = ((h1 - cps(i - 1) * p1 % RollingGramKeys.M1
        + RollingGramKeys.M1) % RollingGramKeys.M1 * RollingGramKeys.B1
        + cps(i + l - 1)) % RollingGramKeys.M1
      h2 = ((h2 - cps(i - 1) * p2 % RollingGramKeys.M2
        + RollingGramKeys.M2) % RollingGramKeys.M2 * RollingGramKeys.B2
        + cps(i + l - 1)) % RollingGramKeys.M2
      out(i) = h1 * 2147483648L + h2
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingGramKeys = copy(child = newChild)
}

object RollingGramKeys {
  val M1 = 2147483647L // 2³¹ − 1 (prime)
  val M2 = 2147483629L // 2³¹ − 19 (prime)
  val B1 = 1000003L
  val B2 = 1000033L

  /** B^(L−1) mod M — the drop-term factor for window length L. */
  def pow(b: Long, e: Int, m: Long): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r = r * b % m; i += 1 }
    r
  }
  /** The oracle-side power table: B^(L−1−j) mod M for j = 0..L−1, spliced
    * into the DuckDB SQL as a literal list so the oracle's per-position
    * Horner sum uses the identical constants. */
  def powerList(b: Long, m: Long, l: Int): Seq[Long] =
    (0 until l).map(j => pow(b, l - 1 - j, m))
}
