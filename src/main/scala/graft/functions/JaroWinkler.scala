package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — THE canonical
  * record-linkage string comparator (Jaro 1989, Winkler 1990), which Spark
  * does not ship (it has only levenshtein). The implementation follows the
  * published algorithm exactly as the rapidfuzz family implements it
  * (match window ⌊max(|a|,|b|)/2⌋−1, greedy left-to-right match marking,
  * half-transposition count, prefix boost up to 4 chars at weight 0.1
  * applied only when the Jaro similarity exceeds 0.7) — the same lineage
  * DuckDB's `jaro_winkler_similarity` embeds, so the DuckDB oracle is a
  * genuinely independent C++ implementation of the same spec and the
  * cross-engine hash gate checks the algorithm itself, not a shared
  * library.
  *
  * Float determinism: every arithmetic step mirrors the reference
  * operation order (the three match-ratio terms summed left to right,
  * then one division by 3; the prefix boost as (p·0.1)·(1−sim) added
  * last), so both engines produce bit-identical doubles — IEEE basic ops
  * are exactly specified, and no transcendental is involved.
  *
  * Semantics pinned to DuckDB 1.x: either side empty → 0.0 (including
  * both-empty); comparison is per UTF-16 char, which coincides with
  * DuckDB's byte-wise walk on the ASCII fixture names this engine feeds
  * it (documented ASCII-domain assumption, like q319/q332's signed-domain
  * notes).
  */
object JaroWinklerImpl {

  def similarity(aU: UTF8String, bU: UTF8String): Double = {
    val a = aU.toString
    val b = bU.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    var sim = m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m
    sim /= 3.0
    if (sim > 0.7) {
      val maxPref = math.min(math.min(l1, l2), 4)
      var p = 0
      while (p < maxPref && a.charAt(p) == b.charAt(p)) p += 1
      sim += p.toDouble * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** `graft_jaro_winkler(a, b)` — see [[JaroWinklerImpl]]. Null if either
  * side is null; non-string input is a type-check failure.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
