package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused triangle-credit emitter for the edge-iterator closure: given an
  * oriented edge (src, dst) decorated with both endpoints' SORTED, DISTINCT
  * out-adjacency arrays, emits THREE credits per common out-neighbor z
  * (one triangle {src, dst, z} per z) in a single merge pass:
  *
  *   - `emitPairs = false` (q148 node credits): src, dst, z — so
  *     `groupBy(n).count()` is each node's exact triangle count.
  *   - `emitPairs = true` (q375 edge credits): ek(src,dst), ek(src,z),
  *     ek(dst,z) with ek(a,b) = least·2³¹ + greatest — so
  *     `groupBy(ek).count()` is each edge's exact triangle support.
  *
  * Replaces the two-leg shape (an intersect-COUNT projection for the
  * base/endpoint credits unioned with an intersect-ARRAY explode for the
  * apex credits) that ran the sorted-merge intersection TWICE per decorated
  * edge, re-derived the decoration join pair under each leg, and paid one
  * extra exchange to combine the legs. Here: one merge, one Generate, one
  * partial-agg groupBy. Edges with an empty intersection emit nothing —
  * absence means zero credits, exactly like the two-leg shape after its
  * `> 0` / `>= threshold` filters (Round13bSpec pins this contract).
  *
  * Output order per row: (base, apex-src, apex-dst) per z, ascending z —
  * deterministic, though every consumer is an order-insensitive aggregate.
  */
case class TriangleCredits(src: Expression, dst: Expression,
    nx: Expression, ny: Expression, emitPairs: Boolean)
    extends QuaternaryExpression {

  override def first: Expression = src
  override def second: Expression = dst
  override def third: Expression = nx
  override def fourth: Expression = ny

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (src.dataType == LongType && dst.dataType == LongType &&
      arr(nx.dataType) && arr(ny.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint, array<bigint>, array<bigint>)," +
        s" got ${src.dataType.simpleString}, ${dst.dataType.simpleString}, " +
        s"${nx.dataType.simpleString}, ${ny.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (emitPairs) "graft_truss_credits" else "graft_triangle_credits"

  override def nullSafeEval(s: Any, d: Any, a: Any, b: Any): Any = {
    val sv = s.asInstanceOf[Long]
    val dv = d.asInstanceOf[Long]
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nxn = x.numElements()
    val nyn = y.numElements()
    val buf = new Array[Long](3 * math.min(nxn, nyn))
    // base credit is constant per row: the edge itself (or its key)
    val baseS = if (emitPairs) {
      if (sv <= dv) sv * 2147483648L + dv else dv * 2147483648L + sv
    } else sv
    var i = 0
    var j = 0
    var c = 0
    while (i < nxn && j < nyn) {
      // null slots are skipped, never read as 0 — the sorted-distinct
      // contract excludes them, but a SQL caller can hand this any
      // array<bigint> and must not get fabricated triangles back
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xi = x.getLong(i)
        val yj = y.getLong(j)
        if (xi == yj) {
          if (emitPairs) {
            buf(c) = baseS
            buf(c + 1) = if (sv <= xi) sv * 2147483648L + xi
              else xi * 2147483648L + sv
            buf(c + 2) = if (dv <= xi) dv * 2147483648L + xi
              else xi * 2147483648L + dv
          } else {
            buf(c) = baseS; buf(c + 1) = dv; buf(c + 2) = xi
          }
          c += 3; i += 1; j += 1
        }
        else if (xi < yj) i += 1
        else j += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d, a, b) => {
      val nxn = ctx.freshName("nxn")
      val nyn = ctx.freshName("nyn")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val buf = ctx.freshName("buf")
      val base = ctx.freshName("base")
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      val emitBody = if (emitPairs)
        s"""$buf[$c] = $base;
           |$buf[$c + 1] = $s <= $xi ? $s * 2147483648L + $xi
           |  : $xi * 2147483648L + $s;
           |$buf[$c + 2] = $d <= $xi ? $d * 2147483648L + $xi
           |  : $xi * 2147483648L + $d;""".stripMargin
      else
        s"""$buf[$c] = $base; $buf[$c + 1] = $d; $buf[$c + 2] = $xi;"""
      val baseInit = if (emitPairs)
        s"long $base = $s <= $d ? $s * 2147483648L + $d : $d * 2147483648L + $s;"
      else
        s"long $base = $s;"
      s"""
         |int $nxn = $a.numElements();
         |int $nyn = $b.numElements();
         |long[] $buf = new long[3 * ($nxn < $nyn ? $nxn : $nyn)];
         |$baseInit
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nxn && $j < $nyn) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xi = $a.getLong($i);
         |    long $yj = $b.getLong($j);
         |    if ($xi == $yj) {
         |      $emitBody
         |      $c += 3; $i++; $j++;
         |    }
         |    else if ($xi < $yj) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray(
         |  java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): TriangleCredits =
    copy(src = newFirst, dst = newSecond, nx = newThird, ny = newFourth)
}
