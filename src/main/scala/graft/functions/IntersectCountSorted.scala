package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of common elements between two SORTED, DISTINCT `array<bigint>`
  * columns — the Jaccard-intersection kernel for dedup verification.
  *
  * `array_intersect` hashes boxed elements into an OpenHashSet per row; on
  * the dedup hot path (hundreds of thousands of candidate pairs × hundreds
  * of gram hashes each) that allocation dominates. This is a single fused
  * merge loop over primitive longs with whole-stage codegen.
  *
  * Inputs MUST be sorted ascending and duplicate-free (`array_sort ∘
  * array_distinct`), which the dedup pipeline guarantees at shingle-hash
  * time; the result then equals `size(array_intersect(a, b))` exactly.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      // null slots are skipped, never read as 0 — the sorted-distinct
      // contract excludes them, but a SQL caller can hand this any
      // array<bigint> and must not get phantom matches back
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xi = x.getLong(i)
        val yj = y.getLong(j)
        if (xi == yj) { c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xi = $a.getLong($i);
         |    long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $c++; $i++; $j++; }
         |    else if ($xi < $yj) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}
