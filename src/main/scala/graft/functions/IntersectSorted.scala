package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Common elements of two SORTED, DISTINCT `array<bigint>` columns, in
  * ascending order — the element-emitting sibling of
  * [[IntersectCountSorted]] for consumers that need the members, not just
  * the cardinality (e.g. the triangle edge-iterator credits each common
  * out-neighbor individually).
  *
  * `array_intersect` builds an OpenHashSet of boxed elements per row; this
  * is one fused merge over primitive longs with whole-stage codegen —
  * identical output to `array_intersect(a, b)` under the sorted-distinct
  * precondition (which also makes the result order deterministic).
  */
case class IntersectSorted(left: Expression, right: Expression)
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

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_intersect_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val buf = new Array[Long](math.min(nx, ny))
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      // null slots are skipped, never read as 0 — the sorted-distinct
      // contract excludes them, but a SQL caller can hand this any
      // array<bigint> and must not get fabricated elements back
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xi = x.getLong(i)
        val yj = y.getLong(j)
        if (xi == yj) { buf(c) = xi; c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, c))
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
      val buf = ctx.freshName("buf")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |long[] $buf = new long[$nx < $ny ? $nx : $ny];
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xi = $a.getLong($i);
         |    long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $buf[$c++] = $xi; $i++; $j++; }
         |    else if ($xi < $yj) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = new $gad(java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSorted =
    copy(left = newLeft, right = newRight)
}
