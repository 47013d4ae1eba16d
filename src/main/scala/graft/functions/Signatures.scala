package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused signature kernels for the dedup pipelines.
  *
  * Both replace interpreted nested higher-order-function evaluation (which
  * costs one lambda invocation per token × hash/bit — tens of millions of
  * interpreted calls per partition) with single codegen'd loops over
  * primitive longs.
  *
  * The arithmetic is bit-for-bit the published cross-engine definition used
  * by the DuckDB oracles:
  *   - MinHash family: h_i(t) = (t·(2i+1) + i·1000000007 + 12345) mod (2³¹−1)
  *   - SimHash bit j set ⇔ Σ_tokens ((t≫j)&1)·2−1 > 0
  */
object Signatures {
  val MINHASH_A_STEP = 2L
  val MINHASH_B = 1000000007L
  val MINHASH_C = 12345L
  val MINHASH_P = 2147483647L
  val SIMHASH_BITS = 60
}

/** array<bigint> token hashes → array<bigint> of `numHashes` minhash values. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import Signatures._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input and positive hash count")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty input yields null even when the child is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val t = arr.getLong(i)
        val v = (t * (MINHASH_A_STEP * h + 1) + h * MINHASH_B + MINHASH_C) % MINHASH_P
        if (v < m) m = v
        i += 1
      }
      out(h) = m
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $out = new long[$numHashes];
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $m = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $t = $a.getLong($i);
         |      long $v = ($t * (${MINHASH_A_STEP}L * $h + 1) + $h * ${MINHASH_B}L + ${MINHASH_C}L)
         |          % ${MINHASH_P}L;
         |      if ($v < $m) $m = $v;
         |    }
         |    $out[$h] = $m;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** array<bigint> token hashes → 60-bit SimHash packed into one long. */
case class SimHash60(child: Expression) extends UnaryExpression {
  import Signatures._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint> input")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](SIMHASH_BITS)
    var i = 0
    while (i < n) {
      val t = arr.getLong(i)
      var j = 0
      while (j < SIMHASH_BITS) {
        if (((t >> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < SIMHASH_BITS) {
      // bit set iff Σ(±1) > 0 ⇔ 2·ones > n
      if (2L * counts(j) > n) h |= (1L << j)
      j += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$SIMHASH_BITS];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $t = $a.getLong($i);
         |  for (int $j = 0; $j < $SIMHASH_BITS; $j++) {
         |    if ((($t >> $j) & 1L) == 1L) $counts[$j]++;
         |  }
         |}
         |long $h = 0L;
         |for (int $j = 0; $j < $SIMHASH_BITS; $j++) {
         |  if (2L * $counts[$j] > $n) $h |= (1L << $j);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
