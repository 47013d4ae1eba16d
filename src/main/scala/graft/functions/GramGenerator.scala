package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** UDTF surface: a custom Catalyst [[Generator]] (table function) emitting
  * one (pos, gram) row per word-n-gram of the input text — completing the
  * UDF (scalar Expressions) / UDAF (typed Aggregator) / UDTF triad.
  *
  * Registered like any function, the analyzer's ExtractGenerator rule plans
  * it into a `Generate` node, so it composes with SQL `LATERAL VIEW` and
  * the DataFrame API exactly like `explode`/`posexplode`:
  *
  * {{{ SELECT doc_id, pos, gram
  *     FROM docs LATERAL VIEW graft_gram_gen(text, 2) g AS pos, gram }}}
  *
  * Generation is partition-local (no shuffle); at 100 TB the expansion
  * factor (~tokens per doc) is the only cost, identical to built-in
  * explode.
  */
case class GramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and a positive gram size")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def prettyName: String = "graft_gram_gen"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val grams: ArrayData =
        GraftHashUtil.wordGrams(t.asInstanceOf[UTF8String], n)
      (0 until grams.numElements()).map { i =>
        InternalRow(i, grams.getUTF8String(i))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GramGenerator =
    copy(child = newChild)
}
