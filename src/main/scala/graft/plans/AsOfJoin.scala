package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge

/** Native as-of join — the canonical time-series operator Spark's built-in
  * join set lacks (the reference surface's closest analogue is the
  * carry-forward window in q40, which only works when both sides live in one
  * table).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest right-time that is `<` (strict) / `<=` (non-strict)
  * the left row's time; unmatched left rows keep nulls (left-outer).
  *
  * Scale design (100 TB): the physical operator declares
  * `ClusteredDistribution` on the keys and per-partition `(key, time)`
  * ordering, so EnsureRequirements plans exactly the same
  * exchange+sort pair a shuffled merge join would get — one shuffle per
  * side, AQE-compatible — and the merge itself is a streaming one-pass scan
  * per partition with O(1) state (current right candidate), never
  * materializing a per-key buffer.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** DataFrame-level API. `on` pairs (leftCol, rightCol) equi-keys; the time
    * columns must be mutually comparable (timestamp or numeric). The right
    * side is re-aliased behind fresh expression ids so self-joins (both
    * sides derived from one source) stay unambiguous.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String,
      strict: Boolean = true): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def resolveL(n: String): Attribute = lPlan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n on left"))
    def resolveR(n: String): Attribute = rPlan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n on right"))
    Bridge.ofRows(left.sparkSession,
      AsOfJoin(lPlan, rPlan,
        on.map(p => resolveL(p._1)), on.map(p => resolveR(p._2)),
        resolveL(leftTimeCol), resolveR(rightTimeCol), strict))
  }
}

/** Physical sort-merge as-of join. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // rows stream out in left order, partitioned like the left child
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val isStrict = strict
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // bind against nullability-widened right attrs: the projection's null
      // checks come from the INPUT schema, and unmatched rows feed nulls
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      // O(1) merge state: one lookahead right row + the best candidate so far
      var rHead: InternalRow = null
      var cand: InternalRow = null
      var candKey: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        if (lk.anyNull || lTimeProj(l).isNullAt(0)) {
          // null keys and null left times never match: `r.t < NULL` is
          // unknown under SQL comparison semantics, so the row is emitted
          // null-extended (left rows sort nulls-first, so no right-side
          // state is consumed out of order)
          resultProj(joined(l, nullRight))
        } else {
          if (candKey != null && keyOrd.compare(candKey, lk) != 0) {
            cand = null; candKey = null // candidate from an earlier key group
          }
          var done = false
          while (!done) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else done = true
            }
            if (rHead != null) {
              val rk = rKeyProj(rHead)
              val c = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
              if (c < 0) {
                rHead = null // behind the current left key: discard
              } else if (c == 0) {
                if (rTimeProj(rHead).isNullAt(0)) {
                  // a NULL right time satisfies no `r.t < l.t` predicate —
                  // natural ordering would otherwise rank it SMALLEST and
                  // make it a bogus as-of candidate
                  rHead = null
                } else {
                  val tc = timeOrd.compare(rTimeProj(rHead), lTimeProj(l))
                  if (tc < 0 || (!isStrict && tc == 0)) {
                    cand = rHead.copy(); candKey = rk.copy(); rHead = null
                  } else done = true // too late for this left row; keep for next
                }
              } else done = true // right is ahead: no rows for this left key
            }
          }
          if (cand != null && keyOrd.compare(candKey, lk) == 0) {
            resultProj(joined(l, cand))
          } else {
            resultProj(joined(l, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
