package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Plan-level as-of join (SURVEY.md §2.5; the §7 r7 candidate): the
  * whole-operator Catalyst form — custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan` — of what `operators.AsOfJoin` composes from
  * union + window.
  *
  * Why a dedicated physical operator: the composed form shuffles the
  * UNION of both sides on the key and then runs a window over the
  * combined partition — one exchange carrying |L|+|R| rows whose sort
  * buffers both sides together, and the window operator materializes
  * running state per frame. Here each side shuffles ONLY itself
  * (co-partitioned ClusteredDistributions, exactly a sort-merge join's
  * exchange shape), and the per-partition resolve is a streaming
  * two-pointer merge: O(|L|+|R|) time, O(1) state (the current match),
  * no window buffer, no union materialization. At 100 TB that is the
  * difference between sorting the combined fact+quote stream and
  * sorting each stream independently with a constant-memory zip.
  *
  * Semantics are IDENTICAL to `operators.AsOfJoin` (tie at the instant
  * included; backward the greatest `tiebreaker` wins among same-instant
  * right rows, forward the smallest; right columns null when no match) —
  * PlanSpec asserts row-for-row parity on the events table and the
  * e24 oracle hash-checks it against DuckDB.
  *
  * Reference anchor: the as-of lookup ("state of the world at this
  * record's time") is the reference pipeline's enrichment step; the
  * reference executes it per-record in its streaming graph — this is
  * the set-oriented Spark re-expression.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    tiebreaker: Option[Expression],
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  /** Both children's full outputs are load-bearing (the operator emits
    * the whole left row and probes arbitrary right columns), so column
    * pruning must not reach through this node. */
  override def references: AttributeSet =
    AttributeSet(left.output) ++ AttributeSet(right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsOfJoinPlan]] — the optimizer-`Rule`
  * face of the custom operator. The node declares `references` = both
  * children's full outputs (it emits the whole left row), which
  * correctly STOPS Catalyst's generic ColumnPruning from reaching
  * through it — but then a query projecting two columns would still
  * scan every column of both sides. This rule restores the pruning the
  * node's semantics actually allow:
  *
  *   - right child: only keys + timestamp + tiebreaker + the emitted
  *     value columns are ever read — prune unconditionally;
  *   - left child: under a `Project` that uses a subset of the left
  *     row, shrink the node's left input (and therefore its output) to
  *     that subset plus the join keys and timestamp.
  *
  * The inserted `Project`s reach the parquet scans through
  * PhysicalOperation exactly like built-in pruning (ReadSchema
  * shrinks — asserted in AsOfPlanSpec). Idempotent: projections are
  * only inserted when they strictly narrow a child. */
object PruneAsOfJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Project

  private def narrow(child: LogicalPlan, keep: AttributeSet): LogicalPlan = {
    val kept = child.output.filter(keep.contains)
    if (kept.length < child.output.length) Project(kept, child) else child
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, j: AsOfJoinPlan) =>
      val rightNeeded = AttributeSet(
        j.rightKeys.flatMap(_.references) ++ j.rightTs.references ++
          j.rightValues ++ j.tiebreaker.toSeq.flatMap(_.references))
      val leftNeeded = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet(j.leftKeys.flatMap(_.references)) ++ j.leftTs.references
      val newLeft = narrow(j.left, leftNeeded)
      val newRight = narrow(j.right, rightNeeded)
      if ((newLeft eq j.left) && (newRight eq j.right)) p
      else p.copy(child = j.copy(left = newLeft, right = newRight))
    case j: AsOfJoinPlan =>
      val rightNeeded = AttributeSet(
        j.rightKeys.flatMap(_.references) ++ j.rightTs.references ++
          j.rightValues ++ j.tiebreaker.toSeq.flatMap(_.references))
      val newRight = narrow(j.right, rightNeeded)
      if (newRight eq j.right) j else j.copy(right = newRight)
  }
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (idempotently, by the builder)
  * or cluster-wide through [[graft.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightValues, p.tiebreaker, p.forward,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned streaming-merge as-of join.
  *
  * Children are hash-clustered on their keys (EnsureRequirements
  * inserts the two exchanges — the same shape as a shuffled join) and
  * sorted by (keys, ts[, tiebreaker]); the merge then resolves every
  * left row in one forward pass over each partition pair with a single
  * buffered match row as its only state. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    tiebreaker: Option[Expression],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp types must match (${leftTs.dataType} vs ${rightTs.dataType})")

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTs) ++ tiebreaker.toSeq).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val values = rightValues
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val valueProj = UnsafeProjection.create(values, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      val nullValues = new GenericInternalRow(values.length)
      val joined = new JoinedRow
      // downstream operators consume UnsafeRow; flatten the JoinedRow
      val outProj = UnsafeProjection.create((lOut ++ values).map(_.dataType).toArray)
      val rIter = rIter0.buffered

      if (!fwd) {
        // backward: consume right rows up to (key, ts<=); the LAST
        // consumed same-key row is the match (right sorted by
        // ts[, tiebreaker] ascending → latest instant, greatest
        // tiebreak). Rows consumed during a probe share the probe's
        // key by construction, so the key is copied at most ONCE per
        // left row (when it matched), not per consumed right row.
        // Null semantics (operators.AsOfJoin parity): a null-ts right
        // row is not "at or before" anything — discard on sight (they
        // sort nulls-first, so discarding never skips a live row); a
        // null-ts left row matches nothing. lt needs no defensive copy:
        // lTsProj is not re-applied while lt is in use (rTsProj has its
        // own buffer), so the projection's buffer is stable per probe.
        var matchKey: InternalRow = null // key of the buffered match
        var matchValues: InternalRow = null
        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          val ltNull = lt.isNullAt(0)
          var matchedThisProbe = false
          var advancing = !ltNull
          while (advancing && rIter.hasNext) {
            val r = rIter.head
            val c = keyOrd.compare(rKeyProj(r), lk)
            if (c < 0) rIter.next() // stale key: no later left can match it
            else if (c == 0 && rTsProj(r).isNullAt(0)) rIter.next() // never matchable
            else if (c == 0 && tsOrd.compare(rTsProj(r), lt) <= 0) {
              matchValues = valueProj(rIter.next()).copy()
              matchedThisProbe = true
            } else advancing = false
          }
          val hit = matchedThisProbe || (!ltNull &&
            matchKey != null && keyOrd.compare(matchKey, lk) == 0)
          if (matchedThisProbe) matchKey = lk.copy()
          outProj(joined(l, if (hit) matchValues else nullValues))
        }
      } else {
        // forward: discard right rows strictly before (key, ts); the
        // HEAD, if same-key, is the match (earliest instant at/after,
        // smallest tiebreak) — not consumed, later lefts may share it.
        // Same null semantics as backward: null-ts right rows are
        // discarded on sight, null-ts left rows match nothing.
        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          val ltNull = lt.isNullAt(0)
          var advancing = true
          while (advancing && rIter.hasNext) {
            val r = rIter.head
            val c = keyOrd.compare(rKeyProj(r), lk)
            if (c < 0 || (c == 0 && rTsProj(r).isNullAt(0)) ||
              (c == 0 && !ltNull && tsOrd.compare(rTsProj(r), lt) < 0)) rIter.next()
            else advancing = false
          }
          val hit = !ltNull && rIter.hasNext &&
            keyOrd.compare(rKeyProj(rIter.head), lk) == 0
          outProj(joined(l, if (hit) valueProj(rIter.head) else nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-facing builder (same surface as `operators.AsOfJoin`). */
object AsOfJoinPlan {

  /** Idempotently register the strategy + pruning rule on the session. */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoinColumns)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoinColumns
    }
  }

  /** Latest right row at or before the left row's time (per key). */
  def latestAtOrBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       valueCols: Seq[String],
                       tiebreaker: Option[String] = None): DataFrame =
    build(left, right, keys, leftTs, rightTs, valueCols, tiebreaker,
      forward = false)

  /** Earliest right row at or after the left row's time (per key). */
  def earliestAtOrAfter(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String,
                        valueCols: Seq[String],
                        tiebreaker: Option[String] = None): DataFrame =
    build(left, right, keys, leftTs, rightTs, valueCols, tiebreaker,
      forward = true)

  private def build(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String, valueCols: Seq[String],
                    tiebreaker: Option[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    // self-join hygiene: when both sides derive from the same base
    // relation, DeduplicateRelations re-ids the right SUBTREE, which
    // would orphan this node's attribute references. A fresh top-level
    // alias projection gives the right side stable new exprIds that
    // survive the subtree rewrite (the aliases' children are rewritten
    // with it; their own ids are not).
    import org.apache.spark.sql.functions.col
    val rp = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      "valueCols collide with left columns — alias them first")
    val plan = AsOfJoinPlan(lp, rp,
      keys.map(attr(lp, _)), keys.map(attr(rp, _)),
      attr(lp, leftTs), attr(rp, rightTs),
      valueCols.map(attr(rp, _)),
      tiebreaker.map(attr(rp, _)), forward)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
  }
}
