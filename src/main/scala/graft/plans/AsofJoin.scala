package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.Shim

/** AS-OF join as a first-class operator (SURVEY.md §2.6 mechanism (c):
  * custom LogicalPlan + SparkStrategy + SparkPlan, injected via
  * [[graft.GraftExtensions]]).
  *
  * Spark has no native as-of join; the composable workaround is the
  * union-merge + last(ignoreNulls) window (`join_asof_event_quotes`,
  * operators/Relational.scala), which shuffles left ∪ right together and
  * runs a window over the union. This operator is the whole-operator
  * version a native engine would use (reference: DuckDB's ASOF JOIN —
  * the oracle for both):
  *
  *   - each side shuffles ON ITS OWN KEY (ClusteredDistribution) and
  *     sorts by (key, time) — EnsureRequirements inserts the exchanges
  *     and co-partitions the sides, exactly like a sort-merge join;
  *   - per partition, a single forward merge pass holds ONE buffered
  *     right row — O(1) state, no window buffer, no union materialized;
  *   - semantics: LEFT OUTER — every left row joins the LATEST right
  *     row with equal key and right.time <= left.time (inclusive),
  *     null-filled when no such row exists.
  *
  * Null handling: null keys/times order first under the natural ascending
  * ordering and so can produce matches among themselves; pre-filter nulls
  * when that is not wanted (the registered query's inputs have none).
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on their key — EnsureRequirements reconciles the
    * two ClusteredDistributions into co-partitioned hash exchanges (and
    * reuses an existing partitioning when a side already satisfies it). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs — binding to the child's
      // original non-null attrs would skip the null check and read
      // garbage zeros from the null-filled row
      val joiner =
        UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state: the latest right row at or before the current
      // left row's time, plus its key (copied — projections reuse buffers)
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var continue = true
        while (continue && rBuf.hasNext) {
          val r = rBuf.head
          val c = keyOrd.compare(rKeyProj(r), lKey)
          if (c < 0) {
            // right key below every remaining left key: skip (matches
            // require key equality, and left keys only grow)
            rBuf.next()
          } else if (c == 0 && timeOrd.compare(rTimeProj(r), lTime) <= 0) {
            lastMatch = rBuf.next().copy()
            lastMatchKey = rKeyProj(lastMatch).copy()
          } else {
            continue = false
          }
        }
        val matched =
          lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
        joiner(if (matched) joined(l, lastMatch) else joined(l, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (SURVEY §2.6 (c), the `Rule[LogicalPlan]` leg): column
  * pruning THROUGH the custom as-of node. Catalyst's ColumnPruning only
  * understands built-in operators — without this rule a projection above
  * an as-of join still scans every column of both inputs (at 100 TB the
  * difference between reading 2 columns and reading a whole events table).
  * Pattern: Project(p, AsofJoin(l, r)) where p + join keys/times need only
  * a subset of child outputs → insert child Projects so pruning cascades
  * into the scans. Idempotent (fixed-point batch): once children are
  * pruned the guard sees nothing more to drop.
  */
object PruneAsofJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  private def prune(aj: AsofJoinPlan, needed: AttributeSet): AsofJoinPlan = {
    val keep = needed ++
      AttributeSet(Seq(aj.leftKey, aj.rightKey, aj.leftTime, aj.rightTime)
        .flatMap(_.references))
    val lKeep = aj.left.output.filter(keep.contains)
    val rKeep = aj.right.output.filter(keep.contains)
    if (lKeep.length == aj.left.output.length &&
      rKeep.length == aj.right.output.length) aj
    else aj.copy(left = Project(lKeep, aj.left),
      right = Project(rKeep, aj.right))
  }

  private def pruneRange(rj: RangeJoinPlan, needed: AttributeSet): RangeJoinPlan = {
    val keep = needed ++
      AttributeSet(Seq(rj.point, rj.lo, rj.hi).flatMap(_.references))
    val lKeep = rj.left.output.filter(keep.contains)
    val rKeep = rj.right.output.filter(keep.contains)
    if (lKeep.length == rj.left.output.length &&
      rKeep.length == rj.right.output.length) rj
    else rj.copy(left = Project(lKeep, rj.left),
      right = Project(rKeep, rj.right))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList, aj: AsofJoinPlan) =>
      val pruned = prune(aj, AttributeSet(projectList.flatMap(_.references)))
      if (pruned eq aj) p else p.copy(child = pruned)
    // predicates can't be pushed through an unknown node, so the common
    // shape is Project(Filter(AsofJoin)) — prune through the filter too
    case p @ Project(projectList, f @ Filter(cond, aj: AsofJoinPlan)) =>
      val pruned = prune(aj, AttributeSet(projectList.flatMap(_.references)) ++
        cond.references)
      if (pruned eq aj) p else p.copy(child = f.copy(child = pruned))
    // same two shapes through the range-join node
    case p @ Project(projectList, rj: RangeJoinPlan) =>
      val pruned = pruneRange(rj, AttributeSet(projectList.flatMap(_.references)))
      if (pruned eq rj) p else p.copy(child = pruned)
    case p @ Project(projectList, f @ Filter(cond, rj: RangeJoinPlan)) =>
      val pruned = pruneRange(rj,
        AttributeSet(projectList.flatMap(_.references)) ++ cond.references)
      if (pruned eq rj) p else p.copy(child = f.copy(child = pruned))
  }
}

/** Planner strategy mapping the logical as-of node to its exec — injected
  * by GraftExtensions#injectPlannerStrategy. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case RangeJoinPlan(l, r, p, lo, hi) =>
      RangeJoinExec(p, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsofJoin {

  /** Left-outer as-of join: every `left` row plus the latest `right` row
    * with equal key and `right` time <= `left` time. Output columns are
    * left's then right's (so the two sides' names must be disjoint). */
  def leftOuter(left: DataFrame, right: DataFrame,
      keys: (String, String), times: (String, String)): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "as-of join sides must have disjoint column names")
    // re-alias the right side so a self-join (both sides derived from the
    // same scan) cannot put duplicate attribute ids in the node's output
    val r2 = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    Shim.ofRows(left.sparkSession, AsofJoinPlan(lPlan, rPlan,
      attr(lPlan, keys._1), attr(rPlan, keys._2),
      attr(lPlan, times._1), attr(rPlan, times._2)))
  }
}
