package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The WHOLE-OPERATOR extension seam (SURVEY.md §4.2's ladder, rung
  * (c)): a custom `LogicalPlan` node + optimizer `Rule` + planner
  * `SparkStrategy` + physical `SparkPlan`, registered through
  * `SparkSessionExtensions` (GraftExtensions) — the mechanism for
  * semantics the built-in operators can express only wastefully.
  *
  * The operator: GROUPED TOP-K. Spark's idiom —
  *
  *   row_number() OVER (PARTITION BY g ORDER BY s) <= k
  *
  * — plans (Spark ≥3.5, with InsertWindowGroupLimits) as
  * Sort → WindowGroupLimit(Partial) → Exchange → Sort →
  * WindowGroupLimit(Final) → WindowExec → Filter: the group-limit
  * prunes rows early but still pays TWO full sorts plus the window.
  * The physical operator here replaces all three with per-group
  * BOUNDED HEAPS (size k), the same O(n log k) kernel as
  * `TopK.viaAgg`'s Aggregator (q95) but planned AUTOMATICALLY for the
  * declarative window idiom: `RewriteGroupedTopK` pattern-matches
  * Filter(rn ≤ k, Window(row_number)) in the optimizer and swaps in
  * the logical node; `GroupedTopKStrategy` plans it; EnsureRequirements
  * still inserts the hash Exchange (the node declares
  * ClusteredDistribution), so only the SORT disappears.
  *
  * Semantics are EXACTLY the window form's: every child row carries
  * its rank, ranks are 1..k per group, and the emitted set equals the
  * filter's (PlanShapeSpec + GroupedTopKPlanSpec pin equivalence
  * against the un-rewritten plan on the fixture). Ties follow the
  * SortOrder; as with row_number, a non-total order key makes rank
  * assignment among equal keys partition-order dependent — gated
  * queries use total keys (the q34/q95 discipline).
  *
  * Memory contract (stated honestly): per-partition state is
  * (groups in partition) × k rows with NO spill path — the same
  * contract as q95's Aggregator buffer and a strict improvement on the
  * window form's full-partition sort buffer. A group count so large
  * that groups×k exceeds executor memory needs the sort-based window
  * path; the rewrite is opt-in per session.
  */
case class GroupedTopKNode(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankCol: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankCol
  // rankCol is GENERATED here, not consumed — without this the node
  // reports missingInput and prints with the `!` invalid marker
  override def producedAttributes: AttributeSet = AttributeSet(rankCol)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Optimizer rewrite: Filter(rn <= k | rn < k+1, Window(row_number()
  * OVER (PARTITION BY ... ORDER BY ...))) → GroupedTopKNode.
  * Deliberately conservative (the RewriteRollingHash discipline):
  * exactly ONE window expression, it must be row_number(), the filter
  * must be a literal integer bound on that attribute, and the
  * partition spec must be non-empty (the global case already plans as
  * TakeOrderedAndProject where it matters, and a single global heap
  * would serialize through one task anyway). */
object RewriteGroupedTopK extends Rule[LogicalPlan] {

  private def asTopK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** Spark ≥3.5's own `InsertWindowGroupLimits` usually fires first,
    * wedging a logical WindowGroupLimit (a sort-based per-group row
    * pruner) under the Window. The heap operator subsumes it — keeping
    * it would pay its TWO sorts for nothing — so the rewrite strips a
    * matching layer. */
  private def stripGroupLimit(child: LogicalPlan,
      partitionSpec: Seq[Expression], k: Int): LogicalPlan = child match {
    case org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit(
        ps, _, RowNumber(), limit, grandchild)
        if limit >= k && ps == partitionSpec =>
      grandchild
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
        LogicalWindow(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partitionSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          _)), _, _, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      asTopK(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          GroupedTopKNode(partitionSpec, orderSpec, k, alias.toAttribute,
            stripGroupLimit(child, partitionSpec, k))
        case Some(_) => // k <= 0: the filter is empty; leave it alone
          f
        case None => f
      }
  }
}

/** Planner strategy for the logical node. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(part, order, k, rankCol, child) =>
      GroupedTopKExec(part, order, k, rankCol, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k: hash-clustered input (EnsureRequirements
  * inserts the Exchange), per-partition per-group bounded heaps of
  * size k, ranks materialized on emit. No sort of the full input —
  * each row costs O(log k) against its group's heap. */
case class GroupedTopKExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankCol: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankCol
  override def producedAttributes: AttributeSet = AttributeSet(rankCol)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partLocal = partitionExprs
    val orderLocal = order
    val rankLocal = rankCol
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(partLocal, childOutput)
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      // max-heap under ord: the WORST retained row at the head, so a
      // full heap admits a new row iff it beats the current worst
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            kLocal, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(
        childOutput :+ rankLocal, childOutput :+ rankLocal)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[InternalRow](heap.size()))
        java.util.Arrays.sort(arr, ord)
        Iterator.tabulate(arr.length) { i =>
          rankRow.update(0, i + 1)
          resultProj(joined(arr(i), rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
