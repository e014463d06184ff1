package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator extension (the SURVEY §2.2 `PhysicalExtensionNode`
  * path, built the Spark-native way: LogicalPlan + Rule + Strategy +
  * SparkPlan, all injected via [[graft.GraftExtensions]]).
  *
  * Top-k-per-group is the single most common analytics idiom in this
  * engine's query corpus (`row_number() OVER (PARTITION BY g ORDER BY o)
  * <= k` then drop the rank). Spark 4 already prunes the stream to k rows
  * per group around the exchange (WindowGroupLimitExec, rule
  * InferWindowGroupLimit) — but it still SORTS the surviving rows and
  * evaluates the window just to compute a rank the query throws away.
  * When the projection drops the rank, this operator replaces the whole
  * sort+window tail with bounded per-group heaps: O(n log k), no sort, no
  * rank evaluation, two-stage like an aggregate (per-partition partial
  * heaps reduce BEFORE the shuffle; the final stage re-heaps per group
  * after clustering). Users never call it: the
  * [[WindowTopKRewrite]] optimizer rule recognizes the window idiom and
  * swaps the operator in, so the declarative query stays the source of
  * truth (and the DuckDB oracle runs the untouched window SQL).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends logical.UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Rewrites `Project(cols, Filter(rn <= k, Window(row_number() ...)))` to
  * `Project(cols, TopKPerGroup(...))` when the rank column itself is
  * dropped by the projection. Only ROW_NUMBER qualifies (RANK keeps tied
  * rows beyond k — different semantics); ties are broken arbitrarily in
  * both forms, identically nondeterministic unless the order is total, so
  * the rewrite is semantics-preserving (equivalence asserted in
  * PlansSpec against the rule-disabled plan).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** The filter shapes that mean "rank at most k": <=, <, = 1, and their
    * literal-first mirrors. */
  private def rankLimit(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.exprId == rn => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, _), a: Attribute) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.exprId == rn => Some(1)
    case EqualTo(Literal(1, _), a: Attribute) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ logical.Project(projectList,
        logical.Filter(cond,
          w @ logical.Window(Seq(Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, order, _)), _)), _, _, child, _)))
        if part.nonEmpty && order.nonEmpty =>
      val rnId = w.windowExpressions.head.exprId
      val usesRank = projectList.exists(_.references.exists(_.exprId == rnId))
      rankLimit(cond, rnId) match {
        case Some(k) if k > 0 && !usesRank =>
          p.copy(child = TopKPerGroup(part, order, k, child))
        case _ => p
      }
  }
}

/** Plans the logical node as partial+final [[TopKPerGroupExec]]; the final
  * stage's required distribution makes EnsureRequirements insert the
  * group-key exchange between them, exactly like a two-phase aggregate. */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, child) =>
      val partialExec =
        TopKPerGroupExec(groupExprs, order, k, partial = true, planLater(child))
      TopKPerGroupExec(groupExprs, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group heap, one pass, no sort. Memory bound: the partial
  * stage tracks at most [[TopKPerGroupExec.MaxPartialGroups]] groups per
  * partition — rows of groups beyond that cap pass through unreduced
  * (a partial reducer may emit any superset; the final stage, which sees
  * each group whole after clustering, is exact). The final stage holds
  * |groups in partition| · k rows, the same residency class as a hash
  * aggregate's result. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val kLocal = k
    val partialLocal = partial
    child.execute().mapPartitions ({ iter =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, schema)
      // Max-heap in sort order: head is the WORST retained row, evicted
      // when a better row arrives and the heap is full.
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(orderLocal, schema)
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      val passthrough = mutable.ArrayBuffer.empty[InternalRow]
      val maxGroups = if (partialLocal) TopKPerGroupExec.MaxPartialGroups else Int.MaxValue
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row) // reused buffer — copy only on first sight
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            if (heaps.size < maxGroups) {
              val heap = mutable.PriorityQueue.empty[InternalRow](ord)
              heap.enqueue(row.copy())
              heaps.put(key.copy(), heap)
            } else passthrough += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator) ++ passthrough.iterator
    }, preservesPartitioning = true)
  }
}

object TopKPerGroupExec {
  /** Partial-stage group cap per partition (beyond it, rows pass through
    * to the exact final stage): bounds driver-of-memory identically to a
    * partial hash aggregate's in-memory map. */
  val MaxPartialGroups: Int = 1 << 17
}
