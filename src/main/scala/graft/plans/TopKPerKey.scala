package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension tier (SURVEY §7.3 / builder prompt tier c):
  * per-key top-k as a first-class plan node — logical operator,
  * planner strategy, and heap-based physical operators, wired through
  * `spark.experimental.extraStrategies` (or GraftExtensions).
  *
  * Physical shape (same algebra as partial/final aggregation):
  *
  *   TopKPerKeyExec(final)           ← ≤ k rows per key
  *     +- Exchange hashpartitioning  ← inserted by EnsureRequirements
  *        +- TopKPerKeyExec(partial) ← ≤ k rows per key per partition
  *
  * Unlike the `row_number()` window form, the exchange moves at most
  * k·|keys|·|partitions| rows and nothing is ever fully sorted — each
  * operator keeps one bounded binary heap per key, O(k·keys) memory.
  * [[graft.ops.TopK.perKey]] is the same algorithm at the DataFrame
  * API level; this node exists where the operator must be available to
  * the planner (SQL surface, rule rewrites) rather than as a library
  * call.
  */
final case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, planLater(child), isFinal = false)
      TopKPerKeyExec(k, keys, order, partial, isFinal = true) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    isFinal: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (isFinal) "TopKPerKeyFinal" else "TopKPerKeyPartial"

  /** The final stage needs all rows of a key together; EnsureRequirements
    * plants the hash exchange between partial and final. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // normalize: the InternalRow contract doesn't guarantee UnsafeRow
      // (non-codegen children emit GenericInternalRow/JoinedRow)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
        .asInstanceOf[Ordering[UnsafeRow]]
      // max-heap under the sort order: head = worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val unsafe = toUnsafe(row)
        val key = keyProj(unsafe)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) h.enqueue(unsafe.copy())
            else if (ord.compare(unsafe, h.head) < 0) { h.dequeue(); h.enqueue(unsafe.copy()) }
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            h.enqueue(unsafe.copy())
            heaps.update(key.copy(), h)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
