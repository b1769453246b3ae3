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
/** `withTies` (requires k == 1) keeps EVERY row tying the best sort
  * value per key — the exact semantics of `rank() = 1`, which unlike
  * `row_number() = 1` does not pick an arbitrary winner among ties. */
final case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan,
    withTies: Boolean = false) extends UnaryNode {
  require(!withTies || k == 1, "withTies top-k is only defined for k = 1 (rank() = 1)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child, ties) =>
      val partial = TopKPerKeyExec(k, keys, order, planLater(child),
        isFinal = false, withTies = ties)
      TopKPerKeyExec(k, keys, order, partial, isFinal = true, withTies = ties) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    isFinal: Boolean,
    withTies: Boolean = false) extends UnaryExecNode {

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
    val finalLocal = isFinal
    // Memory guard: O(k·keys-per-partition) state cannot spill the way
    // Spark's sort/aggregate can, so it is BOUNDED instead. Resolved on
    // the driver (doExecute runs there), shipped in the closure.
    val maxBytes = conf.getConfString(TopKPerKeyExec.MaxBytesKey,
      TopKPerKeyExec.MaxBytesDefault.toString).toLong
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // normalize: the InternalRow contract doesn't guarantee UnsafeRow
      // (non-codegen children emit GenericInternalRow/JoinedRow)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
        .asInstanceOf[Ordering[UnsafeRow]]

      // Chunked evaluation keeps retained state under maxBytes. When the
      // budget trips, the PARTIAL operator flushes everything held and
      // restarts with an empty map — its contract is only "≤ k rows per
      // key per partition per flush", and the final stage re-trims, so
      // results stay exact while memory stays bounded (the same shape as
      // partial aggregation's emit-on-overflow fallback; the flush costs
      // reduced shuffle compression, never correctness). The FINAL
      // operator cannot flush (a key's rows must be trimmed together),
      // so tripping there is a designed, actionable error instead of an
      // executor OOM: raise the budget, or use the row_number window
      // form, which sorts and spills.
      val tiesLocal = withTies
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def ingestChunk(): Unit = {
          var retained = 0L
          val buffers =
            if (tiesLocal) {
              // rank() = 1 semantics: keep ALL rows tying the best sort
              // value per key (a strictly better row evicts the set)
              val bufs = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]]
              while (it.hasNext && retained <= maxBytes) {
                val unsafe = toUnsafe(it.next())
                val key = keyProj(unsafe)
                bufs.get(key) match {
                  case Some(b) =>
                    val c = ord.compare(unsafe, b.head)
                    if (c < 0) {
                      b.foreach(retained -= _.getSizeInBytes)
                      b.clear()
                      b += unsafe.copy(); retained += unsafe.getSizeInBytes
                    } else if (c == 0) {
                      b += unsafe.copy(); retained += unsafe.getSizeInBytes
                    }
                  case None =>
                    val b = mutable.ArrayBuffer(unsafe.copy())
                    bufs.update(key.copy(), b)
                    retained += unsafe.getSizeInBytes + key.getSizeInBytes
                }
              }
              bufs.valuesIterator.flatMap(_.iterator)
            } else {
              // max-heap under the sort order: head = worst row kept
              val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
              while (it.hasNext && retained <= maxBytes) {
                val unsafe = toUnsafe(it.next())
                val key = keyProj(unsafe)
                heaps.get(key) match {
                  case Some(h) =>
                    if (h.size < kLocal) {
                      h.enqueue(unsafe.copy()); retained += unsafe.getSizeInBytes
                    } else if (ord.compare(unsafe, h.head) < 0) {
                      retained -= h.dequeue().getSizeInBytes
                      h.enqueue(unsafe.copy()); retained += unsafe.getSizeInBytes
                    }
                  case None =>
                    val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
                    h.enqueue(unsafe.copy())
                    heaps.update(key.copy(), h)
                    retained += unsafe.getSizeInBytes + key.getSizeInBytes
                }
              }
              heaps.valuesIterator.flatMap(_.iterator)
            }
          // only fail if input REMAINS: state that merely grazes the
          // budget on the last row is complete and correct — emit it
          if (retained > maxBytes && finalLocal && it.hasNext)
            throw new IllegalStateException(
              s"TopKPerKeyFinal exceeded ${TopKPerKeyExec.MaxBytesKey}=$maxBytes " +
              "bytes of per-partition top-k state (too many distinct keys per " +
              "partition for heap-based top-k). Raise the budget, add " +
              "partitions, or use the row_number() window form, which " +
              "sort-spills instead of holding per-key heaps.")
          out = buffers
        }
        override def hasNext: Boolean = {
          while (!out.hasNext && it.hasNext) ingestChunk()
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Per-partition cap on retained heap state (keys + kept rows), in
    * bytes. 256 MiB default — comfortably inside a typical executor's
    * per-task share while holding ~millions of keys at small k. */
  val MaxBytesKey = "spark.graft.topk.maxBytesPerPartition"
  val MaxBytesDefault: Long = 256L * 1024 * 1024
}
