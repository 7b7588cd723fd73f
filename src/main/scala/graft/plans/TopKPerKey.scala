package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Whole-operator extension point (SURVEY.md §7.2 M4, preference order (c)):
  * per-key top-k as a first-class operator — logical node, planner
  * strategy, and a two-phase physical plan.
  *
  * Why not `row_number().over(...)`? The window form sorts EVERY row of a
  * key group before discarding all but k. This operator keeps a bounded
  * k-row heap per key on the map side, so the exchange carries at most
  * k·|keys| rows per partition instead of the full input — at 100 TB the
  * shuffle shrinks by orders of magnitude for small k. (Same idea as
  * Spark's TakeOrderedAndProject, generalized per key.)
  *
  * Ordering: `order` DESC, then `tiebreak` ASC — fully deterministic.
  *
  * Null contract: rows whose `order` or `tiebreak` evaluates to null are
  * SKIPPED (they can never beat a non-null entry under DESC-first ranking).
  * This differs from `row_number().over(...)`, which ranks null rows; use
  * `graft_topk` only on non-null ranking columns (as `q_topk_custom` does).
  */

/** Boolean marker predicate: `graft_topk(key, order, tiebreak, k)`.
  * Unevaluable and non-deterministic so no optimizer rule moves it; the
  * [[RewriteTopKMarker]] rule replaces the enclosing Filter with the
  * [[TopKPerKey]] node. If the rewrite ever failed to fire, execution
  * fails loudly rather than returning wrong rows.
  */
case class TopKMarker(children: Seq[Expression]) extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

case class TopKPerKey(key: Expression, order: Expression, tiebreak: Expression,
                      k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKExec {
  /** Bounded per-key heaps over one partition's rows. Emits the surviving
    * rows (unordered between keys).
    */
  def partitionTopK(iter: Iterator[InternalRow], keyE: Expression, ordE: Expression,
                    tbE: Expression, k: Int): Iterator[InternalRow] = {
    // min-heap: head = weakest entry = (lowest order, highest tiebreak)
    val heapOrd = Ordering.by[(Double, Long, InternalRow), (Double, Long)] {
      case (v, tb, _) => (v, -tb)
    }
    val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[(Double, Long, InternalRow)]]
    iter.foreach { row =>
      val keyRaw = keyE.eval(row)
      val key = keyRaw match { // detach from the shared row buffer
        case s: UTF8String => s.copy()
        case other => other
      }
      val vRaw = ordE.eval(row)
      val tbRaw = tbE.eval(row)
      if (vRaw != null && tbRaw != null) { // null order/tiebreak: skip (see contract)
        val v = vRaw.asInstanceOf[Number].doubleValue()
        val tb = tbRaw.asInstanceOf[Number].longValue()
        val heap = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty(heapOrd.reverse))
        if (heap.size < k) heap.enqueue((v, tb, row.copy()))
        else {
          val (wv, wtb, _) = heap.head
          if (v > wv || (v == wv && tb < wtb)) { heap.dequeue(); heap.enqueue((v, tb, row.copy())) }
        }
      }
    }
    heaps.valuesIterator.flatMap(_.iterator.map(_._3))
  }
}

/** Map-side phase: shrink each input partition to ≤ k rows per key. */
case class PartialTopKExec(key: Expression, order: Expression, tiebreak: Expression,
                           k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)
  override protected def doExecute(): RDD[InternalRow] = {
    val (kb, ob, tb) = (BindReferences.bindReference(key, child.output),
      BindReferences.bindReference(order, child.output),
      BindReferences.bindReference(tiebreak, child.output))
    child.execute().mapPartitions(TopKExec.partitionTopK(_, kb, ob, tb, k))
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Reduce-side phase: all partials of a key are co-located (clustered
  * distribution forces the exchange); one more bounded pass is exact.
  */
case class FinalTopKExec(key: Expression, order: Expression, tiebreak: Expression,
                         k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(key)))
  override protected def doExecute(): RDD[InternalRow] = {
    val (kb, ob, tb) = (BindReferences.bindReference(key, child.output),
      BindReferences.bindReference(order, child.output),
      BindReferences.bindReference(tiebreak, child.output))
    child.execute().mapPartitions(TopKExec.partitionTopK(_, kb, ob, tb, k))
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}
