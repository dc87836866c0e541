package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator: top-k rows per group, ranked.
  *
  * Why not window row_number()? A window sorts EVERY row of every group
  * (full shuffle + full sort) to keep k. This operator keeps a bounded
  * heap per group on the map side, shuffles at most k rows per group per
  * input partition, and merges heaps on the reduce side — the same
  * partial/final shape as aggregation. At 100 TB with k=3 this is the
  * difference between shuffling 100 TB and shuffling ~nothing.
  *
  * Full custom-operator stack (SURVEY §7 / spark_guide "custom operator"):
  * logical node → planner Strategy → two-phase physical exec, registered
  * per-session via spark.experimental.extraStrategies. */
case class TopKPerGroup(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKPerGroup {
  def rankAttribute(name: String): Attribute =
    AttributeReference(name, LongType, nullable = false)()
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      val partial = TopKPerGroupExec(g, o, k, None, planLater(child))
      TopKPerGroupExec(g, o, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}

/** partial (rankAttr=None): map-side bounded heaps, no distribution
  * requirement. final (rankAttr=Some): requires clustering on the group
  * columns (EnsureRequirements inserts the k-rows-only shuffle), merges
  * heaps, emits rows with their rank. */
case class TopKPerGroupExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = rankAttr match {
    case Some(a) => child.output :+ a
    case None => child.output
  }
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] = rankAttr match {
    case Some(_) => ClusteredDistribution(groupCols) :: Nil
    case None => UnspecifiedDistribution :: Nil
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = groupCols
    val sortOrder = order
    val kk = k
    val isFinal = rankAttr.isDefined
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // per group: max-heap of the k best rows (head = worst kept)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      val entries = heaps.entrySet().iterator()
      // final stage appends the rank and re-encodes as UnsafeRow (the
      // contract for terminal operators feeding collect/write)
      val childTypes = childOutput.map(_.dataType)
      // honor the rank attribute's type: LongType from GraftOps, but
      // IntegerType when TopKRewrite reuses a row_number() attribute
      val rankType = rankAttr.map(_.dataType).getOrElse(LongType)
      val outProj =
        if (isFinal) UnsafeProjection.create((childTypes :+ rankType).toArray) else null
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && entries.hasNext) {
            val rows = entries.next().getValue.dequeueAll.reverse // ascending in rank order
            current =
              if (!isFinal) rows.iterator
              else rows.iterator.zipWithIndex.map { case (r, i) =>
                val out = new GenericInternalRow(childOutput.length + 1)
                var j = 0
                val vals = r.toSeq(childTypes)
                while (j < childOutput.length) { out.update(j, vals(j)); j += 1 }
                out.update(childOutput.length,
                  if (rankType == LongType) (i + 1).toLong else i + 1)
                outProj(out).copy()
              }
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}
