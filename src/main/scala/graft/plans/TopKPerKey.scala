package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Grouped top-k as a first-class operator: keep the best `k` rows per
  * key under `order`, emitting a `rnk` column (row_number semantics; use
  * a total order for rank() parity).
  *
  * Why not `rank() OVER (PARTITION BY … ORDER BY …) <= k`? The window
  * form must SORT every partition's full data (O(n log n) per partition
  * and a spill risk at 100 TB); this operator maintains one bounded heap
  * of k rows per key in a single pass — O(n log k), memory bounded by
  * k × keys-per-partition, no sort, no spill.
  *
  * Full custom-operator stack: LogicalPlan node → SparkStrategy →
  * physical UnaryExecNode with `requiredChildDistribution` so Spark
  * plans exactly one hash shuffle on the key (or none if the child is
  * already clustered, e.g. a bucketed table).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  // rankAttr is a constructor field so plan copies keep its exprId stable
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ks = keys
    val ord = order
    val kk = k
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      // codegen'd comparator over the sort order; heap max = worst row
      val cmp = GenerateOrdering.generate(ord, childOutput)
      val heaps = scala.collection.mutable.HashMap.empty[
        UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // heap max (head) under cmp = the WORST row currently kept
        val heap = heaps.getOrElseUpdate(
          keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[InternalRow](cmp))
        if (heap.size < kk) {
          heap.enqueue(row.copy())
        } else if (cmp.compare(row, heap.head) < 0) { // better than the worst kept
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outAttrs = childOutput :+ rankAttr
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields worst-first; reverse → best-first for ranking
        val best: Seq[InternalRow] = heap.dequeueAll.reverse.toSeq
        best.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, new GenericInternalRow(Array[Any](i + 1L))))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Install the strategy on a live session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
    }
  }

  /** Best-k rows per key. `sortCols` are (column, ascending) pairs and
    * should form a total order for deterministic ranks.
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
             sortCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val node = TopKPerKeyNode(
      keyCols.map(attr),
      sortCols.map { case (n, asc) =>
        SortOrder(attr(n),
          if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
          else org.apache.spark.sql.catalyst.expressions.Descending)
      },
      k,
      AttributeReference("rnk", LongType, nullable = false)(),
      analyzed)
    GraftSql.ofRows(spark, node)
  }
}
