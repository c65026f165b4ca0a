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

/** Bounded best-k buffer: a manual binary max-heap over the comparator
  * (root = WORST kept row), `Array[InternalRow]`-backed. For the small k
  * typical of top-k this beats `PriorityQueue` on allocation (no
  * resizing, no boxing of the size/ordering machinery) and `drain()`
  * emits best-first without an intermediate `dequeueAll.reverse`.
  */
private final class BoundedTopK(k: Int, cmp: Ordering[InternalRow]) {
  private val a = new Array[InternalRow](k)
  private var n = 0
  def worst: InternalRow = a(0)
  def size: Int = n
  /** true ⇢ caller must pass an owned (copied) row */
  def wouldAccept(row: InternalRow): Boolean =
    n < k || cmp.compare(row, a(0)) < 0
  def insert(owned: InternalRow): Unit = {
    if (n < k) { // sift up
      var i = n; a(i) = owned; n += 1
      while (i > 0 && cmp.compare(a((i - 1) / 2), a(i)) < 0) {
        val p = (i - 1) / 2; val t = a(p); a(p) = a(i); a(i) = t; i = p
      }
    } else { // replace root, sift down
      a(0) = owned
      var i = 0
      var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && cmp.compare(a(l), a(m)) > 0) m = l
        if (r < n && cmp.compare(a(r), a(m)) > 0) m = r
        if (m == i) go = false
        else { val t = a(m); a(m) = a(i); a(i) = t; i = m }
      }
    }
  }
  /** Rows best-first (heap-sort in place; buffer is consumed). */
  def drain(): Array[InternalRow] = {
    val out = new Array[InternalRow](n)
    var i = n - 1
    while (i >= 0) { // repeatedly pop the worst to the back
      out(i) = a(0); n -= 1
      a(0) = a(n)
      var j = 0; var go = true
      while (go) {
        val l = 2 * j + 1; val r = l + 1
        var m = j
        if (l < n && cmp.compare(a(l), a(m)) > 0) m = l
        if (r < n && cmp.compare(a(r), a(m)) > 0) m = r
        if (m == j) go = false
        else { val t = a(m); a(m) = a(j); a(j) = t; j = m }
      }
      i -= 1
    }
    out
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, partial: Boolean,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  // Partial runs on the child's own partitioning (map-side, pre-shuffle);
  // only the final pass demands co-location by key, so EnsureRequirements
  // plans the one hash exchange between the two — and that exchange now
  // carries at most k rows per (key, map partition) instead of the
  // child's full output. Same shape as partial/final hash aggregation.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ks = keys
    val ord = order
    val kk = k
    val isPartial = partial
    // Row budget before the partial pass re-evaluates itself (conf'd so
    // the passthrough path is exercisable in small-SF specs).
    val sampleRows = session.sessionState.conf
      .getConfString("spark.graft.topk.partialSampleRows", "65536").toInt
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      // codegen'd comparator over the sort order; heap root = worst row
      val cmp = GenerateOrdering.generate(ord, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, BoundedTopK]
      // Adaptive map-side combine (same idea as partial-agg skip): after
      // `sampleRows` rows, if the partition has shown almost no
      // reduction (distinct keys > half the rows seen — the
      // high-cardinality regime, e.g. top-k per customer where a map
      // partition holds ~1 row per customer), stop combining and pass
      // the remainder straight to the exchange. The pre-skip heaps are
      // still flushed (they only ever shrink data), and the final pass
      // is the sole correctness authority, so this is purely a cost
      // dial: it caps the map-side hash map at `sampleRows` entries
      // instead of letting it grow to millions of copied UnsafeRows
      // (measured 2× on a 150 M-row / 15 M-key input at the 1000×
      // scale point — the map pass was paying a giant map to forward
      // 96% of its input anyway).
      var passthrough = false
      if (isPartial) {
        var seen = 0
        while (iter.hasNext && !passthrough) {
          val row = iter.next()
          val probe = keyProj(row)
          var heap = heaps.get(probe)
          if (heap == null) {
            heap = new BoundedTopK(kk, cmp)
            heaps.put(probe.copy(), heap)
          }
          if (heap.wouldAccept(row)) heap.insert(row.copy())
          seen += 1
          if (seen == sampleRows && heaps.size() * 2 > seen) passthrough = true
        }
      } else {
        iter.foreach { row =>
          // Probe with the projection's REUSED buffer (UnsafeRow hash/eq
          // are byte-wise); copy the key only on first sight, and the row
          // only when it is actually kept — the common path allocates
          // nothing.
          val probe = keyProj(row)
          var heap = heaps.get(probe)
          if (heap == null) {
            heap = new BoundedTopK(kk, cmp)
            heaps.put(probe.copy(), heap)
          }
          if (heap.wouldAccept(row)) heap.insert(row.copy())
        }
      }
      val it = heaps.values().iterator()
      if (isPartial) {
        val drained: Iterator[InternalRow] = new Iterator[InternalRow] {
          private var cur: Array[InternalRow] = _
          private var i = 0
          def hasNext: Boolean = {
            while ((cur == null || i >= cur.length) && it.hasNext) {
              cur = it.next().drain(); i = 0
            }
            cur != null && i < cur.length
          }
          def next(): InternalRow = { val r = cur(i); i += 1; r }
        }
        if (passthrough) drained ++ iter else drained
      } else {
        val outAttrs = childOutput :+ rankAttr
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var cur: Array[InternalRow] = _
          private var i = 0
          def hasNext: Boolean = {
            while ((cur == null || i >= cur.length) && it.hasNext) {
              cur = it.next().drain(); i = 0
            }
            cur != null && i < cur.length
          }
          def next(): InternalRow = {
            rankRow.update(0, (i + 1).toLong)
            val r = outProj(joined(cur(i), rankRow))
            i += 1
            r
          }
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
      // final-over-partial: the partial pass bounds what reaches the
      // exchange; the final pass (with the rank column) runs post-shuffle
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, partial = false,
        TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, partial = true,
          planLater(n.child))) :: Nil
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
