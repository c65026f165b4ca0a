package graft.operators

import graft.Lineage.TruncateOps
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix sum (a global running total over a total order) —
  * the primitive behind token-budget corpus selection, quota-capped
  * exports, and cumulative-mass cutoffs.
  *
  * The naive Spark form, `sum(v) over (order by k)` with NO partition
  * key, plans a SINGLE-partition window: all 100 TB funnel through one
  * task. This is the classic parallel-scan rewrite instead:
  *
  *   1. range-partition by the order key (`repartitionByRange` — the
  *      same sampled range shuffle a global `orderBy` uses), sort
  *      within partitions, and truncate lineage so the partitioning is
  *      frozen for the two passes that follow;
  *   2. per-partition totals (N values, one per partition — driver-sized
  *      by construction) → exclusive scan on the driver → broadcast;
  *   3. one `mapPartitions` pass that seeds each partition's running
  *      total with its broadcast offset.
  *
  * Every stage is fully parallel; the only sequential state is the N-entry
  * offset array. `mapPartitions` (not a pid-keyed window) carries the
  * final pass because the data is ALREADY range-partitioned and sorted —
  * a `Window.partitionBy(pid)` would re-shuffle the full corpus once
  * more purely to re-establish a clustering it already has. This is the
  * per-partition-imperative carve-out working as intended: a running
  * scan is inherently order-stateful within its partition.
  *
  * Determinism: `order` must be a TOTAL order (tie-break on a key);
  * partition boundaries are sample-dependent but the cumulative value of
  * each row is boundary-invariant, so results are stable across runs.
  */
object PrefixSum {

  /** Appends `out` = running sum of `value` over the global `order`.
    * `value` is read as a non-null LONG (nulls count as 0).
    */
  def withRunningTotal(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      out: String,
      partitions: Int = 0): DataFrame = {
    val s = df.sparkSession
    val n =
      if (partitions > 0) partitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val vcol = "__graft_ps_v"
    val ranged = df
      .withColumn(vcol, coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    // freeze the SAMPLED range boundaries (repartitionByRange draws a
    // fresh sample per execution — the two passes below must see one
    // partitioning) on executor-local DISK: this is a corpus-sized
    // write-once/read-twice intermediate, and any memory-backed level
    // leaves data-sized blocks fighting the heap — measured at 50 M
    // docs as rep 2's parquet readers OOMing while rep 1's blocks
    // awaited cleanup (round 5).
    val frozen = graft.Lineage.truncateTo(ranged,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // Pass 1: per-partition totals. mapPartitionsWithIndex (not a
    // groupBy(spark_partition_id)) so the index used here is BY
    // CONSTRUCTION the same one TaskContext reports in pass 2.
    val vi = frozen.schema.fieldIndex(vcol)
    val partTotals: Map[Int, Long] = frozen
      .select(col(vcol))
      .rdd
      .mapPartitionsWithIndex { (i, it) =>
        var t = 0L
        it.foreach(r => t += r.getLong(0))
        Iterator(i -> t)
      }
      .collect()
      .toMap
    val offsets = new Array[Long](n)
    var acc = 0L
    for (i <- 0 until n) {
      offsets(i) = acc
      acc += partTotals.getOrElse(i, 0L)
    }
    // broadcast is provably bounded: one Long per PARTITION (the driver
    // exclusive-scan result), never per row — ~8 KB at 1000 partitions.
    val bco = s.sparkContext.broadcast(offsets)

    // Pass 2: seed each partition with its exclusive offset, scan.
    val outSchema = StructType(
      frozen.schema.fields.filterNot(_.name == vcol) :+
        StructField(out, LongType, nullable = false))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    frozen.mapPartitions { it =>
      var run = bco.value(TaskContext.getPartitionId())
      it.map { r =>
        run += r.getLong(vi)
        Row.fromSeq(r.toSeq.patch(vi, Nil, 1) :+ run)
      }
    }
  }
}
