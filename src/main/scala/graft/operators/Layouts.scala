package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for 100 TB operation.
  *
  * Bucketing pre-shuffles a table ONCE at write time; every subsequent
  * equi-join or aggregation on the bucket key runs shuffle-free (the
  * scan is already hash-partitioned). This is the difference between
  * re-shuffling a 100 TB fact table per query and never shuffling it.
  */
object Layouts {

  /** Write `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans as a
    * SortMergeJoin with NO shuffle exchange on either side.
    */
  def bucketedEquiJoin(s: SparkSession, leftTable: String, rightTable: String,
                       key: String): DataFrame =
    s.table(leftTable).join(s.table(rightTable), key)

  /** Write `df` partitioned by the MONTH of `tsCol` (derived `p_month`
    * directory key). Time is the universal pruning axis of a 100 TB
    * event/fact store: almost every query carries a time-range predicate,
    * and month directories turn that predicate into a file-listing prune
    * instead of a full scan. Spark does not rewrite a timestamp range
    * into a partition predicate by itself — use [[readTimeRange]], which
    * derives the matching `p_month` bounds alongside the exact trim.
    */
  def writeTimePartitioned(df: DataFrame, dir: String, tsCol: String): Unit =
    df.withColumn("p_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("p_month").parquet(dir)

  /** Read `[from, to)` from a [[writeTimePartitioned]] layout: the
    * `p_month` range prunes partitions at listing time (yyyy-MM sorts
    * lexicographically), the `tsCol` range trims exactly within the edge
    * months. Result ≡ filtering the unpartitioned table.
    */
  def readTimeRange(s: SparkSession, dir: String, tsCol: String,
                    from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM")
    s.read.parquet(dir)
      .filter(col("p_month") >= fmt.format(from) && col("p_month") <= fmt.format(to))
      .filter(col(tsCol) >= lit(from) && col(tsCol) < lit(to))
      .drop("p_month")
  }

  /** Morton/Z-order value of two bounded non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Rows close
    * in (a, b) space get close z-values, so sorting by z clusters every
    * 2-D box into few contiguous runs — a pure bitwise codegen
    * expression, no UDF.
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Write `df` Z-ordered on two numeric columns: range-partition by the
    * interleaved z-value, sort within partitions, keep `_z` as a written
    * column (one long) so the layout is self-describing. The point at
    * 100 TB: a predicate restricting BOTH dimensions touches only the
    * files (and row groups — parquet min/max stats on the two columns
    * stay tight because the data is locally clustered) whose z-range
    * intersects the query box, where a single-column sort only prunes
    * its own dimension and scans every file for the other. This is the
    * multi-dimensional analog of [[writeTimePartitioned]]: layout work
    * done once at write time that every subsequent selective scan rides.
    */
  def writeZOrdered(df: DataFrame, dir: String, ca: String, cb: String,
                    files: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zvalue(col(ca).cast("long"), col(cb).cast("long"), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .write.mode("overwrite").parquet(dir)

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each (from the CURRENT on-disk size — post-encoding,
    * so output files land near the target regardless of row width).
    * Small-file proliferation is the classic silent killer of 100 TB
    * scans: every file is a task + a footer read + an object-store
    * request. Streaming sinks and fine-grained ingestion produce
    * thousands of KB-files per partition; compaction restores scan-sized
    * (~128 MB+) files. Uses a temp-dir swap so readers never observe a
    * half-written directory.
    */
  def compact(s: SparkSession, dir: String, targetBytes: Long = 128L << 20): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + "._compact_tmp")
    s.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
    nFiles.toLong
  }
}

/** Skew mitigation for shuffle joins: salt the hot side's key into
  * `saltFactor` sub-keys and replicate the other side across all salts.
  * AQE's skew-join splitting handles moderate skew automatically; salting
  * is the explicit tool for the pathological single-hot-key case (one key
  * larger than an executor).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
    * Deterministic: the big side's salt is a hash of its whole row key
    * space via monotonically increasing ids would be nondeterministic —
    * instead we hash the key with xxhash64 plus a per-row disambiguator
    * column supplied by the caller (`saltOn`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltOn: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltOn)), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
