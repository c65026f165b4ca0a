package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
