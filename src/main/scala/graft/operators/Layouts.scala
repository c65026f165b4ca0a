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
