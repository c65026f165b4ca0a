package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-generated parquet tables (TESTDATA.md).
  * One place to swap in bucketed/partitioned layouts at real scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** `events.ts` arrives in one of three parquet encodings depending on
    * who wrote the dir: TIMESTAMP(MICROS) (driver testdata), raw ns
    * BIGINT (the `Scale` generator), or TIMESTAMP(NANOS) (older
    * testdata, readable only via `nanosAsLong`). Normalize all three to
    * µs TIMESTAMP_NTZ; the ns path floor-divides in integer arithmetic
    * (ns since epoch exceeds double's 53-bit mantissa, so no `/ 1000.0`)
    * — the exact truncation DuckDB applies.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTs(apply(s, d, "events"))
  }

  /** ts normalization shared with the streaming reader: schema-dispatched
    * so both ns-long and native-timestamp inputs land on µs NTZ. */
  def withEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
