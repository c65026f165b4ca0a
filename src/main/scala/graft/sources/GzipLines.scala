package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Line-oriented (optionally gzipped) text source — the reference's input
  * stage (`FileIO.fromPath` + `Compression.gunzip()` + line split,
  * Main.scala:20-27) as a Spark source. Spark's text reader handles the
  * `.gz` codec transparently; a gz file is a single split, so at real
  * scale inputs should be many gz files (or zstd/parquet) to parallelize.
  */
object GzipLines {

  /** Batch read: one row per non-empty line, column `line`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).toDF("line").filter($"line" =!= "")
  }

  /** Streaming read over a directory of line files.
    * `maxFilesPerTrigger` is the Spark-native throttle (reference:
    * `.throttle(1, 3.second)`, Main.scala:33); micro-batch admission is
    * the backpressure (reference: `.buffer(10, backpressure)`).
    */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .toDF("line")
      .filter($"line" =!= "")
  }
}
