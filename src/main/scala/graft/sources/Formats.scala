package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink round-trips for the formats an analytics engine must
  * speak: parquet (columnar, the 100 TB default), CSV, and JSON-lines.
  * Thin on purpose — the engine's value is that these are Spark's own
  * scalable readers/writers (splittable, pushdown-capable for parquet),
  * not bespoke parsers.
  */
object Formats {

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readParquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonLines(s: SparkSession, path: String): DataFrame = s.read.json(path)
}
