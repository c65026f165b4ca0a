package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling: per-column row / null / distinct
  * counts in ONE aggregation pass (3·|cols| conditional aggregates,
  * map-side partial agg), `stack`-unpivoted to a (column, …) report.
  *
  * Exact distincts keep the DuckDB oracle bit-identical; the 100 TB
  * variant swaps `count_distinct` for `approx_count_distinct` (HLL) and
  * becomes a single narrow scan with constant-size state per column.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"r_$c"),
        count(when(col(c).isNull, 1)).as(s"u_$c"),
        count_distinct(col(c)).as(s"d_$c"))
    }
    val stacked = cols.map(c => s"'$c', r_$c, u_$c, d_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stacked) as (col_name, n_rows, n_nulls, n_distinct)")
      .orderBy("col_name")
  }

  def profileDocuments(s: SparkSession, d: String): DataFrame =
    profile(Tables.documents(s, d), Seq("doc_id", "lang", "n_chars", "source", "text"))

  /** Join-key SKEW report — the diagnostic that decides between a plain
    * shuffle join, AQE skew splitting, and `Skew.saltedJoin`: the top-k
    * heaviest values of a prospective join key with exact counts and
    * integer-ppm share. One hash-agg keyed by the column (map-side
    * partials) + TakeOrdered of the k heaviest — never a full sort.
    */
  def keySkew(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
    val total = Tables.lineitem(s, d).agg(count(lit(1)).as("total"))
    counts.crossJoin(total)
      .select(col("key"), col("cnt"),
        expr("(CAST(cnt AS DECIMAL(38,0)) * 1000000) div total").as("share_ppm"))
      .orderBy(col("cnt").desc, col("key")).limit(k)
  }

  /** Per-group 2σ outliers with NO floating point: the z-score test
    * (x−μ)² > 4σ² is cross-multiplied into the integer inequality
    * (n·x − Σx)² > 4·(n·Σx² − (Σx)²), evaluated on DECIMAL(38,0) — both
    * engines compute identical flags, no rounding boundary anywhere
    * (the q16 moments lesson turned into a row-level predicate).
    *
    * Two passes over the grouped frame (one tiny moment agg per group,
    * broadcast back — |groups| rows), flags computed row-locally in the
    * scan. At 100 TB: one shuffle for the moments, zero for the flags.
    */
  def outliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val x = col("n_chars").cast(dec)
    val m = Tables.documents(s, d)
      .groupBy(col("source")).agg(
        count(lit(1)).cast(dec).as("n"),
        sum(x).as("sx"),
        sum(x * x).as("sxx"))
    Tables.documents(s, d)
      .join(m, "source")
      .withColumn("dev", col("n") * col("n_chars").cast(dec) - col("sx"))
      .filter(col("dev") * col("dev") > lit(4).cast(dec) * (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("source"), col("doc_id"), col("n_chars"))
      .orderBy("source", "doc_id")
  }
}
