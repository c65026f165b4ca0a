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
}
