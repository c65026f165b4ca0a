package graft

import graft.operators.Relational
import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatsAndApproxSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("out").toString

  test("parquet round-trip, partitioned layout") {
    val p = tmp("graft_pq_")
    Formats.writeParquet(Tables.orders(spark, sf), p, partitionBy = Seq("o_orderpriority"))
    val back = Formats.readParquet(spark, p)
    assert(back.count() === 1500L)
    // partition pruning: a filter on the partition column scans one dir
    val pruned = back.filter(col("o_orderpriority") === "1-URGENT")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(o_orderpriority"))
  }

  test("csv round-trip preserves row count and keys") {
    val p = tmp("graft_csv_")
    Formats.writeCsv(Tables.customer(spark, sf).select("c_custkey", "c_name", "c_acctbal"), p)
    val back = Formats.readCsv(spark, p)
    assert(back.count() === 150L)
    assert(back.agg(sum("c_custkey")).collect().head.getLong(0) ===
      Tables.customer(spark, sf).agg(sum("c_custkey")).collect().head.getLong(0))
  }

  test("json-lines round-trip preserves nested-ish props strings") {
    val p = tmp("graft_json_")
    Formats.writeJsonLines(Tables.events(spark, sf).select("event_id", "event_type", "props"), p)
    val back = Formats.readJsonLines(spark, p)
    assert(back.count() === 1000L)
  }

  test("approx aggregates land within sketch error of exact") {
    val row = Relational.approxAgg(spark, sf).collect().head
    val exactDistinct = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    val exactP50 = Tables.orders(spark, sf)
      .agg(percentile(col("o_totalprice"), lit(0.5))).collect().head.getDouble(0)
    assert(math.abs(row.getLong(0) - exactDistinct).toDouble / exactDistinct < 0.05)
    assert(math.abs(row.getDouble(1) - exactP50) / exactP50 < 0.05)
  }
}
