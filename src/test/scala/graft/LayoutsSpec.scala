package graft

import graft.operators.{Layouts, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutsSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("bucketed tables join with zero shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Layouts.writeBucketed(Tables.orders(spark, sf), "g_orders_b", "o_custkey", 4)
      Layouts.writeBucketed(
        Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
        "g_cust_b", "o_custkey", 4)
      val joined = Layouts.bucketedEquiJoin(spark, "g_orders_b", "g_cust_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketed scan satisfies the join's distribution: no shuffle at all
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() === Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_cust_b")
    }
  }

  test("salted join returns exactly the rows of the plain join") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("k"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = orders.join(cust, "k")
    val salted = Skew.saltedJoin(orders, cust, "k", "o_orderkey", 8)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "o_orderkey", "c_mktsegment")
      .exceptAll(plain.select("k", "o_orderkey", "c_mktsegment")).count() === 0L)
  }

  test("time-partitioned layout: month range prunes partitions, result exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_timepart_").toString + "/t"
    val li = Tables.lineitem(spark, sf)
    Layouts.writeTimePartitioned(li, dir, "l_shipdate")
    val from = java.sql.Timestamp.valueOf("1996-02-01 00:00:00")
    val to = java.sql.Timestamp.valueOf("1996-05-01 00:00:00")
    val ranged = Layouts.readTimeRange(spark, dir, "l_shipdate", from, to)
    // correctness: identical to filtering the unpartitioned table
    val expected = li.filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(to))
    assert(ranged.count() === expected.count())
    assert(ranged.select("l_orderkey", "l_linenumber")
      .exceptAll(expected.select("l_orderkey", "l_linenumber")).count() === 0L)
    // pruning: only the 4 edge-inclusive month partitions are listed
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = ranged.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.relation.partitionSchema.fieldNames.contains("p_month") => f
    }.head
    assert(scan.partitionFilters.exists(_.references.map(_.name).toSeq.contains("p_month")))
    val selected = scan.selectedPartitions.partitionCount
    val total = spark.read.parquet(dir).select("p_month").distinct().count()
    assert(selected <= 4 && selected < total,
      s"month range should prune: read $selected of $total partitions")
  }

  test("z-order: a 2-D box query touches fewer files than a 1-D sort layout") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_z_").toString
    // deterministic uniform 2-D points on a 1024x1024 grid
    val pts = spark.range(100000).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(7L)), lit(1024L)).as("y"))
    // 1-D layout: range-partitioned + sorted on x only
    pts.repartitionByRange(32, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/linear")
    graft.operators.Layouts.writeZOrdered(pts, s"$base/zorder", "x", "y", files = 32)
    def filesTouched(dir: String): (Long, Long) = {
      val hit = spark.read.parquet(dir)
        .filter(col("x") < 104 && col("y") < 104) // ~1% box
      (hit.select(countDistinct(col("_metadata.file_path"))).head().getLong(0),
        hit.count())
    }
    val (zFiles, zRows) = filesTouched(s"$base/zorder")
    val (linFiles, linRows) = filesTouched(s"$base/linear")
    assert(zRows == linRows, "layouts must return identical boxes")
    // x-sorted layout confines the box to ~10% of x-range files but every
    // one of them contains all y values; z-order confines both dimensions
    assert(zFiles < linFiles, s"z=$zFiles files vs linear=$linFiles")
  }

  test("compact: many small files become few target-sized files, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    val src = spark.read.parquet(s"${SharedSpark.sf}/lineitem.parquet")
    src.repartition(64).write.parquet(dir) // simulate small-file ingestion
    def parquetFiles = new java.io.File(dir).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 64)
    val before = spark.read.parquet(dir)
    val beforeCount = before.count()
    val n = graft.operators.Layouts.compact(spark, dir, targetBytes = 512L * 1024)
    assert(parquetFiles == n && n < 64, s"files=$parquetFiles target=$n")
    val after = spark.read.parquet(dir)
    assert(after.count() == beforeCount)
    assert(after.exceptAll(src).count() == 0L)
  }
}
