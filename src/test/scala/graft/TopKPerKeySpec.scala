package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("custom operator equals window rank under a total order") {
    val orders = Tables.orders(spark, sf)
    val custom = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = orders.withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
    assert(custom.count() === win.count())
    assert(custom.exceptAll(win).count() === 0L)
    assert(win.exceptAll(custom).count() === 0L)
  }

  test("plans one hash exchange and NO sort (the point of the operator)") {
    val plan = TopK.perKey(Tables.orders(spark, sf), Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1)
    assert(!plan.contains("Sort "))
    assert(!plan.contains("Window"))
  }

  test("adaptive partial passthrough (high-cardinality keys) is result-invariant") {
    // Force the partial pass to re-evaluate after 64 rows: o_orderkey is
    // unique, so keys ≈ rows and every map partition flips to
    // passthrough mid-stream — the mixed flushed-heaps + raw-rows
    // exchange must produce exactly the same answer as the combining
    // plan (the final pass is the sole correctness authority).
    val orders = Tables.orders(spark, sf)
    val full = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk")).collect().toSet
    spark.conf.set("spark.graft.topk.partialSampleRows", "64")
    try {
      val skipped = TopK.perKey(orders, Seq("o_custkey"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk")).collect().toSet
      assert(skipped === full)
    } finally spark.conf.unset("spark.graft.topk.partialSampleRows")
  }

  test("k larger than group size returns whole groups, ranks dense from 1") {
    val out = TopK.perKey(Tables.orders(spark, sf), Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 1000000)
    assert(out.count() === Tables.orders(spark, sf).count())
    val badRanks = out.groupBy(col("o_custkey"))
      .agg(min(col("rnk")).as("lo"), max(col("rnk")).as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(badRanks.count() === 0L)
  }
}
