package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("aggPricing groups to the 6 flag/status combinations") {
    val rows = Relational.aggPricing(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getLong(rows.head.length - 1)).sum <= 6000L)
  }

  test("filterPushdown pushes predicates into the parquet scan") {
    val plan = Relational.filterPushdown(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("l_quantity") || plan.contains("l_discount"))
  }

  test("broadcastJoin actually broadcasts the dimension side") {
    val plan = Relational.broadcastJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("multiJoin has no shuffle join and no cartesian product") {
    val plan = Relational.multiJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("topK returns exactly k rows in descending price order") {
    val rows = Relational.topK(spark, sf).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("windowRank keeps at most 3 orders per customer") {
    val perCust = Relational.windowRank(spark, sf).collect()
      .groupBy(_.getLong(0)).values.map(_.length)
    assert(perCust.forall(_ <= 3))
  }

  test("unionDedup key set is the full customer key domain") {
    assert(Relational.unionDedup(spark, sf).count() === 150L)
  }

  test("rollup emits detail + subtotal + grand-total grouping sets") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getLong(2) === 1500L)
  }

  test("existsSubq plans as a semi join, not a rescan") {
    val plan = Relational.existsSubq(spark, sf)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("LeftSemi"), plan.take(500))
  }

  test("windowSuite: all five functions share one window sort; quartiles cover 1..4") {
    val df = Relational.windowSuite(spark, sf)
    val sorts = df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.trim.startsWith("Sort "))
    // one partition-window sort + one output orderBy
    assert(sorts <= 2, s"expected <=2 sorts, got $sorts")
    val qs = df.select("quartile").distinct().collect().map(_.getLong(0)).sorted
    assert(qs.toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
