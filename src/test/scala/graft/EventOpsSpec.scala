package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("jsonExtract parses every props payload (no null-k rows lost)") {
    val total = EventOps.jsonExtract(spark, sf)
      .agg(sum("n")).collect().head.getLong(0)
    assert(total === 1000L)
  }

  test("retention: day-0 cell of each cohort counts the whole cohort") {
    val rows = EventOps.retention(spark, sf)
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val day0 = rows.filter(_._2 == 0L).map(r => (r._1, r._3)).toMap
    // every user is active on their cohort day by construction, so the
    // day-0 counts sum to the number of distinct users
    val users = EventOps.retention(spark, sf).sparkSession
      .read.parquet(s"$sf/events.parquet").select("user_id").distinct().count()
    assert(day0.values.sum == users)
    assert(rows.forall(_._3 > 0))
  }

  test("dualConditionalCount computes both branches in one aggregate") {
    val df = EventOps.dualConditionalCount(spark, sf)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.length === 1) // reference needed 2 branches + zip + merge
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() === nUsers)
  }

  test("accumulateNested flattening preserves the (user,type) grouping") {
    val n = EventOps.accumulateNested(spark, sf).count()
    val direct = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(n === direct)
  }

  test("sessionize: session ids are dense per user starting at 1") {
    val bad = EventOps.sessionize(spark, sf)
      .groupBy("user_id")
      .agg(min("session_id").as("lo"), max("session_id").as("hi"),
        countDistinct("session_id").as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
      .count()
    assert(bad === 0L)
  }
}
