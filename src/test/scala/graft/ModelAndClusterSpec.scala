package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ModelAndClusterSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}
  import spark.implicits._

  test("typed Dataset + custom Aggregator equals the untyped aggregation") {
    val typedRev = Model.lineitems(spark, sf)
      .groupByKey(_.l_returnflag)
      .agg(Model.revenue.toColumn.name("revenue"))
      .collect().map { case (k, v) => k -> math.round(v * 100) }.toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(typedRev === untyped)
  }

  test("resolveClusters: min-label propagation over a chain and an island") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val reps = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupedDocuments removes exactly the non-representative cluster members") {
    val pairs = Dedup.minhashLsh(spark, sf, 0.5).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference union-find on the collected (small) pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectedDropped = parent.keys.map(x => (x, find(x)))
      .count { case (x, r) => x != r }
    val total = Tables.documents(spark, sf).count()
    assert(Dedup.dedupedDocuments(spark, sf).count() === total - expectedDropped)
  }
}
