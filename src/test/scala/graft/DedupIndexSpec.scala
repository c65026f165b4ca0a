package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence pins for the round-11 index-probe rewiring: every dedup
  * operator that gained a persisted-index fast path must return rows
  * IDENTICAL to its recompute twin (`spark.graft.dedup.useIndex=false`)
  * — the index is a layout for the same deterministic features, never a
  * different algorithm. Also pins the point of the layout: the probe
  * form plans strictly fewer exchanges than the recompute form.
  */
class DedupIndexSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  private val Dial = "spark.graft.dedup.useIndex"

  private def withDial[A](v: String)(body: => A): A = {
    val prev = spark.conf.get(Dial, "true")
    spark.conf.set(Dial, v)
    try body finally spark.conf.set(Dial, prev)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def exchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // collect traverses the whole subtree, so exchanges count themselves
    // once; recursion is only needed across the AQE boundary (the inner
    // plan is not a TreeNode child)
    def count(p: SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeLike => 1
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      }.sum
    count(df.queryExecution.executedPlan)
  }

  private val ops: Seq[(String, () => DataFrame)] = Seq(
    ("q51 minhashLsh", () => Dedup.minhashLsh(spark, sf)),
    ("q53 ngramJaccard", () => Dedup.ngramJaccard(spark, sf)),
    ("q57 charNgramJaccard", () => Dedup.charNgramJaccard(spark, sf)),
    ("q82 containmentPairs", () => Dedup.containmentPairs(spark, sf)),
    ("q52b simhashPairsMirrorable", () => Dedup.simhashPairsMirrorable(spark, sf)))

  test("index probe ≡ recompute for every rewired dedup operator") {
    ops.foreach { case (name, mk) =>
      val probe = withDial("true") { rows(mk()) }
      val recompute = withDial("false") { rows(mk()) }
      assert(probe === recompute, s"$name: index path diverged from recompute")
      assert(probe.nonEmpty, s"$name: testdata plants near-dups; empty = broken")
    }
  }

  test("q55b pair-grid salt: identical rows to an exhaustive cross join") {
    // round-11 parallelism fix: the bucket self-join key gained a grid
    // coordinate (bits=0 degenerated to ONE join key = one task). The
    // pair set — and every scored row — must be invariant to the grid.
    import graft.plans.GraftFunctions
    import org.apache.spark.sql.functions._
    val got = operators.Dedup.embeddingCosineLsh(spark, sf, tau = 0.3, bits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.norm(col("embedding")).as("nrm"))
    val ref = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(
        GraftFunctions.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos") >= 0.3)
      .select(col("a.vec_id"), col("b.vec_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(got.nonEmpty && got === ref)
  }

  test("the probe form plans fewer exchanges than the recompute form") {
    // the layout's whole point (§2/§6): bucketed feature tables remove
    // the feature-pipeline exchanges AND the self-join exchanges
    Seq("q52b" -> ops(4)._2, "q53" -> ops(1)._2).foreach { case (name, mk) =>
      val probeEx = withDial("true") { exchanges(mk()) }
      val recomputeEx = withDial("false") { exchanges(mk()) }
      assert(probeEx < recomputeEx,
        s"$name: probe plans $probeEx exchanges vs recompute $recomputeEx — layout not used")
    }
  }
}
