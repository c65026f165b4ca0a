package graft

import graft.operators.QualityGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityGateSpec extends AnyFunSuite {
  test("qualityClassifier: deterministic engine-exact GD; scores bounded") {
    import graft.operators.QualityModel
    val spark = SharedSpark.spark
    import spark.implicits._
    val a = QualityModel.train(spark, SharedSpark.sf)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val b = QualityModel.train(spark, SharedSpark.sf)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(a == b, "GD must be bit-deterministic across runs")
    assert(a.map(_._1) == Seq(1, 2, 3))
    assert(a.map(_._2).distinct.size == 1) // n constant
    assert(a.forall { case (_, n, ok, _, _, _, _) => ok >= 0 && ok <= n })
    val w = a.last match { case (_, _, _, w1, w2, w3, bb) => Array(w1, w2, w3, bb) }
    val scores = QualityModel.score(spark, SharedSpark.sf, w)
      .as[(Long, Long)].collect()
    assert(scores.length == a.head._2)
    assert(scores.forall { case (_, p) => p >= 0L && p <= 1000000L })
    // zero model scores exactly 1/2 for every document
    val flat = QualityModel.score(spark, SharedSpark.sf, Array(0L, 0L, 0L, 0L))
      .as[(Long, Long)].collect()
    assert(flat.forall(_._2 == 500000L))
  }

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("rules count violations in one pass, sorted by rule name") {
    val df = Seq(
      (Some(1), "hello", 5),
      (None, "", 0),
      (Some(3), "abc", 9) // n_chars wrong
    ).toDF("doc_id", "text", "n_chars")
    val rules = Seq(
      QualityGate.Rule("a_id_not_null", col("doc_id").isNull),
      QualityGate.Rule("b_text_nonempty", length(col("text")) === 0),
      QualityGate.Rule("c_n_chars", col("n_chars") =!= length(col("text"))))
    val out = QualityGate.check(df, rules).as[(String, Long)].collect()
    assert(out.toSeq == Seq(
      ("a_id_not_null", 1L), ("b_text_nonempty", 1L), ("c_n_chars", 1L)))
  }

  test("documents table passes its contract at sf0.001") {
    val out = QualityGate.checkDocuments(spark, SharedSpark.sf)
      .as[(String, Long)].collect()
    assert(out.length == QualityGate.documentRules.length)
    assert(out.forall(_._2 == 0L), s"violations: ${out.mkString(",")}")
  }

  test("Profiler: one pass, exact counts on a known frame") {
    val df = Seq(
      (Some(1), "x"), (Some(2), "x"), (None, "y")
    ).toDF("id", "s")
    val out = graft.operators.Profiler.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("id", 3L, 1L, 2L), ("s", 3L, 0L, 2L)))
    val leaves = graft.operators.Profiler.profile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1)
  }

  test("a single scan: the plan contains exactly one aggregate pass over one relation") {
    val df = QualityGate.checkDocuments(spark, SharedSpark.sf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"expected 1 relation, got ${leaves.map(_.nodeName)}")
  }
}
