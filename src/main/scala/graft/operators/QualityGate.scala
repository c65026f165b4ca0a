package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the admission gate in front of
  * a training-data pipeline. Each rule is one conditional aggregate, so
  * ANY number of rules is a single scan pass (map-side partial agg).
  */
object QualityGate {

  /** A named constraint counting violating rows. */
  final case class Rule(name: String, violation: Column)

  /** Evaluate rules in one pass → (rule, violations) sorted by rule. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      count(when(r.violation, 1)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to a (rule, violations) report
    val stacked = rules.map(r =>
      s"'${r.name}', ${r.name}").mkString(", ")
    wide.selectExpr(s"stack(${rules.size}, $stacked) as (rule, violations)")
      .orderBy("rule")
  }

  /** The documents-table contract used by the oracle-checked query. */
  def documentRules: Seq[Rule] = Seq(
    Rule("doc_id_not_null", col("doc_id").isNull),
    Rule("lang_known", !col("lang").isin("de", "en", "es", "fr", "zh")),
    Rule("n_chars_matches", col("n_chars") =!= length(col("text"))),
    Rule("text_nonempty", length(col("text")) === 0))

  def checkDocuments(s: SparkSession, d: String): DataFrame =
    check(Tables.documents(s, d), documentRules)
}
