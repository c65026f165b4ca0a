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

  /** Cross-TABLE referential-integrity audit (the ETL counterpart of the
    * single-table gate): per foreign-key relation, total rows and orphan
    * rows (fact key absent from the dimension). Each relation is one
    * left join against the distinct dimension keys + one conditional
    * aggregate; true dimensions (nation, part, supplier) broadcast at
    * any realistic scale, while key-to-key relations like
    * lineitem→orders plan as a shuffle join on the key (orders is
    * fact-sized and must never broadcast — no hint is forced either
    * way). Adding a relation costs one scan of its fact table plus
    * that relation's join and nothing else.
    */
  def riAudit(s: SparkSession, d: String): DataFrame = {
    def one(name: String, fact: DataFrame, fk: String,
            dim: DataFrame, pk: String): DataFrame =
      fact.join(dim.select(col(pk)).distinct(), fact(fk) === col(pk), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col(pk).isNull, 1)).as("orphans"))
        .select(lit(name).as("relation"), col("n_rows"), col("orphans"))
    one("customer_nationkey", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey")
      .unionByName(one("lineitem_orderkey", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"))
      .unionByName(one("lineitem_partkey", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"))
      .unionByName(one("lineitem_suppkey", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"))
      .unionByName(one("orders_custkey", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"))
      .orderBy("relation")
  }
}
