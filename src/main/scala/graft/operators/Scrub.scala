package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of emails, phone
  * numbers, and IPv4 addresses, plus a per-kind incidence report. Pure
  * `regexp_replace`/`regexp_count` Catalyst expressions, so redaction is
  * a narrow single-pass map over 100 TB of text — no UDFs, no shuffle.
  *
  * (Module, not an oracle query: the synthetic documents corpus contains
  * no PII-shaped strings, so the spec drives it on constructed rows.)
  */
object Scrub {

  /** (kind, Java regex, replacement tag) — order matters: emails first so
    * the digits inside them are not half-eaten by the phone pattern.
    */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"))

  /** Redacted text: every rule applied in sequence. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (_, re, tag)) => regexp_replace(c, re, tag) }

  /** Per-document redaction: original id, scrubbed text, and match counts
    * per kind (counted BEFORE redaction, on the same pass).
    */
  def redactDocuments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = rules.map { case (kind, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$kind")
    }
    df.select(col(idCol) +: redact(col(textCol)).as("clean_text") +: counts: _*)
  }

  /** Corpus-level incidence report: one conditional-agg scan → (kind, n_docs,
    * n_matches) per rule, `stack`-unpivoted like [[QualityGate.check]].
    */
  def report(df: DataFrame, textCol: String): DataFrame = {
    val aggs = rules.flatMap { case (kind, re, _) =>
      Seq(
        count(when(regexp_count(col(textCol), lit(re)) > 0, 1)).as(s"d_$kind"),
        sum(regexp_count(col(textCol), lit(re)).cast("long")).as(s"m_$kind"))
    }
    val stacked = rules.map { case (kind, _, _) => s"'$kind', d_$kind, m_$kind" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${rules.size}, $stacked) as (kind, n_docs, n_matches)")
      .orderBy("kind")
  }
}
