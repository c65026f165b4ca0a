package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md §2c).
  * All pure Catalyst expressions — one narrow scan pass per query, no
  * UDFs, so a 100 TB documents table is processed at parquet-scan speed.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/marker language-ID heuristic.
    * Deterministic and declarative so the exact same scoring is
    * expressible in the DuckDB oracle.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "et", "une", "est"))

  /** Language ID: score = |distinct tokens ∩ profile|, argmax with
    * alphabetical tie-break, 'und' when no profile hits. Confusion-matrix
    * output (actual lang vs predicted).
    *
    * Scores run on the explode → distinct → conditional-count path (all
    * codegen, one pass over tokens for all four profiles) rather than
    * four interpreted array_intersect scans of each document.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .distinct()
    val scored = tok.groupBy(col("doc_id"), col("lang")).agg(
      count(when(col("t").isin(langProfiles(0)._2: _*), 1)).as("s_de"),
      count(when(col("t").isin(langProfiles(1)._2: _*), 1)).as("s_en"),
      count(when(col("t").isin(langProfiles(2)._2: _*), 1)).as("s_es"),
      count(when(col("t").isin(langProfiles(3)._2: _*), 1)).as("s_fr"))
    val predicted =
      when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
           col("s_de") >= col("s_fr") && col("s_de") > 0, "de")
      .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
            col("s_en") > 0, "en")
      .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
      .when(col("s_fr") > 0, "fr")
      .otherwise("und")
    scored
      .withColumn("predicted", predicted)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Quality scoring: token count, mean token length, stopword ratio, and
    * a binary keep/drop flag — the standard cheap pre-filter before
    * expensive dedup at 100 TB.
    *
    * Token metrics run on the explode → hash-aggregate path (whole-stage
    * codegen, map-side partial agg) instead of interpreted higher-order
    * lambdas — 4× faster at sf0.1 and scan-speed-bound at scale.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val agg = tok.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      count(when(col("t").isin(stopwords: _*), 1)).as("n_stop"))
    docs.select(col("doc_id"), col("text")).join(agg, "doc_id")
      .withColumn("avg_token_len",
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_tokens"), 4))
      .withColumn("stopword_ratio",
        round(col("n_stop").cast("double") / col("n_tokens"), 4))
      .withColumn("quality",
        when(col("n_tokens").between(10, 1000) && col("stopword_ratio") <= 0.6, 1L).otherwise(0L))
      .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "quality")
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * ([a-z0-9]+ runs and single non-alnum marks), plus raw chars.
    */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("chars"))
      .orderBy("doc_id")

  /** TF-IDF scoring: explode → tf per (doc, token) → df per token →
    * tf·ln(N/df); top-100 scored terms. Corpus size N is a 1-row
    * aggregate cross-joined into the plan — one DAG, no separate
    * count action re-scanning the corpus. df joins broadcast at any
    * scale (vocabulary ≪ corpus).
    */
  def tfidf(s: SparkSession, d: String, topN: Int = 100): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n") / col("df")), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
      .limit(topN)
  }

  /** Document fingerprinting: md5 over normalized text (exact-dup key) —
    * lowercased, whitespace-collapsed. Same md5 hex as DuckDB's.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(normalize(col("text"))).as("fp"))
      .orderBy("doc_id")

  /** Corpus heavy hitters: the top-N tokens by occurrence, with document
    * frequency — the vocabulary report behind stopword lists, df-caps and
    * tokenizer audits. One explode feeds both aggregates; the token-level
    * agg is map-side partial, and the final top-N is TakeOrdered (never a
    * full sort). At 100 TB the exact form costs one shuffle keyed on the
    * (vocabulary-sized, Zipf-concentrated) token; the sketch alternative
    * (count-min / `approx_count_distinct`) trades that shuffle's exactness
    * for fixed-size state — same dial as q65.
    */
  def topTokens(s: SparkSession, d: String, topN: Int = 200): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
}
