package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling primitives shared by the text-analysis and
  * dedup operator families. Pure Catalyst expressions (codegen-friendly).
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Distinct word n-gram shingles of a token array.
    * Empty array when the doc has fewer than n tokens (never a
    * descending `sequence` surprise).
    */
  def shingles(toks: Column, n: Int): Column = {
    // indices 0 .. size-n (empty when size < n)
    val idx = slice(
      sequence(lit(0), size(toks)),
      lit(1),
      greatest(size(toks) - lit(n - 1), lit(0)))
    array_distinct(
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(k => get(toks, i + lit(k))): _*)))
  }

  /** Canonical text normalization used by fingerprinting: lowercase and
    * collapse runs of whitespace.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))
}
