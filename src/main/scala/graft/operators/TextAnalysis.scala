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

  /** Shannon entropy of each document's token distribution — the
    * information-density quality signal q41's ratio features can't see:
    * keyboard-mash and template spam score near-zero bits/token, natural
    * prose sits in a narrow band, so curation pipelines gate on it
    * alongside the repetition filter (q49 catches ADJACENT repeats;
    * entropy catches globally skewed vocabularies).
    *
    * H = log(N) − Σ n·log(n) / N over per-doc token counts n (nats·log2e
    * = bits; both sides compute ln/ln 2 with the same IEEE doubles, then
    * round 4dp). Two partial-agg'd hash shuffles — (doc, token) then doc
    * — no window, no join; per-doc state never exceeds its vocabulary.
    */
  def tokenEntropy(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val ln2 = log(lit(2.0))
    tok
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n").cast("double") * log(col("n").cast("double"))).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        round(
          (log(col("n_tokens").cast("double")) - col("s") / col("n_tokens")) / ln2,
          4).as("entropy_bits"))
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
    * count action re-scanning the corpus. The df side carries NO
    * forced broadcast: an open-vocabulary crawl's distinct-token
    * table (URLs, hashes, typos) can reach tens of GB, where a hint
    * is a driver OOM while the shuffle join on `token` is fine — AQE
    * still broadcasts it at SFs where it measures in MBs (PlanSpec).
    */
  def tfidf(s: SparkSession, d: String, topN: Int = 100): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .crossJoin(n)
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

  /** Sketch-pruned EXACT heavy hitters: every token whose count is at
    * least a `1/fraction` share of the corpus, with its exact count —
    * without ever shuffling the full vocabulary. Two passes:
    *
    *   1. a count-min grid (`depth`×`width` counters) built as ONE
    *      hash-agg whose key space is the grid cell, not the token —
    *      partial aggregation caps per-partition state at depth·width
    *      rows regardless of vocabulary size, and the shuffle moves at
    *      most depth·width rows per partition;
    *   2. each token occurrence looks its estimate up via `depth`
    *      broadcast joins against the (bounded, ≤depth·width-row) grid —
    *      est = min over rows, the classic CMS estimate, which NEVER
    *      under-counts — and only surviving occurrences reach the exact
    *      groupBy. Survivors are all-or-nothing per token (the estimate
    *      is a function of the token), so the exact re-count over them
    *      is the true count, and one-sided CMS error means recall is 1:
    *      the output equals the exact `HAVING count >= total/fraction`.
    *
    * The direct form (q66) shuffles the vocabulary; at 100 TB a web-scale
    * vocab (URLs, typos, code identifiers) is billions of keys, while this
    * plan's shuffle volume is the fixed grid plus the (Zipf-tiny) set of
    * actually-heavy tokens. The broadcast sides are provably bounded by
    * depth·width, never corpus-derived.
    */
  def heavyHitters(s: SparkSession, d: String, fraction: Int = 100,
                   depth: Int = 4, width: Int = 8192): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    def bucket(i: Int): Column =
      pmod(xxhash64(lit(i), col("token")), lit(width)).cast("int")
    val grid = tok
      .select(posexplode(array((0 until depth).map(bucket): _*))
        .as(Seq("dep", "bk")))
      .groupBy(col("dep"), col("bk")).agg(count(lit(1)).as("c"))
    val thr = tok.agg((count(lit(1)).cast("double") / fraction).as("thr"))
    var est = tok
    for (i <- 0 until depth) {
      val gi = grid.filter(col("dep") === i)
        .select(col("bk").as(s"bk$i"), col("c").as(s"c$i"))
      // broadcast is provably bounded: gi is one CMS row per bucket —
      // ≤ `width` rows by construction (a sketch hyperparameter), never
      // corpus-sized however many tokens hash into it.
      est = est.withColumn(s"bk$i", bucket(i)).join(broadcast(gi), s"bk$i")
    }
    est
      .withColumn("est", least((0 until depth).map(i => col(s"c$i")): _*))
      // thr is a 1-row global aggregate (the q44 convention)
      .join(broadcast(thr))
      .filter(col("est") >= col("thr"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"), first(col("thr")).as("t"))
      .filter(col("n").cast("double") >= col("t"))
      .select(col("token"), col("n"))
      .orderBy(col("n").desc, col("token"))
  }

  /** BPE tokenizer training (the first `k` merges): the classic algorithm
    * runs on the DISTINCT-WORD frequency table, never the corpus — one
    * corpus scan builds (word, count), and every merge iteration is an
    * adjacent-symbol-pair count over that vocabulary-sized table (Zipf:
    * MBs even for a 100 TB corpus) + one driver-side argmax (count desc,
    * pair asc — the deterministic tie-break) + a row-local greedy
    * left-to-right merge fold over each word's symbol array. Output is
    * the merge table (iter, p1, p2, weight) a tokenizer would persist.
    *
    * Oracle-checked via a generated DuckDB mirror (SparkEntry.
    * bpeOracleSql): each iteration's argmax is recomputed in SQL and
    * applied by a leftmost-occurrence-replace recursive CTE over the
    * sentinel-delimited symbol string — equivalent to the greedy fold
    * because a merged symbol can never equal either pattern symbol, so
    * no new match can appear left of a replacement.
    */
  def bpeMerges(s: SparkSession, d: String, k: Int = 8): DataFrame =
    bpeTrain(s, d, k)._1

  /** Training loop shared by q77 (the merge table) and q85 (corpus
    * encoding): returns (merges, final words table (w, sym, cnt)).
    */
  private[operators] def bpeTrain(s: SparkSession, d: String,
                                  k: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    import org.apache.spark.sql.types.{ArrayType, StringType}
    var words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        filter(split(col("w"), ""), x => length(x) > 0).as("sym"), col("cnt"))
    words = graft.Lineage.truncate(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (it <- 1 to k if !exhausted) {
      val zw = zip_with(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1),
        (x, y) => struct(x.as("p1"), y.as("p2")))
      val top = words
        .select(col("cnt"), explode(zw).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (w1, w2, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it, w1, w2, n))
        words = graft.Lineage.truncate(words.select(col("w"),
          mergeFold(col("sym"), w1, w2).as("sym"), col("cnt")))
      }
    }
    (merges.toSeq.toDF("iter", "p1", "p2", "n").orderBy("iter"), words)
  }

  /** Greedy left-to-right non-overlapping application of one merge to a
    * symbol array: fold carrying the previous uncommitted symbol
    * ("a a a" merges the FIRST two).
    */
  private def mergeFold(sym: Column, w1: String, w2: String): Column = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val init = struct(
      lit(Array.empty[String]).cast(ArrayType(StringType)).as("out"),
      lit(null).cast(StringType).as("p"))
    val commitP = (acc: Column) =>
      when(acc.getField("p").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("p"))))
    aggregate(sym, init,
      (acc, t) => when(acc.getField("p") === w1 && t === w2,
          struct(concat(acc.getField("out"), array(lit(w1 + w2))).as("out"),
            lit(null).cast(StringType).as("p")))
        .otherwise(struct(commitP(acc).as("out"), t.as("p"))),
      acc => commitP(acc))
  }

  /** Batched BPE training: per round, ONE pair-count job admits up to
    * `batch` merges instead of one, and all admitted merges apply in one
    * distributed pass — the per-iteration driver/job overhead that makes
    * a 32k-merge schedule driver-loop-bound amortizes `batch`-fold.
    *
    * Admission is ranked order (n DESC, p1, p2) with a SYMBOL-DISJOINT
    * filter: a pair is admitted only if neither symbol appears in any
    * earlier admitted pair or its merged output. Disjointness makes the
    * round's merges commute and keeps each admitted count exact as of the
    * round start. The schedule can still diverge from strict BPE — a
    * merge's OUTPUT can form new pairs that out-count the round's later
    * admissions, which only the next round sees — so this is the
    * documented approximate scale path; `batch = 1` is bit-identical to
    * [[bpeMerges]] (spec-asserted), the q58-style exactness bridge.
    */
  def bpeMergesBatched(s: SparkSession, d: String, k: Int = 64,
                       batch: Int = 16): DataFrame = {
    import s.implicits._
    var words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        filter(split(col("w"), ""), x => length(x) > 0).as("sym"), col("cnt"))
    words = graft.Lineage.truncate(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < k && !exhausted) {
      val zw = zip_with(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1),
        (x, y) => struct(x.as("p1"), y.as("p2")))
      val want = math.min(batch, k - merges.size)
      // over-fetch: ranked candidates rejected by disjointness make room
      val top = words
        .select(col("cnt"), explode(zw).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(math.max(4 * want, 16)).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val admitted = top.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .filter { case (p1, p2, _) =>
            val ok = !used(p1) && !used(p2)
            if (ok) { used += p1; used += p2; used += (p1 + p2) }
            ok
          }
          .take(want).toSeq
        admitted.foreach { case (p1, p2, n) =>
          merges += ((merges.size + 1, p1, p2, n))
        }
        val folded = admitted.foldLeft(col("sym")) {
          case (c, (p1, p2, _)) => mergeFold(c, p1, p2)
        }
        words = graft.Lineage.truncate(
          words.select(col("w"), folded.as("sym"), col("cnt")))
      }
    }
    merges.toSeq.toDF("iter", "p1", "p2", "n").orderBy("iter")
  }

  /** Corpus encoding under the trained BPE tokenizer (q85): the `k`-merge
    * model from [[bpeTrain]] is applied to the DISTINCT-WORD table (the
    * same vocabulary-sized table training ran on — encoding never touches
    * the corpus row-by-row), and the per-word token count joins back to
    * the exploded corpus for per-document totals. At 100 TB the encode
    * pass is one corpus scan + a vocab-sized join (AQE broadcasts it);
    * the iterative merge work stays on the Zipf-small vocabulary.
    */
  def bpeEncode(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val words = bpeTrain(s, d, k)._2
    val wmap = words.select(col("w"), size(col("sym")).as("nb"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(wmap, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nb")).cast("long").as("n_bpe"))
      .orderBy("doc_id")
  }

  /** Blocked FUZZY matching (entity resolution): part-name pairs within
    * edit distance 2. The expensive comparison runs on the DISTINCT
    * (block, name) grid — vocabulary-sized, corpus-size-independent —
    * and part-level pairs come from an expansion join proportional to
    * the OUTPUT, never a row-level self-join (the raw blocked self-join
    * ran 6.9 M levenshteins at sf0.1 where the distinct grid needs 52 k;
    * 11.9 s → sub-second, same result). Within the grid the block key
    * (brand) plus the |Δlen| ≤ 2 necessary condition bound candidates,
    * codegen'd `levenshtein` verifies, and `nm_a ≤ nm_b` / `ka < kb`
    * canonicalize. For unbounded name vocabularies the grid join swaps
    * for the LSH family (q51/q57) — same expansion step either way.
    */
  private def partNames(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey").as("k"), col("p_brand").as("blk"), col("p_name").as("nm"))

  /** The vocabulary-sized verification core shared by [[fuzzyPairs]] and
    * [[fuzzyClusters]]: similar DISTINCT-name pairs within a block.
    */
  private def namePairGrid(p: DataFrame, maxDist: Int): DataFrame = {
    val dn = p.select(col("blk"), col("nm")).distinct()
    dn.withColumnRenamed("nm", "nm_a")
      .join(dn.withColumnRenamed("nm", "nm_b"), Seq("blk"))
      .filter(col("nm_a") <= col("nm_b"))
      .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  def fuzzyPairs(s: SparkSession, d: String, maxDist: Int = 2): DataFrame = {
    val p = partNames(s, d)
    namePairGrid(p, maxDist)
      .join(p.withColumnsRenamed(Map("k" -> "ka", "nm" -> "nm_a")), Seq("blk", "nm_a"))
      .join(p.withColumnsRenamed(Map("k" -> "kb", "nm" -> "nm_b")), Seq("blk", "nm_b"))
      .filter(col("nm_a") =!= col("nm_b") || col("ka") < col("kb"))
      .select(least(col("ka"), col("kb")).as("a"),
        greatest(col("ka"), col("kb")).as("b"), col("dist"))
      .orderBy("a", "b")
  }

  /** The LINEAR-OUTPUT form of fuzzy entity resolution — what a user
    * materializes when duplicate clusters are dense and the pair set
    * (q99) goes quadratic in the answer (the measured sf10 case:
    * 64 names over 2 M parts ⇒ ~10⁹ true pairs): names connected by
    * distance ≤ 2 collapse into clusters (min-label propagation on the
    * vocabulary-sized name graph, `Dedup.resolveClusters`), every part
    * maps to its cluster keeper (min part key). One row per part, the
    * q50/q56 keeper-mapping pattern applied to fuzzy equivalence.
    */
  def fuzzyClusters(s: SparkSession, d: String, maxDist: Int = 2): DataFrame = {
    val p = partNames(s, d)
    val edges = namePairGrid(p, maxDist)
      .filter(col("nm_a") =!= col("nm_b"))
      .select(concat_ws("|", col("blk"), col("nm_a")).as("a"),
        concat_ws("|", col("blk"), col("nm_b")).as("b"))
    val reps = Dedup.resolveClusters(edges)
      .withColumnRenamed("doc_id", "node")
    val labeled = p.withColumn("node", concat_ws("|", col("blk"), col("nm")))
      .join(reps, Seq("node"), "left")
      .withColumn("rep", coalesce(col("rep"), col("node")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("rep"))
    labeled
      .select(col("k").as("p_partkey"), min(col("k")).over(w).as("keeper"))
      .orderBy("p_partkey")
  }
}
