package graft.operators

import graft.Tables
import graft.Lineage.TruncateOps
import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family (SURVEY.md §2c): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale invariant: NO O(n²) pairwise pass. Every near-dup operator
  * generates candidates through a bucketing key (shared shingle, LSH band
  * bucket, simhash chunk, label block) and only compares within buckets.
  * Hot buckets are the skew risk → AQE skew-join stays on; band width /
  * chunk count bound bucket fan-out.
  */
object Dedup {

  /** Char-level 5-gram near-dup pairs ≥ τ — the tokenizer-free dedup for
    * scripts where whitespace tokenization fails (CJK etc). Candidates
    * via the MinHash-LSH core (a direct all-pairs join on char grams is
    * Σ df² and detonates on shared-vocabulary corpora); each candidate is
    * verified with the EXACT char-gram Jaccard, so at the operating point
    * (true pairs ≫ τ) the output equals the exhaustive computation.
    */
  def charNgramJaccard(s: SparkSession, d: String, tau: Double = 0.6): DataFrame = {
    // Index probe (default): char-gram features are the engine's largest
    // exploded tables, so reading them from the persisted bucketed layout
    // (DedupIndex: offline write-once work) instead of re-extracting them
    // from corpus text per run is the biggest single §6 reuse win — the
    // candidate self-join AND the verification joins plan zero index-side
    // exchange. Recompute twin below (dial; spec-pinned row-identical).
    if (DedupIndex.useIndex(s)) {
      DedupIndex.ensureChar(s, d)
      indexedLshPairs(tau,
        bands = s.table(DedupIndex.tbl("cbands", d)),
        sig = s.table(DedupIndex.tbl("csig", d)),
        exD = s.table(DedupIndex.tbl("cshd", d)),
        sizes = s.table(DedupIndex.tbl("csizes", d)))
    } else {
      val ex = charShinglesOf(Tables.documents(s, d))
      // signatures come row-local (CharGramMinhash, bit-identical to the
      // 64-min-agg over ex — spec-asserted); ex stays for verification.
      minhashLshPairs(ex, tau, Some(signaturesRowLevelChar(
        Tables.documents(s, d), 5, 2)),
        materializeEx = materializeShingles(s, d))
    }
  }

  /** Char 5-gram stride-2 w-shingling: every 2nd gram position — half the
    * shingle volume, same near-dup separation (dups share the strided set
    * too). ROW-LOCAL like shinglesOf: in-array gram hashes →
    * array_distinct → explode (h is doc-keyed, so per-doc distinct ≡ a
    * global `.distinct()`), removing the engine's largest distinct
    * exchange. Shared by the q57 recompute path and the DedupIndex build.
    */
  private[graft] def charShinglesOf(docs: DataFrame, n: Int = 5): DataFrame =
    docs
      .filter(length(col("text")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, length(text) - ${n - 1}, 2), i -> xxhash64(substring(text, i, $n)))")))
        .as("h"))

  /** Char-gram analog of [[signaturesRowLevel]]. */
  private[graft] def signaturesRowLevelChar(docs: DataFrame, n: Int,
                                            stride: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .filter(length(col("text")) >= n) // cheap predicate, parity with ex
      .select(col("doc_id"), GraftFunctions.charMinhash(col("text"), n, stride).as("sig"))
      .select(col("doc_id") +:
        (0 until MinhashPerms).map(i => col("sig").getItem(i).as(s"m$i")): _*)
  }

  /** Resolve near-dup PAIRS into clusters by iterative min-label
    * propagation (each node adopts the smallest representative among
    * itself and its neighbors). Dup clusters are tiny and near-cliques,
    * so this converges in a handful of iterations; each iteration is one
    * join + one aggregate on the (small) pair set, never on the corpus.
    * Returns (doc_id, rep) for every doc that appears in a pair.
    */
  def resolveClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // materialize the (small) edge set once — otherwise every iteration
    // re-executes the whole upstream pair-generation pipeline
    val edges = graft.Lineage.truncate(
      pairs.select(col("a").as("x"), col("b").as("y"))
        .unionByName(pairs.select(col("b").as("x"), col("a").as("y"))))
    var labels = edges.select(col("x").as("doc_id")).distinct()
      .withColumn("rep", col("doc_id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "y2"), col("y") === col("y2"))
        .groupBy(col("x").as("doc_id"))
        .agg(min(col("rep")).as("nrep"))
      // Carry the previous label through the update so convergence is a
      // FILTER on the already-truncated result: the earlier form ran the
      // join+agg pipeline twice per iteration (once under the separate
      // changed-check join, once again under truncate) — cut the lineage
      // first, then read the materialized blocks for both the check and
      // the next iteration's labels.
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("rep").as("prev"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      val mat = graft.Lineage.truncate(updated) // cut the iterative lineage
      converged = mat.filter(col("rep") =!= col("prev")).limit(1).isEmpty
      labels = mat.select(col("doc_id"), col("rep"))
      i += 1
    }
    labels
  }

  /** Materialize the deduplicated corpus: drop every doc whose cluster
    * representative is a different (smaller) doc_id — near-dups from
    * MinHash+LSH plus exact dups by definition of the pair set.
    */
  def dedupedDocuments(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val toDrop = resolveClusters(minhashLsh(s, d, tau))
      .filter(col("rep") =!= col("doc_id"))
      .select(col("doc_id"))
    // No broadcast hint: the loser set can be ~half the corpus on a
    // duplicate-heavy crawl. AQE still broadcasts it at small SFs.
    Tables.documents(s, d)
      .join(toDrop, Seq("doc_id"), "left_anti")
  }

  /** Paragraph-level exact dedup — the SUB-document pass big-crawl
    * pipelines (C4, Dolma) run before document-level dedup: boilerplate
    * paragraphs (headers, license blocks, navigation) repeat across
    * thousands of otherwise-distinct pages, and dropping the paragraph
    * keeps the host document. Paragraph := fixed `para`-token window
    * (the corpus text carries no newlines; a newline splitter is the
    * same plan with a different first projection). A paragraph survives
    * only at its FIRST corpus position (min (doc_id, offset)); documents
    * are reassembled from their surviving paragraphs in order.
    *
    * Scale shape: NO window function and NO join-back — the keep-first
    * rule is one `groupBy(ptext).agg(min(struct(doc_id, st)))`, whose
    * map-side partial agg collapses duplicate paragraphs before the
    * exchange (boilerplate is by definition high-frequency, so the
    * partial agg eats it), and the winning struct already carries
    * everything reassembly needs. Two shuffles total, both partial-agg'd;
    * linear in corpus size.
    */
  def paragraphDedup(s: SparkSession, d: String, para: Int = 20): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val paras = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(1), size(col("ts")), lit(para))).as("st"))
      .select(col("doc_id"), col("st"),
        array_join(slice(col("ts"), col("st"), lit(para)), " ").as("ptext"))
    paras
      .groupBy(col("ptext"))
      .agg(min(struct(col("doc_id"), col("st"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.st").as("st"), col("ptext"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("st"), col("ptext"))).as("ps"))
      .select(col("doc_id"),
        array_join(transform(array_sort(col("ps")), p => p.getField("ptext")), " ")
          .as("text"),
        size(col("ps")).cast("long").as("n_kept"))
      .orderBy("doc_id")
  }

  /** Boilerplate strip — the frequency-threshold COMPLEMENT of
    * [[paragraphDedup]]: q105 keeps a repeated paragraph's FIRST corpus
    * occurrence; big-crawl boilerplate passes (license blocks, cookie
    * banners, navigation) instead drop EVERY occurrence of any paragraph
    * seen more than `maxOcc` times — repeated spans are memorization
    * hazards wherever they appear, including the first copy. Same fixed
    * `para`-token paragraphs as q105; documents reassembled from
    * survivors in order (a document that was ALL boilerplate vanishes).
    *
    * Scale shape, default `maxOcc = 1` (the standard "drop anything
    * repeated" rule): a surviving paragraph has corpus count EXACTLY 1,
    * so its one `(doc_id, st)` position IS `min(struct(doc_id, st))` —
    * the whole operator collapses to q105's aggregate-only plan with
    * `count = 1` where q105 has keep-first: ONE tokenize pass, ZERO
    * joins, two partial-agg'd shuffles, and the first exchange carries
    * distinct paragraphs only (boilerplate collapses map-side — the
    * first cut of this operator anti-joined every paragraph OCCURRENCE
    * against the frequency head and pushed the full corpus text through
    * that shuffle twice: 459 s at 50 M docs, 15.9× per 10× data, the
    * round's one above-linear number; this form is join-free).
    *
    * `maxOcc > 1` keeps the frequency-threshold anti join (all ≤ maxOcc
    * occurrences survive, so per-key agg state would no longer be one
    * struct) — keyed on md5(paragraph), the q50 exact-identity
    * convention: the drop-set build side carries 16-byte digests, not
    * text, so AQE can broadcast it from measured size far longer; no
    * hint either way (the q59 lesson), degradation = partitioned anti
    * join, not a dead driver.
    */
  def boilerplateStrip(s: SparkSession, d: String, para: Int = 20, maxOcc: Int = 1): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val paras = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(1), size(col("ts")), lit(para))).as("st"))
      .select(col("doc_id"), col("st"),
        array_join(slice(col("ts"), col("st"), lit(para)), " ").as("ptext"))
    val survivors =
      if (maxOcc == 1)
        paras
          .groupBy(col("ptext"))
          .agg(count(lit(1)).as("n_occ"),
            min(struct(col("doc_id"), col("st"))).as("f"))
          .filter(col("n_occ") === 1)
          .select(col("f.doc_id").as("doc_id"), col("f.st").as("st"), col("ptext"))
      else {
        val boiler = paras
          .groupBy(md5(col("ptext")).as("pkey"))
          .agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") > maxOcc)
          .select(col("pkey"))
        paras
          .withColumn("pkey", md5(col("ptext")))
          .join(boiler, Seq("pkey"), "left_anti")
          .select(col("doc_id"), col("st"), col("ptext"))
      }
    survivors
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("st"), col("ptext"))).as("ps"))
      .select(col("doc_id"),
        array_join(transform(array_sort(col("ps")), p => p.getField("ptext")), " ")
          .as("text"),
        size(col("ps")).cast("long").as("n_kept"))
      .orderBy("doc_id")
  }

  /** Near-dup resolution, keep-LONGEST variant: q56 keeps each cluster's
    * smallest doc_id; real corpus curation usually keeps the most
    * complete copy (truncated mirrors and excerpt pages are the dups).
    * Keeper := the cluster member with the most tokens, tie-broken to
    * the smallest doc_id. Emits the (doc_id, keeper) mapping for every
    * clustered doc — the table a curation pass joins against to swap
    * losers for keepers. The argmax window runs on the CLUSTERED docs
    * only (pair-set-sized, never corpus-sized).
    */
  def dedupKeepBest(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = resolveClusters(minhashLsh(s, d, tau))
    val ntok = Tables.documents(s, d)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
    val w = Window.partitionBy(col("rep")).orderBy(col("n").desc, col("doc_id"))
    val keepers = clusters.join(ntok, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rep"), col("doc_id").as("keeper"))
    clusters.join(keepers, "rep")
      .select(col("doc_id"), col("keeper"))
      .orderBy("doc_id")
  }

  /** Exact dedup: hash-groupBy on md5(text); keeps the minimum doc_id as
    * the canonical representative. One shuffle on the 32-char hash.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("h")

  /** Exploded distinct 3-token shingles, one row per (doc_id, shingle),
    * the shingle identity being its 64-bit hash `xxhash64(t, t1, t2)` —
    * every downstream consumer needs only equality, so no shuffle ever
    * carries shingle STRINGS (collision odds at n shingles ≈ n²/2⁶⁵).
    *
    * Built on the codegen path — posexplode tokens → windowed lead(1/2)
    * per doc → hash → distinct — instead of higher-order array lambdas,
    * which run interpreted (measured 24k shingles/s vs millions here).
    * The distinct's exchange doubles as the materialization barrier every
    * consumer (sizes, signatures, verification) reuses, the query-local
    * analog of a materialized shingle table at 100 TB.
    */
  private def explodedShingles(s: SparkSession, d: String): DataFrame =
    shinglesOf(Tables.documents(s, d))

  /** The same codegen shingling for ANY (doc_id, text) DataFrame —
    * shared with the streaming near-dup suppressor, which runs it per
    * micro-batch.
    */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame = {
    // ROW-LOCAL shingling: tokens → in-array 3-gram hashes →
    // array_distinct → explode. Bit-identical to the original
    // posexplode → per-doc lead-window → xxhash64 → global distinct
    // (h is keyed by doc, so per-doc distinct ≡ (doc_id,h) distinct),
    // but with ZERO exchanges where the window form shuffled AND sorted
    // the full token stream and the distinct added a second exchange —
    // per CONSUMER. At the 5 M-doc point those concurrent 150 M-row
    // window sorts were the largest memory consumers in the q51/q115
    // OOMs (round 5); in this form a shingle recompute is scan-speed.
    val ts = filter(split(col("text"), " "), t => length(t) > 0)
    docs
      .select(col("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(ts) - 2), i -> xxhash64(ts[i-1], ts[i], ts[i+1]))")))
        .as("h"))
  }

  /** Exact n-gram Jaccard pairs ≥ τ. A raw shingle self-join costs
    * Σ_shingle df², which one hot shingle ("in the of") turns quadratic
    * at 100×. Split shingles at document frequency dfCap:
    *
    *   inter(a,b) = |rare(a) ∩ rare(b)| + |hot(a) ∩ hot(b)|
    *
    * The rare half comes from the self-join restricted to df ≤ dfCap
    * (cost ≤ dfCap·Σdf, linear in corpus size, one shuffle — same
    * single-pass shape as the uncapped join). The hot half is a join
    * against the per-doc hot-shingle set table, whose width is bounded:
    * there are ≤ Σdf/dfCap hot shingles globally, and ≤ docLen per doc.
    * The sum is the exact intersection for every pair sharing ≥ 1 rare
    * shingle; a pair at τ whose shared shingles are ALL in >dfCap docs
    * is itself part of a >dfCap-sized near-dup cluster, which exact
    * dedup (q50) or the LSH path (q51) already catches.
    */
  def ngramJaccard(s: SparkSession, d: String, tau: Double = 0.5,
                   dfCap: Int = 256): DataFrame = {
    val (inter, sizes) = interAndSizes(s, d, dfCap)
    joinSizesAndScore(inter, sizes, tau)
  }

  /** Shared candidate machinery for the exact set-overlap family
    * (q53 Jaccard, q82 containment): (a,b,inter) for every pair sharing
    * ≥ 1 rare shingle, plus per-doc set sizes — the rare/hot df-cap
    * decomposition documented on [[ngramJaccard]].
    */
  private def interAndSizes(s: SparkSession, d: String,
                            dfCap: Int): (DataFrame, DataFrame) = {
    // Index probe (default): the persisted `wshh` table is bucketed and
    // sorted on `h`, so the rare-shingle SELF-join below — the operator's
    // dominant cost — and the df(h) aggregate both plan ZERO exchange and
    // no sort; `wsizes` replaces the per-run sizes aggregation outright.
    // Recompute twin behind the dial: row-local shingling shared across
    // the four consumers via the materializeShingles dial as before.
    val (ex, sizes) =
      if (DedupIndex.useIndex(s)) {
        DedupIndex.ensureWord(s, d)
        (s.table(DedupIndex.tbl("wshh", d)),
          s.table(DedupIndex.tbl("wsizes", d)))
      } else {
        val exRaw = explodedShingles(s, d)
        val ex0 = if (materializeShingles(s, d)) exRaw.truncated else exRaw
        (ex0, ex0.groupBy(col("doc_id")).agg(count(lit(1)).as("sz")))
      }
    // The effective cap is a corpus FRACTION, not an absolute df: df
    // grows with corpus size, so a fixed cap reclassifies ever more
    // shingles as hot at scale and the per-doc hot-set arrays balloon
    // (measured 47× time for 10× data at the 100× point with cap=256).
    // max(dfCap, n_docs/200) keeps both cost terms linear at any scale;
    // the exactness argument holds for ANY cap. n_docs rides in as a
    // 1-row aggregate cross-join (no hint needed — AQE broadcasts a
    // 1-row side unconditionally), not a separate driver action.
    val nDocs = Tables.documents(s, d).select(count(lit(1)).as("n_docs"))
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .filter(col("df") > greatest(lit(dfCap.toLong), col("n_docs") / 200))
      .select(col("h"))
    // no broadcast hint: |hot| ≤ Σdf/dfCap is small in practice but
    // corpus-derived; AQE broadcasts it when it measures small.
    val rareEx = ex.join(hot, Seq("h"), "left_anti")
    val interRare = rareEx.as("a").join(rareEx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter_rare"))
    val docHot = ex.join(hot, "h")
      .groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs"))
    val inter = interRare
      .join(docHot.select(col("doc_id").as("a"), col("hs").as("hsa")), Seq("a"), "left")
      .join(docHot.select(col("doc_id").as("b"), col("hs").as("hsb")), Seq("b"), "left")
      .select(col("a"), col("b"),
        (col("inter_rare") +
          coalesce(size(array_intersect(col("hsa"), col("hsb"))).cast("long"), lit(0L)))
          .as("inter"))
    (inter, sizes)
  }

  /** Shingle-set CONTAINMENT pairs: max(|A∩B|/|A|, |A∩B|/|B|) ≥ τ —
    * the asymmetric overlap that catches partial duplication (one doc
    * quoting, embedding, or extending another) that symmetric Jaccard
    * misses: a 50-shingle doc fully contained in a 500-shingle doc has
    * jaccard 0.1 but containment 1.0. Candidates come from the same
    * rare/hot decomposition as q53 (a pair at containment τ shares
    * ≥ τ·min(|A|,|B|) shingles, so the ≥-1-rare-shared-shingle recall
    * argument transfers unchanged); scoring divides by the SMALLER set.
    */
  def containmentPairs(s: SparkSession, d: String, tau: Double = 0.8,
                       dfCap: Int = 256): DataFrame = {
    val (inter, sizes) = interAndSizes(s, d, dfCap)
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("containment",
        round(col("inter").cast("double") / least(col("sza"), col("szb")), 4))
      .filter(col("containment") >= tau)
      .select("a", "b", "containment")
      .orderBy("a", "b")
  }

  /** inter(a,b) ⋈ sizes → rounded Jaccard ≥ τ, ordered. */
  private[graft] def joinSizesAndScore(inter: DataFrame, sizes: DataFrame, tau: Double): DataFrame =
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= tau)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")

  private[graft] val MinhashPerms = 64
  private[graft] val Bands = 16 // 16 bands × 4 rows

  /** One 64-minhash signature row per doc from a hashed shingle table —
    * map-side partial mins, the shuffle carries 64 longs per doc.
    */
  private[graft] def signaturesOf(ex: DataFrame): DataFrame = {
    val minAggs = (0 until MinhashPerms).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
  }

  /** The SHUFFLE-FREE signature path: one row-local pass per document
    * through the codegen'd [[graft.plans.MinhashSignature]] expression —
    * bit-identical to [[signaturesOf]]∘[[shinglesOf]] (asserted in spec)
    * but with zero exchanges: no explode, no per-doc window sort, no
    * distinct, no 64-agg shuffle. The signature stage of any minhash
    * operator becomes a projection on the scan, which is what a 100 TB
    * corpus pass (or a streaming admission path) wants.
    */
  private[graft] def signaturesRowLevel(docs: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // drop < 3-token docs (no shingles — parity with the groupBy path)
    // via a CHEAP predicate: a `sig.isNotNull` filter would be pushed
    // below the projection as isnotnull(graft_minhash(text)) and
    // recompute the whole signature once more per row in the scan.
    docs
      .filter(size(split(trim(col("text")), " +")) >= 3)
      .select(col("doc_id"), GraftFunctions.minhash(col("text")).as("sig"))
      .select(col("doc_id") +:
        (0 until MinhashPerms).map(i => col("sig").getItem(i).as(s"m$i")): _*)
  }

  /** (doc_id, band, bkey) LSH band keys of a signature table. */
  private[graft] def bandsOf(sig: DataFrame): DataFrame = {
    val rowsPerBand = MinhashPerms / Bands
    val bandKeys = (0 until Bands).map(j =>
      xxhash64(lit(j) +: (0 until rowsPerBand).map(r => col(s"m${j * rowsPerBand + r}")): _*))
    sig.select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
  }

  /** Signature-agreement count between two aliased signature sides. */
  private[graft] def agreement(aAlias: String, bAlias: String): Column =
    (0 until MinhashPerms)
      .map(i => when(col(s"$aAlias.m$i") === col(s"$bAlias.m$i"), 1).otherwise(0))
      .reduce(_ + _)

  // Permutation i of a shingle's 64-bit base hash h is xxhash64(i, h):
  // one string hash per shingle, then 64 cheap fixed-width long hashes —
  // ANSI-safe (no wrapping multiply) and fully codegen'd.

  /** MinHash + LSH near-dup detection: base-hash shingles → 64 min
    * aggregates (whole-stage-codegen HashAggregate with map-side partial
    * mins — the shuffle carries 64 longs per doc, not shingles) → 16 band
    * keys → bucket self-join → candidate pairs → exact-Jaccard
    * verification via the shared shingle exchange. Verified Jaccard
    * removes LSH false positives, so output = true near-dup pairs at LSH
    * recall (~1.0 at j≈0.98 with 16×4 banding).
    */
  def minhashLsh(s: SparkSession, d: String, tau: Double = 0.5): DataFrame =
    // Index probe (default): signatures, band keys, shingles and sizes
    // come from the persisted full-corpus layout (DedupIndex) — the
    // candidate self-join plans zero exchange on both sides and corpus
    // text is never read. Feeds q51 and every composite on top of it
    // (q56/q64/q107/q115). Recompute twin behind the dial: the row-local
    // signature expression (bit-identical to the shingle-table
    // aggregation, spec-asserted) with query-local shingle sharing.
    if (DedupIndex.useIndex(s)) {
      DedupIndex.ensureWord(s, d)
      indexedLshPairs(tau,
        bands = s.table(DedupIndex.tbl("wbands", d)),
        sig = s.table(DedupIndex.tbl("wsig", d)),
        exD = s.table(DedupIndex.tbl("wshd", d)),
        sizes = s.table(DedupIndex.tbl("wsizes", d)))
    } else
      minhashLshPairs(explodedShingles(s, d), tau,
        Some(signaturesRowLevel(Tables.documents(s, d))),
        materializeEx = materializeShingles(s, d))

  /** The LSH pair pipeline over PERSISTED index tables — same three
    * stages as [[minhashLshPairs]] (banded candidates → signature-
    * agreement pre-filter → exact-Jaccard verification), each stage a
    * probe of a bucketed table instead of a recomputed intermediate.
    * Candidates join on `bkey` ALONE (the LshIndex.probe argument: the
    * band id is hashed INTO bkey, a cross-band bkey equality needs a
    * 64-bit xxhash collision, and any phantom candidate dies in exact
    * verification — output unchanged), so the self-join needs no
    * exchange and no sort on either side. The sig/shingle sides keep the
    * merge hints of the recompute path: with bucketed inputs the SMJ is
    * exchange-free AND sort-free on the index side, and stays spillable
    * at any scale (the 5 M-doc SHJ-build lesson).
    */
  private def indexedLshPairs(tau: Double, bands: DataFrame,
                              sig: DataFrame, exD: DataFrame,
                              sizes: DataFrame): DataFrame = {
    val candRaw = bands.as("a").join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .dropDuplicates("a", "b")
    val agree = agreement("sa", "sb")
    val minAgree = math.max(0, math.ceil((tau - 0.25) * MinhashPerms).toInt)
    val cand = candRaw
      .join(sig.as("sa").hint("merge"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb").hint("merge"), col("b") === col("sb.doc_id"))
      .filter(agree >= minAgree)
      .select(col("a"), col("b"))
    verifyExactJaccard(exD, cand, sizes, tau)
  }

  /** Cross-source duplication matrix: for every unordered source pair,
    * the number of exact-verified near-dup pairs (jaccard ≥ τ) with one
    * side in each — the diagnostic behind corpus mixture design (which
    * crawls/dumps copy from which, where deduplication budget goes, and
    * which "independent" sources are actually mirrors). Rides on q51's
    * verified LSH machinery unchanged; pair volume is the near-dup count
    * (tiny relative to the corpus), so the two source lookups join a
    * small pair set against the 2-column (doc_id, source) projection of
    * the corpus — AQE broadcasts the pair side from measured size (no
    * hint, q59 lesson) and the corpus side is a column-pruned scan,
    * never a text read.
    */
  def sourceOverlap(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val pairs = minhashLsh(s, d, tau)
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("a"), col("source").as("sa")), "a")
      .join(src.select(col("doc_id").as("b"), col("source").as("sb")), "b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  /** The 100 TB fast path: near-dup pairs scored by the minhash ESTIMATE
    * alone (matching-minhash fraction, σ ≤ 0.063) — no shingle-level
    * verification join at all, so per-pair cost is 64 long equalities on
    * two signature rows. Use when the downstream (corpus pruning)
    * tolerates estimate noise around τ; `minhashLsh` is the exact twin.
    */
  def minhashApprox(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    // estimate-only → no shingle table is ever needed: signatures come
    // from the row-local codegen expression (zero exchanges before the
    // band join — the whole operator is scan → project → 1 pair shuffle).
    // Materializing the signature table (Lineage.truncate) is the
    // cache-vs-recompute dial: it wins while the 64-long rows fit
    // executor storage, and loses when they don't — at the 10000× point
    // (50 M docs ≈ 30 GB of signature blocks) the cached form spilled
    // the whole run into superlinear territory on one box, while
    // recomputing the row-local projection per consumer is just extra
    // scan+hash work that tracks corpus size. `spark.graft.dedup.
    // materializeSigs` = true | false | auto (auto: materialize below
    // ~10 M docs, metadata-count-cheap).
    val sigBase = signaturesRowLevel(Tables.documents(s, d))
    val sig = s.conf.get("spark.graft.dedup.materializeSigs", "auto") match {
      case "true"  => sigBase.truncated
      case "false" => sigBase
      case _ =>
        if (Tables.documents(s, d).count() <= 10000000L)
          sigBase.truncated
        else sigBase
    }
    val bands = bandsOf(sig)
    val candRaw = bands.as("a").join(bands.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .dropDuplicates("a", "b")
    val agree = agreement("sa", "sb")
    candRaw
      .join(sig.as("sa").hint("merge"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb").hint("merge"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        round(agree.cast("double") / MinhashPerms, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= tau)
      .orderBy("a", "b")
  }

  /** The q58 cache-vs-recompute dial, generalized to the SHINGLE table
    * (tens of rows × ~16 bytes per doc — an order of magnitude beyond a
    * signature row): materializing it wins while its blocks fit executor
    * storage and detonates when they don't. Measured round 5 at the
    * 5 M-doc point: the eager materialization's hash agg starved the
    * unified memory region mid-put (UNABLE_TO_ACQUIRE, 48 g heap,
    * q115/q51 path) while recomputing the shingle projection per
    * consumer is linear scan+hash work that tracks corpus size.
    * `spark.graft.dedup.materializeShingles` = true | false | auto
    * (auto: materialize below 2 M docs, metadata-count-cheap). On a
    * real cluster the storage pool scales with executors, so `true` is
    * safe far longer there — the dial is per-deployment.
    */
  private def materializeShingles(s: SparkSession, d: String): Boolean =
    s.conf.get("spark.graft.dedup.materializeShingles", "auto") match {
      case "true"  => true
      case "false" => false
      case _       => Tables.documents(s, d).count() <= 2000000L
    }

  /** Shared LSH front-end: materialized shingles, materialized minhash
    * signatures, and the band-bucket candidate pair set (a, b).
    */
  private def lshCandidates(exIn: DataFrame,
                            sigOpt: Option[DataFrame] = None,
                            materializeEx: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    // The shingle table feeds several consumers (sizes, signatures, both
    // sides of exact verification). Materialize it once — the
    // query-local analog of the materialized shingle table a 100 TB
    // deployment would keep as a real table — UNLESS the
    // materializeShingles dial says the blocks won't fit this box.
    val ex = if (materializeEx) exIn.truncated else exIn
    // One row per doc, 64 longs — tiny; materialized because it feeds
    // four plan branches (two band sides, two agreement-join sides).
    // Callers whose features are word 3-grams supply the shuffle-free
    // row-level signature instead of the shingle-table aggregation.
    val sig = sigOpt.getOrElse(signaturesOf(ex)).truncated
    val bands = bandsOf(sig)
    // the band SELF-join is corpus-sized on both sides (16 band rows per
    // doc) → merge hint, like every unbounded side (the 5 M-doc SHJ-build
    // lesson). The persisted-index probe (LshIndex) keeps its own plan:
    // its index side is BUCKETED, so it joins with zero exchange and no
    // hash build at all.
    val candRaw = bands.as("a").join(bands.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .dropDuplicates("a", "b")
    (ex, sig, candRaw)
  }

  /** LSH + exact-verification core over ANY hashed shingle table
    * (doc_id, h). Works for word grams, char grams, or any feature set —
    * candidate cost is bounded by the banding, never by Σ df² of an
    * all-pairs shingle join (char grams on a shared vocabulary made that
    * explode: 133 s vs ~3 s at sf0.1).
    */
  private def minhashLshPairs(exIn: DataFrame, tau: Double,
                              sigOpt: Option[DataFrame] = None,
                              materializeEx: Boolean = true): DataFrame = {
    val (ex, sig, candRaw) = lshCandidates(exIn, sigOpt, materializeEx)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // Signature-agreement pre-filter: the matching-minhash count is an
    // unbiased Jaccard estimate (σ = √(j(1-j)/64) ≤ 0.063), so requiring
    // agreement ≥ (τ - 0.25)·64 is a >4σ-safe bound for ANY true pair at
    // τ while rejecting the band-collision false positives a shared
    // vocabulary produces (measured 103k candidates → a few hundred).
    // Exact verification below keeps the output exact; this only shrinks
    // the expensive shingle-level join — the verification cost driver at
    // 100 TB. The sig side is CORPUS-sized (one 64-long row per doc), so
    // its joins carry `merge` hints: AQE's SMJ→SHJ conversion thresholds
    // on COMPRESSED shuffle bytes, and at the 5 M-doc point its 32
    // concurrent unspillable signature-map builds exhausted the executor
    // pool (round-5 measurement; same mechanism as the lmScore model
    // joins). A sort-merge join spills; auto-broadcast only ever applied
    // below ~100 k docs (64 MB of signature rows), where everything is
    // fast regardless — the hint costs nothing there.
    val agree = agreement("sa", "sb")
    val minAgree = math.max(0, math.ceil((tau - 0.25) * MinhashPerms).toInt)
    val cand = candRaw
      .join(sig.as("sa").hint("merge"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb").hint("merge"), col("b") === col("sb.doc_id"))
      .filter(agree >= minAgree)
      .select(col("a"), col("b"))
    verifyExactJaccard(ex, cand, sizes, tau)
  }

  /** Exact-Jaccard verification restricted to a candidate pair set:
    * shingles of side a joined against the candidate set, matched against
    * shingles of side b. No broadcast hint on the candidate side — it is
    * banding-bounded in expectation but skew-prone on adversarial
    * corpora; AQE broadcasts it at small SFs and shuffles it when big.
    */
  private def verifyExactJaccard(ex: DataFrame, cand: DataFrame,
                                 sizes: DataFrame, tau: Double): DataFrame = {
    val candA = ex.join(cand, col("doc_id") === col("a"))
      .select(col("a"), col("b"), col("h"))
    // the b-side shingle stream is corpus-sized → merge hint (spillable;
    // the 5 M-doc SHJ-build lesson — see minhashLshPairs)
    val inter = candA.join(ex.as("y").hint("merge"),
        col("y.doc_id") === col("b") && col("y.h") === candA("h"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    joinSizesAndScore(inter, sizes, tau)
  }

  /** Cross-corpus near-dup join — "which documents of the NEW crawl are
    * near-dups of the EXISTING corpus" (the incremental-ingestion shape;
    * here corpus A = sources src0-src9, corpus B = src10-src19). Unlike
    * the self-join operators this only forms A×B candidates: band keys of
    * A join band keys of B, so cost is |A|'s collisions against B — never
    * within-corpus pairs that would be discarded anyway, and never O(n²).
    * Signatures are the row-local codegen expression on both sides;
    * candidates pass the signature-agreement pre-filter, then exact
    * word-3-gram Jaccard verification. Output (a ∈ A, b ∈ B, jaccard ≥ τ)
    * is exact at LSH recall, same as q51.
    */
  def crossCorpusNearDup(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, d)
    val aSrc = (0 to 9).map(i => s"src$i")
    val inA = col("source").isin(aSrc: _*)
    val (da, db) = (docs.filter(inA), docs.filter(!inA))
    // same materializeShingles dial as the self-join operators: at the
    // 5 M-doc point the two cached shingle halves are the same blocks
    // that starved q51's path; signatures (64 longs/doc) stay cached
    val matEx = materializeShingles(s, d)
    val exA = if (matEx) shinglesOf(da).truncated else shinglesOf(da)
    val exB = if (matEx) shinglesOf(db).truncated else shinglesOf(db)
    val sigA = signaturesRowLevel(da).truncated
    val sigB = signaturesRowLevel(db).truncated
    val candRaw = bandsOf(sigA).as("a").join(bandsOf(sigB).as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .dropDuplicates("a", "b")
    val minAgree = math.max(0, math.ceil((tau - 0.25) * MinhashPerms).toInt)
    // corpus-sized sig/shingle sides carry merge hints (the 5 M-doc
    // SHJ-build lesson — see minhashLshPairs)
    val cand = candRaw
      .join(sigA.as("sa").hint("merge"), col("a") === col("sa.doc_id"))
      .join(sigB.as("sb").hint("merge"), col("b") === col("sb.doc_id"))
      .filter(agreement("sa", "sb") >= minAgree)
      .select(col("a"), col("b"))
    // sizes from both sides (doc_ids are disjoint across the corpora)
    val sizes = exA.unionByName(exB)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val candA = exA.join(cand, col("doc_id") === col("a"))
      .select(col("a"), col("b"), col("h"))
    val inter = candA.join(exB.as("y").hint("merge"),
        col("y.doc_id") === col("b") && col("y.h") === candA("h"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    joinSizesAndScore(inter, sizes, tau)
  }

  private val SimhashBits = 64
  // 16-bit chunks: pigeonhole-complete for hamming ≤ 3, and fine enough
  // that biased bit distributions (shared-vocab corpora) don't collapse
  // into giant candidate buckets — 8-bit chunks measured a ~40× candidate
  // blowup on the synthetic corpus.
  private val SimhashChunks = 4

  /** 64-bit SimHash per document: per-bit ±1 majority over token hashes,
    * built as 64 conditional aggregates in one groupBy pass.
    */
  def simhashSignatures(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until SimhashBits).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until SimhashBits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), simhash.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, candidate
    * generation by 16-bit chunk equality (pigeonhole-complete for ≤ 3;
    * for the 4..6 range recall is high but not guaranteed).
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(s, d)
    val chunkKeys = (0 until SimhashChunks).map(j =>
      shiftrightunsigned(col("simhash"), j * (SimhashBits / SimhashChunks))
        .bitwiseAND(lit((1L << (SimhashBits / SimhashChunks)) - 1)))
    val chunks = sig.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkKeys: _*)).as(Seq("chunk", "ckey")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("a", "b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** Oracle-checked SimHash bridge (the q61b pattern applied to q52):
    * identical algorithm — per-bit ±1 token-hash majority, chunked
    * candidate generation, hamming filter — but the token hash is the
    * first 32 bits of md5 read nibble-by-nibble, which BOTH engines can
    * compute character-for-character (DuckDB mirrors each nibble as
    * strpos('0123456789abcdef', …)−1). xxhash64 stays the production
    * hash (q52: one codegen call/token vs 8 string ops); this variant
    * pins the simhash MACHINERY — majority vote, signature assembly,
    * pigeonhole chunking, bit_count hamming — against an exact SQL
    * mirror. 32 bits / 4 chunks keeps the ≤3-hamming pigeonhole of q52.
    */
  def simhashPairsMirrorable(s: SparkSession, d: String,
                             maxHamming: Int = 3): DataFrame = {
    // Index probe (default): the signature computation — an md5 per token
    // plus a 32-conditional-sum aggregate over every token occurrence —
    // is the operator's whole cost and is corpus-invariant, so it lives
    // in the persisted `mchunks` layout (DedupIndex); the timed query is
    // the chunk-equality self-join, which the (ckey, chunk) bucketing
    // plans with zero exchange and no sort. Recompute twin behind the
    // dial (spec-pinned row-identical).
    val ch =
      if (DedupIndex.useIndex(s)) {
        DedupIndex.ensureMirror(s, d)
        s.table(DedupIndex.tbl("mchunks", d))
      } else mirrorChunksOf(Tables.documents(s, d))
    // ckey leads the predicate so the required SMJ ordering matches the
    // persisted (ckey, chunk) sort — equality key order is join-semantics
    // neutral.
    ch.as("a").join(ch.as("b"),
        col("a.ckey") === col("b.ckey") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("a", "b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** The q52b signature machinery — (doc_id, simhash, chunk, ckey), one
    * row per 8-bit chunk of the 32-bit mirrorable simhash. Shared by the
    * recompute path and the DedupIndex `mchunks` build.
    */
  private[graft] def mirrorChunksOf(docs: DataFrame): DataFrame = {
    val bits = 32
    val chunks = 4
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("m", md5(col("t")))
    // nibble j (0..7) of the md5 hex prefix as an integer 0..15 —
    // ONE base-16 conv of the 8-char prefix per token, nibbles peeled off
    // by shifts (8 separate convs measured ~3× slower). The DuckDB mirror
    // spells each nibble strpos('0123456789abcdef', …)−1 — same values.
    val nibs = tok
      .withColumn("v32", conv(substring(col("m"), 1, 8), 16, 10).cast("long"))
      .select(col("doc_id") +: (0 until bits / 4).map(j =>
        shiftrightunsigned(col("v32"), 4 * (7 - j)).bitwiseAND(lit(15L))
          .as(s"n$j")): _*)
    val bitSums = (0 until bits).map(i =>
      sum(when(shiftrightunsigned(col(s"n${i / 4}"), i % 4)
        .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i"))
    val agg = nibs.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until bits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val sig = agg.select(col("doc_id"), simhash.as("simhash"))
    val chunkKeys = (0 until chunks).map(j =>
      shiftrightunsigned(col("simhash"), j * (bits / chunks))
        .bitwiseAND(lit((1L << (bits / chunks)) - 1)))
    sig.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkKeys: _*)).as(Seq("chunk", "ckey")))
  }

  /** Embedding near-dup with LSH-bucket blocking — the metadata-free
    * scale path: pairs are only formed inside a random-hyperplane bucket
    * (plus would-be 1-bit probes at higher recall settings), so cost is
    * Σ_bucket n_b² instead of n².
    */
  /** Pair-grid width for the bucket self-join below. The join's
    * parallelism is the number of distinct key values — exactly ONE in
    * the bits=0 exhaustive-bridge case (q55b), where the whole O(n²)
    * scoring pass collapsed onto a single task (measured 277 s at sf1 on
    * 32 cores — zero parallel speedup). Salting the key with a
    * deterministic grid coordinate (§2.5: synthetic partitioning keys)
    * restores ≥ PairGrid-way parallelism at ANY bucket cardinality while
    * the pair set — and therefore every output row — is invariant to the
    * grid. Not a core-count constant: a parallelism FLOOR for degenerate
    * bucket distributions; AQE coalesces the empties on small inputs.
    */
  private val PairGrid = 32L

  def embeddingCosineLsh(s: SparkSession, d: String, tau: Double = 0.3,
                         bits: Int = 8): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), bits).as("bucket"),
        GraftFunctions.norm(col("embedding")).as("nrm"),
        pmod(col("vec_id"), lit(PairGrid)).as("g"))
    // Every unordered pair (a,b) with a.vec_id < b.vec_id still forms
    // exactly once: the a side is lifted across all grid cells and the
    // equi key matches the cell carrying b's coordinate. The merge hint
    // is load-bearing: without it the planner broadcasts the b side and
    // streams the exploded a side over the SCAN's partitioning — one
    // parquet split ⇒ still one task (measured 400 s at sf1: the grid's
    // replication paid, its parallelism not). Forcing the shuffle plans
    // both sides' exchanges on (bucket, grid), which is where the
    // parallelism actually comes from; AQE skew-split stays applicable.
    val ea = e.withColumn("gj", explode(sequence(lit(0L), lit(PairGrid - 1))))
    ea.as("a").join(e.as("b").hint("merge"),
        col("a.bucket") === col("b.bucket") && col("a.gj") === col("b.g") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(
        GraftFunctions.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"), col("cos"))
      .orderBy("a", "b")
  }

  /** Embedding near-dup: cosine ≥ τ within a blocking key (label). The
    * block is the shuffle key; at scale the block would be an LSH bucket
    * (see Similarity.lshBucket) instead of a metadata label.
    *
    * Norms are computed once per VECTOR before the pair join (not once
    * per pair), and the per-pair work is a single codegen'd dot product
    * ([[graft.plans.ArrayDotProduct]]) — measured 60 s → ~2 s at sf0.1.
    */
  def embeddingCosine(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"),
        GraftFunctions.norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(
        GraftFunctions.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"), col("cos"))
      .orderBy("a", "b")
  }
}
