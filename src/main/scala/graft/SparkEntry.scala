package graft

import graft.operators._
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 for the inventory each key maps to.
  *
  * Every oracle-checked query aliases columns identically on both sides,
  * rounds doubles to 4dp on both sides, widens derived integers to BIGINT
  * on both sides, and carries a total-order ORDER BY.
  */
object SparkEntry {

  /** Flagship: the 5-table star join at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Relational.multiJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2b core relational
    "q01_agg_pricing"        -> (Relational.aggPricing _),
    "q02_filter_pushdown"    -> (Relational.filterPushdown _),
    "q03_broadcast_join"     -> (Relational.broadcastJoin _),
    "q04_multi_join"         -> (Relational.multiJoin _),
    "q05_topk"               -> (Relational.topK(_, _)),
    "q06_distinct_agg"       -> (Relational.distinctAgg _),
    "q07_window_rank"        -> (Relational.windowRank _),
    "q07b_topk_custom_op"    -> (Relational.topKPerKeyCustom _),
    "q07c_window_suite"      -> (Relational.windowSuite _),
    "q08_semi_anti_join"     -> (Relational.semiAntiJoin _),
    "q26_scalar_subq"        -> (Relational.scalarSubq _),
    "q28_profile"            -> (Profiler.profileDocuments _),
    "q27_exists_subq"        -> (Relational.existsSubq _),
    "q09_union_dedup"        -> (Relational.unionDedup _),
    "q09b_set_ops"           -> (Relational.setOps _),
    "q10_rollup"             -> (Relational.rollupAgg _),
    "q10b_cube"              -> (Relational.cubeAgg _),
    "q11_correlated_subq"    -> (Relational.correlatedSubq _),
    "q12_having"             -> (Relational.havingAgg _),
    "q13_sessionize"         -> (EventOps.sessionize _),
    "q14_pivot"              -> (Relational.pivotEvents _),
    "q15_percentiles"        -> (Relational.percentiles _),
    "q16_stats"              -> (Relational.statsAgg _),
    "q17_moving_avg"         -> (Relational.movingAvg _),
    "q17b_range_window"      -> (Relational.rangeWindow _),
    "q65_approx_distinct"    -> ((s, d) => Relational.approxDistinct(s, d)),
    // q65's accuracy contract made driver-checkable: exact side + bound flag
    "q65b_approx_distinct_bridge" -> ((s, d) => Relational.approxDistinctBridge(s, d)),
    "q18_asof_join"          -> (Relational.asofJoin _),
    "q19_range_join"         -> (Relational.rangeJoin _),
    // §2a reference-derived
    "q20_json_extract"       -> (EventOps.jsonExtract _),
    "q21_explode_tokens"     -> (EventOps.explodeTokens _),
    "q22_dual_conditional_count" -> (EventOps.dualConditionalCount _),
    "q23_accumulate_nested"  -> (EventOps.accumulateNested _),
    "q24_funnel"             -> (EventOps.funnel _),
    "q30_stream_windowed_counts" -> (StreamOps.windowedCounts _),
    // same aggregation paced through 8 micro-batches: event-time results
    // are invariant to micro-batch boundaries (same oracle as q30)
    "q30b_stream_paced"      -> ((s, d) => StreamOps.windowedCountsPaced(s, d)),
    "q31_stream_dedup"       -> (StreamOps.streamDedup _),
    "q31b_stream_dedup_watermark" -> (StreamOps.streamDedupWatermarked _),
    "q32_stream_session_window" -> (StreamOps.sessionWindows _),
    "q33_stream_sliding"     -> (StreamOps.slidingCounts _),
    "q34_stream_stateful"    -> (StreamOps.statefulCounts _),
    "q35_stream_static_join" -> (StreamOps.streamStaticJoin _),
    "q37_stream_flatmap_sessions" -> (StreamOps.statefulSessions _),
    "q38_stream_neardup_suppress" -> ((s, d) => StreamOps.nearDupSuppress(s, d)),
    "q36_stream_stream_join" -> (StreamOps.streamStreamJoin _),
    // §2c text analysis
    "q40_lang_id"            -> (TextAnalysis.langId _),
    "q41_quality_score"      -> (TextAnalysis.qualityScore _),
    "q42_token_count"        -> (TextAnalysis.tokenCount _),
    "q43_fingerprint"        -> (TextAnalysis.fingerprint _),
    "q44_tfidf"              -> ((s, d) => TextAnalysis.tfidf(s, d)),
    "q25_retention"          -> (EventOps.retention _),
    "q29_full_outer"         -> (EventOps.fullOuter _),
    "q45_quality_gate"       -> (QualityGate.checkDocuments _),
    "q46_bigram_lm"          -> ((s, d) => CorpusOps.bigramCounts(s, d)),
    "q47_pack_sequences"     -> ((s, d) => CorpusOps.packSequences(s, d)),
    "q48_source_mix"         -> (CorpusOps.sourceMix _),
    "q73_vocab_coverage"     -> ((s, d) => CorpusOps.vocabCoverage(s, d)),
    "q74_novelty"            -> ((s, d) => CorpusOps.novelty(s, d)),
    "q75_temperature_mix"    -> (CorpusOps.temperatureMix _),
    "q79_chunk_documents"    -> ((s, d) => CorpusOps.chunkDocuments(s, d)),
    "q49_repetition"         -> (CorpusOps.repetition _),
    "q59_decontaminate"      -> ((s, d) => CorpusOps.decontaminate(s, d)),
    "q66_top_tokens"         -> ((s, d) => TextAnalysis.topTokens(s, d)),
    // BPE merge training: data-dependent per-iteration argmax → no static
    // SQL mirror; constructed-corpus merges hand-checked in spec
    "q77_bpe_merges"         -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    // engine-exact quantized GD (hard sigmoid, integer-grid features) →
    // the DuckDB mirror replays 3 full iterations bit-for-bit
    "q78_quality_classifier" -> ((s, d) => QualityModel.train(s, d)),
    "q67_sample_corpus"      -> ((s, d) => CorpusOps.sampleCorpus(s, d)),
    "q69_substring_dedup"    -> ((s, d) => CorpusOps.duplicateSpans(s, d)),
    // Bloom pre-filter + exact confirmation ≡ q59 — checked by the SAME oracle
    "q72_bloom_decontaminate" -> ((s, d) => CorpusOps.decontaminateBloom(s, d)),
    "q64_training_corpus"    -> ((s, d) => Pipeline.trainingCorpus(s, d)),
    // STREAMING maintainer of the same corpus: micro-batch replay into
    // persistent curation state (pairs via the persisted-index probe
    // shape, fps, contamination), assembled ≡ the one-shot pipeline —
    // hash-checked by q64's own stage mirror
    "q64s_stream_training_corpus" ->
      ((s, d) => StreamOps.trainingCorpusStream(s, d)),
    // §2c dedup
    "q50_dedup_exact"        -> (Dedup.exact _),
    "q58_dedup_minhash_approx" -> ((s, d) => Dedup.minhashApprox(s, d)),
    "q51_dedup_minhash_lsh"  -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q52_dedup_simhash"      -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q53_ngram_jaccard"      -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q54_dedup_embedding"    -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "q55_dedup_embedding_lsh" -> ((s, d) => Dedup.embeddingCosineLsh(s, d)),
    // bits=0 ⇒ ONE bucket ⇒ every pair forms through the IDENTICAL
    // bucket/join/score machinery — the oracle-checked bridge for q55
    // (the q61b full-fanout pattern applied to the pair-LSH path)
    "q55b_dedup_embedding_lsh_full" ->
      ((s, d) => Dedup.embeddingCosineLsh(s, d, bits = 0)),
    "q56_deduped_corpus"     -> ((s, d) => Dedup.dedupedDocuments(s, d)
                                    .orderBy("doc_id").select("doc_id", "text")),
    "q57_char_ngram_jaccard" -> ((s, d) => Dedup.charNgramJaccard(s, d)),
    "q71_crosscorpus_neardup" -> ((s, d) => Dedup.crossCorpusNearDup(s, d)),
    // sub-document boilerplate removal (C4/Dolma paragraph pass)
    "q105_paragraph_dedup"   -> ((s, d) => Dedup.paragraphDedup(s, d)),
    // q71's semantics served from the PERSISTED bucketed LSH index
    // (bands/sigs/shingles/sizes tables): corpus text never re-read,
    // index side never shuffles — same exhaustive oracle as q71
    "q106_lsh_index_probe"   -> ((s, d) => LshIndex.probe(s, d)),
    // near-dup clusters, keep-LONGEST keeper (curation's usual rule)
    "q107_dedup_keep_best"   -> ((s, d) => Dedup.dedupKeepBest(s, d)),
    // §2c similarity search
    "q60_knn_brute"          -> ((s, d) => Similarity.knnBrute(s, d)),
    "q61_knn_ivf"            -> ((s, d) => Similarity.knnLshIndexed(s, d)),
    // full probe fan-out (radius 8 = all buckets) ≡ exhaustive search:
    // the oracle-checked correctness bridge for the whole IVF code path
    // (bucketing, probe-set expansion, probe scoring)
    "q61b_knn_ivf_full"      -> ((s, d) => Similarity.knnLshIndexed(s, d, probeRadius = 8)
                                    .select("vec_id", "sim")),
    // true IVF (k-means-trained codebook) — nprobe=2 of 8 cells is the
    // approximate scale path (rows-only; recall vs exhaustive in spec)
    "q76_knn_ivf_kmeans"     -> ((s, d) => Similarity.knnIvfKmeans(s, d)),
    // all-cells probe ≡ exhaustive: oracle bridge for training +
    // assignment + probe selection + scoring (the q61b pattern)
    "q76b_knn_ivf_kmeans_full" -> ((s, d) => Similarity.knnIvfKmeans(s, d, nprobe = 8)),
    // MATERIALIZED IVF index (cell-partitioned vectors + codebook table);
    // all-cells probe ≡ exhaustive oracles the persisted path end-to-end
    // (codebook read-back, partitioned assignment, probe scoring); the
    // nprobe=2 pruning equivalence with q76 is spec-asserted
    "q76c_knn_ivf_indexed"   -> ((s, d) => Similarity.knnIvfIndexed(s, d, nprobe = 8)),
    // SemDeDup (Abbas et al. 2023): k-means clusters → within-cluster
    // cosine prune, min-id keeper; oracled by an unrolled DuckDB mirror
    // of the quantized Lloyd iterations (the q63 recipe) + pair join
    "q80_semdedup"           -> ((s, d) => Similarity.semDedup(s, d)),
    "q62_embedding_centroids" -> (Similarity.centroids _),
    "q68_quantize_embeddings" -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "q63_kmeans"             -> ((s, d) => Similarity.kmeans(s, d)),
    // §2c multimodal (declarative metadata path)
    "q70_binary_meta"        -> (Multimodal.binaryMeta _),
    // audio-shaped near-dup: batched frame-energy decode → delta-sign
    // fingerprint → landmark blocking → exact integer-L1 verification;
    // at maxL1=0 ≡ the exhaustive group-by-profile oracle
    "q108_audio_fingerprint" -> ((s, d) => Multimodal.audioNearDup(s, d)),
    // bigram-LM likelihood filter (integer-exact ppm grid, no log)
    "q81_lm_score"           -> ((s, d) => CorpusOps.lmScore(s, d)),
    // asymmetric shingle overlap — partial-duplication detection
    "q82_containment"        -> ((s, d) => Dedup.containmentPairs(s, d)),
    // exact-dup cluster-size histogram (corpus diagnostic over q50's exchange)
    "q83_dup_histogram"      -> ((s, d) => CorpusOps.dupHistogram(s, d)),
    // SimHash machinery on md5-nibble bits: the oracle-checked bridge for
    // q52 (xxhash64 stays the production hash; same majority/chunk/hamming)
    "q52b_simhash_mirror"    -> ((s, d) => Dedup.simhashPairsMirrorable(s, d)),
    // count-min-pruned EXACT heavy hitters — no vocabulary-wide shuffle
    "q84_heavy_hitters"      -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    // corpus encoded under the trained BPE model — vocab-sized merge work
    "q85_bpe_encode"         -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    // reference-trained trigram LM, stupid backoff — real OOD filtering
    "q86_trigram_lm"         -> ((s, d) => CorpusOps.trigramScore(s, d)),
    // MERGE INTO semantics: one full-outer shuffle applies U/D/I feed
    "q87_merge_upsert"       -> ((s, d) => Cdc.mergeUpsert(s, d)),
    // q87 over the MAINTAINED o_orderkey-bucketed base: zero base-side
    // exchange (only the delta-sized feed shuffles) — same oracle
    "q87b_merge_upsert_bucketed" -> ((s, d) => Cdc.mergeUpsertBucketed(s, d)),
    // snapshot CDC diff by content hash — added/removed/changed
    "q88_snapshot_diff"      -> ((s, d) => Cdc.snapshotDiff(s, d)),
    // iterative PageRank, integer-ppm — engine-exact unrolled mirror
    "q89_pagerank"           -> ((s, d) => Graph.pageRank(s, d)),
    // per-source doc cap through the bounded-heap TopKPerKey operator
    "q90_source_cap"         -> ((s, d) => CorpusOps.sourceCap(s, d)),
    // exact type-1 quantiles on the value-histogram — no raw-row sort
    "q91_hist_quantiles"     -> ((s, d) => CorpusOps.histQuantiles(s, d)),
    // q87's feed as a STREAM merged into initial-state keyed state —
    // hash-checked against the same oracle as the batch MERGE
    "q92_stream_merge"       -> ((s, d) => graft.streaming.StreamOps.streamMergeApply(s, d)),
    // materialized-view upkeep: base agg ⊕ delta agg, no base rescan
    "q93_incremental_agg"    -> ((s, d) => Cdc.incrementalAgg(s, d)),
    // q93 over the o_custkey-bucketed base: the aggs AND the merge join
    // all inherit the scan's partitioning — zero exchanges end to end
    "q93b_incremental_agg_bucketed" -> ((s, d) => Cdc.incrementalAggBucketed(s, d)),
    // materialize q75's temperature mix by stochastic-rounded replication
    "q94_apply_mix"          -> ((s, d) => CorpusOps.applyMix(s, d)),
    // 2σ outliers via integer cross-multiplied moments — no floats at all
    "q95_outliers"           -> ((s, d) => Profiler.outliers(s, d)),
    // cross-table referential-integrity audit (orphan foreign keys)
    "q96_ri_audit"           -> ((s, d) => QualityGate.riAudit(s, d)),
    // per-source uniform k-sample through the bounded-heap operator
    "q97_group_sample"       -> ((s, d) => CorpusOps.groupSample(s, d)),
    // content-addressed multimodal dedup: digest shuffle, payloads stay put
    "q98_binary_dedup"       -> (Multimodal.binaryDedup _),
    // blocked fuzzy matching: brand block + length band, codegen levenshtein
    "q99_fuzzy_match"        -> ((s, d) => TextAnalysis.fuzzyPairs(s, d)),
    // dirty-feed ingestion: malformed slice rejected as null, job survives
    "q100_tolerant_parse"    -> (EventOps.tolerantParse _),
    // deterministic 90/5/5 split manifest — no RNG, no leakage on re-runs
    "q101_split_corpus"      -> ((s, d) => CorpusOps.splitCorpus(s, d)),
    // join-key skew diagnostic: exact top-k heavy keys + ppm share
    "q102_key_skew"          -> ((s, d) => Profiler.keySkew(s, d)),
    // fuzzy ER in linear-output cluster form (dense-duplicate scale path)
    "q103_fuzzy_clusters"    -> ((s, d) => TextAnalysis.fuzzyClusters(s, d)),
    // PERCEPTUAL multimodal near-dup: batched decode → features → LSH+cosine
    "q104_perceptual_neardup" -> ((s, d) => Multimodal.perceptualNearDup(s, d)),
    // token-budget selection via the distributed prefix-sum utility
    "q109_token_budget"      -> ((s, d) => CorpusOps.tokenBudget(s, d)),
    // frequency-threshold boilerplate removal (drop EVERY occurrence)
    "q110_boilerplate_strip" -> ((s, d) => Dedup.boilerplateStrip(s, d)),
    // per-source quantile calibration on the value-histogram rewrite
    "q111_source_calibration" -> ((s, d) => CorpusOps.sourceCalibration(s, d)),
    // token-distribution Shannon entropy quality signal
    "q112_token_entropy"     -> ((s, d) => TextAnalysis.tokenEntropy(s, d)),
    // BM25 keyword retrieval: one-shot scan form
    "q113_bm25"              -> ((s, d) => Retrieval.bm25(s, d)),
    // BM25 over the PERSISTED inverted index (bucket-pruned probe)
    "q113b_bm25_indexed"     -> ((s, d) => Retrieval.bm25Indexed(s, d)),
    // DSIR importance-weighted selection (hashed-bigram log-ratio, ppm)
    "q114_dsir_select"       -> ((s, d) => CorpusOps.dsirSelect(s, d)),
    // cross-source near-dup matrix over q51's verified pair machinery
    "q115_source_overlap"    -> ((s, d) => Dedup.sourceOverlap(s, d)),
    // hybrid retrieval: RRF fusion of the BM25 and dense-cosine arms
    "q116_rrf_fusion"        -> ((s, d) => Retrieval.rrfFusion(s, d)),
    // weighted sampling without replacement (deterministic E&S keys)
    "q117_weighted_sample"   -> ((s, d) => CorpusOps.weightedSample(s, d)),
    // span-level contamination report (which grams, where, how often)
    "q118_contamination_spans" -> ((s, d) => CorpusOps.contaminationSpans(s, d)),
    // q118's deployment regime: explicit bounded benchmark relation —
    // unhinted bench side, AQE broadcasts pass A (no-SMJ spec-pinned)
    "q118b_contamination_bounded" -> ((s, d) => CorpusOps.contaminationBounded(s, d)),
    // epoch-deterministic shard/order manifest for distributed loaders
    "q119_shuffle_shards"    -> ((s, d) => CorpusOps.shuffleShards(s, d)),
    // DoReMi-style multiplicative domain reweighting (linearized MW, ppm)
    "q120_doremi_mix"        -> ((s, d) => CorpusOps.doremiMix(s, d)),
    // CCNet-style per-source head/middle/tail LM-likelihood terciles
    "q121_ccnet_buckets"     -> ((s, d) => CorpusOps.ccnetBuckets(s, d))
  )

  /** The MERGE-apply oracle, shared by q87 (batch full-outer apply) and
    * q92 (streaming state-store apply) — both must produce this table.
    */
  private val mergeApplySql: String =
    """WITH chg AS (
      |  SELECT o_orderkey AS k, 'U' AS op, o_custkey AS c_ck,
      |         o_totalprice + 100.0 AS c_price
      |  FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)),1,1) IN ('0','1')
      |  UNION ALL
      |  SELECT o_orderkey, 'D', o_custkey, o_totalprice
      |  FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)),1,1) = '2'
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders), 'I',
      |         o_custkey, o_totalprice + 0.5
      |  FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)),1,1) = '3')
      |SELECT coalesce(b.o_orderkey, c.k) AS o_orderkey,
      |       coalesce(c.c_ck, b.o_custkey) AS o_custkey,
      |       CASE WHEN c.op IN ('U','I') THEN c.c_price
      |            ELSE b.o_totalprice END AS o_totalprice,
      |       CASE WHEN c.op = 'I' THEN 'insert'
      |            WHEN c.op = 'U' THEN 'update'
      |            ELSE 'base' END AS applied
      |FROM orders b FULL OUTER JOIN chg c ON b.o_orderkey = c.k
      |WHERE c.op IS NULL OR c.op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** The span-contamination oracle, shared by q118 (corpus-derived
    * adversarial regime) and q118b (bounded-benchmark deployment
    * regime) — the two differ in JOIN PLAN, never in semantics, so one
    * definition keeps them from drifting apart under a future edit.
    */
  private val contaminationSpansSql: String =
    """WITH t AS (SELECT doc_id, source,
      |   list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
      |g AS (SELECT doc_id, source, i - 1 AS pos,
      |        array_to_string(ts[i:i+7], ' ') AS gram
      |      FROM t, LATERAL unnest(generate_series(1, len(ts) - 7)) AS u(i)
      |      WHERE len(ts) >= 8),
      |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
      |SELECT doc_id, gram, min(pos) AS first_pos, count(*) AS n_occ
      |FROM g WHERE source <> 'src0' AND gram IN (SELECT gram FROM bench)
      |GROUP BY 1, 2 ORDER BY doc_id, gram""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """WITH m AS (
        | SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(round(l_quantity*10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sq,
        |  CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sp,
        |  CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)
        |        * (10000 - CAST(round(l_discount*10000) AS BIGINT))) AS DOUBLE) / 100000000.0 AS sdp,
        |  CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)
        |        * (10000 - CAST(round(l_discount*10000) AS BIGINT))
        |        * (10000 + CAST(round(l_tax*10000) AS BIGINT))) AS DOUBLE) / 1000000000000.0 AS sch,
        |  CAST(sum(CAST(round(l_discount*10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sd,
        |  count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-01-01'
        | GROUP BY 1,2)
        |SELECT l_returnflag, l_linestatus,
        | round(sq,4) AS sum_qty,
        | round(sp,4) AS sum_base_price,
        | round(sdp,4) AS sum_disc_price,
        | round(sch,4) AS sum_charge,
        | round(sq/n,4) AS avg_qty,
        | round(sp/n,4) AS avg_price,
        | round(sd/n,4) AS avg_disc,
        | count_order
        |FROM m ORDER BY 1,2""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)
        |   * CAST(round(l_discount*10000) AS BIGINT)) AS DOUBLE) / 100000000.0, 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(CAST(sum(CAST(round(o_totalprice*10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_multi_join" ->
      """SELECT n_name, round(CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)
        |   * (10000 - CAST(round(l_discount*10000) AS BIGINT))) AS DOUBLE) / 100000000.0, 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, round(o_totalprice,4) AS totalprice FROM orders
        |ORDER BY totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q06_distinct_agg" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n_orders
        |FROM orders""".stripMargin,
    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk, round(o_totalprice,4) AS totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q07b_topk_custom_op" ->
      """SELECT o_custkey, o_orderkey, rnk, round(o_totalprice,4) AS totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q08_semi_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q09_union_dedup" ->
      """SELECT DISTINCT k FROM (
        | SELECT o_custkey AS k FROM orders
        | UNION ALL SELECT c_custkey AS k FROM customer) t
        |ORDER BY k""".stripMargin,
    "q09b_set_ops" ->
      """SELECT k, tag FROM (
        | SELECT k, 'both' AS tag FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 300000) t1
        | UNION ALL
        | SELECT k, 'small_only' AS tag FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000) t2) u
        |ORDER BY tag, k""".stripMargin,
    "q10_rollup" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        | round(CAST(sum(CAST(round(o_totalprice*10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
        |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q10b_cube" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)
        |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q11_correlated_subq" ->
      """SELECT c_custkey, round(c_acctbal,4) AS acctbal FROM customer c1
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
        |                   WHERE c2.c_mktsegment = c1.c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,
    "q12_having" ->
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice),4) AS total
        |FROM orders GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin,
    "q13_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts, value, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, value,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM g)
        |SELECT user_id, session_id, count(*) AS n_events, round(sum(value),4) AS sum_value
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q15_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9),4) AS p90
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_stats" ->
      """WITH m AS (
        | SELECT l_returnflag,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(round(l_quantity*10000) AS BIGINT)) AS DOUBLE) AS sq,
        |  CAST(sum(CAST(round(l_quantity*10000) AS BIGINT)*CAST(round(l_quantity*10000) AS BIGINT)) AS DOUBLE) AS sqq,
        |  CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)) AS DOUBLE) AS sp,
        |  CAST(sum(CAST(round(l_extendedprice*10000) AS BIGINT)*CAST(round(l_extendedprice*10000) AS BIGINT)) AS DOUBLE) AS spp,
        |  CAST(sum(CAST(round(l_quantity*10000) AS BIGINT)*CAST(round(l_extendedprice*10000) AS BIGINT)) AS DOUBLE) AS sqp,
        |  CAST(sum(CAST(round(l_discount*10000) AS BIGINT)) AS DOUBLE) AS sd,
        |  CAST(sum(CAST(round(l_tax*10000) AS BIGINT)) AS DOUBLE) AS st,
        |  CAST(sum(CAST(round(l_discount*10000) AS BIGINT)*CAST(round(l_tax*10000) AS BIGINT)) AS DOUBLE) AS sdt
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        | round(sqrt((sqq - sq*sq/n)/(n-1))/10000, 4) AS sd_qty,
        | round((n*sqp - sq*sp)/(sqrt(n*sqq - sq*sq)*sqrt(n*spp - sp*sp)), 4) + 0.0 AS corr_qp,
        | round((sdt - sd*st/n)/(n-1)/100000000.0, 4) + 0.0 AS cov_dt
        |FROM m ORDER BY 1""".stripMargin,
    "q17b_range_window" ->
      """SELECT d, round(rev,4) AS revenue,
        | round(CAST(sum(qrev) OVER w AS DOUBLE) / count(*) OVER w) / 10000.0 AS trail7
        |FROM (SELECT CAST(l_shipdate AS DATE) AS d,
        |       sum(l_extendedprice*(1-l_discount)) AS rev,
        |       CAST(round(sum(l_extendedprice*(1-l_discount)) * 10000) AS BIGINT) AS qrev
        |      FROM lineitem GROUP BY 1) t
        |WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', d)
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY d""".stripMargin,
    "q17_moving_avg" ->
      """SELECT d, round(rev,4) AS revenue,
        | round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),4) AS ma7
        |FROM (SELECT CAST(l_shipdate AS DATE) AS d,
        |       sum(l_extendedprice*(1-l_discount)) AS rev
        |      FROM lineitem GROUP BY 1) t
        |ORDER BY d""".stripMargin,
    "q18_asof_join" ->
      """SELECT event_id, max(o_orderdate) AS asof_orderdate
        |FROM events LEFT JOIN orders
        |  ON user_id = o_custkey AND o_orderdate <= ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_range_join" ->
      """SELECT p.event_id, count(c.ts) AS n_clicks
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type='click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type='click') AS click,
        | count(*) FILTER (WHERE event_type='error') AS error,
        | count(*) FILTER (WHERE event_type='purchase') AS purchase,
        | count(*) FILTER (WHERE event_type='signup') AS signup,
        | count(*) FILTER (WHERE event_type='view') AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_json_extract" ->
      """SELECT event_type,
        | CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        | SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> '' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_dual_conditional_count" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type='click') AS n_click,
        | count(*) FILTER (WHERE event_type='error') AS n_error,
        | round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END),4) AS purchase_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q23_accumulate_nested" ->
      """SELECT user_id, event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q24_funnel" ->
      """WITH f AS (
        | SELECT user_id,
        |  min(ts) FILTER (WHERE event_type='signup') AS first_signup,
        |  min(ts) FILTER (WHERE event_type='purchase') AS first_purchase
        | FROM events GROUP BY 1)
        |SELECT count(*) AS n_users, count(first_signup) AS n_signed,
        | count(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
        |FROM f""".stripMargin,
    "q30_stream_windowed_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q30b_stream_paced" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q31_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events ORDER BY 1,2""".stripMargin,
    "q31b_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events ORDER BY 1,2""".stripMargin,
    "q32_stream_session_window" ->
      """WITH g AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, ts,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        | FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM s GROUP BY user_id, sess ORDER BY 1,2""".stripMargin,
    "q33_stream_sliding" ->
      """SELECT ws AS window_start, event_type, count(*) AS n FROM (
        | SELECT date_trunc('hour', ts) AS ws, event_type FROM events
        | UNION ALL
        | SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q34_stream_stateful" ->
      """SELECT user_id, count(*) AS n FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_stream_flatmap_sessions" ->
      """WITH g AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, ts,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        | FROM g),
        |sessions AS (
        | SELECT user_id, sess, min(ts) AS session_start, count(*) AS n_events
        | FROM s GROUP BY 1,2)
        |SELECT user_id, session_start, n_events FROM (
        | SELECT *, max(sess) OVER (PARTITION BY user_id) AS mx FROM sessions) t
        |WHERE sess < mx ORDER BY 1,2""".stripMargin,
    "q36_stream_stream_join" ->
      """SELECT p.event_id AS p_id, c.ts AS c_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
        |JOIN (SELECT user_id, ts FROM events WHERE event_type='click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |ORDER BY 1,2""".stripMargin,
    "q40_lang_id" ->
      """WITH t AS (SELECT lang, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
        |sc AS (SELECT lang,
        |  len(list_intersect(toks, ['der','die','das','und','nicht'])) AS s_de,
        |  len(list_intersect(toks, ['the','a','of','and','is'])) AS s_en,
        |  len(list_intersect(toks, ['el','la','que','los','una'])) AS s_es,
        |  len(list_intersect(toks, ['le','les','et','une','est'])) AS s_fr
        | FROM t)
        |SELECT lang, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |  WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |  WHEN s_fr > 0 THEN 'fr'
        |  ELSE 'und' END AS predicted, count(*) AS n
        |FROM sc GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q41_quality_score" ->
      """WITH t AS (SELECT doc_id, text,
        |   list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
        |r AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(CAST(length(replace(text,' ','')) AS DOUBLE)/len(toks),4) AS avg_token_len,
        |  round(CAST(len(list_filter(toks,
        |    x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE)/len(toks),4) AS stopword_ratio
        | FROM t)
        |SELECT doc_id, n_tokens, avg_token_len, stopword_ratio,
        | CAST(CASE WHEN n_tokens BETWEEN 10 AND 1000 AND stopword_ratio <= 0.6
        |      THEN 1 ELSE 0 END AS BIGINT) AS quality
        |FROM r ORDER BY doc_id""".stripMargin,
    "q42_token_count" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
        | CAST(length(text) AS BIGINT) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q43_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q44_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok2 GROUP BY 1,2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
        |SELECT doc_id, token, round(tf * ln(n.n / df), 4) AS tfidf
        |FROM tf JOIN dfreq USING (token), n
        |ORDER BY tfidf DESC, doc_id, token LIMIT 100""".stripMargin,
    "q07c_window_suite" ->
      """SELECT c_mktsegment, c_custkey,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | round(percent_rank() OVER w, 4) AS pct_rank,
        | round(cume_dist() OVER w, 4) AS cume,
        | first_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
        | last_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q26_scalar_subq" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
        |FROM orders
        |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q28_profile" ->
      """SELECT * FROM (
        | SELECT 'doc_id' AS col_name, count(*) AS n_rows,
        |   count(*) FILTER (WHERE doc_id IS NULL) AS n_nulls,
        |   count(DISTINCT doc_id) AS n_distinct FROM documents
        | UNION ALL SELECT 'lang', count(*),
        |   count(*) FILTER (WHERE lang IS NULL), count(DISTINCT lang) FROM documents
        | UNION ALL SELECT 'n_chars', count(*),
        |   count(*) FILTER (WHERE n_chars IS NULL), count(DISTINCT n_chars) FROM documents
        | UNION ALL SELECT 'source', count(*),
        |   count(*) FILTER (WHERE source IS NULL), count(DISTINCT source) FROM documents
        | UNION ALL SELECT 'text', count(*),
        |   count(*) FILTER (WHERE text IS NULL), count(DISTINCT text) FROM documents
        |) t ORDER BY col_name""".stripMargin,
    "q27_exists_subq" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q25_retention" ->
      """WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort FROM active GROUP BY 1)
        |SELECT cohort, CAST(a.day - c.cohort AS BIGINT) AS day_offset, count(*) AS n_users
        |FROM active a JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q29_full_outer" ->
      """WITH p AS (SELECT user_id, round(sum(value), 4) AS purchase_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT user_id, count(*) AS n_clicks
        |      FROM events WHERE event_type = 'click' GROUP BY 1)
        |SELECT coalesce(p.user_id, c.user_id) AS user_id, purchase_value, n_clicks
        |FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
        |ORDER BY user_id""".stripMargin,
    "q45_quality_gate" ->
      """SELECT rule, violations FROM (
        | SELECT 'doc_id_not_null' AS rule,
        |        count(*) FILTER (WHERE doc_id IS NULL) AS violations FROM documents
        | UNION ALL SELECT 'lang_known',
        |        count(*) FILTER (WHERE lang NOT IN ('de','en','es','fr','zh')) FROM documents
        | UNION ALL SELECT 'n_chars_matches',
        |        count(*) FILTER (WHERE n_chars <> length(text)) FROM documents
        | UNION ALL SELECT 'text_nonempty',
        |        count(*) FILTER (WHERE length(text) = 0) FROM documents) t
        |ORDER BY rule""".stripMargin,
    "q46_bigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id,
        |               unnest(string_split(text, ' ')) AS t,
        |               unnest(range(len(string_split(text, ' ')))) AS pos
        |        FROM documents)
        |  WHERE len(t) > 0)
        |SELECT a.t AS w1, b.t AS w2, count(*) AS n
        |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
        |GROUP BY 1, 2
        |ORDER BY n DESC, w1, w2 LIMIT 100""".stripMargin,
    "q47_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_off,
        |  CAST((sum(n_tokens) OVER w - n_tokens) // 512 AS BIGINT) AS chunk_first,
        |  CAST((sum(n_tokens) OVER w - 1) // 512 AS BIGINT) AS chunk_last
        |FROM t
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin,
    "q48_source_mix" ->
      """WITH src AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, tokens,
        |  round(tokens / CAST(sum(tokens) OVER () AS DOUBLE), 4) AS share,
        |  round(CAST(sum(tokens) OVER () AS DOUBLE) / count(*) OVER () / tokens, 4) AS up_weight
        |FROM src ORDER BY source""".stripMargin,
    "q73_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text,' ')) AS t FROM documents),
        |counts AS (SELECT t, count(*) AS n FROM tok WHERE len(t) > 0 GROUP BY 1),
        |total AS (SELECT sum(n) AS tot FROM counts),
        |head AS (SELECT t, n FROM counts ORDER BY n DESC, t LIMIT 10000),
        |ranked AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, t) AS BIGINT) AS rn,
        |                  sum(n) OVER (ORDER BY n DESC, t ROWS UNBOUNDED PRECEDING) AS cum
        |           FROM head)
        |SELECT pct, rn AS vocab_size, CAST(cum AS BIGINT) AS covered,
        |       round(CAST(cum AS DOUBLE)/tot, 4) AS coverage
        |FROM (SELECT unnest(CAST([50,90,95,99] AS BIGINT[])) AS pct) th, total, ranked
        |WHERE cum * 100 >= pct * tot
        |QUALIFY row_number() OVER (PARTITION BY pct ORDER BY rn) = 1
        |ORDER BY pct""".stripMargin,
    "q74_novelty" ->
      """WITH tok AS (
        |  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
        |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
        |  WHERE len(t) > 0),
        |bi AS (SELECT a.doc_id, a.t || ' ' || b.t AS g
        |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
        |freq AS (SELECT g, count(*) AS cnt FROM bi GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |       CAST(floor(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) * 1000.0 / count(*)) AS BIGINT) AS rare_pm
        |FROM bi JOIN freq USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q75_temperature_mix" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |q AS (SELECT source, tokens,
        |        CAST(round(sqrt(CAST(tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS sq
        |      FROM src)
        |SELECT source, tokens,
        |  round(CAST(tokens AS DOUBLE) / CAST(sum(tokens) OVER () AS DOUBLE), 4) AS share,
        |  round(CAST(sq AS DOUBLE) / CAST(sum(sq) OVER () AS DOUBLE), 4) AS temp_weight,
        |  CAST(floor(CAST(sq AS DOUBLE) * CAST(sum(tokens) OVER () AS DOUBLE)
        |             / CAST(sum(sq) OVER () AS DOUBLE)) AS BIGINT) AS expected_tokens
        |FROM q ORDER BY source""".stripMargin,
    "q79_chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, unnest(range(1, len(toks)+1, 48)) AS st
        |      FROM t WHERE len(toks) > 0)
        |SELECT doc_id, CAST(st AS BIGINT) AS start,
        |  array_to_string(list_slice(toks, st, st+63), ' ') AS chunk_text,
        |  CAST(LEAST(len(toks) - st + 1, 64) AS BIGINT) AS n_tokens
        |FROM s ORDER BY doc_id, start""".stripMargin,
    "q78_quality_classifier" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    LEAST(CAST(len(toks) AS BIGINT), 1000) AS x1,
        |    CAST(floor(1000.0 * len(replace(text, ' ', '')) / len(toks)) AS BIGINT) AS x2,
        |    CAST(floor(1000.0 * len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it'))) / len(toks)) AS BIGINT) AS x3,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
        |  FROM (SELECT doc_id, source, text,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |        FROM documents)
        |  WHERE len(toks) > 0),
        |i1 AS (
        |  SELECT count(*) AS n,
        |    CAST(sum((500000 - y*1000000) * x1) AS DOUBLE) AS g1,
        |    CAST(sum((500000 - y*1000000) * x2) AS DOUBLE) AS g2,
        |    CAST(sum((500000 - y*1000000) * x3) AS DOUBLE) AS g3,
        |    CAST(sum(500000 - y*1000000) AS DOUBLE) AS gb,
        |    CAST(sum(CASE WHEN (500000 > 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok
        |  FROM f),
        |w1 AS (
        |  SELECT n, ok,
        |    0 - CAST(floor(g1/(n*16.0)) AS BIGINT) AS w1,
        |    0 - CAST(floor(g2/(n*16.0)) AS BIGINT) AS w2,
        |    0 - CAST(floor(g3/(n*16.0)) AS BIGINT) AS w3,
        |    0 - CAST(floor(gb/(n*16.0)) AS BIGINT) AS b
        |  FROM i1),
        |p2 AS (
        |  SELECT f.*, w1.w1 AS a1, w1.w2 AS a2, w1.w3 AS a3, w1.b AS ab,
        |    LEAST(1000000, GREATEST(0,
        |      CAST(floor((w1.w1*x1 + w1.w2*x2 + w1.w3*x3 + w1.b)/4.0) AS BIGINT) + 500000)) AS p
        |  FROM f, w1),
        |i2 AS (
        |  SELECT count(*) AS n,
        |    CAST(sum((p - y*1000000) * x1) AS DOUBLE) AS g1,
        |    CAST(sum((p - y*1000000) * x2) AS DOUBLE) AS g2,
        |    CAST(sum((p - y*1000000) * x3) AS DOUBLE) AS g3,
        |    CAST(sum(p - y*1000000) AS DOUBLE) AS gb,
        |    CAST(sum(CASE WHEN (p > 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok,
        |    max(a1) AS a1, max(a2) AS a2, max(a3) AS a3, max(ab) AS ab
        |  FROM p2),
        |w2 AS (
        |  SELECT n, ok,
        |    a1 - CAST(floor(g1/(n*16.0)) AS BIGINT) AS w1,
        |    a2 - CAST(floor(g2/(n*16.0)) AS BIGINT) AS w2,
        |    a3 - CAST(floor(g3/(n*16.0)) AS BIGINT) AS w3,
        |    ab - CAST(floor(gb/(n*16.0)) AS BIGINT) AS b
        |  FROM i2),
        |p3 AS (
        |  SELECT f.*, w2.w1 AS a1, w2.w2 AS a2, w2.w3 AS a3, w2.b AS ab,
        |    LEAST(1000000, GREATEST(0,
        |      CAST(floor((w2.w1*x1 + w2.w2*x2 + w2.w3*x3 + w2.b)/4.0) AS BIGINT) + 500000)) AS p
        |  FROM f, w2),
        |i3 AS (
        |  SELECT count(*) AS n,
        |    CAST(sum((p - y*1000000) * x1) AS DOUBLE) AS g1,
        |    CAST(sum((p - y*1000000) * x2) AS DOUBLE) AS g2,
        |    CAST(sum((p - y*1000000) * x3) AS DOUBLE) AS g3,
        |    CAST(sum(p - y*1000000) AS DOUBLE) AS gb,
        |    CAST(sum(CASE WHEN (p > 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok,
        |    max(a1) AS a1, max(a2) AS a2, max(a3) AS a3, max(ab) AS ab
        |  FROM p3),
        |w3 AS (
        |  SELECT n, ok,
        |    a1 - CAST(floor(g1/(n*16.0)) AS BIGINT) AS w1,
        |    a2 - CAST(floor(g2/(n*16.0)) AS BIGINT) AS w2,
        |    a3 - CAST(floor(g3/(n*16.0)) AS BIGINT) AS w3,
        |    ab - CAST(floor(gb/(n*16.0)) AS BIGINT) AS b
        |  FROM i3)
        |SELECT 1 AS iter, n, ok AS n_correct, w1, w2, w3, b FROM w1
        |UNION ALL SELECT 2, n, ok, w1, w2, w3, b FROM w2
        |UNION ALL SELECT 3, n, ok, w1, w2, w3, b FROM w3
        |ORDER BY iter""".stripMargin,
    "q49_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
        |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
        |  WHERE len(t) > 0),
        |g AS (SELECT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS gram
        |      FROM tok a JOIN tok b ON a.doc_id=b.doc_id AND b.rn=a.rn+1
        |                 JOIN tok c ON a.doc_id=c.doc_id AND c.rn=a.rn+2)
        |SELECT doc_id, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct,
        | round(1.0 - count(DISTINCT gram) / CAST(count(*) AS DOUBLE), 4) AS dup_frac
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q59_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS ts
        |  FROM documents),
        |g AS (SELECT doc_id, source,
        |        array_to_string(ts[CAST(i+1 AS BIGINT):CAST(i+8 AS BIGINT)], ' ') AS gram
        |      FROM tok, unnest(range(len(ts)-7)) AS u(i)
        |      WHERE len(ts) >= 8),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
        |SELECT doc_id, count(DISTINCT gram) AS n_shared
        |FROM (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0') c
        |JOIN bench USING (gram)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q50_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q66_top_tokens" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS df FROM (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> '' GROUP BY 1 ORDER BY n DESC, token LIMIT 200""".stripMargin,
    "q67_sample_corpus" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
        |ORDER BY doc_id""".stripMargin,
    "q68_quantize_embeddings" ->
      """WITH el AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |sc AS (SELECT vec_id, max(abs(x))/127.0 AS scale FROM el GROUP BY 1),
        |qn AS (SELECT el.vec_id, x, scale,
        |         CASE WHEN scale = 0 THEN 0 ELSE CAST(round(x/scale) AS BIGINT) END AS q
        |       FROM el JOIN sc USING (vec_id))
        |SELECT vec_id, round(max(scale), 6) AS scale,
        | CAST(sum(CASE WHEN abs(q) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
        | round(CAST(sum(CAST(round((x-q*scale)*(x-q*scale)*1e10) AS BIGINT)) AS DOUBLE)/1e10, 6) AS sq_err
        |FROM qn GROUP BY 1 ORDER BY 1""".stripMargin,
    "q69_substring_dedup" ->
      """WITH tok0 AS (SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
        |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
        |  WHERE len(t) > 0),
        |tokl AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
        |g AS (SELECT doc_id, CAST(i AS BIGINT) AS rn,
        |        array_to_string(ts[CAST(i AS BIGINT):CAST(i+9 AS BIGINT)], ' ') AS gram
        |      FROM tokl, unnest(range(1, len(ts)-8)) AS u(i)
        |      WHERE len(ts) >= 10),
        |dup AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) > 1),
        |cov AS (SELECT DISTINCT g.doc_id, g.rn + o AS rn
        |        FROM g JOIN dup USING (gram), unnest(range(10)) AS u(o)),
        |kept AS (SELECT t.doc_id, t.rn, t.t FROM tok0 t
        |         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.rn = c.rn
        |         WHERE c.rn IS NULL),
        |counts AS (SELECT doc_id, count(*) AS n_tokens FROM tok0 GROUP BY 1),
        |kc AS (SELECT doc_id, count(*) AS n_kept,
        |              string_agg(t, ' ' ORDER BY rn) AS cleaned FROM kept GROUP BY 1)
        |SELECT c.doc_id, n_tokens,
        |       CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_covered,
        |       coalesce(cleaned, '') AS cleaned_text
        |FROM counts c LEFT JOIN kc USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q71_crosscorpus_neardup" ->
      """WITH tok AS (SELECT doc_id, source, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |exa AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE source IN
        |  ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')),
        |exb AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE source NOT IN
        |  ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |          FROM exa a JOIN exb b ON a.s = b.s GROUP BY 1,2)
        |SELECT p.a, p.b,
        | round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) AS jaccard
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5
        |ORDER BY 1,2""".stripMargin,
    // Probing the persisted LSH index computes EXACTLY q71's answer (the
    // index is a materialization of q71's corpus side, and verification
    // is the same exact Jaccard) — so it shares q71's exhaustive oracle.
    "q106_lsh_index_probe" ->
      """WITH tok AS (SELECT doc_id, source, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |exa AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE source IN
        |  ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')),
        |exb AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE source NOT IN
        |  ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |          FROM exa a JOIN exb b ON a.s = b.s GROUP BY 1,2)
        |SELECT p.a, p.b,
        | round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) AS jaccard
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5
        |ORDER BY 1,2""".stripMargin,
    // Paragraph-level dedup: fixed 20-token paragraphs, keep-first by
    // (doc_id, offset), documents reassembled from survivors in order.
    "q105_paragraph_dedup" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
        |paras AS (SELECT doc_id, st,
        |    array_to_string(ts[st:st+19], ' ') AS ptext
        |  FROM toks, LATERAL unnest(generate_series(1, len(ts), 20)) AS u(st)
        |  WHERE len(ts) > 0),
        |kept AS (SELECT doc_id, st, ptext,
        |    row_number() OVER (PARTITION BY ptext ORDER BY doc_id, st) AS rn
        |  FROM paras)
        |SELECT doc_id, string_agg(ptext, ' ' ORDER BY st) AS text,
        |       count(*) AS n_kept
        |FROM kept WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Keep-longest near-dup resolution: q56's component structure
    // (recursive reach over the exhaustive verified pair set), keeper =
    // argmax(token count, tie min doc_id) per component.
    "q107_dedup_keep_best" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
        |ipairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
        |pairs AS (SELECT p.a, p.b FROM ipairs p
        |          JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |          WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5),
        |edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b AS x, a AS y FROM pairs),
        |reach AS (SELECT x, y FROM edges
        |          UNION
        |          SELECT e.x, r.y FROM edges e JOIN reach r ON e.y = r.x),
        |comp AS (SELECT x AS doc_id, least(x, min(y)) AS rep FROM reach GROUP BY x),
        |ntok AS (SELECT doc_id, CAST(len(list_filter(string_split(text,' '), t -> t <> '')) AS BIGINT) AS n
        |         FROM documents),
        |ranked AS (SELECT c.doc_id, c.rep,
        |    row_number() OVER (PARTITION BY c.rep ORDER BY n DESC, c.doc_id) AS rn
        |  FROM comp c JOIN ntok USING (doc_id)),
        |keepers AS (SELECT rep, doc_id AS keeper FROM ranked WHERE rn = 1)
        |SELECT c.doc_id, k.keeper FROM comp c JOIN keepers k USING (rep)
        |ORDER BY c.doc_id""".stripMargin,
    // Bloom pre-filter + exact confirmation computes EXACTLY q59's answer
    // (the sketch can only admit extra candidates; the exact semi-join
    // removes them) — so it shares q59's oracle verbatim.
    "q72_bloom_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS ts
        |  FROM documents),
        |g AS (SELECT doc_id, source,
        |        array_to_string(ts[CAST(i+1 AS BIGINT):CAST(i+8 AS BIGINT)], ' ') AS gram
        |      FROM tok, unnest(range(len(ts)-7)) AS u(i)
        |      WHERE len(ts) >= 8),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
        |SELECT doc_id, count(DISTINCT gram) AS n_shared
        |FROM (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0') c
        |JOIN bench USING (gram)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q53_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT p.a, p.b,
        | round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) AS jaccard
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5
        |ORDER BY 1,2""".stripMargin,
    // q51's verified-LSH output equals the exhaustive exact-Jaccard pair
    // set whenever banding recall is 1 — true here: every true pair sits
    // at j >= 0.89, where 16x4-band miss probability is < 2e-8. The spec
    // suite asserts the equivalence; the oracle is the exhaustive SQL.
    "q51_dedup_minhash_lsh" ->
      """WITH tok AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT p.a, p.b,
        | round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) AS jaccard
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5
        |ORDER BY 1,2""".stripMargin,
    // Deduped-corpus oracle: exact pair set at tau=0.5, transitive
    // closure by recursive CTE, keep docs whose component min is itself.
    "q56_deduped_corpus" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
        |ipairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
        |pairs AS (SELECT p.a, p.b FROM ipairs p
        |          JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |          WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5),
        |edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b AS x, a AS y FROM pairs),
        |reach AS (SELECT x, y FROM edges
        |          UNION
        |          SELECT e.x, r.y FROM edges e JOIN reach r ON e.y = r.x),
        |dropped AS (SELECT x AS doc_id FROM reach GROUP BY 1 HAVING min(y) < x)
        |SELECT doc_id, text FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    // Full training-corpus pipeline oracle: quality gate -> exact dedup
    // on normalized md5 -> near-dup component losers -> 8-gram
    // decontamination -> per-source packing, mirroring Pipeline stage by
    // stage (near-dup pairs via the exhaustive SQL, valid per q51 note).
    "q64_training_corpus" -> trainingCorpusOracleSql,
    // the STREAMING maintainer replays the corpus through micro-batches
    // into persistent state and must land on the SAME corpus — strongest
    // check a stateful composition gets (the q92 ≡ q87 pattern)
    "q64s_stream_training_corpus" -> trainingCorpusOracleSql,
    "q57_char_ngram_jaccard" ->
      """WITH ex AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, length(text)-4, 2),
        |    i -> text[i:i+4])) AS sh
        |  FROM documents WHERE length(text) >= 5) t),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |          FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT p.a, p.b, round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) AS jaccard
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.6
        |ORDER BY 1,2""".stripMargin,
    "q54_dedup_embedding" ->
      """SELECT a.vec_id AS a, b.vec_id AS b,
        | round(list_cosine_similarity(a.embedding, b.embedding),4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding, b.embedding),4) >= 0.4
        |ORDER BY 1,2""".stripMargin,
    // full fan-out (bits=0 ⇒ one bucket) ≡ exhaustive pair scan — the
    // bridge that hash-checks q55's bucket/join/score machinery. The
    // DOUBLE[] cast matters: Spark's dot/norm accumulate in double from
    // the float32 elements, while DuckDB's list_cosine_similarity on a
    // FLOAT[] stays float32 — one pair at a 4th-decimal rounding boundary
    // (0.34785) hash-diverged without it.
    "q55b_dedup_embedding_lsh_full" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        | round(list_cosine_similarity(a.emb, b.emb),4) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.emb, b.emb),4) >= 0.3
        |ORDER BY 1,2""".stripMargin,
    "q60_knn_brute" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(embedding, qv),4) AS sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    // the estimate is engine-specific; its 10% accuracy contract is not —
    // the oracle's constant-true flag hash-fails if any group's HLL
    // estimate ever drifts out of bound
    "q65b_approx_distinct_bridge" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_cust,
        |  CAST(1 AS BIGINT) AS within_10pct
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // radius-8 probe set covers all 2^8 buckets → identical to exhaustive
    "q61b_knn_ivf_full" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(embedding, qv),4) AS sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q76b_knn_ivf_kmeans_full" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(embedding, qv),4) AS sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q62_embedding_centroids" ->
      """SELECT label, i, round(avg(e),4) AS mean_e FROM (
        | SELECT label, unnest(embedding) AS e,
        |        unnest(range(len(embedding))) AS i
        | FROM embeddings) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q63_kmeans" -> kmeansOracleSql(),
    "q76c_knn_ivf_indexed" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(embedding, qv),4) AS sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q80_semdedup" -> semDedupOracleSql(),
    "q108_audio_fingerprint" -> Multimodal.audioOracleSql(),
    "q70_binary_meta" ->
      """SELECT doc_id AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | sha256(text) AS sha
        |FROM documents ORDER BY 1""".stripMargin,
    // conditional p(w2|w1) floored to a ppm grid per bigram, floor-mean per
    // doc — all integer (HUGEINT // on the DuckDB side, DECIMAL on Spark's)
    "q81_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
        |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
        |  WHERE len(t) > 0),
        |bi AS (SELECT a.doc_id, a.t AS w1, a.t || ' ' || b.t AS g
        |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
        |pf AS (SELECT g, count(*) AS c2 FROM bi GROUP BY 1),
        |lf AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(CAST(sum((CAST(c2 AS HUGEINT) * 1000000) // c1) AS HUGEINT)
        |       // count(*) AS BIGINT) AS lm_ppm
        |FROM bi JOIN pf USING (g) JOIN lf USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exhaustive containment (Spark's rare/hot decomposition is exact for
    // every pair sharing >= 1 sub-cap shingle — the q53 argument)
    "q82_containment" ->
      """WITH tok AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT p.a, p.b,
        | round(CAST(p.inter AS DOUBLE)/LEAST(sa.sz, sb.sz),4) AS containment
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |WHERE round(CAST(p.inter AS DOUBLE)/LEAST(sa.sz, sb.sz),4) >= 0.8
        |ORDER BY 1,2""".stripMargin,
    "q83_dup_histogram" ->
      """WITH c AS (SELECT md5(text) AS h, count(*) AS sz FROM documents GROUP BY 1)
        |SELECT sz, count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_docs,
        | CAST(sum(sz - 1) AS BIGINT) AS n_removable
        |FROM c GROUP BY sz ORDER BY sz""".stripMargin,
    "q52b_simhash_mirror" -> simhashMirrorOracleSql(),
    // the sketch is a pruning device, not an approximation: one-sided CMS
    // error ⇒ the output is exactly the HAVING form
    "q84_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tk AS (SELECT token FROM t WHERE token <> '')
        |SELECT token, count(*) AS n FROM tk GROUP BY 1
        |HAVING count(*) >= (SELECT CAST(count(*) AS DOUBLE)/100 FROM tk)
        |ORDER BY n DESC, token""".stripMargin,
    "q77_bpe_merges" -> bpeOracleSql(),
    "q85_bpe_encode" -> bpeOracleSql(encode = true),
    // reference slice = src0-4; alpha = 40% on the exact ppm grid
    "q86_trigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id, source, t,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id, source, unnest(string_split(text,' ')) AS t,
        |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
        |  WHERE len(t) > 0),
        |bi AS (SELECT a.doc_id, a.source, a.t AS w1, b.t AS w2
        |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
        |tri AS (SELECT a.doc_id, a.source, a.t AS w1, b.t AS w2, c.t AS w3
        |        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
        |                   JOIN tok c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2),
        |rs AS (SELECT ['src0','src1','src2','src3','src4'] AS l),
        |rt AS (SELECT w1 || ' ' || w2 || ' ' || w3 AS g, count(*) AS c123
        |       FROM tri WHERE source IN (SELECT unnest(l) FROM rs) GROUP BY 1),
        |r12 AS (SELECT w1 || ' ' || w2 AS g, count(*) AS c12
        |        FROM bi WHERE source IN (SELECT unnest(l) FROM rs) GROUP BY 1),
        |r1 AS (SELECT w1, count(*) AS c1
        |       FROM bi WHERE source IN (SELECT unnest(l) FROM rs) GROUP BY 1),
        |sc AS (SELECT t.doc_id,
        |   CASE WHEN rt.c123 IS NOT NULL
        |        THEN (CAST(rt.c123 AS HUGEINT) * 1000000) // ra.c12
        |        WHEN rb.c12 IS NOT NULL
        |        THEN (CAST(rb.c12 AS HUGEINT) * 1000000 * 40) // (r1.c1 * 100)
        |        ELSE 0 END AS ppm
        |  FROM tri t
        |  LEFT JOIN rt ON rt.g = t.w1 || ' ' || t.w2 || ' ' || t.w3
        |  LEFT JOIN r12 ra ON ra.g = t.w1 || ' ' || t.w2
        |  LEFT JOIN r12 rb ON rb.g = t.w2 || ' ' || t.w3
        |  LEFT JOIN r1 ON r1.w1 = t.w2)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  CAST(CAST(sum(ppm) AS HUGEINT) // count(*) AS BIGINT) AS lm3_ppm
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // deterministic U/D/I feed from md5 buckets; same resolution as Spark.
    // q92 (streaming apply into keyed state) must land on the identical
    // final table, so it shares this oracle verbatim.
    "q87_merge_upsert" -> mergeApplySql,
    "q87b_merge_upsert_bucketed" -> mergeApplySql, // bucketed base, same apply
    "q92_stream_merge" -> mergeApplySql,
    // incremental base ⊕ delta ≡ full recompute (associative integer sums)
    "q93_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q93b_incremental_agg_bucketed" -> // bucketed base, same maintenance
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // stochastic-rounding replication under the q75 weights; every copy
    // decision is an exact HUGEINT cross-multiplication
    "q94_apply_mix" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |q AS (SELECT source, tokens,
        |        CAST(round(sqrt(CAST(tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS sq
        |      FROM src),
        |w AS (SELECT source,
        |        CAST(sq AS HUGEINT) * CAST(sum(tokens) OVER () AS HUGEINT) AS num,
        |        CAST(sum(sq) OVER () AS HUGEINT) * CAST(tokens AS HUGEINT) AS den
        |      FROM q),
        |docs AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)),1,4)) AS INT) AS HUGEINT) AS u16,
        |    w.num, w.den
        |  FROM documents d JOIN w USING (source)),
        |n AS (SELECT doc_id, source,
        |        (num // den) + CASE WHEN u16 * den < (num % den) * 65536
        |                            THEN 1 ELSE 0 END AS n_copies
        |      FROM docs)
        |SELECT doc_id, source, CAST(unnest(generate_series(1, CAST(n_copies AS BIGINT))) AS BIGINT) AS copy
        |FROM n WHERE n_copies > 0
        |ORDER BY doc_id, copy""".stripMargin,
    // (x-μ)² > 4σ² cross-multiplied to integers: identical flags, no
    // rounding boundary anywhere
    "q95_outliers" ->
      """WITH m AS (
        |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(n_chars) AS HUGEINT) AS sx,
        |         CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx
        |  FROM documents GROUP BY 1)
        |SELECT d.source, d.doc_id, d.n_chars
        |FROM documents d JOIN m USING (source)
        |WHERE (m.n * d.n_chars - m.sx) * (m.n * d.n_chars - m.sx)
        |      > 4 * (m.n * m.sxx - m.sx * m.sx)
        |ORDER BY source, doc_id""".stripMargin,
    "q96_ri_audit" ->
      """SELECT relation, n_rows, orphans FROM (
        |  SELECT 'customer_nationkey' AS relation, count(*) AS n_rows,
        |         count(CASE WHEN n.n_nationkey IS NULL THEN 1 END) AS orphans
        |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  UNION ALL
        |  SELECT 'lineitem_orderkey', count(*),
        |         count(CASE WHEN o.o_orderkey IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem_partkey', count(*),
        |         count(CASE WHEN p.p_partkey IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |  UNION ALL
        |  SELECT 'lineitem_suppkey', count(*),
        |         count(CASE WHEN s.s_suppkey IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  UNION ALL
        |  SELECT 'orders_custkey', count(*),
        |         count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
        |ORDER BY relation""".stripMargin,
    // recursive closure over the name graph ≡ min-label propagation:
    // both compute each component's minimum node string
    "q103_fuzzy_clusters" ->
      """WITH RECURSIVE dn AS (SELECT DISTINCT p_brand AS blk, p_name AS nm FROM part),
        |np AS (SELECT a.blk, a.nm AS na, b.nm AS nb
        |       FROM dn a JOIN dn b ON a.blk = b.blk
        |       WHERE a.nm < b.nm AND abs(length(a.nm) - length(b.nm)) <= 2
        |         AND levenshtein(a.nm, b.nm) <= 2),
        |e AS (SELECT blk || '|' || na AS src, blk || '|' || nb AS dst FROM np
        |      UNION ALL SELECT blk || '|' || nb, blk || '|' || na FROM np),
        |nodes AS (SELECT blk || '|' || nm AS node FROM dn),
        |reach(a, b) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
        |rep AS (SELECT a AS node, min(b) AS rep FROM reach GROUP BY 1)
        |SELECT p.p_partkey,
        |  min(p.p_partkey) OVER (PARTITION BY rep.rep) AS keeper
        |FROM part p JOIN rep ON rep.node = p.p_brand || '|' || p.p_name
        |ORDER BY p_partkey""".stripMargin,
    // first md5 byte buckets 0..255: <230 train, <243 val, else test
    "q101_split_corpus" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,2)) AS INT) AS BIGINT) AS u8
        |  FROM documents)
        |SELECT CASE WHEN u8 < 230 THEN 'train' WHEN u8 < 243 THEN 'val'
        |            ELSE 'test' END AS split,
        |       source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
        |FROM t GROUP BY 1, 2 ORDER BY split, source""".stripMargin,
    // exact counts; ppm share by integer floor division
    "q102_key_skew" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT key, cnt,
        |  CAST((CAST(cnt AS HUGEINT) * 1000000) // total AS BIGINT) AS share_ppm
        |FROM c, t ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    // same blocking + verification predicate; DuckDB levenshtein ≡ Spark's
    "q99_fuzzy_match" ->
      """SELECT a.p_partkey AS a, b.p_partkey AS b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a, b""".stripMargin,
    // json_valid ⟺ from_json non-null on this feed (truncated objects are
    // invalid in both engines); sum over surviving payloads only
    "q100_tolerant_parse" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN substring(md5(CAST(event_id AS VARCHAR)),1,1) = '0'
        |         THEN substring(props,1,3) ELSE props END AS p
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  count(CASE WHEN COALESCE(json_valid(p), FALSE) THEN 1 END) AS n_parsed,
        |  count(CASE WHEN NOT json_valid(p) THEN 1 END) AS n_rejected,
        |  CAST(sum(CASE WHEN json_valid(p)
        |                THEN CAST(json_extract(p, '$.k') AS INT) END) AS BIGINT) AS sum_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // sha256 over the UTF-8 payload bytes — identical digests both engines
    "q98_binary_dedup" ->
      """WITH h AS (SELECT doc_id AS asset_id, sha256(text) AS h FROM documents)
        |SELECT asset_id,
        |  min(asset_id) OVER (PARTITION BY h) AS keeper,
        |  count(*) OVER (PARTITION BY h) AS copies
        |FROM h ORDER BY asset_id""".stripMargin,
    // md5 rank = uniform permutation; total order makes rank ≡ row_number
    "q97_group_sample" ->
      """SELECT source, doc_id, rnk FROM (
        | SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        | FROM documents) t
        |WHERE rnk <= 20 ORDER BY source, rnk""".stripMargin,
    // snapshot B derived identically; diff by md5 content hash
    "q88_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, md5(text) AS h_a FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,1) = '1'
        |                  THEN text || ' rev2' ELSE text END) AS h_b
        |  FROM documents WHERE substring(md5(CAST(doc_id AS VARCHAR)),1,1) <> '0'
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), md5(text)
        |  FROM documents
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)),1,1) = '2')
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |       CASE WHEN b.doc_id IS NULL THEN 'removed'
        |            WHEN a.doc_id IS NULL THEN 'added'
        |            WHEN a.h_a <> b.h_b THEN 'changed' END AS change
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |WHERE CASE WHEN b.doc_id IS NULL THEN 'removed'
        |           WHEN a.doc_id IS NULL THEN 'added'
        |           WHEN a.h_a <> b.h_b THEN 'changed' END IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // 3 unrolled synchronous iterations of the same integer-ppm recurrence
    "q89_pagerank" ->
      """WITH rel AS (SELECT DISTINCT l_partkey AS p,
        |               l_suppkey + (SELECT max(l_partkey) + 1 FROM lineitem) AS sn
        |             FROM lineitem),
        |edges AS (SELECT p AS src, sn AS dst FROM rel
        |          UNION ALL SELECT sn, p FROM rel),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS node, sum(r0.r // d.outdeg) AS csum
        |       FROM edges e JOIN deg d ON d.src = e.src
        |       JOIN r0 ON r0.node = e.src GROUP BY 1),
        |r1 AS (SELECT n.node,
        |       CAST(150000 + (17 * coalesce(c1.csum, 0)) // 20 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
        |c2 AS (SELECT e.dst AS node, sum(r1.r // d.outdeg) AS csum
        |       FROM edges e JOIN deg d ON d.src = e.src
        |       JOIN r1 ON r1.node = e.src GROUP BY 1),
        |r2 AS (SELECT n.node,
        |       CAST(150000 + (17 * coalesce(c2.csum, 0)) // 20 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
        |c3 AS (SELECT e.dst AS node, sum(r2.r // d.outdeg) AS csum
        |       FROM edges e JOIN deg d ON d.src = e.src
        |       JOIN r2 ON r2.node = e.src GROUP BY 1),
        |r3 AS (SELECT n.node,
        |       CAST(150000 + (17 * coalesce(c3.csum, 0)) // 20 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN c3 ON c3.node = n.node)
        |SELECT node, r AS rank_ppm FROM r3
        |ORDER BY rank_ppm DESC, node LIMIT 100""".stripMargin,
    // total order (n_chars DESC, doc_id) makes rank ≡ row_number
    "q90_source_cap" ->
      """SELECT source, doc_id, n_chars, rnk FROM (
        | SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source
        |                     ORDER BY n_chars DESC, doc_id) AS rnk
        | FROM documents) t
        |WHERE rnk <= 50 ORDER BY source, rnk""".stripMargin,
    // type-1 inverse-CDF on the value histogram, cross-multiplied integers
    "q91_hist_quantiles" ->
      """WITH hist AS (SELECT source, n_chars, count(*) AS cnt
        |              FROM documents GROUP BY 1, 2),
        |cum AS (SELECT source, n_chars, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total
        |        FROM hist)
        |SELECT source,
        |  min(CASE WHEN cum * 2 >= total THEN n_chars END) AS p50,
        |  min(CASE WHEN cum * 10 >= total * 9 THEN n_chars END) AS p90,
        |  min(CASE WHEN cum * 100 >= total * 99 THEN n_chars END) AS p99,
        |  max(total) AS n_docs
        |FROM cum GROUP BY source ORDER BY source""".stripMargin,
    // the full perceptual chain mirrored: stub decode (md5-byte binning),
    // the SAME ±1 hyperplane literals, within-bucket cosine
    "q104_perceptual_neardup" -> Multimodal.perceptualOracleSql(),
    // greedy token-budget prefix: the oracle's single-partition window is
    // EXACTLY the plan the engine's PrefixSum exists to avoid
    "q109_token_budget" ->
      """WITH t AS (SELECT doc_id,
        |   list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
        |sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(floor(len(list_filter(toks,
        |    x -> list_contains(['the','a','of','and','is','to','in'], x))) * 1000000
        |    / len(toks)) AS BIGINT) AS score_ppm
        | FROM t WHERE len(toks) > 0),
        |cum AS (SELECT doc_id, n_tokens, score_ppm,
        |  CAST(sum(n_tokens) OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS cum_tokens
        | FROM sc)
        |SELECT doc_id, n_tokens, score_ppm, cum_tokens
        |FROM cum WHERE cum_tokens <= (SELECT floor(max(cum_tokens) / 2) FROM cum)
        |ORDER BY doc_id""".stripMargin,
    // q105's paragraphs, frequency-threshold rule: drop EVERY occurrence
    // of any paragraph seen more than once
    "q110_boilerplate_strip" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
        |paras AS (SELECT doc_id, st,
        |    array_to_string(ts[st:st+19], ' ') AS ptext
        |  FROM toks, LATERAL unnest(generate_series(1, len(ts), 20)) AS u(st)
        |  WHERE len(ts) > 0),
        |boiler AS (SELECT ptext FROM paras GROUP BY ptext HAVING count(*) > 1)
        |SELECT doc_id, string_agg(ptext, ' ' ORDER BY st) AS text,
        |       count(*) AS n_kept
        |FROM paras WHERE ptext NOT IN (SELECT ptext FROM boiler)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the naive per-source percent_rank window — the engine computes the
    // same ranks from the (source, score) histogram without sorting docs
    "q111_source_calibration" ->
      """WITH t AS (SELECT doc_id,
        |   list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
        |sc AS (SELECT t.doc_id, d.source,
        |  CAST(floor(len(list_filter(toks,
        |    x -> list_contains(['the','a','of','and','is','to','in'], x))) * 1000000
        |    / len(toks)) AS BIGINT) AS score_ppm
        | FROM t JOIN documents d ON t.doc_id = d.doc_id WHERE len(toks) > 0),
        |pr AS (SELECT doc_id, source, score_ppm,
        |  round(percent_rank() OVER (PARTITION BY source ORDER BY score_ppm), 4) AS pr
        | FROM sc)
        |SELECT doc_id, source, score_ppm, pr
        |FROM pr WHERE pr >= 0.75 ORDER BY doc_id""".stripMargin,
    // token-distribution Shannon entropy, ln-based on both sides
    "q112_token_entropy" ->
      """WITH tok AS (SELECT doc_id,
        |   unnest(list_filter(string_split(text,' '), x -> x <> '')) AS t FROM documents),
        |cnt AS (SELECT doc_id, t, count(*) AS n FROM tok GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |        sum(n * ln(n)) AS s FROM cnt GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |       round((ln(n_tokens) - s / n_tokens) / ln(2), 4) AS entropy_bits
        |FROM agg ORDER BY doc_id""".stripMargin,
    // BM25 with Lucene's always-positive idf; the arithmetic shape
    // mirrors the Spark expression literal-for-literal. q113b (the
    // persisted inverted-index probe) must produce the identical table.
    "q113_bm25" -> bm25OracleSql,
    "q113b_bm25_indexed" -> bm25OracleSql,
    // DSIR log-ratio weights, per-bucket ppm-quantized so the per-doc
    // weight is an exact integer sum (q81/q89 convention)
    "q114_dsir_select" ->
      """WITH docs AS (SELECT doc_id, source,
        |   list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
        |occ AS (SELECT doc_id, source,
        |   CAST(CAST(concat('0x', substring(md5(bg),1,6)) AS INT) AS BIGINT) % 4096 AS b
        | FROM (SELECT doc_id, source, unnest(list_transform(generate_series(1, len(ts)-1),
        |        i -> ts[i] || ' ' || ts[i+1])) AS bg
        |       FROM docs WHERE len(ts) >= 2)),
        |tc AS (SELECT b, count(*) AS tc FROM occ WHERE source = 'src0' GROUP BY 1),
        |rc AS (SELECT b, count(*) AS rc FROM occ WHERE source <> 'src0' GROUP BY 1),
        |tt AS (SELECT CAST(sum(tc) AS DOUBLE) AS t_tot FROM tc),
        |rt AS (SELECT CAST(sum(rc) AS DOUBLE) AS r_tot FROM rc),
        |scores AS (SELECT rc.b,
        |   CAST(round((ln((coalesce(tc.tc, 0) + 1.0) / (t_tot + 4096)) -
        |               ln((rc.rc + 1.0) / (r_tot + 4096))) * 1e6) AS BIGINT) AS lr_ppm
        | FROM rc LEFT JOIN tc ON rc.b = tc.b, tt, rt),
        |db AS (SELECT doc_id, b, count(*) AS n FROM occ
        |       WHERE source <> 'src0' GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(n * lr_ppm) AS BIGINT) AS w_ppm
        |FROM db JOIN scores USING (b)
        |GROUP BY doc_id ORDER BY w_ppm DESC, doc_id LIMIT 50""".stripMargin,
    // q51's exhaustive verified-pair SQL (valid per the q51 recall note)
    // aggregated onto unordered source pairs
    "q115_source_overlap" ->
      """WITH tok AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' '))-2),
        |   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, len(sh) AS sz FROM tok),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
        |ipairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        |           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
        |pairs AS (SELECT p.a, p.b FROM ipairs p
        |          JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
        |          WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5)
        |SELECT least(da.source, db.source) AS src_a,
        |       greatest(da.source, db.source) AS src_b,
        |       count(*) AS n_pairs
        |FROM pairs v JOIN documents da ON da.doc_id = v.a
        |             JOIN documents db ON db.doc_id = v.b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // RRF hybrid fusion: each arm mirrored (BM25 arithmetic verbatim,
    // q60's cosine), ranks = row_number over the ROUNDED arm scores,
    // rrf = exact rational sums — bit-identical cross-engine
    "q116_rrf_fusion" ->
      """WITH docs AS (SELECT doc_id,
        |   list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(ts)) AS avgdl FROM docs),
        |tok AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS token FROM docs),
        |tf AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl FROM tok
        |       WHERE token IN ('hash','merge','window') GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |lexs AS (SELECT doc_id,
        |    round(sum( ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * (1.2+1)) /
        |               (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) ), 4) AS score
        |  FROM tf JOIN dfreq USING (token), stats
        |  GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank FROM lexs),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |dens AS (SELECT vec_id AS doc_id, round(list_cosine_similarity(embedding, qv),4) AS sim
        |         FROM embeddings, q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 50),
        |den AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS drank FROM dens)
        |SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
        |  round(coalesce(CAST(1 AS DOUBLE) / (lrank + 60), 0) +
        |        coalesce(CAST(1 AS DOUBLE) / (drank + 60), 0), 6) AS rrf,
        |  CAST(coalesce(lrank, 0) AS BIGINT) AS lrank,
        |  CAST(coalesce(drank, 0) AS BIGINT) AS drank
        |FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // Efraimidis-Spirakis keys from the md5-derived uniform, quantized
    // to integer e9 BEFORE ranking (selection boundary is exact)
    "q117_weighted_sample" ->
      """WITH t AS (SELECT doc_id,
        |   list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(floor(len(list_filter(toks,
        |    x -> list_contains(['the','a','of','and','is','to','in'], x))) * 1000000
        |    / len(toks)) AS BIGINT) + 1 AS w_ppm
        | FROM t WHERE len(toks) > 0),
        |k AS (SELECT doc_id, w_ppm,
        |  CAST(round(ln((CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,6)) AS INT) AS BIGINT) + 1)
        |        / 16777216.0) / w_ppm * 1e9) AS BIGINT) AS key_e9
        | FROM sc)
        |SELECT doc_id, w_ppm, key_e9 FROM k
        |ORDER BY key_e9 DESC, doc_id LIMIT 100""".stripMargin,
    // span-level contamination: q59's semantics with gram text + position
    "q118_contamination_spans" -> contaminationSpansSql,
    // the bounded-benchmark deployment regime computes EXACTLY q118's
    // report (same pool, same bench content, different join plan) — so
    // it shares q118's oracle, bench as its own relation
    "q118b_contamination_bounded" -> contaminationSpansSql,
    // epoch-keyed md5 permutation (epoch 0), shard = key mod 8, position
    // = within-shard row_number — the loader manifest, RNG-free
    "q119_shuffle_shards" ->
      """WITH k AS (SELECT doc_id,
        |  CAST(concat('0x', substring(md5(concat('0', ':', CAST(doc_id AS VARCHAR))),1,12)) AS BIGINT) AS skey
        | FROM documents)
        |SELECT doc_id, CAST(skey % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,
    // generated k-iteration mirror of the linearized multiplicative-
    // weights update — bit-for-bit (the q78 convention)
    "q120_doremi_mix" -> doremiOracleSql(),
    // q81's lm CTE → per-source value histogram → exact integer tercile
    // tests (3·above < n−1); ties share percent-rank's min-rank bucket
    "q121_ccnet_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
        |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
        |  WHERE len(t) > 0),
        |bi AS (SELECT a.doc_id, a.t AS w1, a.t || ' ' || b.t AS g
        |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
        |pf AS (SELECT g, count(*) AS c2 FROM bi GROUP BY 1),
        |lf AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |lm AS (SELECT doc_id,
        |  CAST(CAST(sum((CAST(c2 AS HUGEINT) * 1000000) // c1) AS HUGEINT)
        |       // count(*) AS BIGINT) AS lm_ppm
        |  FROM bi JOIN pf USING (g) JOIN lf USING (w1) GROUP BY doc_id),
        |scored AS (SELECT d.doc_id, d.source, lm.lm_ppm
        |           FROM documents d JOIN lm ON d.doc_id = lm.doc_id),
        |hist AS (SELECT source, lm_ppm, count(*) AS cnt FROM scored GROUP BY 1, 2),
        |marked AS (SELECT source, lm_ppm, cnt,
        |  sum(cnt) OVER (PARTITION BY source ORDER BY lm_ppm DESC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY source) AS total FROM hist),
        |b AS (SELECT source, lm_ppm,
        |  CASE WHEN total = 1 OR 3*(cum-cnt) < total-1 THEN 'head'
        |       WHEN 3*(cum-cnt) < 2*(total-1) THEN 'middle'
        |       ELSE 'tail' END AS bucket FROM marked)
        |SELECT s.doc_id, s.source, s.lm_ppm, b.bucket
        |FROM scored s JOIN b USING (source, lm_ppm) ORDER BY s.doc_id""".stripMargin
  )

  /** Generated DuckDB mirror of [[graft.operators.CorpusOps.doremiMix]]:
    * q81's lm CTE → per-domain floor-mean excess loss → `iters` unrolled
    * CTEs of the linearized multiplicative-weights update. Every
    * operation is positive-integer floor arithmetic (HUGEINT `//` on the
    * DuckDB side ≡ positive LONG `/` on the JVM side), so the weights
    * replay bit-for-bit — same discipline as q78's GD mirror.
    */
  private def doremiOracleSql(iters: Int = 3, etaPct: Int = 50,
                              smoothPct: Int = 10): String = {
    val f = s"(1000000 + ($etaPct * excess) // 100)" // the per-domain factor
    val its = (1 to iters).map { k =>
      s"""w$k AS (SELECT source, excess, nd,
         |  ((${100 - smoothPct}) * ((w * $f * 1000000) // (SELECT sum(w * $f) FROM w${k - 1}))) // 100
         |  + ($smoothPct * 1000000) // (100 * nd) AS w FROM w${k - 1})""".stripMargin
    }.mkString(",\n")
    val sel = (1 to iters).map { k =>
      s"SELECT $k AS iter, source, CAST(excess AS BIGINT) AS excess_ppm, CAST(w AS BIGINT) AS weight_ppm FROM w$k"
    }.mkString("\nUNION ALL ")
    s"""WITH tok AS (
       |  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
       |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
       |               unnest(range(len(string_split(text,' ')))) AS pos FROM documents)
       |  WHERE len(t) > 0),
       |bi AS (SELECT a.doc_id, a.t AS w1, a.t || ' ' || b.t AS g
       |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
       |pf AS (SELECT g, count(*) AS c2 FROM bi GROUP BY 1),
       |lf AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
       |lm AS (SELECT doc_id,
       |  CAST(CAST(sum((CAST(c2 AS HUGEINT) * 1000000) // c1) AS HUGEINT)
       |       // count(*) AS BIGINT) AS lm_ppm
       |  FROM bi JOIN pf USING (g) JOIN lf USING (w1) GROUP BY doc_id),
       |dom AS (SELECT d.source, count(*) AS n, CAST(sum(1000000 - lm.lm_ppm) AS BIGINT) AS sl
       |        FROM documents d JOIN lm ON d.doc_id = lm.doc_id GROUP BY 1),
       |ex AS (SELECT source, GREATEST(0, sl // n -
       |         (SELECT CAST(sum(sl) AS BIGINT) // CAST(sum(n) AS BIGINT) FROM dom)) AS excess,
       |       (SELECT count(*) FROM dom) AS nd FROM dom),
       |w0 AS (SELECT source, excess, nd, 1000000 // nd AS w FROM ex),
       |$its
       |$sel
       |ORDER BY iter, source""".stripMargin
  }

  /** BM25 oracle, shared verbatim by q113 (one-shot scan) and q113b
    * (persisted inverted-index probe): the index is a layout, not a
    * semantics change, so both forms must hash-match this table.
    */
  private def bm25OracleSql: String =
    """WITH docs AS (SELECT doc_id,
      |   list_filter(string_split(text,' '), x -> x <> '') AS ts FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(ts)) AS avgdl FROM docs),
      |tok AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS token FROM docs),
      |tf AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl FROM tok
      |       WHERE token IN ('hash','merge','window') GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
      |SELECT doc_id,
      |  round(sum( ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * (1.2+1)) /
      |             (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) ), 4) AS score
      |FROM tf JOIN dfreq USING (token), stats
      |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** DuckDB mirror of [[graft.operators.Dedup.simhashPairsMirrorable]]:
    * the md5-nibble token hash (strpos in the hex alphabet ≡ Spark's
    * base-16 conv), the 32 ±1 majority sums, signature assembly as a sum
    * of power-of-two terms, 8-bit chunk candidate generation, and
    * bit_count hamming — every stage value-identical to the Spark plan.
    */
  /** Stage-by-stage DuckDB mirror of the training-corpus pipeline —
    * shared by the one-shot composition (q64) and its streaming
    * maintainer (q64s), which must materialize the identical corpus.
    */
  private def trainingCorpusOracleSql: String =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, source, text,
      |           list_filter(string_split(text,' '), x -> x <> '') AS ts
      |         FROM documents),
      |quality AS (SELECT doc_id, source, text, CAST(len(ts) AS BIGINT) AS n_tokens
      |            FROM toks WHERE len(ts) BETWEEN 10 AND 1000),
      |keepx AS (SELECT doc_id, source, n_tokens,
      |            doc_id = min(doc_id) OVER (PARTITION BY
      |              md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS keep
      |          FROM quality),
      |keep_exact AS (SELECT doc_id, source, n_tokens FROM keepx WHERE keep),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         generate_series(1, len(string_split(text,' '))-2),
      |         i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |       FROM documents),
      |sizes AS (SELECT doc_id, len(sh) AS sz FROM sh),
      |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      |ipairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
      |pairs AS (SELECT p.a, p.b FROM ipairs p
      |          JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
      |          WHERE round(CAST(p.inter AS DOUBLE)/(sa.sz+sb.sz-p.inter),4) >= 0.5),
      |edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b AS x, a AS y FROM pairs),
      |reach AS (SELECT x, y FROM edges
      |          UNION
      |          SELECT e.x, r.y FROM edges e JOIN reach r ON e.y = r.x),
      |losers AS (SELECT x AS doc_id FROM reach GROUP BY 1 HAVING min(y) < x),
      |g8 AS (SELECT doc_id, source,
      |         array_to_string(ts[CAST(i+1 AS BIGINT):CAST(i+8 AS BIGINT)], ' ') AS gram
      |       FROM toks, unnest(range(len(ts)-7)) AS u(i)
      |       WHERE len(ts) >= 8),
      |bench AS (SELECT DISTINCT gram FROM g8 WHERE source = 'src0'),
      |contaminated AS (SELECT DISTINCT doc_id FROM g8 JOIN bench USING (gram)
      |                 WHERE source <> 'src0'),
      |clean AS (SELECT * FROM keep_exact
      |          WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      |            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |packed AS (SELECT doc_id, source, n_tokens,
      |             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
      |           FROM clean)
      |SELECT doc_id, source, n_tokens, start_off,
      |  CAST(floor(start_off/512.0) AS BIGINT) AS chunk_first
      |FROM packed ORDER BY doc_id""".stripMargin

  private def simhashMirrorOracleSql(maxHamming: Int = 3): String = {
    val nibs = (0 until 8).map(j =>
      s"strpos('0123456789abcdef', substr(m,${j + 1},1))-1 AS n$j").mkString(",\n  ")
    val bitSums = (0 until 32).map(i =>
      s"sum(CASE WHEN (n${i / 4} >> ${i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n  ")
    val sigTerms = (0 until 32).map(i =>
      s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    val chunkCols = (0 until 4).map(j =>
      s"(simhash >> ${j * 8}) & 255 AS c$j").mkString(", ")
    val chunkEq = (0 until 4).map(j => s"a.c$j = b.c$j").mkString(" OR ")
    s"""WITH tok AS (SELECT doc_id, md5(t) AS m FROM (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents)
      |  WHERE len(t) > 0),
      |nib AS (SELECT doc_id,
      |  $nibs
      |  FROM tok),
      |bits AS (SELECT doc_id,
      |  $bitSums
      |  FROM nib GROUP BY doc_id),
      |sig AS (SELECT doc_id, CAST($sigTerms AS BIGINT) AS simhash FROM bits),
      |ch AS (SELECT doc_id, simhash, $chunkCols FROM sig)
      |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM ch a JOIN ch b ON a.doc_id < b.doc_id AND ($chunkEq)
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
      |ORDER BY 1, 2""".stripMargin
  }

  /** DuckDB mirror of [[graft.operators.Similarity.kmeans]]: `iters`
    * unrolled Lloyd's iterations, k initial centroids = the first k
    * vectors by vec_id. Engine-exact by construction: distances are
    * sequential-double dots on both engines (DuckDB's list_inner_product
    * ≡ the codegen ArrayDotProduct loop, empirically bit-identical);
    * inertia sums per-row 1e-4-grid quantized distances exactly; centroid
    * means land on the 1e-6 grid via integer-rounded quotients — the same
    * quantized-moments recipe as q16.
    */
  /** DuckDB mirror of [[graft.operators.Similarity.semDedup]]: the same
    * unrolled quantized Lloyd iterations as [[kmeansOracleSql]] (every
    * block updates, so `c${iters+1}` is the engine's final codebook),
    * a final assignment against it, then the within-cluster pair join
    * with `round(list_cosine_similarity, 4)` — the exact q54 contract,
    * already hash-stable cross-engine — and the min-id keeper rollup.
    */
  private def semDedupOracleSql(k: Int = 8, iters: Int = 3,
                                tau: Double = 0.4): String = {
    val sExpr = "list_inner_product(e.v, c.c)*-2.0 + list_sum(list_transform(c.c, x -> x*x))"
    def block(i: Int): String =
      s"""a$i AS (SELECT vec_id, v, cluster FROM (
        |  SELECT e.vec_id, e.v, c.cluster,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY $sExpr ASC, c.cluster ASC) AS rn
        |  FROM e CROSS JOIN c$i c) t WHERE rn = 1),
        |u$i AS (SELECT cluster, i,
        |    CAST(round(CAST(sum(q) AS DOUBLE)/count(*)) AS BIGINT)/1000000.0 AS m
        |  FROM (SELECT cluster, unnest(range(len(v))) AS i,
        |        CAST(round(unnest(v)*1000000) AS BIGINT) AS q FROM a$i) z
        |  GROUP BY cluster, i),
        |c${i + 1} AS (SELECT c$i.cluster, coalesce(u.c, c$i.c) AS c FROM c$i LEFT JOIN
        |  (SELECT cluster, list(m ORDER BY i) AS c FROM u$i GROUP BY cluster) u
        |  USING (cluster)),""".stripMargin
    val fin = iters + 1
    s"""WITH e AS (SELECT vec_id, embedding,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |c1 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v AS c
      |  FROM e WHERE vec_id < $k),
      |${(1 to iters).map(block).mkString("\n")}
      |af AS (SELECT vec_id, embedding, cluster FROM (
      |  SELECT e.vec_id, e.embedding, c.cluster,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY $sExpr ASC, c.cluster ASC) AS rn
      |  FROM e CROSS JOIN c$fin c) t WHERE rn = 1),
      |pairs AS (SELECT a.cluster, a.vec_id AS a, b.vec_id AS b
      |  FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4) >= $tau)
      |SELECT b AS vec_id, cluster, min(a) AS kept_by, count(*) AS n_dups
      |FROM pairs GROUP BY b, cluster ORDER BY vec_id""".stripMargin
  }

  private def kmeansOracleSql(k: Int = 8, iters: Int = 3): String = {
    val sExpr = "list_inner_product(e.v, c.c)*-2.0 + list_sum(list_transform(c.c, x -> x*x))"
    def iterBlock(i: Int): String = {
      val next =
        if (i == iters) ""
        else s"""
          |u$i AS (SELECT cluster, i,
          |    CAST(round(CAST(sum(q) AS DOUBLE)/count(*)) AS BIGINT)/1000000.0 AS m
          |  FROM (SELECT cluster, unnest(range(len(v))) AS i,
          |        CAST(round(unnest(v)*1000000) AS BIGINT) AS q FROM a$i) z
          |  GROUP BY cluster, i),
          |c${i + 1} AS (SELECT c$i.cluster, coalesce(u.c, c$i.c) AS c FROM c$i LEFT JOIN
          |  (SELECT cluster, list(m ORDER BY i) AS c FROM u$i GROUP BY cluster) u
          |  USING (cluster)),""".stripMargin
      s"""a$i AS (SELECT vec_id, v, cluster, sq FROM (
        |  SELECT e.vec_id, e.v, c.cluster,
        |    list_inner_product(e.v, e.v) + ($sExpr) AS sq,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY $sExpr ASC, c.cluster ASC) AS rn
        |  FROM e CROSS JOIN c$i c) t WHERE rn = 1),
        |s$i AS (SELECT CAST($i AS INT) AS iter, cluster, count(*) AS n,
        |  round(CAST(sum(CAST(round(sq*10000) AS BIGINT)) AS DOUBLE)/10000.0, 4) AS inertia
        |  FROM a$i GROUP BY cluster),""".stripMargin + next
    }
    val union = (1 to iters).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |c1 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v AS c
      |  FROM e WHERE vec_id < $k),
      |${(1 to iters).map(iterBlock).mkString("\n")}
      |final AS ($union)
      |SELECT iter, cluster, CAST(n AS BIGINT) AS n, inertia FROM final
      |ORDER BY iter, cluster""".stripMargin
  }

  /** DuckDB mirror of [[graft.operators.TextAnalysis.bpeTrain]] — the
    * full BPE training loop unrolled to `k` iterations. Each iteration:
    * adjacent-pair counts over the current symbol strings (list-index
    * pairs, no ORDINALITY), the argmax with the (n DESC, p1, p2)
    * tie-break, then merge application as a RECURSIVE leftmost-
    * occurrence replace over the sentinel-delimited form ' s1 s2 ... '.
    * Leftmost-iterate ≡ the engine's greedy left-to-right fold: the
    * merged symbol p1p2 is strictly longer than p1 and p2, so a
    * replacement can never create a match to its left, and the space
    * sentinels keep matches symbol-aligned. `encode=true` appends the
    * corpus join: per-document whitespace vs BPE token counts (q85);
    * otherwise the merge table itself is the result (q77).
    */
  private def bpeOracleSql(k: Int = 8, encode: Boolean = false): String = {
    def iter(i: Int): String = {
      val p = i - 1
      s"""x$i AS MATERIALIZED (SELECT cnt, arr, unnest(generate_series(1, len(arr)-1)) AS j
        |  FROM (SELECT cnt, string_split(sym, ' ') AS arr FROM w$p)),
        |m$i AS MATERIALIZED (SELECT arr[j] AS p1, arr[j+1] AS p2, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM x$i GROUP BY 1, 2 ORDER BY n DESC, p1, p2 LIMIT 1),
        |mp$i AS MATERIALIZED (SELECT ' '||p1||' '||p2||' ' AS pat, ' '||p1||p2||' ' AS rep FROM m$i),
        |a$i AS (SELECT w, cnt, ' '||sym||' ' AS s FROM w$p
        |  UNION ALL
        |  SELECT a.w, a.cnt,
        |    substr(a.s, 1, instr(a.s, m.pat)-1) || m.rep ||
        |    substr(a.s, instr(a.s, m.pat) + length(m.pat))
        |  FROM a$i a, mp$i m WHERE instr(a.s, m.pat) > 0),
        |w$i AS MATERIALIZED (SELECT w, cnt, trim(s) AS sym FROM a$i a
        |  WHERE NOT EXISTS (SELECT 1 FROM mp$i m WHERE instr(a.s, m.pat) > 0))"""
        .stripMargin
    }
    val head =
      s"""WITH RECURSIVE w0 AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
        |    array_to_string(string_split(w, ''), ' ') AS sym
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |${(1 to k).map(iter).mkString(",\n")}""".stripMargin
    if (!encode) {
      val union = (1 to k)
        .map(i => s"SELECT $i AS iter, p1, p2, n FROM m$i").mkString(" UNION ALL ")
      s"""$head,
        |mg AS ($union)
        |SELECT CAST(iter AS INT) AS iter, p1, p2, n FROM mg ORDER BY iter"""
        .stripMargin
    } else {
      s"""$head,
        |wm AS (SELECT w, len(string_split(sym, ' ')) AS nb FROM w$k),
        |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(wm.nb) AS BIGINT) AS n_bpe
        |FROM dt JOIN wm USING (w) WHERE dt.w <> ''
        |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin
    }
  }
}
