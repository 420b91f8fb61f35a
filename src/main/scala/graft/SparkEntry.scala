package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or a
  * training-data-pipeline extension), and every SQL-expressible one has
  * a DuckDB oracle in [[oracleSql]] with matching column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  /** Flagship: the composed training-data build — curation (near-dup
    * clustering + quality + langID), epoch mixing, and sequence packing
    * in one declarative plan. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.trainingExport(spark, "/root/testdata/sf0.001")

  // ---- DuckDB twins of the md5-based signatures (q25/q26/q30) --------
  // Generated from the same constants the Spark operators use, so the
  // oracle replays signature + banding + verification bit-for-bit.

  /** q25's CTE chain ending in a `pairs` relation — shared verbatim by
    * q25 (the pair list) and q49 (clusters over the same pairs). */
  /** The 16×2 banding predicate over two `mh` signature columns —
    * shared by q25's candidate join and q142's calibration join. */
  private lazy val bandCondSql: String =
    (0 until Dedup.NumBands).map { j =>
      val r0 = Dedup.BandRows * j + 1; val r1 = r0 + 1
      s"(x.mh[$r0] = y.mh[$r0] AND x.mh[$r1] = y.mh[$r1])" }.mkString(" OR ")

  private lazy val q25Ctes: String = {
    val sigElems = Dedup.perms.map { case (a, b) =>
      s"list_min(list_transform(hs, x -> ($a * x + $b) % ${Dedup.P}))" }.mkString(",\n    ")
    val bandCond = bandCondSql
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(0, len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' '))
       |    ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
       | h AS (SELECT doc_id, shs,
       |    list_transform(shs, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % ${Dedup.P}) AS hs FROM sh),
       | sig AS (SELECT doc_id, shs, [$sigElems] AS mh FROM h),
       | cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.shs AS sa, y.shs AS sb
       |   FROM sig x JOIN sig y ON x.doc_id < y.doc_id AND ($bandCond)),
       | pairs AS (SELECT doc_a, doc_b, jaccard FROM (
       |   SELECT doc_a, doc_b,
       |     round(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
       |           / len(list_distinct(list_concat(sa, sb))), 4) AS jaccard
       |   FROM cand)
       |  WHERE jaccard >= 0.8)""".stripMargin
  }

  /** q25: minhash signature + 16×2 banding + exact shingle-jaccard. */
  private lazy val q25Sql: String =
    s"WITH $q25Ctes SELECT doc_a, doc_b, jaccard FROM pairs"

  /** q142: estimator calibration — banded candidates (no threshold, no
    * size-ratio prefilter), signature-estimate vs exact Jaccard in
    * integer micro-units, floor-divided means per exact-decile. The
    * exact side counts shingle STRINGS where Spark counts their 60-bit
    * hashes — identical modulo md5 collisions, the q25 precedent.
    * q25Ctes' `cand`/`pairs` CTEs go unreferenced here (lazy, unevaluated). */
  private lazy val q142Sql: String =
    s"""WITH $q25Ctes,
       | cal_cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |     x.mh AS ma, y.mh AS mb, x.shs AS sa, y.shs AS sb
       |   FROM sig x JOIN sig y ON x.doc_id < y.doc_id AND ($bandCondSql)),
       | per AS (SELECT
       |     CAST(len(list_filter(range(1, ${Dedup.NumPerms + 1}),
       |       i -> ma[i] = mb[i])) AS BIGINT) * ${1000000L / Dedup.NumPerms} AS est_micro,
       |     CAST(len(list_intersect(sa, sb)) * 1000000
       |       // len(list_distinct(list_concat(sa, sb))) AS BIGINT) AS exact_micro
       |   FROM cal_cand),
       | buck AS (SELECT least(9, exact_micro // 100000) AS decile,
       |     est_micro, exact_micro FROM per)
       |SELECT CAST(decile AS BIGINT) AS decile,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(est_micro) // count(*) AS BIGINT) AS mean_est_micro,
       |  CAST(sum(exact_micro) // count(*) AS BIGINT) AS mean_exact_micro,
       |  CAST(sum(abs(est_micro - exact_micro)) // count(*) AS BIGINT) AS mean_abs_err_micro
       |FROM buck GROUP BY decile""".stripMargin

  /** Transitive-closure CTEs over a `pairs(doc_a, doc_b)` relation,
    * ending in `clus(doc_id, cluster_id)` — cluster id = min reachable
    * id, the exact fixpoint the Spark side's min-label propagation
    * converges to. Shared by q49 (text clusters), q53 (curation), and —
    * with renamed columns — q54 (embedding clusters). */
  private val ccCtes: String =
    """edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |           UNION ALL SELECT doc_b, doc_a FROM pairs),
      | reach(a, b) AS (
      |   SELECT a, b FROM edges
      |   UNION
      |   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      | clus AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |          FROM reach GROUP BY a)""".stripMargin

  /** q49: connected components over q25's pair graph. */
  private lazy val q49Sql: String =
    s"""WITH RECURSIVE $q25Ctes,
       | $ccCtes
       |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical FROM clus""".stripMargin

  /** DuckDB twin of [[graft.functions.Text.qualityScore]] /
    * [[graft.functions.Text.langId]] given `toks` + stopword count `sw`. */
  private val qualityExpr: String =
    """round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
      |      + 0.4 * (1.0 - sw / len(toks))
      |      + 0.2 * least(len(toks) / 100.0, 1.0), 4)""".stripMargin
  private val docMetricsCte: String =
    s"""m AS (SELECT doc_id, source, $qualityExpr AS quality,
       |    CASE WHEN sw / len(toks) > 0.03 THEN 'en' ELSE 'und' END AS guess
       |  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks,
       |      CAST(len(list_filter(string_split(text, ' '),
       |        x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
       |    FROM documents))""".stripMargin

  /** q26: 60-bit simhash + 4×15-bit chunk banding + Hamming filter. */
  private lazy val q26Sql: String = {
    val chunkCond = (0 until Dedup.SimhashChunks).map { j =>
      s"((x.sh >> ${j * 15}) & 32767 = (y.sh >> ${j * 15}) & 32767)" }.mkString(" OR ")
    s"""WITH h AS (SELECT doc_id,
       |    list_transform(string_split(text, ' '),
       |      t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs FROM documents),
       | s AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, ${Dedup.SimhashBits}),
       |    i -> CASE WHEN CAST(list_sum(list_transform(hs,
       |           h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
       |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS sh FROM h)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    bit_count(xor(x.sh, y.sh)) AS hamming
       |  FROM s x JOIN s y ON x.doc_id < y.doc_id AND ($chunkCond))
       |WHERE hamming <= 16""".stripMargin
  }

  /** q30: 16-bit hyperplane signature + 4×4-bit bands + top-k. */
  /** The 16-bit hyperplane signature replay (Vectors.hyperplaneSignature)
    * — shared by q30's LSH ANN and q137's banded near-dups. */
  private lazy val HyperplaneSigSql: String =
    (0 until 16).map { j =>
      s"""CASE WHEN round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(embedding[i] AS DOUBLE) * (CASE WHEN
         |        (CAST('0x' || substr(md5('$j-' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1) = 0
         |        THEN 1.0 ELSE -1.0 END))), 6) > 0
         |    THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END""".stripMargin }.mkString(" +\n    ")

  private lazy val q30Sql: String = {
    val sigExpr = HyperplaneSigSql
    val bandCond = (0 until 4).map { j =>
      s"((qsig >> ${j * 4}) & 15 = (csig >> ${j * 4}) & 15)" }.mkString(" OR ")
    s"""WITH sig AS (SELECT vec_id, embedding, ($sigExpr) AS sig FROM embeddings),
       | q AS (SELECT vec_id AS query_id, embedding AS qv, sig AS qsig FROM sig WHERE vec_id < 10),
       | c AS (SELECT vec_id AS cand_id, embedding AS cv, sig AS csig FROM sig),
       | s AS (SELECT query_id, cand_id,
       |   round(list_sum(list_transform(range(1, 65),
       |     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
       |   FROM q JOIN c ON cand_id <> query_id AND ($bandCond)),
       | r AS (SELECT query_id, cand_id, sim,
       |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) AS rank FROM s)
       |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin
  }

  /** q123: 60-bit hyperplane signature + 15×4-bit bands + per-query
    * Hamming-shortlist (top-100 by popcount, integer-exact) + exact
    * cosine rerank — the binary-quantization ANN replay. */
  /** The Hamming-ANN CTE chain (sig → band shortlist → rerank `r`),
    * shared by q123 (rank ≤ 5) and q201's eval harness (rank ≤ 10). */
  private lazy val hammingCteChain: String = {
    val sigExpr = (0 until 60).map { j =>
      s"""CASE WHEN round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(embedding[i] AS DOUBLE) * (CASE WHEN
         |        (CAST('0x' || substr(md5('$j-' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1) = 0
         |        THEN 1.0 ELSE -1.0 END))), 6) > 0
         |    THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END""".stripMargin }.mkString(" +\n    ")
    val bandCond = (0 until 15).map { j =>
      s"((qsig >> ${j * 4}) & 15 = (csig >> ${j * 4}) & 15)" }.mkString(" OR ")
    s"""sig AS (SELECT vec_id, embedding, ($sigExpr) AS sig FROM embeddings),
       | q AS (SELECT vec_id AS query_id, embedding AS qv, sig AS qsig FROM sig WHERE vec_id < 10),
       | c AS (SELECT vec_id AS cand_id, embedding AS cv, sig AS csig FROM sig),
       | cd AS (SELECT query_id, cand_id, qv, cv,
       |   CAST(bit_count(xor(qsig, csig)) AS BIGINT) AS hamming
       |   FROM q JOIN c ON cand_id <> query_id AND ($bandCond)),
       | sl AS (SELECT query_id, cand_id, qv, cv,
       |   row_number() OVER (PARTITION BY query_id
       |                      ORDER BY hamming ASC, cand_id ASC) AS slr FROM cd),
       | s AS (SELECT query_id, cand_id,
       |   round(list_sum(list_transform(range(1, 65),
       |     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
       |   FROM sl WHERE slr <= 100),
       | r AS (SELECT query_id, cand_id, sim,
       |   row_number() OVER (PARTITION BY query_id
       |                      ORDER BY sim DESC, cand_id ASC) AS rank FROM s)""".stripMargin
  }

  private lazy val q123Sql: String =
    s"""WITH $hammingCteChain
       |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.pricingSummary _),
    "q2_revenue_by_nation" -> (Relational.revenueByNation _),
    "q3_top_orders" -> (Relational.topOrders _),
    "q4_trend_daily" -> (Relational.trendDaily _),
    "q5_source_target_diff" -> (Relational.sourceTargetDiff _),
    "q7_anti_join" -> (Relational.partsNotShipped1996 _),
    "q8_distinct_users" -> (Relational.distinctUsers _),
    "q9_recent_errors" -> (Relational.recentErrors _),
    "q10_union_merged" -> (Relational.mergedYearExport _),
    "q12_json_extract" -> (Relational.jsonKBuckets _),
    "q13_daily_sync_stats" -> (Relational.dailySyncStats _),
    "q11_masked_projection" -> (Pii.maskedProjection _),
    "q14_encrypt_roundtrip" -> (Pii.encryptRoundtrip _),
    "q17_nested_mask" -> (Pii.nestedMask _),
    "q15_conditional_count" -> (Windows.conditionalCount _),
    "q16_export_window" -> (Windows.exportWindowSlice _),
    "q20_token_stats" -> (TextOps.tokenStats _),
    "q21_quality_scores" -> (TextOps.qualityScores _),
    "q22_lang_id" -> (TextOps.langIdRollup _),
    "q23_fingerprint" -> (TextOps.fingerprints _),
    "q24_dedup_exact" -> (Dedup.exactLatestEvents _),
    "q25_minhash_pairs" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "q26_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q27_token_jaccard" -> ((s, d) => Dedup.tokenJaccardPairs(s, d)),
    "q28_embedding_neardups" -> ((s, d) => Similarity.embeddingNearDups(s, d)),
    "q29_ann_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q30_lsh_ann" -> ((s, d) => Similarity.lshTopK(s, d)),
    "q31_cdc_state" -> (Cdc.finalState _),
    "q32_cdc_state_keep_deletes" -> (Cdc.finalStateIgnoreDeletes _),
    "q33_backup_pruned_export" -> (Backup.prunedMergedExport _),
    "q34_multimodal_meta" -> (Multimodal.mediaMeta _),
    "q35_sql_passthrough" -> (SqlGateway.regionRollup _),
    "q36_schema_infer" -> (SchemaInfer.inferEventDoc _),
    "q37_kv_snapshot" -> (KvStore.snapshot _),
    "q38_kv_state" -> (KvStore.finalState _),
    "q39_kv_stream_msgs" -> (KvStore.streamMessages _),
    "q40_keyless_state" -> (Keyless.finalStateCounts _),
    "q41_json_doc_mask" -> (Pii.jsonDocMask _),
    "q42_map_mask" -> (Pii.mapMask _),
    "q43_log_search" -> ((s, d) =>
      Relational.recentLogs(s, d, level = Some("Error"), search = Some("1}"))),
    "q44_yesterday_diff" -> (Relational.yesterdayDiff _),
    "q45_meta_scan" -> ((s, d) => Relational.metaScan(s, d, graft.Tables.all)),
    "q46_ivf_ann" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q47_frame_sample" -> ((s, d) => Multimodal.sampleFrames(s, d)),
    "q48_cdc_tombstones" -> (Cdc.finalStateWithTombstones _),
    "q49_dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "q50_incremental_dedup" -> ((s, d) => Dedup.incrementalPairs(s, d)),
    "q51_weighted_mix" -> ((s, d) => TextOps.weightedSample(s, d)),
    "q52_seq_pack" -> ((s, d) => TextOps.packSequences(s, d)),
    "q53_curate" -> ((s, d) => TextOps.curate(s, d)),
    "q54_embedding_clusters" -> ((s, d) => Similarity.embeddingClusters(s, d)),
    "q55_top_quality" -> ((s, d) => TextOps.topQualityPerSource(s, d)),
    "q56_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "q57_repetition" -> ((s, d) => TextOps.repetitionScores(s, d)),
    "q58_corpus_stats" -> (TextOps.corpusStats _),
    "q59_asof_join" -> (EventFlow.asofViewBeforePurchase _),
    "q60_sessions" -> ((s, d) => EventFlow.sessionize(s, d)),
    "q61_vocabulary" -> ((s, d) => TextOps.vocabulary(s, d)),
    "q62_quantized_ann" -> ((s, d) => Similarity.quantizedTopK(s, d)),
    "q63_length_histogram" -> ((s, d) => TextOps.lengthHistogram(s, d)),
    "q64_epoch_mix" -> ((s, d) => TextOps.epochMix(s, d)),
    "q65_unigram_lm" -> ((s, d) => TextOps.unigramLm(s, d)),
    "q66_keywords" -> ((s, d) => TextOps.keywords(s, d)),
    "q67_stratified_sample" -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "q68_shard_manifest" -> ((s, d) => TextOps.shardManifest(s, d)),
    "q69_training_export" -> ((s, d) => TextOps.trainingExport(s, d)),
    "q70_top_quality_salted" -> ((s, d) => TextOps.topQualityPerSourceSalted(s, d)),
    "q71_quality_classifier" -> ((s, d) => TextOps.qualityClassifier(s, d)),
    "q72_bigram_lm" -> ((s, d) => TextOps.bigramLm(s, d)),
    "q73_funnel" -> (EventFlow.conversionFunnel _),
    "q74_retention" -> (EventFlow.retentionCohorts _),
    "q75_boilerplate" -> ((s, d) => TextOps.boilerplateShingles(s, d)),
    "q76_boiler_coverage" -> ((s, d) => TextOps.boilerplateCoverage(s, d)),
    "q77_chunk_dedup" -> ((s, d) => TextOps.chunkDedup(s, d)),
    "q78_lang_temperature" -> ((s, d) => TextOps.langTemperatureMix(s, d)),
    "q79_importance_score" -> ((s, d) => TextOps.importanceScores(s, d)),
    "q80_pq_ann" -> ((s, d) => Similarity.pqTopK(s, d)),
    "q81_cms_frequencies" -> ((s, d) => TextOps.cmsTokenFrequencies(s, d)),
    "q82_bpe_merges" -> ((s, d) => TextOps.bpeMerges(s, d)),
    "q83_hll_distinct" -> (Sketches.hllDistinctTokens _),
    "q84_tfidf" -> ((s, d) => Relevance.tfIdf(s, d)),
    "q85_pmi_collocations" -> ((s, d) => Relevance.pmiCollocations(s, d)),
    "q86_bloom_prune" -> (Sketches.bloomPrefilterReport _),
    "q87_token_percentiles" -> (Relevance.tokenPercentiles _),
    "q88_markov_transitions" -> (EventFlow.markovTransitions _),
    "q89_order_cube" -> (Relational.orderCube _),
    "q90_value_anomalies" -> (EventFlow.dailyAnomalies _),
    "q91_top_customer_revenue" -> ((s, d) => Relational.topCustomerRevenue(s, d)),
    "q92_quality_quartiles" -> (Relevance.qualityQuartiles _),
    "q93_event_pivot" -> (Relational.eventPivot _),
    "q94_event_trigrams" -> ((s, d) => EventFlow.eventTrigrams(s, d)),
    "q95_log_quantiles" -> (Sketches.logQuantiles _),
    "q96_rolling_rates" -> ((s, d) => EventFlow.rollingRates(s, d)),
    "q97_pii_scrub" -> (TextOps.scrubPii _),
    "q98_packed_chunks" -> ((s, d) => TextOps.packedChunks(s, d)),
    "q99_profile" -> ((s, d) => Relational.profileTable(s, d, "orders")),
    "q100_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "q101_scd2_versions" -> (EventFlow.scd2Versions _),
    "q102_pit_join" -> (EventFlow.pitJoin _),
    "q103_snapshot_diff" -> (Relational.corpusSnapshotDiff _),
    "q104_zorder_keys" -> (Layout.zOrderEvents _),
    "q105_filtered_ann" -> ((s, d) => Similarity.filteredIvfTopK(s, d)),
    "q106_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q107_rag_chunks" -> ((s, d) => TextOps.ragChunks(s, d)),
    "q108_dup_rate" -> ((s, d) => TextOps.dupRateBySource(s, d)),
    "q109_curriculum" -> (Relevance.curriculumOrder _),
    "q110_oov_report" -> ((s, d) => TextOps.oovReport(s, d)),
    "q111_daily_spine" -> (Relational.dailySpineCounts _),
    // the STREAMING operator run as a batch plan — withWatermark is a
    // no-op on a batch frame, so one implementation serves both modes
    // (IntervalJoinStreamSpec pins stream≡batch on the same fixture)
    "q112_attribution" -> ((s, d) => graft.streaming.IntervalJoinStream.attributed(
      graft.Tables(s, d, "events")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("event_type")))),
    "q113_revenue_trend" -> (Relational.revenueTrend _),
    "q114_joint_curate" -> ((s, d) => TextOps.jointCurate(s, d)),
    "q115_drift_psi" -> ((s, d) => Relational.driftPsi(s, d)),
    "q116_clean_split" -> ((s, d) => TextOps.cleanSplit(s, d)),
    "q117_daily_active" -> (Sketches.dailyActiveUsers _),
    "q118_frame_dedup" -> ((s, d) => Multimodal.frameDedup(s, d)),
    "q119_dq_report" -> (Relational.dqReport _),
    "q120_quality_percentiles" -> (Relevance.qualityPercentiles _),
    "q121_cluster_sizes" -> ((s, d) => Dedup.clusterSizeHistogram(s, d)),
    "q122_sqldump_restore" -> ((s, d) => Backup.sqlDumpRestoreReport(s, d)),
    "q123_hamming_ann" -> ((s, d) => Similarity.hammingTopK(s, d)),
    "q124_vocab_overlap" -> ((s, d) => Sketches.vocabOverlap(s, d)),
    "q125_cooccurrence" -> ((s, d) => EventFlow.cooccurrenceLift(s, d)),
    "q126_token_entropy" -> ((s, d) => TextOps.tokenEntropy(s, d)),
    "q127_burstiness" -> ((s, d) => TextOps.lengthBurstiness(s, d)),
    "q128_bpe_encode" -> ((s, d) => TextOps.applyBpe(s, d)),
    "q129_small_quantity" -> ((s, d) => Relational.smallQuantityRevenue(s, d)),
    // no oracle (driver records rows-only): the SQL replay would be six
    // stitched method replays — each method is oracle-checked alone
    // (q29/q30/q46/q62/q80/q123); the spec re-derives every recall
    "q130_ann_bakeoff" -> ((s, d) => Similarity.annBakeoff(s, d)),
    "q131_late_orders" -> ((s, d) => Relational.lateOrdersByPriority(s, d)),
    "q132_inactive_rich" -> ((s, d) => Relational.inactiveRichCustomers(s, d)),
    "q133_top_supplier" -> ((s, d) => Relational.topSupplierRevenue(s, d)),
    "q134_conversion_latency" -> (EventFlow.conversionLatency _),
    "q135_dow_profile" -> (Relational.dowProfile _),
    "q136_profile_approx" -> ((s, d) => Relational.profileTableApprox(s, d, "orders")),
    "q137_neardup_banded" -> ((s, d) => Similarity.embeddingNearDupsBanded(s, d)),
    "q138_banded_clusters" -> ((s, d) => Similarity.embeddingClustersBanded(s, d)),
    "q139_zone_stats" -> ((s, d) => Relational.zoneStats(s, d, "orders")),
    "q140_markov_stationary" -> (EventFlow.markovStationary(_, _)),
    "q141_chunk_rewrite" -> ((s, d) => TextOps.chunkRewrite(s, d)),
    "q142_minhash_calibration" -> ((s, d) => Dedup.minhashCalibration(s, d)),
    "q143_bpe_fertility" -> ((s, d) => TextOps.bpeFertility(s, d)),
    "q144_quality_survivors" -> ((s, d) => Dedup.qualityAwareSurvivors(s, d)),
    "q145_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q146_source_divergence" -> ((s, d) => TextOps.sourceTokenDivergence(s, d)),
    "q147_waiting_suppliers" -> ((s, d) => Relational.waitingSuppliers(s, d)),
    "q148_volume_shipping" -> ((s, d) => Relational.volumeShipping(s, d)),
    "q149_bm25" -> ((s, d) => Relevance.bm25Retrieval(s, d)),
    "q150_hybrid_rrf" -> ((s, d) => Relevance.hybridRrf(s, d)),
    "q151_cumulative_dau" -> (Sketches.cumulativeActiveUsers _),
    "q152_multitouch" -> (EventFlow.multiTouchAttribution(_, _)),
    "q153_quality_zscores" -> ((s, d) => Relevance.qualityZScores(s, d)),
    "q154_session_entry_stats" -> (EventFlow.sessionStatsByEntry(_, _)),
    "q155_dow_anomalies" -> (EventFlow.dowAdjustedAnomalies(_, _)),
    "q156_cohort_ltv" -> (EventFlow.cohortLtv(_, _)),
    "q157_classifier_lift" -> ((s, d) => TextOps.classifierLift(s, d)),
    "q158_langid_eval" -> ((s, d) => TextOps.langIdEval(s, d)),
    "q159_robust_anomalies" -> (EventFlow.robustAnomalies(_, _)),
    "q160_funnel_summary" -> (EventFlow.funnelSummary(_, _)),
    "q161_dedup_savings" -> ((s, d) => TextOps.dedupSavingsBySource(s, d)),
    "q162_weighted_wor" -> ((s, d) => TextOps.weightedSampleTopK(s, d)),
    "q163_banding_sweep" -> ((s, d) => Dedup.bandingSweep(s, d)),
    "q164_cross_source_mirrors" -> ((s, d) => Dedup.crossSourceMirrors(s, d)),
    "q165_yoy_seasonality" -> (Relational.yoySeasonality(_, _)),
    "q166_novelty" -> ((s, d) => TextOps.noveltyScores(s, d)),
    "q167_zipf" -> ((s, d) => TextOps.zipfFit(s, d)),
    "q168_repurchase_gaps" -> (EventFlow.repurchaseGaps(_, _)),
    "q169_token_budget" -> ((s, d) => TextOps.tokenBudgetCurve(s, d)),
    "q170_session_cooccurrence" -> (EventFlow.sessionCooccurrenceLift(_, _)),
    "q171_repeat_revenue" -> (Relational.repeatRevenueShare(_, _)),
    "q172_cluster_quality_spread" -> ((s, d) => Dedup.clusterQualityDispersion(s, d)),
    "q173_forecast_revenue" -> ((s, d) => Relational.forecastRevenue(s, d)),
    "q174_shipping_priority" -> ((s, d) => Relational.shippingPriority(s, d)),
    "q175_local_supplier_volume" -> ((s, d) => Relational.localSupplierVolume(s, d)),
    "q176_returned_losers" -> ((s, d) => Relational.returnedItemLosers(s, d)),
    "q177_promo_share" -> ((s, d) => Relational.promoRevenueShare(s, d)),
    "q178_cust_order_dist" -> ((s, d) => Relational.custOrderDistribution(s, d)),
    "q179_big_qty_orders" -> ((s, d) => Relational.bigQuantityOrders(s, d)),
    "q180_brand_band_revenue" -> ((s, d) => Relational.brandBandRevenue(s, d)),
    "q181_late_priority_mix" -> ((s, d) => Relational.latePriorityMix(s, d)),
    "q182_market_share" -> ((s, d) => Relational.nationMarketShare(s, d)),
    "q183_nation_profit" -> ((s, d) => Relational.nationProfit(s, d)),
    "q184_topic_share" -> ((s, d) => Similarity.topicShareBySource(s, d)),
    "q185_blocklist" -> ((s, d) => TextOps.blocklistReport(s, d)),
    "q186_name_near_matches" -> ((s, d) => Dedup.nameNearMatches(s, d)),
    "q187_weekly_active" -> (EventFlow.weeklyActiveUsers(_, _)),
    "q188_grouping_sets" -> ((s, d) => Relational.revenueGroupingSets(s, d)),
    "q189_monthly_checksums" -> ((s, d) => Relational.monthlyChecksums(s, d)),
    "q190_order_backlog" -> ((s, d) => Relational.openOrderBacklog(s, d)),
    "q191_k_anonymity" -> ((s, d) => DataQuality.customerKAnonymity(s, d)),
    "q192_retrieval_eval" -> ((s, d) => Relevance.retrievalEval(s, d)),
    "q193_topic_packing" -> ((s, d) => TextOps.topicPackAssignments(s, d)),
    "q194_key_skew" -> ((s, d) =>
      DataQuality.keySkewProfile(graft.Tables(s, d, "events"), "user_id")),
    "q195_price_qty_corr" -> ((s, d) => Relational.priceQuantityCorrelation(s, d)),
    "q196_chi_square" -> ((s, d) => Relational.chiSquareIndependence(s, d)),
    "q197_part_associations" -> ((s, d) => Relational.partAssociations(s, d)),
    "q198_ref_integrity" -> ((s, d) => DataQuality.referentialIntegrity(
      graft.Tables(s, d, "lineitem"), "l_orderkey",
      graft.Tables(s, d, "orders"), "o_orderkey")),
    "q199_triplets" -> ((s, d) => Similarity.contrastiveTriplets(s, d)),
    "q200_datasheet" -> ((s, d) => TextOps.corpusDatasheet(s, d)),
    "q201_hamming_eval" -> ((s, d) => Relevance.hammingRetrievalEval(s, d)),
    "q202_revenue_pareto" -> ((s, d) => Relational.revenueConcentration(s, d)),
    "q203_revenue_gini" -> ((s, d) => Relational.revenueGini(s, d)),
    "q204_rfm_segments" -> ((s, d) => Relational.rfmSegments(s, d)),
    "q205_dup_ngrams" -> ((s, d) => TextOps.dupNgramCoverage(s, d)),
    "q206_l_diversity" -> ((s, d) => DataQuality.customerLDiversity(s, d)),
    "q207_activity_gaps" -> ((s, d) => EventFlow.activityGaps(s, d)),
    "q208_label_kappa" -> ((s, d) => TextOps.agreementKappa(s, d)),
    "q209_classifier_auc" -> ((s, d) => TextOps.classifierAuc(s, d)),
    "q210_ngram_decontam" -> ((s, d) => TextOps.ngramDecontaminate(s, d)),
    "q211_trend_ols" -> ((s, d) => Relational.revenueTrendOls(s, d)),
    "q212_calibration" -> ((s, d) => TextOps.classifierCalibration(s, d)),
    "q213_ks_drift" -> ((s, d) => TextOps.qualityKsDrift(s, d)),
    "q214_revenue_acf" -> ((s, d) => Relational.revenueAcf(s, d)),
    "q215_cusum_shift" -> ((s, d) => EventFlow.cusumChangepoints(s, d)),
    "q216_customer_percentiles" -> ((s, d) => Relational.customerRevenuePercentiles(s, d)),
    "q217_hazard_curve" -> ((s, d) => EventFlow.churnHazardCurve(s, d)),
    "q218_distinct_n" -> ((s, d) => TextOps.distinctNgramProfile(s, d)),
    "q219_benford" -> ((s, d) => DataQuality.benfordDigits(s, d)),
    "q220_holdout_ppl" -> ((s, d) => TextOps.holdoutPerplexity(s, d)),
    "q221_embedding_audit" -> ((s, d) => Similarity.embeddingAudit(s, d)),
    "q222_lang_conflicts" -> ((s, d) => TextOps.langConflicts(s, d)),
    "q223_order_reconciliation" -> ((s, d) => DataQuality.orderAmountReconciliation(s, d)),
    "q224_subject_census" -> ((s, d) => Subject.subjectCensus(s, d, SubjectKeys)),
    "q225_qq_deciles" -> ((s, d) => TextOps.qualityQqDeciles(s, d)),
    "q226_mix_plan" -> ((s, d) => TextOps.samplingMixPlan(s, d)),
    "q227_joint_histogram" -> ((s, d) => TextOps.lengthQualityHistogram(s, d)),
    "q228_daily_fano" -> ((s, d) => EventFlow.dailyFano(s, d)),
    "q229_label_separation" -> ((s, d) => Similarity.labelSeparation(s, d)),
    "q230_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "q231_triangles" -> ((s, d) => Graph.triangles(s, d)),
    "q232_t_closeness" -> ((s, d) => DataQuality.customerTCloseness(s, d)),
    "q233_bootstrap_ci" -> ((s, d) => TextOps.bootstrapQualityCi(s, d)),
    "q234_prf_expansion" -> ((s, d) => Relevance.prfExpansion(s, d)),
    "q235_communities" -> ((s, d) => Graph.labelPropagation(s, d)),
    "q236_related_parts" -> ((s, d) => Graph.personalizedPageRank(s, d)),
    "q237_spearman" -> ((s, d) => TextOps.lengthQualitySpearman(s, d)),
    "q238_conformal" -> ((s, d) => TextOps.conformalQualityIntervals(s, d)),
    "q239_graph_summary" -> ((s, d) => Graph.graphSummary(s, d)),
    "q240_semantic_decontam" -> ((s, d) => Similarity.semanticDecontaminate(s, d)),
    "q241_distinct_n_approx" -> ((s, d) => TextOps.distinctNgramApprox(s, d)),
    "q242_rec_eval" -> ((s, d) => Graph.recommenderEval(s, d)),
    "q243_markov_eval" -> ((s, d) => EventFlow.markovPredictionEval(s, d)),
    "q244_ab_readout" -> ((s, d) => EventFlow.abExperimentReadout(s, d)),
    "q245_trained_classifier" -> ((s, d) => TextOps.trainedQualityClassifier(s, d)),
    "q246_components" -> ((s, d) => Graph.connectedComponents(s, d)),
    "q247_walk_pairs" -> ((s, d) => Graph.randomWalkPairs(s, d)),
    "q248_seed_bfs" -> ((s, d) => Graph.seedDistances(s, d)),
    "q249_kcore" -> ((s, d) => Graph.kCorePeel(s, d)),
    "q250_walk_pmi" -> ((s, d) => Graph.walkPmiSimilarity(s, d)),
    "q251_sampled_anf" -> ((s, d) => Graph.sampledNeighborhood(s, d)),
    "q252_anf_sketch" -> ((s, d) => Graph.neighborhoodSketch(s, d)),
    "q253_value_drift" -> ((s, d) => DataQuality.valueDrift(s, d)),
    "q254_frequent_triples" -> ((s, d) => Relational.frequentTriples(s, d)),
    "q255_rec_coverage" -> ((s, d) => Graph.recCoverageEval(s, d)),
    "q256_weighted_distance" -> ((s, d) => Graph.weightedSeedDistances(s, d)),
    "q257_mann_whitney" -> ((s, d) => TextOps.mannWhitneyEffect(s, d)),
    "q258_exposure_gini" -> ((s, d) => Graph.recExposureGini(s, d)),
    "q259_intra_list_sim" -> ((s, d) => Graph.intraListSimilarity(s, d)),
    "q260_topk_stability" -> ((s, d) => Relational.topKStability(s, d)),
    "q261_linkpred_eval" -> ((s, d) => Graph.linkPredictionEval(s, d)),
    "q262_dp_counts" -> ((s, d) => DataQuality.randomizedResponse(s, d)),
    "q263_hits" -> ((s, d) => Graph.hits(s, d)),
    "q264_holt_forecast" -> ((s, d) => Relational.holtForecast(s, d)),
    "q265_seq_patterns" -> ((s, d) => EventFlow.sequentialPatterns(s, d)),
    "q266_acf" -> ((s, d) => Relational.autocorrelation(s, d)),
    "q267_modularity" -> ((s, d) => Graph.communityModularity(s, d)),
    "q268_seq_rules" -> ((s, d) => EventFlow.sequenceRules(s, d)),
    "q269_holt_winters" -> ((s, d) => Relational.holtWintersForecast(s, d)),
    "q270_betweenness" -> ((s, d) => Graph.sampledBetweenness(s, d)),
    "q271_scene_changes" -> ((s, d) => Multimodal.sceneChanges(s, d)),
    "q272_community_quotient" -> ((s, d) => Graph.communityQuotient(s, d)),
    "q273_stl_decompose" -> ((s, d) => Relational.stlDecompose(s, d)),
    "q274_truss_peel" -> ((s, d) => Graph.trussPeel(s, d)),
    "q275_holt_backtest" -> ((s, d) => Relational.holtBacktest(s, d)),
    "q276_frame_signatures" -> ((s, d) => Multimodal.frameSignatures(s, d)),
    "q277_hw_backtest" -> ((s, d) => Relational.holtWintersBacktest(s, d)),
    "q278_graph_evolution" -> ((s, d) => Graph.communityEvolution(s, d)),
    "q279_textrank" -> ((s, d) => TextOps.textRank(s, d)),
    "q280_theil_sen" -> ((s, d) => Relational.theilSen(s, d)),
    "q281_entity_clusters" -> ((s, d) => Dedup.entityClusters(s, d)),
    "q282_jl_ann" -> ((s, d) => Similarity.jlProjectionTopK(s, d)),
    "q283_ivm_view" -> ((s, d) => Cdc.incrementalView(s, d)),
    "q284_ccf" -> ((s, d) => Relational.crossCorrelation(s, d)),
    "q285_trimmed_stats" -> ((s, d) => Relational.trimmedSegmentStats(s, d)),
    "q286_harmonic" -> ((s, d) => Graph.sampledHarmonic(s, d)),
    "q287_kaplan_meier" -> ((s, d) => Relational.kaplanMeier(s, d)),
    "q288_pr_curve" -> ((s, d) => TextOps.prCurve(s, d)),
    "q289_degree_histogram" -> ((s, d) => Graph.degreeHistogram(s, d)),
    "q290_brier_decomposition" -> ((s, d) => TextOps.brierDecomposition(s, d)),
    "q291_edge_embeddedness" -> ((s, d) => Graph.edgeEmbeddedness(s, d)),
    "q292_rolling_wau" -> ((s, d) => Sketches.rollingActiveUsers(s, d)),
    "q293_permutation_test" -> ((s, d) => EventFlow.permutationTest(s, d)),
    "q294_rich_club" -> ((s, d) => Graph.richClub(s, d)),
    "q295_seasonal_strength" -> ((s, d) => Relational.seasonalStrength(s, d)),
    "q296_simpson_diversity" -> ((s, d) => TextOps.simpsonDiversity(s, d)),
    "q297_jl_ivf_ann" -> ((s, d) => Similarity.jlIvfTopK(s, d)),
    "q298_graph_evolution_series" ->
      ((s, d) => Graph.communityEvolutionSeries(s, d)),
    "q299_roc_curve" -> ((s, d) => TextOps.rocCurve(s, d)),
    "q300_assortativity" -> ((s, d) => Graph.assortativity(s, d)),
    "q301_changepoint" -> ((s, d) => Relational.changePoint(s, d)),
    "q302_good_turing" -> ((s, d) => TextOps.goodTuring(s, d)),
    "q303_heaps_law" -> ((s, d) => TextOps.heapsLaw(s, d)),
    "q304_fleiss_kappa" -> ((s, d) => TextOps.fleissKappa(s, d)),
    "q305_mutual_information" -> ((s, d) => EventFlow.mutualInformation(s, d)),
    "q306_entropy_rate" -> ((s, d) => EventFlow.entropyRate(s, d)),
    "q307_pareto_docs" -> ((s, d) => TextOps.paretoDocs(s, d)),
    "q308_purchase_reachability" ->
      ((s, d) => EventFlow.purchaseReachability(s, d)),
    "q309_rolling_bands" -> ((s, d) => Relational.rollingRevenueBands(s, d)),
    "q310_market_hhi" -> ((s, d) => Relational.marketConcentration(s, d)),
    "q311_retention_half_life" ->
      ((s, d) => EventFlow.retentionHalfLife(s, d)),
    "q312_transitivity" -> ((s, d) => Graph.transitivity(s, d)),
    "q313_scene_lengths" -> ((s, d) => Multimodal.sceneLengths(s, d)),
    "q314_entity_probe" -> ((s, d) => Dedup.entityProbeClusters(s, d)),
    "q315_epoch_series_stored" ->
      ((s, d) => Graph.evolutionSeriesStored(s, d)),
    "q316_kendall_concordance" ->
      ((s, d) => Relational.kendallConcordance(s, d)),
    "q317_lorenz_deciles" -> ((s, d) => Relational.lorenzDeciles(s, d)),
  )

  /** The deterministic subject set q224 exercises — keys present at
    * every driver SF (customer keys are dense from 1). */
  val SubjectKeys: Seq[Long] = Seq(500L, 1000L, 1500L)

  /** The BPE encode CTE chain (v0 … v`bpeLastLayer`): distinct corpus
    * words replayed through [[graft.operators.TextOps.DefaultMerges]],
    * one jump-2 greedy recursive scan per merge. Shared by q128 (the
    * segmentations) and q143 (the per-language fertility rollup). */
  private lazy val bpeLastLayer: Int = graft.operators.TextOps.DefaultMerges.size
  private lazy val bpeEncodeCtes: String = {
    val layers = Seq(
      """v0 AS (
        |  SELECT word, list_filter(string_split(word, ''), c -> c <> '') AS syms
        |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        |        FROM documents))""".stripMargin) ++
      graft.operators.TextOps.DefaultMerges.zipWithIndex.flatMap {
        case ((l, r), idx) =>
          val i = idx + 1; val p = idx
          Seq(
            s"""m$i AS (
               |  SELECT word, syms, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM v$p
               |  UNION ALL
               |  SELECT word, syms,
               |    CASE WHEN i < len(syms) AND syms[i] = '$l' AND syms[i+1] = '$r'
               |         THEN i+2 ELSE i+1 END,
               |    CASE WHEN i < len(syms) AND syms[i] = '$l' AND syms[i+1] = '$r'
               |         THEN list_append(acc, '$l$r') ELSE list_append(acc, syms[i]) END
               |  FROM m$i WHERE i <= len(syms))""".stripMargin,
            s"""v$i AS (
               |  SELECT word, acc AS syms FROM m$i WHERE i = len(syms) + 1)""".stripMargin)
      }
    layers.mkString(",\n ")
  }

  /** The BM25 scoring chain, ending in `bm_ranked(rank, doc_id,
    * score_micro)` — shared by q149 (the retrieval list) and q150's
    * lexical leg. Mirrors [[graft.operators.Relevance.bm25Retrieval]]:
    * idf rounds at 6 dp, per-term scores land on the integer micro
    * grid before the per-doc sum. */
  private lazy val bm25TermList: String =
    graft.operators.Relevance.Bm25Query.map(t => s"'$t'").mkString(", ")

  /** The scoring chain for an arbitrary term predicate, CTE names
    * prefixed — instantiated twice by q234 (base query, expanded
    * query) and once (as [[bm25Ctes]]) by q149/q150. */
  private def bm25Chain(p: String, termFilter: String): String =
    s"""${p}dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |   FROM documents),
       | ${p}st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |     CAST(sum(dl) AS BIGINT) AS tot FROM ${p}dl),
       | ${p}tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |   WHERE $termFilter GROUP BY doc_id, token),
       | ${p}df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
       |   FROM ${p}tf GROUP BY token),
       | ${p}per AS (SELECT ${p}tf.doc_id,
       |     CAST(round(round(ln((CAST(${p}st.n AS DOUBLE) - df + 0.5)
       |         / (df + 0.5) + 1.0), 6)
       |       * ((tf * 2.2) / (tf + 1.2 * (0.25
       |           + 0.75 * dl / (CAST(${p}st.tot AS DOUBLE) / ${p}st.n))))
       |       * 1000000.0, 0) AS BIGINT) AS term_u
       |   FROM ${p}tf JOIN ${p}df USING (token) JOIN ${p}dl USING (doc_id)
       |   CROSS JOIN ${p}st),
       | ${p}sc AS (SELECT doc_id, CAST(sum(term_u) AS BIGINT) AS score_micro
       |   FROM ${p}per GROUP BY doc_id),
       | ${p}ranked AS (SELECT row_number() OVER
       |     (ORDER BY score_micro DESC, doc_id ASC) AS rank, doc_id, score_micro
       |   FROM ${p}sc)""".stripMargin

  private lazy val bm25Ctes: String =
    bm25Chain("bm_", s"token IN ($bm25TermList)")

  /** q163: the banding sweep replay — the q25 signature chain, one
    * candidate join per (bands × rows) configuration, exact verify,
    * truth = the union's verified pairs. MATERIALIZED: each CTE is
    * referenced from several scalar subqueries. */
  private lazy val q163Sql: String = {
    val configs = Seq((8, 4), (16, 2), (32, 1))
    def bandCond(b: Int, r: Int): String = (0 until b).map { j =>
      (0 until r).map { t =>
        val p = j * r + t + 1; s"x.mh[$p] = y.mh[$p]"
      }.mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val sigElems = graft.operators.Dedup.perms.map { case (a, b) =>
      s"list_min(list_transform(hs, x -> ($a * x + $b) % ${graft.operators.Dedup.P}))"
    }.mkString(",\n    ")
    val candCtes = configs.map { case (b, r) =>
      s"""cand_${b}_$r AS MATERIALIZED (
         |   SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |   FROM sig x JOIN sig y ON x.doc_id < y.doc_id AND (${bandCond(b, r)}))""".stripMargin
    }
    val verCtes = configs.map { case (b, r) =>
      s"""ver_${b}_$r AS MATERIALIZED (
         |   SELECT c.doc_a, c.doc_b
         |   FROM cand_${b}_$r c JOIN sig sx ON c.doc_a = sx.doc_id
         |                       JOIN sig sy ON c.doc_b = sy.doc_id
         |   WHERE round(CAST(len(list_intersect(sx.shs, sy.shs)) AS DOUBLE)
         |     / len(list_distinct(list_concat(sx.shs, sy.shs))), 4) >= 0.8)""".stripMargin
    }
    val rows = configs.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS band_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cand_${b}_$r) AS n_candidates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ver_${b}_$r) AS n_found,
         |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         |  CAST((SELECT count(*) FROM ver_${b}_$r) * 1000000
         |    // (SELECT count(*) FROM cand_${b}_$r) AS BIGINT) AS precision_micro,
         |  CAST((SELECT count(*) FROM ver_${b}_$r) * 1000000
         |    // (SELECT count(*) FROM truth) AS BIGINT) AS recall_micro""".stripMargin
    }
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(0, len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' '))
       |    ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
       | h AS (SELECT doc_id, shs,
       |    list_transform(shs, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
       |      % ${graft.operators.Dedup.P}) AS hs FROM sh),
       | sig AS MATERIALIZED (SELECT doc_id, shs, [$sigElems] AS mh FROM h),
       | ${candCtes.mkString(",\n ")},
       | ${verCtes.mkString(",\n ")},
       | truth AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM (
       |   ${configs.map { case (b, r) => s"SELECT doc_a, doc_b FROM ver_${b}_$r" }
             .mkString(" UNION ALL ")}))
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** q38's oracle: replay the keyspace-op log with the reference's
    * per-op semantics (mirrors [[KvStore.applyKvBatch]] on an empty
    * state). Segment logic: the last authoritative op per key (del /
    * copy / string-set) plus every hash-HSET after it; HSETs merge
    * fields per-field and leave the TTL of a base `copy` untouched
    * (redis.go:166-232; HSET merge redis.go:216-222). */
  private val kvReplaySql: String =
    """WITH ops AS (
      |  SELECT CASE WHEN event_type = 'error' THEN 'del'
      |              WHEN event_type IN ('signup','purchase') THEN 'set'
      |              ELSE 'copy' END AS op,
      |    'user:' || user_id AS key,
      |    CASE WHEN user_id % 3 = 0 THEN 'hash' ELSE 'string' END AS kind,
      |    CASE WHEN user_id % 3 = 0 THEN NULL ELSE CAST(k AS VARCHAR) END AS value,
      |    CASE WHEN user_id % 3 = 0 THEN CAST(k AS VARCHAR) END AS f_k,
      |    CASE WHEN user_id % 3 = 0 THEN CAST(user_id AS VARCHAR) END AS f_uid,
      |    CASE WHEN event_type IN ('view','click') THEN
      |      CASE WHEN k % 5 = 0 THEN -2 WHEN k % 5 = 1 THEN (k+1)*1000 ELSE -1 END
      |    ELSE -1 END AS ttl_ms,
      |    ts, event_id AS off
      |  FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |        FROM events)
      |), alive AS (
      |  SELECT * FROM ops WHERE NOT (op = 'copy' AND ttl_ms < 0 AND ttl_ms <> -1)
      |), seq AS (
      |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY ts, off) AS ord,
      |    CASE WHEN op IN ('del','copy') OR (op = 'set' AND kind <> 'hash')
      |         THEN 1 ELSE 0 END AS auth
      |  FROM alive
      |), ranked AS (
      |  SELECT *, sum(auth) OVER (PARTITION BY key ORDER BY ord) AS auth_rank FROM seq
      |), seg AS (
      |  SELECT * FROM ranked
      |  QUALIFY auth_rank = max(auth_rank) OVER (PARTITION BY key)
      |), agg AS (
      |  SELECT key,
      |    arg_max(op, ord) AS last_op,
      |    arg_max(kind, ord) AS kind,
      |    arg_max(op, ord) FILTER (WHERE auth = 1) AS base_op,
      |    arg_max(ttl_ms, ord) FILTER (WHERE auth = 1) AS ttl_base,
      |    arg_max(value, ord) FILTER (WHERE value IS NOT NULL AND op <> 'del') AS value,
      |    arg_max(f_k, ord) FILTER (WHERE f_k IS NOT NULL AND op <> 'del') AS f_k,
      |    arg_max(f_uid, ord) FILTER (WHERE f_uid IS NOT NULL AND op <> 'del') AS f_uid,
      |    max(ts) AS updated_at
      |  FROM seg GROUP BY key
      |)""".stripMargin

  def oracleSql: Map[String, String] =
    oracleBase + ("q130_ann_bakeoff" -> q130Sql) +
      ("q157_classifier_lift" -> q157Sql) + ("q158_langid_eval" -> q158Sql) +
      ("q160_funnel_summary" -> q160Sql) + ("q161_dedup_savings" -> q161Sql) +
      ("q162_weighted_wor" -> q162Sql) + ("q163_banding_sweep" -> q163Sql) +
      ("q208_label_kappa" -> q208Sql) + ("q209_classifier_auc" -> q209Sql) +
      ("q211_trend_ols" -> q211Sql) + ("q212_calibration" -> q212Sql) +
      ("q214_revenue_acf" -> q214Sql) + ("q215_cusum_shift" -> q215Sql) +
      ("q218_distinct_n" -> q218Sql) + ("q241_distinct_n_approx" -> q241Sql) +
      ("q222_lang_conflicts" -> q222Sql) +
      ("q228_daily_fano" -> q228Sql) +
      ("q230_pagerank" -> q230Sql) + ("q231_triangles" -> q231Sql) +
      ("q232_t_closeness" -> q232Sql) + ("q233_bootstrap_ci" -> q233Sql) +
      ("q234_prf_expansion" -> q234Sql) + ("q235_communities" -> q235Sql) +
      ("q236_related_parts" -> q236Sql) + ("q237_spearman" -> q237Sql) +
      ("q238_conformal" -> q238Sql) + ("q239_graph_summary" -> q239Sql) +
      ("q242_rec_eval" -> q242Sql) + ("q243_markov_eval" -> q243Sql) +
      ("q244_ab_readout" -> q244Sql) +
      ("q245_trained_classifier" -> q245Sql) + ("q246_components" -> q246Sql) +
      ("q247_walk_pairs" -> q247Sql) + ("q248_seed_bfs" -> q248Sql) +
      ("q249_kcore" -> q249Sql) + ("q250_walk_pmi" -> q250Sql) +
      ("q251_sampled_anf" -> q251Sql) + ("q252_anf_sketch" -> q252Sql) +
      ("q253_value_drift" -> q253Sql) + ("q254_frequent_triples" -> q254Sql) +
      ("q255_rec_coverage" -> q255Sql) + ("q256_weighted_distance" -> q256Sql) +
      ("q257_mann_whitney" -> q257Sql) + ("q258_exposure_gini" -> q258Sql) +
      ("q259_intra_list_sim" -> q259Sql) + ("q260_topk_stability" -> q260Sql) +
      ("q261_linkpred_eval" -> q261Sql) + ("q262_dp_counts" -> q262Sql) +
      ("q263_hits" -> q263Sql) + ("q264_holt_forecast" -> q264Sql) +
      ("q265_seq_patterns" -> q265Sql) + ("q266_acf" -> q266Sql) +
      ("q267_modularity" -> q267Sql) + ("q268_seq_rules" -> q268Sql) +
      ("q269_holt_winters" -> q269Sql) + ("q270_betweenness" -> q270Sql) +
      ("q271_scene_changes" -> q271Sql) +
      ("q272_community_quotient" -> q272Sql) +
      ("q273_stl_decompose" -> q273Sql) + ("q274_truss_peel" -> q274Sql) +
      ("q275_holt_backtest" -> q275Sql) +
      ("q276_frame_signatures" -> q276Sql) +
      ("q277_hw_backtest" -> q277Sql) +
      ("q278_graph_evolution" -> q278Sql) +
      ("q279_textrank" -> q279Sql) + ("q280_theil_sen" -> q280Sql) +
      ("q281_entity_clusters" -> q281Sql) + ("q282_jl_ann" -> q282Sql) +
      ("q283_ivm_view" -> q283Sql) + ("q284_ccf" -> q284Sql) +
      ("q285_trimmed_stats" -> q285Sql) + ("q286_harmonic" -> q286Sql) +
      ("q287_kaplan_meier" -> q287Sql) + ("q288_pr_curve" -> q288Sql) +
      ("q289_degree_histogram" -> q289Sql) +
      ("q290_brier_decomposition" -> q290Sql) +
      ("q291_edge_embeddedness" -> q291Sql) +
      ("q292_rolling_wau" -> q292Sql) +
      ("q293_permutation_test" -> q293Sql) +
      ("q294_rich_club" -> q294Sql) +
      ("q295_seasonal_strength" -> q295Sql) +
      ("q298_graph_evolution_series" -> q298Sql) +
      ("q299_roc_curve" -> q299Sql) +
      ("q300_assortativity" -> q300Sql) +
      ("q301_changepoint" -> q301Sql) +
      ("q302_good_turing" -> q302Sql) +
      ("q303_heaps_law" -> q303Sql) +
      ("q304_fleiss_kappa" -> q304Sql) +
      ("q305_mutual_information" -> q305Sql) +
      ("q306_entropy_rate" -> q306Sql) +
      ("q307_pareto_docs" -> q307Sql) +
      ("q308_purchase_reachability" -> q308Sql) +
      ("q309_rolling_bands" -> q309Sql) +
      ("q310_market_hhi" -> q310Sql) +
      ("q311_retention_half_life" -> q311Sql) +
      ("q312_transitivity" -> q312Sql) +
      ("q313_scene_lengths" -> q313Sql) +
      // q314 is the ER store's steady-state probe face: the corpus
      // slice's names/variants/edges are persisted and only the
      // id % 10 = 0 increment is re-expanded, but the RESULT equals
      // the full-run clustering by construction — so the q281 oracle
      // replays it verbatim while the bench row prices the probe
      ("q314_entity_probe" -> q281Sql) +
      // q315 is q298 read through the persisted epoch-gauge store:
      // closed epochs come off disk, only the open newest epoch runs
      // its LPA — the result is identical by construction, so the
      // q298 oracle replays it while the bench row prices one slice
      ("q315_epoch_series_stored" -> q298Sql) +
      ("q316_kendall_concordance" -> q316Sql) +
      ("q317_lorenz_deciles" -> q317Sql) +
      ("q296_simpson_diversity" ->
        """WITH sd_tf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tf
          |   FROM (SELECT source, unnest(string_split(text, ' ')) AS token
          |         FROM documents)
          |   GROUP BY 1, 2),
          | sd_m AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
          |    CAST(sum(tf) AS BIGINT) AS n_tokens,
          |    sum(CAST(tf AS HUGEINT) * (tf - 1)) AS coll,
          |    sum(CAST(tf AS HUGEINT) * tf) AS sq
          |   FROM sd_tf GROUP BY 1)
          |SELECT source, vocab, n_tokens,
          |  CAST(1000000 - coll * 1000000
          |    // greatest(CAST(n_tokens AS HUGEINT) * (n_tokens - 1), 1)
          |    AS BIGINT) AS diversity_micro,
          |  CAST(CAST(n_tokens AS HUGEINT) * n_tokens // greatest(sq, 1)
          |    AS BIGINT) AS effective_vocab
          |FROM sd_m""".stripMargin) +
      ("q240_semantic_decontam" ->
        """WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
          | c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20),
          | s AS (SELECT c.vec_id, ev.vec_id AS eval_id,
          |    round(list_sum(list_transform(range(1, 65),
          |      i -> CAST(c.embedding[i] AS DOUBLE)
          |        * CAST(ev.embedding[i] AS DOUBLE))), 6) AS sim
          |  FROM c CROSS JOIN ev),
          | b AS (SELECT vec_id, eval_id, sim, row_number() OVER
          |    (PARTITION BY vec_id ORDER BY sim DESC, eval_id ASC) AS rnk
          |  FROM s)
          |SELECT vec_id, CAST(eval_id AS BIGINT) AS eval_id,
          |  CAST(round(sim * 1000000, 0) AS BIGINT) AS sim_micro
          |FROM b WHERE rnk = 1
          |  AND CAST(round(sim * 1000000, 0) AS BIGINT) >= 350000""".stripMargin)

  /** The co-purchase edge list CTEs (shared by q230/q231): distinct
    * (basket, item) pairs self-joined within the basket — q197's
    * candidate machinery, unthresholded. */
  private lazy val coPurchaseCtes: String =
    """cp_items AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      |   FROM lineitem),
      | cp_und AS (SELECT a.item AS pa, c.item AS pb,
      |     CAST(count(*) AS BIGINT) AS w
      |   FROM cp_items a JOIN cp_items c USING (basket)
      |   WHERE a.item < c.item GROUP BY 1, 2)""".stripMargin

  /** q230: five unrolled integer-pico power iterations; products ride
    * HUGEINT (≙ the Spark side's Decimal(38)), each iteration's rank
    * casts back to BIGINT. */
  private lazy val q230Sql: String = {
    val iters = (1 to 5).map { i =>
      s"""r$i AS (SELECT e.dst AS part,
         |    CAST((SELECT (15 * (1000000000000 // nn)) // 100 FROM pr_n)
         |      + 85 * sum(CAST(r.r AS HUGEINT) * e.w // e.outw) // 100
         |      AS BIGINT) AS r
         |  FROM r${i - 1} r JOIN pr_ew e ON r.part = e.src GROUP BY e.dst)"""
        .stripMargin
    }.mkString(",\n ")
    s"""WITH $coPurchaseCtes,
       | pr_edges AS (SELECT pa AS src, pb AS dst, w FROM cp_und
       |   UNION ALL SELECT pb, pa, w FROM cp_und),
       | pr_ew AS (SELECT src, dst, w,
       |     CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS outw
       |   FROM pr_edges),
       | pr_n AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS nn FROM pr_ew),
       | r0 AS (SELECT DISTINCT src AS part,
       |     (SELECT CAST(1000000000000 // nn AS BIGINT) FROM pr_n) AS r
       |   FROM pr_ew),
       | $iters
       |SELECT row_number() OVER (ORDER BY r DESC, part ASC) AS rank,
       |  part, r AS score_pico
       |FROM r5 ORDER BY score_pico DESC, part ASC LIMIT 25""".stripMargin
  }

  /** The shared quality-in-basis-points CTE body (q233/q237/q238):
    * round(quality, 4)·10⁴ rounded to an integer. */
  private lazy val qualityBpCte: String =
    """SELECT source, doc_id,
      |    CAST(round(round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE)
      |        / len(toks))
      |      + 0.4 * (1.0 - sw / len(toks))
      |      + 0.2 * least(len(toks) / 100.0, 1.0), 4) * 10000, 0) AS BIGINT)
      |      AS q_bp,
      |    CAST(len(toks) AS BIGINT) AS n_toks
      |  FROM (SELECT source, doc_id, string_split(text, ' ') AS toks,
      |     CAST(len(list_filter(string_split(text, ' '),
      |       x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
      |   FROM documents)""".stripMargin

  /** q237: Spearman = Pearson on half-unit midranks, exact HUGEINT
    * moments, the q195 final-expression discipline. */
  private lazy val q237Sql: String =
    s"""WITH b AS ($qualityBpCte),
       | r AS (SELECT source,
       |    CAST(2 * rank() OVER (PARTITION BY source ORDER BY n_toks ASC)
       |      + count(*) OVER (PARTITION BY source, n_toks) - 1 AS BIGINT) AS xr,
       |    CAST(2 * rank() OVER (PARTITION BY source ORDER BY q_bp ASC)
       |      + count(*) OVER (PARTITION BY source, q_bp) - 1 AS BIGINT) AS yr
       |  FROM b),
       | m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(xr) AS BIGINT) AS sx, CAST(sum(yr) AS BIGINT) AS sy,
       |    sum(CAST(xr AS HUGEINT) * xr) AS sxx,
       |    sum(CAST(yr AS HUGEINT) * yr) AS syy,
       |    sum(CAST(xr AS HUGEINT) * yr) AS sxy
       |  FROM r GROUP BY 1),
       | v AS (SELECT source, n,
       |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
       |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
       |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
       |  FROM m)
       |SELECT source, n AS n_docs,
       |  CASE WHEN vx > 0 AND vy > 0 THEN
       |    CAST(round(round(cv / sqrt(vx * vy), 6) * 1000000, 0) AS BIGINT)
       |  END AS spearman_micro
       |FROM v""".stripMargin

  /** q238: split-conformal quality intervals — rank-selected q̂ on the
    * calibration split, observed coverage on the test split. */
  private lazy val q238Sql: String =
    s"""WITH b AS ($qualityBpCte),
       | sp AS (SELECT *, CAST('0x' || substr(md5('conf-'
       |      || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10 AS h
       |   FROM b),
       | cal AS (SELECT * FROM sp WHERE h < 3),
       | tst AS (SELECT * FROM sp WHERE h >= 3),
       | mn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_cal,
       |    CAST(CAST(sum(q_bp) AS HUGEINT) // count(*) AS BIGINT) AS mean_bp
       |  FROM cal GROUP BY 1),
       | resid AS (SELECT cal.source, n_cal, abs(q_bp - mean_bp) AS r
       |  FROM cal JOIN mn ON cal.source = mn.source),
       | qh AS (SELECT source, n_cal, r AS qhat_bp FROM (
       |    SELECT source, n_cal, r, row_number() OVER
       |      (PARTITION BY source ORDER BY r ASC) AS rnk FROM resid)
       |  WHERE rnk = least(((n_cal + 1) * 90 + 99) // 100, n_cal)),
       | cov AS (SELECT tst.source, qh.n_cal, qhat_bp,
       |    CAST(count(*) AS BIGINT) AS n_test,
       |    CAST(sum(CASE WHEN abs(q_bp - mean_bp) <= qhat_bp
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
       |  FROM tst JOIN mn ON tst.source = mn.source
       |  JOIN qh ON tst.source = qh.source
       |  GROUP BY 1, 2, 3)
       |SELECT source, n_cal, qhat_bp, n_test, n_covered,
       |  CAST(CAST(n_covered AS HUGEINT) * 1000000 // n_test AS BIGINT)
       |    AS coverage_micro
       |FROM cov""".stripMargin

  /** q239: the one-row graph datasheet — exact triangle/wedge totals
    * (the q231 wedge-closure shape), degree moments through HUGEINT,
    * assortativity on the q195 final-expression discipline. */
  private lazy val q239Sql: String =
    s"""WITH $coPurchaseCtes,
       | gs_deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |     (SELECT pa AS node FROM cp_und UNION ALL SELECT pb FROM cp_und)
       |   GROUP BY 1),
       | gs_o AS (SELECT
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pa ELSE pb END AS src,
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pb ELSE pa END AS dst
       |   FROM cp_und JOIN gs_deg d1 ON pa = d1.node
       |   JOIN gs_deg d2 ON pb = d2.node),
       | gs_tn AS (SELECT CAST(count(*) AS BIGINT) AS n_tri
       |   FROM gs_o e1 JOIN gs_o e2 ON e1.src = e2.src AND e1.dst < e2.dst
       |   WHERE EXISTS (SELECT 1 FROM cp_und u
       |     WHERE u.pa = e1.dst AND u.pb = e2.dst)),
       | gs_ds AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |     CAST(sum(deg) AS BIGINT) AS sum_deg,
       |     CAST(sum(CAST(deg AS HUGEINT) * (deg - 1) // 2) AS BIGINT)
       |       AS n_wedges
       |   FROM gs_deg),
       | gs_ends AS (SELECT d1.deg AS dx, d2.deg AS dy
       |   FROM cp_und JOIN gs_deg d1 ON pa = d1.node
       |   JOIN gs_deg d2 ON pb = d2.node),
       | gs_se AS (SELECT dx, dy FROM gs_ends
       |   UNION ALL SELECT dy, dx FROM gs_ends),
       | gs_m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
       |    sum(CAST(dx AS HUGEINT) * dx) AS sxx,
       |    sum(CAST(dy AS HUGEINT) * dy) AS syy,
       |    sum(CAST(dx AS HUGEINT) * dy) AS sxy FROM gs_se),
       | gs_v AS (SELECT
       |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
       |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
       |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
       |  FROM gs_m)
       |SELECT n_nodes, CAST(sum_deg // 2 AS BIGINT) AS n_edges,
       |  n_tri AS n_triangles, n_wedges,
       |  CAST(CAST(sum_deg AS HUGEINT) * 1000000 // n_nodes AS BIGINT)
       |    AS mean_degree_micro,
       |  CASE WHEN n_wedges > 0 THEN
       |    CAST(CAST(3 AS HUGEINT) * n_tri * 1000000 // n_wedges AS BIGINT)
       |  END AS clustering_micro,
       |  CASE WHEN vx > 0 AND vy > 0 THEN
       |    CAST(round(round(cv / sqrt(vx * vy), 6) * 1000000, 0) AS BIGINT)
       |  END AS assortativity_micro
       |FROM gs_ds, gs_tn, gs_v""".stripMargin

  /** q242: held-out hit-rate@k of the most-co-purchased recommender —
    * basket-level salted-hash split, train-edge ranking, every test
    * basket's ordered pairs judged against the seed's top-k. */
  private lazy val q242Sql: String =
    """WITH li AS (SELECT l_orderkey AS basket, l_partkey AS item FROM lineitem),
      | sp AS (SELECT basket, item, CAST('0x' || substr(md5('receval-'
      |      || CAST(basket AS VARCHAR)), 1, 15) AS BIGINT) % 10 AS h
      |   FROM li),
      | titems AS (SELECT DISTINCT basket, item FROM sp WHERE h < 8),
      | te AS (SELECT DISTINCT basket, item FROM sp WHERE h >= 8),
      | und AS (SELECT a.item AS pa, b.item AS pb, CAST(count(*) AS BIGINT) AS w
      |   FROM titems a JOIN titems b USING (basket)
      |   WHERE a.item < b.item GROUP BY 1, 2),
      | rk AS (SELECT src, dst, row_number() OVER
      |    (PARTITION BY src ORDER BY w DESC, dst ASC) AS rnk
      |   FROM (SELECT pa AS src, pb AS dst, w FROM und
      |         UNION ALL SELECT pb, pa, w FROM und)),
      | pairs AS (SELECT a.item AS seed, b.item AS target
      |   FROM te a JOIN te b USING (basket) WHERE a.item <> b.item),
      | j AS (SELECT seed, target, rnk FROM pairs
      |   LEFT JOIN rk ON seed = rk.src AND target = rk.dst),
      | ks AS (SELECT unnest([1, 5, 10]) AS k)
      |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_cases,
      |  CAST(sum(CASE WHEN rnk IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hits,
      |  CAST(CAST(sum(CASE WHEN rnk IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END)
      |    AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS hitrate_micro
      |FROM j CROSS JOIN ks GROUP BY k""".stripMargin

  /** q245: the fixed-iteration logistic-regression replay — integer
    * micro features, shifted-positive logit division, sigmoid rounded
    * to the micro grid, exact HUGEINT gradient sums, truncating
    * weight update; each iteration is one (gradient, weights) CTE
    * pair (the q140 unrolled-iteration precedent). */
  private lazy val q245Sql: String = {
    val (iters, lr) = (20, 16)
    val z = "w0 + CAST((CAST(w1 AS HUGEINT) * f1 + CAST(w2 AS HUGEINT) * f2" +
      " + CAST(w3 AS HUGEINT) * f3 + CAST(w4 AS HUGEINT) * f4" +
      " + 1000000000000000000) // 1000000 AS BIGINT) - 1000000000000"
    val rounds = (1 to iters).map { t =>
      val upd = (0 to 4).map { j =>
        s"CAST(w$j - $lr * (g$j // (CAST(n AS HUGEINT) * 1000000)) AS BIGINT) AS w$j"
      }.mkString(",\n    ")
      s"""gt$t AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(e AS HUGEINT) * 1000000) AS g0,
         |    sum(CAST(e AS HUGEINT) * f1) AS g1,
         |    sum(CAST(e AS HUGEINT) * f2) AS g2,
         |    sum(CAST(e AS HUGEINT) * f3) AS g3,
         |    sum(CAST(e AS HUGEINT) * f4) AS g4
         |  FROM (SELECT f1, f2, f3, f4,
         |      CAST(round(1000000.0 / (1.0 + exp(-(CAST(($z) AS DOUBLE)
         |        / 1000000.0))), 0) AS BIGINT) - y * 1000000 AS e
         |    FROM qf CROSS JOIN wt${t - 1})),
         | wt$t AS MATERIALIZED (SELECT
         |    $upd
         |  FROM gt$t CROSS JOIN wt${t - 1})""".stripMargin
    }.mkString(",\n ")
    s"""WITH qf AS MATERIALIZED (SELECT
       |    CAST(CAST(len(list_distinct(toks)) AS HUGEINT) * 1000000
       |      // len(toks) AS BIGINT) AS f1,
       |    CAST(CAST(swi AS HUGEINT) * 1000000 // len(toks) AS BIGINT) AS f2,
       |    least(CAST(len(toks) AS BIGINT) * 10000, 1000000) AS f3,
       |    CAST(1000000 - CAST(len(list_distinct(shs)) AS HUGEINT) * 1000000
       |      // len(shs) AS BIGINT) AS f4,
       |    CASE WHEN round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE)
       |        / len(toks))
       |      + 0.4 * (1.0 - CAST(swi AS DOUBLE) / len(toks))
       |      + 0.2 * least(len(toks) / 100.0, 1.0), 4) >= 0.66
       |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
       |  FROM (SELECT doc_id, toks, swi, CASE WHEN len(toks) >= 3
       |      THEN list_transform(range(0, len(toks) - 2),
       |        i -> array_to_string(toks[i+1:i+3], ' '))
       |      ELSE [array_to_string(toks, ' ')] END AS shs
       |    FROM (SELECT doc_id, string_split(text, ' ') AS toks,
       |        CAST(len(list_filter(string_split(text, ' '),
       |          x -> x IN ('the','a','and','of'))) AS BIGINT) AS swi
       |      FROM documents))
       |  WHERE CAST('0x' || substr(md5('qcls-' || CAST(doc_id AS VARCHAR)),
       |    1, 15) AS BIGINT) % 10 < 8),
       | wt0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |    CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
       |    CAST(0 AS BIGINT) AS w4),
       | $rounds
       |SELECT 'bias' AS feature, w0 AS weight_micro FROM wt$iters
       |UNION ALL SELECT 'distinct_ratio', w1 FROM wt$iters
       |UNION ALL SELECT 'stop_ratio', w2 FROM wt$iters
       |UNION ALL SELECT 'len_sat', w3 FROM wt$iters
       |UNION ALL SELECT 'dup_frac', w4 FROM wt$iters""".stripMargin
  }

  /** q246: exact connected components — the q49 transitive-closure
    * CTEs over the co-purchase edge list, histogrammed (q121 shape). */
  private lazy val q246Sql: String =
    s"""WITH RECURSIVE $coPurchaseCtes,
       | pairs AS (SELECT pa AS doc_a, pb AS doc_b FROM cp_und),
       | $ccCtes,
       | cc_sizes AS (SELECT cluster_id, count(*) AS n
       |   FROM clus GROUP BY cluster_id)
       |SELECT CAST(n AS BIGINT) AS component_size,
       |  CAST(count(*) AS BIGINT) AS n_components
       |FROM cc_sizes GROUP BY n""".stripMargin

  /** Walk-pair CTE chain shared by q247/q250: ends in
    * `wp(anchor, context, n_pairs)` — the md5-driven walk replay,
    * per-step neighbor index = hash % outdeg + 1 against the
    * dst-sorted adjacency. */
  private lazy val walkPairCtes: String = {
    val walkLen = 4
    val steps = (1 to walkLen).map { k =>
      // NOTE: no continuation line may START with '||' — this builder
      // is re-stripMargin'd inside the outer template, which would eat
      // one pipe and leave a binary '|'
      s"""rw$k AS (SELECT walk_id, a.dst AS cur
         |  FROM rw${k - 1} JOIN rw_adj a ON rw${k - 1}.cur = a.src
         |    AND a.idx = CAST('0x' || substr(md5('walk-' ||
         |      CAST(walk_id AS VARCHAR) || '-$k'), 1, 15) AS BIGINT)
         |      % a.outdeg + 1)""".stripMargin
    }.mkString(",\n ")
    val unions = (1 to walkLen)
      .map(k => s"SELECT walk_id, cur FROM rw$k").mkString(" UNION ALL ")
    s"""rw_edges AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | rw_adj AS (SELECT src, dst,
       |     CAST(row_number() OVER (PARTITION BY src ORDER BY dst ASC)
       |       AS BIGINT) AS idx,
       |     CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg
       |   FROM rw_edges),
       | rw0 AS (SELECT src AS walk_id, src AS cur
       |   FROM (SELECT DISTINCT src FROM rw_edges)),
       | $steps,
       | wp AS (SELECT walk_id AS anchor, cur AS context,
       |    CAST(count(*) AS BIGINT) AS n_pairs
       |   FROM ($unions) WHERE cur <> walk_id
       |   GROUP BY 1, 2)""".stripMargin
  }

  private lazy val q247Sql: String =
    s"""WITH $coPurchaseCtes,
       | $walkPairCtes
       |SELECT anchor, context, n_pairs FROM wp""".stripMargin

  /** q250: the PMI fold over the q247 walk pairs — ln is monotone so
    * the rank-defining score is the exact rational n_pairs·T/(ca·cb)
    * in micro-units; HUGEINT ≙ the Scala side's Decimal(38), // ≙
    * truncating div (all operands positive). */
  private lazy val q250Sql: String =
    s"""WITH $coPurchaseCtes,
       | $walkPairCtes,
       | wt AS (SELECT CAST(sum(n_pairs) AS HUGEINT) AS t FROM wp),
       | wa AS (SELECT anchor, CAST(sum(n_pairs) AS HUGEINT) AS ca
       |   FROM wp GROUP BY 1),
       | wb AS (SELECT context, CAST(sum(n_pairs) AS HUGEINT) AS cb
       |   FROM wp GROUP BY 1),
       | ws AS (SELECT wp.anchor, wp.context, wp.n_pairs,
       |    CAST(CAST(wp.n_pairs AS HUGEINT) * (SELECT t FROM wt)
       |      * 1000000 // (wa.ca * wb.cb) AS BIGINT) AS pmi_rate_u
       |   FROM wp
       |   JOIN wa ON wp.anchor = wa.anchor
       |   JOIN wb ON wp.context = wb.context),
       | wr AS (SELECT anchor, context, n_pairs, pmi_rate_u,
       |    CAST(row_number() OVER (PARTITION BY anchor
       |      ORDER BY pmi_rate_u DESC, context ASC) AS BIGINT) AS rnk
       |   FROM ws)
       |SELECT anchor, context, n_pairs, pmi_rate_u, rnk
       |FROM wr WHERE rnk <= 5""".stripMargin

  /** q251: per-sample exact BFS balls — the q248 rounds with a sample
    * column carried through; EXCEPT is the (distinct) anti-join. */
  private lazy val q251Sql: String = {
    val (nSamples, maxHops) = (8, 3)
    val rounds = (1 to maxHops).map { k =>
      s"""nbn$k AS MATERIALIZED (
         |   SELECT b.sample, e.dst AS node
         |   FROM nb${k - 1} b JOIN nb_edges e ON b.node = e.src
         |   EXCEPT SELECT sample, node FROM nb${k - 1}),
         | nb$k AS MATERIALIZED (SELECT sample, node FROM nb${k - 1}
         |   UNION ALL SELECT sample, node FROM nbn$k)""".stripMargin
    }.mkString(",\n ")
    val readout = (1 to maxHops).map { k =>
      s"""SELECT sample AS part, CAST($k AS BIGINT) AS hops,
         |  CAST(count(*) AS BIGINT) AS ball_n FROM nb$k GROUP BY 1"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $coPurchaseCtes,
       | nb_edges AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | nb_samples AS (SELECT src AS sample
       |   FROM (SELECT DISTINCT src FROM nb_edges)
       |   ORDER BY md5('anf-' || CAST(src AS VARCHAR)) ASC LIMIT $nSamples),
       | nb0 AS (SELECT sample, sample AS node FROM nb_samples),
       | $rounds
       |$readout""".stripMargin
  }

  /** q270: the Brandes replay — forward levels carry HUGEINT path
    * counts (NOT EXISTS ≙ the anti-join keeps levels disjoint), the
    * backward walk folds the pair-dependency rational per edge in
    * integer micro, left-joined so successor-less nodes keep δ = 0. */
  private lazy val q270Sql: String = {
    val (nSamples, maxHops) = (8, 3)
    val fwd = (1 to maxHops).map { h =>
      s"""bwl$h AS MATERIALIZED (
         |   SELECT c.sample, c.node, c.sigma FROM (
         |     SELECT b.sample, e.dst AS node,
         |       CAST(sum(b.sigma) AS HUGEINT) AS sigma
         |     FROM bwl${h - 1} b JOIN bw_edges e ON b.node = e.src
         |     GROUP BY 1, 2) c
         |   WHERE NOT EXISTS (SELECT 1 FROM bwr${h - 1} r
         |     WHERE r.sample = c.sample AND r.node = c.node)),
         | bwr$h AS MATERIALIZED (SELECT sample, node FROM bwr${h - 1}
         |   UNION ALL SELECT sample, node FROM bwl$h)""".stripMargin
    }.mkString(",\n ")
    val bwd = ((maxHops - 1) to 1 by -1).map { h =>
      s"""bwd$h AS MATERIALIZED (
         |   SELECT l.sample, l.node, l.sigma, coalesce(dp.dep, 0) AS delta
         |   FROM bwl$h l LEFT JOIN (
         |     SELECT v.sample, v.node,
         |       CAST(sum(v.sigma * (1000000 + w.delta) // w.sigma)
         |         AS BIGINT) AS dep
         |     FROM bwl$h v JOIN bw_edges e ON v.node = e.src
         |     JOIN bwd${h + 1} w ON w.sample = v.sample AND w.node = e.dst
         |     GROUP BY 1, 2) dp
         |   ON dp.sample = l.sample AND dp.node = l.node)""".stripMargin
    }.mkString(",\n ")
    s"""WITH $coPurchaseCtes,
       | bw_edges AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | bw_samples AS (SELECT src AS sample
       |   FROM (SELECT DISTINCT src FROM bw_edges)
       |   ORDER BY md5('btw-' || CAST(src AS VARCHAR)) ASC LIMIT $nSamples),
       | bwl0 AS (SELECT sample, sample AS node, CAST(1 AS HUGEINT) AS sigma
       |   FROM bw_samples),
       | bwr0 AS (SELECT sample, node FROM bwl0),
       | $fwd,
       | bwd$maxHops AS (SELECT sample, node, sigma, CAST(0 AS BIGINT)
       |    AS delta FROM bwl$maxHops),
       | $bwd
       |SELECT node AS part, CAST(sum(delta) AS BIGINT) AS bc_micro,
       |  CAST(count(*) AS BIGINT) AS n_source_levels
       |FROM (${((maxHops - 1) to 1 by -1).map(h =>
              s"SELECT sample, node, delta FROM bwd$h")
              .mkString(" UNION ALL ")})
       |GROUP BY 1 HAVING sum(delta) > 0
       |ORDER BY bc_micro DESC, part ASC LIMIT 25""".stripMargin
  }

  /** q272: the quotient replay — l4 labels on both endpoints, canonical
    * (min, max) community pairs, weight-mass shares in HUGEINT micro. */
  private lazy val q272Sql: String =
    s"""WITH $coPurchaseCtes,
       | $lpaCtes,
       | qt_tag AS (SELECT least(la.lbl, lb.lbl) AS ca,
       |    greatest(la.lbl, lb.lbl) AS cb, w
       |   FROM cp_und JOIN l4 la ON pa = la.node
       |   JOIN l4 lb ON pb = lb.node),
       | qt_f AS (SELECT ca, cb, CAST(count(*) AS BIGINT) AS n_edges,
       |    CAST(sum(w) AS BIGINT) AS w_sum
       |   FROM qt_tag GROUP BY 1, 2),
       | qt_t AS (SELECT CAST(sum(w_sum) AS HUGEINT) AS w_total FROM qt_f)
       |SELECT ca AS community_a, cb AS community_b, n_edges, w_sum,
       |  CAST(CAST(w_sum AS HUGEINT) * 1000000
       |    // (SELECT w_total FROM qt_t) AS BIGINT) AS share_micro
       |FROM qt_f
       |ORDER BY w_sum DESC, community_a ASC, community_b ASC
       |LIMIT 25""".stripMargin

  /** q273: the STL-lite replay — centered 7-row window sum/count on the
    * day spine, per-weekday floored means of the detrended series, and
    * the exact remainder. */
  private lazy val q273Sql: String =
    """WITH st_daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |   FROM orders GROUP BY 1),
      | st_dow AS (SELECT d,
      |    CAST((date_diff('day', DATE '1995-01-02', d) % 7 + 7) % 7
      |      AS INTEGER) AS dow, cents
      |   FROM st_daily),
      | st_tr AS (SELECT d, dow, cents,
      |    CAST(sum(cents) OVER w // count(cents) OVER w AS BIGINT)
      |      AS trend_cents
      |   FROM st_dow WINDOW w AS (ORDER BY d
      |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      | st_se AS (SELECT dow,
      |    CAST(sum(cents - trend_cents) // count(*) AS BIGINT)
      |      AS seasonal_cents
      |   FROM st_tr GROUP BY 1)
      |SELECT d, cents, trend_cents, seasonal_cents,
      |  cents - trend_cents - seasonal_cents AS residual_cents
      |FROM st_tr JOIN st_se USING (dow)
      |ORDER BY d""".stripMargin

  /** q274: the truss replay — per round a wedge join counts each
    * surviving edge's common neighbors, HAVING ≥ k−2 peels; the
    * readout is the shrinkage curve. */
  private lazy val q274Sql: String = {
    val (k, rounds) = (4, 2)
    val peels = (1 to rounds).map { r =>
      s"""ts${r - 1} AS (SELECT pa AS src, pb AS dst FROM tr${r - 1}
         |   UNION ALL SELECT pb, pa FROM tr${r - 1}),
         | tr$r AS MATERIALIZED (SELECT e.pa, e.pb FROM tr${r - 1} e
         |   JOIN ts${r - 1} a ON a.src = e.pa
         |   JOIN ts${r - 1} b ON b.src = e.pb AND b.dst = a.dst
         |   GROUP BY e.pa, e.pb HAVING count(*) >= ${k - 2})""".stripMargin
    }.mkString(",\n ")
    val readout = (0 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  CAST(count(*) AS BIGINT) AS n_edges,
         |  (SELECT CAST(count(DISTINCT n) AS BIGINT) FROM
         |    (SELECT pa AS n FROM tr$r UNION ALL SELECT pb FROM tr$r))
         |    AS n_nodes
         |FROM tr$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $coPurchaseCtes,
       | tr0 AS (SELECT pa, pb FROM cp_und),
       | $peels
       |$readout""".stripMargin
  }

  /** q252: the HyperBall register replay — per round each node takes
    * the element-wise max of its neighbors' (and its own, via the
    * self-loop) registers; estimates divide the frozen integer
    * numerator, with the frozen linear-counting table as the
    * small-range branch. */
  private lazy val q252Sql: String = {
    val maxHops = 3
    val m = graft.operators.Graph.AnfRegisters
    val rb = graft.operators.Graph.AnfRegisterBits
    val w1 = graft.operators.Graph.AnfRestBits + 1
    val num = graft.operators.Graph.AnfNumerator
    val lc = graft.operators.Graph.anfLcCase("zeros")
    val scale = 1L << w1 // untouched-register term (M = 0), 2^56
    val rounds = (1 to maxHops).map { k =>
      s"""ar$k AS MATERIALIZED (SELECT e.src AS node, r.reg,
         |    max(r.mrho) AS mrho
         |   FROM ar${k - 1} r JOIN an_edges e ON r.node = e.dst
         |   GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n ")
    val folds = (1 to maxHops).map { k =>
      s"""ap$k AS (SELECT node, CAST($m - count(*) AS BIGINT) AS zeros,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST($w1 - mrho AS INT))
         |      AS BIGINT) AS sumpow
         |   FROM ar$k GROUP BY node),
         | af$k AS (SELECT node,
         |    CASE WHEN zeros > 0 AND est_raw <= ${(5L * m) / 2}
         |      THEN $lc ELSE est_raw END AS est_n
         |   FROM (SELECT node, zeros,
         |      CAST(CAST('$num' AS HUGEINT) // (sumpow + zeros * $scale)
         |        AS BIGINT) AS est_raw FROM ap$k))""".stripMargin
    }.mkString(",\n ")
    val readout = (1 to maxHops).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS hops,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(CAST(est_n AS HUGEINT)) AS BIGINT) AS anf_total,
         |  CAST(sum(CAST(est_n AS HUGEINT)) * 1000000 // count(*)
         |    AS BIGINT) AS mean_ball_u
         |FROM af$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $coPurchaseCtes,
       | an_sym AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | an_nodes AS (SELECT DISTINCT src FROM an_sym),
       | an_edges AS MATERIALIZED (SELECT src, dst FROM an_sym
       |   UNION ALL SELECT src, src AS dst FROM an_nodes),
       | ar0 AS (SELECT src AS node, h % $m AS reg,
       |    CASE WHEN (h >> $rb) = 0 THEN $w1
       |         ELSE $w1 - length(bin(h >> $rb)) END AS mrho
       |   FROM (SELECT src, CAST('0x' ||
       |      substr(md5('anfreg-' || CAST(src AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS h FROM an_nodes)),
       | $rounds,
       | $folds
       |$readout""".stripMargin
  }

  /** q253: the two-window TVD replay — exact integer micro rates per
    * (type, bucket), the data-derived micro-epoch midpoint as the
    * split. */
  private lazy val q253Sql: String =
    s"""WITH dm AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
       |   FROM events),
       | dc AS (SELECT event_type,
       |    CAST(floor(value / 5.0) AS BIGINT) AS bucket,
       |    CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM dm)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |    CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM dm)
       |      THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
       |   FROM events GROUP BY 1, 2),
       | dt AS (SELECT event_type, n_ref, n_cur,
       |    sum(n_ref) OVER (PARTITION BY event_type) AS t_ref,
       |    sum(n_cur) OVER (PARTITION BY event_type) AS t_cur FROM dc),
       | dd AS (SELECT event_type, t_ref, t_cur,
       |    CAST(n_ref AS HUGEINT) * 1000000 // greatest(t_ref, 1)
       |      - CAST(n_cur AS HUGEINT) * 1000000 // greatest(t_cur, 1) AS d
       |   FROM dt)
       |SELECT event_type, CAST(max(t_ref) AS BIGINT) AS n_ref,
       |  CAST(max(t_cur) AS BIGINT) AS n_cur,
       |  CAST(sum(abs(d)) // 2 AS BIGINT) AS tvd_micro
       |FROM dd GROUP BY 1""".stripMargin

  /** q254: the triple replay as a 3-way ordered self-join over the
    * frequent-item-pruned basket table; lift through HUGEINT. */
  private lazy val q254Sql: String =
    s"""WITH ft_it AS (SELECT DISTINCT l_orderkey AS basket,
       |    l_partkey AS item FROM lineitem),
       | ft_nb AS (SELECT count(DISTINCT basket) AS n FROM ft_it),
       | ft_in AS (SELECT item, CAST(count(*) AS BIGINT) AS n
       |   FROM ft_it GROUP BY 1),
       | ft_fi AS (SELECT basket, item FROM ft_it
       |   WHERE item IN (SELECT item FROM ft_in WHERE n >= 2)),
       | ft_tri AS (SELECT a.item AS pa, b.item AS pb, c.item AS pc,
       |    CAST(count(*) AS BIGINT) AS triple_n
       |   FROM ft_fi a
       |   JOIN ft_fi b ON a.basket = b.basket AND a.item < b.item
       |   JOIN ft_fi c ON a.basket = c.basket AND b.item < c.item
       |   GROUP BY 1, 2, 3 HAVING count(*) >= 2)
       |SELECT pa, pb, pc, triple_n,
       |  CAST(triple_n * 1000000 // (SELECT n FROM ft_nb) AS BIGINT)
       |    AS support_micro,
       |  CAST(CAST(triple_n AS HUGEINT) * (SELECT n FROM ft_nb)
       |    * (SELECT n FROM ft_nb) * 1000000
       |    // (CAST(na.n AS HUGEINT) * nb.n * nc.n) AS BIGINT) AS lift_micro
       |FROM ft_tri
       |JOIN ft_in na ON pa = na.item
       |JOIN ft_in nb ON pb = nb.item
       |JOIN ft_in nc ON pc = nc.item
       |ORDER BY triple_n DESC, pa, pb, pc LIMIT 20""".stripMargin

  /** q255: coverage@k + popularity-bias replay — bounded top-k lists,
    * dense popularity ranks over graph nodes, exact micro folds. */
  private lazy val q255Sql: String =
    s"""WITH $coPurchaseCtes,
       | rc_sym AS (SELECT pa AS src, pb AS dst, w FROM cp_und
       |   UNION ALL SELECT pb, pa, w FROM cp_und),
       | rc_top AS (SELECT src, dst FROM (SELECT src, dst,
       |     row_number() OVER (PARTITION BY src
       |       ORDER BY w DESC, dst ASC) AS rnk FROM rc_sym)
       |   WHERE rnk <= 10),
       | rc_pop AS (SELECT dst AS part, CAST(sum(w) AS BIGINT) AS strength
       |   FROM rc_sym GROUP BY 1),
       | rc_nn AS (SELECT count(*) AS nn FROM rc_pop),
       | rc_pct AS (SELECT part,
       |    CAST(CAST(row_number() OVER (ORDER BY strength ASC, part ASC)
       |      AS HUGEINT) * 1000000 // (SELECT nn FROM rc_nn) AS BIGINT)
       |      AS pop_pct_micro
       |   FROM rc_pop),
       | rc_cat AS (SELECT count(*) AS np FROM part)
       |SELECT CAST(10 AS BIGINT) AS k,
       |  CAST(count(*) AS BIGINT) AS n_slots,
       |  CAST(count(DISTINCT t.dst) AS BIGINT) AS n_rec_distinct,
       |  CAST((SELECT np FROM rc_cat) AS BIGINT) AS n_catalog,
       |  CAST(CAST(count(DISTINCT t.dst) AS HUGEINT) * 1000000
       |    // (SELECT np FROM rc_cat) AS BIGINT) AS coverage_micro,
       |  CAST(sum(CAST(p.pop_pct_micro AS HUGEINT)) // count(*) AS BIGINT)
       |    AS mean_pop_pct_micro
       |FROM rc_top t JOIN rc_pct p ON t.dst = p.part""".stripMargin

  /** q256: unrolled min-plus rounds — each round relaxes every edge
    * from the current distance frame and min-folds with it. */
  private lazy val q256Sql: String = {
    val rounds = (1 to 4).map { k =>
      s"""wd$k AS MATERIALIZED (SELECT part, min(d) AS d FROM (
         |   SELECT e.dst AS part, b.d + e.cost AS d
         |   FROM wd${k - 1} b JOIN wd_edges e ON b.part = e.src
         |   UNION ALL SELECT part, d FROM wd${k - 1}) GROUP BY part)"""
        .stripMargin
    }.mkString(",\n ")
    s"""WITH $coPurchaseCtes,
       | wd_edges AS (SELECT pa AS src, pb AS dst,
       |    CAST(1000000000000 // w AS BIGINT) AS cost FROM cp_und
       |   UNION ALL SELECT pb, pa, CAST(1000000000000 // w AS BIGINT)
       |   FROM cp_und),
       | wd_seeds AS (SELECT src AS part
       |   FROM (SELECT DISTINCT src FROM wd_edges) ORDER BY src ASC LIMIT 3),
       | wd0 AS (SELECT part, CAST(0 AS BIGINT) AS d FROM wd_seeds),
       | $rounds
       |SELECT part, CAST(d AS BIGINT) AS dist_cost FROM wd4""".stripMargin
  }

  /** q257: the midrank replay — half-unit grid (2·cum_less + cnt + 1),
    * 2U = ΣA midrank2 − m(m+1), CL in micro via HUGEINT. */
  private lazy val q257Sql: String =
    s"""WITH mw AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
       |    source = 'src0' AS isa
       |   FROM documents WHERE source IN ('src0', 'src1')),
       | mt AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na
       |   FROM mw GROUP BY 1),
       | mr AS (SELECT v, cnt, na,
       |    CAST(coalesce(sum(cnt) OVER (ORDER BY v ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_less
       |   FROM mt)
       |SELECT 'src0' AS source_a, 'src1' AS source_b,
       |  CAST(sum(na) AS BIGINT) AS m,
       |  CAST(sum(cnt - na) AS BIGINT) AS n,
       |  CASE WHEN sum(na) = 0 OR sum(cnt - na) = 0 THEN NULL
       |    ELSE CAST((sum(CAST(na AS HUGEINT) * (2 * cum_less + cnt + 1))
       |         - CAST(sum(na) AS HUGEINT) * (sum(na) + 1)) * 1000000
       |         // (2 * CAST(sum(na) AS HUGEINT) * sum(cnt - na))
       |         AS BIGINT) END AS cl_micro
       |FROM mr""".stripMargin

  /** q258: the exposure-Gini replay — ascending (count, item) ranks,
    * G = (Σ2r·cnt − (n+1)·Σcnt) / (n·Σcnt) in micro via HUGEINT. */
  private lazy val q258Sql: String =
    s"""WITH $coPurchaseCtes,
       | eg_sym AS (SELECT pa AS src, pb AS dst, w FROM cp_und
       |   UNION ALL SELECT pb, pa, w FROM cp_und),
       | eg_exp AS (SELECT dst AS item, CAST(count(*) AS BIGINT) AS cnt
       |   FROM (SELECT src, dst,
       |      row_number() OVER (PARTITION BY src
       |        ORDER BY w DESC, dst ASC) AS rnk FROM eg_sym)
       |   WHERE rnk <= 10 GROUP BY 1),
       | eg_r AS (SELECT cnt,
       |    CAST(row_number() OVER (ORDER BY cnt ASC, item ASC) AS BIGINT) AS r
       |   FROM eg_exp)
       |SELECT CAST(10 AS BIGINT) AS k,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(cnt) AS BIGINT) AS n_slots,
       |  CAST((sum(CAST(2 * r AS HUGEINT) * cnt)
       |      - CAST(count(*) + 1 AS HUGEINT) * sum(cnt)) * 1000000
       |    // (CAST(count(*) AS HUGEINT) * sum(cnt)) AS BIGINT) AS gini_micro
       |FROM eg_r""".stripMargin

  /** q259: within-list pair replay — self-join of the bounded top-k
    * lists on seed, canonical-pair weight lookup, 1-row micro folds. */
  private lazy val q259Sql: String =
    s"""WITH $coPurchaseCtes,
       | il_sym AS (SELECT pa AS src, pb AS dst, w FROM cp_und
       |   UNION ALL SELECT pb, pa, w FROM cp_und),
       | il_top AS (SELECT src, dst FROM (SELECT src, dst,
       |     row_number() OVER (PARTITION BY src
       |       ORDER BY w DESC, dst ASC) AS rnk FROM il_sym)
       |   WHERE rnk <= 10),
       | il_pairs AS (SELECT a.src, a.dst, b.dst AS dst2
       |   FROM il_top a JOIN il_top b ON a.src = b.src AND a.dst < b.dst)
       |SELECT CAST(10 AS BIGINT) AS k,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN e.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_connected,
       |  CAST(CAST(sum(CASE WHEN e.w IS NOT NULL THEN 1 ELSE 0 END)
       |    AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS connected_micro,
       |  CAST(CAST(coalesce(sum(e.w), 0) AS HUGEINT) * 1000000 // count(*)
       |    AS BIGINT) AS mean_w_micro
       |FROM il_pairs p
       |LEFT JOIN cp_und e ON p.dst = e.pa AND p.dst2 = e.pb""".stripMargin

  /** q260: the rank-stability replay — epoch-day midpoint halves,
    * cent-percent revenue ranks, Jaccard + footrule over the overlap. */
  private lazy val q260Sql: String =
    s"""WITH ts_ord AS (SELECT o_orderkey, epoch_us(o_orderdate) AS d
       |   FROM orders),
       | ts_mid AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ts_ord),
       | ts_rev AS (SELECT p.p_brand, o.d < (SELECT mid FROM ts_mid) AS is_a,
       |    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
       |      * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
       |      AS BIGINT) AS cents
       |   FROM lineitem l
       |   JOIN part p ON l.l_partkey = p.p_partkey
       |   JOIN ts_ord o ON l.l_orderkey = o.o_orderkey
       |   GROUP BY 1, 2),
       | ts_rank AS (SELECT p_brand, is_a,
       |    CAST(row_number() OVER (PARTITION BY is_a
       |      ORDER BY cents DESC, p_brand ASC) AS BIGINT) AS rnk
       |   FROM ts_rev),
       | ts_a AS (SELECT p_brand, rnk AS ra FROM ts_rank
       |   WHERE is_a AND rnk <= 10),
       | ts_b AS (SELECT p_brand, rnk AS rb FROM ts_rank
       |   WHERE NOT is_a AND rnk <= 10),
       | ts_j AS (SELECT a.ra, b.rb
       |   FROM ts_a a FULL JOIN ts_b b ON a.p_brand = b.p_brand)
       |SELECT CAST(10 AS BIGINT) AS k,
       |  CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       |  CAST(CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
       |      THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
       |    // greatest(sum(CASE WHEN ra IS NOT NULL THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN rb IS NOT NULL THEN 1 ELSE 0 END)
       |      - sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
       |          THEN 1 ELSE 0 END), 1) AS BIGINT) AS jaccard_micro,
       |  CAST(coalesce(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
       |    THEN abs(ra - rb) END), 0) AS BIGINT) AS footrule
       |FROM ts_j""".stripMargin

  /** q261: the link-prediction replay — edge-level salted split,
    * top-cap-capped train adjacency (cap = LinkPredCap, shared with the engine), 2-hop wedge candidates scored by
    * integer-micro resource allocation (1e6 // full train degree of
    * the midpoint), anti-joined against train edges, ranked to the
    * k bound, then every test edge judged both directed ways. */
  private lazy val q261Sql: String = {
    val cap = graft.operators.Graph.LinkPredCap
    s"""WITH $coPurchaseCtes,
       | lp_sp AS (SELECT pa, pb, w,
       |    CAST('0x' || substr(md5('linkpred-' || CAST(pa AS VARCHAR) || '-'
       |      || CAST(pb AS VARCHAR)), 1, 15) AS BIGINT) % 10 AS h
       |   FROM cp_und),
       | lp_tr AS (SELECT pa, pb, w FROM lp_sp WHERE h < 8),
       | lp_te AS (SELECT pa, pb FROM lp_sp WHERE h >= 8),
       | lp_sym AS (SELECT pa AS src, pb AS dst, w FROM lp_tr
       |   UNION ALL SELECT pb, pa, w FROM lp_tr),
       | lp_dg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |   FROM lp_sym GROUP BY 1),
       | lp_cap AS (SELECT src, dst FROM (SELECT src, dst, row_number() OVER
       |      (PARTITION BY src ORDER BY w DESC, dst ASC) AS rn FROM lp_sym)
       |   WHERE rn <= $cap),
       | lp_wg AS (SELECT x.src AS a, y.dst AS b, x.dst AS z
       |   FROM lp_cap x JOIN lp_cap y ON x.dst = y.src WHERE x.src <> y.dst),
       | lp_sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
       |     CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro
       |   FROM lp_wg JOIN lp_dg ON z = node GROUP BY 1, 2),
       | lp_nv AS (SELECT s.a, s.b, s.cn, s.ra_micro FROM lp_sc s
       |   WHERE NOT EXISTS (SELECT 1 FROM lp_sym y
       |     WHERE y.src = s.a AND y.dst = s.b)),
       | lp_rk AS (SELECT a, b, rnk FROM (SELECT a, b, row_number() OVER
       |      (PARTITION BY a ORDER BY ra_micro DESC, cn DESC, b ASC) AS rnk
       |    FROM lp_nv) WHERE rnk <= 10),
       | lp_pairs AS (SELECT pa AS seed, pb AS target FROM lp_te
       |   UNION ALL SELECT pb, pa FROM lp_te),
       | lp_j AS (SELECT seed, rnk FROM lp_pairs
       |   LEFT JOIN lp_rk ON seed = lp_rk.a AND target = lp_rk.b),
       | lp_ks AS (SELECT unnest([1, 5, 10]) AS k)
       |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_cases,
       |  CAST(sum(CASE WHEN rnk IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hits,
       |  CAST(CAST(sum(CASE WHEN rnk IS NOT NULL AND rnk <= k
       |      THEN 1 ELSE 0 END)
       |    AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS hitrate_micro
       |FROM lp_j CROSS JOIN lp_ks GROUP BY k""".stripMargin
  }

  /** q263: the HITS replay — three unrolled hub/authority legs on the
    * integer pico grid, each leg an edge join + HUGEINT mass fold +
    * scalar-subquery renormalization (≙ the Spark side's broadcast
    * 1-row total), top-25 per side. */
  private lazy val q263Sql: String = {
    val scale = 1000000000000L
    val iters = (1 to 3).map { t =>
      s"""ht_h${t}r AS (SELECT cust, sum(CAST(w AS HUGEINT) * a) AS hraw
         |   FROM ht_ed JOIN ht_a${t - 1} USING (part) GROUP BY 1),
         | ht_h$t AS (SELECT cust, CAST(hraw * $scale
         |     // (SELECT sum(hraw) FROM ht_h${t}r) AS BIGINT) AS h
         |   FROM ht_h${t}r),
         | ht_a${t}r AS (SELECT part, sum(CAST(w AS HUGEINT) * h) AS araw
         |   FROM ht_ed JOIN ht_h$t USING (cust) GROUP BY 1),
         | ht_a$t AS (SELECT part, CAST(araw * $scale
         |     // (SELECT sum(araw) FROM ht_a${t}r) AS BIGINT) AS a
         |   FROM ht_a${t}r)""".stripMargin
    }.mkString(",\n ")
    s"""WITH ht_ed AS (SELECT o_custkey AS cust, l_partkey AS part,
       |    CAST(count(*) AS BIGINT) AS w
       |   FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |   GROUP BY 1, 2),
       | ht_a0 AS (SELECT DISTINCT part, CAST($scale AS BIGINT) AS a
       |   FROM ht_ed),
       | $iters,
       | ht_sides AS (SELECT 'hub' AS side, cust AS key, h AS score_pico
       |   FROM ht_h3
       |   UNION ALL SELECT 'auth', part, a FROM ht_a3),
       | ht_rk AS (SELECT side, key, score_pico, row_number() OVER
       |    (PARTITION BY side ORDER BY score_pico DESC, key ASC) AS rnk
       |   FROM ht_sides)
       |SELECT side, CAST(rnk AS BIGINT) AS rnk, CAST(key AS BIGINT) AS key,
       |  score_pico
       |FROM ht_rk WHERE rnk <= 25 ORDER BY side, rnk""".stripMargin
  }

  /** q265: the gapped-pattern replay — first-a, earliest-b-after-it,
    * last-c boundary aggregates, then the types³ support count. */
  private lazy val q265Sql: String =
    """WITH sq_ev AS (SELECT user_id, ts, event_type FROM events),
      | sq_a AS (SELECT user_id, event_type AS a, min(ts) AS ta
      |   FROM sq_ev GROUP BY 1, 2),
      | sq_ab AS (SELECT e.user_id, a, e.event_type AS b, min(e.ts) AS tab
      |   FROM sq_ev e JOIN sq_a USING (user_id) WHERE e.ts > ta
      |   GROUP BY 1, 2, 3),
      | sq_c AS (SELECT user_id, event_type AS c, max(ts) AS tc
      |   FROM sq_ev GROUP BY 1, 2)
      |SELECT a AS step1, b AS step2, c AS step3,
      |  CAST(count(*) AS BIGINT) AS support
      |FROM sq_ab JOIN sq_c USING (user_id) WHERE tc > tab
      |GROUP BY 1, 2, 3
      |ORDER BY support DESC, step1, step2, step3 LIMIT 20""".stripMargin

  /** q264: the Holt replay — a RECURSIVE CTE walks the day spine
    * carrying (level, trend), truncating `//` ≙ the Spark side's
    * `div`, then the h = 0..7 forecast ladder off the last state. */
  private lazy val q264Sql: String =
    """WITH RECURSIVE hf_daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |   FROM orders GROUP BY 1),
      | hf_idx AS (SELECT row_number() OVER (ORDER BY d) AS i, cents
      |   FROM hf_daily),
      | hf_n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM hf_idx),
      | hf_st(i, lv, tr) AS (
      |   SELECT CAST(1 AS BIGINT), cents, CAST(0 AS BIGINT)
      |   FROM hf_idx WHERE i = 1
      |   UNION ALL
      |   SELECT st.i + 1,
      |     (d.cents + 3 * (st.lv + st.tr)) // 4,
      |     (((d.cents + 3 * (st.lv + st.tr)) // 4) - st.lv + 3 * st.tr) // 4
      |   FROM hf_st st JOIN hf_idx d ON d.i = st.i + 1),
      | hf_fin AS (SELECT lv, tr FROM hf_st ORDER BY i DESC LIMIT 1),
      | hf_h AS (SELECT unnest(range(0, 8)) AS h)
      |SELECT CAST(h AS BIGINT) AS h, (SELECT n_days FROM hf_n) AS n_days,
      |  lv AS level_cents, tr AS trend_cents,
      |  lv + h * tr AS forecast_cents
      |FROM hf_fin CROSS JOIN hf_h ORDER BY h""".stripMargin

  /** q266: the ACF replay — floored-mean deviations on the indexed day
    * spine, lag self-join, signed HUGEINT rationals (`//` ≙ `div`
    * truncation). */
  private lazy val q266Sql: String =
    """WITH ac_daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |   FROM orders GROUP BY 1),
      | ac_stats AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(cents) AS BIGINT) AS s FROM ac_daily),
      | ac_dev AS (SELECT row_number() OVER (ORDER BY d) AS i,
      |    cents - (SELECT s // n_days FROM ac_stats) AS dev FROM ac_daily),
      | ac_den AS (SELECT sum(CAST(dev AS HUGEINT) * dev) AS den
      |   FROM ac_dev),
      | ac_num AS (SELECT lag, sum(CAST(a.dev AS HUGEINT) * b.dev) AS num
      |   FROM ac_dev a
      |   CROSS JOIN (SELECT unnest(range(1, 15)) AS lag)
      |   JOIN ac_dev b ON b.i = a.i + lag
      |   GROUP BY 1)
      |SELECT CAST(lag AS BIGINT) AS lag,
      |  (SELECT n_days FROM ac_stats) AS n_days,
      |  CAST(num * 1000000 // (SELECT greatest(den, 1) FROM ac_den)
      |    AS BIGINT) AS acf_micro
      |FROM ac_num ORDER BY lag""".stripMargin

  /** q268: the sequence-rule replay — the q265 boundary aggregates
    * re-folded into confidence/lift exact-micro rationals. */
  private lazy val q268Sql: String =
    """WITH sq_ev AS (SELECT user_id, ts, event_type FROM events),
      | sq_a AS (SELECT user_id, event_type AS a, min(ts) AS ta
      |   FROM sq_ev GROUP BY 1, 2),
      | sq_ab AS (SELECT e.user_id, a, e.event_type AS b, min(e.ts) AS tab
      |   FROM sq_ev e JOIN sq_a USING (user_id) WHERE e.ts > ta
      |   GROUP BY 1, 2, 3),
      | sq_c AS (SELECT user_id, event_type AS c, max(ts) AS tc
      |   FROM sq_ev GROUP BY 1, 2),
      | sq_n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |   FROM sq_ev),
      | sq_sab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS support_ab
      |   FROM sq_ab GROUP BY 1, 2),
      | sq_sc AS (SELECT c, CAST(count(*) AS BIGINT) AS support_c
      |   FROM sq_c GROUP BY 1),
      | sq_sabc AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS support_abc
      |   FROM sq_ab JOIN sq_c USING (user_id) WHERE tc > tab
      |   GROUP BY 1, 2, 3)
      |SELECT a AS step1, b AS step2, c AS consequent,
      |  support_abc, support_ab,
      |  CAST(CAST(support_abc AS HUGEINT) * 1000000 // support_ab
      |    AS BIGINT) AS confidence_micro,
      |  CAST(CAST(support_abc AS HUGEINT) * (SELECT n_users FROM sq_n)
      |      * 1000000
      |    // (CAST(support_ab AS HUGEINT) * support_c) AS BIGINT)
      |    AS lift_micro
      |FROM sq_sabc JOIN sq_sab USING (a, b) JOIN sq_sc USING (c)
      |ORDER BY confidence_micro DESC, step1, step2, consequent
      |LIMIT 20""".stripMargin

  /** q269: the Holt-Winters replay — the q264 RECURSIVE walk widened
    * to carry seven weekday seasonal slots as explicit columns, the
    * level' intermediate built in a wrapped subquery. */
  private lazy val q269Sql: String = {
    val sCase = "CASE d.dow WHEN 0 THEN st.s0 WHEN 1 THEN st.s1" +
      " WHEN 2 THEN st.s2 WHEN 3 THEN st.s3 WHEN 4 THEN st.s4" +
      " WHEN 5 THEN st.s5 ELSE st.s6 END"
    val sCols = (0 to 6).map(j =>
      s"CASE WHEN dow = $j THEN (x - nlv + 3 * s$j) // 4 ELSE s$j END")
      .mkString(",\n      |     ")
    val hCase = (0 to 5).map(j => s"WHEN $j THEN s$j").mkString(" ")
    s"""WITH RECURSIVE hw_daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |   FROM orders GROUP BY 1),
      | hw_idx AS (SELECT row_number() OVER (ORDER BY d) AS i,
      |    CAST((date_diff('day', DATE '1995-01-02', d) % 7 + 7) % 7
      |      AS BIGINT) AS dow, cents AS x, d
      |   FROM hw_daily),
      | hw_n AS (SELECT CAST(count(*) AS BIGINT) AS n_days, max(d) AS d_max
      |   FROM hw_idx),
      | hw_st(i, lv, tr, s0, s1, s2, s3, s4, s5, s6) AS (
      |   SELECT CAST(1 AS BIGINT), x, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |     CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |     CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |   FROM hw_idx WHERE i = 1
      |   UNION ALL
      |   SELECT i, nlv, (nlv - plv + 3 * ptr) // 4,
      |     $sCols
      |   FROM (SELECT st.i + 1 AS i, d.x, d.dow, st.lv AS plv,
      |       st.tr AS ptr, st.s0, st.s1, st.s2, st.s3, st.s4, st.s5, st.s6,
      |       (d.x - $sCase + 3 * (st.lv + st.tr)) // 4 AS nlv
      |     FROM hw_st st JOIN hw_idx d ON d.i = st.i + 1)),
      | hw_fin AS (SELECT * FROM hw_st ORDER BY i DESC LIMIT 1),
      | hw_h AS (SELECT unnest(range(1, 8)) AS h),
      | hw_f AS (SELECT h, lv, tr,
      |    CASE CAST(((date_diff('day', DATE '1995-01-02',
      |        (SELECT d_max FROM hw_n)) + h) % 7 + 7) % 7 AS BIGINT)
      |      $hCase ELSE s6 END AS seasonal_cents
      |   FROM hw_fin CROSS JOIN hw_h)
      |SELECT CAST(h AS BIGINT) AS h, (SELECT n_days FROM hw_n) AS n_days,
      |  lv AS level_cents, tr AS trend_cents, seasonal_cents,
      |  lv + h * tr + seasonal_cents AS forecast_cents
      |FROM hw_f ORDER BY h""".stripMargin
  }

  /** q277: the HW-backtest replay — the q269 RECURSIVE seasonal walk
    * and the q275 Holt walk fused into one spine pass, each carrying
    * its pre-update one-step absolute error, plus the naive
    * carry-forward accumulator. */
  private lazy val q277Sql: String = {
    val sCase = "CASE d.dow WHEN 0 THEN st.s0 WHEN 1 THEN st.s1" +
      " WHEN 2 THEN st.s2 WHEN 3 THEN st.s3 WHEN 4 THEN st.s4" +
      " WHEN 5 THEN st.s5 ELSE st.s6 END"
    val sCols = (0 to 6).map(j =>
      s"CASE WHEN dow = $j THEN (x - nlv + 3 * s$j) // 4 ELSE s$j END")
      .mkString(",\n      |     ")
    s"""WITH RECURSIVE wb_daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |   FROM orders GROUP BY 1),
      | wb_idx AS (SELECT row_number() OVER (ORDER BY d) AS i,
      |    CAST((date_diff('day', DATE '1995-01-02', d) % 7 + 7) % 7
      |      AS BIGINT) AS dow, cents AS x
      |   FROM wb_daily),
      | wb_n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM wb_idx),
      | wb_st(i, lv, tr, s0, s1, s2, s3, s4, s5, s6,
      |       hlv, htr, he, we, ne, px) AS (
      |   SELECT CAST(1 AS BIGINT), x, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |     CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |     CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |     x, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |     CAST(0 AS BIGINT), x
      |   FROM wb_idx WHERE i = 1
      |   UNION ALL
      |   SELECT i, nlv, (nlv - plv + 3 * ptr) // 4,
      |     $sCols,
      |     nhlv, (nhlv - phlv + 3 * phtr) // 4,
      |     he + abs(x - (phlv + phtr)),
      |     we + abs(x - (plv + ptr + sw)),
      |     ne + abs(x - px), x
      |   FROM (SELECT st.i + 1 AS i, d.x, d.dow, st.lv AS plv,
      |       st.tr AS ptr, st.s0, st.s1, st.s2, st.s3, st.s4, st.s5, st.s6,
      |       st.hlv AS phlv, st.htr AS phtr, st.he, st.we, st.ne, st.px,
      |       $sCase AS sw,
      |       (d.x - $sCase + 3 * (st.lv + st.tr)) // 4 AS nlv,
      |       (d.x + 3 * (st.hlv + st.htr)) // 4 AS nhlv
      |     FROM wb_st st JOIN wb_idx d ON d.i = st.i + 1)),
      | wb_fin AS (SELECT * FROM wb_st ORDER BY i DESC LIMIT 1)
      |SELECT (SELECT n_days FROM wb_n) AS n_days,
      |  CAST(we // ((SELECT n_days FROM wb_n) - 1) AS BIGINT)
      |    AS hw_mae_cents,
      |  CAST(he // ((SELECT n_days FROM wb_n) - 1) AS BIGINT)
      |    AS holt_mae_cents,
      |  CAST(ne // ((SELECT n_days FROM wb_n) - 1) AS BIGINT)
      |    AS naive_mae_cents,
      |  CAST((ne - we) * 1000000 // greatest(ne, 1) AS BIGINT)
      |    AS hw_skill_micro,
      |  CAST((he - we) * 1000000 // greatest(he, 1) AS BIGINT)
      |    AS hw_vs_holt_micro
      |FROM wb_fin WHERE (SELECT n_days FROM wb_n) > 1""".stripMargin
  }

  /** One time-half's structural gauges for q278: edge/weight totals
    * off the half's undirected list, per-community tot/in masses off
    * its l4 labels, the size histogram, and global modularity as ONE
    * truncated rational on the summed masses. */
  private def evoHalfCtes(p: String): String =
    s"""${p}m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
       |    CAST(coalesce(sum(w), 0) AS BIGINT) AS w_total FROM ${p}und),
       | ${p}tot AS (SELECT lbl, CAST(sum(wdeg) AS BIGINT) AS tot_w
       |   FROM (SELECT src AS node, CAST(sum(w) AS BIGINT) AS wdeg
       |      FROM ${p}edges GROUP BY 1) JOIN ${p}l4 USING (node)
       |   GROUP BY 1),
       | ${p}in AS (SELECT la.lbl, CAST(sum(e.w) AS BIGINT) AS in_w
       |   FROM ${p}edges e JOIN ${p}l4 la ON e.src = la.node
       |   JOIN ${p}l4 lb ON e.dst = lb.node
       |   WHERE la.lbl = lb.lbl GROUP BY 1),
       | ${p}cs AS (SELECT lbl, CAST(count(*) AS BIGINT) AS sz
       |   FROM ${p}l4 GROUP BY 1),
       | ${p}h AS (SELECT sz, CAST(count(*) AS BIGINT) AS cnt
       |   FROM ${p}cs GROUP BY 1),
       | ${p}g AS (SELECT
       |    (SELECT CAST(coalesce(sum(sz), 0) AS BIGINT) FROM ${p}cs)
       |      AS n_nodes,
       |    (SELECT n_edges FROM ${p}m) AS n_edges,
       |    (SELECT w_total FROM ${p}m) AS w_total,
       |    (SELECT CAST(count(*) AS BIGINT) FROM ${p}cs) AS n_comms,
       |    (SELECT CAST(coalesce(max(sz), 0) AS BIGINT) FROM ${p}cs)
       |      AS top_size,
       |    CAST(CASE WHEN (SELECT w_total FROM ${p}m) = 0 THEN 0 ELSE
       |      ((SELECT CAST(coalesce(sum(coalesce(in_w, 0)), 0) AS HUGEINT)
       |          FROM ${p}tot LEFT JOIN ${p}in USING (lbl))
       |        * (2 * CAST((SELECT w_total FROM ${p}m) AS HUGEINT))
       |       - (SELECT CAST(coalesce(sum(CAST(tot_w AS HUGEINT) * tot_w),
       |           0) AS HUGEINT) FROM ${p}tot)) * 1000000
       |      // ((2 * CAST((SELECT w_total FROM ${p}m) AS HUGEINT))
       |        * (2 * CAST((SELECT w_total FROM ${p}m) AS HUGEINT)))
       |    END AS BIGINT) AS q_micro)""".stripMargin

  /** q298: the N-epoch evolution series — q278's per-slice gauge
    * machinery instantiated once per epoch over the integer epoch
    * grid, with the drift as a lag over the epochs-sized rows. */
  private lazy val q298Sql: String = {
    val n = 4
    val epochs = (0 until n).map { e =>
      s"""gs${e}_items AS (SELECT DISTINCT l_orderkey AS basket,
         |    l_partkey AS item
         |   FROM gs_li WHERE ep = $e),
         | gs${e}_und AS (SELECT a.item AS pa, c.item AS pb,
         |     CAST(count(*) AS BIGINT) AS w
         |   FROM gs${e}_items a JOIN gs${e}_items c USING (basket)
         |   WHERE a.item < c.item GROUP BY 1, 2),
         | ${lpaCtesOn(s"gs${e}_und", s"gs${e}_edges", s"gs${e}_l")},
         | ${evoHalfCtes(s"gs${e}_")}""".stripMargin
    }.mkString(",\n ")
    val rows = (0 until n)
      .map(e => s"SELECT CAST($e AS BIGINT) AS epoch, * FROM gs${e}_g")
      .mkString("\n UNION ALL\n ")
    s"""WITH gs_ord AS (SELECT o_orderkey, epoch_us(o_orderdate) AS d
       |   FROM orders),
       | gs_rng AS (SELECT min(d) AS lo, max(d) - min(d) + 1 AS span
       |   FROM gs_ord),
       | gs_li AS (SELECT l_orderkey, l_partkey,
       |     CAST(((d - (SELECT lo FROM gs_rng)) * $n)
       |       // (SELECT span FROM gs_rng) AS BIGINT) AS ep
       |   FROM lineitem JOIN gs_ord ON l_orderkey = o_orderkey),
       | $epochs,
       | gs_rows AS ($rows)
       |SELECT epoch, n_nodes, n_edges, w_total,
       |  n_comms AS n_communities, top_size, q_micro AS modularity_micro,
       |  q_micro - lag(q_micro) OVER (ORDER BY epoch)
       |    AS modularity_drift_micro
       |FROM gs_rows ORDER BY epoch""".stripMargin
  }

  /** q278: the evolution replay — the q260 midpoint halves, the
    * shared LPA walk instantiated once per half, the per-half gauge
    * CTEs, and the cross-half TVD on exact cross-multiplied
    * rationals. */
  private lazy val q278Sql: String =
    s"""WITH ge_ord AS (SELECT o_orderkey, epoch_us(o_orderdate) AS d
       |   FROM orders),
       | ge_mid AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ge_ord),
       | ge_li AS (SELECT l_orderkey, l_partkey, d FROM lineitem
       |   JOIN ge_ord ON l_orderkey = o_orderkey),
       | ga_items AS (SELECT DISTINCT l_orderkey AS basket,
       |    l_partkey AS item
       |   FROM ge_li WHERE d < (SELECT mid FROM ge_mid)),
       | ga_und AS (SELECT a.item AS pa, c.item AS pb,
       |     CAST(count(*) AS BIGINT) AS w
       |   FROM ga_items a JOIN ga_items c USING (basket)
       |   WHERE a.item < c.item GROUP BY 1, 2),
       | gb_items AS (SELECT DISTINCT l_orderkey AS basket,
       |    l_partkey AS item
       |   FROM ge_li WHERE d >= (SELECT mid FROM ge_mid)),
       | gb_und AS (SELECT a.item AS pa, c.item AS pb,
       |     CAST(count(*) AS BIGINT) AS w
       |   FROM gb_items a JOIN gb_items c USING (basket)
       |   WHERE a.item < c.item GROUP BY 1, 2),
       | ${lpaCtesOn("ga_und", "ga_edges", "ga_l")},
       | ${lpaCtesOn("gb_und", "gb_edges", "gb_l")},
       | ${evoHalfCtes("ga_")},
       | ${evoHalfCtes("gb_")},
       | ge_tvd AS (SELECT CAST(coalesce(sum(abs(
       |      CAST(coalesce(a.cnt, 0) AS HUGEINT)
       |        * (SELECT n_comms FROM gb_g)
       |      - CAST(coalesce(b.cnt, 0) AS HUGEINT)
       |        * (SELECT n_comms FROM ga_g))), 0) * 1000000
       |    // greatest(2 * CAST((SELECT n_comms FROM ga_g) AS HUGEINT)
       |      * (SELECT n_comms FROM gb_g), 1) AS BIGINT) AS tvd
       |   FROM ga_h a FULL JOIN gb_h b USING (sz))
       |SELECT a.n_nodes AS n_nodes_a, a.n_edges AS n_edges_a,
       |  a.w_total AS w_total_a, a.n_comms AS n_communities_a,
       |  a.top_size AS top_size_a, a.q_micro AS modularity_a_micro,
       |  b.n_nodes AS n_nodes_b, b.n_edges AS n_edges_b,
       |  b.w_total AS w_total_b, b.n_comms AS n_communities_b,
       |  b.top_size AS top_size_b, b.q_micro AS modularity_b_micro,
       |  b.q_micro - a.q_micro AS modularity_drift_micro,
       |  (SELECT tvd FROM ge_tvd) AS size_tvd_micro
       |FROM ga_g a CROSS JOIN gb_g b""".stripMargin

  /** q279: TextRank — the q230 unrolled-power-iteration replay over
    * the token co-occurrence graph (adjacent surviving tokens per
    * document, canonical pair order, corpus-wide counts). */
  private lazy val q279Sql: String = {
    val iters = (1 to 5).map { i =>
      s"""tr_r$i AS (SELECT e.dst AS token,
         |    CAST((SELECT (15 * (1000000000000 // nn)) // 100 FROM tr_n)
         |      + 85 * sum(CAST(r.r AS HUGEINT) * e.w // e.outw) // 100
         |      AS BIGINT) AS r
         |  FROM tr_r${i - 1} r JOIN tr_ew e ON r.token = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n ")
    s"""WITH tr_toks AS (SELECT list_filter(string_split(text, ' '),
       |     t -> len(t) >= 2 AND t NOT IN ('the', 'a', 'and', 'of')) AS ts
       |   FROM documents),
       | tr_z AS (SELECT unnest(list_zip(ts, ts[2:])) AS z FROM tr_toks),
       | tr_p AS (SELECT least(z[1], z[2]) AS pa, greatest(z[1], z[2]) AS pb
       |   FROM tr_z WHERE z[2] IS NOT NULL AND z[1] <> z[2]),
       | tr_und AS (SELECT pa, pb, CAST(count(*) AS BIGINT) AS w
       |   FROM tr_p GROUP BY 1, 2),
       | tr_edges AS (SELECT pa AS src, pb AS dst, w FROM tr_und
       |   UNION ALL SELECT pb, pa, w FROM tr_und),
       | tr_ew AS (SELECT src, dst, w,
       |     CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS outw
       |   FROM tr_edges),
       | tr_n AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS nn
       |   FROM tr_ew),
       | tr_r0 AS (SELECT DISTINCT src AS token,
       |     (SELECT CAST(1000000000000 // nn AS BIGINT) FROM tr_n) AS r
       |   FROM tr_ew),
       | $iters
       |SELECT row_number() OVER (ORDER BY r DESC, token ASC) AS rank,
       |  token, r AS score_pico
       |FROM tr_r5 ORDER BY score_pico DESC, token ASC LIMIT 25""".stripMargin
  }

  /** q280: Theil–Sen — the median-of-pairwise-slopes replay; every
    * median is the floored midrank average, sum // count over the one
    * or two midrank rows ≡ the engine's (lo + hi) div 2. */
  private lazy val q280Sql: String =
    """WITH ts_d AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS t,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      | ts_p AS (SELECT (CAST(b.y AS HUGEINT) - a.y) * 1000000 // (b.t - a.t)
      |     AS s
      |   FROM ts_d a JOIN ts_d b ON a.t < b.t),
      | ts_pr AS (SELECT s, row_number() OVER (ORDER BY s) AS rn,
      |     count(*) OVER () AS n FROM ts_p),
      | ts_sl AS (SELECT sum(s) // count(*) AS slope FROM ts_pr
      |   WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2),
      | ts_r AS (SELECT CAST(y AS HUGEINT) * 1000000
      |     - (SELECT slope FROM ts_sl) * t AS resid FROM ts_d),
      | ts_rr AS (SELECT resid, row_number() OVER (ORDER BY resid) AS rn,
      |     count(*) OVER () AS n FROM ts_r),
      | ts_ic AS (SELECT sum(resid) // count(*) AS med_resid FROM ts_rr
      |   WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2),
      | ts_ar AS (SELECT abs(resid - (SELECT med_resid FROM ts_ic)) AS ad
      |   FROM ts_r),
      | ts_am AS (SELECT ad, row_number() OVER (ORDER BY ad) AS rn,
      |     count(*) OVER () AS n FROM ts_ar),
      | ts_mad AS (SELECT sum(ad) // count(*) AS mad FROM ts_am
      |   WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM ts_d) AS n_days,
      |  (SELECT CAST(count(*) AS BIGINT) FROM ts_p) AS n_pairs,
      |  CAST((SELECT slope FROM ts_sl) AS BIGINT) AS slope_micro,
      |  CAST((SELECT med_resid FROM ts_ic) // 1000000 AS BIGINT)
      |    AS intercept_cents,
      |  CAST((SELECT mad FROM ts_mad) // 1000000 AS BIGINT) AS mad_cents""".stripMargin

  /** q281: entity resolution — q186's deletion-variant candidates
    * verified at levenshtein ≤ 1 become the edge set, then UNROLLED
    * min-label rounds (NOT the shared recursive closure: sequential
    * customer names chain into one giant component, and a transitive
    * closure over it is O(n²) rows — quadratic oracle cost at sf0.1+.
    * The engine's connectedComponents THROWS if it hasn't reached the
    * fixpoint within its 25-round cap, so a SUCCESSFUL engine run
    * guarantees 26 unrolled min-label rounds land on the same
    * fixpoint; extra rounds are no-ops). */
  private lazy val q281Sql: String = {
    val rounds = (1 to 26).map { i =>
      s"""cc$i AS MATERIALIZED (SELECT x.doc_id,
         |    least(x.cluster_id, coalesce(nb.m, x.cluster_id)) AS cluster_id
         |  FROM cc${i - 1} x LEFT JOIN (
         |    SELECT e.a AS doc_id, min(l.cluster_id) AS m
         |    FROM edges e JOIN cc${i - 1} l ON e.b = l.doc_id
         |    GROUP BY 1) nb USING (doc_id))""".stripMargin
    }.mkString(",\n ")
    s"""WITH names AS (SELECT c_custkey AS id, c_name AS name
       |   FROM customer),
       | vars AS (
       |   SELECT id, CAST('0x' || substr(md5(variant), 1, 15) AS BIGINT) AS vh
       |   FROM (
       |     SELECT id, name AS variant FROM names
       |     UNION ALL
       |     SELECT id, substr(name, 1, i - 1) || substr(name, i + 1) AS variant
       |     FROM (SELECT id, name, unnest(range(1, length(name) + 1)) AS i
       |           FROM names))),
       | cids AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |   FROM vars a JOIN vars b ON a.vh = b.vh AND a.id < b.id),
       | pairs AS (SELECT id_a AS doc_a, id_b AS doc_b FROM cids
       |   JOIN names na ON id_a = na.id
       |   JOIN names nb ON id_b = nb.id
       |   WHERE levenshtein(na.name, nb.name) <= 1),
       | edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |   UNION ALL SELECT doc_b, doc_a FROM pairs),
       | cc0 AS MATERIALIZED (SELECT a AS doc_id,
       |    least(a, min(b)) AS cluster_id FROM edges GROUP BY a),
       | $rounds,
       | ec_g AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
       |   FROM cc26 GROUP BY 1)
       |SELECT cluster_id, n_members, name AS canonical_name
       |FROM ec_g JOIN names ON cluster_id = names.id""".stripMargin
  }

  /** q282: JL projection — md5 hyperplane signs ('j-d', & 1, the LSH
    * family), 10⁻⁶ tick grid, exact int64 sums; both rankings replayed
    * with the house tie-break and agreement read off a left join. */
  private lazy val q282Sql: String =
    """WITH jl_mi AS (SELECT vec_id, list_transform(embedding,
      |     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mi
      |   FROM embeddings),
      | jl_sgn AS (SELECT j, d,
      |     CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '-'
      |         || CAST(d AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 0
      |       THEN 1 ELSE -1 END AS s
      |   FROM (SELECT unnest(range(0, 16)) AS j),
      |        (SELECT unnest(range(0, 64)) AS d)),
      | jl_pr AS (SELECT vec_id, j, CAST(sum(s * mi[CAST(d + 1 AS INTEGER)])
      |     AS BIGINT) AS pj
      |   FROM jl_mi, jl_sgn GROUP BY 1, 2),
      | jl_pl AS (SELECT vec_id, list(pj ORDER BY j) AS p FROM jl_pr
      |   GROUP BY 1),
      | jl_q AS (SELECT vec_id AS query_id, p AS qp FROM jl_pl
      |   WHERE vec_id < 10),
      | jl_qm AS (SELECT vec_id AS query_id, mi AS qmi FROM jl_mi
      |   WHERE vec_id < 10),
      | jl_sc AS (SELECT query_id, c.vec_id AS cand_id,
      |     CAST(list_sum(list_transform(range(1, 17),
      |       i -> c.p[i] * qp[i])) AS BIGINT) AS sim
      |   FROM jl_pl c JOIN jl_q ON c.vec_id <> query_id),
      | jl_se AS (SELECT query_id, c.vec_id AS cand_id,
      |     CAST(list_sum(list_transform(range(1, 65),
      |       i -> c.mi[i] * qmi[i])) AS BIGINT) AS esim
      |   FROM jl_mi c JOIN jl_qm ON c.vec_id <> query_id),
      | jl_rp AS (SELECT query_id, cand_id, sim,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY sim DESC, cand_id ASC) AS rank FROM jl_sc),
      | jl_re AS (SELECT query_id, cand_id,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY esim DESC, cand_id ASC) AS er FROM jl_se)
      |SELECT rp.query_id, rp.rank, rp.cand_id, rp.sim AS proj_sim,
      |  re.er IS NOT NULL AS in_exact
      |FROM jl_rp rp LEFT JOIN (SELECT * FROM jl_re WHERE er <= 5) re
      |  ON rp.query_id = re.query_id AND rp.cand_id = re.cand_id
      |WHERE rp.rank <= 5""".stripMargin

  /** q297: JL + IVF composition — q282's projection feeding an IVF
    * probe with shortlist-then-exact-rerank; every stage (projection,
    * argmax assignment, probe ranks, shortlist, tick rerank) replays
    * as integer math. */
  private lazy val q297Sql: String =
    """WITH ji_mi AS (SELECT vec_id, list_transform(embedding,
      |     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mi
      |   FROM embeddings),
      | ji_sgn AS (SELECT j, d,
      |     CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) ||
      |         '-' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 0
      |       THEN 1 ELSE -1 END AS s
      |   FROM (SELECT unnest(range(0, 16)) AS j),
      |        (SELECT unnest(range(0, 64)) AS d)),
      | ji_pr AS (SELECT vec_id, j, CAST(sum(s * mi[CAST(d + 1 AS INTEGER)])
      |     AS BIGINT) AS pj
      |   FROM ji_mi, ji_sgn GROUP BY 1, 2),
      | ji_pl AS (SELECT vec_id, list(pj ORDER BY j) AS p FROM ji_pr
      |   GROUP BY 1),
      | ji_ct AS (SELECT vec_id AS cid, p AS cp FROM ji_pl
      |   WHERE vec_id < 16),
      | ji_ad AS (SELECT c.vec_id AS vid, cid,
      |     CAST(list_sum(list_transform(range(1, 17),
      |       i -> c.p[i] * cp[i])) AS BIGINT) AS csim
      |   FROM ji_pl c CROSS JOIN ji_ct),
      | ji_as AS (SELECT vid AS cand_id, cid AS centroid_id FROM (
      |     SELECT vid, cid, row_number() OVER (PARTITION BY vid
      |       ORDER BY csim DESC, cid ASC) AS rn FROM ji_ad) WHERE rn = 1),
      | ji_pb AS (SELECT vid AS query_id, cid AS centroid_id FROM (
      |     SELECT vid, cid, row_number() OVER (PARTITION BY vid
      |       ORDER BY csim DESC, cid ASC) AS rn FROM ji_ad WHERE vid < 10)
      |   WHERE rn <= 4),
      | ji_sc AS (SELECT pb.query_id, a.cand_id,
      |     CAST(list_sum(list_transform(range(1, 17),
      |       i -> cv.p[i] * qv.p[i])) AS BIGINT) AS psim
      |   FROM ji_pb pb JOIN ji_as a USING (centroid_id)
      |     JOIN ji_pl cv ON cv.vec_id = a.cand_id
      |     JOIN ji_pl qv ON qv.vec_id = pb.query_id
      |   WHERE a.cand_id <> pb.query_id),
      | ji_sl AS (SELECT query_id, cand_id FROM (
      |     SELECT query_id, cand_id, row_number() OVER (
      |       PARTITION BY query_id ORDER BY psim DESC, cand_id ASC) AS rn
      |     FROM ji_sc) WHERE rn <= 100),
      | ji_ex AS (SELECT sl.query_id, sl.cand_id,
      |     CAST(list_sum(list_transform(range(1, 65),
      |       i -> c.mi[i] * q.mi[i])) AS BIGINT) AS sim_ticks
      |   FROM ji_sl sl JOIN ji_mi c ON c.vec_id = sl.cand_id
      |     JOIN ji_mi q ON q.vec_id = sl.query_id)
      |SELECT query_id, cand_id, sim_ticks, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim_ticks DESC, cand_id ASC) AS rank FROM ji_ex)
      |WHERE rank <= 5""".stripMargin

  /** q283: IVM — the oracle is deliberately the NAIVE full recompute
    * (q31's LWW fold + one group-by), so a green row proves the
    * engine's retraction algebra converges to it. */
  private lazy val q283Sql: String =
    """WITH log AS (
      |  SELECT CASE event_type WHEN 'signup' THEN 'insert'
      |                         WHEN 'error' THEN 'delete'
      |                         ELSE 'update' END AS op,
      |    user_id, value,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |    ts, event_id AS off
      |  FROM events),
      | st AS (SELECT user_id, value, k FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, off DESC) AS rn FROM log)
      |  WHERE rn = 1 AND op <> 'delete')
      |SELECT CASE WHEN k IS NULL THEN -1 ELSE ((k % 8) + 8) % 8 END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(coalesce(CAST(floor(value * 100) AS BIGINT), 0))
      |    AS BIGINT) AS cents
      |FROM st GROUP BY 1""".stripMargin

  /** q284: CCF — hourly click/purchase spine, exact HUGEINT moments
    * per lag, the q195 final-expression discipline. */
  private lazy val q284Sql: String =
    """WITH cc_h AS (SELECT epoch_us(ts) // 3600000000 AS h,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
      | cc_l AS (SELECT CAST(unnest(range(-12, 13)) AS BIGINT) AS lag),
      | cc_j AS (SELECT lag, a.x AS x, b.y AS y
      |   FROM cc_l CROSS JOIN cc_h a JOIN cc_h b ON b.h = a.h + lag),
      | cc_m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_ticks,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM cc_j GROUP BY 1),
      | cc_v AS (SELECT lag, n_ticks,
      |    CAST(n_ticks AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
      |    CAST(n_ticks AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
      |    CAST(n_ticks AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
      |  FROM cc_m)
      |SELECT lag, n_ticks,
      |  CASE WHEN vx > 0 AND vy > 0
      |    THEN CAST(round(round(cv / sqrt(vx * vy), 6) * 1000000, 0)
      |      AS BIGINT) END AS r_micro
      |FROM cc_v""".stripMargin

  /** q285: trimmed/winsorized means — rank windows per segment, the
    * same lo = n·5 div 100 cut, every mean sum // count. */
  private lazy val q285Sql: String =
    """WITH tw_r AS (SELECT c_mktsegment AS segment,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY CAST(floor(c_acctbal * 100) AS BIGINT) ASC,
      |        c_custkey ASC) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
      |  FROM customer),
      | tw_l AS (SELECT *, n * 5 // 100 AS lo FROM tw_r)
      |SELECT segment, max(n) AS n_rows,
      |  CAST(sum(cents) // max(n) AS BIGINT) AS mean_cents,
      |  CAST(sum(CASE WHEN rn > lo AND rn <= n - lo THEN cents END)
      |    // greatest(max(n) - 2 * max(lo), 1) AS BIGINT) AS trimmed_cents,
      |  CAST((sum(CASE WHEN rn > lo AND rn <= n - lo THEN cents END)
      |    + max(lo) * max(CASE WHEN rn = lo + 1 THEN cents END)
      |    + max(lo) * max(CASE WHEN rn = n - lo THEN cents END))
      |    // max(n) AS BIGINT) AS winsorized_cents
      |FROM tw_l GROUP BY 1""".stripMargin

  /** q286: sampled harmonic centrality — the q251 per-sample BFS
    * chain with first-reach hops kept, then the 10⁶ div hops fold. */
  private lazy val q286Sql: String = {
    val (nSamples, maxHops, k) = (8, 3, 25)
    val rounds = (1 to maxHops).map { h =>
      s"""hcn$h AS MATERIALIZED (
         |   SELECT b.sample, e.dst AS node
         |   FROM hc${h - 1} b JOIN hc_edges e ON b.node = e.src
         |   EXCEPT SELECT sample, node FROM hc${h - 1}),
         | hc$h AS MATERIALIZED (SELECT sample, node FROM hc${h - 1}
         |   UNION ALL SELECT sample, node FROM hcn$h)""".stripMargin
    }.mkString(",\n ")
    val unions = (1 to maxHops)
      .map(h => s"SELECT sample, node, CAST($h AS BIGINT) AS hops FROM hcn$h")
      .mkString(" UNION ALL ")
    s"""WITH $coPurchaseCtes,
       | hc_edges AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | hc_samples AS (SELECT src AS sample
       |   FROM (SELECT DISTINCT src FROM hc_edges)
       |   ORDER BY md5('anf-' || CAST(src AS VARCHAR)) ASC LIMIT $nSamples),
       | hc0 AS (SELECT sample, sample AS node FROM hc_samples),
       | $rounds,
       | hc_d AS ($unions),
       | hc_g AS (SELECT node AS part, CAST(count(*) AS BIGINT) AS n_sources,
       |     CAST(sum(1000000 // hops) AS BIGINT) AS h_micro
       |   FROM hc_d GROUP BY 1)
       |SELECT row_number() OVER (ORDER BY h_micro DESC, part ASC) AS rank,
       |  part, n_sources, h_micro
       |FROM hc_g ORDER BY h_micro DESC, part ASC LIMIT $k""".stripMargin
  }

  /** q287: Kaplan–Meier — gap/censoring counts via windows, risk set
    * as a cumulative on the day spine, and the product limit as the
    * q275-style RECURSIVE accumulator (s′ = s·(n−d) // n). */
  private lazy val q287Sql: String =
    """WITH RECURSIVE km_o AS (SELECT o_custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) AS d FROM orders),
      | km_h AS (SELECT max(d) AS h FROM km_o),
      | km_s AS (SELECT CAST(CASE WHEN nxt IS NOT NULL
      |      THEN date_diff('day', d, nxt)
      |      ELSE date_diff('day', d, (SELECT h FROM km_h)) END AS BIGINT) AS t,
      |     CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
      |   FROM (SELECT d, lead(d) OVER (PARTITION BY o_custkey
      |       ORDER BY d ASC, o_orderkey ASC) AS nxt FROM km_o)),
      | km_c AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_events,
      |     CAST(sum(1 - ev) AS BIGINT) AS c_censored
      |   FROM km_s GROUP BY 1),
      | km_sp AS (SELECT t, d_events, c_censored,
      |     CAST((SELECT sum(d_events + c_censored) FROM km_c)
      |       - coalesce(sum(d_events + c_censored) OVER (ORDER BY t ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |       AS BIGINT) AS n_risk,
      |     CAST(row_number() OVER (ORDER BY t ASC) AS BIGINT) AS rn
      |   FROM km_c),
      | km_f(rn, t, d_events, c_censored, n_risk, s) AS (
      |   SELECT rn, t, d_events, c_censored, n_risk,
      |     CAST(1000000 AS HUGEINT) * (n_risk - d_events) // n_risk
      |   FROM km_sp WHERE rn = 1
      |   UNION ALL
      |   SELECT p.rn, p.t, p.d_events, p.c_censored, p.n_risk,
      |     (f.s * (p.n_risk - p.d_events)) // p.n_risk
      |   FROM km_f f JOIN km_sp p ON p.rn = f.rn + 1)
      |SELECT t AS t_days, n_risk, d_events, c_censored,
      |  CAST(s AS BIGINT) AS s_micro
      |FROM km_f""".stripMargin

  /** q288: PR curve — q209's logit-tick/positive-label frame, walked
    * from the top score down with cumulative windows; AP numerator on
    * HUGEINT. */
  private lazy val q288Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | f AS (SELECT CAST(round(cls.logit * 10000) AS BIGINT) AS s,
       |    m.quality >= 0.66 AS pos
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | t AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
       |   FROM f GROUP BY s),
       | r AS (SELECT *,
       |    CAST(sum(np) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS tp,
       |    CAST(sum(cnt) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS pp,
       |    CAST(sum(np) OVER () AS BIGINT) AS p_total
       |   FROM t),
       | pr AS (SELECT *, CAST(tp * 1000000 // pp AS BIGINT)
       |     AS precision_micro FROM r),
       | ap AS (SELECT *, sum(CAST(np AS HUGEINT) * precision_micro)
       |     OVER (ORDER BY s DESC
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ap_num
       |   FROM pr)
       |SELECT s AS s_tick, tp, CAST(pp - tp AS BIGINT) AS fp,
       |  CAST(p_total - tp AS BIGINT) AS fn, precision_micro,
       |  CAST(tp * 1000000 // greatest(p_total, 1) AS BIGINT)
       |    AS recall_micro,
       |  CAST(ap_num // greatest(p_total, 1) AS BIGINT) AS ap_micro
       |FROM ap""".stripMargin

  /** q299: ROC curve — q288's tick walk with the tpr/fpr axis pair
    * and Youden's J. */
  private lazy val q299Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | f AS (SELECT CAST(round(cls.logit * 10000) AS BIGINT) AS s,
       |    m.quality >= 0.66 AS pos
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | t AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
       |   FROM f GROUP BY s),
       | r AS (SELECT *,
       |    CAST(sum(np) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS tp,
       |    CAST(sum(cnt) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS pp,
       |    CAST(sum(np) OVER () AS BIGINT) AS p_total,
       |    CAST(sum(cnt - np) OVER () AS BIGINT) AS n_total
       |   FROM t),
       | roc AS (SELECT s AS s_tick, tp, CAST(pp - tp AS BIGINT) AS fp,
       |    CAST(tp * 1000000 // greatest(p_total, 1) AS BIGINT)
       |      AS tpr_micro,
       |    CAST((pp - tp) * 1000000 // greatest(n_total, 1) AS BIGINT)
       |      AS fpr_micro
       |   FROM r)
       |SELECT s_tick, tp, fp, tpr_micro, fpr_micro,
       |  tpr_micro - fpr_micro AS youden_micro
       |FROM roc ORDER BY s_tick DESC""".stripMargin

  /** q300: degree assortativity — exact integer moments over the
    * symmetrized edge list, the q284 one-double-expression finish. */
  private lazy val q300Sql: String =
    s"""WITH $coPurchaseCtes,
       | as_sym AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | as_deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |   FROM as_sym GROUP BY 1),
       | as_m AS (SELECT CAST(count(*) AS BIGINT) AS m2,
       |    CAST(sum(dx.deg) AS BIGINT) AS sx,
       |    CAST(sum(dy.deg) AS BIGINT) AS sy,
       |    sum(CAST(dx.deg AS HUGEINT) * dx.deg) AS sxx,
       |    sum(CAST(dy.deg AS HUGEINT) * dy.deg) AS syy,
       |    sum(CAST(dx.deg AS HUGEINT) * dy.deg) AS sxy
       |   FROM as_sym e JOIN as_deg dx ON e.src = dx.node
       |   JOIN as_deg dy ON e.dst = dy.node)
       |SELECT m2 AS n_directed_edges,
       |  CASE WHEN (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
       |      AND (CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
       |    THEN CAST(round(round((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / sqrt((CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |        * (CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       |      * 1000000, 0) AS BIGINT)
       |  END AS assortativity_micro
       |FROM as_m""".stripMargin

  /** q301: single changepoint — floored-rational gain comparison over
    * the prefix-sum spine, day tie-break, exact R². */
  private lazy val q301Sql: String =
    """WITH cpd AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      | cps AS (SELECT day, y,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
      |    CAST(sum(y) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS s1,
      |    CAST(count(*) OVER () AS BIGINT) AS n,
      |    CAST(sum(y) OVER () AS BIGINT) AS st,
      |    sum(CAST(y AS HUGEINT) * y) OVER () AS sq
      |  FROM cpd),
      | cpg AS (SELECT *,
      |    (CAST(s1 AS HUGEINT) * s1 * (n - i)
      |      + CAST(st - s1 AS HUGEINT) * (st - s1) * i)
      |      // (CAST(i AS HUGEINT) * (n - i) * 1000000000) AS gain
      |  FROM cps WHERE i < n)
      |SELECT day AS split_day, i AS n_left,
      |  CAST(n - i AS BIGINT) AS n_right,
      |  CAST(s1 // i AS BIGINT) AS mean_left_cents,
      |  CAST((st - s1) // (n - i) AS BIGINT) AS mean_right_cents,
      |  CAST(((CAST(s1 AS HUGEINT) * s1 * (n - i)
      |      + CAST(st - s1 AS HUGEINT) * (st - s1) * i) * n
      |    - CAST(st AS HUGEINT) * st * i * (n - i)) * 1000000
      |    // greatest((CAST(sq AS HUGEINT) * n
      |        - CAST(st AS HUGEINT) * st) * i * (n - i), 1)
      |    AS BIGINT) AS r2_micro
      |FROM cpg ORDER BY gain DESC, day ASC LIMIT 1""".stripMargin

  /** q302: Good–Turing bigram census per source — exact integer
    * frequency-of-frequencies ratios. */
  private lazy val q302Sql: String =
    """WITH gt_t AS (SELECT source, string_split(text, ' ') AS ts
      |   FROM documents),
      | gt_z AS (SELECT source, unnest(list_zip(ts, ts[2:])) AS z FROM gt_t),
      | gt_b AS (SELECT source, z[1] || ' ' || z[2] AS bg FROM gt_z
      |   WHERE z[2] IS NOT NULL),
      | gt_f AS (SELECT source, bg, CAST(count(*) AS BIGINT) AS tf
      |   FROM gt_b GROUP BY 1, 2),
      | gt_m AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_bigrams,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM gt_f GROUP BY 1)
      |SELECT source, n_bigrams, vocab, f1, f2,
      |  CAST(f1 * 1000000 // greatest(n_bigrams, 1) AS BIGINT)
      |    AS unseen_mass_micro,
      |  CAST(2 * f2 * 1000000 // greatest(f1, 1) AS BIGINT)
      |    AS r1_star_micro
      |FROM gt_m""".stripMargin

  /** q303: Heaps'-law fit — trigram vocab growth at 10 doc-prefix
    * checkpoints, exact integer OLS on the 1e-6 log grid. */
  private lazy val q303Sql: String =
    """WITH hl_d AS (SELECT doc_id, string_split(text, ' ') AS ts
      |   FROM documents),
      | hl_g AS (SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
      |      i -> ts[CAST(i AS INTEGER)] || ' '
      |        || ts[CAST(i + 1 AS INTEGER)] || ' '
      |        || ts[CAST(i + 2 AS INTEGER)])) AS g
      |   FROM hl_d),
      | hl_max AS (SELECT max(doc_id) AS mx FROM documents),
      | hl_cut AS (SELECT CAST(k AS BIGINT) AS checkpoint,
      |    (SELECT (mx + 1) * k // 10 - 1 FROM hl_max) AS cut
      |   FROM (SELECT unnest(range(1, 11)) AS k)),
      | hl_first AS (SELECT g, min(doc_id) AS first_doc FROM hl_g
      |   GROUP BY 1),
      | hl_n AS (SELECT checkpoint, CAST(count(*) AS BIGINT) AS n_grams
      |   FROM hl_cut JOIN hl_g ON doc_id <= cut GROUP BY 1),
      | hl_v AS (SELECT checkpoint, CAST(count(*) AS BIGINT) AS vocab
      |   FROM hl_cut JOIN hl_first ON first_doc <= cut GROUP BY 1),
      | hl_l AS (SELECT checkpoint, n_grams, vocab,
      |    CAST(round(ln(CAST(n_grams AS DOUBLE)) * 1000000, 0) AS BIGINT)
      |      AS lxu,
      |    CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000000, 0) AS BIGINT)
      |      AS lyu
      |   FROM hl_n JOIN hl_v USING (checkpoint)),
      | hl_m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(lxu) AS BIGINT) AS sx, CAST(sum(lyu) AS BIGINT) AS sy,
      |    sum(CAST(lxu AS HUGEINT) * lxu) AS sxx,
      |    sum(CAST(lxu AS HUGEINT) * lyu) AS sxy
      |   FROM hl_l)
      |SELECT checkpoint, n_grams, vocab,
      |  CAST((SELECT (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
      |      * 10000 // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
      |    FROM hl_m) AS BIGINT) AS beta_e4
      |FROM hl_l ORDER BY checkpoint""".stripMargin

  /** q304: Fleiss' kappa across the three deterministic rater gates —
    * exact rational P̄/P̄ₑ/κ in micro. */
  private lazy val q304Sql: String =
    s"""WITH $docMetricsCte,
       | fk AS (SELECT (CASE WHEN m.quality >= 0.66 THEN 1 ELSE 0 END
       |      + CASE WHEN m.guess = 'en' THEN 1 ELSE 0 END
       |      + CASE WHEN len(string_split(d.text, ' ')) >= 30
       |          THEN 1 ELSE 0 END) AS keeps
       |   FROM m JOIN documents d USING (doc_id)),
       | fm AS (SELECT CAST(count(*) AS BIGINT) AS n_subjects,
       |    CAST(sum(keeps) AS BIGINT) AS total_keeps,
       |    sum(CAST(keeps * keeps + (3 - keeps) * (3 - keeps) AS HUGEINT))
       |      AS sq
       |   FROM fk),
       | fp AS (SELECT n_subjects, total_keeps,
       |    CAST((sq - 3 * n_subjects) * 1000000 // (6 * n_subjects)
       |      AS BIGINT) AS p_bar_micro,
       |    CAST((CAST(total_keeps AS HUGEINT) * total_keeps
       |       + CAST(3 * n_subjects - total_keeps AS HUGEINT)
       |         * (3 * n_subjects - total_keeps)) * 1000000
       |      // (CAST(3 * n_subjects AS HUGEINT) * (3 * n_subjects))
       |      AS BIGINT) AS p_e_micro
       |   FROM fm)
       |SELECT n_subjects, total_keeps, p_bar_micro, p_e_micro,
       |  CAST(CASE WHEN p_e_micro = 1000000 THEN 0
       |    ELSE (CAST(p_bar_micro AS HUGEINT) - p_e_micro) * 1000000
       |      // (1000000 - p_e_micro) END AS BIGINT) AS kappa_micro
       |FROM fp""".stripMargin

  /** q305: mutual information between event type and hour-of-day —
    * exact contingency counts, per-cell ln on the 1e-6 grid, integer
    * fold. */
  private lazy val q305Sql: String =
    """WITH mi_c AS (SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
      |    CAST(count(*) AS BIGINT) AS nxy
      |  FROM events GROUP BY 1, 2),
      | mi_m AS (SELECT *,
      |    CAST(sum(nxy) OVER (PARTITION BY x) AS BIGINT) AS nx,
      |    CAST(sum(nxy) OVER (PARTITION BY y) AS BIGINT) AS ny,
      |    CAST(sum(nxy) OVER () AS BIGINT) AS n FROM mi_c),
      | mi_l AS (SELECT *,
      |    CAST(round(ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
      |        / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) * 1000000, 0)
      |      AS BIGINT) AS l_micro,
      |    CAST(round(ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * 1000000, 0) AS BIGINT) AS hx_micro
      |   FROM mi_m)
      |SELECT max(n) AS n_events,
      |  CAST(count(DISTINCT x) AS BIGINT) AS n_types,
      |  CAST(count(DISTINCT y) AS BIGINT) AS n_hours,
      |  CAST(sum(CAST(nxy AS HUGEINT) * l_micro) // max(n) AS BIGINT)
      |    AS mi_micro,
      |  CAST(sum(CAST(nxy AS HUGEINT) * -hx_micro) // max(n) AS BIGINT)
      |    AS h_type_micro
      |FROM mi_l""".stripMargin

  /** q306: empirical entropy rate — q88's transition counts, plug-in
    * conditional entropy on the 1e-6 log grid. */
  private lazy val q306Sql: String =
    """WITH er_l AS (SELECT event_type AS next_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      | er_c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |   FROM er_l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      | er_t AS (SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS tot
      |   FROM er_c),
      | er_m AS (SELECT *,
      |    CAST(round(ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
      |        * 1000000, 0) AS BIGINT) AS l_micro
      |   FROM er_t)
      |SELECT CAST(sum(n) AS BIGINT) AS n_transitions,
      |  CAST(count(DISTINCT prev_type) AS BIGINT) AS n_states,
      |  CAST(sum(CAST(n AS HUGEINT) * -l_micro) // sum(n) AS BIGINT)
      |    AS h_cond_micro
      |FROM er_m""".stripMargin

  /** q307: Pareto skyline on (quality tick, token count) — the 2-D
    * sweep replay: per quality group the max length, kept iff it
    * beats the running max over strictly higher quality. */
  private lazy val q307Sql: String =
    s"""WITH $docMetricsCte,
       | pd AS (SELECT m.doc_id,
       |    CAST(round(m.quality * 10000) AS BIGINT) AS q,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS t
       |   FROM m JOIN documents d USING (doc_id)),
       | pg AS (SELECT q, max(t) AS gmax FROM pd GROUP BY 1),
       | ph AS (SELECT q, gmax, max(gmax) OVER (ORDER BY q DESC
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hmax
       |   FROM pg),
       | sk AS (SELECT q, gmax AS t FROM ph
       |   WHERE hmax IS NULL OR gmax > hmax)
       |SELECT doc_id, q AS quality_tick, t AS n_tokens
       |FROM pd JOIN sk USING (q, t)
       |ORDER BY quality_tick DESC, doc_id ASC""".stripMargin

  /** q308: 5-step absorption reachability — unrolled value iteration
    * on the micro grid over q88's kernel, target absorbing. */
  private lazy val q308Sql: String = {
    val rounds = (1 to 5).map { i =>
      s"""pr_p$i AS (SELECT s.state,
         |    CAST(CASE WHEN s.state = 'purchase' THEN 1000000
         |      ELSE coalesce(x.pr, 0) END AS BIGINT) AS p
         |   FROM pr_s s LEFT JOIN (
         |     SELECT prev_type AS state,
         |       CAST(sum(CAST(n AS HUGEINT) * p) // max(tot) AS BIGINT) AS pr
         |     FROM pr_t JOIN pr_p${i - 1} ON next_type = pr_p${i - 1}.state
         |     GROUP BY 1) x USING (state))""".stripMargin
    }.mkString(",\n ")
    s"""WITH pr_l AS (SELECT event_type AS next_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev_type
       |  FROM events),
       | pr_c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
       |   FROM pr_l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       | pr_t AS (SELECT *,
       |    CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS tot
       |   FROM pr_c),
       | pr_s AS (SELECT DISTINCT state FROM (
       |   SELECT prev_type AS state FROM pr_c
       |   UNION ALL SELECT next_type FROM pr_c)),
       | pr_p0 AS (SELECT state,
       |    CAST(CASE WHEN state = 'purchase' THEN 1000000 ELSE 0 END
       |      AS BIGINT) AS p
       |   FROM pr_s),
       | $rounds
       |SELECT state AS event_type, p AS p5_micro FROM pr_p5
       |ORDER BY event_type""".stripMargin
  }

  /** q309: trailing 28-day revenue quantile bands — the q292 fan over
    * the day spine, house ceil-rank positions, partial leading
    * windows carried with their width. */
  private lazy val q309Sql: String =
    """WITH rb_d AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      | rb_f AS (SELECT day + CAST(off AS INTEGER) AS report_day, day, y
      |   FROM (SELECT day, y, unnest(range(0, 28)) AS off FROM rb_d)
      |   WHERE day + CAST(off AS INTEGER) <= (SELECT max(day) FROM rb_d)),
      | rb_r AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY report_day
      |      ORDER BY y ASC, day ASC) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY report_day) AS BIGINT) AS n
      |   FROM rb_f)
      |SELECT report_day, max(n) AS n_days,
      |  max(CASE WHEN rn = (10 * n + 99) // 100 THEN y END) AS p10_cents,
      |  max(CASE WHEN rn = (50 * n + 99) // 100 THEN y END) AS p50_cents,
      |  max(CASE WHEN rn = (90 * n + 99) // 100 THEN y END) AS p90_cents
      |FROM rb_r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q310: HHI market concentration per order year — floored micro
    * shares, Σs² on HUGEINT, effective nation count via one exact
    * division. */
  private lazy val q310Sql: String =
    """WITH mc_r AS (SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)
      |      AS yr, n_name,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      | mc_s AS (SELECT *,
      |    CAST(sum(rev) OVER (PARTITION BY yr) AS BIGINT) AS tot
      |   FROM mc_r),
      | mc_h AS (SELECT yr, CAST(count(*) AS BIGINT) AS n_nations,
      |    max(tot) AS revenue_cents,
      |    CAST(sum((CAST(rev AS HUGEINT) * 1000000 // tot)
      |        * (CAST(rev AS HUGEINT) * 1000000 // tot)) // 1000000
      |      AS BIGINT) AS hhi_micro
      |  FROM mc_s GROUP BY 1)
      |SELECT yr, n_nations, revenue_cents, hhi_micro,
      |  CAST(1000000000 // greatest(hhi_micro, 1) AS BIGINT)
      |    AS effective_nations_milli
      |FROM mc_h ORDER BY yr""".stripMargin

  /** q311: retention half-life — q74's curve collapsed to the global
    * offset series, log-grid integer OLS, t½ = ln2/(−slope) exact. */
  private lazy val q311Sql: String =
    """WITH rh_d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |   FROM events),
      | rh_c AS (SELECT user_id, day,
      |    min(day) OVER (PARTITION BY user_id) AS cohort_day FROM rh_d),
      | rh_n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
      |   FROM rh_d),
      | rh_o AS (SELECT DISTINCT user_id,
      |    CAST(date_diff('day', cohort_day, day) AS BIGINT) AS off
      |   FROM rh_c
      |   WHERE date_diff('day', cohort_day, day) BETWEEN 1 AND 30),
      | rh_r AS (SELECT off, CAST(count(*) AS BIGINT) AS n_active
      |   FROM rh_o GROUP BY 1),
      | rh_m AS (SELECT off,
      |    CAST(n_active * 1000000 // (SELECT nu FROM rh_n) AS BIGINT)
      |      AS rate
      |   FROM rh_r),
      | rh_l AS (SELECT off AS x,
      |    CAST(round(ln(CAST(rate AS DOUBLE) / 1000000.0) * 1000000, 0)
      |      AS BIGINT) AS lyu
      |   FROM rh_m WHERE rate > 0),
      | rh_f AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(lyu) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * lyu) AS sxy
      |   FROM rh_l),
      | rh_s AS (SELECT n,
      |    CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
      |      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
      |      AS BIGINT) AS slope
      |   FROM rh_f)
      |SELECT (SELECT nu FROM rh_n) AS n_users, n AS n_offsets,
      |  slope AS slope_micro,
      |  CASE WHEN slope < 0 THEN CAST(69314718 // -slope AS BIGINT) END
      |    AS half_life_days_centi
      |FROM rh_s""".stripMargin

  /** q312: global transitivity — 3·triangles over wedges, the q231
    * closure + one degree fold, exact micro ratio. */
  private lazy val q312Sql: String =
    s"""WITH $coPurchaseCtes,
       | tv_deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |     (SELECT pa AS node FROM cp_und UNION ALL SELECT pb FROM cp_und)
       |   GROUP BY 1),
       | tv_o AS (SELECT
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pa ELSE pb END AS src,
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pb ELSE pa END AS dst
       |   FROM cp_und JOIN tv_deg d1 ON pa = d1.node
       |   JOIN tv_deg d2 ON pb = d2.node),
       | tv_t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |   FROM tv_o e1 JOIN tv_o e2
       |     ON e1.src = e2.src AND e1.dst < e2.dst
       |   WHERE EXISTS (SELECT 1 FROM cp_und u
       |     WHERE u.pa = e1.dst AND u.pb = e2.dst)),
       | tv_w AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    sum(CAST(deg AS HUGEINT) * (deg - 1)) // 2 AS n_wedges
       |   FROM tv_deg)
       |SELECT n_nodes, CAST(n_wedges AS BIGINT) AS n_wedges,
       |  (SELECT n_triangles FROM tv_t) AS n_triangles,
       |  CAST(3 * CAST((SELECT n_triangles FROM tv_t) AS HUGEINT) * 1000000
       |    // greatest(n_wedges, 1) AS BIGINT) AS transitivity_micro
       |FROM tv_w""".stripMargin

  /** q289: degree histogram — bit-length log₂ buckets, top-down
    * cumulative CCDF. */
  private lazy val q289Sql: String =
    s"""WITH $coPurchaseCtes,
       | dg_d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |    (SELECT pa AS node FROM cp_und UNION ALL SELECT pb FROM cp_und)
       |   GROUP BY 1),
       | dg_b AS (SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_nodes FROM dg_d GROUP BY 1),
       | dg_c AS (SELECT *, CAST(sum(n_nodes) OVER () AS BIGINT) AS total,
       |    CAST(sum(n_nodes) OVER (ORDER BY bucket DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS at_or_above
       |  FROM dg_b)
       |SELECT bucket, CAST(1 AS BIGINT) << CAST(bucket AS INTEGER)
       |    AS lo_degree,
       |  n_nodes, CAST(at_or_above * 1000000 // total AS BIGINT)
       |    AS ccdf_micro
       |FROM dg_c""".stripMargin

  /** q290: Murphy decomposition — q212's tick/bin frame, floored bin
    * means, squares in the 10⁻⁸ grid on HUGEINT. */
  private lazy val q290Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | f AS (SELECT
       |    CAST(round(round(1.0 / (1.0 + exp(-cls.logit)), 4) * 10000)
       |      AS BIGINT) AS tick,
       |    CASE WHEN m.quality >= 0.66 THEN 1 ELSE 0 END AS o
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | b AS (SELECT least(tick // 1000, 9) AS bin,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(tick) AS BIGINT) AS st,
       |    CAST(sum(o) AS BIGINT) AS np,
       |    sum(CAST(tick - o * 10000 AS HUGEINT) * (tick - o * 10000))
       |      AS sd2
       |   FROM f GROUP BY 1),
       | g AS (SELECT n, sd2,
       |    CAST((SELECT sum(n) FROM b) AS BIGINT) AS n_total,
       |    st // n AS pbar,
       |    np * 10000 // n AS obar,
       |    CAST((SELECT sum(np) FROM b) * 10000 // (SELECT sum(n) FROM b)
       |      AS BIGINT) AS obase
       |   FROM b),
       | agg AS (SELECT max(n_total) AS n_docs,
       |    CAST(sum(sd2) // max(n_total) AS BIGINT) AS brier_e8,
       |    CAST(sum(n * CAST(pbar - obar AS HUGEINT) * (pbar - obar))
       |      // max(n_total) AS BIGINT) AS rel_e8,
       |    CAST(sum(n * CAST(obar - obase AS HUGEINT) * (obar - obase))
       |      // max(n_total) AS BIGINT) AS res_e8,
       |    CAST(max(obase) * (10000 - max(obase)) AS BIGINT) AS unc_e8
       |   FROM g)
       |SELECT n_docs, brier_e8, rel_e8, res_e8, unc_e8,
       |  CAST(brier_e8 - (rel_e8 - res_e8 + unc_e8) AS BIGINT)
       |    AS grid_residual_e8
       |FROM agg""".stripMargin

  /** q291: edge embeddedness — the q231 triangle census credited to
    * canonical edges, LEFT-joined back so support-0 bridges count. */
  private lazy val q291Sql: String =
    s"""WITH $coPurchaseCtes,
       | ee_deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |     (SELECT pa AS node FROM cp_und UNION ALL SELECT pb FROM cp_und)
       |   GROUP BY 1),
       | ee_o AS (SELECT
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pa ELSE pb END AS src,
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pb ELSE pa END AS dst
       |   FROM cp_und JOIN ee_deg d1 ON pa = d1.node
       |   JOIN ee_deg d2 ON pb = d2.node),
       | ee_t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |   FROM ee_o e1 JOIN ee_o e2
       |     ON e1.src = e2.src AND e1.dst < e2.dst
       |   WHERE EXISTS (SELECT 1 FROM cp_und u
       |     WHERE u.pa = e1.dst AND u.pb = e2.dst)),
       | ee_s AS (SELECT pa, pb, CAST(count(*) AS BIGINT) AS support FROM
       |     (SELECT least(a, b) AS pa, greatest(a, b) AS pb FROM ee_t
       |      UNION ALL SELECT least(a, c), greatest(a, c) FROM ee_t
       |      UNION ALL SELECT least(b, c), greatest(b, c) FROM ee_t)
       |   GROUP BY 1, 2),
       | ee_e AS (SELECT coalesce(s.support, 0) AS support
       |   FROM cp_und e LEFT JOIN ee_s s ON e.pa = s.pa AND e.pb = s.pb),
       | ee_h AS (SELECT support, CAST(count(*) AS BIGINT) AS n_edges
       |   FROM ee_e GROUP BY 1)
       |SELECT support, n_edges,
       |  CAST(n_edges * 1000000 // (SELECT sum(n_edges) FROM ee_h)
       |    AS BIGINT) AS share_micro,
       |  support = 0 AS is_local_bridge
       |FROM ee_h""".stripMargin

  /** q292: rolling WAU — q151's register scheme fanned over the 7
    * report days it covers (q187's idiom), re-maxed per report day;
    * the exact twin rides the same fan over the presence frame. */
  private lazy val q292Sql: String = {
    val m = graft.operators.Sketches.HllRegisters
    val rb = graft.operators.Sketches.HllRegisterBits
    val w1 = graft.operators.Sketches.HllRestBits + 1
    s"""WITH u AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
       | h AS (SELECT day, user_id,
       |    CAST('0x' || substr(md5('dau-' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
       |      AS h FROM u),
       | rr AS (SELECT day, h % $m AS reg,
       |    CASE WHEN (h >> $rb) = 0 THEN $w1
       |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
       | daily AS (SELECT day, reg, max(rho) AS mrho FROM rr GROUP BY day, reg),
       | fan AS (SELECT day + CAST(off AS INTEGER) AS report_day, reg, mrho
       |   FROM (SELECT day, reg, mrho, unnest(range(0, 7)) AS off FROM daily)),
       | rm AS (SELECT report_day, reg, max(mrho) AS mrho
       |   FROM fan GROUP BY 1, 2),
       | s AS (SELECT report_day, CAST(count(*) AS BIGINT) AS m_hit,
       |    CAST(sum(CAST(1 AS BIGINT) << (53 - mrho)) AS BIGINT) AS sumpow
       |   FROM rm GROUP BY 1),
       | e AS (SELECT report_day, m_hit, $m - m_hit AS zeros,
       |    sumpow + ($m - m_hit) * (CAST(1 AS BIGINT) << 53) AS raw FROM s),
       | est AS (SELECT report_day, m_hit,
       |    CASE WHEN zeros > 0
       |           AND ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) <= ${2.5 * m}
       |      THEN ${m.toDouble} * ln(${m.toDouble} / zeros)
       |      ELSE ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) END AS est
       |   FROM e),
       | presence AS (SELECT DISTINCT user_id, day FROM u),
       | exfan AS (SELECT user_id, day + CAST(off AS INTEGER) AS report_day
       |   FROM (SELECT user_id, day, unnest(range(0, 7)) AS off FROM presence)),
       | ex AS (SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT)
       |     AS true_wau
       |   FROM exfan GROUP BY 1)
       |SELECT report_day, m_hit, round(est, 2) AS est_wau, true_wau
       |FROM est JOIN ex USING (report_day)
       |WHERE report_day <= (SELECT max(day) FROM u)""".stripMargin
  }

  /** q293: permutation test — per-user conversion, B md5 relabelings,
    * floored micro rates, add-one p. */
  private lazy val q293Sql: String = {
    val b = 200
    s"""WITH pt_u AS (SELECT user_id,
       |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS converted
       |   FROM events GROUP BY 1),
       | pt_obs AS (SELECT
       |    CAST(count(*) AS BIGINT) AS n_users,
       |    abs(CAST(sum(CASE WHEN arm_a THEN converted ELSE 0 END) AS HUGEINT)
       |        * 1000000
       |        // greatest(sum(CASE WHEN arm_a THEN 1 ELSE 0 END), 1)
       |      - CAST(sum(CASE WHEN arm_a THEN 0 ELSE converted END) AS HUGEINT)
       |        * 1000000
       |        // greatest(sum(CASE WHEN arm_a THEN 0 ELSE 1 END), 1))
       |      AS obs_diff
       |   FROM (SELECT converted,
       |      CAST('0x' || substr(md5('ab-' || CAST(user_id AS VARCHAR)), 1, 15)
       |        AS BIGINT) % 2 = 0 AS arm_a
       |     FROM pt_u)),
       | pt_p AS (SELECT b,
       |    abs(CAST(sum(CASE WHEN arm_a THEN converted ELSE 0 END) AS HUGEINT)
       |        * 1000000
       |        // greatest(sum(CASE WHEN arm_a THEN 1 ELSE 0 END), 1)
       |      - CAST(sum(CASE WHEN arm_a THEN 0 ELSE converted END) AS HUGEINT)
       |        * 1000000
       |        // greatest(sum(CASE WHEN arm_a THEN 0 ELSE 1 END), 1))
       |      AS diff
       |   FROM (SELECT u.converted, f.b,
       |      CAST('0x' || substr(md5('perm-' || CAST(f.b AS VARCHAR) || '-'
       |          || CAST(u.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
       |        AS arm_a
       |     FROM pt_u u, (SELECT unnest(range(1, ${b + 1})) AS b) f)
       |   GROUP BY 1)
       |SELECT (SELECT n_users FROM pt_obs) AS n_users,
       |  CAST(count(*) AS BIGINT) AS b_perms,
       |  CAST((SELECT obs_diff FROM pt_obs) AS BIGINT) AS obs_diff_micro,
       |  CAST(sum(CASE WHEN diff >= (SELECT obs_diff FROM pt_obs)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       |  CAST((1 + sum(CASE WHEN diff >= (SELECT obs_diff FROM pt_obs)
       |      THEN 1 ELSE 0 END)) * 1000000 // (count(*) + 1) AS BIGINT)
       |    AS p_micro
       |FROM pt_p""".stripMargin
  }

  /** q294: rich club — min-endpoint-degree edge census, the bounded
    * power-of-two ladder exploded over both spines. */
  private lazy val q294Sql: String =
    s"""WITH $coPurchaseCtes,
       | rc_deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |     (SELECT pa AS node FROM cp_und UNION ALL SELECT pb FROM cp_und)
       |   GROUP BY 1),
       | rc_n AS (SELECT t, CAST(sum(n) AS BIGINT) AS n_rich FROM
       |     (SELECT n, unnest(list_filter(
       |        [1, 2, 4, 8, 16, 32, 64, 128, 256], t -> t < deg)) AS t
       |      FROM (SELECT deg, CAST(count(*) AS BIGINT) AS n
       |            FROM rc_deg GROUP BY 1))
       |   GROUP BY 1),
       | rc_e AS (SELECT t, CAST(sum(e) AS BIGINT) AS e_rich FROM
       |     (SELECT e, unnest(list_filter(
       |        [1, 2, 4, 8, 16, 32, 64, 128, 256], t -> t < m)) AS t
       |      FROM (SELECT least(d1.deg, d2.deg) AS m,
       |              CAST(count(*) AS BIGINT) AS e
       |            FROM cp_und JOIN rc_deg d1 ON pa = d1.node
       |            JOIN rc_deg d2 ON pb = d2.node
       |            GROUP BY 1))
       |   GROUP BY 1)
       |SELECT CAST(rc_n.t AS BIGINT) AS threshold, n_rich,
       |  CAST(coalesce(e_rich, 0) AS BIGINT) AS e_rich,
       |  CASE WHEN n_rich >= 2 THEN
       |    CAST(2 * CAST(coalesce(e_rich, 0) AS HUGEINT) * 1000000
       |      // (n_rich * (n_rich - 1)) AS BIGINT) END AS phi_micro
       |FROM rc_n LEFT JOIN rc_e ON rc_n.t = rc_e.t""".stripMargin

  /** q295: seasonality/trend strength — q273's decomposition as a CTE,
    * dollar-grid moments on HUGEINT, one exact integer division. */
  private lazy val q295Sql: String =
    s"""WITH stl AS (
       |$q273Sql
       |),
       | ss_p AS (SELECT residual_cents // 100 AS r,
       |    (seasonal_cents + residual_cents) // 100 AS sr,
       |    (trend_cents + residual_cents) // 100 AS tr
       |   FROM stl),
       | ss_m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(r) AS BIGINT) AS s_r,
       |    sum(CAST(r AS HUGEINT) * r) AS q_r,
       |    CAST(sum(sr) AS BIGINT) AS s_sr,
       |    sum(CAST(sr AS HUGEINT) * sr) AS q_sr,
       |    CAST(sum(tr) AS BIGINT) AS s_tr,
       |    sum(CAST(tr AS HUGEINT) * tr) AS q_tr
       |   FROM ss_p)
       |SELECT n AS n_days,
       |  greatest(CAST(0 AS BIGINT),
       |    1000000 - CAST((n * q_r - CAST(s_r AS HUGEINT) * s_r) * 1000000
       |      // greatest(n * q_sr - CAST(s_sr AS HUGEINT) * s_sr, 1)
       |      AS BIGINT)) AS f_seasonal_micro,
       |  greatest(CAST(0 AS BIGINT),
       |    1000000 - CAST((n * q_r - CAST(s_r AS HUGEINT) * s_r) * 1000000
       |      // greatest(n * q_tr - CAST(s_tr AS HUGEINT) * s_tr, 1)
       |      AS BIGINT)) AS f_trend_micro
       |FROM ss_m""".stripMargin

  /** The dhash60 replay (shared by q118/q271/q276): q47's frame grid
    * at the given stride, each frame's chars folded into 61
    * equal-measure cell sums (cell of byte p = p·61 // L — the
    * integer partition the Scala kernel walks; the corpus is ASCII so
    * `ord` per char ≡ the kernel's unsigned byte), one gradient bit
    * per adjacent cell pair, summed as shifted BIGINT weights. */
  private def dhashCtes(stride: Int): String =
    s"""dh_f AS (SELECT doc_id AS media_id, text,
       |    CAST(ceil(length(text) / 256.0) AS INTEGER) AS nf FROM documents),
       | dh_e AS (SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |    substring(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256) AS fr
       |   FROM (SELECT media_id, text, unnest(range(0, nf)) AS frame_idx
       |         FROM dh_f)
       |   WHERE frame_idx % $stride = 0),
       | dh_p AS (SELECT media_id, frame_idx, fr, length(fr) AS l,
       |    unnest(range(0, length(fr))) AS p FROM dh_e),
       | dh_cs AS (SELECT media_id, frame_idx, (p * 61) // l AS c,
       |    CAST(sum(ord(substr(fr, CAST(p + 1 AS INTEGER), 1))) AS BIGINT) AS s
       |   FROM dh_p GROUP BY 1, 2, 3),
       | dh_sp AS (SELECT media_id, frame_idx, unnest(range(0, 61)) AS c
       |   FROM dh_e),
       | dh_cell AS (SELECT media_id, frame_idx, c, coalesce(s, 0) AS s
       |   FROM dh_sp LEFT JOIN dh_cs USING (media_id, frame_idx, c)),
       | dh_b AS (SELECT media_id, frame_idx, c, s,
       |    lead(s) OVER (PARTITION BY media_id, frame_idx ORDER BY c) AS s2
       |   FROM dh_cell),
       | dh AS (SELECT media_id, frame_idx,
       |    CAST(sum(CASE WHEN s2 > s
       |      THEN CAST(1 AS BIGINT) << CAST(c AS INTEGER) ELSE 0 END)
       |      AS BIGINT) AS frame_dhash
       |   FROM dh_b GROUP BY 1, 2)""".stripMargin

  /** q271: the scene-segmentation replay — the dhash60 frame
    * signatures at stride 1, Hamming-thresholded lag-compare cuts
    * (>16 of 60 gradient bits = a content change), prefix-sum runs. */
  private lazy val q271Sql: String =
    s"""WITH ${dhashCtes(1)},
      | sc_d AS (SELECT media_id, frame_idx,
      |    bit_count(xor(frame_dhash, lag(frame_dhash) OVER w)) AS db
      |   FROM dh WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
      | sc_c AS (SELECT media_id, frame_idx,
      |    CASE WHEN db IS NULL OR db > 16 THEN 1 ELSE 0 END AS cut
      |   FROM sc_d),
      | sc_s AS (SELECT media_id, sum(cut) OVER
      |    (PARTITION BY media_id ORDER BY frame_idx) AS scene_seq
      |   FROM sc_c),
      | sc_r AS (SELECT media_id, scene_seq,
      |    CAST(count(*) AS BIGINT) AS run_len
      |   FROM sc_s GROUP BY 1, 2)
      |SELECT media_id, CAST(sum(run_len) AS BIGINT) AS n_frames,
      |  CAST(count(*) AS BIGINT) AS n_scenes,
      |  CAST(max(run_len) AS BIGINT) AS longest_scene,
      |  CASE WHEN sum(run_len) > 1
      |    THEN CAST((count(*) - 1) * 1000000 // (sum(run_len) - 1) AS BIGINT)
      |  END AS cut_density_micro
      |FROM sc_r GROUP BY 1 ORDER BY media_id""".stripMargin

  /** q313: scene-length distribution per source — q271's runs joined
    * to the source dim, house ceil-rank percentiles. */
  private lazy val q313Sql: String =
    s"""WITH ${dhashCtes(1)},
      | sl_d AS (SELECT media_id, frame_idx,
      |    bit_count(xor(frame_dhash, lag(frame_dhash) OVER w)) AS db
      |   FROM dh WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
      | sl_c AS (SELECT media_id, frame_idx,
      |    CASE WHEN db IS NULL OR db > 16 THEN 1 ELSE 0 END AS cut
      |   FROM sl_d),
      | sl_s AS (SELECT media_id, sum(cut) OVER
      |    (PARTITION BY media_id ORDER BY frame_idx) AS scene_seq
      |   FROM sl_c),
      | sl_r AS (SELECT media_id, scene_seq,
      |    CAST(count(*) AS BIGINT) AS run_len
      |   FROM sl_s GROUP BY 1, 2),
      | sl_j AS (SELECT r.*, d.source FROM sl_r r
      |   JOIN documents d ON r.media_id = d.doc_id),
      | sl_w AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY run_len ASC, media_id ASC, scene_seq ASC) AS BIGINT)
      |      AS rn,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
      |   FROM sl_j)
      |SELECT source, max(n) AS n_scenes,
      |  max(CASE WHEN rn = (50 * n + 99) // 100 THEN run_len END)
      |    AS p50_len,
      |  max(CASE WHEN rn = (90 * n + 99) // 100 THEN run_len END)
      |    AS p90_len,
      |  max(run_len) AS max_len
      |FROM sl_w GROUP BY 1 ORDER BY source""".stripMargin

  /** q316: Kendall concordance between early- and late-period nation
    * revenue — sign comparisons only; τ-a truncates toward zero on
    * both engines (the CASE split mirrors Spark's `div`, DuckDB's
    * `//` floors negatives). */
  private lazy val q316Sql: String =
    """WITH kc_r AS (SELECT n_name,
      |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      | kc_m AS (SELECT (min(yr) + max(yr)) // 2 AS midyr FROM kc_r),
      | kc_g AS (SELECT n_name,
      |    CAST(sum(CASE WHEN yr <= midyr THEN cents ELSE 0 END) AS BIGINT)
      |      AS x,
      |    CAST(sum(CASE WHEN yr > midyr THEN cents ELSE 0 END) AS BIGINT)
      |      AS y
      |  FROM kc_r, kc_m GROUP BY 1),
      | kc_p AS (SELECT
      |    CASE WHEN (a.x > b.x AND a.y > b.y) OR (a.x < b.x AND a.y < b.y)
      |      THEN 1 ELSE 0 END AS c,
      |    CASE WHEN (a.x > b.x AND a.y < b.y) OR (a.x < b.x AND a.y > b.y)
      |      THEN 1 ELSE 0 END AS d
      |  FROM kc_g a JOIN kc_g b ON a.n_name < b.n_name),
      | kc_s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(c) AS BIGINT) AS concordant,
      |    CAST(sum(d) AS BIGINT) AS discordant FROM kc_p)
      |SELECT n_pairs, concordant, discordant,
      |  n_pairs - concordant - discordant AS ties,
      |  CAST(CASE WHEN concordant >= discordant
      |    THEN (concordant - discordant) * 1000000 // n_pairs
      |    ELSE -((discordant - concordant) * 1000000 // n_pairs)
      |  END AS BIGINT) AS tau_a_micro
      |FROM kc_s""".stripMargin

  /** q317: Lorenz deciles of customer revenue — ntile over the exact
    * (cents, key) order, floored-micro cumulative shares. */
  private lazy val q317Sql: String =
    """WITH lz_c AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      | lz_n AS (SELECT *, ntile(10) OVER
      |    (ORDER BY cents ASC, o_custkey ASC) AS decile FROM lz_c),
      | lz_g AS (SELECT CAST(decile AS BIGINT) AS decile,
      |    CAST(count(*) AS BIGINT) AS n_customers,
      |    CAST(sum(cents) AS BIGINT) AS decile_cents
      |  FROM lz_n GROUP BY 1),
      | lz_w AS (SELECT *, CAST(sum(decile_cents) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_cents FROM lz_g)
      |SELECT decile, n_customers, decile_cents, cum_cents,
      |  CAST(CAST(cum_cents AS HUGEINT) * 1000000
      |    // (max(cum_cents) OVER ()) AS BIGINT) AS cum_share_micro
      |FROM lz_w ORDER BY decile""".stripMargin

  /** q276: the signature-table replay — dhash60 per sampled frame
    * plus the Hamming delta to the previous frame of the medium. */
  private lazy val q276Sql: String =
    s"""WITH ${dhashCtes(4)}
      |SELECT media_id, frame_idx, frame_dhash,
      |  CAST(bit_count(xor(frame_dhash, lag(frame_dhash) OVER
      |    (PARTITION BY media_id ORDER BY frame_idx))) AS BIGINT)
      |    AS delta_bits
      |FROM dh""".stripMargin

  /** q275: the backtest replay — the q264 RECURSIVE walk widened to
    * carry the two absolute-error accumulators and yesterday's value. */
  private lazy val q275Sql: String =
    """WITH RECURSIVE hb_daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |   FROM orders GROUP BY 1),
      | hb_idx AS (SELECT row_number() OVER (ORDER BY d) AS i, cents
      |   FROM hb_daily),
      | hb_n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM hb_idx),
      | hb_st(i, lv, tr, he, ne, px) AS (
      |   SELECT CAST(1 AS BIGINT), cents, CAST(0 AS BIGINT),
      |     CAST(0 AS BIGINT), CAST(0 AS BIGINT), cents
      |   FROM hb_idx WHERE i = 1
      |   UNION ALL
      |   SELECT i, (x + 3 * (plv + ptr)) // 4,
      |     ((x + 3 * (plv + ptr)) // 4 - plv + 3 * ptr) // 4,
      |     he + abs(x - (plv + ptr)), ne + abs(x - px), x
      |   FROM (SELECT st.i + 1 AS i, d.cents AS x, st.lv AS plv,
      |       st.tr AS ptr, st.he, st.ne, st.px
      |     FROM hb_st st JOIN hb_idx d ON d.i = st.i + 1)),
      | hb_fin AS (SELECT * FROM hb_st ORDER BY i DESC LIMIT 1)
      |SELECT (SELECT n_days FROM hb_n) AS n_days,
      |  CAST(he // ((SELECT n_days FROM hb_n) - 1) AS BIGINT)
      |    AS holt_mae_cents,
      |  CAST(ne // ((SELECT n_days FROM hb_n) - 1) AS BIGINT)
      |    AS naive_mae_cents,
      |  CAST((ne - he) * 1000000 // greatest(ne, 1) AS BIGINT)
      |    AS skill_micro
      |FROM hb_fin WHERE (SELECT n_days FROM hb_n) > 1""".stripMargin

  /** q262: the randomized-response replay — md5-grid keep/replace
    * draws, the j ≥ own → j+1 skip, closed-form debias
    * (96·c − n)/71 clamped at 0 (the clamp doubles as the
    * truncate-vs-floor determinism guard). */
  private lazy val q262Sql: String =
    """WITH rrc AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nat
      |   FROM customer),
      | rrn AS (SELECT CASE WHEN CAST('0x' || substr(md5('rr-'
      |      || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
      |      % 1000000 < 750000 THEN nat
      |    ELSE CASE WHEN CAST('0x' || substr(md5('rr2-'
      |        || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 24 >= nat
      |      THEN CAST('0x' || substr(md5('rr2-'
      |        || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 24 + 1
      |      ELSE CAST('0x' || substr(md5('rr2-'
      |        || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 24 END
      |    END AS nat FROM rrc),
      | rro AS (SELECT nat, CAST(count(*) AS BIGINT) AS n_obs
      |   FROM rrn GROUP BY 1),
      | rrt AS (SELECT nat, CAST(count(*) AS BIGINT) AS n_true
      |   FROM rrc GROUP BY 1),
      | rrj AS (SELECT coalesce(t.nat, o.nat) AS nationkey,
      |    coalesce(n_true, 0) AS n_true, coalesce(n_obs, 0) AS n_obs
      |   FROM rrt t FULL JOIN rro o ON t.nat = o.nat),
      | rrtot AS (SELECT CAST(sum(n_true) AS HUGEINT) AS n_total FROM rrj)
      |SELECT nationkey, n_true, n_obs,
      |  CAST(greatest(96 * CAST(n_obs AS HUGEINT)
      |      - (SELECT n_total FROM rrtot), 0) // 71 AS BIGINT) AS n_est,
      |  CAST(abs(CAST(greatest(96 * CAST(n_obs AS HUGEINT)
      |      - (SELECT n_total FROM rrtot), 0) // 71 AS BIGINT) - n_true)
      |    AS BIGINT) AS abs_err
      |FROM rrj ORDER BY nationkey""".stripMargin

  /** q248: unrolled BFS rounds — each round's new frontier is the
    * neighbor set minus everything already reached. */
  private lazy val q248Sql: String = {
    val maxHops = 4
    val rounds = (1 to maxHops).map { k =>
      s"""bn$k AS (SELECT DISTINCT e.dst AS part
         |  FROM bb${k - 1} b JOIN bf_edges e ON b.part = e.src
         |  WHERE e.dst NOT IN (SELECT part FROM bb${k - 1})),
         | bb$k AS (SELECT part, hops FROM bb${k - 1}
         |  UNION ALL SELECT part, CAST($k AS BIGINT) FROM bn$k)""".stripMargin
    }.mkString(",\n ")
    s"""WITH $coPurchaseCtes,
       | bf_edges AS (SELECT pa AS src, pb AS dst FROM cp_und
       |   UNION ALL SELECT pb, pa FROM cp_und),
       | bf_seeds AS (SELECT src AS part
       |   FROM (SELECT DISTINCT src FROM bf_edges) ORDER BY src ASC LIMIT 3),
       | bb0 AS (SELECT part, CAST(0 AS BIGINT) AS hops FROM bf_seeds),
       | $rounds
       |SELECT part, hops FROM bb$maxHops""".stripMargin
  }

  /** q249: unrolled peel rounds — degrees over the surviving edges,
    * sub-k nodes (and their edges) deleted, census per round.
    * MATERIALIZED: each round's edge list is referenced by the next
    * round's degree CTE, both semi-filters, and the census row. */
  private lazy val q249Sql: String = {
    val (k, rounds) = (100, 5)
    val peels = (1 to rounds).map { r =>
      s"""kd$r AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
         |   FROM (SELECT pa AS node FROM ke${r - 1}
         |         UNION ALL SELECT pb FROM ke${r - 1}) GROUP BY 1),
         | ks$r AS MATERIALIZED (SELECT node FROM kd$r WHERE deg >= $k),
         | ke$r AS MATERIALIZED (SELECT pa, pb FROM ke${r - 1}
         |   WHERE pa IN (SELECT node FROM ks$r)
         |     AND pb IN (SELECT node FROM ks$r))""".stripMargin
    }.mkString(",\n ")
    val rows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ks$r) AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ke$r) AS n_edges""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $coPurchaseCtes,
       | ke0 AS MATERIALIZED (SELECT pa, pb FROM cp_und),
       | $peels
       |$rows""".stripMargin
  }

  /** q244: the two-arm experiment readout — hash arms, purchase
    * conversion, Wald interval and 2×2 χ² from exact integer counts
    * with one double op order per side. */
  private lazy val q244Sql: String =
    """WITH u AS (SELECT user_id,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS converted,
      |    CAST('0x' || substr(md5('ab-' || CAST(user_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 2 = 0 AS is_a
      |  FROM events GROUP BY user_id),
      | m AS (SELECT
      |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN is_a THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN NOT is_a THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM u),
      | v AS (SELECT *,
      |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
      |    CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
      |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
      |    CAST(conv_a AS DOUBLE) AS cad, CAST(conv_b AS DOUBLE) AS cbd
      |  FROM m),
      | w AS (SELECT *, pa - pb AS d,
      |    sqrt(pa * (1.0 - pa) / nad + pb * (1.0 - pb) / nbd) AS se,
      |    (nad + nbd) * (cad * (nbd - cbd) - cbd * (nad - cad))
      |      * (cad * (nbd - cbd) - cbd * (nad - cad)) AS chi_num,
      |    (cad + cbd) * ((nad + nbd) - cad - cbd) * nad * nbd AS chi_den
      |  FROM v)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  CAST(CAST(conv_a AS HUGEINT) * 1000000 // n_a AS BIGINT) AS rate_a_micro,
      |  CAST(CAST(conv_b AS HUGEINT) * 1000000 // n_b AS BIGINT) AS rate_b_micro,
      |  CAST(round(round(d, 6) * 1000000, 0) AS BIGINT) AS diff_micro,
      |  CAST(round(round(d - 1.959964 * se, 6) * 1000000, 0) AS BIGINT)
      |    AS ci_lo_micro,
      |  CAST(round(round(d + 1.959964 * se, 6) * 1000000, 0) AS BIGINT)
      |    AS ci_hi_micro,
      |  CASE WHEN chi_den > 0 THEN
      |    CAST(round(round(chi_num / chi_den, 6) * 1000, 0) AS BIGINT)
      |  END AS chi2_milli
      |FROM w""".stripMargin

  /** q243: Markov next-event accuracy@k on held-out users — q88's lag
    * window per split, train-count ranking, the q242 metric fold. */
  private lazy val q243Sql: String =
    """WITH ev AS (SELECT user_id, event_id, ts, event_type,
      |    CAST('0x' || substr(md5('mkv-' || CAST(user_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 10 AS split
      |  FROM events),
      | tr AS (SELECT event_type AS next_type, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM ev WHERE split < 8),
      | rk AS (SELECT prev_type, next_type, row_number() OVER
      |    (PARTITION BY prev_type ORDER BY n DESC, next_type ASC) AS rnk
      |  FROM (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |    FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)),
      | te AS (SELECT event_type AS next_type, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM ev WHERE split >= 8),
      | j AS (SELECT rnk FROM te LEFT JOIN rk USING (prev_type, next_type)
      |  WHERE te.prev_type IS NOT NULL),
      | ks AS (SELECT unnest([1, 2, 3]) AS k)
      |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_cases,
      |  CAST(sum(CASE WHEN rnk IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hits,
      |  CAST(CAST(sum(CASE WHEN rnk IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END)
      |    AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS accuracy_micro
      |FROM j CROSS JOIN ks GROUP BY k""".stripMargin

  /** q236: personalized PageRank, five unrolled rounds — per-edge
    * damped contributions unioned with the 3-row seed teleport
    * re-injection, seeds excluded from the final ranking. */
  private lazy val q236Sql: String = {
    val iters = (1 to 5).map { i =>
      s"""pp$i AS (SELECT part, CAST(sum(c) AS BIGINT) AS r FROM (
         |    SELECT e.dst AS part,
         |      85 * (CAST(r.r AS HUGEINT) * e.w // e.outw) // 100 AS c
         |    FROM pp${i - 1} r JOIN pp_ew e ON r.part = e.src
         |    UNION ALL
         |    SELECT node AS part,
         |      (SELECT (15 * (1000000000000 // ns)) // 100 FROM pp_ns) AS c
         |    FROM pp_seeds) GROUP BY part)""".stripMargin
    }.mkString(",\n ")
    s"""WITH $coPurchaseCtes,
       | pp_edges AS (SELECT pa AS src, pb AS dst, w FROM cp_und
       |   UNION ALL SELECT pb, pa, w FROM cp_und),
       | pp_ew AS (SELECT src, dst, w,
       |     CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS outw
       |   FROM pp_edges),
       | pp_seeds AS (SELECT src AS node FROM
       |     (SELECT DISTINCT src FROM pp_ew) ORDER BY src ASC LIMIT 3),
       | pp_ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM pp_seeds),
       | pp0 AS (SELECT node AS part,
       |     (SELECT CAST(1000000000000 // ns AS BIGINT) FROM pp_ns) AS r
       |   FROM pp_seeds),
       | $iters
       |SELECT row_number() OVER (ORDER BY r DESC, part ASC) AS rank,
       |  part, r AS score_pico
       |FROM pp5 WHERE part NOT IN (SELECT node FROM pp_seeds)
       |ORDER BY score_pico DESC, part ASC LIMIT 25""".stripMargin
  }

  /** q235: four unrolled synchronous label-propagation rounds — each
    * round one (dst, lbl) vote aggregate + per-node argmax window,
    * ties to the smallest label (the determinism contract). */
  /** The synchronous-LPA rounds (l0..l4 over lp_edges) shared by the
    * q235 size table and the q267 modularity readout. */
  /** The fixed-round LPA replay over an arbitrary undirected-edge CTE
    * — parameterized names so q278 can run it once per time half
    * beside the canonical `cp_und` instance. */
  private def lpaCtesOn(und: String, edges: String, lp: String): String = {
    val rounds = (1 to 4).map { i =>
      s"""$lp$i AS (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |      ORDER BY votes DESC, lbl ASC) AS rnk
         |  FROM (SELECT e.dst AS node, l.lbl, CAST(sum(e.w) AS BIGINT) AS votes
         |    FROM $lp${i - 1} l JOIN $edges e ON l.node = e.src
         |    GROUP BY e.dst, l.lbl)) WHERE rnk = 1)""".stripMargin
    }.mkString(",\n ")
    s"""$edges AS (SELECT pa AS src, pb AS dst, w FROM $und
       |   UNION ALL SELECT pb, pa, w FROM $und),
       | ${lp}0 AS (SELECT DISTINCT src AS node, src AS lbl FROM $edges),
       | $rounds""".stripMargin
  }

  private lazy val lpaCtes: String = lpaCtesOn("cp_und", "lp_edges", "l")

  private lazy val q235Sql: String =
    s"""WITH $coPurchaseCtes,
       | $lpaCtes
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
       |  min(node) AS min_member
       |FROM l4 GROUP BY lbl
       |ORDER BY n_members DESC, community ASC LIMIT 25""".stripMargin

  /** q267: per-community Newman modularity contribution off the l4
    * labels — (in_c·2m − tot_c²)·10⁶ // (2m)², all HUGEINT. */
  private lazy val q267Sql: String =
    s"""WITH $coPurchaseCtes,
       | $lpaCtes,
       | md_m2 AS (SELECT CAST(sum(w) AS HUGEINT) AS m2 FROM lp_edges),
       | md_tot AS (SELECT lbl, CAST(sum(wdeg) AS BIGINT) AS tot_w,
       |    CAST(count(*) AS BIGINT) AS n_members
       |   FROM (SELECT src AS node, CAST(sum(w) AS BIGINT) AS wdeg
       |      FROM lp_edges GROUP BY 1) JOIN l4 USING (node)
       |   GROUP BY 1),
       | md_in AS (SELECT la.lbl, CAST(sum(e.w) AS BIGINT) AS in_w
       |   FROM lp_edges e JOIN l4 la ON e.src = la.node
       |   JOIN l4 lb ON e.dst = lb.node
       |   WHERE la.lbl = lb.lbl GROUP BY 1)
       |SELECT lbl AS community, n_members,
       |  coalesce(in_w, 0) AS in_w, tot_w,
       |  CAST((CAST(coalesce(in_w, 0) AS HUGEINT) * (SELECT m2 FROM md_m2)
       |      - CAST(tot_w AS HUGEINT) * tot_w) * 1000000
       |    // ((SELECT m2 FROM md_m2) * (SELECT m2 FROM md_m2))
       |    AS BIGINT) AS contrib_micro
       |FROM md_tot LEFT JOIN md_in USING (lbl)
       |ORDER BY n_members DESC, community ASC LIMIT 25""".stripMargin

  /** q231: degree-ordered wedge closure — each triangle found once
    * from its orientation-smallest corner, credited to all three. */
  private lazy val q231Sql: String =
    s"""WITH $coPurchaseCtes,
       | tr_deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |     (SELECT pa AS node FROM cp_und UNION ALL SELECT pb FROM cp_und)
       |   GROUP BY 1),
       | tr_o AS (SELECT
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pa ELSE pb END AS src,
       |     CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND pa < pb)
       |       THEN pb ELSE pa END AS dst
       |   FROM cp_und JOIN tr_deg d1 ON pa = d1.node
       |   JOIN tr_deg d2 ON pb = d2.node),
       | tr_tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |   FROM tr_o e1 JOIN tr_o e2
       |     ON e1.src = e2.src AND e1.dst < e2.dst
       |   WHERE EXISTS (SELECT 1 FROM cp_und u
       |     WHERE u.pa = e1.dst AND u.pb = e2.dst)),
       | tr_pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM
       |     (SELECT a AS node FROM tr_tri UNION ALL SELECT b FROM tr_tri
       |      UNION ALL SELECT c FROM tr_tri) GROUP BY 1)
       |SELECT node AS part, deg, n_triangles,
       |  CAST(2 * CAST(n_triangles AS HUGEINT) * 1000000
       |    // (deg * (deg - 1)) AS BIGINT) AS clustering_micro
       |FROM tr_pn JOIN tr_deg USING (node)
       |ORDER BY n_triangles DESC, part ASC LIMIT 25""".stripMargin

  /** q232: ordinal EMD per (nation, segment) group — both cumulative
    * walks on the dense band spine, each side scaled by its own total
    * in integer micro. */
  private lazy val q232Sql: String =
    """WITH tc_b AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band FROM customer),
      | tc_mm AS (SELECT CAST(min(band) AS BIGINT) AS lo,
      |     CAST(max(band) AS BIGINT) AS hi FROM tc_b),
      | tc_counts AS (SELECT c_nationkey, c_mktsegment, band,
      |     CAST(count(*) AS BIGINT) AS cnt
      |   FROM tc_b GROUP BY 1, 2, 3),
      | tc_groups AS (SELECT c_nationkey, c_mktsegment,
      |     CAST(sum(cnt) AS BIGINT) AS group_size
      |   FROM tc_counts GROUP BY 1, 2),
      | tc_bands AS (SELECT CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS band
      |   FROM tc_mm),
      | tc_gl AS (SELECT b.band,
      |     CAST(coalesce(sum(cnt), 0) AS BIGINT) AS gcnt
      |   FROM tc_bands b LEFT JOIN tc_counts c ON b.band = c.band
      |   GROUP BY 1),
      | tc_glc AS (SELECT band,
      |     CAST(CAST(sum(gcnt) OVER (ORDER BY band) AS HUGEINT) * 1000000
      |       // (SELECT sum(gcnt) FROM tc_gl) AS BIGINT) AS cum_q_micro
      |   FROM tc_gl),
      | tc_spine AS (SELECT g.c_nationkey, g.c_mktsegment, g.group_size, b.band
      |   FROM tc_groups g CROSS JOIN tc_bands b),
      | tc_walk AS (SELECT s.c_nationkey, s.c_mktsegment, s.group_size, s.band,
      |     CAST(sum(coalesce(c.cnt, 0)) OVER (
      |       PARTITION BY s.c_nationkey, s.c_mktsegment ORDER BY s.band)
      |       AS BIGINT) AS cum_p
      |   FROM tc_spine s LEFT JOIN tc_counts c
      |     ON s.c_nationkey = c.c_nationkey
      |     AND s.c_mktsegment = c.c_mktsegment AND s.band = c.band),
      | tc_steps AS (SELECT w.c_nationkey, w.c_mktsegment, w.group_size,
      |     abs(CAST(CAST(cum_p AS HUGEINT) * 1000000 // group_size AS BIGINT)
      |       - cum_q_micro) AS step
      |   FROM tc_walk w JOIN tc_glc USING (band))
      |SELECT c_nationkey, c_mktsegment, group_size,
      |  CAST(sum(step) // (SELECT greatest(hi - lo, 1) FROM tc_mm) AS BIGINT)
      |    AS emd_micro,
      |  CAST(sum(step) // (SELECT greatest(hi - lo, 1) FROM tc_mm) AS BIGINT)
      |    > 200000 AS at_risk
      |FROM tc_steps GROUP BY 1, 2, 3""".stripMargin

  /** q233: Poisson-bootstrap percentile CI — weights from the frozen
    * Poisson(1) CDF thresholds on the 2⁶⁰ md5 grid, replica means and
    * rank selection all integer. */
  private lazy val q233Sql: String = {
    val ts = graft.operators.TextOps.PoissonCdf60
    val ladder = ts.zipWithIndex
      .map { case (t, k) => s"WHEN h < $t THEN $k" }.mkString(" ")
    """WITH bq AS (SELECT source, doc_id,
      |    CAST(round(round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE)
      |        / len(toks))
      |      + 0.4 * (1.0 - sw / len(toks))
      |      + 0.2 * least(len(toks) / 100.0, 1.0), 4) * 10000, 0) AS BIGINT)
      |      AS q_bp
      |  FROM (SELECT source, doc_id, string_split(text, ' ') AS toks,
      |     CAST(len(list_filter(string_split(text, ' '),
      |       x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
      |   FROM documents)),
      | reps AS (SELECT source, doc_id, q_bp,
      |    CAST(unnest(range(0, 200)) AS BIGINT) AS b FROM bq),
      | hs AS (SELECT source, b, q_bp,
      |    CAST('0x' || substr(md5('boot-' || CAST(doc_id AS VARCHAR)
      |      || '-' || CAST(b AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM reps),
      | wts AS (SELECT source, b, q_bp,
      |    CASE LADDER ELSE 7 END AS w FROM hs),
      | m AS (SELECT source, b,
      |    CAST(CAST(sum(w * q_bp) AS HUGEINT) * 100 // sum(w) AS BIGINT)
      |      AS rep_micro
      |  FROM wts GROUP BY 1, 2 HAVING sum(w) > 0),
      | r AS (SELECT source, b, rep_micro, row_number() OVER
      |    (PARTITION BY source ORDER BY rep_micro ASC, b ASC) AS rnk FROM m),
      | ci AS (SELECT source,
      |    max(CASE WHEN rnk = 6 THEN rep_micro END) AS ci_lo_micro,
      |    max(CASE WHEN rnk = 195 THEN rep_micro END) AS ci_hi_micro
      |  FROM r WHERE rnk IN (6, 195) GROUP BY 1),
      | pt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(CAST(sum(q_bp) AS HUGEINT) * 100 // count(*) AS BIGINT)
      |      AS mean_micro
      |  FROM bq GROUP BY 1)
      |SELECT source, n_docs, mean_micro, ci_lo_micro, ci_hi_micro,
      |  CAST(ci_hi_micro - ci_lo_micro AS BIGINT) AS ci_width_micro
      |FROM pt JOIN ci USING (source)""".stripMargin
      .replace("LADDER", ladder)
  }

  /** q234: the PRF loop — base retrieval (the q149 chain), expansion
    * terms by the q66 integer tf·idf proxy over the top-5 feedback
    * docs, then the same chain re-instantiated for the expanded term
    * set. */
  private lazy val q234Sql: String =
    s"""WITH ${bm25Chain("bm_", s"token IN ($bm25TermList)")},
       | prf_fb AS (SELECT doc_id FROM bm_ranked WHERE rank <= 5),
       | prf_tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |   FROM documents),
       | prf_fbtf AS (SELECT token, CAST(count(*) AS BIGINT) AS fb_tf
       |   FROM prf_tok JOIN prf_fb USING (doc_id)
       |   WHERE token NOT IN ($bm25TermList) GROUP BY 1),
       | prf_df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |   FROM prf_tok GROUP BY 1),
       | prf_exp AS (SELECT token FROM (SELECT token, row_number() OVER
       |     (ORDER BY fb_tf DESC, df ASC, token ASC) AS rnk
       |   FROM prf_fbtf JOIN prf_df USING (token)) WHERE rnk <= 3),
       | prf_terms AS (SELECT token FROM prf_exp
       |   UNION SELECT unnest([$bm25TermList]) AS token),
       | ${bm25Chain("p2_", "token IN (SELECT token FROM prf_terms)")}
       |SELECT rank, doc_id, score_micro FROM p2_ranked
       |WHERE rank <= 20""".stripMargin

  /** q228: daily Fano factor per type — exact-moment variance-to-mean
    * over the q111 zero-filled grid. */
  private lazy val q228Sql: String =
    s"""WITH g AS (
       |${oracleBase("q111_daily_spine")}
       |),
       | m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(n_events) AS BIGINT) AS sx,
       |    CAST(sum(n_events * n_events) AS BIGINT) AS sxx
       |   FROM g GROUP BY 1)
       |SELECT event_type, n_days,
       |  CAST(sx * 1000 // n_days AS BIGINT) AS mean_milli,
       |  CASE WHEN sx > 0 THEN
       |    CAST((n_days * sxx - sx * sx) * 1000000 // (n_days * sx) AS BIGINT)
       |  END AS vmr_micro
       |FROM m""".stripMargin

  /** q222: cross-language fingerprint conflicts — q23's fingerprint
    * CTE grouped with the per-group sorted lang set. */
  private lazy val q222Sql: String =
    s"""WITH fp AS (
       |${oracleBase("q23_fingerprint")}
       |),
       | j AS (SELECT fp.fingerprint, d.lang
       |   FROM fp JOIN documents d USING (doc_id))
       |SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(len(list_distinct(list(lang))) AS BIGINT) AS n_langs,
       |  array_to_string(list_sort(list_distinct(list(lang))), ',') AS langs
       |FROM j GROUP BY fingerprint
       |HAVING len(list_distinct(list(lang))) >= 2""".stripMargin

  /** q214: daily-revenue autocorrelogram — zero-filled spine, seven
    * leads, exact HUGEINT moments per lag, q195's final-ratio order. */
  private lazy val q214Sql: String = {
    val leadCols = (1 to 7).map(k => s"lead(x, $k) OVER (ORDER BY day) AS y$k")
      .mkString(",\n      |    ")
    val arms = (1 to 7).map(k =>
      s"SELECT CAST($k AS BIGINT) AS lag_days, x, y$k AS y FROM led WHERE y$k IS NOT NULL")
      .mkString("\n      | UNION ALL ")
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      | b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      | spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
      |     AS DATE) AS day FROM b),
      | filled AS (SELECT spine.day, CAST(coalesce(cents, 0) AS BIGINT) AS x
      |   FROM spine LEFT JOIN daily USING (day)),
      | led AS (SELECT day, x,
      |    $leadCols
      |   FROM filled),
      | pairs AS (
      | $arms),
      | m AS (SELECT lag_days, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM pairs GROUP BY 1),
      | v AS (SELECT lag_days, n,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
      |  FROM m)
      |SELECT lag_days, n AS n_pairs,
      |  CASE WHEN vx > 0 AND vy > 0 THEN
      |    CAST(round(round(cv / sqrt(vx * vy), 6) * 1000000, 0) AS BIGINT)
      |  END AS acf_micro
      |FROM v""".stripMargin
  }

  /** q215: CUSUM changepoint per event type over the q111 zero-filled
    * grid — S′ₜ = T·cumₜ − t·total exact, peak by (|S′| desc, day). */
  private lazy val q215Sql: String =
    s"""WITH g AS (
       |${oracleBase("q111_daily_spine")}
       |),
       | s AS (SELECT event_type, day, n_events,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) AS t,
       |    CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
       |    CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS total
       |   FROM g),
       | s2 AS (SELECT *, abs(n_days * cum - t * total) AS s_abs FROM s),
       | p AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |     ORDER BY s_abs DESC, day ASC) AS rk FROM s2)
       |SELECT event_type, n_days, day AS peak_day,
       |  CASE WHEN total > 0 THEN
       |    CAST(s_abs * 1000000 // (n_days * total) AS BIGINT) END AS cusum_micro,
       |  CASE WHEN t > 0 THEN CAST(cum * 1000 // t AS BIGINT) END AS before_milli,
       |  CASE WHEN n_days > t THEN
       |    CAST((total - cum) * 1000 // (n_days - t) AS BIGINT) END AS after_milli
       |FROM p WHERE rk = 1""".stripMargin

  /** q218: distinct-n diversity — one arm per n over the shared token
    * split, the q205 hash keys, a single distinct agg per (source, n). */
  private lazy val q218Sql: String = {
    val arms = (1 to 4).map { n =>
      s"""SELECT source, CAST($n AS BIGINT) AS n,
         |    substr(md5(array_to_string(ts[i:i+${n - 1}], ' ')), 1, 16) AS h
         |   FROM tok, UNNEST(generate_series(1, len(ts) - ${n - 1})) AS t$n(i)"""
        .stripMargin
    }.mkString("\n | UNION ALL ")
    s"""WITH tok AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
       | pos AS (
       | $arms)
       |SELECT source, n, CAST(count(*) AS BIGINT) AS n_positions,
       |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
       |  CAST(count(DISTINCT h) * 1000000 // count(*) AS BIGINT) AS distinct_micro
       |FROM pos GROUP BY 1, 2""".stripMargin
  }

  /** q241: q218's sketch twin — gram STRINGS through the md5-HLL
    * register replay (q136's CTEs, grouped by (source, n)). */
  private lazy val q241Sql: String = {
    val m = graft.operators.Sketches.HllRegisters
    val rb = graft.operators.Sketches.HllRegisterBits
    val w1 = graft.operators.Sketches.HllRestBits + 1
    val num = graft.operators.Sketches.HllNumerator
    val arms = (1 to 4).map { n =>
      s"""SELECT source, CAST($n AS BIGINT) AS n,
         |    array_to_string(ts[i:i+${n - 1}], ' ') AS g
         |   FROM tok, UNNEST(generate_series(1, len(ts) - ${n - 1})) AS t$n(i)"""
        .stripMargin
    }.mkString("\n | UNION ALL ")
    val raw = s"CAST(sumpow + ($m - m_hit) * (CAST(1 AS BIGINT) << 53) AS DOUBLE)"
    s"""WITH tok AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
       | pos AS (
       | $arms),
       | h AS (SELECT source, n,
       |    CAST('0x' || substr(md5('hllc-' || g), 1, 15) AS BIGINT) AS h
       |  FROM pos),
       | rr AS (SELECT source, n, h % $m AS reg,
       |    CASE WHEN (h >> $rb) = 0 THEN $w1
       |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
       | regs AS (SELECT source, n, reg, max(rho) AS mrho FROM rr GROUP BY 1, 2, 3),
       | s AS (SELECT source, n, CAST(count(*) AS BIGINT) AS m_hit,
       |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (53 - mrho)), 0) AS BIGINT)
       |      AS sumpow
       |  FROM regs GROUP BY 1, 2),
       | np AS (SELECT source, n, CAST(count(*) AS BIGINT) AS n_positions
       |  FROM pos GROUP BY 1, 2),
       | est AS (SELECT source, n,
       |    CASE WHEN ($m - m_hit) > 0 AND $num / $raw <= ${2.5 * m}
       |      THEN ${m.toDouble} * ln(${m.toDouble} / ($m - m_hit))
       |      ELSE $num / $raw END AS est FROM s)
       |SELECT source, n, n_positions, round(est, 2) AS est_distinct
       |FROM np JOIN est USING (source, n)""".stripMargin
  }

  /** q208: Cohen's kappa between the q71 gate and the quality label —
    * integer micro agreement with marginal-product expected rate. */
  private lazy val q208Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | lab AS (SELECT cls.keep AS a, m.quality >= 0.66 AS b
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | cm AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
       |  FROM lab),
       | r AS (SELECT *,
       |    CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_micro,
       |    CAST((((n11 + n10) * 1000000 // n) * ((n11 + n01) * 1000000 // n)
       |        + ((n01 + n00) * 1000000 // n) * ((n10 + n00) * 1000000 // n))
       |        // 1000000 AS BIGINT) AS pe_micro
       |  FROM cm)
       |SELECT n, n11, n10, n01, n00, po_micro, pe_micro,
       |  CAST(CASE WHEN pe_micro = 1000000 THEN NULL
       |    ELSE (po_micro - pe_micro) * 1000000 // (1000000 - pe_micro) END
       |    AS BIGINT) AS kappa_micro
       |FROM r""".stripMargin

  /** q209: exact midrank ROC-AUC of the q71 logit vs the quality
    * label — ticks from the published 4-decimal logit ×10⁴, doubled
    * midranks so ties stay integral, one final micro division. */
  private lazy val q209Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | f AS (SELECT CAST(round(cls.logit * 10000) AS BIGINT) AS s,
       |    m.quality >= 0.66 AS pos
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | t AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
       |   FROM f GROUP BY s),
       | r AS (SELECT *,
       |    CAST(coalesce(sum(cnt) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_less
       |   FROM t)
       |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |  CAST(sum(cnt - np) AS BIGINT) AS n_neg,
       |  CAST(CASE WHEN sum(np) = 0 OR sum(cnt - np) = 0 THEN NULL
       |    ELSE (CAST(sum(np * (2 * cum_less + cnt + 1)) AS BIGINT)
       |          - CAST(sum(np) AS BIGINT) * (CAST(sum(np) AS BIGINT) + 1))
       |         * 1000000
       |         // (2 * CAST(sum(np) AS BIGINT) * CAST(sum(cnt - np) AS BIGINT))
       |    END AS BIGINT) AS auc_micro
       |FROM r""".stripMargin

  /** q160: q73's funnel rolled to the survival curve + step rates. */
  private lazy val q160Sql: String =
    s"""WITH f AS (
       |${oracleBase("q73_funnel")}
       |),
       | s AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_at FROM f GROUP BY stage),
       | spine AS (SELECT unnest([1, 2, 3]) AS stage),
       | s2 AS (SELECT spine.stage, coalesce(s.n_at, 0) AS n_at
       |   FROM spine LEFT JOIN s ON spine.stage = s.stage),
       | r AS (SELECT stage, CAST(sum(n_at) OVER (ORDER BY stage DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_reached
       |   FROM s2),
       | w AS (SELECT stage, n_reached,
       |    lag(n_reached) OVER (ORDER BY stage ASC) AS prev_reached,
       |    first_value(n_reached) OVER (ORDER BY stage ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_reached
       |   FROM r)
       |SELECT stage, n_reached,
       |  CAST(coalesce(n_reached * 1000000 // prev_reached, 1000000) AS BIGINT)
       |    AS step_rate_micro,
       |  CAST(n_reached * 1000000 // first_reached AS BIGINT) AS cum_rate_micro
       |FROM w""".stripMargin

  /** q161: the q141 rewrite rolled to per-source token savings. */
  private lazy val q161Sql: String =
    s"""WITH rw AS (
       |${oracleBase("q141_chunk_rewrite")}
       |),
       | base AS (SELECT d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS raw_tokens,
       |    CAST(CASE WHEN rw.clean_text = '' THEN 0
       |         ELSE len(string_split(rw.clean_text, ' ')) END AS BIGINT) AS kept_tokens
       |   FROM documents d JOIN rw ON d.doc_id = rw.doc_id)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(raw_tokens) AS BIGINT) AS raw_tokens,
       |  CAST(sum(kept_tokens) AS BIGINT) AS kept_tokens,
       |  CAST((CAST(sum(raw_tokens) AS BIGINT) - CAST(sum(kept_tokens) AS BIGINT))
       |    * 1000000 // CAST(sum(raw_tokens) AS BIGINT) AS BIGINT) AS saving_micro
       |FROM base GROUP BY source""".stripMargin

  /** q162: the Efraimidis–Spirakis exponential-key replay — salted-md5
    * uniform, quality-floored weight, ln(u)/w at 6 dp, top-k. */
  private lazy val q162Sql: String =
    s"""WITH $docMetricsCte,
       | keyed AS (SELECT doc_id, source,
       |    greatest(quality, 0.0001) AS weight,
       |    round(ln(((CAST('0x' || substr(md5('wrs-' || CAST(doc_id AS VARCHAR)), 1, 15)
       |          AS BIGINT) % 9007199254740992) + 1.0) / 9007199254740992.0)
       |      / greatest(quality, 0.0001), 6) AS key6
       |   FROM m)
       |SELECT rank, doc_id, source, weight,
       |  CAST(round(key6 * 1000000.0, 0) AS BIGINT) AS key_micro
       |FROM (SELECT *, row_number() OVER (ORDER BY key6 DESC, doc_id ASC) AS rank
       |      FROM keyed)
       |WHERE rank <= 100""".stripMargin

  /** q157: the q71 logit replay ranked by ntile(10), positives =
    * quality ≥ 0.66 (the docMetricsCte bar), integer micro lift and
    * cumulative capture. */
  private lazy val q157Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | lab AS (SELECT cls.doc_id, cls.logit, m.quality >= 0.66 AS pos
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | rk AS (SELECT *, ntile(10) OVER (ORDER BY logit DESC, doc_id ASC) AS decile
       |   FROM lab),
       | agg AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
       |   FROM rk GROUP BY decile),
       | tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
       |    CAST(sum(n_pos) AS BIGINT) AS pp FROM agg)
       |SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
       |  CAST(n_pos * 1000000 // n_docs AS BIGINT) AS pos_rate_micro,
       |  CAST(n_pos * nn * 1000000 // (n_docs * pp) AS BIGINT) AS lift_micro,
       |  CAST(CAST(sum(n_pos) OVER (ORDER BY decile
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    * 1000000 // pp AS BIGINT) AS cum_capture_micro
       |FROM agg CROSS JOIN tot""".stripMargin

  /** q158: langID-vs-label confusion + P/R/F1 in integer micro. */
  private lazy val q158Sql: String =
    """WITH c AS (SELECT
      |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the','a','and','of'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) > 0.03
      |      THEN 'en' ELSE 'und' END = 'en' AS pred_en,
      |    lang = 'en' AS is_en
      |  FROM documents),
      | m AS (SELECT
      |    CAST(sum(CASE WHEN pred_en AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN pred_en AND NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN NOT pred_en AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(sum(CASE WHEN NOT pred_en AND NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM c)
      |SELECT tp, fp, fn, tn,
      |  CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_micro,
      |  CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_micro,
      |  CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_micro
      |FROM m""".stripMargin

  /** q130: the bakeoff's oracle is the five per-method oracle replays
    * (q30/q46/q62/q80/q123) stitched as subqueries beside the brute
    * baseline (q29), with each recall recomputed in DuckDB — integer
    * micro-units via `//`, matching the engine's exact division. */
  private lazy val q130Sql: String = {
    def replay(name: String, key: String): String =
      s"SELECT '$name' AS method, query_id, cand_id FROM (\n${oracleBase(key)}\n)"
    val methods = Seq(
      "lsh" -> "q30_lsh_ann", "ivf" -> "q46_ivf_ann",
      "int8" -> "q62_quantized_ann", "pq" -> "q80_pq_ann",
      "hamming" -> "q123_hamming_ann", "jl+ivf" -> "q297_jl_ivf_ann")
    s"""WITH brute AS (SELECT query_id, cand_id FROM (
       |${oracleBase("q29_ann_topk")}
       |)),
       | meth AS (
       |${methods.map { case (n, q) => replay(n, q) }.mkString("\nUNION ALL\n")}
       |),
       | hit AS (SELECT method, CAST(count(*) AS BIGINT) AS hits
       |         FROM meth JOIN brute USING (query_id, cand_id)
       |         GROUP BY method),
       | tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM brute)
       |SELECT ms.method, coalesce(h.hits, 0) AS hits, t.total,
       |  CAST(coalesce(h.hits, 0) * 1000000 // t.total AS BIGINT)
       |    AS recall_micro
       |FROM (SELECT unnest(['lsh','ivf','int8','pq','hamming','jl+ivf'])
       |      AS method) ms
       |LEFT JOIN hit h ON h.method = ms.method
       |CROSS JOIN tot t""".stripMargin
  }

  private lazy val oracleBase: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q4_trend_daily" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    count(*) AS n, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT day, event_type, n, sum_value,
        |  n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS delta
        |FROM daily""".stripMargin,
    "q5_source_target_diff" ->
      """WITH src AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS src_count
        |  FROM events GROUP BY 1
        |), tgt AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS tgt_count
        |  FROM events WHERE event_type <> 'error' GROUP BY 1
        |)
        |SELECT coalesce(src.day, tgt.day) AS day,
        |  coalesce(src_count, 0) AS src_count,
        |  coalesce(tgt_count, 0) AS tgt_count,
        |  coalesce(src_count, 0) - coalesce(tgt_count, 0) AS diff
        |FROM src FULL OUTER JOIN tgt ON src.day = tgt.day""".stripMargin,
    "q7_anti_join" ->
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND year(l_shipdate) = 1996)""".stripMargin,
    "q8_distinct_users" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q9_recent_errors" ->
      """SELECT event_id, ts, user_id, value
        |FROM events WHERE event_type = 'error'
        |ORDER BY ts DESC, event_id DESC
        |LIMIT 500""".stripMargin,
    "q10_union_merged" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 25.0 AND year(l_shipdate) = 1996
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 25.0 AND year(l_shipdate) = 1997""".stripMargin,
    "q12_json_extract" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q13_daily_sync_stats" ->
      """SELECT o_orderstatus,
        |  round(max(o_totalprice) - min(o_totalprice), 2) AS spread,
        |  round(max(o_totalprice), 2) AS max_price,
        |  max(o_orderdate) AS last_at,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q11_masked_projection" ->
      """SELECT c_custkey,
        |  repeat('*', length(c_name)) AS name_masked,
        |  '****' AS acctbal_masked
        |FROM customer""".stripMargin,
    "q14_encrypt_roundtrip" ->
      "SELECT c_custkey, c_name AS name_rt FROM customer",
    "q17_nested_mask" ->
      """SELECT c_custkey,
        |  repeat('*', length(c_name)) AS name_masked,
        |  repeat('*', length(c_mktsegment)) AS seg_masked,
        |  c_acctbal AS bal
        |FROM customer""".stripMargin,
    "q15_conditional_count" ->
      """SELECT 'events' AS table_name, count(*) AS cnt
        |FROM events
        |WHERE value > 50 AND event_type = 'purchase'
        |  AND ts >= TIMESTAMP '2024-01-13 15:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 15:00:00'""".stripMargin,
    "q16_export_window" ->
      """SELECT event_id, ts, user_id, event_type
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-16 15:00:00'
        |  AND ts <  TIMESTAMP '2024-01-19 15:00:00'""".stripMargin,
    "q20_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
        |  round(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS avg_token_len
        |FROM documents""".stripMargin,
    "q21_quality_scores" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
        |  FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS distinct_ratio,
        |  round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
        |      + 0.4 * (1.0 - sw / len(toks))
        |      + 0.2 * least(len(toks) / 100.0, 1.0), 4) AS quality
        |FROM t""".stripMargin,
    "q22_lang_id" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','and','of'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ratio
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN ratio > 0.03 THEN 'en' ELSE 'und' END AS guess,
        |  count(*) AS n_docs,
        |  round(avg(ratio), 4) AS avg_stopword_ratio
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q23_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(toks) >= 8 THEN
        |    list_min(list_transform(range(0, len(toks) - 7),
        |      i -> md5(array_to_string(toks[i+1:i+8], ' '))))
        |  ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
        |FROM t""".stripMargin,
    "q24_dedup_exact" ->
      """SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT user_id, event_type, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q25_minhash_pairs" -> q25Sql,
    "q26_simhash_pairs" -> q26Sql,
    "q30_lsh_ann" -> q30Sql,
    "q27_token_jaccard" ->
      """WITH d AS (SELECT doc_id, source,
        |             list_distinct(string_split(text, ' ')) AS s
        |           FROM documents)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |          / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
        |  FROM d x JOIN d y ON x.source = y.source AND x.doc_id < y.doc_id)
        |WHERE jaccard >= 0.8""".stripMargin,
    "q28_embedding_neardups" ->
      """SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.label AS label,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))), 6) AS sim
        |FROM embeddings x JOIN embeddings y
        |  ON x.label = y.label AND x.vec_id < y.vec_id
        |WHERE round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))), 6) >= 0.4""".stripMargin,
    "q29_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        | s AS (
        |  SELECT query_id, e.vec_id AS cand_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), 6) AS sim
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
        | r AS (SELECT query_id, cand_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, cand_id ASC) AS rank
        |       FROM s)
        |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    "q31_cdc_state" ->
      """WITH log AS (
        |  SELECT CASE event_type WHEN 'signup' THEN 'insert'
        |                         WHEN 'error' THEN 'delete'
        |                         ELSE 'update' END AS op,
        |    user_id, value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    ts, event_id AS off
        |  FROM events)
        |SELECT user_id, value, k, ts AS updated_at FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, off DESC) AS rn
        |  FROM log) WHERE rn = 1 AND op <> 'delete'""".stripMargin,
    "q32_cdc_state_keep_deletes" ->
      """WITH log AS (
        |  SELECT CASE event_type WHEN 'signup' THEN 'insert'
        |                         WHEN 'error' THEN 'delete'
        |                         ELSE 'update' END AS op,
        |    user_id, value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    ts, event_id AS off
        |  FROM events)
        |SELECT user_id, value, k, ts AS updated_at FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, off DESC) AS rn
        |  FROM log WHERE op <> 'delete') WHERE rn = 1""".stripMargin,
    "q33_backup_pruned_export" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'""".stripMargin,
    "q34_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER) AS n_frames
        |FROM documents""".stripMargin,
    "q35_sql_passthrough" ->
      """SELECT r_name,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q36_schema_infer" ->
      """SELECT * FROM (VALUES
        |  ('key', 'int'), ('after', 'object'), ('after.value', 'float'),
        |  ('after.props', 'object'), ('after.props.k', 'int')
        |) AS t(field, type)""".stripMargin,
    // q37 ranks ALL raw ops (SCAN sees the source's *current* key state,
    // so an expired copy hides the key even if an older live value would
    // have survived notification replay) — unlike kvEffSql, which drops
    // expired-copy no-ops before ranking (replay semantics, q38 only).
    "q37_kv_snapshot" ->
      """WITH ops AS (
        |  SELECT CASE WHEN event_type = 'error' THEN 'del'
        |              WHEN event_type IN ('signup','purchase') THEN 'set'
        |              ELSE 'copy' END AS op,
        |    'user:' || user_id AS key,
        |    CASE WHEN user_id % 3 = 0 THEN 'hash' ELSE 'string' END AS kind,
        |    CASE WHEN user_id % 3 = 0 THEN NULL ELSE CAST(k AS VARCHAR) END AS value,
        |    CASE WHEN user_id % 3 = 0 THEN CAST(k AS VARCHAR) END AS f_k,
        |    CASE WHEN user_id % 3 = 0 THEN CAST(user_id AS VARCHAR) END AS f_uid,
        |    CASE WHEN event_type IN ('view','click') THEN
        |      CASE WHEN k % 5 = 0 THEN -2 WHEN k % 5 = 1 THEN (k+1)*1000 ELSE -1 END
        |    ELSE -1 END AS ttl_ms,
        |    ts, event_id AS off
        |  FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |        FROM events)
        |), cur AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY key
        |                                 ORDER BY ts DESC, off DESC) AS rn
        |    FROM ops)
        |  WHERE rn = 1
        |)
        |SELECT key, kind, value, f_k, f_uid,
        |  CASE WHEN ttl_ms = -1 THEN 0 ELSE greatest(ttl_ms, 0) END AS expire_ms
        |FROM cur
        |WHERE op <> 'del' AND (ttl_ms = -1 OR ttl_ms >= 0)""".stripMargin,
    "q38_kv_state" ->
      s"""$kvReplaySql
         |SELECT key, kind, value, f_k, f_uid,
         |  CASE WHEN base_op = 'copy' THEN ttl_base ELSE -1 END AS ttl_ms,
         |  updated_at
         |FROM agg WHERE last_op <> 'del'""".stripMargin,
    "q39_kv_stream_msgs" ->
      """SELECT 'msg:' || event_id AS hash_key,
        |  CAST(user_id AS VARCHAR) AS f_user,
        |  json_extract_string(props, '$.k') AS f_amount
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    // q40 replays a keyless (REPLICA IDENTITY FULL) log: a delete wipes
    // every duplicate of the row value; survivors are the inserts after
    // each value's last delete (position = event_id, the LSN analogue).
    // row_b is NULL for k%7=3 and the join is IS NOT DISTINCT FROM:
    // null-safe matching, the oracle twin of the implementation's
    // struct-key equality (Keyless.scala:44).
    "q40_keyless_state" ->
      """WITH log AS (
        |  SELECT CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
        |    user_id % 20 AS row_a,
        |    CASE WHEN k % 7 = 3 THEN NULL ELSE k % 10 END AS row_b,
        |    event_id AS off
        |  FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |        FROM events)),
        | del AS (SELECT row_a, row_b, max(off) AS last_del
        |         FROM log WHERE op = 'delete' GROUP BY 1, 2)
        |SELECT l.row_a, l.row_b, count(*) AS cnt
        |FROM log l LEFT JOIN del d
        |  ON l.row_a IS NOT DISTINCT FROM d.row_a
        | AND l.row_b IS NOT DISTINCT FROM d.row_b
        |WHERE l.op = 'insert' AND (d.last_del IS NULL OR l.off > d.last_del)
        |GROUP BY 1, 2""".stripMargin,
    "q41_json_doc_mask" ->
      """SELECT doc_id,
        |  repeat('*', length(source)) AS source_masked,
        |  lang AS lang_rt
        |FROM documents""".stripMargin,
    "q42_map_mask" ->
      """SELECT event_id,
        |  repeat('*', length(json_extract_string(props, '$.k'))) AS k_masked
        |FROM events""".stripMargin,
    "q43_log_search" ->
      """SELECT event_id, ts, user_id, props
        |FROM events
        |WHERE lower(event_type) = 'error' AND contains(lower(props), '1}')
        |ORDER BY ts DESC, event_id DESC
        |LIMIT 500""".stripMargin,
    // yesterday in JST anchored at 2024-01-16T00:00Z → [01-14 15:00Z,
    // 01-15 15:00Z], inclusive end (count semantics)
    "q44_yesterday_diff" ->
      """SELECT count(*) AS src_count,
        |  count(CASE WHEN event_type <> 'error' THEN 1 END) AS tgt_count,
        |  count(*) - count(CASE WHEN event_type <> 'error' THEN 1 END) AS diff
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-14 15:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 15:00:00'""".stripMargin,
    "q45_meta_scan" -> graft.Tables.all.map { t =>
      s"""SELECT '$t' AS table_name, count(*) AS n_rows,
         |  CAST((SELECT count(*) FROM (DESCRIBE $t)) AS INTEGER) AS n_cols
         |FROM $t""".stripMargin
    }.mkString("\nUNION ALL\n"),
    // IVF replay: fixed centroids (vec_id < 16), nearest-cell
    // assignment, 4-cell probes, exact top-5 on cell members
    "q46_ivf_ann" ->
      """WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
        |               FROM embeddings WHERE vec_id < 16),
        | sims AS (
        |  SELECT e.vec_id, e.embedding, c.centroid_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6) AS cent_sim
        |  FROM embeddings e CROSS JOIN cents c),
        | ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY cent_sim DESC, centroid_id ASC) AS cell_rank
        |  FROM sims),
        | assigned AS (SELECT vec_id AS cand_id, embedding AS cv, centroid_id
        |              FROM ranked WHERE cell_rank = 1),
        | probes AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id
        |            FROM ranked WHERE vec_id < 10 AND cell_rank <= 4),
        | scored AS (
        |  SELECT query_id, cand_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
        |  FROM probes JOIN assigned USING (centroid_id)
        |  WHERE query_id <> cand_id),
        | r AS (SELECT query_id, cand_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, cand_id ASC) AS rank
        |       FROM scored)
        |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    // the MERGE's tombstone contract: a key whose last change is a
    // delete keeps a (null payload, deleted=true) guard row carrying
    // the delete's recency — what a stale DLQ retry loses against
    "q48_cdc_tombstones" ->
      """WITH log AS (
        |  SELECT CASE event_type WHEN 'signup' THEN 'insert'
        |                         WHEN 'error' THEN 'delete'
        |                         ELSE 'update' END AS op,
        |    user_id, value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    ts, event_id AS off
        |  FROM events)
        |SELECT user_id,
        |  CASE WHEN op = 'delete' THEN NULL ELSE value END AS value,
        |  CASE WHEN op = 'delete' THEN NULL ELSE k END AS k,
        |  ts AS updated_at,
        |  op = 'delete' AS deleted
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, off DESC) AS rn
        |  FROM log) WHERE rn = 1""".stripMargin,
    "q49_dedup_clusters" -> q49Sql,
    // incremental dedup == the full pair set restricted to pairs with a
    // batch member: the oracle replays the WHOLE pipeline and filters,
    // proving the index-probe shortcut loses nothing
    "q50_incremental_dedup" ->
      s"""WITH $q25Ctes
         |SELECT doc_a, doc_b, jaccard FROM pairs
         |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin,
    "q51_weighted_mix" -> {
      val cases = graft.operators.TextOps.DefaultMixRates.toSeq.sortBy(_._1)
        .map { case (s, r) => s"WHEN '$s' THEN ${math.round(r * 10000).toInt}" }.mkString(" ")
      s"""SELECT doc_id, source, mix_bp FROM (
         |  SELECT doc_id, source,
         |    CAST('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % 10000 AS mix_bp
         |  FROM documents)
         |WHERE mix_bp < CASE source $cases ELSE 0 END""".stripMargin
    },
    // trunc-to-centitoken mean via integer math: round(avg, 2) half-ties
    // (71.975) split across engines (HALF_UP vs nearbyint half-even)
    "q63_length_histogram" ->
      """SELECT source, (n_tokens // 16) * 16 AS len_bucket, count(*) AS n_docs,
        |  floor(sum(n_tokens) * 100 / count(*)) / 100.0 AS avg_tokens
        |FROM (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |GROUP BY source, len_bucket""".stripMargin,
    // q64: replay the epoch mixer — whole copies per source plus the
    // fractional md5 draw, expanded to one row per copy
    "q64_epoch_mix" -> {
      val whole = graft.operators.TextOps.DefaultEpochRates.toSeq.sortBy(_._1)
        .map { case (s, r) => s"WHEN '$s' THEN ${math.floor(r).toLong}" }.mkString(" ")
      val frac = graft.operators.TextOps.DefaultEpochRates.toSeq.sortBy(_._1)
        .map { case (s, r) =>
          s"WHEN '$s' THEN ${math.round((r - math.floor(r)) * 10000).toInt}" }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST('0x' || substr(md5('epoch-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % 10000 AS mix_bp
         |  FROM documents),
         | c AS (SELECT doc_id, source,
         |    CASE source $whole ELSE 0 END
         |      + CASE WHEN mix_bp < (CASE source $frac ELSE 0 END) THEN 1 ELSE 0 END
         |      AS n_copies
         |  FROM t)
         |SELECT doc_id, source,
         |  CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
         |FROM c WHERE n_copies > 0""".stripMargin
    },
    // q65: the corpus's own unigram distribution, per-token logp rounded
    // to 6 dp so both engines average identical inputs
    "q65_unigram_lm" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        | v AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        | t AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM v),
        | lp AS (SELECT token,
        |    round(ln(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)), 6) AS logp
        |  FROM v, t)
        |SELECT doc_id, count(*) AS n_tokens, round(avg(logp), 4) AS avg_logp
        |FROM tok JOIN lp USING (token)
        |GROUP BY doc_id""".stripMargin,
    // q66: tf-idf ranking with idf's float replaced by its exact integer
    // ordering proxy (tf desc, corpus df asc, token asc)
    "q66_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        | pd AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        | dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        | r AS (SELECT doc_id, token, tf, df,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf DESC, df ASC, token ASC) AS INTEGER) AS rank
        |  FROM pd JOIN dfq USING (token))
        |SELECT doc_id, token, tf, df, rank FROM r WHERE rank <= 3""".stripMargin,
    "q67_stratified_sample" ->
      """WITH h AS (SELECT doc_id, source,
        |    CAST('0x' || substr(md5('strat-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      AS pick_hash
        |  FROM documents),
        | r AS (SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY pick_hash, doc_id)
        |      AS INTEGER) AS pick_rank
        |  FROM h)
        |SELECT doc_id, source, pick_rank FROM r WHERE pick_rank <= 12""".stripMargin,
    // q68: windowed SUM cast to BIGINT (DuckDB types it HUGEINT; the
    // driver hash is type-sensitive — round-7 lesson)
    "q68_shard_manifest" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
         |    CAST('0x' || substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      AS sh
         |  FROM documents),
         | s AS (SELECT doc_id, n_chars, sh, sh % ${graft.operators.TextOps.ShardCount}
         |      AS shard_id FROM h)
         |SELECT doc_id, shard_id,
         |  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY sh, doc_id) AS BIGINT)
         |    AS position,
         |  CAST(SUM(n_chars) OVER (PARTITION BY shard_id ORDER BY sh, doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_chars
         |    AS byte_offset,
         |  n_chars
         |FROM s""".stripMargin,
    // the curation chain: quality bar + langID + near-dup survivors —
    // the full q25 pipeline, the closure, AND the metric expressions
    // replayed in one statement
    "q53_curate" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | $docMetricsCte
         |SELECT doc_id, source, quality FROM m
         |WHERE quality >= 0.66 AND guess = 'en'
         |  AND doc_id NOT IN (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)""".stripMargin,
    // the whole training-data build replayed in one statement: curation
    // (q53's chain) → epoch mixing (q64's draw on the survivor set) →
    // sequence packing (q52's per-group running sum keyed per copy)
    "q69_training_export" -> {
      val whole = graft.operators.TextOps.DefaultEpochRates.toSeq.sortBy(_._1)
        .map { case (s, r) => s"WHEN '$s' THEN ${math.floor(r).toLong}" }.mkString(" ")
      val frac = graft.operators.TextOps.DefaultEpochRates.toSeq.sortBy(_._1)
        .map { case (s, r) =>
          s"WHEN '$s' THEN ${math.round((r - math.floor(r)) * 10000).toInt}" }.mkString(" ")
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | $docMetricsCte,
         | cur AS (SELECT doc_id, source FROM m
         |   WHERE quality >= 0.66 AND guess = 'en'
         |     AND doc_id NOT IN (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)),
         | mixq AS (SELECT doc_id, source,
         |    CAST('0x' || substr(md5('epoch-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % 10000 AS mix_bp
         |  FROM cur),
         | cop AS (SELECT doc_id, source,
         |    CASE source $whole ELSE 0 END
         |      + CASE WHEN mix_bp < (CASE source $frac ELSE 0 END) THEN 1 ELSE 0 END
         |      AS n_copies
         |  FROM mixq),
         | expanded AS (SELECT doc_id, source,
         |    CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
         |  FROM cop WHERE n_copies > 0),
         | tok AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         | g AS (SELECT e.doc_id, e.copy_idx, e.source, t.n_tokens,
         |    CAST('0x' || substr(md5('pack-' || CAST(e.doc_id AS VARCHAR) || '#'
         |        || CAST(e.copy_idx AS VARCHAR)), 1, 15) AS BIGINT)
         |      % ${graft.operators.TextOps.PackGroups} AS pack_group
         |  FROM expanded e JOIN tok t USING (doc_id)),
         | pk AS (SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY pack_group
         |        ORDER BY doc_id, copy_idx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM g)
         |SELECT doc_id, copy_idx, source, n_tokens, pack_group,
         |  CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id,
         |  (cum - n_tokens) % 512 + n_tokens > 512 AS spans_boundary
         |FROM pk""".stripMargin
    },
    "q54_embedding_clusters" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
        |  FROM embeddings x JOIN embeddings y
        |    ON x.label = y.label AND x.vec_id < y.vec_id
        |  WHERE round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))), 6) >= 0.4),
        | edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |           UNION ALL SELECT doc_b, doc_a FROM pairs),
        | reach(a, b) AS (
        |   SELECT a, b FROM edges
        |   UNION
        |   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT vec_id, cluster_id, vec_id = cluster_id AS is_canonical FROM (
        |  SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)""".stripMargin,
    "q55_top_quality" ->
      s"""WITH $docMetricsCte
         |SELECT doc_id, source, quality, rank FROM (
         |  SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id ASC) AS rank
         |  FROM m)
         |WHERE rank <= 5""".stripMargin,
    // q70: the salted two-phase top-k must produce EXACTLY q55's rows —
    // same oracle statement
    "q70_top_quality_salted" ->
      s"""WITH $docMetricsCte
         |SELECT doc_id, source, quality, rank FROM (
         |  SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id ASC) AS rank
         |  FROM m)
         |WHERE rank <= 5""".stripMargin,
    // q71: the linear-classifier logit mirrors the Spark expression's
    // exact operand and association order — every step is a fixed-order
    // double op, so raw doubles (and the logit > 0 decision) match
    // bit-for-bit
    "q71_quality_classifier" -> {
      val logit =
        """-2.0 + 3.0 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
          |      + -1.5 * (sw / len(toks))
          |      + 0.8 * least(len(toks) / 100.0, 1.0)
          |      + -2.5 * (1.0 - CAST(len(list_distinct(shs)) AS DOUBLE) / len(shs))""".stripMargin
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
         |  FROM documents),
         | s AS (SELECT doc_id, toks, sw, CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(0, len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' '))
         |    ELSE [array_to_string(toks, ' ')] END AS shs
         |  FROM t)
         |SELECT doc_id, round($logit, 4) AS logit, ($logit) > 0 AS keep
         |FROM s""".stripMargin
    },
    "q72_bigram_lm" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | g AS (SELECT doc_id,
        |    unnest(list_transform(range(0, len(toks) - 1),
        |      i -> array_to_string(toks[i+1:i+2], ' '))) AS bigram
        |  FROM d WHERE len(toks) >= 2),
        | c AS (SELECT bigram, count(*) AS cb FROM g GROUP BY bigram),
        | h AS (SELECT string_split(bigram, ' ')[1] AS head,
        |    CAST(sum(cb) AS BIGINT) AS ch FROM c GROUP BY head),
        | lp AS (SELECT bigram, round(ln(CAST(cb AS DOUBLE) / CAST(ch AS DOUBLE)), 6) AS logp
        |   FROM c JOIN h ON string_split(c.bigram, ' ')[1] = h.head),
        | s AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 4) AS avg_logp
        |   FROM g JOIN lp USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams, s.avg_logp
        |FROM d LEFT JOIN s USING (doc_id)""".stripMargin,
    "q52_seq_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5('pack-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % ${graft.operators.TextOps.PackGroups} AS pack_group,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         | c AS (SELECT doc_id, pack_group, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM t)
         |SELECT doc_id, pack_group, n_tokens,
         |  CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id,
         |  (cum - n_tokens) % 512 + n_tokens > 512 AS spans_boundary
         |FROM c""".stripMargin,
    // ASCII payloads: char offsets == byte offsets, so the string
    // substring replays the frame slicing exactly
    "q47_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(ceil(length(text) / 256.0) AS INTEGER) AS nf
        |  FROM documents),
        | e AS (SELECT media_id, text, unnest(range(0, nf)) AS frame_idx FROM f)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  md5(substring(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256)) AS frame_md5
        |FROM e
        |WHERE frame_idx % 4 = 0""".stripMargin,
    // q56: replay shingling + 60-bit md5 hashing, then the eval↔train
    // n-gram collision count (eval slice = doc_id % 10 = 0, k = 4)
    "q56_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 4
        |    THEN list_transform(range(0, len(toks) - 3), i -> array_to_string(toks[i+1:i+4], ' '))
        |    ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
        | h AS (SELECT doc_id,
        |    list_transform(shs, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs FROM sh),
        | ev AS (SELECT DISTINCT unnest(hs) AS hsh FROM h WHERE doc_id % 10 = 0),
        | tr AS (SELECT doc_id, unnest(hs) AS hsh FROM h WHERE doc_id % 10 <> 0)
        |SELECT doc_id, count(*) AS n_hits FROM tr JOIN ev USING (hsh)
        |GROUP BY doc_id HAVING count(*) >= 2""".stripMargin,
    "q57_repetition" ->
      """WITH sh AS (SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(0, len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' '))
        |    ELSE [array_to_string(toks, ' ')] END AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        |SELECT doc_id, len(shs) AS n_shingles,
        |  round(1.0 - CAST(len(list_distinct(shs)) AS DOUBLE) / len(shs), 4) AS dup_shingle_frac
        |FROM sh""".stripMargin,
    "q58_corpus_stats" ->
      s"""WITH t AS (SELECT source, string_split(text, ' ') AS toks,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
         |  FROM documents),
         | d AS (SELECT source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    $qualityExpr AS quality,
         |    CASE WHEN sw / len(toks) > 0.03 THEN 1 ELSE 0 END AS is_en
         |  FROM t)
         |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(n_tokens), 2) AS avg_tokens,
         |  round(avg(quality), 4) AS avg_quality,
         |  round(avg(is_en), 4) AS en_frac
         |FROM d GROUP BY source""".stripMargin,
    // q59/q60: window replays with the same (ts, event_id) tie-break
    "q59_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events
        |            WHERE event_type IN ('purchase','view')),
        | w AS (SELECT *,
        |    last_value(CASE WHEN event_type='view' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS view_id,
        |    last_value(CASE WHEN event_type='view' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS view_ts
        |  FROM ev)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, view_id, view_ts
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "q60_sessions" -> {
      val gapUs = EventFlow.DefaultGapUs
      s"""WITH e AS (SELECT user_id, event_id, ts,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         | g AS (SELECT *, CASE WHEN lag(us) OVER win IS NULL
         |        OR us - lag(us) OVER win > $gapUs
         |      THEN 1 ELSE 0 END AS new_s
         |   FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
         | s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM g)
         |SELECT user_id, session_seq, count(*) AS n_events,
         |  min(ts) AS session_start, max(ts) AS session_end
         |FROM s GROUP BY user_id, session_seq""".stripMargin
    },
    // q73: three stacked user-partition windows replay the ordered
    // funnel (each stage's min is at-or-after the previous stage)
    "q73_funnel" ->
      """WITH w1 AS (SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t0
        |  FROM events),
        | w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t0 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t1 FROM w1),
        | w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM w2)
        |SELECT user_id, max(t0) AS signup_ts, max(t1) AS view_ts, max(t2) AS purchase_ts,
        |  CASE WHEN max(t2) IS NOT NULL THEN 3 WHEN max(t1) IS NOT NULL THEN 2
        |       WHEN max(t0) IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM w3 GROUP BY user_id""".stripMargin,
    "q74_retention" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        | c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
        |   FROM d)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM c GROUP BY cohort_day, day_offset""".stripMargin,
    // q75/q76: 5-gram spans, distinct within each doc (document
    // frequency); the coverage face re-derives the same df set
    "q75_boilerplate" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        |    THEN list_transform(range(0, len(toks) - 4), i -> array_to_string(toks[i+1:i+5], ' '))
        |    ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        |SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
        |HAVING count(*) >= 2""".stripMargin,
    "q76_boiler_coverage" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        |    THEN list_transform(range(0, len(toks) - 4), i -> array_to_string(toks[i+1:i+5], ' '))
        |    ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        | b AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2),
        | hits AS (SELECT doc_id, count(*) AS n_boiler FROM sh
        |   WHERE shingle IN (SELECT shingle FROM b) GROUP BY doc_id),
        | tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id)
        |SELECT tot.doc_id, n_shingles, CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler,
        |  round(CAST(coalesce(n_boiler, 0) AS DOUBLE) / n_shingles, 4) AS boiler_frac
        |FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id""".stripMargin,
    // q77: fixed 32-token windows; both engines clamp a trailing
    // partial slice the same way
    "q77_chunk_dedup" ->
      """WITH c AS (SELECT doc_id,
        |    unnest(list_transform(range(0, CAST(ceil(len(toks) / 32.0) AS INTEGER)),
        |      i -> md5(array_to_string(toks[i*32+1:i*32+32], ' ')))) AS chunk_md5
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        |SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // q78: integer-only rate math (⌊√n·1000⌋ weights, basis-point
    // integer division) so both engines derive identical rates
    "q78_lang_temperature" ->
      """WITH s AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        | w AS (SELECT lang, n_l, CAST(floor(sqrt(n_l) * 1000) AS BIGINT) AS w_l FROM s),
        | t AS (SELECT CAST(sum(n_l) AS BIGINT) AS n_total,
        |              CAST(sum(w_l) AS BIGINT) AS w_total FROM w),
        | r AS (SELECT lang, least(CAST(10000 AS BIGINT),
        |     ((n_total // 2) * w_l * 10000) // (w_total * n_l)) AS rate_bp FROM w, t)
        |SELECT d.doc_id, d.lang,
        |  CAST('0x' || substr(md5('temp-' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 10000 AS mix_bp,
        |  r.rate_bp
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE CAST('0x' || substr(md5('temp-' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 10000 < r.rate_bp""".stripMargin,
    // q80: product quantization replayed end to end — per-subspace
    // nearest-centroid encode (ties to smallest centroid id), ADC
    // scoring with the 16-term sum pivoted per subspace (so both
    // engines add the same 6-dp values in the same left-associated
    // order), shortlist, then exact-dot re-rank
    "q80_pq_ann" -> {
      val m = graft.operators.Similarity.PqSubspaces
      val cb = graft.operators.Similarity.PqCodebook
      val sl = graft.operators.Similarity.PqShortlist
      val sub = 64 / m
      val pivot = (0 until m)
        .map(s => s"max(CASE WHEN s = $s THEN sim END)").mkString(" + ")
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cent
         |               FROM embeddings WHERE vec_id < $cb),
         | sub AS (SELECT unnest(range(0, $m)) AS s),
         | sims AS (
         |  SELECT e.vec_id, sub.s, c.cid,
         |    round(list_sum(list_transform(range(1, ${sub + 1}),
         |      i -> CAST(e.embedding[sub.s*$sub+i] AS DOUBLE)
         |         * CAST(c.cent[sub.s*$sub+i] AS DOUBLE))), 6) AS sim
         |  FROM embeddings e CROSS JOIN sub CROSS JOIN cents c),
         | ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id, s
         |                       ORDER BY sim DESC, cid ASC) AS rnk FROM sims),
         | codes AS (SELECT vec_id AS cand_id, s, cid AS code FROM ranked WHERE rnk = 1),
         | adc AS (SELECT vec_id AS query_id, s, cid, sim FROM sims WHERE vec_id < 10),
         | terms AS (
         |  SELECT a.query_id, k.cand_id, a.s, a.sim
         |  FROM codes k JOIN adc a ON a.s = k.s AND a.cid = k.code
         |  WHERE a.query_id <> k.cand_id),
         | pairsum AS (
         |  SELECT query_id, cand_id, round($pivot, 6) AS adc_sim
         |  FROM terms GROUP BY query_id, cand_id),
         | short AS (SELECT query_id, cand_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_sim DESC, cand_id ASC) AS slr FROM pairsum)
         |  WHERE slr <= $sl),
         | rr AS (
         |  SELECT s.query_id, s.cand_id,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), 6) AS sim
         |  FROM short s
         |  JOIN embeddings q ON q.vec_id = s.query_id
         |  JOIN embeddings c ON c.vec_id = s.cand_id),
         | r AS (SELECT query_id, cand_id, sim,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY sim DESC, cand_id ASC) AS rank
         |       FROM rr)
         |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin
    },
    // q82: the full BPE trainer replayed in SQL — k unrolled layers,
    // each: pair counts over the current vocab, argmax (count desc,
    // then lexicographic), and the greedy leftmost-first merge as a
    // per-word recursive scan (position i jumps 2 on a match, the
    // merged symbol's name differs from lhs so no double-merge)
    "q82_bpe_merges" -> {
      val iters = graft.operators.TextOps.BpeIters
      val layers = Seq(
        """v0 AS (
          |  SELECT wf, list_filter(string_split(word, ''), c -> c <> '') AS syms FROM (
          |    SELECT word, count(*) AS wf FROM
          |      (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          |    GROUP BY word))""".stripMargin) ++
        (1 to iters).flatMap { i =>
          val p = i - 1
          Seq(
            s"""p$i AS (
               |  SELECT syms[j] AS lhs, syms[j+1] AS rhs, CAST(sum(wf) AS BIGINT) AS pair_count
               |  FROM (SELECT wf, syms, unnest(range(1, len(syms))) AS j
               |        FROM v$p WHERE len(syms) >= 2)
               |  GROUP BY lhs, rhs)""".stripMargin,
            s"""t$i AS (
               |  SELECT $i AS iter, lhs, rhs, pair_count FROM p$i
               |  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1)""".stripMargin,
            s"""m$i AS (
               |  SELECT v.wf, v.syms, 1 AS i, CAST([] AS VARCHAR[]) AS acc, t.lhs, t.rhs
               |  FROM v$p v, t$i t
               |  UNION ALL
               |  SELECT wf, syms,
               |    CASE WHEN i < len(syms) AND syms[i] = lhs AND syms[i+1] = rhs
               |         THEN i+2 ELSE i+1 END,
               |    CASE WHEN i < len(syms) AND syms[i] = lhs AND syms[i+1] = rhs
               |         THEN list_append(acc, lhs || rhs) ELSE list_append(acc, syms[i]) END,
               |    lhs, rhs
               |  FROM m$i WHERE i <= len(syms))""".stripMargin,
            s"""v$i AS (
               |  SELECT wf, acc AS syms FROM m$i WHERE i = len(syms) + 1)""".stripMargin)
        }
      val union = (1 to iters).map(i => s"SELECT * FROM t$i").mkString(" UNION ALL ")
      "WITH RECURSIVE " + layers.mkString(",\n ") + "\n" + union
    },
    // q81: count-min sketch replay — md5 cell hashes, cell sums, and
    // the depth-min estimate; integer aggregates cast to BIGINT
    "q81_cms_frequencies" -> {
      val (depth, width) = (graft.operators.TextOps.CmsDepth,
        graft.operators.TextOps.CmsWidth)
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         | tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
         | cells AS (SELECT token, tf, d.d,
         |     CAST('0x' || substr(md5('cms' || d.d || '-' || token), 1, 15) AS BIGINT)
         |       % $width AS cell
         |   FROM tf, (SELECT unnest(range(0, $depth)) AS d) d),
         | sketch AS (SELECT d, cell, CAST(sum(tf) AS BIGINT) AS cnt
         |            FROM cells GROUP BY d, cell),
         | est AS (SELECT token, min(cnt) AS est
         |         FROM cells JOIN sketch USING (d, cell) GROUP BY token)
         |SELECT token, tf, est FROM tf JOIN est USING (token)
         |ORDER BY tf DESC, token ASC LIMIT 50""".stripMargin
    },
    // q79: add-1-smoothed unigram log-ratio, target = quality ≥ 0.66;
    // per-token ratios pinned to the 1e-6 grid then summed as INTEGER
    // micro-units, per-doc mean floor-truncated at 4 dp — round(avg, 4)
    // of 6 dp values hits half-ties that split HALF_UP vs half-even
    "q79_importance_score" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw FROM documents),
         | q AS (SELECT doc_id, $qualityExpr AS quality, toks FROM d),
         | tok AS (SELECT doc_id, quality, unnest(toks) AS token FROM q),
         | c AS (SELECT token, count(*) AS cc FROM tok GROUP BY token),
         | tc AS (SELECT token, count(*) AS ct FROM tok WHERE quality >= 0.66 GROUP BY token),
         | s AS (SELECT CAST(sum(cc) AS BIGINT) AS c_tot, CAST(count(*) AS BIGINT) AS vocab FROM c),
         | st AS (SELECT CAST(sum(ct) AS BIGINT) AS t_tot FROM tc),
         | lr AS (SELECT c.token, CAST(round(
         |    round(ln(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / CAST(st.t_tot + s.vocab AS DOUBLE))
         |        - ln(CAST(c.cc + 1 AS DOUBLE) / CAST(s.c_tot + s.vocab AS DOUBLE)), 6)
         |    * 1000000, 0) AS BIGINT) AS lr_u
         |  FROM c LEFT JOIN tc ON c.token = tc.token, s, st)
         |SELECT doc_id, count(*) AS n_tokens,
         |  floor(sum(lr_u) / (count(*) * 100.0)) / 10000.0 AS score
         |FROM tok JOIN lr USING (token) GROUP BY doc_id""".stripMargin,
    "q61_vocabulary" ->
      """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY tf DESC, token ASC
        |LIMIT 100""".stripMargin,
    // q62: replay the int8 quantizer (stored code = level − 128, TINYINT)
    // + decomposed integer dot exactly
    "q62_quantized_ann" ->
      """WITH st AS (SELECT vec_id, embedding,
        |    list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
        |    (list_max(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        |     - list_min(list_transform(embedding, x -> CAST(x AS DOUBLE)))) / 255.0 AS scale
        |  FROM embeddings),
        | z AS (SELECT vec_id, mn, scale,
        |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN CAST(-128 AS TINYINT)
        |      ELSE CAST(round((CAST(x AS DOUBLE) - mn) / scale) - 128 AS TINYINT) END) AS qv
        |  FROM st),
        | w AS (SELECT vec_id, mn, scale, qv,
        |    CAST(list_sum(list_transform(qv, c -> CAST(c AS BIGINT) + 128)) AS BIGINT) AS sq
        |  FROM z),
        | qq AS (SELECT vec_id AS query_id, mn AS mn_a, scale AS s_a, qv AS qa,
        |    sq AS sqa FROM w WHERE vec_id < 10),
        | cc AS (SELECT vec_id AS cand_id, mn AS mn_b, scale AS s_b, qv AS qb,
        |    sq AS sqb FROM w),
        | s AS (SELECT query_id, cand_id,
        |    round(CAST(len(qa) AS DOUBLE) * mn_a * mn_b + mn_a * s_b * sqb + mn_b * s_a * sqa
        |      + s_a * s_b * CAST(list_sum(list_transform(range(1, 65),
        |          i -> (CAST(qa[i] AS BIGINT) + 128) * (CAST(qb[i] AS BIGINT) + 128))) AS BIGINT), 6) AS sim
        |  FROM cc JOIN qq ON cand_id <> query_id),
        | r AS (SELECT query_id, cand_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, cand_id ASC) AS rank FROM s)
        |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    // q83: full HyperLogLog replay — md5 register/rho split, integer
    // 2^(53−rho) register sum (order-independent), the numerator
    // interpolated as ONE double literal (a bare 0.7213 would be
    // DECIMAL in DuckDB), linear-counting branch on integers
    "q83_hll_distinct" -> {
      val m = graft.operators.Sketches.HllRegisters
      val rb = graft.operators.Sketches.HllRegisterBits
      val w1 = graft.operators.Sketches.HllRestBits + 1
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
         | h AS (SELECT source, token,
         |    CAST('0x' || substr(md5('hll-' || token), 1, 15) AS BIGINT) AS h FROM tok),
         | rr AS (SELECT source, h % $m AS reg,
         |    CASE WHEN (h >> $rb) = 0 THEN $w1
         |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
         | regs AS (SELECT source, reg, max(rho) AS mrho FROM rr GROUP BY source, reg),
         | s AS (SELECT source, CAST(count(*) AS BIGINT) AS m_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - mrho)) AS BIGINT) AS sumpow
         |  FROM regs GROUP BY source),
         | e AS (SELECT source, m_hit, $m - m_hit AS zeros,
         |    sumpow + ($m - m_hit) * (CAST(1 AS BIGINT) << 53) AS raw FROM s),
         | est AS (SELECT source, m_hit,
         |    CASE WHEN zeros > 0
         |           AND ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) <= ${2.5 * m}
         |      THEN ${m.toDouble} * ln(${m.toDouble} / zeros)
         |      ELSE ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) END AS est
         |  FROM e),
         | t AS (SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS true_distinct
         |  FROM tok GROUP BY source)
         |SELECT source, m_hit, round(est, 2) AS est_distinct, true_distinct
         |FROM est JOIN t USING (source)""".stripMargin
    },
    // q86: bloom replay — the oracle probes the distinct-bit SET
    // directly (the engine's 64-word bitmap literal is the same set)
    "q86_bloom_prune" -> {
      val bb = graft.operators.Sketches.BloomBits
      def bit(i: Int, key: String) =
        s"CAST('0x' || substr(md5('bloom$i-' || CAST($key AS VARCHAR)), 1, 15) AS BIGINT) % $bb"
      s"""WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         | bits AS (SELECT DISTINCT ${bit(0, "c_custkey")} AS bit FROM dim
         |   UNION SELECT DISTINCT ${bit(1, "c_custkey")} FROM dim
         |   UNION SELECT DISTINCT ${bit(2, "c_custkey")} FROM dim),
         | o AS (SELECT o_orderkey, o_custkey,
         |    ${bit(0, "o_custkey")} AS b0, ${bit(1, "o_custkey")} AS b1,
         |    ${bit(2, "o_custkey")} AS b2 FROM orders),
         | p AS (SELECT o_orderkey FROM o
         |   WHERE b0 IN (SELECT bit FROM bits) AND b1 IN (SELECT bit FROM bits)
         |     AND b2 IN (SELECT bit FROM bits)),
         | tm AS (SELECT count(*) AS n_true FROM orders
         |   WHERE o_custkey IN (SELECT c_custkey FROM dim))
         |SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_orders,
         |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_bloom_pass,
         |  CAST(n_true AS BIGINT) AS n_true,
         |  CAST((SELECT count(*) FROM p) - n_true AS BIGINT) AS n_false_pos
         |FROM tm""".stripMargin
    },
    // q84: TF-IDF replay — idf pinned to the 1e-6 grid, scores as
    // integer micro-units before the per-doc top-3 rank
    "q84_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         | tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |   FROM tok GROUP BY doc_id, token),
         | df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
         | n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         | s AS (SELECT doc_id, tf.token AS token, tf,
         |    CAST(round(CAST(tf AS DOUBLE)
         |      * round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6)
         |      * 1000000, 0) AS BIGINT) AS score_u
         |   FROM tf JOIN df USING (token), n),
         | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score_u DESC, token ASC) AS rnk FROM s)
         |SELECT doc_id, token, tf, score_u FROM r
         |WHERE rnk <= ${graft.operators.Relevance.TfIdfTopK}""".stripMargin,
    // q85: PMI replay — same bigram construction as q72, counts
    // joined on both words, micro-unit score, deterministic top-30
    "q85_pmi_collocations" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         | uni AS (SELECT unnest(toks) AS token FROM d),
         | c AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY token),
         | tot AS (SELECT CAST(count(*) AS BIGINT) AS t_total FROM uni),
         | g AS (SELECT unnest(list_transform(range(0, len(toks) - 1),
         |      i -> array_to_string(toks[i+1:i+2], ' '))) AS bigram
         |   FROM d WHERE len(toks) >= 2),
         | cab AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab FROM g GROUP BY bigram
         |   HAVING count(*) >= ${graft.operators.Relevance.PmiMinCount}),
         | p AS (SELECT bigram, c_ab,
         |    CAST(round(round(ln((CAST(c_ab AS DOUBLE) * CAST(t_total AS DOUBLE))
         |        / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))), 6)
         |      * 1000000, 0) AS BIGINT) AS pmi_u
         |   FROM cab, tot
         |   JOIN c ca ON string_split(cab.bigram, ' ')[1] = ca.token
         |   JOIN c cb ON string_split(cab.bigram, ' ')[2] = cb.token)
         |SELECT bigram, c_ab, pmi_u FROM p
         |ORDER BY pmi_u DESC, bigram ASC
         |LIMIT ${graft.operators.Relevance.PmiTopK}""".stripMargin,
    // q87: percentile_disc replay via the explicit rank formula —
    // value at sorted position ceil(p·n/100), no engine built-in
    "q87_token_percentiles" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        | r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY n ASC, doc_id ASC) AS rn FROM d),
        | c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY source),
        | q AS (SELECT source, n_docs, unnest([25, 50, 75, 90]) AS pct FROM c),
        | p AS (SELECT source, pct,
        |    CAST(ceil(pct * n_docs / 100.0) AS BIGINT) AS pos FROM q)
        |SELECT r.source, p.pct, r.n AS n_tokens
        |FROM p JOIN r ON r.source = p.source AND r.rn = p.pos""".stripMargin,
    // q88: lag-window transition replay; probabilities as integer
    // micro-units (floor division) — no float in the output row
    "q88_markov_transitions" ->
      """WITH l AS (SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        | c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n FROM l
        |   WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
        | t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS tot FROM c)
        |SELECT prev_type, next_type, n, CAST(n * 1000000 // tot AS BIGINT) AS prob_u
        |FROM t""".stripMargin,
    // q89: CUBE replay — revenue in integer cents so the sum is exact
    "q89_order_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    // q90: z-scores from exact integer moments — daily cents via
    // floor (tie-free), Σx² exact (HUGEINT here, DECIMAL(38) in the
    // engine), identical double formula on identical integers
    "q90_value_anomalies" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, day),
        | st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx_d
        |  FROM daily GROUP BY event_type)
        |SELECT event_type, day, x AS x_cents,
        |  CAST(round(round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * sxx_d - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        |    * 1000000, 0) AS BIGINT) AS z_u
        |FROM daily JOIN st USING (event_type)
        |WHERE n > 1
        |  AND CAST(n AS DOUBLE) * sxx_d - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0""".stripMargin,
    // q91: revenue as exact integer cent-percents — price→cents and
    // discount→percent convert tie-free (2-dp inputs), no double sum
    "q91_top_customer_revenue" ->
      """WITH li AS (SELECT l_orderkey AS o_orderkey,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_cp
        |  FROM lineitem WHERE year(l_shipdate) = 1996),
        | j AS (SELECT c.c_custkey, c.c_name, rev_cp
        |   FROM li JOIN orders o USING (o_orderkey)
        |   JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(rev_cp) AS BIGINT) AS revenue_cp
        |FROM j GROUP BY c_custkey, c_name
        |ORDER BY revenue_cp DESC, c_custkey ASC
        |LIMIT 10""".stripMargin,
    // q92: ntile(4) best-quality-first within source, SQL-standard
    // bucket semantics on both engines
    "q92_quality_quartiles" ->
      s"""WITH $docMetricsCte
         |SELECT doc_id, source, quality,
         |  CAST(ntile(4) OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS quartile
         |FROM m""".stripMargin,
    // q94: two stacked lags over the (ts, event_id)-ordered user
    // window, |types|³ aggregate, deterministic top-20
    "q94_event_trigrams" ->
      """WITH l AS (SELECT event_type,
        |    lag(event_type, 1) OVER win AS p1,
        |    lag(event_type, 2) OVER win AS p2
        |  FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT p2 AS step1, p1 AS step2, event_type AS step3,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM l WHERE p2 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n DESC, step1 ASC, step2 ASC, step3 ASC
        |LIMIT 20""".stripMargin,
    // q93: explicit-value pivot ≡ filtered counts per known type
    "q93_event_pivot" -> {
      val cols = graft.operators.Relational.EventTypes.map(t =>
        s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS $t").mkString(",\n        |  ")
      s"""SELECT CAST(ts AS DATE) AS day,
         |  $cols
         |FROM events GROUP BY day""".stripMargin
    },
    // q95: log-bucket quantile sketch replay — bucket, rank and
    // midpoint all integer-exact, so the only cross-engine risk
    // (double log/pow) never appears
    "q95_log_quantiles" -> {
      val ps = graft.operators.Sketches.QuantilePs.map(p => s"($p)").mkString(",")
      s"""WITH n AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |   FROM documents),
         | h AS (SELECT source, CAST(length(bin(n)) - 1 AS INTEGER) AS b,
         |    CAST(count(*) AS BIGINT) AS c FROM n GROUP BY source, b),
         | ct AS (SELECT source, b, c,
         |    CAST(sum(c) OVER (PARTITION BY source ORDER BY b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS total FROM h),
         | pr AS (SELECT source, b, c, cum, total, p
         |   FROM ct CROSS JOIN (VALUES $ps) AS ps(p))
         |SELECT source, p, b AS bucket,
         |  (3 * (CAST(1 AS BIGINT) << b) - 1) // 2 AS est_tokens
         |FROM pr
         |WHERE cum >= (p * total + 99) // 100 AND cum - c < (p * total + 99) // 100""".stripMargin
    },
    // q96: RANGE (time-interval) frame over all events, purchase slice
    // taken AFTER windowing — a WHERE would narrow the frames
    "q96_rolling_rates" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        | w AS (SELECT user_id, event_id, ts, event_type,
        |    CAST(count(*) OVER win AS BIGINT) AS n_1h,
        |    CAST(SUM(cents) OVER win AS BIGINT) AS cents_1h
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts, n_1h, cents_1h
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    // q97: the regexes interpolate from TextOps.PiiPatterns (the
    // RE2 ∩ java.util.regex dialect) — counts against the original
    // text, replacements applied in the operator's category order,
    // DuckDB's 'g' flag matching Spark's replace-all default
    "q97_pii_scrub" -> {
      val ps = graft.operators.TextOps.PiiPatterns
      val counts = ps.map { case (name, re, _) =>
        s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$name" }
        .mkString(",\n        |  ")
      val cleaned = ps.foldLeft("text") { case (expr, (_, re, token)) =>
        s"regexp_replace($expr, '$re', '$token', 'g')" }
      s"""SELECT doc_id,
        |  $counts,
        |  $cleaned AS clean_text
        |FROM documents""".stripMargin
    },
    "q98_packed_chunks" -> {
      val groups = graft.operators.TextOps.PackGroups
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5('pack-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % $groups AS pack_group,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         | c AS (SELECT doc_id, pack_group, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM t)
         |SELECT pack_group, chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
         |  array_to_string(list_transform(list_sort(list(doc_id)),
         |    x -> CAST(x AS VARCHAR)), '-') AS doc_ids
         |FROM (SELECT doc_id, pack_group, n_tokens,
         |        CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id FROM c) g
         |GROUP BY pack_group, chunk_id""".stripMargin
    },
    // q99: one SELECT per column, same normalization as the operator
    // (doubles → floor-cents, timestamps → epoch micros — raw
    // double→string shortest-repr printing is engine-specific)
    "q99_profile" -> {
      val cols = Seq(("o_orderkey", "int"), ("o_custkey", "int"),
        ("o_orderstatus", "str"), ("o_totalprice", "dbl"),
        ("o_orderdate", "ts"), ("o_orderpriority", "str"))
      cols.map { case (c, kind) =>
        val b = kind match {
          case "dbl" => s"CAST(floor($c * 100) AS BIGINT)"
          case "ts"  => s"epoch_us($c)"
          case _     => c
        }
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($b) AS VARCHAR) AS min_norm,
           |  CAST(max($b) AS VARCHAR) AS max_norm
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    // q100: SemDeDup replay — cell assignment under the first-16
    // codebook (identical to q46's), then the greedy within-cell
    // lowest-id-survives rule at the shared threshold
    "q100_semdedup" ->
      s"""WITH $SemDedupCtes
         |SELECT v.vec_id, v.centroid_id, d.vec_id IS NULL AS is_kept
         |FROM sem_assigned v LEFT JOIN sem_dropped d ON v.vec_id = d.vec_id""".stripMargin,
    // q101/q102: SCD2 versioning + point-in-time probe — same
    // (ts, event_id) tie-break as every event window; zero-width
    // versions (same-ts updates) are unmatched by construction
    "q101_scd2_versions" -> Scd2Cte,
    "q102_pit_join" ->
      s"""WITH dim AS ($Scd2Cte)
         |SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts,
         |  d.value AS value_at_view, d.version_seq
         |FROM events v JOIN dim d ON v.user_id = d.user_id
         |  AND d.valid_from <= v.ts AND (d.valid_to IS NULL OR v.ts < d.valid_to)
         |WHERE v.event_type = 'view'""".stripMargin,
    // q103: crawl-version reconciliation — derived old/new snapshots,
    // full-outer content-hash merge
    "q103_snapshot_diff" ->
      """WITH vold AS (SELECT doc_id, md5(text) AS old_md5 FROM documents
        |              WHERE doc_id % 11 <> 3),
        | vnew AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 17 = 2 THEN text || ' rev2' ELSE text END) AS new_md5
        |  FROM documents WHERE doc_id % 13 <> 5)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN old_md5 <> new_md5 THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  old_md5, new_md5
        |FROM vold o FULL OUTER JOIN vnew n ON o.doc_id = n.doc_id""".stripMargin,
    // q104: Morton key replay, term-for-term (list_sum types HUGEINT —
    // cast back; the shifts stay in BIGINT via the explicit CAST(1))
    "q104_zorder_keys" ->
      """WITH k AS (SELECT event_id, user_id & 65535 AS z_user,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS z_day
        |  FROM events)
        |SELECT event_id, z_user, z_day,
        |  CAST(list_sum(list_transform(range(0, 16), i ->
        |    ((z_user >> i) & 1) * (CAST(1 AS BIGINT) << (2*i)) +
        |    ((z_day >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1)))) AS BIGINT) AS zval,
        |  CAST(list_sum(list_transform(range(0, 16), i ->
        |    ((z_user >> i) & 1) * (CAST(1 AS BIGINT) << (2*i)) +
        |    ((z_day >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1)))) AS BIGINT) >> 24
        |    AS zbucket
        |FROM k""".stripMargin,
    // q105: q46's replay + the label constraint as a join key, nprobe 6
    "q105_filtered_ann" ->
      """WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
        |               FROM embeddings WHERE vec_id < 16),
        | sims AS (
        |  SELECT e.vec_id, e.embedding, e.label, c.centroid_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6) AS cent_sim
        |  FROM embeddings e CROSS JOIN cents c),
        | ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY cent_sim DESC, centroid_id ASC) AS cell_rank
        |  FROM sims),
        | assigned AS (SELECT vec_id AS cand_id, embedding AS cv, label, centroid_id
        |              FROM ranked WHERE cell_rank = 1),
        | probes AS (SELECT vec_id AS query_id, embedding AS qv, label, centroid_id
        |            FROM ranked WHERE vec_id < 10 AND cell_rank <= 6),
        | scored AS (
        |  SELECT query_id, cand_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
        |  FROM probes JOIN assigned USING (centroid_id, label)
        |  WHERE query_id <> cand_id),
        | r AS (SELECT query_id, cand_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, cand_id ASC) AS rank
        |       FROM scored)
        |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    // q106: q105's probe with the label constraint flipped to an
    // inequality residual — hard negatives for contrastive training
    "q106_hard_negatives" ->
      """WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
        |               FROM embeddings WHERE vec_id < 16),
        | sims AS (
        |  SELECT e.vec_id, e.embedding, e.label, c.centroid_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6) AS cent_sim
        |  FROM embeddings e CROSS JOIN cents c),
        | ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY cent_sim DESC, centroid_id ASC) AS cell_rank
        |  FROM sims),
        | assigned AS (SELECT vec_id AS cand_id, embedding AS cv, label AS c_label, centroid_id
        |              FROM ranked WHERE cell_rank = 1),
        | probes AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label, centroid_id
        |            FROM ranked WHERE vec_id < 10 AND cell_rank <= 6),
        | scored AS (
        |  SELECT query_id, cand_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
        |  FROM probes JOIN assigned USING (centroid_id)
        |  WHERE q_label <> c_label),
        | r AS (SELECT query_id, cand_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, cand_id ASC) AS rank
        |       FROM scored)
        |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    // q107: overlapping retrieval chunks — DuckDB list slices are
    // 1-based inclusive; Spark slice(start, length) truncates at the
    // array end the same way
    "q107_rag_chunks" -> {
      val (w, s) = (graft.operators.TextOps.ChunkWidth, graft.operators.TextOps.ChunkStride)
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         | c AS (SELECT doc_id, toks,
         |    unnest(range(0, CAST(ceil(len(toks) / $s.0) AS INTEGER))) AS chunk_idx
         |  FROM t)
         |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         |  CAST(len(toks[chunk_idx*$s + 1 : least(chunk_idx*$s + $w, len(toks))]) AS INTEGER)
         |    AS n_tokens,
         |  md5(array_to_string(toks[chunk_idx*$s + 1 : least(chunk_idx*$s + $w, len(toks))],
         |    ' ')) AS chunk_md5
         |FROM c""".stripMargin
    },
    // q108: the q49 closure's losers rolled up per source
    "q108_dup_rate" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | losers AS (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(l.doc_id) AS BIGINT) AS n_dups,
         |  round(CAST(count(l.doc_id) AS DOUBLE) / count(*), 4) AS dup_rate
         |FROM documents d LEFT JOIN losers l USING (doc_id)
         |GROUP BY d.source""".stripMargin,
    // q109: global quality quartile + salted-md5 shuffle within phase
    "q109_curriculum" ->
      s"""WITH $docMetricsCte,
         | staged AS (SELECT doc_id, quality,
         |    CAST(ntile(4) OVER (ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS phase
         |  FROM m)
         |SELECT doc_id, phase,
         |  CAST(row_number() OVER (PARTITION BY phase
         |    ORDER BY CAST('0x' || substr(md5('curr-' || CAST(doc_id AS VARCHAR)), 1, 15)
         |               AS BIGINT),
         |             doc_id) AS INTEGER) AS position,
         |  quality
         |FROM staged""".stripMargin,
    // q110: top-N corpus vocabulary (q61 tie-break), per-doc OOV mass
    "q110_oov_report" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        | v AS (SELECT token, 1 AS in_v FROM (
        |    SELECT token, count(*) AS tf FROM tok GROUP BY token
        |    ORDER BY tf DESC, token ASC LIMIT ${graft.operators.TextOps.OovVocab})),
        | j AS (SELECT t.doc_id, v.in_v FROM tok t LEFT JOIN v ON t.token = v.token)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(CASE WHEN in_v IS NULL THEN 1 END) AS BIGINT) AS n_oov,
        |  round(CAST(count(CASE WHEN in_v IS NULL THEN 1 END) AS DOUBLE) / count(*), 4)
        |    AS oov_rate
        |FROM j GROUP BY doc_id""".stripMargin,
    // q111: calendar spine × type list, observed counts zero-filled
    "q111_daily_spine" -> {
      val types = graft.operators.Relational.EventTypes
        .map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
         | daily AS (SELECT day, event_type, count(*) AS n FROM d GROUP BY day, event_type),
         | b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
         | spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
         |             AS day FROM b),
         | grid AS (SELECT day, unnest($types) AS event_type FROM spine)
         |SELECT g.day, g.event_type, CAST(coalesce(n, 0) AS BIGINT) AS n_events
         |FROM grid g LEFT JOIN daily USING (day, event_type)""".stripMargin
    },
    // q112: trailing-hour view→purchase attribution, all matching pairs
    "q112_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  v.event_id AS view_id, v.ts AS view_ts
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase'""".stripMargin,
    // q113: exact integer cent-percent money, growth in floor micro-units
    "q113_revenue_trend" ->
      """WITH m AS (
        |  SELECT n.n_name, CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
        |    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) *
        |             (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
        |      AS revenue_cp
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name, month),
        | t AS (SELECT *, lag(revenue_cp) OVER (PARTITION BY n_name ORDER BY month)
        |         AS prev_cp FROM m)
        |SELECT n_name, month, revenue_cp,
        |  revenue_cp - coalesce(prev_cp, 0) AS delta_cp,
        |  CASE WHEN prev_cp IS NULL OR prev_cp = 0 THEN NULL
        |       ELSE revenue_cp * 1000000 // prev_cp END AS growth_u
        |FROM t""".stripMargin,
    // q114: q53's chain ∩ SemDeDup survivors — both CTE families in
    // one recursive statement (sem_-prefixed names keep them disjoint)
    "q114_joint_curate" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | $docMetricsCte,
         | $SemDedupCtes
         |SELECT doc_id, source, quality FROM m
         |WHERE quality >= 0.66 AND guess = 'en'
         |  AND doc_id NOT IN (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)
         |  AND doc_id NOT IN (SELECT vec_id FROM sem_dropped)""".stripMargin,
    // q115: PSI over the q103 crawl versions — Laplace-smoothed integer
    // micro proportions, ln pinned to the 1e-6 grid, 4 dp terms
    "q115_drift_psi" ->
      """WITH vold AS (SELECT least(9, n_chars // 64) AS bucket, count(*) AS n_old
        |  FROM documents WHERE doc_id % 11 <> 3 GROUP BY bucket),
        | vnew AS (SELECT least(9, n_chars // 64) AS bucket, count(*) AS n_new
        |  FROM documents WHERE doc_id % 13 <> 5 GROUP BY bucket),
        | spine AS (SELECT unnest(range(0, 10)) AS bucket),
        | j AS (SELECT s.bucket, coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |   FROM spine s LEFT JOIN vold USING (bucket) LEFT JOIN vnew USING (bucket)),
        | p AS (SELECT *,
        |    (n_old + 1) * 1000000 // (sum(n_old) OVER () + 10) AS p_u,
        |    (n_new + 1) * 1000000 // (sum(n_new) OVER () + 10) AS q_u
        |  FROM j)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_old AS BIGINT) AS n_old,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  CAST(p_u AS BIGINT) AS p_u, CAST(q_u AS BIGINT) AS q_u,
        |  round(CAST(q_u - p_u AS DOUBLE) / 1e6 *
        |    round(ln(CAST(q_u AS DOUBLE) / CAST(p_u AS DOUBLE)), 6), 6) AS psi_term
        |FROM p""".stripMargin,
    // q116: stratified test set + near-dup-cluster exclusion zone
    "q116_clean_split" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | sp_h AS (SELECT doc_id, source,
         |    CAST('0x' || substr(md5('strat-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      AS pick_hash
         |  FROM documents),
         | sp_rank AS (SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY pick_hash, doc_id) AS pick_rank
         |  FROM sp_h),
         | sp_test AS (SELECT doc_id FROM sp_rank WHERE pick_rank <= 12),
         | sp_tc AS (SELECT DISTINCT cluster_id FROM clus
         |           WHERE doc_id IN (SELECT doc_id FROM sp_test)),
         | sp_ex AS (SELECT doc_id FROM clus
         |           WHERE cluster_id IN (SELECT cluster_id FROM sp_tc))
         |SELECT d.doc_id, d.source,
         |  CASE WHEN d.doc_id IN (SELECT doc_id FROM sp_test) THEN 'test'
         |       WHEN d.doc_id IN (SELECT doc_id FROM sp_ex) THEN 'excluded'
         |       ELSE 'train' END AS split
         |FROM documents d""".stripMargin,
    // q117: q83's register replay keyed by calendar day over user ids
    "q117_daily_active" -> {
      val m = graft.operators.Sketches.HllRegisters
      val rb = graft.operators.Sketches.HllRegisterBits
      val w1 = graft.operators.Sketches.HllRestBits + 1
      s"""WITH u AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         | h AS (SELECT day, user_id,
         |    CAST('0x' || substr(md5('dau-' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      AS h FROM u),
         | rr AS (SELECT day, h % $m AS reg,
         |    CASE WHEN (h >> $rb) = 0 THEN $w1
         |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
         | regs AS (SELECT day, reg, max(rho) AS mrho FROM rr GROUP BY day, reg),
         | s AS (SELECT day, CAST(count(*) AS BIGINT) AS m_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - mrho)) AS BIGINT) AS sumpow
         |  FROM regs GROUP BY day),
         | e AS (SELECT day, m_hit, $m - m_hit AS zeros,
         |    sumpow + ($m - m_hit) * (CAST(1 AS BIGINT) << 53) AS raw FROM s),
         | est AS (SELECT day, m_hit,
         |    CASE WHEN zeros > 0
         |           AND ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) <= ${2.5 * m}
         |      THEN ${m.toDouble} * ln(${m.toDouble} / zeros)
         |      ELSE ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) END AS est
         |  FROM e),
         | t AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS true_dau
         |  FROM u GROUP BY day)
         |SELECT day, m_hit, round(est, 2) AS est_dau, true_dau
         |FROM est JOIN t USING (day)""".stripMargin
    },
    // q118: the dhash60 frame signatures grouped corpus-wide — shared
    // (possibly lightly-retouched) footage
    "q118_frame_dedup" ->
      s"""WITH ${dhashCtes(4)}
        |SELECT frame_dhash, CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(min(media_id) AS BIGINT) AS first_media
        |FROM dh GROUP BY frame_dhash
        |HAVING count(DISTINCT media_id) >= 2""".stripMargin,
    // q119: every DQ rule as a violation count; one aggregate, unpivoted
    "q119_dq_report" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(o_custkey) AS BIGINT) AS null_custkey,
        |    CAST(count(CASE WHEN o_totalprice < 0 THEN 1 END) AS BIGINT) AS negative_price,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS duplicate_orderkey,
        |    CAST(count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT)
        |      AS bad_status,
        |    CAST(count(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-01-01'
        |                      OR CAST(o_orderdate AS DATE) >= DATE '2002-01-01'
        |                    THEN 1 END) AS BIGINT) AS date_out_of_window
        |  FROM orders)
        |SELECT 'null_custkey' AS rule, n_rows, null_custkey AS violations,
        |  null_custkey = 0 AS passed FROM a
        |UNION ALL SELECT 'negative_price', n_rows, negative_price, negative_price = 0 FROM a
        |UNION ALL SELECT 'duplicate_orderkey', n_rows, duplicate_orderkey,
        |  duplicate_orderkey = 0 FROM a
        |UNION ALL SELECT 'bad_status', n_rows, bad_status, bad_status = 0 FROM a
        |UNION ALL SELECT 'date_out_of_window', n_rows, date_out_of_window,
        |  date_out_of_window = 0 FROM a""".stripMargin,
    // q120: within-source rank → micro-unit percentile; single-member
    // sources pin to the median
    "q120_quality_percentiles" ->
      s"""WITH $docMetricsCte,
         | r AS (SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality ASC, doc_id ASC) AS rnk,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM m)
         |SELECT doc_id, source, quality,
         |  CAST(CASE WHEN n = 1 THEN 500000
         |            ELSE (rnk - 1) * 1000000 // (n - 1) END AS BIGINT) AS pct_u
         |FROM r""".stripMargin,
    // q121: the closure's per-cluster sizes, histogrammed
    "q121_cluster_sizes" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | sizes AS (SELECT cluster_id, count(*) AS cluster_size
         |           FROM clus GROUP BY cluster_id)
         |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sizes GROUP BY cluster_size""".stripMargin,
    // q122: the dump→restore loop is lossless, so the oracle is the
    // same report straight off the parquet table
    "q122_sqldump_restore" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_totalprice > 150000.0
        |GROUP BY o_orderstatus""".stripMargin,
    "q123_hamming_ann" -> q123Sql,
    "q297_jl_ivf_ann" -> q297Sql,
    // q124: HLL inclusion–exclusion replay — union sums derived from
    // the per-source sums + the common-register join (max-merge means
    // the union keeps max(rho), so subtract the 2^(53−min) terms)
    "q124_vocab_overlap" -> {
      val m = graft.operators.Sketches.HllRegisters
      val rb = graft.operators.Sketches.HllRegisterBits
      val w1 = graft.operators.Sketches.HllRestBits + 1
      val num = graft.operators.Sketches.HllNumerator
      def est(mh: String, sp: String) =
        s"""(CASE WHEN ($m - $mh) > 0
           |    AND $num / CAST($sp + ($m - $mh) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) <= ${2.5 * m}
           |  THEN ${m.toDouble} * ln(${m.toDouble} / ($m - $mh))
           |  ELSE $num / CAST($sp + ($m - $mh) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) END)""".stripMargin
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
         | h AS (SELECT source, token,
         |    CAST('0x' || substr(md5('hll-' || token), 1, 15) AS BIGINT) AS h FROM tok),
         | rr AS (SELECT source, h % $m AS reg,
         |    CASE WHEN (h >> $rb) = 0 THEN $w1
         |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
         | regs AS (SELECT source, reg, max(rho) AS mrho FROM rr GROUP BY source, reg),
         | s AS (SELECT source, CAST(count(*) AS BIGINT) AS m_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - mrho)) AS BIGINT) AS sumpow
         |  FROM regs GROUP BY source),
         | cm AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS m_common,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - least(a.mrho, b.mrho))) AS BIGINT) AS sp_maxterm
         |  FROM regs a JOIN regs b ON a.reg = b.reg AND a.source < b.source
         |  GROUP BY 1, 2),
         | u AS (SELECT source_a, source_b,
         |    sa.m_hit AS mh_a, sa.sumpow AS sp_a,
         |    sb.m_hit AS mh_b, sb.sumpow AS sp_b,
         |    sa.m_hit + sb.m_hit - m_common AS mh_u,
         |    sa.sumpow + sb.sumpow - sp_maxterm AS sp_u
         |  FROM cm JOIN s sa ON sa.source = cm.source_a
         |          JOIN s sb ON sb.source = cm.source_b),
         | x AS (SELECT DISTINCT source, token FROM tok),
         | ov AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS exact_overlap
         |  FROM x a JOIN x b ON a.token = b.token AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT u.source_a, u.source_b,
         |  coalesce(ov.exact_overlap, CAST(0 AS BIGINT)) AS exact_overlap,
         |  round(${est("mh_a", "sp_a")} + ${est("mh_b", "sp_b")}
         |    - ${est("mh_u", "sp_u")}, 2) AS est_overlap
         |FROM u LEFT JOIN ov ON u.source_a = ov.source_a
         |                   AND u.source_b = ov.source_b""".stripMargin
    },
    "q125_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        | n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
        | t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
        | p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab,
        |  (n_ab * 1000000) // n_users AS support_micro,
        |  (n_ab * n_users * 1000000) // (ta.n_t * tb.n_t) AS lift_micro
        |FROM p CROSS JOIN n
        |JOIN t ta ON ta.event_type = p.type_a
        |JOIN t tb ON tb.event_type = p.type_b""".stripMargin,
    // q126: entropy replay — micro-unit probabilities, ln on the 1e-6
    // grid, integer term sums (order-independent on both engines)
    "q126_token_entropy" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        | tf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tf
        |   FROM tok GROUP BY 1, 2),
        | t AS (SELECT source, CAST(sum(tf) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS vocab FROM tf GROUP BY 1),
        | p AS (SELECT tf.source, (tf.tf * 1000000) // t.total AS p_u
        |   FROM tf JOIN t ON t.source = tf.source),
        | e AS (SELECT source, p_u,
        |    CAST(round(ln(p_u / 1000000.0) * 1000000, 0) AS BIGINT) AS ln_u
        |   FROM p WHERE p_u > 0),
        | s AS (SELECT source, CAST(sum(p_u * ln_u) AS BIGINT) AS ssum
        |   FROM e GROUP BY 1)
        |SELECT t.source, total AS n_tokens, vocab,
        |  round(-(ssum / 1e12), 4) AS entropy
        |FROM t JOIN s ON s.source = t.source""".stripMargin,
    // q127: Fano replay — exact integer moments, BIGINT floor division
    "q127_burstiness" ->
      """WITH d AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x FROM documents),
        | st AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
        |   FROM d GROUP BY 1)
        |SELECT source, n, sx,
        |  CASE WHEN n > 1 AND sx > 0
        |    THEN (n * sxx - sx * sx) * 1000000 // ((n - 1) * sx) END AS fano_micro
        |FROM st""".stripMargin,
    // q128: BPE application replay — each literal merge is one jump-2
    // greedy recursive scan (the q82 mining oracle's m$i shape)
    "q128_bpe_encode" ->
      ("WITH RECURSIVE " + bpeEncodeCtes +
        s"""
           |SELECT word, CAST(length(word) AS BIGINT) AS n_chars,
           |  CAST(len(syms) AS BIGINT) AS n_syms,
           |  array_to_string(syms, ' ') AS segmentation FROM v$bpeLastLayer""".stripMargin),
    // q143: fertility — the q128 encode chain rolled up per language,
    // occurrence-weighted, floor-divided micro-units
    "q143_bpe_fertility" ->
      ("WITH RECURSIVE " + bpeEncodeCtes +
        s""",
           | enc AS (SELECT word, CAST(length(word) AS BIGINT) AS n_chars,
           |     CAST(len(syms) AS BIGINT) AS n_syms FROM v$bpeLastLayer),
           | freq AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n_occ
           |   FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
           |   GROUP BY lang, word),
           | agg AS (SELECT lang, CAST(sum(n_occ) AS BIGINT) AS n_words,
           |     CAST(count(*) AS BIGINT) AS n_distinct_words,
           |     CAST(sum(n_occ * n_syms) AS BIGINT) AS n_subwords,
           |     CAST(sum(n_occ * n_chars) AS BIGINT) AS chars
           |   FROM freq JOIN enc USING (word) GROUP BY lang)
           |SELECT lang, n_words, n_distinct_words, n_subwords,
           |  CAST(n_subwords * 1000000 // n_words AS BIGINT) AS fertility_micro,
           |  CAST(chars * 1000000 // n_subwords AS BIGINT) AS chars_per_subword_micro
           |FROM agg""".stripMargin),
    // q129: Q17 replay — decorrelated by hand here (join on the
    // per-part aggregate); the rational 5·q·n < Σq threshold and
    // floor-cents match the Spark form exactly
    "q129_small_quantity" ->
      """WITH l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        | p AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS sq FROM l GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(cents) AS BIGINT) // 7 AS avg_yearly_cents
        |FROM l JOIN p USING (l_partkey) WHERE q * 5 * n < sq""".stripMargin,
    // q131: the EXISTS form verbatim — DuckDB plans its own semi join
    "q131_late_orders" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    // q132: the NOT EXISTS + scalar-subquery form verbatim
    "q132_inactive_rich" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM c
        |WHERE cents * (SELECT CAST(count(*) AS BIGINT) FROM c WHERE cents > 0)
        |      > (SELECT CAST(sum(cents) AS BIGINT) FROM c WHERE cents > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 250000.0)
        |GROUP BY c_mktsegment""".stripMargin,
    // q133: Q15 replay — same floor-cent revenue fold, same max scalar
    "q133_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |             AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.revenue_cents
        |FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM r)""".stripMargin,
    // q134: the q73 funnel CTEs + exact-micro latencies + the q87
    // explicit-rank percentile formula
    "q134_conversion_latency" ->
      """WITH w1 AS (SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t0
        |  FROM events),
        | w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t0 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t1 FROM w1),
        | w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM w2),
        | f AS (SELECT user_id, max(t0) AS t0, max(t2) AS t2
        |   FROM w3 GROUP BY user_id HAVING max(t2) IS NOT NULL),
        | l AS (SELECT user_id,
        |    CAST(epoch_us(t2) - epoch_us(t0) AS BIGINT) AS latency_us FROM f),
        | r AS (SELECT user_id, latency_us,
        |    row_number() OVER (ORDER BY latency_us ASC, user_id ASC) AS rn FROM l),
        | n AS (SELECT CAST(count(*) AS BIGINT) AS n_conv FROM l),
        | p AS (SELECT pct, n_conv,
        |    CAST(ceil(pct * n_conv / 100.0) AS BIGINT) AS pos
        |   FROM (SELECT unnest([25, 50, 75, 90]) AS pct) CROSS JOIN n)
        |SELECT CAST(pct AS INTEGER) AS pct, n_conv, latency_us
        |FROM r JOIN p ON r.rn = p.pos""".stripMargin,
    // q135: isodow is the Monday=1 basis matching Spark's weekday+1;
    // the windowed SUM is cast (DuckDB types it HUGEINT)
    "q135_dow_profile" ->
      """WITH c AS (SELECT isodow(ts) AS dow, event_type,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)
        |SELECT CAST(dow AS INTEGER) AS dow, event_type, n,
        |  (n * 1000000) // CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT)
        |    AS share_micro
        |FROM c""".stripMargin,
    // q136: the approx profiler's md5-HLL registers replayed per
    // column — same register/rho/estimator CTEs as q83, per-column
    // normalization (doubles → floor-cents, ts → epoch micros) as q99
    "q136_profile_approx" -> {
      val m = graft.operators.Sketches.HllRegisters
      val rb = graft.operators.Sketches.HllRegisterBits
      val w1 = graft.operators.Sketches.HllRestBits + 1
      val num = graft.operators.Sketches.HllNumerator
      val cols = Seq(("o_orderkey", "int"), ("o_custkey", "int"),
        ("o_orderstatus", "str"), ("o_totalprice", "dbl"),
        ("o_orderdate", "ts"), ("o_orderpriority", "str"))
      cols.map { case (c, kind) =>
        val b = kind match {
          case "dbl" => s"CAST(floor($c * 100) AS BIGINT)"
          case "ts"  => s"epoch_us($c)"
          case _     => c
        }
        val raw = s"CAST(sumpow + ($m - m_hit) * (CAST(1 AS BIGINT) << 53) AS DOUBLE)"
        s"""SELECT * FROM (
           |WITH h AS (SELECT CAST('0x' || substr(md5('hllc-' || CAST($b AS VARCHAR)), 1, 15) AS BIGINT) AS h
           |           FROM orders WHERE $c IS NOT NULL),
           | rr AS (SELECT h % $m AS reg,
           |    CASE WHEN (h >> $rb) = 0 THEN $w1
           |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
           | regs AS (SELECT reg, max(rho) AS mrho FROM rr GROUP BY reg),
           | s AS (SELECT CAST(count(*) AS BIGINT) AS m_hit,
           |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (53 - mrho)), 0) AS BIGINT) AS sumpow
           |  FROM regs),
           | est AS (SELECT CASE WHEN ($m - m_hit) > 0 AND $num / $raw <= ${2.5 * m}
           |      THEN ${m.toDouble} * ln(${m.toDouble} / ($m - m_hit))
           |      ELSE $num / $raw END AS est FROM s),
           | agg AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |    CAST(min($b) AS VARCHAR) AS min_norm,
           |    CAST(max($b) AS VARCHAR) AS max_norm FROM orders)
           |SELECT '$c' AS col_name, n_rows, n_nulls,
           |  round(est, 2) AS est_distinct, min_norm, max_norm
           |FROM agg CROSS JOIN est
           |)""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    // q137: banded near-dups — the linear-scale twin of q28's exact
    // all-pairs; oracle replays signature + 4x4-bit banding + verify
    "q137_neardup_banded" -> {
      val bandCond = (0 until 4).map { j =>
        s"((x.sig >> ${j * 4}) & 15 = (y.sig >> ${j * 4}) & 15)" }.mkString(" OR ")
      s"""WITH s AS (SELECT vec_id, label, embedding,
         |    ($HyperplaneSigSql) AS sig FROM embeddings)
         |SELECT vec_a, vec_b, label, sim FROM (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.label AS label,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))), 6) AS sim
         |  FROM s x JOIN s y ON x.label = y.label AND x.vec_id < y.vec_id
         |    AND ($bandCond))
         |WHERE sim >= 0.4""".stripMargin
    },
    // q138: connected components over q137's banded pair graph —
    // banded-pair replay composed with the shared closure CTEs
    "q138_banded_clusters" -> {
      val bandCond = (0 until 4).map { j =>
        s"((x.sig >> ${j * 4}) & 15 = (y.sig >> ${j * 4}) & 15)" }.mkString(" OR ")
      s"""WITH RECURSIVE sg AS (SELECT vec_id, label, embedding,
         |    ($HyperplaneSigSql) AS sig FROM embeddings),
         | pairs AS (
         |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
         |  FROM sg x JOIN sg y ON x.label = y.label AND x.vec_id < y.vec_id
         |    AND ($bandCond)
         |  WHERE round(list_sum(list_transform(range(1, 65),
         |    i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))), 6) >= 0.4),
         | $ccCtes
         |SELECT doc_id AS vec_id, cluster_id,
         |  doc_id = cluster_id AS is_canonical FROM clus""".stripMargin
    },
    // q139: the footer zone-map stats must equal the DATA's min/max —
    // exactly the property row-group pruning relies on
    "q139_zone_stats" -> {
      val cols = Seq(("o_orderkey", "int"), ("o_custkey", "int"),
        ("o_orderstatus", "str"), ("o_totalprice", "dbl"),
        ("o_orderdate", "ts"), ("o_orderpriority", "str"))
      cols.map { case (c, kind) =>
        def b(agg: String) = kind match {
          case "dbl" => s"CAST(CAST(floor($agg($c) * 100) AS BIGINT) AS VARCHAR)"
          case "ts"  => s"CAST($agg(epoch_us($c)) AS VARCHAR)"
          case _     => s"CAST($agg($c) AS VARCHAR)"
        }
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  ${b("min")} AS min_norm, ${b("max")} AS max_norm
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    // q140: q88's transition CTEs + the power iteration UNROLLED as 25
    // chained CTEs (aggregating over a recursive CTE reference is not
    // portable SQL) — per-term floor division, the engine's exact math.
    // Every step is MATERIALIZED: inlined, the 25-step chain becomes
    // one ~50-relation join tree and DuckDB's join-order search never
    // returns; materialized, it is 25 tiny sequential joins.
    "q140_markov_stationary" -> {
      val iters = 25
      val steps = (1 to iters).map { i =>
        s"""s$i AS MATERIALIZED (SELECT t.next_type AS type,
           |    CAST(sum(s${i - 1}.pi * t.p // 1000000) AS BIGINT) AS pi
           |  FROM s${i - 1} JOIN t ON t.prev_type = s${i - 1}.type
           |  GROUP BY t.next_type)""".stripMargin
      }.mkString(",\n ")
      s"""WITH l AS (SELECT event_type AS next_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
         |  FROM events),
         | c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n FROM l
         |   WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
         | t AS MATERIALIZED (SELECT prev_type, next_type,
         |    CAST(n * 1000000 // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
         |      AS BIGINT) AS p FROM c),
         | ty AS MATERIALIZED (SELECT DISTINCT type FROM
         |   (SELECT prev_type AS type FROM t UNION SELECT next_type FROM t)),
         | s0 AS MATERIALIZED (SELECT type,
         |    CAST(1000000 // (SELECT count(*) FROM ty) AS BIGINT) AS pi
         |   FROM ty),
         | $steps
         |SELECT ty.type AS event_type,
         |  CAST(coalesce(s$iters.pi, 0) AS BIGINT) AS stationary_micro
         |FROM ty LEFT JOIN s$iters ON s$iters.type = ty.type""".stripMargin
    },
    // q141: the chunk-rewrite replay — same 32-token windows as q77,
    // an occurrence survives iff its hash is corpus-unique or this doc
    // is the min-doc_id owner; survivors reassemble in position order.
    // Docs rewritten to nothing stay present with clean_text = ''.
    "q141_chunk_rewrite" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | lst AS (SELECT doc_id,
        |    list_transform(range(0, CAST(ceil(len(toks) / 32.0) AS INTEGER)),
        |      i -> {'pos': i,
        |            'h': md5(array_to_string(toks[i*32+1:i*32+32], ' ')),
        |            'body': array_to_string(toks[i*32+1:i*32+32], ' ')}) AS cs
        |   FROM d),
        | u AS (SELECT doc_id, unnest(cs) AS c FROM lst),
        | occ AS (SELECT doc_id, c.pos AS pos, c.h AS h, c.body AS body FROM u),
        | dups AS (SELECT h, min(doc_id) AS first_doc FROM occ
        |   GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        | kept AS (SELECT o.doc_id, o.pos, o.body
        |   FROM occ o LEFT JOIN dups ON o.h = dups.h
        |   WHERE dups.h IS NULL OR o.doc_id = dups.first_doc),
        | reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_chunks,
        |    array_to_string(list(body ORDER BY pos), ' ') AS clean_text
        |   FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(ceil(len(d.toks) / 32.0) AS BIGINT) AS n_chunks,
        |  CAST(coalesce(reb.kept_chunks, 0) AS BIGINT) AS kept_chunks,
        |  coalesce(reb.clean_text, '') AS clean_text
        |FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id""".stripMargin,
    "q142_minhash_calibration" -> q142Sql,
    // q144: quality-aware survivor selection — q49's closure joined to
    // the shared doc-metrics quality, best-quality member survives
    // (ties → min doc_id, the canonical fallback)
    "q144_quality_survivors" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | $docMetricsCte
         |SELECT c.doc_id, c.cluster_id, m.quality,
         |  row_number() OVER (PARTITION BY c.cluster_id
         |                     ORDER BY m.quality DESC, c.doc_id ASC) = 1 AS is_survivor
         |FROM clus c JOIN m ON c.doc_id = m.doc_id""".stripMargin,
    // q172: q49's closure + the docMetrics quality on the 1e-4 grid,
    // per-cluster dispersion and the canonical member's gap to best
    "q172_cluster_quality_spread" ->
      s"""WITH RECURSIVE $q25Ctes,
         | $ccCtes,
         | $docMetricsCte,
         | q AS (SELECT c.doc_id, c.cluster_id,
         |    CAST(round(m.quality * 10000, 0) AS BIGINT) AS q4,
         |    c.doc_id = c.cluster_id AS is_canonical
         |  FROM clus c JOIN m ON c.doc_id = m.doc_id)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(max(q4) AS BIGINT) AS q4_max, CAST(min(q4) AS BIGINT) AS q4_min,
         |  CAST((max(q4) - min(q4)) * 100 AS BIGINT) AS spread_micro,
         |  CAST((max(q4) - max(CASE WHEN is_canonical THEN q4 END)) * 100 AS BIGINT)
         |    AS canonical_gap_micro
         |FROM q GROUP BY cluster_id""".stripMargin,
    // q145: containment replay — per-doc 5 rarest shingle hashes
    // (df asc, hash asc, df ≤ 1000) probe FULL postings (not the other
    // side's rare keys), exact |A∩B|/min verify. q25Ctes' sig/cand/
    // pairs CTEs go unreferenced (lazy, unevaluated); its `h` CTE
    // supplies the hashed shingle sets.
    "q145_containment" ->
      s"""WITH $q25Ctes,
         | con_occ AS (SELECT doc_id, unnest(list_distinct(hs)) AS hh FROM h),
         | con_df AS (SELECT hh, CAST(count(*) AS BIGINT) AS df
         |   FROM con_occ GROUP BY hh HAVING count(*) <= 1000),
         | con_post AS (SELECT o.doc_id, o.hh, d.df
         |   FROM con_occ o JOIN con_df d USING (hh)),
         | con_rare AS (SELECT doc_id, hh FROM (
         |   SELECT doc_id, hh,
         |     row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, hh ASC) AS rk
         |   FROM con_post) WHERE rk <= 5),
         | con_cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
         |     greatest(x.doc_id, y.doc_id) AS doc_b
         |   FROM con_rare x JOIN con_post y
         |     ON x.hh = y.hh AND x.doc_id <> y.doc_id),
         | con_sets AS (SELECT doc_id, list_distinct(hs) AS s FROM h)
         |SELECT doc_a, doc_b, n_a, n_b, containment_micro FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(a.s) AS BIGINT) AS n_a, CAST(len(b.s) AS BIGINT) AS n_b,
         |    CAST(len(list_intersect(a.s, b.s)) * 1000000
         |      // least(len(a.s), len(b.s)) AS BIGINT) AS containment_micro
         |  FROM con_cand c JOIN con_sets a ON c.doc_a = a.doc_id
         |                  JOIN con_sets b ON c.doc_b = b.doc_id)
         |WHERE containment_micro >= 900000""".stripMargin,
    // q164: q25's pairs rolled per unordered source pair, docs
    // oriented by source order so per-side counts attach correctly
    "q164_cross_source_mirrors" ->
      s"""WITH $q25Ctes,
         | lab AS (SELECT
         |    CASE WHEN da.source <= db.source THEN p.doc_a ELSE p.doc_b END AS doc_x,
         |    CASE WHEN da.source <= db.source THEN p.doc_b ELSE p.doc_a END AS doc_y,
         |    least(da.source, db.source) AS source_x,
         |    greatest(da.source, db.source) AS source_y
         |  FROM pairs p JOIN documents da ON p.doc_a = da.doc_id
         |               JOIN documents db ON p.doc_b = db.doc_id
         |  WHERE da.source <> db.source)
         |SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT doc_x) AS BIGINT) AS n_docs_x_side,
         |  CAST(count(DISTINCT doc_y) AS BIGINT) AS n_docs_y_side
         |FROM lab GROUP BY source_x, source_y""".stripMargin,
    // q165: YoY seasonality — floor-cents monthly rollup, within-year
    // share, growth vs the previous observed year of the same month
    "q165_yoy_seasonality" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(month(o_orderdate) AS BIGINT) AS mo,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        | w AS (SELECT *,
        |    CAST(sum(rev_cents) OVER (PARTITION BY yr) AS BIGINT) AS year_total,
        |    lag(rev_cents) OVER (PARTITION BY mo ORDER BY yr) AS prior_year_cents
        |  FROM m)
        |SELECT yr, mo, n_orders, rev_cents,
        |  CAST(rev_cents * 1000000 // year_total AS BIGINT) AS year_share_micro,
        |  CAST(rev_cents * 1000000 // prior_year_cents AS BIGINT) AS yoy_micro
        |FROM w""".stripMargin,
    // q166: unique-shingle novelty — df census over distinct
    // 3-shingles, micro ratio
    "q166_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(0, len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' '))
        |    ELSE [array_to_string(toks, ' ')] END)) AS s FROM t),
        | dfq AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // count(*) AS BIGINT) AS novelty_micro
        |FROM sh JOIN dfq USING (s) GROUP BY doc_id""".stripMargin,
    // q167: Zipf fit — MILLI-rounded logs (micro overflows int64 at
    // this corpus), exact integer moments, single-division fit
    "q167_zipf" ->
      """WITH v AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
        |   FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |   GROUP BY token),
        | r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
        |   FROM v),
        | p AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000.0, 0) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)) * 1000.0, 0) AS BIGINT) AS y FROM r),
        | m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy FROM p)
        |SELECT n,
        |  CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT)
        |    AS slope_micro,
        |  CAST(((sy - ((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx))
        |    * sx // 1000000) // n) * 1000 AS BIGINT) AS intercept_micro
        |FROM m""".stripMargin,
    // q168: inter-purchase gap percentiles — q134's exact-percentile
    // convention over per-user consecutive-purchase gaps
    "q168_repurchase_gaps" ->
      """WITH pr AS (SELECT user_id, event_id, ts, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |   FROM events WHERE event_type = 'purchase'),
        | g AS (SELECT event_id,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |   FROM pr),
        | gg AS (SELECT event_id, CAST(gap_us AS BIGINT) AS gap_us
        |   FROM g WHERE gap_us IS NOT NULL),
        | r AS (SELECT event_id, gap_us,
        |    row_number() OVER (ORDER BY gap_us ASC, event_id ASC) AS rn FROM gg),
        | n AS (SELECT CAST(count(*) AS BIGINT) AS n_gaps FROM gg),
        | p AS (SELECT pct, n_gaps,
        |    CAST(ceil(pct * n_gaps / 100.0) AS BIGINT) AS pos
        |   FROM (SELECT unnest([25, 50, 75, 90]) AS pct) CROSS JOIN n)
        |SELECT CAST(pct AS INTEGER) AS pct, n_gaps, gap_us
        |FROM r JOIN p ON r.rn = p.pos""".stripMargin,
    // q169: token budget at candidate quality bars — one quality pass,
    // thresholds × conditional sums, micro token share
    "q169_token_budget" ->
      s"""WITH $docMetricsCte,
         | d AS (SELECT m.quality AS q,
         |    CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS n_tok
         |   FROM m JOIN documents doc ON m.doc_id = doc.doc_id),
         | e AS (SELECT CAST(unnest([0.0, 0.6, 0.66, 0.7, 0.75]) AS DOUBLE) AS threshold,
         |    q, n_tok
         |   FROM d)
         |SELECT threshold,
         |  CAST(sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN q >= threshold THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS n_tokens,
         |  CAST(CAST(sum(CASE WHEN q >= threshold THEN n_tok ELSE 0 END) AS BIGINT)
         |    * 1000000 // CAST(sum(n_tok) AS BIGINT) AS BIGINT) AS token_share_micro
         |FROM e GROUP BY threshold""".stripMargin,
    // q170: q125's lift at the session grain (q60's session assignment)
    "q170_session_cooccurrence" -> {
      val gapUs = EventFlow.DefaultGapUs
      s"""WITH e AS (SELECT user_id, event_id, ts, event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         | g AS (SELECT *, CASE WHEN lag(us) OVER win IS NULL
         |        OR us - lag(us) OVER win > $gapUs
         |      THEN 1 ELSE 0 END AS new_s
         |   FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
         | s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |   FROM g),
         | st AS (SELECT DISTINCT user_id || '-' || session_seq AS sid, event_type
         |   FROM s),
         | n AS (SELECT CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions FROM st),
         | t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM st GROUP BY 1),
         | p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    CAST(count(*) AS BIGINT) AS n_ab
         |   FROM st a JOIN st b ON a.sid = b.sid AND a.event_type < b.event_type
         |   GROUP BY 1, 2)
         |SELECT type_a, type_b, n_ab,
         |  (n_ab * 1000000) // n_sessions AS support_micro,
         |  (n_ab * n_sessions * 1000000) // (ta.n_t * tb.n_t) AS lift_micro
         |FROM p CROSS JOIN n
         |JOIN t ta ON ta.event_type = p.type_a
         |JOIN t tb ON tb.event_type = p.type_b""".stripMargin
    },
    // q171: repeat-customer revenue share — lifetime order rank ≥ 2,
    // floor-cents, micro share per year
    "q171_repeat_revenue" ->
      """WITH r AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS nth
        |  FROM orders)
        |SELECT yr, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN nth >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_orders,
        |  CAST(sum(cents) AS BIGINT) AS rev_cents,
        |  CAST(sum(CASE WHEN nth >= 2 THEN cents ELSE 0 END) AS BIGINT) AS repeat_cents,
        |  CAST(CAST(sum(CASE WHEN nth >= 2 THEN cents ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(sum(cents) AS BIGINT) AS BIGINT) AS repeat_share_micro
        |FROM r GROUP BY yr""".stripMargin,
    // q173: Q6 replay — single filtered scan, cent·basis-point units
    "q173_forecast_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |    * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cent_bp
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    // q146: KL(source ‖ corpus) over unigrams — per-token log-ratio
    // rounded to integer micro BEFORE the occurrence-weighted fold
    // (q65's float discipline); `//` truncates toward zero, exactly
    // like Spark's `div` on the signed dividend
    "q146_source_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |   FROM documents),
        | st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n_st
        |   FROM tok GROUP BY source, token),
        | s AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s FROM st GROUP BY source),
        | c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_t FROM tok GROUP BY token),
        | t AS (SELECT CAST(sum(n_t) AS BIGINT) AS total FROM c),
        | lr AS (SELECT st.source, st.n_st, s.n_s,
        |     CAST(round(ln(CAST(st.n_st * t.total AS DOUBLE)
        |       / CAST(s.n_s * c.n_t AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS lr_micro
        |   FROM st JOIN s USING (source) JOIN c USING (token) CROSS JOIN t)
        |SELECT source, max(n_s) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |  CAST(CAST(sum(n_st * lr_micro) AS BIGINT) // max(n_s) AS BIGINT) AS kl_micro
        |FROM lr GROUP BY source""".stripMargin,
    // q147: the Q21 nested form verbatim — DuckDB plans its own
    // semi/anti pair
    "q147_waiting_suppliers" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey
        |                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name""".stripMargin,
    // q148: Q7 volume shipping, floor-cents revenue
    "q148_volume_shipping" ->
      """WITH n AS (SELECT n_nationkey, n_name FROM nation
        |   WHERE n_name IN ('NATION_1', 'NATION_2')),
        | sn AS (SELECT s_suppkey, n_name AS supp_nation
        |   FROM supplier JOIN n ON s_nationkey = n_nationkey),
        | cn AS (SELECT c_custkey, n_name AS cust_nation
        |   FROM customer JOIN n ON c_nationkey = n_nationkey)
        |SELECT supp_nation, cust_nation, year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN sn ON l_suppkey = s_suppkey
        |JOIN cn ON o_custkey = c_custkey
        |WHERE supp_nation <> cust_nation
        |GROUP BY supp_nation, cust_nation, year(l_shipdate)""".stripMargin,
    // q149: BM25 retrieval top-20
    "q149_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT rank, doc_id, score_micro FROM bm_ranked WHERE rank <= 20""".stripMargin,
    // q150: reciprocal-rank fusion of the BM25 leg (top 100) with the
    // exact-cosine leg for probe vec_id = 0 — full outer on id, so a
    // doc without an embedding (or vice versa) keeps its single leg
    "q150_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         | rrf_lex AS (SELECT doc_id AS id, rank AS rank_lex
         |   FROM bm_ranked WHERE rank <= 100),
         | rrf_qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         | rrf_sim AS (SELECT e.vec_id,
         |     round(list_sum(list_transform(range(1, 65),
         |       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
         |       6) AS sim
         |   FROM embeddings e CROSS JOIN rrf_qv q WHERE e.vec_id <> 0),
         | rrf_vec AS (SELECT vec_id AS id, rank_vec FROM (
         |   SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank_vec
         |   FROM rrf_sim) WHERE rank_vec <= 100),
         | rrf_fused AS (SELECT coalesce(l.id, v.id) AS id, l.rank_lex, v.rank_vec,
         |     CAST(coalesce(1000000 // (60 + l.rank_lex), 0)
         |       + coalesce(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS rrf_micro
         |   FROM rrf_lex l FULL OUTER JOIN rrf_vec v ON l.id = v.id)
         |SELECT rank, id, rank_lex, rank_vec, rrf_micro FROM (
         |  SELECT row_number() OVER (ORDER BY rrf_micro DESC, id ASC) AS rank,
         |    id, rank_lex, rank_vec, rrf_micro
         |  FROM rrf_fused) WHERE rank <= 20""".stripMargin,
    // q151: cumulative distinct users — q117's register scheme with a
    // running element-wise max per register; exact side is the
    // first-seen fold over the day spine
    "q151_cumulative_dau" -> {
      val m = graft.operators.Sketches.HllRegisters
      val rb = graft.operators.Sketches.HllRegisterBits
      val w1 = graft.operators.Sketches.HllRestBits + 1
      s"""WITH u AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         | h AS (SELECT day, user_id,
         |    CAST('0x' || substr(md5('dau-' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      AS h FROM u),
         | rr AS (SELECT day, h % $m AS reg,
         |    CASE WHEN (h >> $rb) = 0 THEN $w1
         |         ELSE $w1 - length(bin(h >> $rb)) END AS rho FROM h),
         | daily AS (SELECT day, reg, max(rho) AS mrho FROM rr GROUP BY day, reg),
         | days AS (SELECT DISTINCT day FROM u),
         | grid AS (SELECT day, unnest(range(0, $m)) AS reg FROM days),
         | rm AS (SELECT g.day, g.reg,
         |    max(d.mrho) OVER (PARTITION BY g.reg ORDER BY g.day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crho
         |   FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.reg = d.reg),
         | s AS (SELECT day, CAST(count(*) AS BIGINT) AS m_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - crho)) AS BIGINT) AS sumpow
         |   FROM rm WHERE crho IS NOT NULL GROUP BY day),
         | e AS (SELECT day, m_hit, $m - m_hit AS zeros,
         |    sumpow + ($m - m_hit) * (CAST(1 AS BIGINT) << 53) AS raw FROM s),
         | est AS (SELECT day, m_hit,
         |    CASE WHEN zeros > 0
         |           AND ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) <= ${2.5 * m}
         |      THEN ${m.toDouble} * ln(${m.toDouble} / zeros)
         |      ELSE ${graft.operators.Sketches.HllNumerator} / CAST(raw AS DOUBLE) END AS est
         |   FROM e),
         | nu AS (SELECT first_day, CAST(count(*) AS BIGINT) AS new_users
         |   FROM (SELECT user_id, min(day) AS first_day FROM u GROUP BY user_id)
         |   GROUP BY first_day),
         | ex AS (SELECT day,
         |    CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS true_cum
         |   FROM days LEFT JOIN nu ON day = first_day)
         |SELECT day, m_hit, round(est, 2) AS est_cum, true_cum
         |FROM est JOIN ex USING (day)""".stripMargin
    },
    // q152: U-shaped multi-touch — 40/20/40 with floor-division middle
    // credit, per-conversion position windows
    "q152_multitouch" ->
      """WITH conv AS (SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
        |   FROM events WHERE event_type = 'purchase'),
        | t AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type,
        |     epoch_us(ts) AS touch_us
        |   FROM events WHERE event_type IN ('view', 'click')),
        | paired AS (SELECT t.touch_type, t.touch_us, t.touch_id, c.conv_id
        |   FROM t JOIN conv c ON t.user_id = c.user_id
        |   WHERE t.touch_us < c.conv_us
        |     AND t.touch_us >= c.conv_us - 604800000000),
        | ranked AS (SELECT *,
        |     row_number() OVER (PARTITION BY conv_id
        |       ORDER BY touch_us ASC, touch_id ASC) AS pos,
        |     CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
        |   FROM paired),
        | credited AS (SELECT touch_type, conv_id,
        |     CASE WHEN n = 1 THEN 1000000
        |          WHEN n = 2 THEN 500000
        |          WHEN pos = 1 OR pos = n THEN 400000
        |          ELSE 200000 // (n - 2) END AS credit_micro
        |   FROM ranked)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
        |  CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total
        |FROM credited GROUP BY touch_type""".stripMargin,
    // q153: per-source z-scores — exact integer moments over the 1e-4
    // quality grid; the one float op is int/√int, identical cross-engine
    "q153_quality_zscores" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(round(($qualityExpr) * 10000, 0) AS BIGINT) AS q4
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks,
         |      CAST(len(list_filter(string_split(text, ' '),
         |        x -> x IN ('the','a','and','of'))) AS DOUBLE) AS sw
         |    FROM documents)),
         | m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(q4) AS BIGINT) AS s1, CAST(sum(q4 * q4) AS BIGINT) AS s2
         |  FROM d GROUP BY source)
         |SELECT doc_id, d.source, q4,
         |  CASE WHEN n > 1 AND n * s2 > s1 * s1
         |    THEN CAST(round(CAST(q4 * n - s1 AS DOUBLE)
         |      / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
         |  END AS z_micro
         |FROM d JOIN m ON d.source = m.source""".stripMargin,
    // q154: q60's sessions rolled up by entry type (first event per
    // session via row_number), integer micro rates
    "q154_session_entry_stats" -> {
      val gapUs = EventFlow.DefaultGapUs
      s"""WITH e AS (SELECT user_id, event_id, ts, event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         | g AS (SELECT *, CASE WHEN lag(us) OVER win IS NULL
         |        OR us - lag(us) OVER win > $gapUs
         |      THEN 1 ELSE 0 END AS new_s
         |   FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
         | s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |   FROM g),
         | fe AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY ts, event_id) AS rn FROM s),
         | sess AS (SELECT user_id, session_seq,
         |     CAST(count(*) AS BIGINT) AS n_events,
         |     max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
         |     CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us
         |   FROM fe GROUP BY user_id, session_seq)
         |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // count(*) AS BIGINT) AS bounce_micro,
         |  CAST(CAST(sum(n_events) AS BIGINT) * 1000000 // count(*) AS BIGINT)
         |    AS avg_events_micro,
         |  CAST(CAST(sum(end_us - start_us) AS BIGINT) // count(*) AS BIGINT)
         |    AS avg_duration_us
         |FROM sess GROUP BY entry_type""".stripMargin
    },
    // q155: day-of-week-residual z-scores — residual rounds to integer
    // micro first, moments exact (HUGEINT sum cast once), q90's finish
    "q155_dow_anomalies" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, day),
        | d2 AS (SELECT *, isodow(day) AS dow FROM daily),
        | ds AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_d,
        |    CAST(sum(cnt) AS BIGINT) AS s_d
        |  FROM d2 GROUP BY event_type, dow),
        | resid AS (SELECT d2.event_type, d2.day, d2.cnt,
        |    CAST(round((CAST(cnt AS DOUBLE)
        |      - CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
        |      AS r_mu
        |  FROM d2 JOIN ds ON d2.event_type = ds.event_type AND d2.dow = ds.dow),
        | st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r_mu) AS BIGINT) AS sr,
        |    CAST(sum(r_mu * r_mu) AS DOUBLE) AS srr_d
        |  FROM resid GROUP BY event_type)
        |SELECT event_type, day, cnt, r_mu,
        |  CAST(round(round((CAST(r_mu AS DOUBLE) - CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * srr_d - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        |    * 1000000, 0) AS BIGINT) AS z_u
        |FROM resid JOIN st USING (event_type)
        |WHERE n > 1
        |  AND CAST(n AS DOUBLE) * srr_d - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) > 0""".stripMargin,
    // q156: cohort LTV — first-purchase cohort month, floor-cents,
    // per-cohort running revenue, floored per-user LTV
    "q156_cohort_ltv" ->
      """WITH p AS (SELECT o_custkey AS user_id,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        | wc AS (SELECT *, min(m) OVER (PARTITION BY user_id) AS cohort_m FROM p),
        | rolled AS (SELECT cohort_m, m - cohort_m AS offset_months,
        |    CAST(sum(cents) AS BIGINT) AS rev_cents,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |  FROM wc GROUP BY cohort_m, m - cohort_m),
        | cs AS (SELECT cohort_m, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_users
        |  FROM wc WHERE m = cohort_m GROUP BY cohort_m),
        | run AS (SELECT rolled.*, cohort_users,
        |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY offset_months
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_rev_cents
        |  FROM rolled JOIN cs USING (cohort_m))
        |SELECT cohort_m, offset_months, cohort_users, active_users,
        |  rev_cents, cum_rev_cents,
        |  CAST(cum_rev_cents // cohort_users AS BIGINT) AS ltv_cents
        |FROM run""".stripMargin,
    // q159: median/MAD robust anomalies — LOWER medians via rank
    // windows (deterministic, integer end to end); `//` and Spark's
    // `div` both truncate on the signed numerator
    "q159_robust_anomalies" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, day),
        | medr AS (SELECT event_type, cnt AS med FROM (
        |   SELECT *, row_number() OVER (PARTITION BY event_type
        |       ORDER BY cnt ASC, day ASC) AS rk,
        |     count(*) OVER (PARTITION BY event_type) AS n
        |   FROM daily) WHERE rk = (n + 1) // 2),
        | dev AS (SELECT d.event_type, d.day, d.cnt, m.med,
        |    abs(d.cnt - m.med) AS adev
        |  FROM daily d JOIN medr m USING (event_type)),
        | madr AS (SELECT event_type, adev AS mad FROM (
        |   SELECT *, row_number() OVER (PARTITION BY event_type
        |       ORDER BY adev ASC, day ASC) AS rk,
        |     count(*) OVER (PARTITION BY event_type) AS n
        |   FROM dev) WHERE rk = (n + 1) // 2)
        |SELECT dev.event_type, dev.day, dev.cnt, dev.med, CAST(mad AS BIGINT) AS mad,
        |  CASE WHEN mad > 0
        |    THEN CAST((dev.cnt - dev.med) * 1000000 // mad AS BIGINT) END AS robust_micro
        |FROM dev JOIN madr USING (event_type)""".stripMargin,
    // q174: Q3 shipping priority — floor-cents, total tiebreak
    "q174_shipping_priority" ->
      """SELECT l_orderkey AS o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    // q175: Q5 local-supplier volume — the co-location equality rides
    // the supplier join
    "q175_local_supplier_volume" ->
      """WITH n AS (SELECT n_nationkey, n_name FROM nation
        |   JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        |SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN n ON s_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    // q176: Q10 returned-item losers — aggregate-then-join, top 20
    "q176_returned_losers" ->
      """WITH lost AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS lost_cents,
        |    CAST(count(*) AS BIGINT) AS n_returned
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1998-04-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name, n_returned, lost_cents
        |FROM lost
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY lost_cents DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // q177: Q14 promo share — integer micro ratio of floor-cents sums
    "q177_promo_share" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS BIGINT) AS promo_share_micro
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    // q178: Q13 distribution — LEFT join so zero-order customers count
    "q178_cust_order_dist" ->
      """WITH pc AS (SELECT c_custkey,
        |    CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count""".stripMargin,
    // q179: Q18 large-volume orders via IN (GROUP BY ... HAVING)
    "q179_big_qty_orders" ->
      """SELECT c_name, o.o_orderkey, o.o_orderdate,
        |  CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_cents,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |GROUP BY c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice""".stripMargin,
    // q180: Q19 disjunctive brand/size/quantity bands
    "q180_brand_band_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 1 AND l_quantity <= 30 AND (
        |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    // q181: Q12 late-shipment priority mix by return flag
    "q181_late_priority_mix" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS critical_late,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS noncritical_late
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag""".stripMargin,
    // q182: Q8 national market share — conditional sum over one frame
    "q182_market_share" ->
      """WITH rc AS (SELECT c_custkey FROM customer
        |   JOIN nation ON c_nationkey = n_nationkey
        |   JOIN region ON n_regionkey = r_regionkey
        |   WHERE r_name = 'ASIA'),
        | s AS (SELECT s_suppkey, (n_name = 'NATION_2') AS is_home
        |   FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        | f AS (SELECT year(o_orderdate) AS o_year, is_home,
        |     CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |       AS BIGINT) AS cents
        |   FROM lineitem
        |   JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN s ON l_suppkey = s_suppkey
        |   WHERE o_custkey IN (SELECT c_custkey FROM rc))
        |SELECT o_year,
        |  CAST(sum(CASE WHEN is_home THEN cents ELSE 0 END) AS BIGINT) AS home_cents,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(CAST(sum(CASE WHEN is_home THEN cents ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(sum(cents) AS BIGINT) AS BIGINT) AS share_micro
        |FROM f GROUP BY o_year""".stripMargin,
    // q183: Q9 profit — 60%-of-retail unit cost, exact cents
    "q183_nation_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)
        |    - CAST(l_quantity AS BIGINT)
        |      * CAST(floor(p_retailprice * 60) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    // q184: topic mix — the q46 cell-assignment replay, rolled up per
    // source; windowed SUM cast to BIGINT (the HUGEINT lesson)
    "q184_topic_share" ->
      """WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
        |               FROM embeddings WHERE vec_id < 16),
        | sims AS (
        |  SELECT e.vec_id, c.centroid_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6)
        |      AS cent_sim
        |  FROM embeddings e CROSS JOIN cents c),
        | assigned AS (SELECT vec_id, centroid_id AS topic FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cent_sim DESC, centroid_id ASC) AS rk
        |    FROM sims) WHERE rk = 1),
        | g AS (SELECT source, topic, CAST(count(*) AS BIGINT) AS n_docs
        |   FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
        |   GROUP BY source, topic)
        |SELECT source, topic, n_docs,
        |  CAST(n_docs * 1000000
        |    // CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
        |    AS BIGINT) AS share_micro
        |FROM g""".stripMargin,
    // q185: blocklist audit — occurrence hits, per-doc flag
    "q185_blocklist" ->
      """WITH h AS (SELECT source,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('slow', 'dup', 'big'))) AS BIGINT) AS n_hits
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
        |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
        |  CAST(CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS BIGINT) AS flagged_micro
        |FROM h GROUP BY source""".stripMargin,
    // q186: FastSS deletion-neighborhood candidates (60-bit md5 band
    // keys, ids-only dedupe) + levenshtein verify
    "q186_name_near_matches" ->
      """WITH names AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        | vars AS (
        |   SELECT id, CAST('0x' || substr(md5(variant), 1, 15) AS BIGINT) AS vh
        |   FROM (
        |     SELECT id, name AS variant FROM names
        |     UNION ALL
        |     SELECT id, substr(name, 1, i - 1) || substr(name, i + 1) AS variant
        |     FROM (SELECT id, name, unnest(range(1, length(name) + 1)) AS i
        |           FROM names))),
        | cids AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |   FROM vars a JOIN vars b ON a.vh = b.vh AND a.id < b.id),
        | cand AS (SELECT id_a, na.name AS name_a, id_b, nb.name AS name_b
        |   FROM cids
        |   JOIN names na ON id_a = na.id
        |   JOIN names nb ON id_b = nb.id)
        |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN levenshtein(name_a, name_b) <= 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
        |  CAST(sum(CASE WHEN levenshtein(name_a, name_b) = 1
        |      AND length(name_a) = length(name_b)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_substitutions,
        |  CAST(sum(CASE WHEN levenshtein(name_a, name_b) = 1
        |      AND length(name_a) <> length(name_b)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_indels
        |FROM cand""".stripMargin,
    // q187: sliding WAU via window-explode of the deduped presence frame
    "q187_weekly_active" ->
      """WITH presence AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |   FROM events),
        | fanned AS (SELECT user_id,
        |     CAST(unnest(range(0, 7)) AS BIGINT) AS off, day
        |   FROM presence)
        |SELECT day + CAST(off AS INTEGER) AS report_day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |FROM fanned
        |WHERE day + CAST(off AS INTEGER) <= (SELECT max(day) FROM presence)
        |GROUP BY report_day""".stripMargin,
    // q188: GROUPING SETS — per-column grouping() bits, never the
    // engine-specific packed grouping_id
    "q188_grouping_sets" ->
      """SELECT year(o_orderdate) AS yr, n_name,
        |  CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_yr,
        |  CAST(grouping(n_name) AS BIGINT) AS g_nation,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((year(o_orderdate), n_name),
        |                        (year(o_orderdate)), ())""".stripMargin,
    // q189: month checksums — canonical row string, 60-bit md5 prefix,
    // XOR fold (order-independent on both engines)
    "q189_monthly_checksums" ->
      """WITH h AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST('0x' || substr(md5(
        |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |      || '|' || o_orderstatus
        |      || '|' || CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |      || '|' || o_orderpriority), 1, 15) AS BIGINT) AS h
        |  FROM orders)
        |SELECT month, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS checksum
        |FROM h GROUP BY month""".stripMargin,
    // q190: sweep-line backlog — running sum over the days-sized deltas
    "q190_order_backlog" ->
      """WITH opens AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_opened
        |  FROM orders GROUP BY day),
        | closes AS (SELECT day, CAST(count(*) AS BIGINT) AS n_closed FROM (
        |    SELECT CAST(max(l_shipdate) AS DATE) + 1 AS day
        |    FROM lineitem GROUP BY l_orderkey) GROUP BY day),
        | d AS (SELECT coalesce(o.day, c.day) AS day,
        |    coalesce(n_opened, 0) AS n_opened, coalesce(n_closed, 0) AS n_closed
        |  FROM opens o FULL OUTER JOIN closes c ON o.day = c.day)
        |SELECT day, n_opened, n_closed,
        |  CAST(sum(n_opened - n_closed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
        |FROM d""".stripMargin,
    // q191: k-anonymity group-size histogram over the coarsened QIs
    "q191_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS group_size
        |  FROM customer GROUP BY 1, 2, 3),
        | h AS (SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups
        |   FROM g GROUP BY 1)
        |SELECT group_size, n_groups,
        |  CAST(group_size * n_groups AS BIGINT) AS n_rows,
        |  group_size < 5 AS at_risk,
        |  CAST(group_size * n_groups * 1000000
        |    // CAST(sum(group_size * n_groups) OVER () AS BIGINT)
        |    AS BIGINT) AS row_share_micro
        |FROM h""".stripMargin,
    // q192: rank-aware retrieval eval — the q46 IVF replay at k=10 as
    // the system, exact-cosine top-10 as truth; DCG weights are shared
    // integer literals so the metric fold is float-free on both sides
    "q192_retrieval_eval" ->
      """WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
        |               FROM embeddings WHERE vec_id < 16),
        | csims AS (
        |  SELECT e.vec_id, e.embedding, c.centroid_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6)
        |      AS cent_sim
        |  FROM embeddings e CROSS JOIN cents c),
        | cranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cent_sim DESC, centroid_id ASC) AS cell_rank
        |  FROM csims),
        | assigned AS (SELECT vec_id AS cand_id, embedding AS cv, centroid_id
        |              FROM cranked WHERE cell_rank = 1),
        | probes AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id
        |            FROM cranked WHERE vec_id < 10 AND cell_rank <= 4),
        | scored AS (
        |  SELECT query_id, cand_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
        |  FROM probes JOIN assigned USING (centroid_id)
        |  WHERE query_id <> cand_id),
        | sysr AS (SELECT query_id, sys_cand, rank_sys FROM (
        |    SELECT query_id, cand_id AS sys_cand,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, cand_id ASC) AS rank_sys
        |    FROM scored) WHERE rank_sys <= 10),
        | re_sim AS (SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
        |     round(list_sum(list_transform(range(1, 65),
        |       i -> CAST(e.embedding[i] AS DOUBLE)
        |            * CAST(q.embedding[i] AS DOUBLE))), 6) AS sim
        |   FROM embeddings e CROSS JOIN
        |     (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q
        |   WHERE e.vec_id <> q.vec_id),
        | re_truth AS (SELECT query_id, cand_id FROM (
        |   SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
        |       ORDER BY sim DESC, cand_id ASC) AS rk
        |   FROM re_sim) WHERE rk <= 10),
        | re_w(rnk, w) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
        |   (4, 430676), (5, 386852), (6, 356207), (7, 333333),
        |   (8, 315464), (9, 301029), (10, 289064)),
        | re_join AS (SELECT s.query_id, s.rank_sys,
        |     (t.cand_id IS NOT NULL) AS relevant
        |   FROM sysr s LEFT JOIN re_truth t
        |     ON s.query_id = t.query_id AND s.sys_cand = t.cand_id)
        |SELECT query_id,
        |  CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  CAST(CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // 10 AS BIGINT) AS recall_micro,
        |  CAST(coalesce(1000000 // min(CASE WHEN relevant THEN rank_sys END), 0)
        |    AS BIGINT) AS mrr_micro,
        |  CAST(CAST(sum(CASE WHEN relevant THEN w.w ELSE 0 END) AS BIGINT)
        |    * 1000000 // 4543554 AS BIGINT) AS ndcg_micro
        |FROM re_join JOIN re_w w ON re_join.rank_sys = w.rnk
        |GROUP BY query_id""".stripMargin,
    // q193: topic-coherent packing — the q184 assignment replay feeding
    // the q52 running-sum chunking; unembedded docs pack as topic -1
    "q193_topic_packing" ->
      """WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
        |               FROM embeddings WHERE vec_id < 16),
        | sims AS (
        |  SELECT e.vec_id, c.centroid_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6)
        |      AS cent_sim
        |  FROM embeddings e CROSS JOIN cents c),
        | assigned AS (SELECT vec_id, centroid_id AS tpc FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cent_sim DESC, centroid_id ASC) AS rk
        |    FROM sims) WHERE rk = 1),
        | d AS (SELECT doc_id, CAST(coalesce(tpc, -1) AS BIGINT) AS topic,
        |     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |   FROM documents LEFT JOIN assigned ON doc_id = vec_id),
        | c AS (SELECT doc_id, topic, n_tokens,
        |     CAST(sum(n_tokens) OVER (PARTITION BY topic ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |   FROM d)
        |SELECT doc_id, topic, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id,
        |  ((cum - n_tokens) % 512 + n_tokens) > 512 AS spans_boundary
        |FROM c""".stripMargin,
    // q194: key-skew decile ladder over per-key loads; rank positions
    // use the deterministic greatest(1, n*d div 10) convention
    "q194_key_skew" ->
      """WITH loads AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS load
        |   FROM events GROUP BY 1),
        | r AS (SELECT k, load,
        |     row_number() OVER (ORDER BY load ASC, k ASC) AS rn,
        |     CAST(count(*) OVER () AS BIGINT) AS n_keys,
        |     CAST(sum(load) OVER () AS BIGINT) AS total
        |   FROM loads),
        | d AS (SELECT CAST(unnest(range(0, 11)) AS BIGINT) AS decile)
        |SELECT decile, load, n_keys,
        |  CAST(load * n_keys * 1000000 // total AS BIGINT) AS vs_mean_micro
        |FROM r JOIN d ON rn = greatest(1, (n_keys * decile) // 10)""".stripMargin,
    // q195: exact integer moments (HUGEINT sums ≙ Spark Decimal(38)),
    // double arithmetic only on the final ratio — same op order
    "q195_price_qty_corr" ->
      """WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy,
        |    sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sxx,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS syy,
        |    sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS sxy
        |  FROM lineitem GROUP BY 1),
        | v AS (SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
        |  FROM m)
        |SELECT l_returnflag, n AS n_lines,
        |  CASE WHEN vx > 0 AND vy > 0 THEN
        |    CAST(round(round(cv / sqrt(vx * vy), 6) * 1000000, 0) AS BIGINT)
        |  END AS corr_micro
        |FROM v""".stripMargin,
    // q196: chi-square cells — exact HUGEINT rational, one double division
    "q196_chi_square" ->
      """WITH cells AS (SELECT o_orderpriority, o_orderstatus,
        |    CAST(count(*) AS BIGINT) AS obs
        |  FROM orders GROUP BY 1, 2),
        | w AS (SELECT *,
        |    CAST(sum(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS row_tot,
        |    CAST(sum(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS col_tot,
        |    CAST(sum(obs) OVER () AS BIGINT) AS total
        |  FROM cells),
        | t AS (SELECT *,
        |    CAST(obs AS HUGEINT) * total
        |      - CAST(row_tot AS HUGEINT) * col_tot AS num,
        |    CAST(total AS HUGEINT) * row_tot * col_tot AS den
        |  FROM w)
        |SELECT o_orderpriority, o_orderstatus, obs,
        |  CAST(row_tot * col_tot * 1000000 // total AS BIGINT) AS exp_micro,
        |  CAST(round(round(CAST(num * num AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |    * 1000000, 0) AS BIGINT) AS chi2_term_micro
        |FROM t""".stripMargin,
    // q197: market-basket rules — within-basket pairs, support >= 3,
    // top-20 by (support, pair)
    "q197_part_associations" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |   FROM lineitem),
        | nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
        |   FROM items),
        | itemn AS (SELECT item, CAST(count(*) AS BIGINT) AS item_n
        |   FROM items GROUP BY item),
        | pairs AS (SELECT a.item AS pa, b.item AS pb,
        |     CAST(count(*) AS BIGINT) AS pair_n
        |   FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
        |   GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pa, pb, pair_n, na.item_n AS n_a, nb2.item_n AS n_b,
        |  CAST(pair_n * 1000000 // nb.n_baskets AS BIGINT) AS support_micro,
        |  CAST(pair_n * 1000000 // na.item_n AS BIGINT) AS conf_a_to_b_micro,
        |  CAST(pair_n * 1000000 // nb2.item_n AS BIGINT) AS conf_b_to_a_micro,
        |  CAST(pair_n * nb.n_baskets * 1000000 // (na.item_n * nb2.item_n)
        |    AS BIGINT) AS lift_micro
        |FROM pairs
        |JOIN itemn na ON pa = na.item
        |JOIN itemn nb2 ON pb = nb2.item
        |CROSS JOIN nb
        |ORDER BY pair_n DESC, pa, pb
        |LIMIT 20""".stripMargin,
    // q198: referential integrity — keys-only full-outer merge
    "q198_ref_integrity" ->
      """WITH c AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS child_rows
        |   FROM lineitem GROUP BY 1),
        | p AS (SELECT o_orderkey AS k, TRUE AS is_parent FROM orders),
        | j AS (SELECT coalesce(c.k, p.k) AS k, child_rows, is_parent
        |   FROM c FULL OUTER JOIN p ON c.k = p.k)
        |SELECT CAST(coalesce(sum(child_rows), 0) AS BIGINT) AS n_child_rows,
        |  CAST(sum(CASE WHEN is_parent IS NULL THEN child_rows ELSE 0 END)
        |    AS BIGINT) AS n_orphan_rows,
        |  CAST(count(CASE WHEN is_parent IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS n_parents,
        |  CAST(count(CASE WHEN is_parent IS NOT NULL AND child_rows IS NULL
        |    THEN 1 END) AS BIGINT) AS n_childless_parents,
        |  CAST(CAST(sum(CASE WHEN is_parent IS NULL THEN child_rows ELSE 0 END)
        |      AS BIGINT) * 1000000
        |    // CAST(coalesce(sum(child_rows), 0) AS BIGINT) AS BIGINT)
        |    AS orphan_micro,
        |  CAST(CAST(count(CASE WHEN is_parent IS NOT NULL AND child_rows IS NULL
        |      THEN 1 END) AS BIGINT) * 1000000
        |    // CAST(count(CASE WHEN is_parent IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS BIGINT) AS childless_micro
        |FROM j""".stripMargin,
    // q199: triplets — cell-scoped (√N) positives (the SemDeDup pair
    // pass at threshold 0.4) composed with the q106-shaped
    // hard-negative probe, rank 1, probes = the anchor set
    "q199_triplets" -> {
      s"""WITH tp_k AS (SELECT greatest(16,
         |    CAST(ceil(16.0 * sqrt(count(*) / 2000.0)) AS BIGINT)) AS k
         |  FROM embeddings),
         | tp_cents AS (SELECT vec_id AS pcid, embedding AS cent
         |   FROM embeddings WHERE vec_id < (SELECT k FROM tp_k)),
         | tp_sims AS (SELECT e.vec_id, e.embedding, e.label, c.pcid,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6)
         |      AS cent_sim
         |  FROM embeddings e CROSS JOIN tp_cents c),
         | tp_ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cent_sim DESC, pcid ASC) AS r FROM tp_sims),
         | tp_assigned AS (SELECT vec_id, embedding, label, pcid
         |   FROM tp_ranked WHERE r = 1),
         | tp_posf AS (
         |  SELECT a.vec_id AS anchor, b.vec_id AS positive,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(a.embedding[i] AS DOUBLE)
         |           * CAST(b.embedding[i] AS DOUBLE))), 6) AS pos_sim
         |  FROM tp_assigned a JOIN tp_assigned b
         |    ON a.pcid = b.pcid AND a.vec_id < b.vec_id
         |  WHERE round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(a.embedding[i] AS DOUBLE)
         |           * CAST(b.embedding[i] AS DOUBLE))), 6) >= 0.4),
         | probes AS (SELECT vec_id AS query_id, embedding AS qv,
         |    label AS q_label, pcid
         |  FROM tp_ranked WHERE r <= 6
         |    AND vec_id IN (SELECT anchor FROM tp_posf)),
         | nscored AS (SELECT query_id, cand_id,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))), 6) AS sim
         |  FROM probes JOIN (SELECT vec_id AS cand_id, embedding AS cv,
         |      label AS c_label, pcid FROM tp_assigned) USING (pcid)
         |  WHERE q_label <> c_label),
         | neg1 AS (SELECT query_id, cand_id AS negative, sim AS neg_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, cand_id ASC) AS rk FROM nscored) WHERE rk = 1)
         |SELECT anchor, positive, pos_sim, negative, neg_sim
         |FROM tp_posf JOIN neg1 ON anchor = query_id""".stripMargin
    },
    // q200: corpus datasheet — every leg folds to a 1-row scalar
    "q200_datasheet" ->
      """WITH base AS (SELECT doc_id, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tc FROM documents)
        |SELECT 'n_docs' AS stat, CAST(count(*) AS BIGINT) AS value FROM base
        |UNION ALL
        |SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 'total_tokens', CAST(sum(tc) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 'total_chars', CAST(sum(n_chars) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 'min_doc_tokens', CAST(min(tc) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 'max_doc_tokens', CAST(max(tc) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 'median_doc_tokens', CAST(tc AS BIGINT) FROM (
        |  SELECT tc, row_number() OVER (ORDER BY tc ASC, doc_id ASC) AS rk,
        |    count(*) OVER () AS n FROM base) WHERE rk = (n + 1) // 2
        |UNION ALL
        |SELECT 'vocab_size', CAST(count(DISTINCT token) AS BIGINT) FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |UNION ALL
        |SELECT 'n_embedded_docs', CAST(count(*) AS BIGINT) FROM documents
        |WHERE doc_id IN (SELECT vec_id FROM embeddings)""".stripMargin,
    // q201: the Hamming path through q192's metric fold — same truth,
    // same integer-micro DCG weights, directly comparable per method
    "q201_hamming_eval" ->
      s"""WITH $hammingCteChain,
         | hsys AS (SELECT query_id, cand_id AS sys_cand, rank AS rank_sys
         |   FROM r WHERE rank <= 10),
         | re_sim AS (SELECT q2.vec_id AS query_id, e.vec_id AS cand_id,
         |     round(list_sum(list_transform(range(1, 65),
         |       i -> CAST(e.embedding[i] AS DOUBLE)
         |            * CAST(q2.embedding[i] AS DOUBLE))), 6) AS sim
         |   FROM embeddings e CROSS JOIN
         |     (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q2
         |   WHERE e.vec_id <> q2.vec_id),
         | re_truth AS (SELECT query_id, cand_id FROM (
         |   SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
         |       ORDER BY sim DESC, cand_id ASC) AS rk
         |   FROM re_sim) WHERE rk <= 10),
         | re_w(rnk, w) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |   (4, 430676), (5, 386852), (6, 356207), (7, 333333),
         |   (8, 315464), (9, 301029), (10, 289064)),
         | re_join AS (SELECT s2.query_id, s2.rank_sys,
         |     (t.cand_id IS NOT NULL) AS relevant
         |   FROM hsys s2 LEFT JOIN re_truth t
         |     ON s2.query_id = t.query_id AND s2.sys_cand = t.cand_id)
         |SELECT query_id,
         |  CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  CAST(CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // 10 AS BIGINT) AS recall_micro,
         |  CAST(coalesce(1000000 // min(CASE WHEN relevant THEN rank_sys END), 0)
         |    AS BIGINT) AS mrr_micro,
         |  CAST(CAST(sum(CASE WHEN relevant THEN w.w ELSE 0 END) AS BIGINT)
         |    * 1000000 // 4543554 AS BIGINT) AS ndcg_micro
         |FROM re_join JOIN re_w w ON re_join.rank_sys = w.rnk
         |GROUP BY query_id""".stripMargin,
    // q202: Pareto rungs — cumulative floor-cents share at the
    // deterministic top-p% rank positions
    "q202_revenue_pareto" ->
      """WITH pc AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | r AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey ASC) AS rn,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total
        |  FROM pc),
        | p AS (SELECT CAST(unnest([1, 5, 10, 25, 50, 100]) AS BIGINT) AS top_pct)
        |SELECT top_pct, CAST(rn AS INTEGER) AS n_customers,
        |  CAST(CAST(cum_cents AS HUGEINT) * 1000000 // total AS BIGINT)
        |    AS cum_share_micro
        |FROM r JOIN p ON rn = greatest(1, (n * top_pct) // 100)""".stripMargin,
    // q203: exact Gini — HUGEINT rank-weighted fold, one truncating
    // division onto the micro grid
    "q203_revenue_gini" ->
      """WITH pc AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | r AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS rn
        |  FROM pc)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST((2 * sum(CAST(rn AS HUGEINT) * cents)
        |      - (count(*) + 1) * CAST(sum(cents) AS HUGEINT)) * 1000000
        |    // (CAST(count(*) AS HUGEINT) * CAST(sum(cents) AS HUGEINT))
        |    AS BIGINT) AS gini_micro
        |FROM r""".stripMargin,
    // q204: RFM grid — 6 − ntile over best-first total orders so both
    // engines cut identical quintiles; windowed SUM cast (HUGEINT)
    "q204_rfm_segments" ->
      """WITH pc AS (SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_day,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        | rec AS (SELECT *,
        |    date_diff('day', last_day, max(last_day) OVER ()) AS recency_days
        |  FROM pc),
        | sc AS (SELECT cents,
        |    6 - ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
        |    6 - ntile(5) OVER (ORDER BY freq DESC, o_custkey ASC) AS f_score,
        |    6 - ntile(5) OVER (ORDER BY cents DESC, o_custkey ASC) AS m_score
        |  FROM rec),
        | g AS (SELECT r_score, f_score, m_score,
        |    CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS rev_cents
        |  FROM sc GROUP BY 1, 2, 3)
        |SELECT r_score, f_score, m_score, n_customers, rev_cents,
        |  CAST(rev_cents * 1000000 // CAST(sum(rev_cents) OVER () AS BIGINT)
        |    AS BIGINT) AS rev_share_micro
        |FROM g""".stripMargin,
    // q205: cross-doc duplicated 5-gram coverage per doc; a gram is
    // dup iff ≥2 distinct docs carry it (min≠max, no count_distinct)
    "q205_dup_ngrams" ->
      s"""WITH $ngramPosCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) * 1000000 // count(*)
         |    AS BIGINT) AS dup_micro
         |FROM pos JOIN (SELECT h, min(doc_id) <> max(doc_id) AS dup
         |               FROM pos GROUP BY h) census USING (h)
         |GROUP BY doc_id""".stripMargin,
    // q206: l-diversity — distinct sensitive (balance band) per
    // (nation, segment) QI group, histogrammed by l-value
    "q206_l_diversity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS group_size,
        |    CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |      AS BIGINT) AS l_value
        |  FROM customer GROUP BY 1, 2)
        |SELECT l_value, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(group_size) AS BIGINT) AS n_rows,
        |  l_value < 5 AS at_risk,
        |  CAST(sum(group_size) * 1000000
        |    // CAST(sum(sum(group_size)) OVER () AS BIGINT)
        |    AS BIGINT) AS row_share_micro
        |FROM g GROUP BY 1""".stripMargin,
    // q207: per-user inactivity gaps (islands by day − row_number),
    // histogrammed by each user's longest gap
    "q207_activity_gaps" ->
      """WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        | i AS (SELECT user_id, day,
        |    CAST(day - (row_number() OVER (PARTITION BY user_id ORDER BY day))
        |      * INTERVAL 1 DAY AS DATE) AS grp
        |  FROM p),
        | runs AS (SELECT user_id, grp, min(day) AS run_start, max(day) AS run_end
        |   FROM i GROUP BY 1, 2),
        | nxt AS (SELECT user_id, run_end,
        |    lead(run_start) OVER (PARTITION BY user_id ORDER BY run_start)
        |      AS next_start
        |  FROM runs),
        | pu AS (SELECT user_id,
        |    CAST(coalesce(max(next_start - run_end - 1), 0) AS BIGINT) AS longest_gap,
        |    CAST(count(CASE WHEN next_start IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n_gap_runs,
        |    CAST(coalesce(sum(next_start - run_end - 1), 0) AS BIGINT) AS n_gap_days
        |  FROM nxt GROUP BY 1)
        |SELECT longest_gap, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n_gap_runs) AS BIGINT) AS n_gap_runs,
        |  CAST(sum(n_gap_days) AS BIGINT) AS n_gap_days
        |FROM pu GROUP BY 1""".stripMargin,
    // q210: eval-split (doc_id % 97 = 0) n-gram decontamination —
    // a position hits iff its gram occurs anywhere in the train split
    "q210_ngram_decontam" ->
      s"""WITH $ngramPosCtes,
         | ev AS (SELECT * FROM pos WHERE doc_id % 97 = 0),
         | hits AS (SELECT DISTINCT p.h AS h, TRUE AS hit FROM pos p
         |   WHERE p.doc_id % 97 <> 0 AND p.h IN (SELECT h FROM ev))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0 AS contaminated,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000 // count(*)
         |    AS BIGINT) AS hit_micro
         |FROM ev LEFT JOIN hits USING (h) GROUP BY doc_id""".stripMargin,
    // q216: deterministic-rank revenue percentiles, national + global
    "q216_customer_percentiles" ->
      """WITH t AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_cents
        |  FROM orders GROUP BY 1),
        | j AS (SELECT n_name, c_custkey, rev_cents
        |   FROM t JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey),
        | r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY rev_cents ASC, c_custkey ASC) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS nn,
        |    CAST(row_number() OVER (ORDER BY rev_cents ASC, c_custkey ASC)
        |      AS BIGINT) AS rg,
        |    CAST(count(*) OVER () AS BIGINT) AS ng
        |  FROM j)
        |SELECT n_name, c_custkey, rev_cents,
        |  CASE WHEN nn > 1 THEN CAST((rn - 1) * 1000000 // (nn - 1) AS BIGINT)
        |  END AS nation_pct_micro,
        |  CASE WHEN ng > 1 THEN CAST((rg - 1) * 1000000 // (ng - 1) AS BIGINT)
        |  END AS global_pct_micro
        |FROM r""".stripMargin,
    // q217: Nelson-Aalen cumulative churn hazard with censoring at
    // the corpus end (last activity within 7 days = censored)
    "q217_hazard_curve" ->
      """WITH p AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
        |    max(CAST(ts AS DATE)) AS last_day
        |  FROM events GROUP BY 1),
        | s AS (SELECT *, max(last_day) OVER () AS end_day FROM p),
        | u AS (SELECT user_id, last_day <= end_day - 7 AS churned,
        |    CAST(last_day - first_day + 1 AS BIGINT) AS lifetime
        |  FROM s),
        | b AS (SELECT lifetime,
        |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
        |    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
        |  FROM u GROUP BY 1),
        | c AS (SELECT *,
        |    CAST(sum(n_churned + n_censored) OVER (ORDER BY lifetime
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS n_at_risk
        |  FROM b),
        | h AS (SELECT *,
        |    CAST(n_churned * 1000000 // n_at_risk AS BIGINT) AS h_micro FROM c)
        |SELECT lifetime, n_at_risk, n_churned, n_censored, h_micro,
        |  CAST(sum(h_micro) OVER (ORDER BY lifetime
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_h_micro
        |FROM h""".stripMargin,
    // q219: Benford first-digit screen — expectations are shared
    // integer literals (DataQuality.BenfordMicro), zero-filled digits
    "q219_benford" -> {
      val spine = graft.operators.DataQuality.BenfordMicro
        .map { case (d, m) => s"($d, $m)" }.mkString(", ")
      s"""WITH spine(digit, benford_micro) AS (VALUES $spine),
         | obs AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
         |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n_orders
         |   FROM orders WHERE o_totalprice >= 1 GROUP BY 1)
         |SELECT CAST(spine.digit AS BIGINT) AS digit,
         |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
         |  CAST(coalesce(n_orders, 0) * 1000000
         |    // CAST(sum(coalesce(n_orders, 0)) OVER () AS BIGINT)
         |    AS BIGINT) AS obs_micro,
         |  CAST(benford_micro AS BIGINT) AS benford_micro,
         |  CAST(abs(coalesce(n_orders, 0) * 1000000
         |    // CAST(sum(coalesce(n_orders, 0)) OVER () AS BIGINT)
         |    - benford_micro) AS BIGINT) AS dev_micro
         |FROM spine LEFT JOIN obs ON spine.digit = obs.digit""".stripMargin
    },
    // q220: held-out unigram perplexity — LM fit on the train split,
    // the q210 holdout scored with an add-one OOV floor
    "q220_holdout_ppl" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |   FROM documents),
        | tr AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
        |   FROM tok WHERE doc_id % 97 <> 0 GROUP BY 1),
        | tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS v FROM tr),
        | lp AS (SELECT token,
        |    round(ln(CAST(tf + 1 AS DOUBLE) / (total + v)), 6) AS logp
        |   FROM tr CROSS JOIN tot),
        | ev AS (SELECT doc_id, token FROM tok WHERE doc_id % 97 = 0),
        | sc AS (SELECT ev.doc_id,
        |    coalesce(lp.logp,
        |      (SELECT round(ln(1.0 / (total + v)), 6) FROM tot)) AS logp,
        |    lp.token IS NULL AS oov
        |   FROM ev LEFT JOIN lp USING (token)),
        | agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |    round(avg(logp), 4) AS avg_logp
        |   FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_oov, avg_logp,
        |  round(exp(-avg_logp), 2) AS ppl
        |FROM agg""".stripMargin,
    // q223: order-amount reconciliation — floor-cents line recompute
    // vs the stored total, drift in log-decade micro buckets
    "q223_order_reconciliation" ->
      """WITH ls AS (SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS line_cents
        |  FROM lineitem GROUP BY 1),
        | j AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
        |    line_cents
        |  FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey),
        | b AS (SELECT
        |    CASE WHEN line_cents IS NULL THEN -1
        |      WHEN abs(line_cents - total_cents) * 1000000 // total_cents < 1000 THEN 0
        |      WHEN abs(line_cents - total_cents) * 1000000 // total_cents < 10000 THEN 1
        |      WHEN abs(line_cents - total_cents) * 1000000 // total_cents < 100000 THEN 2
        |      WHEN abs(line_cents - total_cents) * 1000000 // total_cents < 1000000 THEN 3
        |      ELSE 4 END AS bucket,
        |    coalesce(abs(line_cents - total_cents), 0) AS drift_cents
        |  FROM j)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(drift_cents) AS BIGINT) AS drift_cents
        |FROM b GROUP BY 1""".stripMargin,
    // q224: subject access census — the three-table row manifest for
    // the literal subject key set
    "q224_subject_census" -> {
      val ks = "(500, 1000, 1500)"
      s"""SELECT 'customer' AS "table", CAST(count(*) AS BIGINT) AS n_rows
         |FROM customer WHERE c_custkey IN $ks
         |UNION ALL
         |SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey IN $ks)
         |UNION ALL
         |SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
         |WHERE o_custkey IN $ks""".stripMargin
    },
    // q229: label separation via the sum-vector identity — exact
    // HUGEINT tick sums, two final double divisions (same op order)
    "q229_label_separation" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS t
        |  FROM embeddings),
        | x AS (SELECT label, i AS dim, t[i] AS tick
        |   FROM e, UNNEST(generate_series(1, 64)) AS u(i)),
        | g AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS cnt,
        |    sum(CAST(tick AS HUGEINT)) AS s,
        |    sum(CAST(tick AS HUGEINT) * tick) AS qq
        |   FROM x GROUP BY 1, 2),
        | w AS (SELECT *, sum(s) OVER (PARTITION BY dim) AS tot FROM g),
        | p AS (SELECT label, CAST(max(cnt) AS BIGINT) AS n_vectors,
        |    sum(s * s) AS s2, sum(qq) AS q,
        |    sum(s * (tot - s)) AS inter_num
        |   FROM w GROUP BY 1),
        | p2 AS (SELECT *, CAST(sum(n_vectors) OVER () AS BIGINT) AS n_all FROM p),
        | m AS (SELECT label, n_vectors,
        |    CASE WHEN n_vectors > 1 THEN
        |      CAST(round(CAST(s2 - q AS DOUBLE)
        |        / (CAST(n_vectors AS DOUBLE) * (n_vectors - 1)) / 1000000.0)
        |        AS BIGINT) END AS intra_micro,
        |    CASE WHEN n_all > n_vectors THEN
        |      CAST(round(CAST(inter_num AS DOUBLE)
        |        / (CAST(n_vectors AS DOUBLE) * (n_all - n_vectors)) / 1000000.0)
        |        AS BIGINT) END AS inter_micro
        |   FROM p2)
        |SELECT label, n_vectors, intra_micro, inter_micro,
        |  CAST(intra_micro - inter_micro AS BIGINT) AS gap_micro
        |FROM m""".stripMargin,
    // q221: embedding norm audit — 1e-6 norm ticks (q192 float
    // discipline), zero-norm census, q87-convention rank percentiles
    "q221_embedding_audit" ->
      """WITH norms AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
        |    CAST(round(round(sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6)
        |      * 1000000) AS BIGINT) AS tick
        |  FROM embeddings),
        | agg AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |    CAST(sum(CASE WHEN tick = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |    CAST(sum(tick) AS BIGINT) AS st,
        |    CAST(min(tick) AS BIGINT) AS min_micro,
        |    CAST(max(tick) AS BIGINT) AS max_micro
        |  FROM norms GROUP BY 1),
        | ranked AS (SELECT label, tick,
        |    CAST(row_number() OVER (PARTITION BY label
        |      ORDER BY tick ASC, vec_id ASC) AS BIGINT) AS rn
        |  FROM norms),
        | pos AS (SELECT label, pct,
        |    CAST(ceil(pct * n_vectors / 100.0) AS BIGINT) AS pos
        |   FROM agg, (SELECT unnest([10, 50, 90]) AS pct)),
        | p AS (SELECT r.label,
        |    max(CASE WHEN pct = 10 THEN tick END) AS p10,
        |    max(CASE WHEN pct = 50 THEN tick END) AS p50,
        |    max(CASE WHEN pct = 90 THEN tick END) AS p90
        |  FROM ranked r JOIN pos ON r.label = pos.label AND r.rn = pos.pos
        |  GROUP BY 1)
        |SELECT agg.label, n_vectors, n_zero,
        |  CAST(st // n_vectors AS BIGINT) AS mean_micro, min_micro, max_micro,
        |  CAST(p10 AS BIGINT) AS p10_micro, CAST(p50 AS BIGINT) AS p50_micro,
        |  CAST(p90 AS BIGINT) AS p90_micro
        |FROM agg JOIN p USING (label)""".stripMargin,
    // q225: quantile-quantile decile drift — source vs rest quantiles
    // read off the q213 cumulative grid (q87's ceil-position rule)
    "q225_qq_deciles" ->
      s"""WITH $docMetricsCte,
         | f AS (SELECT source, CAST(round(quality * 10000) AS BIGINT) AS tick
         |   FROM m),
         | cnt AS (SELECT source, tick, CAST(count(*) AS BIGINT) AS c
         |   FROM f GROUP BY 1, 2),
         | grid AS (SELECT s.source, t.tick
         |   FROM (SELECT DISTINCT source FROM cnt) s,
         |        (SELECT DISTINCT tick FROM cnt) t),
         | cum AS (SELECT g.source, g.tick,
         |    CAST(sum(coalesce(c, 0)) OVER (PARTITION BY g.source
         |      ORDER BY g.tick ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_s
         |   FROM grid g LEFT JOIN cnt
         |     ON g.source = cnt.source AND g.tick = cnt.tick),
         | full1 AS (SELECT *,
         |    CAST(sum(cum_s) OVER (PARTITION BY tick) AS BIGINT) AS cum_all,
         |    CAST(max(cum_s) OVER (PARTITION BY source) AS BIGINT) AS n_s
         |   FROM cum),
         | f2 AS (SELECT *, CAST(max(cum_all) OVER () AS BIGINT) AS n_all,
         |    cum_all - cum_s AS cum_r FROM full1),
         | d AS (SELECT *, n_all - n_s AS n_r,
         |    unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) AS pct FROM f2),
         | agg AS (SELECT source, CAST(pct AS BIGINT) AS pct,
         |    CAST(min(CASE WHEN cum_s >= ceil(pct * n_s / 100.0) THEN tick END)
         |      AS BIGINT) AS qs,
         |    CAST(min(CASE WHEN n_r > 0 AND cum_r >= ceil(pct * n_r / 100.0)
         |      THEN tick END) AS BIGINT) AS qr
         |   FROM d GROUP BY 1, 2)
         |SELECT source, pct,
         |  CAST(qs * 100 AS BIGINT) AS q_source_micro,
         |  CAST(qr * 100 AS BIGINT) AS q_rest_micro,
         |  CAST(qs * 100 - qr * 100 AS BIGINT) AS gap_micro
         |FROM agg""".stripMargin,
    // q226: uniform-target sampling-mix plan from source counts
    "q226_mix_plan" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        | w AS (SELECT *, CAST(count(*) OVER () AS BIGINT) AS n_sources,
        |    CAST(sum(n_docs) OVER () AS BIGINT) AS n_total,
        |    CAST(min(n_docs) OVER () AS BIGINT) AS n_min FROM c)
        |SELECT source, n_docs,
        |  CAST(n_docs * 1000000 // n_total AS BIGINT) AS natural_micro,
        |  CAST(1000000 // n_sources AS BIGINT) AS target_micro,
        |  CAST(n_min * 1000000 // n_docs AS BIGINT) AS rate_micro,
        |  n_min AS n_kept
        |FROM w""".stripMargin,
    // q227: joint length × quality histogram (token decades × quality
    // deciles) with micro shares
    "q227_joint_histogram" ->
      s"""WITH $docMetricsCte,
         | t AS (SELECT len(string_split(text, ' ')) AS n_tokens, doc_id
         |   FROM documents),
         | c AS (SELECT CAST(t.n_tokens // 10 AS BIGINT) AS len_decade,
         |    least(CAST(round(m.quality * 10000) AS BIGINT) // 1000, 9)
         |      AS q_decile
         |   FROM t JOIN m ON t.doc_id = m.doc_id),
         | g AS (SELECT len_decade, CAST(q_decile AS BIGINT) AS q_decile,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |   FROM c GROUP BY 1, 2)
         |SELECT len_decade, q_decile, n_docs,
         |  CAST(n_docs * 1000000 // CAST(sum(n_docs) OVER () AS BIGINT)
         |    AS BIGINT) AS share_micro
         |FROM g""".stripMargin,
    // q213: exact two-sample KS on the 1e-4 quality grid — each
    // source's CDF vs the rest, micro-floored, max over pooled ticks
    "q213_ks_drift" ->
      s"""WITH $docMetricsCte,
         | f AS (SELECT source, CAST(round(quality * 10000) AS BIGINT) AS tick
         |   FROM m),
         | cnt AS (SELECT source, tick, CAST(count(*) AS BIGINT) AS c
         |   FROM f GROUP BY 1, 2),
         | grid AS (SELECT s.source, t.tick
         |   FROM (SELECT DISTINCT source FROM cnt) s,
         |        (SELECT DISTINCT tick FROM cnt) t),
         | cum AS (SELECT g.source, g.tick,
         |    CAST(sum(coalesce(c, 0)) OVER (PARTITION BY g.source
         |      ORDER BY g.tick ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_s
         |   FROM grid g LEFT JOIN cnt
         |     ON g.source = cnt.source AND g.tick = cnt.tick),
         | full1 AS (SELECT *,
         |    CAST(sum(cum_s) OVER (PARTITION BY tick) AS BIGINT) AS cum_all,
         |    CAST(max(cum_s) OVER (PARTITION BY source) AS BIGINT) AS n_s
         |   FROM cum),
         | f2 AS (SELECT *, CAST(max(cum_all) OVER () AS BIGINT) AS n_all
         |   FROM full1)
         |SELECT source, CAST(max(n_s) AS BIGINT) AS n_source,
         |  CAST(max(n_all - n_s) AS BIGINT) AS n_rest,
         |  CAST(max(CASE WHEN n_all > n_s THEN
         |    abs(cum_s * 1000000 // n_s
         |        - (cum_all - cum_s) * 1000000 // (n_all - n_s)) END)
         |    AS BIGINT) AS d_micro
         |FROM f2 GROUP BY source""".stripMargin,
  )

  /** q211: per-nation OLS revenue trend — exact integer moments
    * (HUGEINT ≙ Spark Decimal(38); y² can pass int64 at sf1), doubles
    * only in the final slope/R² ratios with q195's operand order. */
  private lazy val q211Sql: String =
    """WITH mo AS (SELECT n_name,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 12
      |       + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      | m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(t AS HUGEINT) * t) AS stt,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(t AS HUGEINT) * y) AS sty
      |  FROM mo GROUP BY 1),
      | v AS (SELECT n_name, n,
      |    CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
      |      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS vt,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
      |    CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
      |      - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
      |  FROM m)
      |SELECT n_name, n AS n_months,
      |  CASE WHEN vt > 0 THEN round(cv / vt, 4) END AS slope_cents,
      |  CASE WHEN vt > 0 AND vy > 0 THEN
      |    CAST(round(round(cv * cv / (vt * vy), 6) * 1000000, 0) AS BIGINT)
      |  END AS r2_micro
      |FROM v""".stripMargin

  /** q212: calibration table — sigmoid of the published 4-decimal q71
    * logit, re-rounded to 4 decimals (the grid absorbs libm exp ULP),
    * ten equal-width probability bins, micro confidence vs accuracy. */
  private lazy val q212Sql: String =
    s"""WITH cls AS (
       |${oracleBase("q71_quality_classifier")}
       |),
       | $docMetricsCte,
       | f AS (SELECT
       |    CAST(round(round(1.0 / (1.0 + exp(-cls.logit)), 4) * 10000)
       |      AS BIGINT) AS tick,
       |    m.quality >= 0.66 AS pos
       |   FROM cls JOIN m ON cls.doc_id = m.doc_id),
       | b AS (SELECT least(tick // 1000, 9) AS bin,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(sum(tick) AS BIGINT) AS sum_tick
       |   FROM f GROUP BY 1)
       |SELECT bin, n_docs, n_pos,
       |  CAST(sum_tick * 100 // n_docs AS BIGINT) AS conf_micro,
       |  CAST(n_pos * 1000000 // n_docs AS BIGINT) AS acc_micro,
       |  CAST(abs(sum_tick * 100 // n_docs - n_pos * 1000000 // n_docs)
       |    AS BIGINT) AS gap_micro
       |FROM b""".stripMargin

  /** Width-5 token n-gram positions hashed to 16-hex keys — the
    * DuckDB replay of [[graft.operators.TextOps.dupNgramCoverage]]'s
    * `ngramHashes` (strict: docs under 5 tokens contribute nothing,
    * which `generate_series(1, len-4)` encodes for free). Shared by
    * q205 and q210. */
  private lazy val ngramPosCtes: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      | pos AS (SELECT doc_id,
      |    substr(md5(array_to_string(ts[i:i+4], ' ')), 1, 16) AS h
      |  FROM tok, UNNEST(generate_series(1, len(ts) - 4)) AS t(i))""".stripMargin

  /** SemDeDup's CTE chain (sem_-prefixed so it composes beside the
    * lexical-dedup CTEs in q114), shared by q100 and q114. The cell
    * count replays [[graft.operators.Similarity.semDedupCells]]'s √N
    * sizing from the same table (= 16 at the driver's 2000-vector test
    * corpora, growing beyond). */
  private lazy val SemDedupCtes: String =
    s"""sem_k AS (SELECT greatest(16,
       |    CAST(ceil(16.0 * sqrt(count(*) / 2000.0)) AS BIGINT)) AS k
       |  FROM embeddings),
       | sem_cents AS (SELECT vec_id AS centroid_id, embedding AS cent
       |               FROM embeddings WHERE vec_id < (SELECT k FROM sem_k)),
       | sem_sims AS (
       |  SELECT e.vec_id, e.embedding, c.centroid_id,
       |    round(list_sum(list_transform(range(1, 65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))), 6) AS cent_sim
       |  FROM embeddings e CROSS JOIN sem_cents c),
       | sem_assigned AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cent_sim DESC, centroid_id ASC) AS r
       |    FROM sem_sims) WHERE r = 1),
       | sem_dropped AS (
       |  SELECT DISTINCT b.vec_id FROM sem_assigned a JOIN sem_assigned b
       |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       |  WHERE round(list_sum(list_transform(range(1, 65),
       |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 6)
       |    >= ${graft.operators.Similarity.SemDedupThreshold})""".stripMargin

  /** The SCD2 build, shared verbatim by q101 and q102's probe. */
  private val Scd2Cte: String =
    """SELECT user_id,
      |  CAST(row_number() OVER win AS INTEGER) AS version_seq,
      |  value, ts AS valid_from, lead(ts) OVER win AS valid_to
      |FROM events WHERE event_type IN ('signup','purchase')
      |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
}
