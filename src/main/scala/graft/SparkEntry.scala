package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query returns a deterministic DataFrame (explicit ORDER
  * BY on a unique key; aggregated doubles routed through exact decimals,
  * see [[Det]]) and, where SQL-expressible, has a DuckDB oracle in
  * [[oracleSql]] with matching column names and types.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.goldDailyRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bronze_ingest"      -> ((s, d) => Relational.bronzeIngest(s, d)),
    "silver_clean"       -> ((s, d) => Relational.silverClean(s, d)),
    "gold_daily_revenue" -> ((s, d) => Aggregates.goldDailyRevenue(s, d)),
    "gold_hourly_demand" -> ((s, d) => Aggregates.goldHourlyDemand(s, d)),
    "sample_limit"       -> ((s, d) => Aggregates.sampleLimit(s, d)),
    "rollup_revenue"     -> ((s, d) => Aggregates.rollupRevenue(s, d)),
    "finished_no_pending" -> ((s, d) => Aggregates.finishedNoPending(s, d)),
    "event_type_stats"   -> ((s, d) => Aggregates.eventTypeStats(s, d)),
    "approx_stats"       -> ((s, d) => Aggregates.approxStats(s, d)),
    "cube_demand"        -> ((s, d) => Aggregates.cubeDemand(s, d)),
    "grouping_sets_demand" -> ((s, d) => Aggregates.groupingSetsDemand(s, d)),
    "pivot_revenue"      -> ((s, d) => Aggregates.pivotRevenue(s, d)),
    "repeat_buyers"      -> ((s, d) => Aggregates.repeatBuyers(s, d)),
    "moving_avg_revenue" -> ((s, d) => Aggregates.movingAvgRevenue(s, d)),
    "star_join"          -> ((s, d) => Star.starJoin(s, d)),
    "json_props"         -> ((s, d) => Star.jsonProps(s, d)),
    "variant_props"      -> ((s, d) => Star.variantProps(s, d)),
    "variant_explode"    -> ((s, d) => Star.variantExplode(s, d)),
    "window_topk"        -> ((s, d) => Star.windowTopk(s, d)),
    "grouped_topk"       -> ((s, d) => {
      // the custom bounded-heap operator (graft.plans.GroupedTopK);
      // projecting to (group, value) makes the output the top-k VALUE
      // multiset — deterministic under ties on both engines
      import org.apache.spark.sql.functions.col
      graft.plans.GroupedTopK
        .of(graft.Tables.orders(s, d)
          .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          Seq("o_orderpriority"), "o_totalprice", 3)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc)
    }),
    "customers_no_big_order" -> ((s, d) => Star.customersNoBigOrder(s, d)),
    "customers_with_events"  -> ((s, d) => Star.customersWithEvents(s, d)),
    "ship_lag_stats"     -> ((s, d) => Star.shipLagStats(s, d)),
    "asof_event_order"   -> ((s, d) => AsOf.eventOrders(s, d)),
    "range_join_transit" -> ((s, d) => RangeJoin.inTransitDaily(s, d)),
    "text_stats"         -> ((s, d) => Text.textStats(s, d)),
    "text_quality"       -> ((s, d) => Text.textQuality(s, d)),
    "lang_id"            -> ((s, d) => Text.langId(s, d)),
    "doc_fingerprint"    -> ((s, d) => Text.docFingerprint(s, d)),
    "pii_scrub"          -> ((s, d) => Text.piiScrub(s, d)),
    "quality_filter"     -> ((s, d) => Text.qualityFilterDist(s, d)),
    "token_bpe"          -> ((s, d) => Text.tokenBpe(s, d)),
    "token_bpe_learned"  -> ((s, d) => Bpe.tokenBpeLearned(s, d)),
    "heavy_tokens"       -> ((s, d) => Text.heavyTokens(s, d)),
    "text_repetition"    -> ((s, d) => Curate.textRepetition(s, d)),
    "decontaminate"      -> ((s, d) => Curate.decontaminate(s, d)),
    "domain_mix"         -> ((s, d) => Curate.domainMix(s, d)),
    "seq_pack"           -> ((s, d) => Curate.seqPackDist(s, d)),
    "export_manifest"    -> ((s, d) => graft.pipeline.CorpusExport.exportManifest(s, d)),
    "corpus_shuffle"     -> ((s, d) => Curate.corpusShuffle(s, d)),
    "data_split"         -> ((s, d) => Curate.dataSplit(s, d)),
    "dedup_incremental"  -> ((s, d) => Curate.dedupIncremental(s, d)),
    "dedup_exact"        -> ((s, d) => Dedup.dedupExact(s, d)),
    "dedup_ngram"        -> ((s, d) => Dedup.dedupNgram(s, d)),
    "dedup_clusters"     -> ((s, d) => Components.dedupClusters(s, d)),
    "dedup_incremental_ngram" -> ((s, d) => Dedup.dedupIncrementalNgram(s, d)),
    "dedup_minhash"      -> ((s, d) => Dedup.dedupMinhash(s, d)),
    "dedup_simhash"      -> ((s, d) => Dedup.dedupSimhash(s, d)),
    "dedup_embedding"    -> ((s, d) => Dedup.dedupEmbedding(s, d)),
    "dedup_semantic"     -> ((s, d) => Dedup.dedupSemantic(s, d)),
    "similarity_topk"    -> ((s, d) => Similarity.similarityTopk(s, d)),
    "similarity_ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "similarity_ivf"     -> ((s, d) => Similarity.annIvf(s, d)),
    "embedding_stats"    -> ((s, d) => Similarity.embeddingStats(s, d)),
    "embedding_centroid" -> ((s, d) => Similarity.embeddingCentroids(s, d)),
    "multimodal_meta"    -> ((s, d) => Multimodal.multimodalMeta(s, d)),
    "multimodal_image_meta" -> ((s, d) => Multimodal.multimodalImageMeta(s, d)),
    "multimodal_blob_ingest" -> ((s, d) => Multimodal.multimodalBlobIngest(s, d)),
    "multimodal_audio_meta" -> ((s, d) => Multimodal.multimodalAudioMeta(s, d)),
    "dedup_image_phash"  -> ((s, d) => Multimodal.dedupImagePhash(s, d)),
    "dedup_audio_fp"     -> ((s, d) => Multimodal.dedupAudioFp(s, d)),
    "dedup_video_fp"     -> ((s, d) => Multimodal.dedupVideoFp(s, d)),
    "multimodal_video_meta" -> ((s, d) => Multimodal.multimodalVideoMeta(s, d)),
    "ml_train"           -> ((s, d) => graft.ml.RevenueModel.trainEvalChecked(s, d)),
    "term_relevance"     -> ((s, d) => Text.termRelevance(s, d)),
    "skew_join_salted"   -> ((s, d) => Skew.skewJoinSalted(s, d)),
    "dup_spans"          -> ((s, d) => Curate.dupSpans(s, d)),
    "fuzzy_dedup"        -> ((s, d) => Dedup.fuzzyDedup(s, d)),
    "stratified_quota"   -> ((s, d) => Curate.stratifiedQuotaQuery(s, d)),
    "unpivot_metrics"    -> ((s, d) => Aggregates.unpivotMetrics(s, d)),
    "span_scrub"         -> ((s, d) => Curate.spanScrubQuery(s, d)),
    "funnel_conversion"  -> ((s, d) => Star.funnelConversion(s, d)),
    "cohort_retention"   -> ((s, d) => Aggregates.cohortRetention(s, d)),
    "embedding_quantize" -> ((s, d) => Similarity.embeddingQuantize(s, d)),
    "gap_fill"           -> ((s, d) => TimeSeries.gapFillQuery(s, d)),
    "supplier_profit"    -> ((s, d) => Star.supplierProfit(s, d)),
    "vocab_oov"          -> ((s, d) => Text.vocabOov(s, d)),
    "order_event_reconcile" -> ((s, d) => Star.orderEventReconcile(s, d)),
    "anomaly_days"       -> ((s, d) => TimeSeries.anomalyQuery(s, d)),
    "rolling_users"      -> ((s, d) => TimeSeries.rollingUsersQuery(s, d)),
    "order_value_quantiles" -> ((s, d) => Aggregates.orderValueQuantiles(s, d)),
    "column_profile"     -> ((s, d) => Profile.lineitemProfile(s, d)),
    "copurchase_pairs"   -> ((s, d) => Basket.copurchaseQuery(s, d)),
    "pagerank_copurchase" -> ((s, d) => Graph.pagerankCopurchase(s, d)),
    "embedding_project"  -> ((s, d) => Similarity.embeddingProject(s, d)),
    "sketch_distinct_rollup" -> ((s, d) => Sketches.monthlyDistinctUsers(s, d)),
    "quantile_histogram_rollup" -> ((s, d) => Sketches.monthlyValueQuantiles(s, d)),
    "quantile_sketch_rollup" -> ((s, d) => Sketches.quantileSketchRollup(s, d)),
    "change_feed_gold"   -> ((s, d) => graft.pipeline.Medallion.changeFeedGold(s, d)),
    "merge_upsert"       -> ((s, d) => graft.pipeline.Medallion.mergeUpsertOrders(s, d)),
    "merge_conditional"  -> ((s, d) => graft.pipeline.Medallion.mergeConditionalOrders(s, d)),
    "merge_partitioned"  -> ((s, d) => graft.pipeline.Medallion.mergePartitionedOrders(s, d)),
    "merge_delete_dv"    -> ((s, d) => graft.pipeline.Medallion.mergeDeleteDvOrders(s, d)),
    "time_travel_timestamp" -> ((s, d) => graft.pipeline.Medallion.timeTravelOrders(s, d)),
    "schema_evolution"   -> ((s, d) => graft.pipeline.Medallion.schemaEvolutionOrders(s, d)),
    "change_feed_merge"  -> ((s, d) => graft.pipeline.Medallion.changeFeedMerge(s, d)),
    "constraint_enforce" -> ((s, d) => graft.pipeline.Medallion.constraintEnforceOrders(s, d)),
    "table_clone"        -> ((s, d) => graft.pipeline.Medallion.tableCloneOrders(s, d)),
    "deep_clone"         -> ((s, d) => graft.pipeline.Medallion.deepCloneOrders(s, d)),
    "merge_by_source"    -> ((s, d) => graft.pipeline.Medallion.mergeBySourceOrders(s, d)),
    "merge_composite_key" -> ((s, d) => graft.pipeline.Medallion.mergeCompositeLineitem(s, d)),
    "merge_residual_on"  -> ((s, d) => graft.pipeline.Medallion.mergeResidualOrders(s, d)),
    "column_defaults"    -> ((s, d) => graft.pipeline.Medallion.columnDefaultsOrders(s, d)),
    "table_restore"      -> ((s, d) => graft.pipeline.Medallion.tableRestoreOrders(s, d)),
    "point_lookup_bloom" -> ((s, d) => graft.pipeline.Medallion.pointLookupOrders(s, d)),
    "zorder_optimize"    -> ((s, d) => graft.pipeline.Medallion.zorderOptimizeOrders(s, d)),
    "column_mapping"     -> ((s, d) => graft.pipeline.Medallion.columnMappingOrders(s, d)),
    "generated_columns"  -> ((s, d) => graft.pipeline.Medallion.generatedColumnOrders(s, d)),
    "ndv_stats"          -> ((s, d) => graft.pipeline.Medallion.ndvStatsOrders(s, d)),
    "table_history"      -> ((s, d) => graft.pipeline.Medallion.tableHistoryOrders(s, d)),
    "row_tracking"       -> ((s, d) => graft.pipeline.Medallion.rowTrackingOrders(s, d)),
    "update_where"       -> ((s, d) => graft.pipeline.Medallion.updateWhereOrders(s, d)),
    "delete_where"       -> ((s, d) => graft.pipeline.Medallion.deleteWhereOrders(s, d)),
    "delete_where_dv"    -> ((s, d) => graft.pipeline.Medallion.deleteWhereDvOrders(s, d)),
    "update_where_dv"    -> ((s, d) => graft.pipeline.Medallion.updateWhereDvOrders(s, d)),
    "sql_merge_upsert"   -> ((s, d) => graft.pipeline.Medallion.sqlMergeUpsert(s, d)),
    "cluster_incremental" -> ((s, d) => graft.pipeline.Medallion.clusterIncrementalOrders(s, d)),
    "replace_where"      -> ((s, d) => graft.pipeline.Medallion.replaceWhereOrders(s, d)),
    "format_roundtrip"   -> ((s, d) => graft.pipeline.Medallion.formatRoundtrip(s, d)),
    "merge_evolution"    -> ((s, d) => graft.pipeline.Medallion.mergeEvolutionOrders(s, d)),
    "merge_evolution_assign" -> ((s, d) => graft.pipeline.Medallion.mergeEvolutionAssignOrders(s, d)),
    "auto_optimize"      -> ((s, d) => graft.pipeline.Medallion.autoOptimizeOrders(s, d)),
    "scd2_orders"        -> ((s, d) => graft.pipeline.Medallion.scd2Orders(s, d)),
    "apply_changes_scd1" -> ((s, d) => graft.pipeline.Medallion.applyChangesScd1Orders(s, d)),
    "stream_apply_changes" -> ((s, d) => graft.pipeline.Medallion.streamApplyChanges(s, d)),
    "stream_apply_changes_scd2" -> ((s, d) => graft.pipeline.Medallion.streamApplyChangesScd2(s, d)),
    "apply_changes_snapshot" -> ((s, d) => graft.pipeline.Medallion.applyChangesSnapshotOrders(s, d)),
    "variant_shredded"   -> ((s, d) => graft.pipeline.Medallion.variantShredded(s, d)),
    "variant_array_shred" -> ((s, d) => graft.pipeline.Medallion.variantArrayShred(s, d)),
    "expectations_gate"  -> ((s, d) => graft.pipeline.Expectations.expectationsGate(s, d)),
    "expectations_persisted" -> ((s, d) => graft.pipeline.Medallion.expectationsPersisted(s, d)),
    "pipeline_dag"       -> ((s, d) => graft.pipeline.Dag.pipelineDagQuery(s, d)),
    "pipeline_cdc"       -> ((s, d) => graft.pipeline.Dag.pipelineCdcQuery(s, d)),
    "pipeline_sql"       -> ((s, d) => graft.pipeline.Dag.pipelineSqlQuery(s, d)),
    "pipeline_agg"       -> ((s, d) => graft.pipeline.Dag.pipelineAggQuery(s, d)),
    "pipeline_full"      -> ((s, d) => graft.pipeline.Dag.pipelineFullQuery(s, d)),
    "pipeline_quarantine" -> ((s, d) => graft.pipeline.Dag.pipelineQuarantineQuery(s, d)),
    "pipeline_snapshot"  -> ((s, d) => graft.pipeline.Dag.pipelineSnapshotQuery(s, d)),
    "pipeline_continuous" -> ((s, d) => graft.pipeline.Dag.pipelineContinuousQuery(s, d)),
    "catalog_table_verbs" -> ((s, d) => graft.pipeline.Medallion.catalogTableVerbs(s, d)),
    "writer_v2"          -> ((s, d) => graft.pipeline.Medallion.writerV2Verbs(s, d)),
    "table_properties"   -> ((s, d) => graft.pipeline.Medallion.tablePropertiesQuery(s, d)),
    "fluent_table_verbs" -> ((s, d) => graft.pipeline.Medallion.fluentTableVerbs(s, d)),
    "symlink_manifest"   -> ((s, d) => graft.pipeline.Medallion.symlinkManifestQuery(s, d)),
    "merge_multi_clause" -> ((s, d) => graft.pipeline.Medallion.mergeMultiClause(s, d)),
    "cdf_read_options"   -> ((s, d) => graft.pipeline.Medallion.cdfReadOptions(s, d)),
    "add_columns"        -> ((s, d) => graft.pipeline.Medallion.addColumnsOrders(s, d)),
    "catalog_time_travel" -> ((s, d) => graft.pipeline.Medallion.catalogTimeTravel(s, d)),
    "copy_into"          -> ((s, d) => graft.pipeline.Medallion.copyIntoOrders(s, d)),
    "convert_table"      -> ((s, d) => graft.pipeline.Medallion.convertTableOrders(s, d)),
    "bm25_rank"          -> ((s, d) => Text.bm25Rank(s, d)),
    "unigram_nll"        -> ((s, d) => Text.unigramNll(s, d)),
    "doc_chunk"          -> ((s, d) => Curate.docChunkQuery(s, d)),
    "domain_resample"    -> ((s, d) => Curate.domainResample(s, d)),
    "bigram_pmi"         -> ((s, d) => Text.bigramPmi(s, d)),
    "token_entropy"      -> ((s, d) => Text.tokenEntropy(s, d)),
    "bigram_nll"         -> ((s, d) => Text.bigramNll(s, d)),
    "embedding_knn"      -> ((s, d) => Similarity.embeddingKnn(s, d)),
    "similarity_ivf_rq"  -> ((s, d) => Similarity.annIvfRq(s, d)),
    "stream_hourly_demand" -> ((s, d) => graft.streaming.EventsStream.hourlyDemandStream(s, d)),
    "stream_view_purchase" -> ((s, d) => graft.streaming.EventsStream.viewPurchaseStream(s, d)),
    "stream_left_outer"  -> ((s, d) => graft.streaming.EventsStream.viewPurchaseLeftStream(s, d)),
    "stream_enrich"      -> ((s, d) => graft.streaming.EventsStream.enrichEventsStream(s, d)),
    "stream_hourly_quantiles" -> ((s, d) => graft.streaming.EventsStream.hourlyQuantilesStream(s, d)),
    "stream_table_feed"  -> ((s, d) => graft.streaming.TableFeedSource.streamTableFeed(s, d)),
    "stream_feed_bounded" -> ((s, d) => graft.streaming.TableFeedSource.streamTableFeedBounded(s, d)),
    "stream_feed_images" -> ((s, d) => graft.streaming.TableFeedSource.streamTableFeedImages(s, d)),
    "stream_feed_from"   -> ((s, d) => graft.streaming.TableFeedSource.streamTableFeedFrom(s, d)),
    "feed_gold_images"   -> ((s, d) => graft.streaming.TableFeedSource.feedGoldImagesQuery(s, d)),
    "stream_sink_ingest" -> ((s, d) => graft.streaming.EventsStream.streamSinkIngest(s, d)),
    "stream_dedup"       -> ((s, d) => graft.streaming.EventsStream.dedupEventsStream(s, d)),
    "stream_heavy_users" -> ((s, d) => graft.streaming.EventsStream.heavyUsersStream(s, d)),
    "sessionize"         -> ((s, d) => graft.streaming.Sessionize.sessions(s, d)),
    "stream_sessionize"  -> ((s, d) => graft.streaming.Sessionize.sessionsStreamed(s, d)),
  )

  /** DuckDB-equivalent ANSI SQL per query key (same parquet tables,
    * registered by table name). Column names/ordering aliases match the
    * Spark side exactly — the driver sorts columns by name before hashing.
    *
    * FROZEN-EXPECTED oracles: five queries compute with engine-native
    * hashing (xxhash64 minhash/simhash/LSH signatures) or a learned BPE
    * table that no SQL engine reproduces — but their outputs are fully
    * deterministic (seeded hashes, per-row float math with fixed fold
    * order, total-order sorts), so their oracle reads a frozen expected
    * parquet committed under `expected/sf0.01/` (provenance + regen
    * recipe in `expected/README.md`). That turns the former rows-only
    * checks into exact regression gates; the SEMANTIC gates stay in the
    * specs (recall vs exact jaccard, pigeonhole soundness, planted-twin
    * recall floors, BPE brute-force properties). Valid at sf0.01 — the
    * driver's correctness scale — by construction.
    */
  def oracleSql: Map[String, String] = Map(
    // Banded contract check (RevenueModel.trainEvalChecked scaladoc):
    // the oracle recomputes the gold group count the split must cover
    // exactly and expects every model-quality clause true.
    "ml_train" ->
      """SELECT (SELECT COUNT(*) FROM (
           SELECT o_custkey, date_trunc('day', o_orderdate) AS day
           FROM orders GROUP BY 1, 2)) AS n_rows,
         true AS split_ok, true AS mae_le_rmse_ok,
         true AS beats_mean_ok, true AS r2_ok""",
    "dedup_minhash" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/dedup_minhash.parquet')
         ORDER BY doc1, doc2""",
    "dedup_simhash" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/dedup_simhash.parquet')
         ORDER BY doc1, doc2""",
    "token_bpe_learned" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/token_bpe_learned.parquet')
         ORDER BY doc_id""",
    "dedup_embedding" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/dedup_embedding.parquet')
         ORDER BY vec1, vec2""",
    "similarity_ann_lsh" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/similarity_ann_lsh.parquet')
         ORDER BY probe_id, rank""",
    // freezable since round 5's exact-decimal centroids (order-
    // independent means — no float Summarizer merge-order sensitivity)
    "similarity_ivf" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/similarity_ivf.parquet')
         ORDER BY probe_id, rank""",
    // freezable since the exact-decimal k-means fit replaced spark.ml
    // (salted-hash init + DECIMAL means: deterministic by construction)
    "dedup_semantic" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/dedup_semantic.parquet')
         ORDER BY vec1, vec2""",
    // freezable for the same reasons as similarity_ivf plus: residual
    // codes are integer outputs of fixed-order IEEE expressions and the
    // min/max calibration is order-independent (no float summation)
    "similarity_ivf_rq" ->
      """SELECT * FROM read_parquet('/root/repo/expected/sf0.01/similarity_ivf_rq.parquet')
         ORDER BY probe_id, rank""",
    "bronze_ingest" ->
      """SELECT event_id, user_id, event_type, value,
         CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
         CAST(dayofmonth(ts) AS INTEGER) AS day, CAST(hour(ts) AS INTEGER) AS hour
         FROM events ORDER BY event_id""",
    // The named-format streaming sink (EventsStream.streamSinkIngest,
    // writeStream.format over GraftSinkProvider) must land EXACTLY the
    // batch bronze derivation — no lost, duplicated, or reordered rows
    // across its tagged micro-batch commits.
    "stream_sink_ingest" ->
      """SELECT event_id, user_id, event_type, value,
         CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
         CAST(dayofmonth(ts) AS INTEGER) AS day, CAST(hour(ts) AS INTEGER) AS hour
         FROM events ORDER BY event_id""",
    "silver_clean" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate,
         l_extendedprice * (1.0 - l_discount) AS revenue,
         (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge,
         CAST(year(l_shipdate) AS INTEGER) AS ship_year,
         CAST(month(l_shipdate) AS INTEGER) AS ship_month
         FROM lineitem
         WHERE l_quantity > 0 AND l_extendedprice > 0
           AND l_discount >= 0 AND l_discount <= 1 AND l_tax >= 0
           AND l_quantity < l_extendedprice
           AND l_quantity > 0 AND l_quantity < 50
         ORDER BY l_orderkey, l_linenumber""",
    "gold_daily_revenue" ->
      """SELECT o_custkey, date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS daily_revenue,
         COUNT(*) AS order_count,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value
         FROM orders GROUP BY 1, 2 ORDER BY o_custkey, day""",
    "gold_hourly_demand" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
         COUNT(*) AS event_count,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, hour""",
    "sample_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey LIMIT 100""",
    "rollup_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS order_count,
         CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
         CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""",
    "finished_no_pending" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "event_type_stats" ->
      """SELECT event_type,
         COUNT(DISTINCT user_id) AS distinct_users,
         COUNT(*) AS events,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1 ORDER BY event_type""",
    // Banded sketch oracle (see Sketches.monthlyDistinctUsers): exact
    // anchors recomputed; in-query verdicts expected literal TRUE.
    "sketch_distinct_rollup" ->
      """SELECT event_type, date_trunc('month', ts) AS month,
         COUNT(*) AS events, COUNT(DISTINCT user_id) AS distinct_users,
         TRUE AS users_within_5pct, TRUE AS merge_consistent
         FROM events GROUP BY 1, 2 ORDER BY event_type, month""",
    // Direct monthly recompute: the Spark side goes through the DAILY
    // histogram state, so a hash match proves the merge is lossless.
    "quantile_histogram_rollup" ->
      """WITH h AS (
           SELECT date_trunc('month', o_orderdate) AS month,
             CAST(floor(o_totalprice / 100.0) AS BIGINT) AS bin, COUNT(*) AS n
           FROM orders GROUP BY 1, 2),
         c AS (
           SELECT month, bin, n,
             SUM(n) OVER (PARTITION BY month ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER (PARTITION BY month) AS total
           FROM h),
         p AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS p)
         SELECT month, p,
           CAST(MIN(bin) * 100.0 AS DOUBLE) AS value_floor,
           CAST(MAX(total) AS BIGINT) AS n_orders
         FROM c, p WHERE cum >= ceil(p * total)
         GROUP BY month, p ORDER BY month, p""",
    // Banded sketch oracle (Sketches.quantileSketchRollup): exact
    // anchors recomputed; within_alpha (log-bin relative-error bound)
    // and merge_consistent (daily→monthly state merge losslessness)
    // are in-query verdicts the oracle expects literal TRUE.
    "quantile_sketch_rollup" ->
      """SELECT date_trunc('month', o_orderdate) AS month, p,
         COUNT(*) AS n_orders,
         TRUE AS within_alpha, TRUE AS merge_consistent
         FROM orders, (SELECT UNNEST([0.5, 0.9, 0.99]) AS p)
         GROUP BY 1, 2 ORDER BY month, p""",
    // Banded sketch oracle: exact anchors recomputed here; the sketch
    // columns arrive as booleans already checked against their error
    // bands inside the Spark aggregation (see Aggregates.approxStats).
    "approx_stats" ->
      """SELECT event_type, COUNT(*) AS events,
         COUNT(DISTINCT user_id) AS distinct_users,
         TRUE AS users_within_5pct, TRUE AS p50_in_band, TRUE AS p95_in_band
         FROM events GROUP BY 1 ORDER BY event_type""",
    "cube_demand" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
         COUNT(*) AS events,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
         CAST(GROUPING(event_type) AS INTEGER) AS g_type,
         CAST(GROUPING(hour(ts)) AS INTEGER) AS g_hour
         FROM events GROUP BY CUBE(event_type, hour(ts))
         ORDER BY g_type, g_hour, event_type, hour""",
    "grouping_sets_demand" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
         COUNT(*) AS events,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
         CAST(GROUPING(event_type) AS INTEGER) AS g_type,
         CAST(GROUPING(hour(ts)) AS INTEGER) AS g_hour
         FROM events GROUP BY GROUPING SETS ((event_type), (hour(ts)))
         ORDER BY g_type, g_hour, event_type, hour""",
    "pivot_revenue" ->
      """SELECT o_orderstatus,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p_urgent,
         CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p_high,
         CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p_medium,
         CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p_notspec,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p_low
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "repeat_buyers" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         ORDER BY o_custkey""",
    "moving_avg_revenue" ->
      """WITH daily AS (
           SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           FROM orders GROUP BY 1)
         SELECT day, revenue,
           AVG(revenue) OVER (ORDER BY CAST(floor(epoch(day)) AS BIGINT)
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS revenue_7d_avg
         FROM daily ORDER BY day""",
    "star_join" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS line_count
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY r_name, n_name""",
    "json_props" ->
      """SELECT event_type,
         COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_count,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
         MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
         MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
         FROM events GROUP BY 1 ORDER BY event_type""",
    // VARIANT parse-once/extract-many twin of json_props: k buckets
    // with exact-decimal value sums; the missing-path extraction must
    // contribute zero non-nulls
    "variant_props" ->
      """SELECT CAST(k % 7 AS BIGINT) AS k_bucket,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                  AS value_sum,
                MIN(k) AS k_min, MAX(k) AS k_max,
                CAST(0 AS BIGINT) AS missing_nonnull
         FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS k, value
               FROM events)
         GROUP BY 1 ORDER BY k_bucket""",
    // VARIANT array explode: the synthesized payload's elements are
    // pure event_id arithmetic (e%4+1 elements, element i = e%97+7i),
    // so the oracle re-derives the explode via generate_series; key
    // is NULL for array elements -> key_nonnull pinned at 0
    "variant_explode" ->
      """SELECT CAST((event_id % 97 + i * 7) % 10 AS BIGINT) AS bucket,
                COUNT(*) AS n,
                CAST(SUM(event_id % 97 + i * 7) AS BIGINT) AS elem_sum,
                CAST(MAX(i) AS BIGINT) AS pos_max,
                CAST(0 AS BIGINT) AS key_nonnull
         FROM (SELECT event_id,
                      unnest(generate_series(0,
                        CAST(event_id % 4 AS BIGINT))) AS i
               FROM events)
         GROUP BY 1 ORDER BY bucket""",
    "window_topk" ->
      """SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice, priority_revenue
         FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank_in_priority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                  OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS priority_revenue
           FROM orders)
         WHERE rank_in_priority <= 3
         ORDER BY o_orderpriority, rank_in_priority""",
    "grouped_topk" ->
      """SELECT o_orderpriority, o_totalprice FROM (
           SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC) AS rn
           FROM orders)
         WHERE rn <= 3
         ORDER BY o_orderpriority, o_totalprice DESC""",
    "customers_no_big_order" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000.0)
         ORDER BY c_custkey""",
    "customers_with_events" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_custkey IN (SELECT user_id FROM events WHERE event_type = 'purchase')
         ORDER BY c_custkey""",
    "ship_lag_stats" ->
      """SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INTEGER) AS lag_days,
         COUNT(*) AS lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderdate <= l_shipdate
         GROUP BY 1 ORDER BY lag_days""",
    "asof_event_order" ->
      """WITH u AS (
           SELECT o_custkey AS key, o_orderdate AS t, 0 AS tag,
                  o_orderkey AS tie, o_orderkey AS r_orderkey,
                  o_orderdate AS r_orderdate, o_totalprice AS r_totalprice,
                  CAST(NULL AS BIGINT) AS event_id,
                  CAST(NULL AS VARCHAR) AS event_type
           FROM orders
           UNION ALL
           SELECT user_id, ts, 1, event_id, NULL, NULL, NULL,
                  event_id, event_type
           FROM events),
         w AS (
           SELECT *,
             last_value(r_orderkey IGNORE NULLS) OVER win AS asof_orderkey,
             last_value(r_orderdate IGNORE NULLS) OVER win AS asof_orderdate,
             last_value(r_totalprice IGNORE NULLS) OVER win AS asof_totalprice
           FROM u
           WINDOW win AS (PARTITION BY key ORDER BY t, tag, tie
                          ROWS UNBOUNDED PRECEDING))
         SELECT event_id, key AS user_id, t AS ts,
                asof_orderkey, asof_orderdate, asof_totalprice
         FROM w WHERE tag = 1 ORDER BY event_id""",
    "range_join_transit" ->
      """WITH iv AS (
           SELECT lo, least(hi, lo + INTERVAL 6 DAY) AS hi FROM (
             SELECT date_trunc('day', o.o_orderdate) AS lo,
                    date_trunc('day', l.l_shipdate) AS hi
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             WHERE date_trunc('day', o.o_orderdate) <= date_trunc('day', l.l_shipdate))),
         d AS (SELECT DISTINCT date_trunc('day', o_orderdate) AS day FROM orders)
         SELECT day, COUNT(*) AS in_transit
         FROM d JOIN iv ON day >= lo AND day <= hi
         GROUP BY 1 ORDER BY day""",
    "text_stats" ->
      """SELECT lang, source, COUNT(*) AS docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
         FROM documents GROUP BY 1, 2 ORDER BY lang, source""",
    "text_quality" ->
      """SELECT doc_id, lang,
         CAST(length(text) AS INTEGER) AS n_chars_measured,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
         CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\s+')) AS avg_token_len,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS punct_chars,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t IN ('the','a','of','and','to','in','is','on'))) AS INTEGER) AS stopword_hits,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio
         FROM documents ORDER BY doc_id""",
    "lang_id" ->
      """SELECT doc_id, lang AS labeled_lang,
         (CASE WHEN contains(' '||lower(text)||' ', ' the ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' and ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' of ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' is ') THEN 1 ELSE 0 END) AS en_score,
         (CASE WHEN contains(' '||lower(text)||' ', ' el ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' la ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' de ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' que ') THEN 1 ELSE 0 END) AS es_score,
         (CASE WHEN contains(' '||lower(text)||' ', ' der ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' die ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' und ') THEN 1 ELSE 0 END
        + CASE WHEN contains(' '||lower(text)||' ', ' das ') THEN 1 ELSE 0 END) AS de_score,
         CASE WHEN en_score >= es_score AND en_score >= de_score THEN 'en'
              WHEN es_score >= de_score THEN 'es' ELSE 'de' END AS predicted_lang
         FROM documents ORDER BY doc_id""",
    "token_bpe" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
               t -> CAST(floor((strlen(t)+3)/4) AS BIGINT))),
           (a,b) -> a + b) AS BIGINT) AS n_pieces,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
               t -> CAST(ascii(t) AS BIGINT)*131 + strlen(t))),
           (a,b) -> (a*31 + b) % 1000000007) AS BIGINT) AS rolling_fp
         FROM documents ORDER BY doc_id""",
    "heavy_tokens" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
           FROM documents)
         SELECT token, COUNT(*) AS occurrences
         FROM toks GROUP BY 1
         ORDER BY occurrences DESC, token LIMIT 10""",
    "doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_fp,
         md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS shingle_fp
         FROM documents ORDER BY doc_id""",
    "pii_scrub" ->
      """SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^ \t\n]+', '<URL>', 'g'),
           '[0-9]{6,}', '<NUM>', 'g') AS clean_text,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^ \t\n]+')) AS BIGINT) AS n_urls,
         CAST(len(regexp_extract_all(
           regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ \t\n]+', '<URL>', 'g'),
           '[0-9]{6,}')) AS BIGINT) AS n_numbers
         FROM documents ORDER BY doc_id""",
    "quality_filter" ->
      """WITH q AS (
           SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                  t -> t IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
               / len(string_split_regex(trim(text), '\s+')) AS score
           FROM documents),
         r AS (
           SELECT doc_id, lang, score,
             percent_rank() OVER (ORDER BY score, doc_id) AS q_rank
           FROM q)
         SELECT doc_id, lang, score, q_rank FROM r
         WHERE q_rank >= 0.2 ORDER BY doc_id""",
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
         g AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) >= 2
                      THEN [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
                      ELSE [] END AS grams
               FROM t)
         SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_frac,
           CASE WHEN len(grams) > 0
                THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(grams) > 0
                THEN CAST(list_max(list_transform(list_distinct(grams),
                       x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE) / len(grams)
                ELSE 0.0 END AS top_2gram_frac
         FROM g ORDER BY doc_id""",
    "decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(t) >= 3
                  THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  ELSE [] END) AS s
           FROM toks),
         bench AS (SELECT doc_id AS bench_id, unnest(s) AS gram FROM sh WHERE doc_id % 25 = 0),
         corp AS (SELECT doc_id, len(s) AS n_grams, unnest(s) AS gram FROM sh WHERE doc_id % 25 <> 0),
         hits AS (
           SELECT c.doc_id, b.bench_id, c.n_grams, COUNT(*) AS common
           FROM corp c JOIN bench b USING (gram)
           GROUP BY 1, 2, 3)
         SELECT doc_id, bench_id, CAST(common AS BIGINT) AS common,
                CAST(common AS DOUBLE) / n_grams AS overlap_frac
         FROM hits WHERE common >= 4
         ORDER BY doc_id, bench_id""",
    "domain_mix" ->
      """SELECT doc_id, lang, source,
           substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
         FROM documents
         WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) <
           CASE lang WHEN 'en' THEN '40000000' WHEN 'zh' THEN 'c0000000'
                     ELSE '80000000' END
         ORDER BY doc_id""",
    "seq_pack" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS cb
           FROM t)
         SELECT doc_id, n_tokens,
           CAST(floor(cb / 256.0) AS BIGINT) AS chunk_first,
           CAST(floor((cb + n_tokens - 1) / 256.0) AS BIGINT) AS chunk_last,
           CAST(cb % 256 AS BIGINT) AS chunk_offset
         FROM c ORDER BY doc_id""",
    "export_manifest" ->
      """WITH s AS (
           SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CASE WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < '20000000' THEN 0
                  WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000' THEN 1
                  WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < '60000000' THEN 2
                  WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000' THEN 3
                  WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'a0000000' THEN 4
                  WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000' THEN 5
                  WHEN substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e0000000' THEN 6
                  ELSE 7 END AS shard
           FROM documents)
         SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS doc_checksum
         FROM s GROUP BY shard ORDER BY shard""",
    "corpus_shuffle" ->
      """SELECT doc_id, substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 16) AS shuffle_key
         FROM documents
         ORDER BY shuffle_key, doc_id""",
    "data_split" ->
      """SELECT doc_id, lang,
           CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
                WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "dedup_incremental" ->
      """SELECT doc_id, lang, source, n_chars FROM documents b
         WHERE doc_id % 5 = 0
           AND NOT EXISTS (SELECT 1 FROM documents e
                           WHERE e.doc_id % 5 <> 0 AND e.text = b.text)
         ORDER BY doc_id""",
    "dedup_exact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM (
           SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",
    "dedup_ngram" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(t) >= 3
                  THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  ELSE [] END) AS s
           FROM toks),
         posting AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         pruned AS (
           SELECT doc_id, n_sh, shingle,
                  COUNT(*) OVER (PARTITION BY shingle) AS df
           FROM posting),
         pairs AS (
           SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                  a.n_sh AS n1, b.n_sh AS n2, COUNT(*) AS common
           FROM (SELECT * FROM pruned WHERE df <= 1000) a
           JOIN (SELECT * FROM pruned WHERE df <= 1000) b USING (shingle)
           WHERE a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT doc1, doc2, common,
                CAST(common AS DOUBLE) / (n1 + n2 - common) AS jaccard
         FROM pairs
         WHERE CAST(common AS DOUBLE) / (n1 + n2 - common) >= 0.5
         ORDER BY doc1, doc2""",
    "dedup_incremental_ngram" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(t) >= 3
                  THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  ELSE [] END) AS s
           FROM toks),
         posting AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         b0 AS (SELECT doc_id AS b_id, n_sh AS b_n, shingle FROM posting
                WHERE doc_id % 20 = 0),
         bok AS (SELECT shingle FROM b0 GROUP BY 1 HAVING COUNT(*) <= 1000),
         b AS (SELECT b0.* FROM b0 JOIN bok USING (shingle)),
         e AS (SELECT doc_id AS e_id, n_sh AS e_n, shingle FROM posting
               WHERE doc_id % 20 <> 0),
         pairs AS (
           SELECT b_id, e_id, b_n, e_n, COUNT(*) AS common
           FROM e JOIN b USING (shingle)
           GROUP BY 1, 2, 3, 4)
         SELECT b_id, e_id, common,
                CAST(common AS DOUBLE) / (b_n + e_n - common) AS jaccard
         FROM pairs
         WHERE CAST(common AS DOUBLE) / (b_n + e_n - common) >= 0.5
         ORDER BY b_id, e_id""",
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(t) >= 3
                  THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  ELSE [] END) AS s
           FROM toks),
         posting AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         pruned AS (
           SELECT doc_id, n_sh, shingle,
                  COUNT(*) OVER (PARTITION BY shingle) AS df
           FROM posting),
         pairs AS (
           SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                  a.n_sh AS n1, b.n_sh AS n2, COUNT(*) AS common
           FROM (SELECT * FROM pruned WHERE df <= 1000) a
           JOIN (SELECT * FROM pruned WHERE df <= 1000) b USING (shingle)
           WHERE a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         sel AS (
           SELECT doc1, doc2 FROM pairs
           WHERE CAST(common AS DOUBLE) / (n1 + n2 - common) >= 0.5),
         edges AS (SELECT doc1 AS a, doc2 AS b FROM sel
                   UNION ALL SELECT doc2, doc1 FROM sel),
         reach AS (
           SELECT a AS node, b AS m FROM edges
           UNION
           SELECT r.node, e.b FROM reach r JOIN edges e ON r.m = e.a),
         base AS (
           SELECT d.doc_id,
                  least(d.doc_id, coalesce(min(r.m), d.doc_id)) AS cluster_id
           FROM documents d LEFT JOIN reach r ON d.doc_id = r.node
           GROUP BY d.doc_id)
         SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_canonical
         FROM base ORDER BY doc_id""",
    "similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             list_reduce(list_transform(list_zip(p.v, c.v), x -> x[1]*x[2]), (a,b) -> a+b) AS dp,
             list_reduce(list_transform(list_zip(p.v, p.v), x -> x[1]*x[2]), (a,b) -> a+b) AS pp,
             list_reduce(list_transform(list_zip(c.v, c.v), x -> x[1]*x[2]), (a,b) -> a+b) AS cc
           FROM e p, e c
           WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         s AS (SELECT probe_id, cand_id, dp / (sqrt(pp) * sqrt(cc)) AS sim FROM d),
         r AS (SELECT probe_id, cand_id, sim,
                 row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rank
               FROM s)
         SELECT probe_id, CAST(rank AS INTEGER) AS rank, cand_id, sim
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    "embedding_stats" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT label,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm
           FROM e)
         SELECT label, COUNT(*) AS vectors,
           CAST(SUM(CAST(nrm AS DECIMAL(30,6))) AS DOUBLE) / COUNT(nrm) AS avg_norm
         FROM n GROUP BY 1 ORDER BY label""",
    "multimodal_meta" ->
      """SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         md5(text) AS content_fp,
         CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
         CAST(strlen(text) % 480 + 1 AS INTEGER) AS height,
         CAST(3 AS INTEGER) AS channels
         FROM documents ORDER BY doc_id""",
    // real PNG encode (imageTable) + real imageio header decode
    // (MediaCodec); dimensions are a fixed function of doc_id, so the
    // oracle recomputes the generating arithmetic — any drift in either
    // codec path hash-mismatches
    "multimodal_image_meta" ->
      """SELECT doc_id,
         CAST(doc_id % 37 + 1 AS INTEGER) AS width,
         CAST(doc_id % 23 + 1 AS INTEGER) AS height,
         CAST(3 AS INTEGER) AS channels
         FROM documents ORDER BY doc_id""",
    // blob-dir ingest must round-trip the SAME generating arithmetic:
    // file write -> binaryFile listing -> id-from-filename -> decode
    "multimodal_blob_ingest" ->
      """SELECT doc_id,
         CAST(doc_id % 37 + 1 AS INTEGER) AS width,
         CAST(doc_id % 23 + 1 AS INTEGER) AS height,
         CAST(3 AS INTEGER) AS channels
         FROM documents ORDER BY doc_id""",
    // perceptual image dedup: the corpus renders class doc_id % 41
    // patterns with a uniform per-id brightness shift — bytes all
    // differ, dHash groups recover exactly the classes, so keeper and
    // group size are pure id arithmetic
    "dedup_image_phash" ->
      """SELECT MIN(doc_id) AS keeper_id,
                COUNT(*) AS n_dups
         FROM documents GROUP BY doc_id % 41 ORDER BY keeper_id""",
    // perceptual audio dedup: volume-scaled re-encodes of doc_id % 29
    // waveform classes — bytes all differ, the energy-envelope
    // fingerprint recovers exactly the classes
    "dedup_audio_fp" ->
      """SELECT MIN(doc_id) AS keeper_id,
                COUNT(*) AS n_dups
         FROM documents GROUP BY doc_id % 29 ORDER BY keeper_id""",
    // perceptual video dedup: brightness-scaled, frame-rate-resampled
    // re-encodes of doc_id % 23 content classes — bytes all differ,
    // the frame-luma envelope fingerprint recovers exactly the classes
    "dedup_video_fp" ->
      """SELECT MIN(doc_id) AS keeper_id,
                COUNT(*) AS n_dups
         FROM documents GROUP BY doc_id % 23 ORDER BY keeper_id""",
    // real MP4 box synthesis + real ISO-BMFF box-walk parsing
    // (VideoCodec: ftyp leader, moov/mvhd timescale+duration,
    // trak/tkhd 16.16 dimensions); params are fixed functions of
    // doc_id, the oracle recomputes them
    "multimodal_video_meta" ->
      """SELECT doc_id,
         'mp4' AS container,
         CAST((doc_id % 64 + 1) * 16 AS INTEGER) AS width,
         CAST((doc_id % 36 + 1) * 16 AS INTEGER) AS height,
         CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
              ELSE 90000 END AS INTEGER) AS timescale,
         CAST(((doc_id % 120 + 1) * 100 * 1000) //
              (CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
               ELSE 90000 END) AS BIGINT) AS duration_ms
         FROM documents ORDER BY doc_id""",
    // real WAV/MP3 byte synthesis (audioTable) + real header parsing
    // (AudioCodec: RIFF chunk walk, MPEG-1 L3 frame fields); every
    // parameter is a fixed function of doc_id, so the oracle recomputes
    // the generating arithmetic — a wrong header offset, bitrate-table
    // entry, or duration estimate hash-mismatches
    "multimodal_audio_meta" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp3' END AS container,
         CAST(CASE WHEN doc_id % 2 = 0 THEN
                CASE (doc_id // 2) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                     WHEN 2 THEN 22050 ELSE 44100 END
              ELSE
                CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END
              END AS INTEGER) AS sample_rate,
         CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id // 2) % 2 + 1
                   WHEN doc_id % 4 = 3 THEN 1 ELSE 2
              END AS INTEGER) AS channels,
         CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 0 END AS INTEGER)
           AS bit_depth,
         CAST(CASE WHEN doc_id % 2 = 0 THEN
                ((doc_id % 97 + 1) * 10 * 1000) //
                (CASE (doc_id // 2) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                      WHEN 2 THEN 22050 ELSE 44100 END)
              ELSE
                ((4 + (doc_id % 50 + 1) * 13) * 8 * 1000) //
                ((CASE doc_id % 14 + 1
                    WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                    WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                    WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                    WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                    WHEN 13 THEN 256 ELSE 320 END) * 1000)
              END AS BIGINT) AS duration_ms
         FROM documents ORDER BY doc_id""",
    "sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, ts, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
           FROM events),
         s AS (
           SELECT *, SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 14400
                              THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
           FROM t)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""",
    "stream_hourly_demand" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
         COUNT(*) AS event_count,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, hour""",
    "term_relevance" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         d AS (SELECT doc_id, token, tf,
                 COUNT(*) OVER (PARTITION BY token) AS df
               FROM tf),
         s AS (SELECT doc_id, token, tf, df,
                 CAST(tf AS DOUBLE) / df AS score
               FROM d),
         r AS (SELECT *,
                 CAST(row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, token) AS INTEGER) AS rank
               FROM s)
         SELECT doc_id, rank, token, CAST(tf AS BIGINT) AS tf,
                CAST(df AS BIGINT) AS df, score
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    "embedding_centroid" ->
      """WITH ex AS (
           SELECT label,
                  unnest(CAST(embedding AS DOUBLE[])) AS val,
                  unnest(range(len(embedding))) AS pos
           FROM embeddings)
         SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(SUM(CAST(val AS DECIMAL(30,6))) AS DOUBLE) / COUNT(val) AS centroid,
           COUNT(val) AS vectors
         FROM ex GROUP BY 1, 2 ORDER BY label, pos""",
    "skew_join_salted" ->
      """SELECT c_mktsegment, COUNT(*) AS events,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "stream_sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
           FROM events),
         s AS (
           SELECT *, SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 14400
                              THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
           FROM t)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""",
    "stream_view_purchase" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
                v.ts AS view_ts, p.ts AS purchase_ts
         FROM events v JOIN events p
           ON p.user_id = v.user_id
          AND v.event_type = 'view' AND p.event_type = 'purchase'
          AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
         ORDER BY view_id, purchase_id""",
    "dup_spans" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         grams AS (
           SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(ts) - 7, 0)),
               i -> array_to_string(ts[i:i+7], ' '))) AS gram
           FROM toks),
         cnt AS (SELECT gram, COUNT(*) AS c FROM grams GROUP BY 1)
         SELECT g.doc_id,
           COUNT(*) AS total_spans,
           CAST(COUNT(*) FILTER (WHERE c.c > 1) AS BIGINT) AS dup_spans
         FROM grams g JOIN cnt c USING (gram)
         GROUP BY 1 ORDER BY 1""",
    "fuzzy_dedup" ->
      """SELECT a.c_name, COUNT(*) AS n_close
         FROM customer a JOIN customer b
           ON a.c_name <> b.c_name
          AND levenshtein(a.c_name, b.c_name) <= 1
         GROUP BY 1 ORDER BY 1""",
    "stratified_quota" ->
      """WITH keyed AS (
           SELECT lang, doc_id,
             CAST('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS skey
           FROM documents)
         SELECT lang, doc_id FROM keyed
         QUALIFY row_number() OVER (PARTITION BY lang ORDER BY skey DESC) <= 20
         ORDER BY lang, doc_id""",
    "unpivot_metrics" ->
      """WITH agg AS (
           SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, metric, value FROM (
           SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
           UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM agg
           UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM agg)
         ORDER BY l_returnflag, metric""",
    "span_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         seg AS (
           SELECT doc_id,
             unnest(CASE WHEN len(ts) >= 8
               THEN list_transform(generate_series(0, CAST(len(ts)//8 - 1 AS BIGINT)),
                      k -> array_to_string(ts[k*8+1:k*8+8], ' '))
               ELSE [] END) AS segment,
             unnest(CASE WHEN len(ts) >= 8
               THEN generate_series(0, CAST(len(ts)//8 - 1 AS BIGINT))
               ELSE [] END) AS seg_idx
           FROM t),
         mark AS (
           SELECT doc_id, seg_idx, segment,
             row_number() OVER (PARTITION BY segment
                                ORDER BY doc_id, seg_idx) AS rn
           FROM seg),
         kept AS (
           SELECT doc_id, COUNT(*) AS n_segs,
             COUNT(*) FILTER (WHERE rn = 1) AS kept_segs,
             COALESCE(string_agg(segment, ' ' ORDER BY seg_idx)
                      FILTER (WHERE rn = 1), '') AS kept_text
           FROM mark GROUP BY 1),
         rem AS (
           SELECT doc_id,
             array_to_string(ts[(len(ts)//8)*8+1:len(ts)], ' ') AS remainder
           FROM t)
         SELECT r.doc_id,
           COALESCE(k.n_segs, 0) AS n_segs,
           COALESCE(k.kept_segs, 0) AS kept_segs,
           concat_ws(' ', nullif(COALESCE(k.kept_text, ''), ''),
                          nullif(r.remainder, '')) AS clean_text
         FROM rem r LEFT JOIN kept k ON r.doc_id = k.doc_id
         ORDER BY r.doc_id""",
    "funnel_conversion" ->
      """WITH w1 AS (
           SELECT user_id, event_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS fv
           FROM events),
         w2 AS (
           SELECT *,
             min(CASE WHEN event_type = 'click' AND fv IS NOT NULL THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS fc
           FROM w1),
         u AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'click' AND fv IS NOT NULL THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL THEN ts END) AS first_purchase
           FROM w2 GROUP BY 1)
         SELECT c_mktsegment, COUNT(*) AS users,
           COUNT(first_view) AS viewed,
           COUNT(first_click) AS clicked_after_view,
           COUNT(first_purchase) AS purchased_after_click
         FROM u JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "cohort_retention" ->
      """WITH base AS (
           SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS am
           FROM orders),
         coh AS (
           SELECT o_custkey, am,
             min(am) OVER (PARTITION BY o_custkey) AS cohort_month
           FROM base),
         agg AS (
           SELECT cohort_month,
             CAST((year(am) - year(cohort_month)) * 12
                  + (month(am) - month(cohort_month)) AS INTEGER) AS months_since,
             COUNT(*) AS active_customers
           FROM coh GROUP BY 1, 2),
         sz AS (
           SELECT *,
             max(CASE WHEN months_since = 0 THEN active_customers END)
               OVER (PARTITION BY cohort_month) AS cohort_size
           FROM agg)
         SELECT cohort_month, months_since, active_customers, cohort_size,
           CAST(active_customers AS DOUBLE) / cohort_size AS retention
         FROM sz ORDER BY cohort_month, months_since""",
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         ex AS (SELECT unnest(v) AS val, unnest(range(len(v))) AS pos FROM e),
         calib AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM ex GROUP BY 1),
         cal AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM calib),
         q AS (
           SELECT vec_id, label, v,
             list_transform(generate_series(1, len(v)),
               i -> CASE WHEN maxs[i] = mins[i] THEN CAST(0 AS BIGINT)
                         ELSE CAST(least(greatest(
                                floor((v[i] - mins[i]) * 255.0 / (maxs[i] - mins[i])),
                                0.0), 255.0) AS BIGINT) END) AS codes
           FROM e, cal)
         SELECT vec_id, label, CAST(len(v) AS INTEGER) AS n_dims,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                (a, b) -> a + b) AS BIGINT) AS code_sum,
           CAST(list_min(codes) AS BIGINT) AS code_min,
           CAST(list_max(codes) AS BIGINT) AS code_max
         FROM q ORDER BY vec_id""",
    "gap_fill" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS events,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS day_value,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value
           FROM events GROUP BY 1, 2),
         bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
         grid AS (
           SELECT t.event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
           FROM (SELECT DISTINCT event_type FROM daily) t, bounds),
         j AS (
           SELECT g.event_type, g.day,
             COALESCE(d.events, 0) AS events,
             COALESCE(d.day_value, 0.0) AS day_value,
             d.events IS NULL AS filled,
             d.avg_value AS avg_value
           FROM grid g LEFT JOIN daily d
             ON g.event_type = d.event_type AND g.day = d.day)
         SELECT event_type, day, events, day_value, filled,
           last_value(avg_value IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS carry_avg
         FROM j ORDER BY event_type, day""",
    "supplier_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount))
                       - ((p_retailprice * l_quantity) / 100.0)
                  AS DECIMAL(30,6))) AS DOUBLE) AS profit,
         COUNT(*) AS lines
         FROM lineitem
         JOIN part     ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN orders   ON l_orderkey = o_orderkey
         WHERE contains(p_name, 'red')
         GROUP BY 1, 2 ORDER BY nation, o_year""",
    "stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
         FROM events ORDER BY event_id""",
    "order_event_reconcile" ->
      """WITH o AS (SELECT o_custkey AS key, COUNT(*) AS orders_cnt
                    FROM orders GROUP BY 1),
         e AS (SELECT user_id AS key, COUNT(*) AS events_cnt
               FROM events GROUP BY 1)
         SELECT COALESCE(o.key, e.key) AS key,
           COALESCE(orders_cnt, 0) AS orders_cnt,
           COALESCE(events_cnt, 0) AS events_cnt,
           CASE WHEN o.key IS NOT NULL AND e.key IS NOT NULL THEN 'both'
                WHEN o.key IS NOT NULL THEN 'orders_only'
                ELSE 'events_only' END AS presence
         FROM o FULL OUTER JOIN e ON o.key = e.key
         ORDER BY key""",
    "vocab_oov" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
           FROM documents),
         cnt AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY 1),
         vocab AS (SELECT token FROM cnt ORDER BY freq DESC, token LIMIT 20),
         j AS (
           SELECT t.doc_id, v.token IS NOT NULL AS known
           FROM toks t LEFT JOIN vocab v ON t.token = v.token)
         SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE NOT known) AS BIGINT) AS oov_tokens,
           CAST(COUNT(*) FILTER (WHERE NOT known) AS DOUBLE) / COUNT(*) AS oov_frac
         FROM j GROUP BY 1 ORDER BY doc_id""",
    "anomaly_days" ->
      """WITH d AS (
           SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS events
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(events) AS HUGEINT) AS sm,
             SUM(CAST(events AS HUGEINT) * CAST(events AS HUGEINT)) AS ssq
           FROM d GROUP BY 1)
         SELECT d.event_type, d.day, d.events,
           (n * d.events - sm) * (n * d.events - sm)
             > 4 * (n * ssq - sm * sm) AS is_anomaly
         FROM d JOIN m USING (event_type)
         ORDER BY event_type, day""",
    "column_profile" ->
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .map(c => s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT($c) AS n_nulls,
           COUNT(DISTINCT $c) AS n_distinct FROM lineitem""")
        .mkString("", " UNION ALL ", " ORDER BY col_name"),
    "rolling_users" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
         cells AS (
           SELECT user_id, day + (i * INTERVAL 1 DAY) AS day
           FROM ud, range(0, 7) t(i))
         SELECT day, COUNT(DISTINCT user_id) AS users_7d
         FROM cells
         WHERE day <= (SELECT max(day) FROM ud)
         GROUP BY 1 ORDER BY 1""",
    "order_value_quantiles" ->
      """WITH r AS (
           SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT o_orderpriority, MAX(n) AS n_rows,
           MAX(CASE WHEN rn = CEIL(0.5  * n) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CEIL(0.9  * n) THEN o_totalprice END) AS p90,
           MAX(CASE WHEN rn = CEIL(0.99 * n) THEN o_totalprice END) AS p99
         FROM r GROUP BY 1 ORDER BY o_orderpriority""",
    // the size bound mirrors the engine's maxBasket skew guard (baskets
    // over 10000 distinct items are dropped whole) so the contract holds
    // on ANY data, not just fixtures whose orders happen to be small
    "copurchase_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              ok AS (SELECT l_orderkey FROM b
                     GROUP BY 1 HAVING COUNT(*) <= 10000)
         SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
           COUNT(*) AS n_orders
         FROM b x JOIN b y
           ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
         JOIN ok ON ok.l_orderkey = x.l_orderkey
         GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ORDER BY item_a, item_b""",
    // PageRank, 3 unrolled synchronous rounds of the SAME integer
    // fixed-point arithmetic as graft.ops.Graph.pageRank (scale 10^12,
    // damping 85/100, base = scale - 85*scale/100 = 150000000000; all
    // operands non-negative, so DuckDB's `//` and Spark's `DIV` agree).
    // The node frame is `deg` (nodes with out-edges), held stable with a
    // LEFT JOIN + COALESCE(0) per round — mass conservation on
    // asymmetric graphs; identical on this symmetrized one.
    "pagerank_copurchase" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              ok AS (SELECT l_orderkey FROM b
                     GROUP BY 1 HAVING COUNT(*) <= 10000),
              pairs AS (
                SELECT x.l_partkey AS item_a, y.l_partkey AS item_b
                FROM b x JOIN b y
                  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
                JOIN ok ON ok.l_orderkey = x.l_orderkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2),
              e AS (SELECT item_a AS src, item_b AS dst FROM pairs
                    UNION ALL
                    SELECT item_b AS src, item_a AS dst FROM pairs),
              deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
              r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS score FROM deg),
              r1 AS (SELECT d.node,
                       CAST(150000000000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS score
                     FROM deg d LEFT JOIN (
                       SELECT e.dst AS node, SUM(r.score // g.deg) AS m
                       FROM e JOIN r0 r ON r.node = e.src
                              JOIN deg g ON g.node = e.src
                       GROUP BY 1) s ON s.node = d.node),
              r2 AS (SELECT d.node,
                       CAST(150000000000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS score
                     FROM deg d LEFT JOIN (
                       SELECT e.dst AS node, SUM(r.score // g.deg) AS m
                       FROM e JOIN r1 r ON r.node = e.src
                              JOIN deg g ON g.node = e.src
                       GROUP BY 1) s ON s.node = d.node),
              r3 AS (SELECT d.node,
                       CAST(150000000000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS score
                     FROM deg d LEFT JOIN (
                       SELECT e.dst AS node, SUM(r.score // g.deg) AS m
                       FROM e JOIN r2 r ON r.node = e.src
                              JOIN deg g ON g.node = e.src
                       GROUP BY 1) s ON s.node = d.node)
         SELECT node AS item, score FROM r3 ORDER BY score DESC, item""",
    // Random-sign JL projection: the +-1/0 "matrix" is regenerated from
    // the same BIGINT LCG on (input-dim, output-dim), and each output
    // coordinate is the same left-to-right IEEE-double fold as the Spark
    // side's `aggregate` (0.0-seeded, so list_reduce gets 0.0 prepended).
    "embedding_project" ->
      """SELECT vec_id, j AS dim,
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(0, len(embedding) - 1),
                 i -> CAST(embedding[i+1] AS DOUBLE) *
                      CAST(((1103515245 * (i * 16 + j) + 12345) % 2147483648) % 3 - 1 AS DOUBLE))),
             (a, x) -> a + x) AS val
         FROM embeddings, generate_series(0, 15) AS t(j)
         WHERE len(embedding) > 0
         ORDER BY vec_id, dim""",
    // BM25 (k1=1.2, b=0.75) over whitespace tokens, same fixed term
    // order and operation order as the Spark side — tf/df/dl/N exact
    // integers, avgdl one double division, idf = ln of an identical
    // double, so scores are bit-identical.
    "bm25_rank" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
         d AS (SELECT doc_id, len(ts) AS dl,
                 len(list_filter(ts, x -> x = 'spark'))  AS tf0,
                 len(list_filter(ts, x -> x = 'join'))   AS tf1,
                 len(list_filter(ts, x -> x = 'vector')) AS tf2
               FROM t),
         s AS (SELECT COUNT(*) AS n,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                 SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                 SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
               FROM d),
         scored AS (SELECT doc_id,
             ln(1.0 + (CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
               * (CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
           + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
               * (CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
           + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
               * (CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
             AS score
           FROM d, s)
         SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
           score
         FROM scored ORDER BY score DESC, doc_id LIMIT 20""",
    // Laplace-smoothed unigram NLL: integer counts -> identical rational
    // -> identical ln (MathLn/libm) -> exact DECIMAL(30,6) sum (order-
    // free) -> double division. Same Det discipline as every other
    // aggregated double.
    "unigram_nll" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
           FROM documents),
         s AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT token) AS v_size
               FROM toks),
         w AS (SELECT doc_id,
                 -ln((CAST(COUNT(*) OVER (PARTITION BY token) AS DOUBLE) + 1.0)
                     / (CAST(n_total AS DOUBLE) + CAST(v_size AS DOUBLE))) AS nll
               FROM toks, s)
         SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CAST(nll AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_nll
         FROM w GROUP BY doc_id ORDER BY doc_id""",
    // Bigram-LM conditional NLL: every count derives from the one
    // bigram pair table (c_ab, c_a via windows; V_b = distinct second
    // tokens); per-term Det snap before the m-weighted decimal sum.
    // Docs with <2 tokens have no transitions -> absent on both engines.
    "bigram_nll" ->
      """WITH t AS (
           SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         bi AS (
           SELECT doc_id, t[k] AS a, t[k + 1] AS b
           FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS k FROM t)),
         p AS (
           SELECT doc_id, a, b, COUNT(*) AS m FROM bi GROUP BY doc_id, a, b),
         w AS (
           SELECT doc_id, a, b, m,
             SUM(m) OVER (PARTITION BY a, b) AS c_ab,
             SUM(m) OVER (PARTITION BY a) AS c_a
           FROM p),
         s AS (SELECT COUNT(DISTINCT b) AS v_b FROM p)
         SELECT doc_id,
           CAST(SUM(m) AS BIGINT) AS n_bigrams,
           CAST(SUM(m * CAST(
             -ln((CAST(c_ab AS DOUBLE) + 1.0)
                 / (CAST(c_a AS DOUBLE) + CAST(v_b AS DOUBLE)))
             AS DECIMAL(30,6))) AS DOUBLE) / SUM(m) AS avg_nll
         FROM w, s GROUP BY doc_id ORDER BY doc_id""",
    // Per-doc Shannon entropy: each -(m/n)ln(m/n) term snaps to the Det
    // DECIMAL(30,6) grid before the order-free decimal sum (ln is not
    // cross-engine bit-stable; the 1-ulp lesson from bigram_pmi).
    "token_entropy" ->
      """WITH pairs AS (
           SELECT doc_id, token, COUNT(*) AS m
           FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
                 FROM documents)
           GROUP BY doc_id, token),
         w AS (
           SELECT doc_id, m, SUM(m) OVER (PARTITION BY doc_id) AS n
           FROM pairs)
         SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_tokens,
           COUNT(*) AS distinct_tokens,
           CAST(SUM(CAST(-((CAST(m AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(m AS DOUBLE) / CAST(n AS DOUBLE)))
               AS DECIMAL(30,6))) AS DOUBLE) AS entropy,
           CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
             AS type_token_ratio
         FROM w GROUP BY doc_id ORDER BY doc_id""",
    // Overlapping-window chunking: pure integer arithmetic + string
    // slicing — oracle-exact with no float anywhere. range(0, n) is
    // DuckDB's [0, n) integer list; list_slice caps at the list end
    // exactly like Spark's slice.
    "doc_chunk" ->
      """WITH t AS (
           SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
           FROM t),
         e AS (
           SELECT doc_id, toks, n,
             unnest(range(0, n_chunks)) AS k
           FROM c)
         SELECT doc_id,
           CAST(k AS INTEGER) AS chunk_idx,
           CAST(k * 24 + 1 AS INTEGER) AS tok_start,
           CAST(least(32, n - k * 24) AS INTEGER) AS n_toks,
           array_to_string(list_slice(toks, k * 24 + 1, k * 24 + 32), ' ')
             AS chunk_text
         FROM e ORDER BY doc_id, chunk_idx""",
    // Temperature resampling: base epochs + fractional extra decided by
    // the same salted-md5 uniform as domain_mix (md5 of identical bytes
    // on both engines; fixed-width hex compares lexicographically).
    // Weights: en 0.5, zh 2.5, default 1.0 -> thresholds 80000000 on
    // the fractional halves, 00000000 (never) elsewhere.
    "domain_resample" ->
      """WITH d AS (
           SELECT doc_id, lang,
             substr(md5('resample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS skey
           FROM documents),
         r AS (
           SELECT doc_id, lang,
             (CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 2 ELSE 1 END)
             + (CASE WHEN skey < (CASE lang WHEN 'en' THEN '80000000'
                                            WHEN 'zh' THEN '80000000'
                                            ELSE '00000000' END)
                     THEN 1 ELSE 0 END) AS reps
           FROM d)
         SELECT doc_id, lang, CAST(unnest(range(reps)) AS INTEGER) AS rep_idx
         FROM r WHERE reps > 0 ORDER BY doc_id, rep_idx""",
    // PMI collocations: integer counts -> identical rationals -> the
    // same division order. ln can differ from glibc by 1 ulp even via
    // MathLn (measured at arg 1.2816829596764632), so BOTH engines snap
    // the score to the Det DECIMAL(30,6) grid before ordering/output.
    // Ties at the top-k boundary break by (a, b).
    "bigram_pmi" ->
      """WITH t AS (
           SELECT string_split(trim(text), ' ') AS t FROM documents),
         uni AS (
           SELECT token, COUNT(*) AS c
           FROM (SELECT unnest(t) AS token FROM t) GROUP BY token),
         bi AS (
           SELECT a, b, COUNT(*) AS c_ab
           FROM (SELECT t[k] AS a, t[k + 1] AS b
                 FROM (SELECT t, unnest(range(1, len(t))) AS k FROM t))
           GROUP BY a, b),
         tot AS (
           SELECT (SELECT SUM(c_ab) FROM bi) AS n_bi,
                  (SELECT SUM(c) FROM uni) AS n_uni)
         SELECT bi.a, bi.b, bi.c_ab,
           CAST(CAST(
             ln((CAST(bi.c_ab AS DOUBLE) / CAST(n_bi AS DOUBLE))
                / ((CAST(ca.c AS DOUBLE) / CAST(n_uni AS DOUBLE))
                   * (CAST(cb.c AS DOUBLE) / CAST(n_uni AS DOUBLE))))
             AS DECIMAL(30,6)) AS DOUBLE) AS pmi
         FROM bi
         JOIN uni ca ON bi.a = ca.token
         JOIN uni cb ON bi.b = cb.token
         CROSS JOIN tot
         WHERE bi.c_ab >= 5
         ORDER BY pmi DESC, bi.a, bi.b LIMIT 100""",
    // Exact in-cell k-NN: same list_zip/list_reduce cosine idiom as the
    // similarity_topk oracle (proven bit-identical to CosineSim).
    "embedding_knn" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (
           SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (x,y) -> x+y) AS dp,
             list_reduce(list_transform(list_zip(a.v, a.v), x -> x[1]*x[2]), (x,y) -> x+y) AS aa,
             list_reduce(list_transform(list_zip(b.v, b.v), x -> x[1]*x[2]), (x,y) -> x+y) AS bb
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
         s AS (SELECT vec_id, neighbor_id, dp / (sqrt(aa) * sqrt(bb)) AS sim FROM d),
         r AS (SELECT vec_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM s)
         SELECT vec_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
         FROM r WHERE rank <= 3 ORDER BY vec_id, rank""",
    // CDC between two gold refreshes: recompute both snapshots from the
    // source feed and EXCEPT ALL them both ways — the Spark side routes
    // the same two aggregates through ManifestTable commit + time-travel
    // read + diff, so the ACID layer itself is under the hash check.
    "change_feed_gold" ->
      """WITH g1 AS (
           SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS monthly_revenue,
             COUNT(*) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value
           FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1),
         g2 AS (
           SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS monthly_revenue,
             COUNT(*) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value
           FROM orders GROUP BY 1)
         SELECT *, 'insert' AS "_change" FROM (SELECT * FROM g2 EXCEPT ALL SELECT * FROM g1)
         UNION ALL
         SELECT *, 'delete' AS "_change" FROM (SELECT * FROM g1 EXCEPT ALL SELECT * FROM g2)
         ORDER BY "_change", month""",
    // Relational recompute of the image-aware gold maintenance
    // (TableFeedSource.feedGoldImagesQuery): final daily state over the
    // even-keyed load with %41 prices doubled; the cosmetic
    // %7-priority merge contributes nothing (and its zero-commit
    // cancellation is REQUIRED in-query).
    "feed_gold_images" ->
      """SELECT o_custkey, date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(price AS DECIMAL(30,6))) AS DOUBLE) AS daily_revenue,
         COUNT(*) AS order_count,
         CAST(SUM(CAST(price AS DECIMAL(30,6))) AS DOUBLE) / COUNT(price) AS avg_order_value
         FROM (SELECT o_custkey, o_orderdate,
                 CASE WHEN o_orderkey % 41 = 0 THEN o_totalprice * 2.0
                      ELSE o_totalprice END AS price
               FROM orders WHERE o_orderkey % 2 = 0)
         GROUP BY 1, 2 ORDER BY o_custkey, day""",
    // Relational recompute of the table-as-stream change feed
    // (TableFeedSource.streamTableFeed): the three loads key their
    // commit version by o_orderkey mod 3; the merge at version 4
    // surfaces as a delete+insert pair per updated key.
    "stream_table_feed" ->
      """WITH ins AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'insert' AS _change,
                  CAST(1 + o_orderkey % 3 AS BIGINT) AS _commit_version
           FROM orders),
         upd AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 1000.0 AS o_totalprice,
                  o_orderdate, o_orderpriority,
                  'insert' AS _change, CAST(4 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0),
         del AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'delete' AS _change, CAST(4 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0)
         SELECT * FROM (
           SELECT * FROM ins
           UNION ALL SELECT * FROM upd
           UNION ALL SELECT * FROM del)
         ORDER BY o_orderkey, _commit_version, _change""",
    // Relational recompute of the CONDITIONAL merge
    // (Medallion.mergeConditionalOrders): delete-before-update clause
    // precedence, withheld matches keeping base rows, and guarded
    // inserts, all recomputed from orders.
    "merge_conditional" ->
      """WITH upd AS (SELECT * FROM orders WHERE o_orderkey % 59 = 0),
         del AS (
           SELECT o_orderkey FROM upd
           WHERE o_orderstatus = 'P' AND o_totalprice < 50000.0),
         chg AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice * 0.9 AS o_totalprice, o_orderdate,
                  '0-DISCOUNTED' AS o_orderpriority
           FROM upd
           WHERE NOT (o_orderstatus = 'P' AND o_totalprice < 50000.0)
             AND o_totalprice > 200000.0),
         keep AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
             AND o_orderkey NOT IN (SELECT o_orderkey FROM chg)),
         ins AS (
           SELECT o_orderkey + 200000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '7-CONDINS' AS o_orderpriority
           FROM orders
           WHERE o_orderkey % 61 = 0 AND o_totalprice < 150000.0)
         SELECT * FROM (
           SELECT * FROM keep
           UNION ALL SELECT * FROM chg
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    // Relational recompute of the keyed copy-on-write MERGE
    // (Medallion.mergeUpsertOrders): base minus updated/deleted keys,
    // union updates and inserts. A hash match proves update-wins,
    // insert-on-no-match, and delete-drops-key through the full
    // write → merge → manifest-read round trip.
    "merge_upsert" ->
      """WITH upd AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 1000.0 AS o_totalprice,
                  o_orderdate, '0-MERGED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 97 = 0),
         ins AS (
           SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '6-INSERTED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 101 = 0),
         base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           WHERE o_orderkey % 97 <> 0
             AND NOT (o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0))
         SELECT * FROM (
           SELECT * FROM base
           UNION ALL SELECT * FROM upd
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    // Relational recompute of the PARTITIONED copy-on-write merge
    // (Medallion.mergePartitionedOrders): same three-verdict algebra as
    // merge_upsert against a partitionBy(o_orderstatus) table — a hash
    // match proves partition-pruned candidate selection dropped no
    // matches, partition-preserving rewrites lost no rows, and the
    // brand-new 'N' partition materialized.
    "merge_partitioned" ->
      """WITH upd AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 500.0 AS o_totalprice,
                  o_orderdate, '0-PMERGED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 89 = 0),
         ins AS (
           SELECT o_orderkey + 300000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '8-PINSERTED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 113 = 0),
         base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           WHERE o_orderkey % 89 <> 0
             AND NOT (o_orderkey % 107 = 0 AND o_orderkey % 89 <> 0))
         SELECT * FROM (
           SELECT * FROM base
           UNION ALL SELECT * FROM upd
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    // Relational recompute of the keyless predicate UPDATE
    // (Medallion.updateWhereOrders): the CASE algebra — the hash match
    // proves touched-file detection missed no matching row and the
    // rewrite corrupted no carried one.
    "update_where" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderstatus = 'P' AND o_totalprice < 100000.0
                     THEN o_totalprice + 500.0 ELSE o_totalprice
                END AS o_totalprice,
                o_orderdate,
                CASE WHEN o_orderstatus = 'P' AND o_totalprice < 100000.0
                     THEN '1-URGENT-UPD' ELSE o_orderpriority
                END AS o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    // Relational recompute of the keyless predicate DELETE
    // (Medallion.deleteWhereOrders).
    "delete_where" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders
         WHERE NOT (o_orderkey % 7 = 0 AND o_orderstatus = 'F')
         ORDER BY o_orderkey""",
    // Relational recompute of the merge-on-read predicate UPDATE
    // (Medallion.updateWhereDvOrders): DV fold + appended images must
    // reconstruct the CASE algebra exactly.
    "update_where_dv" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 17 = 0 AND o_orderstatus = 'F'
                     THEN o_totalprice + 250.0 ELSE o_totalprice
                END AS o_totalprice,
                o_orderdate,
                CASE WHEN o_orderkey % 17 = 0 AND o_orderstatus = 'F'
                     THEN '2-MOR-UPD' ELSE o_orderpriority
                END AS o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    // Relational recompute of the merge-on-read predicate delete
    // (Medallion.deleteWhereDvOrders): the sidecar anti-join must
    // reconstruct exactly the surviving multiset.
    "delete_where_dv" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders
         WHERE NOT (o_orderkey % 13 = 0 AND o_orderstatus = 'O')
         ORDER BY o_orderkey""",
    // Relational recompute of the SQL-TEXT MERGE INTO
    // (Medallion.sqlMergeUpsert, through the injected parser): same
    // three-verdict algebra as merge_upsert with the SQL markers.
    "sql_merge_upsert" ->
      """WITH upd AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 1000.0 AS o_totalprice,
                  o_orderdate, '0-SQLMERGED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 97 = 0),
         ins AS (
           SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '9-SQLINS' AS o_orderpriority
           FROM orders WHERE o_orderkey % 101 = 0),
         base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           WHERE o_orderkey % 97 <> 0
             AND NOT (o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0))
         SELECT * FROM (
           SELECT * FROM base
           UNION ALL SELECT * FROM upd
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    // Relational recompute of the selective overwrite
    // (Medallion.replaceWhereOrders — Delta's replaceWhere): the final
    // table must equal old∖cond ∪ new exactly; the byte-identical
    // carry of non-matching files is spec-asserted (ReplaceWhereSpec).
    "replace_where" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders WHERE o_orderstatus <> 'P'
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice * 2.0 AS o_totalprice, o_orderdate,
                  '3-REPLACED' AS o_orderpriority
           FROM orders WHERE o_orderstatus = 'P' AND o_orderkey % 2 = 0)
         ORDER BY o_orderkey""",
    // Relational recompute of the CDF read-options range
    // (Medallion.cdfReadOptions): startingVersion = 2 skips v1's
    // bootstrap inserts; v2's append arrives as inserts, v3's
    // predicate delete as plain delete rows — carried rows from the
    // delete's file rewrites must cancel out of the multiset diff.
    "cdf_read_options" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'insert' AS _change,
                  CAST(2 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 3 <> 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'delete' AS _change,
                  CAST(3 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0)
         ORDER BY o_orderkey, _commit_version, _change""",
    // Relational recompute of the metadata-only ADD COLUMNS evolution
    // (Medallion.addColumnsOrders): even keys predate the ALTER and
    // read both new columns as NULL; odd keys arrive populated.
    "add_columns" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  CAST(NULL AS VARCHAR) AS o_channel,
                  CAST(NULL AS DOUBLE) AS o_score
           FROM orders WHERE o_orderkey % 2 = 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'ch-' || CAST(o_orderkey % 5 AS VARCHAR) AS o_channel,
                  CAST(o_orderkey % 100 AS DOUBLE) / 10.0 AS o_score
           FROM orders WHERE o_orderkey % 2 = 1)
         ORDER BY o_orderkey""",
    // Relational recompute of SQL VERSION AS OF on a catalog name
    // (Medallion.catalogTimeTravel): version 1 is the CTAS half; the
    // later INSERT must never leak backward through name resolution.
    "catalog_time_travel" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 2 = 0
         ORDER BY o_orderkey""",
    // Relational recompute of the COPY INTO lifecycle
    // (Medallion.copyIntoOrders): base third + two first-run files +
    // the late-landing third file; the replayed run contributed
    // NOTHING (the require in-query enforces zero files, the hash
    // proves zero rows).
    "copy_into" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           UNION ALL
           SELECT o_orderkey + 700000000 AS o_orderkey, o_custkey,
                  o_orderstatus, o_totalprice, o_orderdate,
                  '6-COPIED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 97 = 0)
         ORDER BY o_orderkey""",
    // Relational recompute of the CONVERT lifecycle
    // (Medallion.convertTableOrders): the adopted dump is the whole
    // orders table; the post-convert merge re-prioritizes the %89
    // keys — adoption must lose nothing, the merge must land.
    "convert_table" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate,
                CASE WHEN o_orderkey % 89 = 0 THEN '2-CONVERTED'
                     ELSE o_orderpriority END AS o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    // Relational recompute of the merge-evolution lifecycle
    // (Medallion.mergeEvolutionOrders): the base committed without
    // o_orderpriority; the evolving merge upserts every %3 key with
    // the column populated, all other rows read it as NULL.
    "merge_evolution" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, CAST(NULL AS VARCHAR) AS o_orderpriority
           FROM orders WHERE o_orderkey % 3 <> 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0)
         ORDER BY o_orderkey""",
    // Relational recompute of the assignment-list evolution lifecycle
    // (Medallion.mergeEvolutionAssignOrders): a conditional UPDATE SET
    // assigns the NEW o_audit column (and bumps the price) on %6 keys
    // only; every other row — unmatched, and matched-but-unclaimed %3
    // carries — reads o_audit as NULL with its original price.
    "merge_evolution_assign" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 1.1
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority,
                CASE WHEN o_orderkey % 6 = 0 THEN 'm6:' || o_orderstatus
                     END AS o_audit
         FROM orders ORDER BY o_orderkey""",
    // Relational recompute of the auto-optimize lifecycle
    // (Medallion.autoOptimizeOrders): the even half written, the odd
    // half appended in 8 slivers — optimizeWrite/autoCompact are
    // layout-only, so the content is exactly the orders table (the
    // file-count collapse and COMPACT commit are require-asserted
    // in-query).
    "auto_optimize" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    // Relational recompute of the SCD2 history (Medallion.scd2Orders):
    // every key opens at 0; %5 keys close at 1 and reopen at x2; at
    // ts=2 only the %10 half changes again (close at 2, reopen at x3)
    // — the %5-not-%10 half arrived UNCHANGED and contributes nothing.
    "scd2_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
                _valid_from, _valid_to FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
                  CAST(0 AS BIGINT) AS _valid_from,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 1 END AS BIGINT)
                    AS _valid_to
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice * 2,
                  CAST(1 AS BIGINT),
                  CAST(CASE WHEN o_orderkey % 10 = 0 THEN 2 END AS BIGINT)
           FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice * 3,
                  CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
           FROM orders WHERE o_orderkey % 10 = 0)
         ORDER BY o_orderkey, _valid_from""",
    // Relational recompute of the APPLY CHANGES SCD1 lifecycle
    // (Medallion.applyChangesScd1Orders): per key-class the SURVIVING
    // state after sequence-ordered CDC — %5==0 and %5==4 deleted
    // (delete outranks the same-batch update at seq 2), %5==1 the
    // fresh seq-10 image (+1000; the stale seq -5 and the LATE
    // batch-2 seq-1 event both ignored), %5==2 the seq-7 image
    // (+7000, over the in-batch seq-3), %5==3 the batch-2 seq-1
    // image (+77, over the initial seq 0)
    "apply_changes_scd1" ->
      """SELECT o_orderkey, o_custkey,
                CASE o_orderkey % 5
                  WHEN 1 THEN o_totalprice + 1000.0
                  WHEN 2 THEN o_totalprice + 7000.0
                  ELSE o_totalprice + 77.0 END AS o_totalprice,
                CAST(CASE o_orderkey % 5
                  WHEN 1 THEN 10 WHEN 2 THEN 7 ELSE 1 END AS BIGINT)
                  AS _seq
         FROM orders WHERE o_orderkey % 5 IN (1, 2, 3)
         ORDER BY o_orderkey""",
    // APPLY CHANGES FROM SNAPSHOT (Medallion.applyChangesSnapshotOrders):
    // the surviving state after one snapshot diff-apply — %7==0 keys
    // deleted (left the snapshot), %7==1 updated (+100, seq 1), new
    // +500M keys inserted (seq 1), everything else untouched (seq 0);
    // the replayed identical snapshot must change nothing
    "apply_changes_snapshot" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey,
                  CASE WHEN o_orderkey % 7 = 1
                       THEN o_totalprice + 100.0
                       ELSE o_totalprice END AS o_totalprice,
                  CAST(CASE WHEN o_orderkey % 7 = 1 THEN 1 ELSE 0 END
                    AS BIGINT) AS _seq
           FROM orders WHERE o_orderkey % 7 <> 0
           UNION ALL
           SELECT o_orderkey + 500000000, o_custkey, o_totalprice,
                  CAST(1 AS BIGINT)
           FROM orders WHERE o_orderkey % 97 = 0)
         ORDER BY o_orderkey""",
    // Streaming APPLY CHANGES (Medallion.streamApplyChanges): the SAME
    // event history as apply_changes_scd1 delivered as a CDC stream
    // (one feed version per micro-batch) and drained TWICE from fresh
    // checkpoints — the per-batch idempotency tags must no-op the
    // replay, so the oracle is the identical arithmetic recompute
    "stream_apply_changes" ->
      """SELECT o_orderkey, o_custkey,
                CASE o_orderkey % 5
                  WHEN 1 THEN o_totalprice + 1000.0
                  WHEN 2 THEN o_totalprice + 7000.0
                  ELSE o_totalprice + 77.0 END AS o_totalprice,
                CAST(CASE o_orderkey % 5
                  WHEN 1 THEN 10 WHEN 2 THEN 7 ELSE 1 END AS BIGINT)
                  AS _seq
         FROM orders WHERE o_orderkey % 5 IN (1, 2, 3)
         ORDER BY o_orderkey""",
    // Streaming APPLY CHANGES SCD TYPE 2
    // (Medallion.streamApplyChangesScd2): the full validity-ranged
    // history after the same CDC feed drained twice — closed initial
    // rows (change-closes keep seq 0, delete-closes record the
    // delete's sequence), replacement open rows, and the late batch-2
    // event pruned by the %5==1 high-water but applied for %5==3
    "stream_apply_changes_scd2" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
                  CAST(0 AS BIGINT) AS _valid_from,
                  CAST(1 AS BIGINT) AS _valid_to,
                  CAST(0 AS BIGINT) AS _seq
           FROM orders WHERE o_orderkey % 5 IN (1, 2)
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice,
                  CAST(0 AS BIGINT), CAST(1 AS BIGINT),
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 10 ELSE 9 END
                    AS BIGINT)
           FROM orders WHERE o_orderkey % 5 IN (0, 4)
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice,
                  CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)
           FROM orders WHERE o_orderkey % 5 = 3
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice + 1000.0,
                  CAST(1 AS BIGINT), CAST(NULL AS BIGINT),
                  CAST(10 AS BIGINT)
           FROM orders WHERE o_orderkey % 5 = 1
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice + 7000.0,
                  CAST(1 AS BIGINT), CAST(NULL AS BIGINT),
                  CAST(7 AS BIGINT)
           FROM orders WHERE o_orderkey % 5 = 2
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice + 77.0,
                  CAST(2 AS BIGINT), CAST(NULL AS BIGINT),
                  CAST(1 AS BIGINT)
           FROM orders WHERE o_orderkey % 5 = 3)
         ORDER BY o_orderkey, _valid_from""",
    // Relational recompute of the shredded-variant range read: the
    // file-pruning layout is invisible to content, so the oracle is
    // the plain events recompute over the k range — DOUBLED, because
    // the lifecycle plain-appends a shifted raw copy (the auto-shred
    // soundness leg: an unshredded or mis-shredded append would break
    // the doubling); the unshredded $.missing path must contribute
    // zero non-nulls
    "variant_shredded" ->
      """SELECT CAST(k % 4 AS BIGINT) AS kb,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                  AS value_sum,
                MIN(k) AS k_min, MAX(k) AS k_max,
                CAST(0 AS BIGINT) AS missing_nonnull
         FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS k, value
               FROM (SELECT props, value FROM events
                     UNION ALL SELECT props, value FROM events))
         WHERE k BETWEEN 10 AND 29
         GROUP BY 1 ORDER BY kb""",
    // DLT-style expectations (Expectations.expectationsGate): per-rule
    // violation/pass counts over orders plus the DROP-gated slice's
    // count and key checksum — the oracle recomputes every rule
    // relationally (NULL condition = violation, DLT's reading)
    "expectations_gate" ->
      """SELECT * FROM (
           SELECT 'reasonable_price' AS rule, 'warn' AS action,
                  CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice <= 400000.0,
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS violated,
                  CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 400000.0,
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS passed
           FROM orders
           UNION ALL
           SELECT 'not_pending', 'drop',
                  CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus <> 'P',
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(SUM(CASE WHEN COALESCE(o_orderstatus <> 'P',
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'key_present', 'fail',
                  CAST(SUM(CASE WHEN o_orderkey IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(SUM(CASE WHEN o_orderkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT '_gated_', 'kept', CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(o_orderkey) AS BIGINT)
           FROM orders WHERE o_orderstatus <> 'P')
         ORDER BY rule""",
    // Declarative pipeline DAG (Dag.pipelineDagQuery): bronze→silver
    // (expectations: 'P' rows DROP)→gold daily-revenue state, two
    // incremental refreshes over both ingest batches (= all orders);
    // the oracle recomputes the final gold relationally — silver is
    // orders minus the dropped 'P' rows, gold the exact decimal daily
    // aggregate in the engine's presentation schema
    "pipeline_dag" ->
      """SELECT o_custkey, date_trunc('day', o_orderdate) AS day,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS daily_revenue,
                COUNT(*) AS order_count,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  / COUNT(o_totalprice) AS avg_order_value
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY 1, 2 ORDER BY o_custkey, day""",
    // SQL pipeline spelling (Dag.pipelineSqlQuery): CREATE PIPELINE
    // declares the same bronze→silver(DROP 'P')→gold graph in one
    // statement, fed by raw parquet files landing in a directory
    // (copy-ledger ingest); the oracle is the same relational gold
    // recompute as pipeline_dag's — layout and refresh machinery are
    // content-invisible
    "pipeline_sql" ->
      """SELECT o_custkey, date_trunc('day', o_orderdate) AS day,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS daily_revenue,
                COUNT(*) AS order_count,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  / COUNT(o_totalprice) AS avg_order_value
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY 1, 2 ORDER BY o_custkey, day""",
    // Compiled-aggregate pipeline flow (Dag.pipelineAggQuery): gold is
    // the AGGREGATE FROM facts fold — run 1 ingests even keys, a
    // keyed DELETE retracts the %10 slice between runs, run 2 ingests
    // odd keys; the oracle recomputes the surviving per-customer
    // aggregate (exact decimal state -> double presentation)
    "pipeline_agg" ->
      """SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS revenue,
                COUNT(*) AS n
         FROM orders WHERE o_orderkey % 10 <> 0
         GROUP BY 1 ORDER BY o_custkey""",
    // Selective FULL refresh (Dag.pipelineFullQuery): a persisted
    // DROP rule lands on silver AFTER both ingest runs; the full
    // refresh rebuilds silver under the now-current rules (the 'P'
    // rows drop retroactively) and gold follows INCREMENTALLY,
    // folding the rebuild as exact decimal retractions — the oracle
    // recomputes the surviving per-customer aggregate
    "pipeline_full" ->
      """SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS revenue,
                COUNT(*) AS n
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY 1 ORDER BY o_custkey""",
    // Quarantine pipeline (Dag.pipelineQuarantineQuery): rows the
    // silver DROP rule rejects land in the quarantine table with the
    // rule name and the rejecting run (even keys ingest in run 1, odd
    // in run 2); kept rows read back from silver — the oracle
    // classifies all orders three ways
    "pipeline_quarantine" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderstatus = 'P' THEN 'not_pending'
                     ELSE 'kept' END AS _violated,
                CAST(CASE WHEN o_orderstatus <> 'P' THEN 0
                          WHEN o_orderkey % 2 = 0 THEN 1
                          ELSE 2 END AS BIGINT) AS _run_id
         FROM orders ORDER BY o_orderkey""",
    // Snapshot-CDC pipeline edge (Dag.pipelineSnapshotQuery): the
    // external source is replaced between refreshes — snapshot 1 =
    // %4 in (0,1,2), snapshot 2 = %4 in (1,2,3) with %4=2 prices
    // doubled; the dimension diffs at sequence = upstream version, so
    // %4=0 deletes, %4=1 keeps _seq 1 (untouched — the O(changed)
    // proof), %4=2 updates and %4=3 inserts at _seq 2
    "pipeline_snapshot" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 4 = 2 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice,
                CAST(CASE WHEN o_orderkey % 4 = 1 THEN 1
                          ELSE 2 END AS BIGINT) AS _seq
         FROM orders WHERE o_orderkey % 4 > 0
         ORDER BY o_orderkey""",
    // Continuous pipeline (Dag.pipelineContinuousQuery): batches land
    // before start / while running / while stopped; the continuous
    // graph (feed-subscribed silver with a DROP gate, mergeable-state
    // gold) must fold all three exactly once across bootstrap, live
    // stream, and checkpoint restart
    "pipeline_continuous" ->
      """SELECT o_custkey, o_orderstatus,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS revenue,
                COUNT(*) AS n
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY 1, 2 ORDER BY o_custkey, o_orderstatus""",
    // Pipeline CDC edge (Dag.pipelineCdcQuery): the dim is CREATED by
    // the first refresh and maintained by APPLY CHANGES — %5==0
    // inserted then deleted (absent), %5==1 keeps the in-batch seq-5
    // winner (+555; the run-2 seq-2 late update prunes on the
    // high-water), %5==2 updates to seq 7 (+777), %5==3 inserts at
    // seq 4 (+444), %5==4 never existed
    "pipeline_cdc" ->
      """SELECT o_orderkey, o_custkey,
                o_totalprice + CASE o_orderkey % 5
                  WHEN 1 THEN 555.0 WHEN 2 THEN 777.0
                  ELSE 444.0 END AS o_totalprice,
                CAST(CASE o_orderkey % 5
                  WHEN 1 THEN 5 WHEN 2 THEN 7 ELSE 4 END AS BIGINT)
                  AS _seq
         FROM orders WHERE o_orderkey % 5 IN (1, 2, 3)
         ORDER BY o_orderkey""",
    // PERSISTED expectations (Medallion.expectationsPersisted): rules
    // declared via SQL DDL land in the manifest, gate the odd-slice
    // append, and record per-rule counts in that commit's log entry —
    // the oracle recomputes the counts relationally over the gated
    // batch (pre-drop, the observed reading) and the final table's
    // count/key-checksum after the DROP rule filtered the 'P' rows
    "expectations_persisted" ->
      """SELECT * FROM (
           SELECT '_table_' AS rule,
                  CAST(COUNT(*) AS BIGINT) AS violated,
                  CAST(SUM(o_orderkey) AS BIGINT) AS passed
           FROM orders
           WHERE o_orderkey % 2 = 0 OR o_orderstatus <> 'P'
           UNION ALL
           SELECT 'key_present', CAST(0 AS BIGINT),
                  CAST(COUNT(*) AS BIGINT)
           FROM orders WHERE o_orderkey % 2 = 1
           UNION ALL
           SELECT 'not_pending',
                  CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus <> 'P',
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(SUM(CASE WHEN COALESCE(o_orderstatus <> 'P',
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders WHERE o_orderkey % 2 = 1
           UNION ALL
           SELECT 'reasonable_price',
                  CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice <= 400000.0,
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 400000.0,
                    FALSE) THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders WHERE o_orderkey % 2 = 1)
         ORDER BY rule""",
    // ARRAY shredding (Medallion.variantArrayShred): k and the tags
    // array are pure event_id arithmetic, so the oracle re-derives
    // the scalar-filtered explode via unnest(generate_series) —
    // element values, order, count and the k-filter all hash-gated
    "variant_array_shred" ->
      """SELECT CAST((event_id % 97 + i * 7) % 10 AS BIGINT) AS bucket,
                COUNT(*) AS n,
                CAST(SUM(event_id % 97 + i * 7) AS BIGINT) AS elem_sum,
                CAST(MAX(i) AS BIGINT) AS pos_max
         FROM (SELECT event_id,
                      unnest(generate_series(0,
                        CAST(event_id % 4 AS BIGINT))) AS i
               FROM events WHERE event_id % 5 = 0)
         GROUP BY 1 ORDER BY bucket""",
    // Relational recompute of the named-format lifecycle
    // (Medallion.formatRoundtrip — write.format("graft") overwrite +
    // replayed tagged append + replaceWhere option, read back via
    // read.format("graft")): final table = non-'P' originals ∪ non-'P'
    // appended slice ∪ the replaceWhere batch; the replayed append
    // contributes NOTHING (exactly-once) and every appended 'P' row is
    // swapped out by the selective overwrite.
    "format_roundtrip" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders WHERE o_orderstatus <> 'P'
           UNION ALL
           SELECT o_orderkey + 400000000 AS o_orderkey, o_custkey,
                  o_orderstatus, o_totalprice, o_orderdate,
                  o_orderpriority
           FROM orders
           WHERE o_orderkey % 97 = 0 AND o_orderstatus <> 'P'
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, '4-FMTRW' AS o_orderpriority
           FROM orders
           WHERE o_orderstatus = 'P' AND o_orderkey % 2 = 0)
         ORDER BY o_orderkey""",
    // Relational recompute of the catalog-name lifecycle
    // (Medallion.catalogTableVerbs): CTAS + UPDATE + expression-clause
    // MERGE + INSERT INTO, every verb and the final SELECT addressing
    // the table BY NAME (graft.g12.orders_cat) — a hash match proves
    // name resolution reaches the same table the algebra describes.
    "catalog_table_verbs" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 79 = 0
                       THEN o_totalprice + 111.0 ELSE o_totalprice
                  END AS o_totalprice,
                  o_orderdate,
                  CASE WHEN o_orderkey % 83 = 0
                       THEN '8-CATUPD' ELSE o_orderpriority
                  END AS o_orderpriority
           FROM orders),
         ins AS (
           SELECT o_orderkey + 300000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '7-CATINS' AS o_orderpriority
           FROM orders WHERE o_orderkey % 89 = 0)
         SELECT * FROM (
           SELECT * FROM base
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    "writer_v2" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderstatus = 'F'
                     THEN o_totalprice + 55.0 ELSE o_totalprice
                END AS o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    "table_properties" ->
      """SELECT key, value FROM (
           SELECT 'graft.minReaderVersion' AS key, '1' AS value
           UNION ALL SELECT 'graft.minWriterVersion', '1'
           UNION ALL SELECT 'owner', 'ml-team'
           UNION ALL SELECT 'rows', CAST(COUNT(*) AS VARCHAR) FROM orders)
         ORDER BY key""",
    "symlink_manifest" ->
      """SELECT * FROM orders WHERE o_orderkey % 97 <> 0
         ORDER BY o_orderkey""",
    "merge_multi_clause" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 7 = 0 AND o_orderstatus = 'F'
                     THEN o_totalprice + 11.0 ELSE o_totalprice
                END AS o_totalprice,
                o_orderdate,
                CASE WHEN o_orderkey % 7 = 0 AND o_orderstatus <> 'F'
                          AND o_totalprice > 150000.0
                     THEN '9-BIG' ELSE o_orderpriority
                END AS o_orderpriority
         FROM orders
         WHERE NOT (o_orderkey % 7 = 0 AND o_orderstatus <> 'F'
                    AND o_totalprice <= 150000.0)
         ORDER BY o_orderkey""",
    "fluent_table_verbs" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 79 = 0
                       THEN o_totalprice + 111.0 ELSE o_totalprice
                  END AS o_totalprice,
                  o_orderdate,
                  CASE WHEN o_orderkey % 83 = 0
                       THEN '8-FLUPD' ELSE o_orderpriority
                  END AS o_orderpriority
           FROM orders WHERE o_orderkey % 97 <> 0),
         ins AS (
           SELECT o_orderkey + 300000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '7-FLINS' AS o_orderpriority
           FROM orders WHERE o_orderkey % 89 = 0)
         SELECT * FROM (
           SELECT * FROM base
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    // Relational recompute of the incremental-clustering lifecycle
    // (Medallion.clusterIncrementalOrders): content is layout-invariant;
    // the touched-file arithmetic is spec-asserted (ClusteringSpec).
    "cluster_incremental" ->
      """WITH ins AS (
           SELECT o_orderkey + 500000000 AS o_orderkey,
                  o_custkey + 1000000 AS o_custkey, o_orderstatus,
                  o_totalprice, o_orderdate,
                  '5-CLUSTERED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 11 = 0)
         SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           UNION ALL SELECT * FROM ins)
         ORDER BY o_orderkey""",
    // Relational recompute of the bloom-index point lookup
    // (Medallion.pointLookupOrders): the customer's orders; the
    // file-pruning arithmetic is spec-asserted (invisible to a
    // correctness oracle by design).
    "point_lookup_bloom" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders WHERE o_custkey = 101
         ORDER BY o_orderkey""",
    // Relational recompute of the OPTIMIZE-ZORDER 2-D range read
    // (Medallion.zorderOptimizeOrders): content is layout-invariant;
    // the file-prune improvement is spec-asserted (invisible to a
    // correctness oracle by design).
    "zorder_optimize" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate
         FROM orders
         WHERE o_custkey BETWEEN 1 AND 150
           AND o_orderkey BETWEEN 1 AND 20000
         ORDER BY o_orderkey""",
    // Banded row-tracking oracle: the deterministic half (row count)
    // recomputes relationally; the id contracts arrive as booleans
    // checked distributively in Spark (engine-assigned ids are
    // invisible to a value oracle by design; see RowTrackingSpec).
    "row_tracking" ->
      """SELECT COUNT(*) + 3 AS n_rows,
                TRUE AS ids_unique, TRUE AS updated_keep_ids,
                TRUE AS carried_keep_ids, TRUE AS inserts_above_high_water
         FROM orders WHERE o_orderkey % 2 = 0""",
    // DESCRIBE HISTORY oracle: the seven-commit lifecycle is fully
    // deterministic (operations recorded in the log entries
    // themselves); timestamps excluded by design.
    "table_history" ->
      """SELECT CAST(v AS BIGINT) AS version, operation, tag
         FROM (VALUES (1, 'WRITE', 'load1'), (2, 'APPEND', NULL),
                      (3, 'MERGE', NULL), (4, 'CONSTRAINT', NULL),
                      (5, 'SCHEMA', NULL), (6, 'INDEX', NULL),
                      (7, 'RESTORE', NULL)) AS t(v, operation, tag)
         ORDER BY version""",
    // Banded NDV-index oracle (house pattern of approx_stats): exact
    // distinct/row counts recompute here; the sketch-merge estimate
    // arrives as a boolean checked against its 5% band in Spark.
    "ndv_stats" ->
      """SELECT 'o_custkey' AS col_name,
                COUNT(DISTINCT o_custkey) AS exact_distinct,
                COUNT(*) AS n_rows,
                TRUE AS ndv_within_5pct, TRUE AS full_coverage
         FROM orders
         UNION ALL
         SELECT 'o_orderkey', COUNT(DISTINCT o_orderkey), COUNT(*),
                TRUE, TRUE
         FROM orders
         ORDER BY col_name""",
    // Relational recompute of the generated-partition-column read
    // (Medallion.generatedColumnOrders): the declared o_year is
    // year(o_orderdate); the partition prune and write-side
    // enforcement are spec-asserted.
    "generated_columns" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                CAST(year(o_orderdate) AS INTEGER) AS o_year
         FROM orders
         WHERE year(o_orderdate) BETWEEN 1994 AND 1995
         ORDER BY o_orderkey""",
    // Relational recompute of the column-mapping lifecycle
    // (Medallion.columnMappingOrders): loads 1-2 predate the
    // drop+re-add of o_custkey, so they surface NULL; load 3 carries
    // it. The rename (o_totalprice -> price) is pure metadata — the
    // identical-file-bytes contract is spec-asserted.
    "column_mapping" ->
      """SELECT o_orderkey, o_totalprice AS price,
                CAST(NULL AS BIGINT) AS o_custkey
         FROM orders WHERE o_orderkey % 3 IN (0, 1)
         UNION ALL
         SELECT o_orderkey, o_totalprice AS price, o_custkey
         FROM orders WHERE o_orderkey % 3 = 2
         ORDER BY o_orderkey""",
    // Relational recompute of RESTORE (Medallion.tableRestoreOrders):
    // the rollback target's content — the two good loads, none of the
    // bad overwrite's rows.
    "table_restore" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 3 <> 2
         ORDER BY o_orderkey""",
    // Relational recompute of the shallow-clone divergence
    // (Medallion.tableCloneOrders): clone = orders with the %67 keys
    // merged; source half = the SAME keys pristine — copy-on-write
    // isolation in one hash.
    "table_clone" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 67 = 0
                       THEN o_totalprice + 125.0 ELSE o_totalprice END
                    AS o_totalprice,
                  o_orderdate,
                  CASE WHEN o_orderkey % 67 = 0
                       THEN '0-CLONED' ELSE o_orderpriority END
                    AS o_orderpriority,
                  'clone' AS _side
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'source' AS _side
           FROM orders WHERE o_orderkey % 67 = 0)
         ORDER BY o_orderkey, _side""",
    // Deep clone (Medallion.deepCloneOrders): the clone is read AFTER
    // the source directory is deleted wholesale, so a hash match
    // proves the copied files carry the full partitioned content —
    // physical independence, not ref sharing.
    "deep_clone" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 5 = 0
         ORDER BY o_orderkey""",
    // WHEN NOT MATCHED BY SOURCE sync (Medallion.mergeBySourceOrders):
    // matched keys (%3=0) take the source price bump; unmatched 'O'
    // rows delete; remaining unmatched rows flag stale —
    // first-clause-wins, recomputed relationally.
    "merge_by_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 3 = 0
                     THEN o_totalprice + 5.0 ELSE o_totalprice END
                  AS o_totalprice,
                o_orderdate,
                CASE WHEN o_orderkey % 3 <> 0
                     THEN '9-STALE' ELSE o_orderpriority END
                  AS o_orderpriority
         FROM orders
         WHERE o_orderkey % 3 = 0 OR o_orderstatus <> 'O'
         ORDER BY o_orderkey""",
    // COMPOSITE-KEY merge (Medallion.mergeCompositeLineitem): the
    // three clause verdicts recomputed on the FULL (l_orderkey,
    // l_linenumber) key — per-PAIR addressing, where a single-column
    // key would corrupt sibling lines of the same order.
    "merge_composite_key" ->
      """WITH li AS (
           SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
           FROM lineitem),
         updated AS (
           SELECT l_orderkey, l_linenumber,
                  l_quantity + 100.0 AS l_quantity,
                  'MERGED' AS l_returnflag
           FROM li WHERE l_orderkey % 37 = 0 AND l_quantity > 25.0),
         inserted AS (
           SELECT l_orderkey + 100000000 AS l_orderkey, l_linenumber,
                  max(l_quantity) AS l_quantity,
                  'INSERTED' AS l_returnflag
           FROM li WHERE l_orderkey % 41 = 0 GROUP BY 1, 2),
         kept AS (
           SELECT * FROM li WHERE l_orderkey % 37 <> 0)
         SELECT * FROM (
           SELECT * FROM kept
           UNION ALL SELECT * FROM updated
           UNION ALL SELECT * FROM inserted)
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""",
    // RESIDUAL-ON merge (Medallion.mergeResidualOrders): four verdicts
    // of `ON key AND s.price > t.price` — residual passes update,
    // residual fails insert a DUPLICATE-key source row AND leave the
    // target row to the by-source STALE mark; untouched keys carry.
    "merge_residual_on" ->
      """WITH t AS (
           SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
         s AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 106 = 0
                       THEN o_totalprice + 1000.0
                       ELSE o_totalprice - 1000.0 END AS o_totalprice,
                  'RESIDUAL' AS o_orderpriority
           FROM orders WHERE o_orderkey % 53 = 0),
         updated AS (
           SELECT s.* FROM s JOIN t USING (o_orderkey)
           WHERE s.o_totalprice > t.o_totalprice),
         inserted AS (
           SELECT s.* FROM s JOIN t USING (o_orderkey)
           WHERE NOT s.o_totalprice > t.o_totalprice),
         stale AS (
           SELECT t.o_orderkey, t.o_totalprice,
                  'STALE' AS o_orderpriority
           FROM t JOIN s USING (o_orderkey)
           WHERE NOT s.o_totalprice > t.o_totalprice),
         untouched AS (
           SELECT * FROM t WHERE o_orderkey % 53 <> 0)
         SELECT * FROM (
           SELECT * FROM untouched
           UNION ALL SELECT * FROM updated
           UNION ALL SELECT * FROM inserted
           UNION ALL SELECT * FROM stale)
         ORDER BY o_orderkey, o_orderpriority, o_totalprice""",
    // Column DEFAULT fill (Medallion.columnDefaultsOrders): base rows
    // (%4=0) keep their priority; rows inserted through the
    // column-list INSERT (%4=1) take the declared constant.
    "column_defaults" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 4 = 0
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, '5-DEFAULT' AS o_orderpriority
         FROM orders WHERE o_orderkey % 4 = 1
         ORDER BY o_orderkey""",
    // Relational recompute of CHECK-constraint enforcement
    // (Medallion.constraintEnforceOrders): the violating append leaves
    // ZERO rows (atomic rejection), the valid append all of its rows.
    "constraint_enforce" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders
         UNION ALL
         SELECT o_orderkey + 600000000 AS o_orderkey, o_custkey,
                o_orderstatus, o_totalprice, o_orderdate,
                '5-CHECKED' AS o_orderpriority
         FROM orders WHERE o_orderkey % 13 = 0
         ORDER BY o_orderkey""",
    // Relational recompute of the update-image change feed
    // (Medallion.changeFeedMerge): the merge version's CDC rows with
    // Delta CDF's four-way classification — matched keys as
    // update_preimage (old row) + update_postimage (new row),
    // unmatched as insert/delete.
    "change_feed_merge" ->
      """WITH pre AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'update_preimage' AS _change
           FROM orders WHERE o_orderkey % 73 = 0),
         post AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 250.0 AS o_totalprice,
                  o_orderdate, '0-CDF' AS o_orderpriority,
                  'update_postimage' AS _change
           FROM orders WHERE o_orderkey % 73 = 0),
         ins AS (
           SELECT o_orderkey + 400000000 AS o_orderkey, o_custkey,
                  'N' AS o_orderstatus, o_totalprice, o_orderdate,
                  '9-CDFINS' AS o_orderpriority, 'insert' AS _change
           FROM orders WHERE o_orderkey % 79 = 0),
         del AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'delete' AS _change
           FROM orders
           WHERE o_orderkey % 71 = 0 AND o_orderkey % 73 <> 0)
         SELECT * FROM (
           SELECT * FROM pre
           UNION ALL SELECT * FROM post
           UNION ALL SELECT * FROM ins
           UNION ALL SELECT * FROM del)
         ORDER BY o_orderkey, _change""",
    // Relational recompute of the stacked DELETION-VECTOR merges
    // (Medallion.mergeDeleteDvOrders): the merged-on-read table equals
    // the base minus both delete sets — DV anti-join correctness and
    // sidecar stacking in one gate; the zero-data-files write-side
    // property is asserted in ManifestTableSpec.
    "merge_delete_dv" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders
         WHERE o_orderkey % 83 <> 0 AND o_orderkey % 97 <> 0
         ORDER BY o_orderkey""",
    // Relational recompute of timestamp time travel
    // (Medallion.timeTravelOrders): a read pinned strictly between the
    // first (even-keys) and second (full) overwrite commits must
    // resolve to the even-keys snapshot — newest version <= t, with
    // later commits never leaking backward.
    "time_travel_timestamp" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 2 = 0
         ORDER BY o_orderkey""",
    // Relational recompute of additive schema evolution
    // (Medallion.schemaEvolutionOrders): pre-evolution rows read the
    // appended o_channel column as NULL; post-evolution rows carry it.
    "schema_evolution" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority,
                CAST(NULL AS VARCHAR) AS o_channel
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority,
                'ch-' || CAST(o_orderkey % 5 AS VARCHAR) AS o_channel
         FROM orders WHERE o_orderkey % 2 = 1
         ORDER BY o_orderkey""",
    // Update-image feed drain (TableFeedSource.streamTableFeedImages):
    // two loads by key mod 3 (v1 = keys%3=0, v2 = rest), then the v3
    // merge's keys as pre/post image pairs.
    "stream_feed_images" ->
      """WITH ins AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'insert' AS _change,
                  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 2 END
                    AS BIGINT) AS _commit_version
           FROM orders),
         pre AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'update_preimage' AS _change,
                  CAST(3 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0),
         post AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 1000.0 AS o_totalprice,
                  o_orderdate, '0-IMG' AS o_orderpriority,
                  'update_postimage' AS _change,
                  CAST(3 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0)
         SELECT * FROM (
           SELECT * FROM ins
           UNION ALL SELECT * FROM pre
           UNION ALL SELECT * FROM post)
         ORDER BY o_orderkey, _commit_version, _change""",
    // Admission-controlled feed drain (TableFeedSource
    // .streamTableFeedBounded): the SAME relational recompute as
    // startingVersion bounds the FIRST offset of a fresh subscription
    // (TableFeedSource.streamTableFeedFrom): v1's bootstrap inserts
    // never enter a batch; v2/v3 arrive tagged exactly once.
    "stream_feed_from" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority, 'insert' AS _change,
                CAST(CASE WHEN o_orderkey % 3 = 1 THEN 2 ELSE 3 END
                  AS BIGINT) AS _commit_version
         FROM orders WHERE o_orderkey % 3 <> 0
         ORDER BY o_orderkey, _commit_version, _change""",
    // stream_table_feed — maxVersionsPerBatch must change batching
    // only, never content or version tags.
    "stream_feed_bounded" ->
      """WITH ins AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'insert' AS _change,
                  CAST(1 + o_orderkey % 3 AS BIGINT) AS _commit_version
           FROM orders),
         upd AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 1000.0 AS o_totalprice,
                  o_orderdate, o_orderpriority,
                  'insert' AS _change, CAST(4 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0),
         del AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  'delete' AS _change, CAST(4 AS BIGINT) AS _commit_version
           FROM orders WHERE o_orderkey % 97 = 0)
         SELECT * FROM (
           SELECT * FROM ins
           UNION ALL SELECT * FROM upd
           UNION ALL SELECT * FROM del)
         ORDER BY o_orderkey, _commit_version, _change""",
    // Batch LEFT JOIN with the interval predicate: exactly what the
    // drained stream-stream left-outer join must equal. NULLS FIRST to
    // match the Spark side's asc_nulls_first (DuckDB defaults NULLS LAST).
    "stream_left_outer" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
                v.ts AS view_ts, p.ts AS purchase_ts
         FROM events v LEFT JOIN events p
           ON p.user_id = v.user_id
          AND p.event_type = 'purchase'
          AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
         WHERE v.event_type = 'view'
         ORDER BY view_id, purchase_id NULLS FIRST""",
    // Streaming histogram quantiles: the drained windowed bin counts
    // equal the batch binned distribution, so per-hour p50/p95 read off
    // the same CDF selection match the direct recompute exactly.
    "stream_hourly_quantiles" ->
      """WITH h AS (
           SELECT date_trunc('hour', ts) AS w,
             CAST(floor(value / 10.0) AS BIGINT) AS bin, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         c AS (
           SELECT w, bin, n,
             SUM(n) OVER (PARTITION BY w ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER (PARTITION BY w) AS total
           FROM h),
         p AS (SELECT UNNEST([0.5, 0.95]) AS p)
         SELECT CAST(w AS TIMESTAMP) AS window_start, p,
           CAST(MIN(bin) * 10.0 AS DOUBLE) AS value_floor,
           CAST(MAX(total) AS BIGINT) AS n_events
         FROM c, p WHERE cum >= ceil(p * total)
         GROUP BY w, p ORDER BY window_start, p""",
    // Stream-static enrichment is STATELESS: the drained append output
    // is exactly the batch dimension join.
    "stream_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
                e.event_type, e.value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",
    // Streaming MG heavy hitters: exact on the fixture (distinct users
    // per hour window << sketch capacity — see heavyUsersAgg scaladoc),
    // so the oracle is the exact per-window top-k. Ties rank by user-id
    // STRING ascending, the sketch's eval order.
    "stream_heavy_users" ->
      """WITH c AS (
           SELECT date_trunc('hour', ts) AS w, user_id, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT w, user_id, n,
             row_number() OVER (
               PARTITION BY w
               ORDER BY n DESC, CAST(user_id AS VARCHAR)) AS rank
           FROM c)
         SELECT CAST(w AS TIMESTAMP) AS window_start,
                CAST(rank AS INTEGER) AS rank, user_id, n AS n_events
         FROM r WHERE rank <= 5 ORDER BY window_start, rank""",
  )
}
