package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: the SCALE.md claims, held true by CI.
  * Each assertion pins a physical-plan property that silently regressing
  * would cost orders of magnitude at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sfTiny)
      .queryExecution.explainString(FormattedMode)

  test("silver_clean: validity predicates push into the parquet scan") {
    val p = planOf("silver_clean")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(l_quantity,0.0)"),
      s"quantity filter not pushed:\n${p.take(2000)}")
    // column pruning: untouched wide column never read
    assert(!p.contains("l_comment"))
  }

  test("events ts-range filter pushes into the parquet scan (timestamp generation)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // Under the nanos-long generation ts is a DERIVED column (div 1000
    // rebuild) — pushdown is impossible by construction, so this win
    // only exists (and is only asserted) for timestamp-typed fixtures.
    val raw = Tables.rawEventsSchema(spark, s"$sfTiny/events.parquet")
    assume(raw("ts").dataType == TimestampNTZType ||
      raw("ts").dataType == TimestampType)
    val p = Tables.events(spark, sfTiny)
      .filter(col("ts") >= lit("2024-03-01").cast("timestamp_ntz"))
      .select("event_id", "ts")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("GreaterThanOrEqual(ts,"),
      s"event-time predicate must reach the scan (row-group skipping):\n${p.take(1500)}")
  }

  test("star_join: dimensions broadcast; fact scan reads only needed columns") {
    val p = planOf("star_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    val lineitemSchema = "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"
    assert(p.contains(lineitemSchema), "fact scan not pruned to 3 columns")
  }

  test("gold_daily_revenue: partial+final hash aggregation, pruned scan") {
    val p = planOf("gold_daily_revenue")
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 2, "partial+final aggregation expected")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_totalprice:double,o_orderdate:timestamp_ntz"))
  }

  test("similarity_topk: probe side broadcast, corpus not shuffled before the join") {
    val p = planOf("similarity_topk")
    assert(p.contains("BroadcastExchange"), "probes should broadcast")
    // the only hash-partition exchange allowed is the per-probe window
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.forall(_.startsWith("probe_id")),
      s"corpus shuffled unexpectedly: $exchanges")
  }

  test("dedup_ngram: tree-shaped plan — the documents scan appears exactly once") {
    val p = planOf("dedup_ngram")
    // formatted mode lists every operator once in the numbered details
    // section: "(n) Scan parquet"
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"posting branch recomputed: $scans scans")
  }

  test("range_join_transit: the range join plans as an equi-join, never a nested loop") {
    val p = planOf("range_join_transit")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bucketized range join degenerated to a nested-loop/cartesian plan")
    val equiJoins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).length
    assert(equiJoins >= 2, s"expected lineitem⋈orders + bucket equi-join, got $equiJoins")
  }

  test("no declared query re-evaluates an expensive kernel inside a Filter") {
    // regression for two Catalyst inference traps: (1)
    // InferFiltersFromGenerate on an attribute explode child infers
    // size(s)>0 ∧ isnotnull(s), alias-substitutes the generating
    // expression, and pushes it below the parallelize repartition —
    // evaluated twice on ONE pre-shuffle task (fixed via explode_outer);
    // (2) join-key isnotnull inference alias-substituted the same way
    // (fixed via null-safe <=> join keys / nullIntolerant natives). A
    // Filter containing any expensive kernel must never appear in any
    // declared plan.
    val kernels = Seq("lambdafunction", "hyperplane_sig", "graft_simhash",
      "shingle_hashes", "concat_ws", "regexp_extract_all", "sequence(")
    val skip = Set("ml_train", "stream_hourly_demand",
      "stream_view_purchase", "stream_sessionize") // executing, not planning
    for (q <- SparkEntry.queries.keys.toSeq.sorted if !skip(q)) {
      val filters = planOf(q).linesIterator
        .filter(l => l.contains("Filter ") || l.stripLeading.startsWith("Condition"))
        .filter(l => kernels.exists(l.contains))
        .toList
      assert(filters.isEmpty,
        s"$q: expensive kernel leaked into a Filter:\n${filters.mkString("\n").take(1500)}")
    }
  }

  test("decontaminate: benchmark side broadcasts; corpus never hash-shuffles for the join") {
    val p = planOf("decontaminate")
    assert(p.contains("BroadcastHashJoin"), "benchmark posting list should broadcast")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    // the only hash exchange is the (doc, bench) count aggregation
    assert(exchanges.forall(e => e.startsWith("doc_id") || e.startsWith("bench_id")),
      s"corpus shuffled before the join: $exchanges")
  }

  test("declared seq_pack and quality_filter: no single-partition global window") {
    // a global window plans as Exchange SinglePartition before Window;
    // the DECLARED (benched, oracle-checked) entries must be the
    // distributed twins, with no such exchange anywhere in the plan
    for (q <- Seq("seq_pack", "quality_filter")) {
      val p = planOf(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"declared $q still has a single-partition exchange:\n${p.take(1200)}")
    }
  }

  test("similarity_ann_lsh: probes broadcast; corpus never shuffles for the bucket join") {
    // the round-5 scale probe caught Catalyst flipping this join to
    // sort-merge at 10x corpus (probe-side size estimated from the
    // corpus relation it derives from) — the corpus must never shuffle
    // on the signature; only probe-keyed dedup/window exchanges remain
    val p = planOf("similarity_ann_lsh")
    assert(p.contains("BroadcastExchange"), "probe side should broadcast")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.forall(_.startsWith("probe_id")),
      s"corpus shuffled for the LSH join: $exchanges")
  }

  test("dedup_incremental_ngram: batch posting broadcasts; corpus never shuffle-joins") {
    val p = planOf("dedup_incremental_ngram")
    assert(p.contains("BroadcastHashJoin"), "batch posting list should broadcast")
    // a corpus-side shuffle would surface as a shuffle join (both sides
    // hash on shingle); the allowed shingle exchange belongs to the
    // BATCH subtree's df-guard window — tiny by definition
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus shuffled into a non-broadcast join")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => e.startsWith("b_id") || e.startsWith("shingle")),
      s"unexpected shuffle keys: $exchanges")
  }

  test("dedup_semantic: full-corpus assignment is narrow — no fixed-width hash pin") {
    // the k-means pin (repartition(pinParts, vec_id) + sort) must ride
    // only the fit SAMPLE (a separate, already-executed job); the
    // declared plan assigns cells via the broadcast-centroid expression
    // and shuffles only on the cell key for the bucket collect. Before
    // round 5 the whole corpus ran through hashpartitioning(vec_id, 8) —
    // an 8-task cap on a 100 TB scan.
    val p = planOf("dedup_semantic")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("cell")),
      s"corpus repartitioned outside the cell-bucket shuffle: $exchanges")
    assert(p.contains("graft_nearest_centroid"),
      "assignment should run through the native NearestCentroid expression")
  }

  test("similarity_ivf_rq: probe cells broadcast into the index; corpus shuffles only for calibration") {
    // the candidate join must be broadcast (probeCells is probes×nprobe
    // rows — Catalyst would estimate it from the corpus relation it
    // derives from, the lshSearch round-5 trap); the only corpus-wide
    // exchange allowed is the dims-row calibration agg (keyed on pos)
    // plus the probe-keyed rank windows
    val p = planOf("similarity_ivf_rq")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus shuffled into a non-broadcast join")
    assert(p.contains("graft_nearest_centroid"),
      "cell assignment should run through the native NearestCentroid expression")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => e.startsWith("probe_id") || e.startsWith("pos")),
      s"unexpected shuffle keys: $exchanges")
  }

  test("term_relevance: single documents scan — df via count window, not a self-join") {
    val p = planOf("term_relevance")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"df branch re-scans/re-explodes the corpus: $scans scans")
  }

  test("bm25_rank: token rows never cross the wire; top-N is heap-based, not a global sort") {
    val p = planOf("bm25_rank")
    // the only KEYED exchange is the per-doc tf aggregate — map-side
    // partial agg collapses exploded tokens to one row per doc per
    // mapper (the 1-row stats agg and the <=20-row rank window are the
    // two inherently-single-partition bounded stages)
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("doc_id")),
      s"token-level or score-level shuffle leaked in: $exchanges")
    assert(p.contains("TakeOrderedAndProject"),
      "top-N must be per-partition heaps, not a corpus-wide sort")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "partial+final aggregation expected for the tf rollup")
  }

  test("embedding_knn: shuffles only on the cell key; never a cartesian plan") {
    val p = planOf("embedding_knn")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "in-cell self-join degenerated to an all-pairs plan")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.nonEmpty && exchanges.forall(e =>
      e.startsWith("cell") || e.startsWith("vec_id")),
      s"unexpected shuffle keys: $exchanges")
  }

  test("embedding_centroid: scan pruned to (label, embedding); partial+final agg") {
    val p = planOf("embedding_centroid")
    assert(p.contains("ReadSchema: struct<embedding:array<float>,label:int>")
      || p.contains("ReadSchema: struct<label:int,embedding:array<float>>"),
      "centroid scan should read only (label, embedding)")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final aggregation on (label, pos)")
  }

  test("skew_join_salted: stays an equi-join (salt rides the key), no nested loop") {
    val p = planOf("skew_join_salted")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "salted join degenerated to a nested-loop/cartesian plan")
  }

  test("pii_scrub / quality_filter / multimodal_meta: scans pruned to referenced columns") {
    val scrub = planOf("pii_scrub")
    assert(scrub.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "pii_scrub should read only (doc_id, text)")
    // the DECLARED quality_filter starts from a localCheckpoint (the
    // prefix-sum pin), so its final explain shows a LogicalRDD, not the
    // parquet scan — audit the scan on the anchor, which shares the
    // same scored() projection feeding the checkpoint
    val qf = graft.ops.Text.qualityFilter(spark, sfTiny)
      .queryExecution.explainString(FormattedMode)
    assert(qf.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>")
      || qf.contains("ReadSchema: struct<doc_id:bigint,lang:string,text:string>"),
      "quality_filter should read only (doc_id, lang, text)")
  }

  test("dup_spans: single corpus scan, frequency via window — no join-back double scan") {
    val p = planOf("dup_spans")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"span-frequency branch re-scans the corpus: $scans scans")
    assert(!p.contains("Exchange SinglePartition"),
      "dup_spans must not plan a single-partition stage")
  }

  test("stratified_quota: runs on the bounded-heap operator, no per-stratum sort") {
    val p = planOf("stratified_quota")
    assert(p.contains("GroupedTopK"),
      "quota sampling should plan through GroupedTopKExec")
    assert(!p.contains("Window"), "fell back to a row_number window sort")
  }

  test("fuzzy_dedup: tree-shaped — one customer scan, no nested loop") {
    val p = planOf("fuzzy_dedup")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"variant branch re-scans the input: $scans scans")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "pair expansion degenerated to a nested-loop plan")
  }

  test("span_scrub: single corpus scan; all windows/aggs keyed (no single partition)") {
    val p = planOf("span_scrub")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"re-assembly branch re-scans the corpus: $scans scans")
    assert(!p.contains("Exchange SinglePartition"),
      "span_scrub must not plan a single-partition stage")
  }

  test("funnel_conversion: one user_id shuffle feeds both windows AND the per-user agg") {
    val p = planOf("funnel_conversion")
    assert(p.contains("BroadcastExchange"), "customer dim should broadcast")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.forall(e => e.startsWith("user_id") || e.startsWith("c_mktsegment")),
      s"unexpected shuffle keys: $exchanges")
    assert(exchanges.count(_.startsWith("user_id")) <= 1,
      s"windows/agg should reuse ONE user_id exchange: $exchanges")
  }

  test("cohort_retention: shuffles only on grain/cohort keys, never a global window") {
    val p = planOf("cohort_retention")
    assert(!p.contains("Exchange SinglePartition"),
      "cohort windows must stay keyed")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.forall(e => e.startsWith("o_custkey") || e.startsWith("am")
      || e.startsWith("cohort_month") || e.startsWith("months_since")),
      s"unexpected shuffle keys: $exchanges")
  }

  test("embedding_quantize: two scans (calibrate + code); coding side joins by broadcast") {
    val p = planOf("embedding_quantize")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 2, s"expected calibration + coding scans, got $scans")
    assert(p.contains("BroadcastExchange"),
      "calibration row should broadcast back to the coding scan")
    // the vectors themselves must never hash-shuffle — only the 64-row
    // (pos, min, max) calibration aggregate may
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.forall(_.startsWith("pos")),
      s"vector data shuffled unexpectedly: $exchanges")
  }

  test("gap_fill: the daily aggregate is computed once and reused via cache") {
    val p = planOf("gap_fill")
    assert(p.contains("InMemoryTableScan"),
      "bounds/grid/probe should reuse the cached (series, day) aggregate")
  }

  test("supplier_profit: three dims broadcast; part filter prunes before the join") {
    val p = planOf("supplier_profit")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"part/supplier/nation should broadcast, got $broadcasts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the LIKE predicate reaches the part scan, not a post-join filter
    assert(p.contains("Contains(p_name"), "p_name filter not pushed to the scan")
  }

  test("vocab_oov: two passes by design — vocab built once, probed via broadcast") {
    val p = planOf("vocab_oov")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 2, s"expected vocab-build + scoring scans, got $scans")
    assert(p.contains("TakeOrderedAndProject"),
      "top-V vocab should be a bounded TakeOrdered, not a full sort")
    assert(p.contains("BroadcastExchange"), "vocabulary should broadcast")
  }

  test("column_profile: ONE fact scan feeds every column's profile (Expand, not C scans)") {
    val p = planOf("column_profile")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"per-column rescans detected: $scans scans")
    assert(p.contains("Expand"), "multi-distinct should plan through Expand")
  }

  test("copurchase_pairs: tree-shaped — one fact scan, no self-join") {
    val p = planOf("copurchase_pairs")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"basket mining must not self-join the fact: $scans scans")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "no join belongs in the chained-explode pair expansion")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
      "fact scan should prune to (orderkey, partkey)")
  }

  test("anomaly_days: one log scan; moments are window aggs on the daily table") {
    val p = planOf("anomaly_days")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"moments branch must not rescan the log: $scans scans")
    assert(p.contains("Window"), "per-series moments should be window aggregates")
    assert(!p.contains("Exchange SinglePartition"),
      "the moments window partitions by series, never globally")
  }

  test("order_value_quantiles: per-group window only — no single-partition stage") {
    val p = planOf("order_value_quantiles")
    assert(!p.contains("SinglePartition"),
      "discrete quantiles must not plan a global single-partition window")
    val exchanges = "hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("o_orderpriority")),
      s"only the group key may shuffle: $exchanges")
  }

  test("unigram_nll: one corpus scan at runtime — N/V scalars reuse the pair exchange") {
    // exchange reuse across the scalars branch is an AQE-time rewrite,
    // so audit the FINAL adaptive plan, not the static one
    val df = SparkEntry.queries("unigram_nll")(spark, sfTiny)
    df.collect()
    val full = df.queryExecution.explainString(FormattedMode)
    val p = full.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"scalars branch re-scans the corpus: $scans scans")
    assert(p.contains("ReusedExchange"),
      "corpus totals should reuse the (doc, token) pair exchange")
    assert(p.contains("BroadcastExchange"), "scalars row should broadcast")
  }

  test("bigram_nll: one corpus scan at runtime — V_b scalar reuses the pair exchange") {
    // same AQE-time rewrite as unigram_nll: the scalars branch must
    // reuse the (doc, a, b) pair exchange, not re-scan the corpus
    // (the count_distinct(when(m >= 1, b)) form exists to block the
    // column-pruning rewrite that would plan a second scan)
    val df = SparkEntry.queries("bigram_nll")(spark, sfTiny)
    df.collect()
    val full = df.queryExecution.explainString(FormattedMode)
    val p = full.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"scalars branch re-scans the corpus: $scans scans")
    assert(p.contains("ReusedExchange"),
      "V_b should reuse the (doc, a, b) pair exchange")
    assert(p.contains("BroadcastExchange"), "scalars row should broadcast")
  }

  test("doc_chunk: map-only — no join, no aggregate, no keyed shuffle") {
    val p = planOf("doc_chunk")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "chunking must stay a per-row pipeline")
    // allowed exchanges: the fixture-parallelism round-robin and the
    // declared ORDER BY's range partitioning — never a keyed shuffle
    assert(!p.contains("hashpartitioning"),
      "chunking must not impose a hash partitioning")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges === 2, s"expected repartition + ORDER BY only, got $exchanges")
    assert(p.contains("rangepartitioning") && p.contains("RoundRobinPartitioning"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan not pruned to (doc_id, text)")
  }

  test("export_manifest: map-side shard assignment, one keyed exchange, no join") {
    val p = planOf("export_manifest")
    assert(!p.contains("Join"), "shard assignment must be a pure projection")
    assert(p.contains("hashpartitioning(shard"),
      "partial+final agg keyed on shard expected")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges === 2,
      s"agg hash exchange + ORDER BY range only, got $exchanges")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan not pruned to (doc_id, text)")
  }

  test("quantile_histogram_rollup: fact scan once, pruned to two columns; probes broadcast") {
    val p = planOf("quantile_histogram_rollup")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"the fact table must be read once, got $scans scans")
    assert(p.contains("ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp_ntz>"),
      "scan not pruned to (o_totalprice, o_orderdate)")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "quantile probes must broadcast, never shuffle the CDF")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("quantile_sketch_rollup: three pruned scans by design; probes broadcast; no cartesian") {
    val p = planOf("quantile_sketch_rollup")
    // three fact scans BY DESIGN — merged-daily sketch, direct monthly
    // twin, exact anchor: the self-verifying oracle shape. A production
    // dashboard keeps only the merged path (one scan + the tiny state).
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 3, s"expected merged+direct+exact scans, got $scans")
    assert(p.contains("ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp_ntz>"),
      "every scan must prune to (o_totalprice, o_orderdate)")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "quantile probes must broadcast into the CDF")
    assert(!p.contains("CartesianProduct"))
  }

  test("column-mapped read: filter on the RENAMED name pushes into the scan under the PHYSICAL name; pruning intact") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_pa_cm").toString + "/t"
    graft.pipeline.ManifestTable.write(
      spark.range(0, 1000).toDF("id")
        .withColumn("amount", col("id") * 2)
        .withColumn("wide", concat(lit("padding-"), col("id"))),
      path)
    graft.pipeline.ManifestTable.renameColumn(spark, path, "amount", "price")
    val q = graft.pipeline.ManifestTable.read(spark, path)
      .filter(col("price") > 100).select("id", "price")
    val p = q.queryExecution.explainString(FormattedMode)
    // the logical->physical projection must FOLD into the scan: the
    // filter reaches parquet under the stable physical name...
    assert(p.contains("GreaterThan(amount,100)"),
      s"renamed-column filter not pushed under physical name:\n${p.take(2500)}")
    // ...and column pruning still drops the untouched wide column
    assert(p.contains("ReadSchema: struct<id:bigint,amount:bigint>"),
      s"scan must prune to (id, amount):\n${p.take(2500)}")
    assert(!p.contains("wide"))
  }

  test("SQL reads through graft_table inherit pushdown and pruning: filters reach the parquet scan, untouched columns never read") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_pa_sql").toString + "/t"
    graft.pipeline.ManifestTable.write(
      spark.range(0, 1000).toDF("id")
        .withColumn("v", col("id") * 2)
        .withColumn("wide", concat(lit("padding-"), col("id"))), path)
    graft.GraftSession.withSqlExtensions(spark) { s =>
      val df = s.sql(
        s"SELECT id, v FROM graft.'$path' WHERE id > 500")
      val p = df.queryExecution.explainString(FormattedMode)
      // the TVF expands at analysis time into the manifest-governed
      // parquet scan — Catalyst's pushdown and pruning apply untouched
      assert(p.contains("PushedFilters") && p.contains("GreaterThan(id,500)"),
        s"SQL filter must reach the scan:\n${p.take(1500)}")
      assert(!p.contains("wide"),
        "unprojected column must be pruned from the SQL read")
      assert(df.count() === 499)
    }
  }

  test("expectations gate: observe + fail-arm + drop fuse into ONE scan of the input") {
    import graft.pipeline.Expectations
    import graft.pipeline.Expectations._
    val (kept, _) = Expectations.gate(Tables.orders(spark, sfTiny), Seq(
      expect("warn_price", "o_totalprice <= 400000.0"),
      expectOrDrop("drop_pending", "o_orderstatus <> 'P'"),
      expectOrFail("key_present", "o_orderkey IS NOT NULL")))
    val p = kept.queryExecution.explainString(FormattedMode)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"the gate must not add scans — got $scans:\n${p.take(1500)}")
    assert(p.contains("CollectMetrics"),
      "observe metrics must ride the gated plan itself")
  }

  test("variant_array_shred: substitution + pruning drop the VARIANT column from the scan entirely") {
    // the 100 TB property in one line: both accessors read shreds, so
    // ColumnPruning removes the (expensive, unprunable) variant blob
    // from the parquet read schema
    val p = planOf("variant_array_shred")
    assert(p.contains("_shred_tags") && p.contains("_shred_k"),
      s"scan must read the shreds:\n${p.take(1500)}")
    assert(!p.contains("v:variant"),
      "the variant column must be pruned from the read schema " +
        "(no accessor needs it after substitution)")
  }

  test("quarantine feed: one filter pass over the batch — no exchange, no extra scan, pruned to referenced columns") {
    import graft.pipeline.Expectations
    import graft.pipeline.Expectations._
    val bad = Expectations.quarantined(Tables.orders(spark, sfTiny),
      Seq(expectOrDrop("not_pending", "o_orderstatus <> 'P'"),
        expect("warn_only", "o_totalprice <= 400000.0")))
    val p = bad.queryExecution.explainString(FormattedMode)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"the quarantine feed is ONE filter over the batch — got $scans " +
        s"scans:\n${p.take(1500)}")
    assert(!p.contains("Exchange"),
      "a row-local filter+tag must never shuffle")
    // only the DROP rule feeds the quarantine; WARN rules don't
    assert(p.contains("not_pending") && !p.contains("warn_only"),
      "_violated must name only DROP rules")
  }

  test("rolling_users: cell explode never touches the log; bounds from a pruned scan") {
    val p = planOf("rolling_users")
    // two scans by design: (user_id, ts) for cells + ts-only for bounds
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans === 2, s"expected cells + bounds scans, got $scans")
    // physical ts type varies by fixture generation (nanos-long vs
    // timestamp) — assert the pruning, not the layout
    assert("ReadSchema: struct<ts:[a-z_]+>".r.findFirstIn(p).isDefined,
      "bounds scan should prune to the timestamp column")
    assert(!p.contains("CartesianProduct"),
      "bounds must attach via broadcast, not a cartesian")
  }
}
