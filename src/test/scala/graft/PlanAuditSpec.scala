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
    val exchanges = "Exchange hashpartitioning\\((\\w+)".r
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

  test("shingle pipelines: no generator-inferred filter re-evaluates the shingle kernel pre-shuffle") {
    // regression for the InferFiltersFromGenerate trap: an attribute
    // explode child gets size(s)>0 ∧ isnotnull(s) inferred, the alias
    // substituted, and the whole shingle expression pushed below the
    // parallelize repartition — evaluated twice on ONE task. The fix is
    // explode_outer; this pins it. A Filter containing the shingle
    // kernel (concat_ws for the composed form, shingle_hashes for the
    // native one) must never appear in these plans.
    for (q <- Seq("decontaminate", "dedup_ngram", "dedup_clusters")) {
      val filters = planOf(q).linesIterator
        .filter(l => l.contains("Filter") || l.contains("Condition"))
        .mkString("\n")
      assert(!filters.contains("concat_ws") && !filters.contains("shingle_hashes"),
        s"$q: shingle kernel leaked into a Filter:\n${filters.take(1500)}")
    }
  }

  test("decontaminate: benchmark side broadcasts; corpus never hash-shuffles for the join") {
    val p = planOf("decontaminate")
    assert(p.contains("BroadcastHashJoin"), "benchmark posting list should broadcast")
    val exchanges = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    // the only hash exchange is the (doc, bench) count aggregation
    assert(exchanges.forall(e => e.startsWith("doc_id") || e.startsWith("bench_id")),
      s"corpus shuffled before the join: $exchanges")
  }

  test("seq_pack distributed twin: no single-partition global window") {
    val p = graft.ops.Curate.packChunksDistributed(
      Tables.documents(spark, sfTiny), 256)
      .queryExecution.explainString(FormattedMode)
    // a global window plans as Exchange SinglePartition before Window;
    // the distributed twin must not contain one feeding a Window
    val single = p.linesIterator.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange SinglePartition") => i
    }.toList
    assert(single.isEmpty,
      s"distributed packing still has a single-partition exchange:\n${p.take(1200)}")
  }

  test("pii_scrub / quality_filter / multimodal_meta: scans pruned to referenced columns") {
    val scrub = planOf("pii_scrub")
    assert(scrub.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "pii_scrub should read only (doc_id, text)")
    val qf = planOf("quality_filter")
    assert(qf.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>")
      || qf.contains("ReadSchema: struct<doc_id:bigint,lang:string,text:string>"),
      "quality_filter should read only (doc_id, lang, text)")
  }
}
