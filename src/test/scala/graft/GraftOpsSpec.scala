package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** The facade must behave identically on arbitrarily-named columns. */
class GraftOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val renamed = Tables.documents(spark, sfTiny)
    .select(col("doc_id").as("url_id"), col("text").as("body"))

  test("facade dedupExact over renamed columns equals fixture-bound result") {
    val viaApi = GraftOps.dedupExact(renamed, "body", "url_id")
      .select(col("url_id")).as[Long].collect().sorted.toSeq
    val fixture = graft.ops.Dedup.dedupExact(spark, sfTiny)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(viaApi === fixture)
  }

  test("facade ngramNearDups over renamed columns equals fixture-bound result") {
    val viaApi = GraftOps.ngramNearDups(renamed, "url_id", "body")
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val fixture = graft.ops.Dedup.dedupNgram(spark, sfTiny)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(viaApi === fixture)
  }

  test("facade textQuality/langId over renamed columns match fixture-bound queries") {
    val q = GraftOps.textQuality(renamed, "body")
      .select(col("url_id"), col("n_tokens"), col("stopword_ratio"))
      .as[(Long, Int, Double)].collect().toSet
    val fq = graft.ops.Text.textQuality(spark, sfTiny)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"))
      .as[(Long, Int, Double)].collect().toSet
    assert(q === fq)
    val l = GraftOps.langId(renamed, "body")
      .select(col("url_id"), col("predicted_lang")).as[(Long, String)].collect().toSet
    val fl = graft.ops.Text.langId(spark, sfTiny)
      .select(col("doc_id"), col("predicted_lang")).as[(Long, String)].collect().toSet
    assert(l === fl)
  }

  test("facade bpeTokenCount matches the declared token_bpe counts") {
    val viaApi = GraftOps.bpeTokenCount(renamed, "body")
      .select(col("url_id"), col("n_re_tokens")).as[(Long, Long)].collect().toSet
    val fixture = graft.ops.Text.tokenBpe(spark, sfTiny)
      .select(col("doc_id"), col("n_re_tokens")).as[(Long, Long)].collect().toSet
    assert(viaApi === fixture)
  }

  test("facade cosineTopK with a separate probe frame matches similarity_topk") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val viaApi = GraftOps.cosineTopK(emb, emb.filter(col("id") < 10), "id", "emb", k = 5)
      .select("probe_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    val fixture = graft.ops.Similarity.similarityTopk(spark, sfTiny)
      .select("probe_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    assert(viaApi === fixture)
  }

  test("facade dupClusters over renamed pair columns equals components of ngram pairs") {
    val pairs = GraftOps.ngramNearDups(renamed, "url_id", "body")
      .select(col("doc1").as("left_id"), col("doc2").as("right_id"))
    val viaApi = GraftOps.dupClusters(pairs, "left_id", "right_id")
      .as[(Long, Long)].collect().toMap
    val fixture = graft.ops.Components.connectedComponents(
        graft.ops.Dedup.dedupNgram(spark, sfTiny)
          .select(col("doc1").as("u"), col("doc2").as("v")))
      .as[(Long, Long)].collect().toMap
    assert(viaApi === fixture)
  }

  test("facade piiScrub appends scrub columns over renamed input") {
    val out = GraftOps.piiScrub(
      Seq((1L, "mail a@b.co or visit https://x.io now")).toDF("url_id", "body"), "body")
    val r = out.head()
    assert(out.columns.toSeq ===
      Seq("url_id", "body", "clean_text", "n_emails", "n_urls", "n_numbers"))
    assert(r.getAs[String]("clean_text") === "mail <EMAIL> or visit <URL> now")
  }

  test("facade termRelevance / embeddingCentroids / saltedJoin match declared queries") {
    val viaApi = GraftOps.termRelevance(renamed, "url_id", "body")
      .collect().toSeq
    val declared = graft.ops.Text.termRelevance(spark, sfTiny).collect().toSeq
    assert(viaApi === declared)
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("label").as("cls"), col("embedding").as("vec"))
    assert(GraftOps.embeddingCentroids(emb, "cls", "vec").collect().toSeq
      === graft.ops.Similarity.embeddingCentroids(spark, sfTiny).collect().toSeq)
    val plain = Tables.events(spark, sfTiny).select(col("user_id"), col("value"))
      .join(Tables.customer(spark, sfTiny).select(col("c_custkey")),
        col("user_id") === col("c_custkey")).count()
    assert(GraftOps.saltedJoin(
      Tables.events(spark, sfTiny).select(col("user_id"), col("value")),
      Tables.customer(spark, sfTiny).select(col("c_custkey")),
      "user_id", "c_custkey", salt = 4).count() === plain)
  }

  test("facade writeVersioned/readVersioned round-trip through the manifest protocol") {
    val path = java.nio.file.Files.createTempDirectory("graft_api_mt").toString + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(GraftOps.writeVersioned(df, path) === 1L)
    assert(GraftOps.readVersioned(spark, path).count() === 2)
    // unversioned path falls back to plain parquet
    val plainPath = java.nio.file.Files.createTempDirectory("graft_api_pq").toString + "/t"
    df.write.parquet(plainPath)
    assert(GraftOps.readVersioned(spark, plainPath).count() === 2)
  }

  test("facade qualityFilter (approx path) drops the worst-scoring rows") {
    val kept = GraftOps.qualityFilter(renamed, "url_id", "body", "url_id", dropBelow = 0.2)
    val total = renamed.count()
    assert(kept.count() < total && kept.count() >= (total * 0.7).toLong)
  }

  test("facade rangeJoin and zorderCluster preserve rows") {
    val pts = (0L until 50L).toDF("p")
    val ivs = Seq((10L, 20L), (40L, 45L)).toDF("lo", "hi")
    val matched = GraftOps.rangeJoin(pts, ivs, "p", "lo", "hi", bucketWidth = 16)
    assert(matched.count() === 11 + 6)
    val z = GraftOps.zorderCluster(
      Tables.lineitem(spark, sfTiny).select("l_suppkey", "l_partkey"),
      "l_suppkey", "l_partkey")
    assert(z.count() === Tables.lineitem(spark, sfTiny).count())
    assert(z.columns.toSeq === Seq("l_suppkey", "l_partkey")) // helper key dropped
  }

  test("facade decontaminate over two renamed tables equals the declared split") {
    val bench = renamed.filter(col("url_id") % 25 === 0)
    val corpus = renamed.filter(col("url_id") % 25 =!= 0)
    val viaApi = GraftOps.decontaminate(corpus, bench, "url_id", "body")
      .select("doc_id", "bench_id", "common").as[(Long, Long, Long)]
      .collect().toSet
    val fixture = graft.ops.Curate.decontaminateHashed(spark, sfTiny)
      .select("doc_id", "bench_id", "common").as[(Long, Long, Long)]
      .collect().toSet
    assert(viaApi === fixture)
  }

  test("facade packSequences over renamed columns equals the declared seq_pack") {
    val viaApi = GraftOps.packSequences(renamed, "url_id", "body", chunkTokens = 256)
      .select("doc_id", "chunk_first", "chunk_last", "chunk_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val fixture = graft.ops.Curate.seqPack(spark, sfTiny)
      .select("doc_id", "chunk_first", "chunk_last", "chunk_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaApi === fixture)
  }

  test("facade repetitionSignals / stratifiedSample / newRowsOnly on renamed columns") {
    val rep = GraftOps.repetitionSignals(renamed, "body")
    assert(rep.columns.toSeq === Seq("url_id", "body", "n_tokens",
      "dup_token_frac", "dup_2gram_frac", "top_2gram_frac"))
    assert(rep.count() === renamed.count())
    val sampled = GraftOps.stratifiedSample(renamed, "url_id", "body",
      rates = Map.empty, defaultRate = 0.5)
    assert(sampled.count() > 0 && sampled.count() < renamed.count())
    val newOnly = GraftOps.newRowsOnly(
      renamed.filter(col("url_id") % 5 =!= 0),
      renamed.filter(col("url_id") % 5 === 0), "body")
    val plain = renamed.filter(col("url_id") % 5 === 0)
      .join(renamed.filter(col("url_id") % 5 =!= 0).select("body").distinct(),
        Seq("body"), "left_anti")
    assert(newOnly.select("url_id").as[Long].collect().sorted.toSeq ===
      plain.select("url_id").as[Long].collect().sorted.toSeq)
  }

  test("facade bpePieceCount matches the declared token_bpe_learned") {
    val viaApi = GraftOps.bpePieceCount(renamed, "url_id", "body")
      .select(col("url_id"), col("n_pieces")).as[(Long, Long)].collect().toSet
    val fixture = graft.ops.Bpe.tokenBpeLearned(spark, sfTiny)
      .select(col("doc_id"), col("n_pieces")).as[(Long, Long)].collect().toSet
    assert(viaApi === fixture)
  }

  test("facade stratifiedQuota / duplicateSpans / fuzzyKeyPairs on renamed columns") {
    val strat = renamed.withColumn("bucket", (col("url_id") % 3).cast("string"))
    val quota = GraftOps.stratifiedQuota(strat, "url_id", "bucket", 2)
    assert(quota.count() === 6) // 3 buckets × exactly 2
    val spans = GraftOps.duplicateSpans(renamed, "url_id", "body", n = 2)
    assert(spans.columns.toSeq === Seq("doc_id", "total_spans", "dup_spans"))
    val fuzzy = GraftOps.fuzzyKeyPairs(
      Seq("abcd", "abd", "zz").toDF("k"), "k")
    assert(fuzzy.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("abcd", "abd")))
  }

  test("facade scrubDuplicateSpans / funnelStages / gapFillDaily on renamed columns") {
    val scrub = GraftOps.scrubDuplicateSpans(renamed, "url_id", "body")
    val fixture = graft.ops.Curate.spanScrub(Tables.documents(spark, sfTiny))
    assert(scrub.select("doc_id", "kept_segs").as[(Long, Long)].collect().toSet
      === fixture.select("doc_id", "kept_segs").as[(Long, Long)].collect().toSet)

    val ev = Tables.events(spark, sfTiny)
      .select(col("user_id").as("uid"), col("event_id").as("eid"),
        col("ts").as("at"), col("event_type").as("kind"))
    val viaApi = GraftOps.funnelStages(ev, "uid", "eid", "at", "kind")
    val direct = graft.ops.Star.funnelPerUser(Tables.events(spark, sfTiny))
    assert(viaApi.collect().map(_.toSeq).toSet
      === direct.collect().map(_.toSeq).toSet)

    val gaps = GraftOps.gapFillDaily(
      Tables.events(spark, sfTiny)
        .select(col("event_type").as("series"), col("ts").as("at"),
          col("value").as("amt")),
      "series", "at", "amt")
    assert(gaps.columns.toSeq === Seq("event_type", "day", "events",
      "day_value", "filled", "carry_avg"))
    assert(gaps.filter(col("filled") && col("events") =!= 0).count() === 0)
  }

  test("facade cohortRetention / quantizeEmbeddings match declared queries") {
    val cohort = GraftOps.cohortRetention(
      Tables.orders(spark, sfTiny)
        .select(col("o_custkey").as("acct"), col("o_orderdate").as("first_seen")),
      "acct", "first_seen")
    val declared = graft.ops.Aggregates.cohortRetention(spark, sfTiny)
    assert(cohort.collect().map(_.toSeq).toSeq
      === declared.collect().map(_.toSeq).toSeq)

    val q = GraftOps.quantizeEmbeddings(
      Tables.embeddings(spark, sfTiny)
        .select(col("vec_id").as("id"), col("embedding").as("emb"),
          col("label").as("cls")),
      "id", "emb", "cls")
    val declaredQ = graft.ops.Similarity.embeddingQuantize(spark, sfTiny)
    assert(q.collect().map(_.toSeq).toSeq
      === declaredQ.collect().map(_.toSeq).toSeq)
  }

  test("facade bm25TopN / knnGraph / pageRank match declared queries on renamed columns") {
    val bm = GraftOps.bm25TopN(
      Tables.documents(spark, sfTiny)
        .select(col("doc_id").as("id"), col("text").as("body")),
      "id", "body", Seq("spark", "join", "vector"))
    val declaredBm = graft.ops.Text.bm25Rank(spark, sfTiny)
    assert(bm.collect().map(_.toSeq).toSeq
      === declaredBm.collect().map(_.toSeq).toSeq)

    val knn = GraftOps.knnGraph(
      Tables.embeddings(spark, sfTiny)
        .select(col("vec_id").as("id"), col("embedding").as("emb"),
          col("label").as("cell")),
      "id", "emb", "cell")
    val declaredKnn = graft.ops.Similarity.embeddingKnn(spark, sfTiny)
    assert(knn.collect().map(_.toSeq).toSeq
      === declaredKnn.collect().map(_.toSeq).toSeq)

    // facade feeds the raw (un-parallelized) table: bit-equality with
    // the declared query IS the determinism-by-construction claim
    val rq = GraftOps.annIvfRq(
      Tables.embeddings(spark, sfTiny)
        .select(col("vec_id").as("id"), col("embedding").as("emb")),
      "id", "emb")
    val declaredRq = graft.ops.Similarity.annIvfRq(spark, sfTiny)
    assert(rq.collect().map(_.toSeq).toSeq
      === declaredRq.collect().map(_.toSeq).toSeq)

    import spark.implicits._
    val pr = GraftOps.pageRank(
      Seq((5L, 1L), (1L, 2L), (2L, 1L)).toDF("from", "to"), "from", "to",
      iters = 2)
    assert(pr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === graft.ops.Graph.pageRankLocal(
        Seq((5L, 1L), (1L, 2L), (2L, 1L)), iters = 2))
  }

  test("facade anomaly/rolling/quantiles/profile/basket match declared queries") {
    val ev = Tables.events(spark, sfTiny)
      .select(col("event_type").as("series"), col("ts").as("at"),
        col("user_id").as("actor"))

    val anom = GraftOps.anomalyDays(ev, "series", "at")
    assert(anom.collect().map(_.toSeq).toSeq
      === graft.ops.TimeSeries.anomalyQuery(spark, sfTiny)
        .collect().map(_.toSeq).toSeq)

    val roll = GraftOps.rollingDistinct(ev, "actor", "at")
    assert(roll.collect().map(_.toSeq).toSeq
      === graft.ops.TimeSeries.rollingUsersQuery(spark, sfTiny)
        .collect().map(_.toSeq).toSeq)

    val quant = GraftOps.groupQuantiles(
      Tables.orders(spark, sfTiny)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      "o_orderpriority", "o_totalprice", "o_orderkey")
    assert(quant.collect().map(_.toSeq).toSeq
      === graft.ops.Aggregates.orderValueQuantiles(spark, sfTiny)
        .collect().map(_.toSeq).toSeq)

    val prof = GraftOps.profileColumns(
      Tables.lineitem(spark, sfTiny), Seq("l_orderkey", "l_returnflag"))
    assert(prof.collect().map(r => (r.getString(0), r.getLong(3))).toMap
      === Map("l_orderkey" -> Tables.lineitem(spark, sfTiny)
          .select("l_orderkey").distinct().count(),
        "l_returnflag" -> 3L))

    val pairs = GraftOps.copurchasePairs(
      Tables.lineitem(spark, sfTiny)
        .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
      "basket", "item")
    assert(pairs.collect().map(_.toSeq).toSeq
      === graft.ops.Basket.copurchaseQuery(spark, sfTiny)
        .collect().map(_.toSeq).toSeq)
  }

  test("facade chunk/resample/nll/entropy/pmi match declared queries on renamed columns") {
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id").as("id"), col("text").as("body"),
        col("lang").as("language"))
    assert(GraftOps.chunkDocuments(docs, "id", "body").collect().map(_.toSeq).toSeq
      === graft.ops.Curate.docChunkQuery(spark, sfTiny).collect().map(_.toSeq).toSeq)
    assert(GraftOps.resampleByDomain(docs.select(col("id"), col("language")),
        "id", "language", graft.ops.Curate.ResampleWeights,
        graft.ops.Curate.ResampleDefault)
        .orderBy("id", "rep_idx").collect().map(_.toSeq).toSeq
      === graft.ops.Curate.domainResample(spark, sfTiny).collect().map(_.toSeq).toSeq)
    assert(GraftOps.unigramNllScores(docs, "id", "body").collect().map(_.toSeq).toSeq
      === graft.ops.Text.unigramNll(spark, sfTiny).collect().map(_.toSeq).toSeq)
    assert(GraftOps.tokenEntropyScores(docs, "id", "body").collect().map(_.toSeq).toSeq
      === graft.ops.Text.tokenEntropy(spark, sfTiny).collect().map(_.toSeq).toSeq)
    assert(GraftOps.pmiCollocations(docs, "body").collect().map(_.toSeq).toSeq
      === graft.ops.Text.bigramPmi(spark, sfTiny).collect().map(_.toSeq).toSeq)
  }

  test("facade sketchQuantiles: within relative alpha of exact group quantiles on renamed columns") {
    val alpha = 0.01
    val df = Tables.orders(spark, sfTiny)
      .select(col("o_orderpriority").as("bucket"),
        col("o_totalprice").as("amount"))
    val est = GraftOps.sketchQuantiles(df, "bucket", "amount", alpha = alpha)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("est")).toMap
    // exact discrete quantile at the same rank definition, per group
    val groups = df.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    for ((g, vs) <- groups; p <- Seq(0.5, 0.9, 0.99)) {
      val exact = vs(math.ceil(p * vs.length).toInt - 1)
      val e = est((g, p))
      assert(math.abs(e - exact) <= alpha * exact * (1 + 1e-9),
        s"group $g p=$p est=$e exact=$exact")
    }
  }

  test("facade skew-guard audit twins report suppressed groups on renamed columns") {
    val names = Seq("ab", "ac", "ad", "ae").toDF("name")
    assert(GraftOps.fuzzyKeyPairsDropped(names, "name", maxBucket = 3).count() === 1)
    val items = (1 to 12).map(i => (99L, i.toLong)).toDF("ord", "itm")
    assert(GraftOps.copurchasePairsDropped(items, "ord", "itm", maxBasket = 10)
      .count() === 1)
    val docs = (0 until 5).map(i => (i.toLong, s"x y z t$i")).toDF("id", "body")
    assert(GraftOps.ngramNearDupsDropped(docs, "id", "body", maxDf = 4).count() === 1)
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id").as("i"), col("embedding").as("e"))
    assert(GraftOps.cosineNearDupsDropped(emb, "i", "e", maxBucket = 1).count() > 0)
    assert(GraftOps.semanticNearDupsDropped(emb, "i", "e", maxCluster = 20).count() > 0)
  }

  test("facade ACID verbs: merge, rename/drop, zorder optimize, clone, restore, point lookup") {
    val root = java.nio.file.Files.createTempDirectory("graft_ops_acid").toString
    val path = s"$root/t"
    val df = spark.range(0, 200).toDF("id")
      .withColumn("k", pmod(col("id") * 2654435761L, lit(200)))
      .withColumn("v", col("id") * 3)
      .repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
    GraftOps.writeVersioned(df, path, statsCols = Seq("id", "k"))
    GraftOps.mergeVersioned(
      Seq((7L, 7L, -1L)).toDF("id", "k", "v"), path, "id")
    assert(GraftOps.readVersioned(spark, path)
      .filter(col("id") === 7).select("v").head().getLong(0) === -1L)
    GraftOps.renameTableColumn(spark, path, "v", "value")
    GraftOps.optimizeZOrderTable(spark, path, "k", "id", targetFiles = 4)
    assert(GraftOps.pointLookup(spark, path, "k", 42L).count() === 1L)
    val preDrop = graft.pipeline.ManifestTable.currentVersion(spark, path).get
    GraftOps.dropTableColumn(spark, path, "value")
    assert(GraftOps.readVersioned(spark, path).schema.fieldNames.toSeq
      === Seq("id", "k"))
    GraftOps.restoreTable(spark, path, preDrop)
    assert(GraftOps.readVersioned(spark, path).schema.fieldNames.toSeq
      === Seq("id", "k", "value"))
    val dst = s"$root/c"
    GraftOps.cloneTable(spark, path, dst)
    assert(GraftOps.readVersioned(spark, dst).count() === 200)
  }

  test("facade catalog/evolution verbs: createTable, renameTable, mergeVersionedEvolving (r13)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ops_cat").toString
    spark.conf.set("spark.graft.warehouse", wh)
    try {
      GraftOps.createTable(spark, "fac.decl",
        org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING"))
      assert(GraftOps.table(spark, "fac.decl").count() === 0)
      GraftOps.saveAsTable(Seq((1L, "a")).toDF("id", "v"), "fac.decl",
        mode = "append")
      GraftOps.renameTable(spark, "fac.decl", "fac.live")
      assert(GraftOps.table(spark, "fac.live").count() === 1)
      val path = s"$wh/fac/live"
      GraftOps.mergeVersionedEvolving(
        Seq((1L, "A", 9.5), (2L, "b", 0.5)).toDF("id", "v", "score"),
        path, "id")
      val got = GraftOps.table(spark, "fac.live")
        .select("id", "v", "score").as[(Long, String, Double)]
        .collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, "A", 9.5), (2L, "b", 0.5)))
    } finally spark.conf.unset("spark.graft.warehouse")
  }
}
