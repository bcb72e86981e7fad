package graft.pipeline

import graft.Tables
import graft.ops.{Components, Curate, Dedup, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the LLM-data analog of the
  * reference's medallion ETL ([[Medallion]]): every north-star curation
  * operator composed into one runnable pipeline, raw documents in,
  * training-ready splits + packing layout out.
  *
  * Stage order mirrors production corpus pipelines: redact first (so
  * nothing downstream sees raw PII), then per-doc quality gates (cheap,
  * row-parallel), then corpus-level dedup (exact → near-dup clusters),
  * then benchmark decontamination, then the sampling/split/packing
  * layout steps that feed a trainer.
  *
  * Layers communicate only through the returned DataFrames and the
  * written parquet — each stage restartable, same contract as the
  * medallion layers (SURVEY §3).
  */
object CorpusPipeline {

  /** Run curation over the fixture `documents` table; write the curated
    * corpus partitioned by split under `outDir`; return ordered
    * per-stage row counts (the reference pipeline's stage-count logging,
    * `/root/reference/src/etl_pipeline.py:53,78,81`, as data).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          chunkTokens: Int = 256): Seq[(String, Long)] = {
    // every cached stage registers here; the finally block frees them on
    // ANY exit — without it, an exception between a cache() and the end
    // of the run leaks the cached blocks for the rest of the session
    // (Verify sweeps persistent RDDs between queries, but direct library
    // callers have no such sweeper)
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def tracked(df: DataFrame): DataFrame = { cached += df.cache(); df }
    try runTracked(spark, sfDir, outDir, chunkTokens, tracked)
    finally cached.foreach(_.unpersist(blocking = false))
  }

  private def runTracked(spark: SparkSession, sfDir: String, outDir: String,
                         chunkTokens: Int,
                         cache: DataFrame => DataFrame): Seq[(String, Long)] = {
    // the documents quality battery rides THIS pass via observe — the
    // feed's health metrics compute inside the actions the pipeline
    // already runs (no second scan) and land in the returned counts
    val (raw, docQuality) = Quality.observedDocuments(
      Tables.parallelize(Tables.documents(spark, sfDir)))

    // 1. PII scrub — redact, keep audit counts out of the hot path
    val scrubbed = raw.select(
      (Seq(col("doc_id"), col("lang"), col("source")) ++
        Text.piiScrubColumns(col("text"))): _*)
      .withColumnRenamed("clean_text", "text")
      .drop("n_emails", "n_urls", "n_numbers")

    // 2. Per-doc quality gates: sketch-cutoff stopword-ratio filter
    //    (the production path — no global sort) + repetition caps
    // cache the SIGNALS frame, not the gated one: the gate predicate
    // otherwise pushes below the projections with the signal
    // definitions substituted in, re-deriving scrub+tokenize at the
    // scan for every row (and the cache also serves qualityFilterApprox,
    // which reads the frame twice: cutoff agg + filter)
    val sig = cache(Curate.withRepetitionSignals(
      scrubbed.select(col("doc_id"), col("lang"), col("source"), col("text")),
      col("text")))
    val rep = sig
      .filter(col("dup_token_frac") < 0.999 && col("top_2gram_frac") < 0.9)
      .select("doc_id", "lang", "source", "text")
    // cache the stage anchors: the per-stage counts below and the two
    // writes are separate actions, and without a cache each one re-runs
    // the whole upstream chain — the reference's triple-count()
    // recompute antipattern (`/root/reference/src/utils.py:26,34,48`,
    // called out in SURVEY §4) scaled up to the priciest stages (PII
    // regex + repetition signals are interpreted higher-order exprs).
    // One cache per surviving stage = each stage computes once.
    val quality = cache(Text.qualityFilterApprox(rep, dropBelow = 0.2)
      .select(col("doc_id")).join(rep, "doc_id"))

    // 3. Exact dedup (first-writer-wins), then near-dup clusters: keep
    //    only each cluster's canonical (minimum-id) document
    val exact = Dedup.exactDedup(quality, "text", "doc_id")
    val pairs = Dedup.ngramPairs(exact.select(col("doc_id"), col("text")))
      .select(col("doc1").as("u"), col("doc2").as("v"))
    val roots = Components.connectedComponents(pairs) // (node, root)
    val canonical = cache(exact.join(
      roots.filter(col("node") =!= col("root")).select(col("node").as("doc_id")),
      Seq("doc_id"), "left_anti"))

    // 4. Benchmark decontamination (fixture benchmark = doc_id % 25)
    val contaminated = Curate.contaminatedPairsTagged(
      canonical.select(col("doc_id"), col("text"),
        when(col("doc_id") % 25 === 0, 0).otherwise(1).as("_side")),
      minCommon = 4, hashed = true)
      .select(col("doc_id")).distinct()
    val clean = cache(canonical.join(contaminated, Seq("doc_id"), "left_anti"))

    // 5. Domain mix → stable split assignment → per-epoch shuffle order
    val mixed = Curate.stratifiedSample(clean, "doc_id", "lang",
      Curate.MixRates, Curate.MixDefault).drop("sample_key")
    val split = Curate.hashSplit(mixed, "doc_id")
    val shuffled = cache(split
      .withColumn("shuffle_key", Curate.shuffleKey(col("doc_id"), "epoch0:")))

    // 6. Packing layout for the train split (token-stream chunking in
    //    shuffle order — distributed prefix sum, no global window)
    val train = shuffled.filter(col("split") === "train")
    // pack by a UNIQUE key: shuffle_key alone can collide (md5 prefix),
    // which would make per-partition window tie order — and thus
    // chunk_first/chunk_offset — nondeterministic. Appending the
    // zero-padded doc_id preserves shuffle order and breaks ties the
    // same way deterministicShuffle does.
    val packed = Curate.packChunksDistributed(
      train.select(
        concat(col("shuffle_key"),
          lpad(col("doc_id").cast("string"), 20, "0")).as("doc_id"),
        col("text")), chunkTokens)

    // 7. Persist: corpus partitioned by split; packing layout alongside
    shuffled.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")
    packed.write.mode("overwrite").parquet(s"$outDir/train_packing")

    val out = spark.read.parquet(s"$outDir/corpus")
    val counts = Seq(
      "01_raw" -> raw.count(),
      "02_quality" -> quality.count(),
      "03_exact_dedup" -> exact.count(),
      "04_canonical" -> canonical.count(),
      "05_decontaminated" -> clean.count(),
      "06_mixed" -> mixed.count(),
      "07_written" -> out.count(),
      "08_train" -> out.filter(col("split") === "train").count(),
      "09_train_chunks" ->
        (spark.read.parquet(s"$outDir/train_packing")
          .agg(max(col("chunk_last"))).head.getLong(0) + 1))
    // observed on the pass above ("01_raw"'s count ran the plan); the
    // battery rows ride the same artifact as the stage counts
    val q = docQuality.get
    counts ++ Seq(
      "10_q_empty_text" -> q("empty_text_rows").asInstanceOf[Long],
      "11_q_null_key" -> q("null_key_rows").asInstanceOf[Long],
      "12_q_bad_lang" -> q("bad_lang_rows").asInstanceOf[Long],
      "13_q_min_chars" -> q("min_chars").asInstanceOf[Long],
      "14_q_max_chars" -> q("max_chars").asInstanceOf[Long],
      "15_q_lang_est" -> q("lang_est").asInstanceOf[Long])
  }
}

/** CLI: runMain graft.pipeline.CorpusMain <sfDir> <outDir> */
object CorpusMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-corpus-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      CorpusPipeline.run(spark, sfDir, outDir).foreach { case (stage, n) =>
        println(s"[graft] $stage: $n rows")
      }
      println(f"[graft] corpus pipeline complete in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(out: $outDir)")
    } catch {
      case e: Throwable =>
        System.err.println(s"[graft] corpus pipeline FAILED: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
