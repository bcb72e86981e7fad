package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: repetition scoring, benchmark
  * decontamination, domain mixing, sequence packing, and incremental
  * (cross-batch) dedup. Extends the reference's text surface
  * (reference has none of these — its scope ends at
  * `/root/reference/src/etl_pipeline.py` aggregates) along the
  * BASELINE.json north star.
  *
  * Scale discipline shared with [[Dedup]]/[[Text]]: per-row work stays
  * in codegen'd `functions._` expressions; joins go through inverted
  * indexes or broadcasts, never a cross join; the only global orderings
  * are declared-semantics anchors with a distributed twin.
  */
object Curate {

  // ------------------------------------------------------------------
  // Repetition signals (Gopher-style quality heuristics)
  // ------------------------------------------------------------------

  /** Per-document repetition signals: duplicate-token fraction,
    * duplicate-2-gram fraction, and the most-frequent-2-gram fraction —
    * the "excessive repetition" family of quality filters from the
    * Gopher corpus pipeline (Rae et al. 2021, §A.1.1). High values mean
    * boilerplate / generated spam; pipelines drop above a threshold.
    *
    * All per-row array expressions — embarrassingly parallel, no
    * shuffle, and safe against optimizer inlining (see [[topRunCount]]
    * for why the top-gram count is a fold, not a nested lambda). This
    * single-projection form still duplicates the `toks`/`grams`
    * subtrees across output columns (a constant ~4× per row);
    * [[withRepetitionSignals]] stages the arrays as named columns so
    * each evaluates once — the declared/pipeline path. The spec asserts
    * the two forms equal.
    */
  def repetitionColumns(text: Column): Seq[Column] = {
    val toks = Text.tokens(text)
    val n = size(toks)
    // bigram list; when-guard also avoids sequence(1, 0) which REVERSES
    // instead of returning empty (Spark sequence semantics)
    val grams = when(n >= 2,
      transform(sequence(lit(1), n - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    val ng = size(grams)
    Seq(
      n.as("n_tokens"),
      ((n - size(array_distinct(toks))).cast(DoubleType) / n)
        .as("dup_token_frac"),
      when(ng > 0, (ng - size(array_distinct(grams))).cast(DoubleType) / ng)
        .otherwise(0.0).as("dup_2gram_frac"),
      when(ng > 0, topRunCount(grams).cast(DoubleType) / ng)
        .otherwise(0.0).as("top_2gram_frac"))
  }

  /** Multiplicity of the most frequent element, as a longest-equal-run
    * fold over the SORTED array. Written this way — not as the obvious
    * `array_max(transform(array_distinct(g), x => size(filter(g, ...))))`
    * — because Spark's higher-order lambdas evaluate INTERPRETED and
    * re-evaluate any non-attribute child expression per element: with
    * the array argument inlined by the optimizer (CollapseProject /
    * filter pushdown substitute alias definitions), the nested form
    * re-runs the whole upstream chain (tokenizer, even a PII regex
    * chain) O(elements) times PER ROW — a measured 500× blowup in the
    * corpus pipeline. Here `aggregate` evaluates the array child once
    * and the lambda touches only the accumulator and the element, so
    * the cost is one O(n log n) sort + O(n) fold per evaluation no
    * matter what the optimizer substitutes into the argument.
    */
  def topRunCount(grams: Column): Column = {
    val folded = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("cur"), lit(0L).as("best")),
      (acc, g) => {
        val cur = when(g === acc.getField("prev"), acc.getField("cur") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), cur.as("cur"),
          greatest(cur, acc.getField("best")).as("best"))
      })
    folded.getField("best")
  }

  /** Staged twin of [[repetitionColumns]]: tokenization and the bigram
    * list land in named `_toks`/`_grams` columns FIRST, and the signal
    * expressions reference those attributes. Because both intermediates
    * are non-cheap and multiply referenced, CollapseProject keeps the
    * projections separate — each array is computed ONCE per row, and the
    * interpreted higher-order lambdas (top-gram counting) touch cheap
    * attributes instead of re-evaluating the tokenizer per element.
    * Same output, ~n× less per-row work than the single-projection
    * anchor on realistic documents.
    */
  def withRepetitionSignals(df: DataFrame, text: Column): DataFrame = {
    // fail fast instead of silently replacing (and for the staging
    // columns, silently DELETING) a caller's same-named columns — this
    // is a public facade path (GraftOps.repetitionSignals)
    val produced = Seq("_toks", "_grams", "n_tokens", "dup_token_frac",
      "dup_2gram_frac", "top_2gram_frac")
    val clash = df.columns.toSet.intersect(produced.toSet)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename them " +
        "before appending repetition signals")
    val staged = df
      .withColumn("_toks", Text.tokens(text))
      .withColumn("_grams",
        when(size(col("_toks")) >= 2,
          transform(sequence(lit(1), size(col("_toks")) - 1), i =>
            concat_ws(" ", element_at(col("_toks"), i),
              element_at(col("_toks"), i + 1))))
          .otherwise(array().cast(ArrayType(StringType))))
    val n = size(col("_toks"))
    val ng = size(col("_grams"))
    val topGram = topRunCount(col("_grams"))
    staged
      .withColumn("n_tokens", n)
      .withColumn("dup_token_frac",
        (n - size(array_distinct(col("_toks")))).cast(DoubleType) / n)
      .withColumn("dup_2gram_frac",
        when(ng > 0,
          (ng - size(array_distinct(col("_grams")))).cast(DoubleType) / ng)
          .otherwise(0.0))
      .withColumn("top_2gram_frac",
        when(ng > 0, topGram.cast(DoubleType) / ng).otherwise(0.0))
      .drop("_toks", "_grams")
  }

  def textRepetition(spark: SparkSession, sfDir: String): DataFrame =
    withRepetitionSignals(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      col("text"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("dup_2gram_frac"), col("top_2gram_frac"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // Benchmark decontamination
  // ------------------------------------------------------------------

  /** Flag corpus documents sharing ≥ `minCommon` distinct word n-grams
    * with any benchmark document — the test-set-overlap decontamination
    * step every LLM data pipeline runs (13-grams at production scale;
    * 3-grams here, proportional to the ~60-token fixture docs).
    *
    * Plan shape for 100 TB: the benchmark suite is tiny relative to the
    * corpus, so its (gram → bench_id) posting list BROADCASTS; the
    * corpus explodes its grams map-side and never shuffles for the
    * join. Only matched rows reach the (doc, bench) count, which
    * aggregates partial+final. Production carries xxhash64(gram) longs
    * instead of strings ([[decontaminateHashed]], same discipline as
    * [[Dedup.ngramPairs]]) — constant-width rows, collision odds
    * ~ matches·2⁻⁶⁴.
    */
  def decontaminate(spark: SparkSession, sfDir: String,
                    benchMod: Int = 25, minCommon: Long = 4): DataFrame =
    contaminatedPairs(
      Tables.parallelize(Tables.documents(spark, sfDir)), benchMod, minCommon,
      hashed = false)

  /** The production variant: grams ride as xxhash64 longs. */
  def decontaminateHashed(spark: SparkSession, sfDir: String,
                          benchMod: Int = 25, minCommon: Long = 4): DataFrame =
    contaminatedPairs(
      Tables.parallelize(Tables.documents(spark, sfDir)), benchMod, minCommon,
      hashed = true)

  /** DataFrame-first core over (doc_id, text) rows. The fixture has no
    * separate benchmark table, so membership is derived from the id
    * (`doc_id % benchMod == 0`); a real deployment passes two tables
    * ([[contaminatedPairsTagged]] via the `GraftOps.decontaminate`
    * facade) and skips the modulo split.
    */
  def contaminatedPairs(input: DataFrame, benchMod: Int, minCommon: Long,
                        hashed: Boolean): DataFrame =
    contaminatedPairsTagged(
      input.select(col("doc_id"), col("text"),
        when(col("doc_id") % benchMod === 0, 0).otherwise(1).as("_side")),
      minCommon, hashed)

  /** Core over (doc_id, text, _side) rows; `_side` 0 = benchmark,
    * 1 = corpus. */
  def contaminatedPairsTagged(input: DataFrame, minCommon: Long,
                              hashed: Boolean): DataFrame = {
    val docs = input.select(col("doc_id"), col("_side"),
      Dedup.shingles(col("text")).as("s"))
    def gram(c: Column): Column = if (hashed) xxhash64(c) else c
    // explode_outer, not explode: for an attribute child Catalyst's
    // InferFiltersFromGenerate would add size(s)>0 ∧ isnotnull(s),
    // substitute the full shingle expression into it, and push it below
    // the parallelize repartition — shingling the whole corpus twice on
    // the single pre-shuffle scan task. Outer generators are exempt;
    // the null rows (empty-shingle docs) are dropped on the cheap
    // post-explode attribute instead.
    val bench = docs.filter(col("_side") === 0)
      .select(col("doc_id").as("bench_id"), explode_outer(col("s")).as("g0"))
      .filter(col("g0").isNotNull)
      .select(col("bench_id"), gram(col("g0")).as("gram"))
    val corpus = docs.filter(col("_side") === 1)
      .select(col("doc_id"), size(col("s")).as("n_grams"),
        explode_outer(col("s")).as("g0"))
      .filter(col("g0").isNotNull)
      .select(col("doc_id"), col("n_grams"), gram(col("g0")).as("gram"))
    corpus.join(broadcast(bench), "gram")
      .groupBy(col("doc_id"), col("bench_id"), col("n_grams"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .select(col("doc_id"), col("bench_id"), col("common"),
        (col("common").cast(DoubleType) / col("n_grams")).as("overlap_frac"))
      .orderBy(col("doc_id"), col("bench_id"))
  }

  // ------------------------------------------------------------------
  // Domain mixing (deterministic stratified sampling)
  // ------------------------------------------------------------------

  /** First 8 md5 hex chars of the salted key — a uniform draw in
    * [0, 2³²) that is identical in Spark and DuckDB (md5 of the same
    * bytes), deterministic, and independent of partitioning. */
  def sampleKey(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast(StringType))), 1, 8)

  /** Keep-threshold for a rate in [0, 1): the 8-hex-digit string the
    * sample key must stay below. Hex strings compare correctly
    * lexicographically (fixed width, 0-9 < a-f). */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate < 1, s"rate must be in [0,1): $rate")
    f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Deterministic stratified (per-stratum rate) sampling — the domain
    * mixing step that rebalances an over-crawled corpus before
    * training. `sample()` is seed+partitioning dependent; this is a
    * pure per-row predicate on a salted hash of the key, so the same
    * row makes the same decision at any parallelism, across reruns,
    * and incrementally as new data arrives. Zero shuffles.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "mix:"): DataFrame = {
    val threshold = rates.foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(rateThreshold(rate))).otherwise(acc)
    }
    df.withColumn("sample_key", sampleKey(col(keyCol), salt))
      .filter(col("sample_key") < threshold)
  }

  /** Declared mix: downweight the over-represented `en` (~44% of the
    * fixture) to 25%, upweight `zh` to 75%, everything else 50%. */
  val MixRates: Map[String, Double] = Map("en" -> 0.25, "zh" -> 0.75)
  val MixDefault: Double = 0.5

  def domainMix(spark: SparkSession, sfDir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, sfDir), "doc_id", "lang",
      MixRates, MixDefault)
      .select(col("doc_id"), col("lang"), col("source"), col("sample_key"))
      .orderBy(col("doc_id"))

  /** Temperature-weighted resampling WITH repetition — the "epochs per
    * domain" half of data mixing that [[stratifiedSample]]'s keep/drop
    * predicate can't express (Gopher/LLaMA-style recipes upsample
    * high-quality domains past 1.0). A domain weight `w` emits
    * `floor(w)` copies of every doc plus one more with probability
    * `frac(w)`, decided by the same salted-md5 uniform as
    * [[sampleKey]]: E[copies] = w exactly, and the decision is a pure
    * per-row function of the key — partition-, rerun- and
    * arrival-order-invariant, so an incremental pipeline resamples new
    * docs consistently with old ones. Output carries `rep_idx`
    * (0-based copy number) so downstream shuffles/packs treat copies
    * as distinct rows.
    *
    * Plan shape: strictly per-row (when-chain + hex compare +
    * `posexplode(sequence)`), zero shuffles before the declared ORDER
    * BY — composes with any downstream keyed op without imposing a
    * partitioning. Docs with 0 copies are filtered BEFORE the sequence
    * (sequence(0, -1) would REVERSE — the [[spans]] guard).
    */
  def temperatureResample(df: DataFrame, keyCol: String, domainCol: String,
                          weights: Map[String, Double], defaultWeight: Double,
                          salt: String = "resample:"): DataFrame = {
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "domain weights must be non-negative")
    def base(w: Double): Long = math.floor(w).toLong
    def frac(w: Double): Double = w - math.floor(w)
    val baseCol = weights.foldLeft(lit(base(defaultWeight))) {
      case (acc, (d, w)) => when(col(domainCol) === d, lit(base(w))).otherwise(acc)
    }
    val fracThresh = weights.foldLeft(lit(rateThreshold(frac(defaultWeight)))) {
      case (acc, (d, w)) =>
        when(col(domainCol) === d, lit(rateThreshold(frac(w)))).otherwise(acc)
    }
    df.withColumn("reps", baseCol +
        when(sampleKey(col(keyCol), salt) < fracThresh, 1L).otherwise(0L))
      .filter(col("reps") > 0)
      .select(col(keyCol), col(domainCol),
        posexplode(sequence(lit(0L), col("reps") - 1L)).as(Seq("rep_idx", "_r")))
      .select(col(keyCol), col(domainCol),
        col("rep_idx").cast(IntegerType).as("rep_idx"))
  }

  /** Declared resample: halve `en` (the over-crawled ~44%), give `zh`
    * 2.5 epochs, everything else exactly 1. */
  val ResampleWeights: Map[String, Double] = Map("en" -> 0.5, "zh" -> 2.5)
  val ResampleDefault: Double = 1.0

  def domainResample(spark: SparkSession, sfDir: String): DataFrame =
    temperatureResample(Tables.documents(spark, sfDir), "doc_id", "lang",
      ResampleWeights, ResampleDefault)
      .orderBy(col("doc_id"), col("rep_idx"))

  // ------------------------------------------------------------------
  // Deterministic corpus shuffle & train/val/test split
  // ------------------------------------------------------------------

  /** 16-hex-char salted md5 prefix — a deterministic pseudo-random sort
    * key (collision odds ~ rows²·2⁻⁶⁴; ties broken by the key column
    * anyway). */
  def shuffleKey(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast(StringType))), 1, 16)

  /** Training-order randomization: a deterministic global shuffle by
    * salted content-key hash. `orderBy` plans as a range exchange +
    * per-partition sort — the scalable global sort; vary `salt` per
    * epoch for a fresh permutation without touching the data. Unlike
    * `df.orderBy(rand())` this is reproducible and re-runnable.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String,
                           salt: String = "shuf:"): DataFrame =
    df.withColumn("shuffle_key", shuffleKey(col(keyCol), salt))
      .orderBy(col("shuffle_key"), col(keyCol))

  def corpusShuffle(spark: SparkSession, sfDir: String): DataFrame =
    deterministicShuffle(Tables.documents(spark, sfDir), "doc_id")
      .select(col("doc_id"), col("shuffle_key"))

  /** Deterministic train/val/test assignment by salted key hash —
    * disjoint, exhaustive, partition-invariant, and STABLE: a document
    * keeps its split across reruns and incremental ingests (the
    * property `randomSplit` lacks), so evaluation data can never leak
    * into training between pipeline runs.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                trainFrac: Double = 0.8, valFrac: Double = 0.1,
                salt: String = "split:"): DataFrame = {
    val k = sampleKey(col(keyCol), salt)
    df.withColumn("split",
      when(k < rateThreshold(trainFrac), "train")
        .when(k < rateThreshold(trainFrac + valFrac), "val")
        .otherwise("test"))
  }

  def dataSplit(spark: SparkSession, sfDir: String): DataFrame =
    hashSplit(Tables.documents(spark, sfDir), "doc_id")
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // Sequence packing (concatenate-and-chunk)
  // ------------------------------------------------------------------

  /** GPT-style sequence packing: concatenate documents in doc_id order
    * and split the token stream into fixed `chunkTokens` context
    * windows; emit each document's (first chunk, last chunk, offset in
    * first chunk). This is the packing layout a pretraining data loader
    * needs to slice documents into training sequences.
    *
    * SEMANTICS ANCHOR (this method): a global running sum over doc_id —
    * a single-partition window, trivially correct, used by specs to
    * cross-check. The DECLARED/benched path is [[seqPackDist]] /
    * [[packChunksDistributed]]: the same numbers via a two-phase
    * distributed prefix sum.
    */
  def seqPack(spark: SparkSession, sfDir: String,
              chunkTokens: Int = 256): DataFrame = {
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkColumns(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          Text.tokenCount(col("text")).cast(LongType).as("n_tokens"))
        .withColumn("cum_before",
          sum(col("n_tokens")).over(w) - col("n_tokens")),
      chunkTokens)
  }

  /** Distributed twin: range-partition by doc_id, per-partition running
    * sums in parallel windows, then lift to global offsets via the
    * per-partition totals — a two-phase prefix sum ([[Prefix]]). The
    * totals table is one row per partition (broadcast join); no global
    * sort or single-partition window anywhere.
    */
  def packChunksDistributed(docs: DataFrame, chunkTokens: Int = 256,
                            partitions: Int = 0): DataFrame = {
    val (base, _) = Prefix.withOffsets(
      docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast(LongType).as("n_tokens")),
      Seq(col("doc_id")), col("n_tokens"), partitions)
    val wp = Window.partitionBy(col("_pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkColumns(
      base.withColumn("cum_before",
        col("_offset") + sum(col("n_tokens")).over(wp) - col("n_tokens")),
      chunkTokens)
  }

  /** The DECLARED/benched packing entry: the distributed twin over the
    * documents table — the plan you'd run at 100 TB, checked against the
    * same running-sum oracle as [[seqPack]] (identical output).
    */
  def seqPackDist(spark: SparkSession, sfDir: String,
                  chunkTokens: Int = 256): DataFrame =
    packChunksDistributed(Tables.documents(spark, sfDir), chunkTokens)

  /** Shared chunk arithmetic over (doc_id, n_tokens, cum_before). */
  private def chunkColumns(df: DataFrame, chunkTokens: Int): DataFrame = {
    val c = lit(chunkTokens.toDouble)
    df.select(
      col("doc_id"),
      col("n_tokens"),
      floor(col("cum_before") / c).cast(LongType).as("chunk_first"),
      floor((col("cum_before") + col("n_tokens") - 1) / c).cast(LongType)
        .as("chunk_last"),
      (col("cum_before") % lit(chunkTokens.toLong)).as("chunk_offset"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // Incremental (cross-batch) dedup
  // ------------------------------------------------------------------

  /** New-rows-only filter for incremental ingest: which `batch` rows'
    * content does NOT already exist in `existing`? The 100 TB pattern:
    * build a Bloom filter over the existing corpus' content
    * fingerprints ONCE (one aggregation pass; reusable across many
    * batches), broadcast it, and drop the batch's definite-misses
    * map-side — only might-contain hits (true dups + fpp false
    * positives) pay the exact anti-join. The result is EXACT: false
    * positives are eliminated by the confirm join, and Bloom filters
    * have no false negatives.
    *
    * Sizing: ~1.2 GB per 10⁹ fingerprints at 1% fpp — a large but
    * standard broadcast; shard the filter per key range if executor
    * memory is tighter than that.
    *
    * The build and probe are Spark's NATIVE Bloom expressions
    * ([[graft.functions.BloomNative]]): the filter rides the plan as a
    * scalar subquery and the probe stays in whole-stage codegen — no
    * Scala UDF, no manual broadcast. Null-content batch rows are NEW by
    * definition (null never equals any existing content), which the
    * confirm anti-join implements for free.
    */
  def incrementalNew(existing: DataFrame, batch: DataFrame, contentCol: String,
                     expectedItems: Long = 1L << 20,
                     fpp: Double = 0.01): DataFrame = {
    val fp = md5(col(contentCol))
    val bloom = graft.functions.BloomNative.bloomOf(
      existing, fp, expectedItems, fpp)
    val tagged = batch.withColumn("_maybe",
      graft.functions.BloomNative.mightContain(existing.sparkSession, bloom, fp))
    val definiteNew = tagged.filter(!col("_maybe")).drop("_maybe")
    val confirmed = tagged.filter(col("_maybe")).drop("_maybe")
      .join(existing.select(col(contentCol)).distinct(), Seq(contentCol), "left_anti")
    definiteNew.unionByName(confirmed)
  }

  /** Declared split: rows with `doc_id % batchMod == 0` arrive as the
    * new batch; the rest are the already-ingested corpus. */
  def dedupIncremental(spark: SparkSession, sfDir: String,
                       batchMod: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    incrementalNew(
      existing = docs.filter(col("doc_id") % batchMod =!= 0),
      batch = docs.filter(col("doc_id") % batchMod === 0),
      contentCol = "text")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // Duplicate-span detection (exact-substring dedup signal)
  // ------------------------------------------------------------------

  /** Overlapping n-token spans of a text column, WITH multiplicity and
    * in position order — unlike [[Dedup.shingles]], which is a distinct
    * set. The unit of exact-substring duplication measurement (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22 — their 50-token spans, at a fixture-friendly n).
    * `sequence(a, b)` REVERSES when a > b, so short docs are guarded
    * explicitly to an empty array.
    */
  def spans(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n, Dedup.slidingConcat(toks, n))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Per-document duplicate-span counts: how many of a doc's n-token
    * spans occur more than once in the whole corpus (boilerplate,
    * templated text, verbatim copies that survive doc-level dedup).
    *
    * Plan shape (mirrors [[Text.termRelevanceOf]]): one explode pass →
    * (doc, span) partial+final count `m` → corpus frequency via a
    * sum-window keyed by the span (NOT a join back onto the span
    * aggregate, which would evaluate the scan+explode twice) → per-doc
    * rollup. Three shuffles, each on a corpus-cardinality key; the
    * window's per-group state is bounded by the number of DISTINCT
    * docs containing the span, not its total multiplicity. `hashed`
    * shuffles xxhash64 longs instead of span strings — the production
    * setting (collision odds ~ spans²·2⁻⁶⁴); the declared query keeps
    * strings so the DuckDB oracle sees identical keys.
    */
  def dupSpanCounts(docs: DataFrame, n: Int = 8,
                    hashed: Boolean = false): DataFrame = {
    def gram(c: Column): Column = if (hashed) xxhash64(c) else c
    val grams = docs
      .select(col("doc_id"), explode_outer(spans(col("text"), n)).as("g0"))
      .filter(col("g0").isNotNull)
      .select(col("doc_id"), gram(col("g0")).as("gram"))
    val perDocSpan = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("m"))
    perDocSpan
      .withColumn("freq", sum(col("m")).over(Window.partitionBy(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("total_spans"),
        sum(when(col("freq") > 1, col("m")).otherwise(0L)).as("dup_spans"))
      .orderBy(col("doc_id"))
  }

  def dupSpans(spark: SparkSession, sfDir: String): DataFrame =
    dupSpanCounts(Tables.parallelize(Tables.documents(spark, sfDir)))

  /** Production twin: span keys ride as longs. Spec-asserted equal to
    * the declared string form. */
  def dupSpansHashed(spark: SparkSession, sfDir: String): DataFrame =
    dupSpanCounts(Tables.parallelize(Tables.documents(spark, sfDir)),
      hashed = true)

  // ------------------------------------------------------------------
  // Stratified quota sampling (exact n per stratum)
  // ------------------------------------------------------------------

  /** 60-bit salted md5 prefix as a LONG — the numeric twin of
    * [[sampleKey]], for operators that need a numeric order column.
    * Oracle SQL equivalent:
    * `CAST('0x' || substr(md5('salt' || CAST(k AS VARCHAR)), 1, 15) AS BIGINT)`.
    */
  def quotaKey(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast(StringType))), 1, 15),
      16, 10).cast(LongType)

  /** Deterministic EXACT-n-per-stratum sample (quota sampling) — the
    * complement of rate-based [[stratifiedSample]]: build an eval slice
    * of exactly n docs per language, a labeling batch of n per source,
    * etc. Keeps the n rows with the LARGEST salted-hash keys per
    * stratum — a uniform draw that is partition- and rerun-invariant.
    *
    * Runs on the custom bounded-heap operator
    * ([[graft.plans.GroupedTopK]]): O(rows·log n) single pass +
    * partial/final planning, so the shuffle carries ≤ partitions ×
    * strata × n rows — no per-stratum sort, no full-input shuffle. The
    * `row_number` window formulation (the oracle's) sorts every
    * stratum's full row set instead.
    */
  def stratifiedQuota(df: DataFrame, keyCol: String, stratumCol: String,
                      n: Int, salt: String = "quota:"): DataFrame =
    graft.plans.GroupedTopK.of(
      df.withColumn("skey", quotaKey(col(keyCol), salt)),
      Seq(stratumCol), "skey", n)

  def stratifiedQuotaQuery(spark: SparkSession, sfDir: String,
                           n: Int = 20): DataFrame =
    stratifiedQuota(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")),
      "doc_id", "lang", n)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  // ------------------------------------------------------------------
  // Exact duplicate-span REMOVAL (the rewrite step dupSpans only counts)
  // ------------------------------------------------------------------

  /** Rewrite each document with corpus-duplicate spans REMOVED — the
    * "remove the duplicate, keep one copy" half of exact-substring
    * dedup (Lee et al. ACL'22 §3.1 drop all-but-one occurrence;
    * [[dupSpanCounts]] is the measurement half). Documents are cut into
    * NON-overlapping `n`-token segments; a segment survives iff it is
    * the globally first occurrence of its exact text in
    * (doc_id, seg_idx) order; the trailing `len % n` tokens are always
    * kept. Output per doc: segment/kept counts and the re-assembled
    * scrubbed text.
    *
    * Plan: one scan+explode to (doc, seg_idx, segment) → first-writer
    * marking via a `row_number` window keyed on the segment text (state
    * per group = 1 row; shuffle key = segment content, the same key an
    * exact-dedup shuffle uses) → per-doc re-assembly via
    * `array_sort(collect_list(struct(idx, seg)))` (order restored
    * after the shuffle, so the window's partitioning never constrains
    * re-assembly). Production twin would shuffle xxhash64(segment)
    * longs, as in [[dupSpansHashed]]; declared form keeps strings so
    * the oracle sees identical keys.
    */
  def spanScrub(docs: DataFrame, n: Int = 8): DataFrame = {
    // stage the token array as a (multiply-referenced, so never
    // collapse-inlined) column: the segment lambda below then slices an
    // ATTRIBUTE per element instead of re-running the tokenizer per
    // element (see [[topRunCount]] for the hazard)
    val toks = col("_toks")
    val nSegs = floor(size(toks) / n).cast(IntegerType)
    // non-overlapping segment k covers 1-based tokens [k*n+1, k*n+n]
    val segs = when(size(toks) >= n,
      transform(sequence(lit(0), nSegs - 1),
        k => concat_ws(" ", slice(toks, k * n + 1, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
    // trailing `len % n` tokens, kept verbatim
    val remainder = concat_ws(" ",
      slice(toks, nSegs * n + 1, size(toks) - nSegs * n))

    val exploded = docs
      .withColumn("_toks", split(col("text"), " "))
      .withColumn("rem", remainder)
      .select(col("doc_id"), col("rem"),
        posexplode_outer(segs).as(Seq("seg_idx", "segment")))
    val marked = exploded.withColumn("rn",
      row_number().over(
        Window.partitionBy(col("segment"))
          .orderBy(col("doc_id"), col("seg_idx"))))
    marked
      .groupBy(col("doc_id"))
      .agg(
        count(col("segment")).as("n_segs"),
        count(when(col("segment").isNotNull && col("rn") === 1, lit(1)))
          .as("kept_segs"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("segment").isNotNull && col("rn") === 1,
                struct(col("seg_idx"), col("segment"))))),
            s => s.getField("segment")),
          " ").as("kept_text"),
        max(col("rem")).as("rem"))
      .select(col("doc_id"), col("n_segs"), col("kept_segs"),
        // concat_ws skips NULLs on both engines; '' sentinels avoid a
        // stray separator when either side is empty
        concat_ws(" ",
          when(col("kept_text") =!= "", col("kept_text")),
          when(col("rem") =!= "", col("rem"))).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  def spanScrubQuery(spark: SparkSession, sfDir: String): DataFrame =
    spanScrub(Tables.parallelize(Tables.documents(spark, sfDir)))

  // ------------------------------------------------------------------
  // Overlapping token-window chunking (RAG / context-window prep)
  // ------------------------------------------------------------------

  /** Cut each document into overlapping `window`-token chunks advanced
    * by `stride` tokens — the standard context-window preparation for
    * retrieval corpora and long-document pretraining (the overlapping
    * complement of [[seqPack]]'s disjoint packing; `window - stride`
    * tokens of overlap preserve cross-boundary context). Chunk starts
    * are 0, stride, 2·stride, …; the last start is the smallest
    * multiple of `stride` with start + window ≥ n, so the tail is
    * always covered and no chunk starts past the text. Docs shorter
    * than one window yield exactly one (short) chunk.
    *
    * Output per (doc, chunk): 0-based `chunk_idx`, 1-based `tok_start`,
    * the chunk's own `n_toks` (= window except a short tail), and the
    * re-joined `chunk_text`.
    *
    * Plan shape: strictly per-row — tokenize once into a staged column,
    * `posexplode` a `sequence(0, n_chunks−1)`, then slice/join per
    * chunk. ZERO shuffles before the declared-semantics ORDER BY; at
    * 100 TB this is a map-only pass whose output is input ×
    * (window/stride) amplification, and the chunker composes with any
    * downstream keyed op without imposing a partitioning.
    *
    * Oracle-exact by construction: pure integer arithmetic + string
    * slicing, no floats anywhere (the chunk-count ceil is integer
    * `(n − window + stride − 1) div stride`).
    */
  def docChunk(docs: DataFrame, window: Int = 32, stride: Int = 24)
      : DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = col("_toks")
    val n = size(toks)
    // integer ceil((n - window) / stride) + 1 — `div` keeps the whole
    // formula integral (Column./ would detour through doubles); clamped
    // to 1 chunk for docs that fit a single window (sequence(0, -k)
    // would REVERSE — see the spans() guard)
    val nChunks = when(n <= window, lit(1L)).otherwise(
      expr(s"(size(_toks) - ${window - stride + 1}) div $stride") + lit(1L))
    docs
      .withColumn("_toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), nChunks.cast(IntegerType) - 1))
          .as(Seq("chunk_idx", "_k")),
        col("_toks"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast(IntegerType).as("chunk_idx"),
        (col("_k") * stride + 1).cast(IntegerType).as("tok_start"),
        least(lit(window), size(toks) - col("_k") * stride)
          .cast(IntegerType).as("n_toks"),
        concat_ws(" ", slice(toks, col("_k") * stride + 1, lit(window)))
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Declared query: 32-token windows, 24-token stride (8 overlap). */
  def docChunkQuery(spark: SparkSession, sfDir: String): DataFrame =
    docChunk(Tables.parallelize(Tables.documents(spark, sfDir)))
}
