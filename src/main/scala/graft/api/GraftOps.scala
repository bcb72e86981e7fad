package graft.api

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** DataFrame-first library facade: every operator over YOUR columns, not
  * the fixture schema. Thin renames into the `graft.ops` cores — no
  * extra plan nodes beyond a projection (collapsed by Catalyst).
  *
  * Example:
  * {{{
  *   import graft.api.GraftOps._
  *   val unique = dedupExact(crawl, contentCol = "body", keepLowest = "url_id")
  *   val nearDups = ngramNearDups(crawl, idCol = "url_id", textCol = "body", threshold = 0.8)
  *   val knn = cosineTopK(corpus, probes, idCol = "id", vecCol = "emb", k = 10)
  * }}}
  */
object GraftOps {

  /** Drop duplicate rows by content, keeping the smallest `keepLowest`. */
  def dedupExact(df: DataFrame, contentCol: String, keepLowest: String): DataFrame =
    Dedup.exactDedup(df, contentCol, keepLowest)

  /** Near-duplicate id pairs by word-n-gram Jaccard ≥ threshold. */
  def ngramNearDups(df: DataFrame, idCol: String, textCol: String,
                    threshold: Double = 0.5, maxDf: Int = 1000): DataFrame =
    Dedup.ngramPairs(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      threshold, maxDf)

  /** MinHash-LSH candidate id pairs (band collision). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bands: Int = 4): DataFrame =
    Dedup.minhashCandidates(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      numHashes, bands)

  /** SimHash id pairs within a Hamming-distance bound. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      maxHamming)

  /** Embedding-cosine near-dup id pairs ≥ threshold (multi-table LSH +
    * exact re-rank). `vecCol` may be array<float> or array<double>.
    */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.4, tables: Int = 8,
                     planes: Int = 6, maxBucket: Int = 1000): DataFrame =
    Dedup.cosinePairs(
      df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v")),
      threshold, tables, planes, maxBucket)

  /** Duplicate clusters from any id-pair frame: every id that appears in
    * a pair gets its connected component's minimum id as `root`
    * (alternating large-star/small-star contraction —
    * `graft.ops.Components`). Join back and `coalesce(root, id)` to
    * label a full table.
    */
  def dupClusters(pairs: DataFrame, id1Col: String, id2Col: String): DataFrame =
    graft.ops.Components.connectedComponents(
      pairs.select(col(id1Col).as("u"), col(id2Col).as("v")))

  /** PII scrub columns (clean_text + per-category redaction counts)
    * appended to the frame — emails, URLs, long digit runs, in that
    * fixed order (see `graft.ops.Text.piiScrubColumns`).
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame =
    df.select((df.columns.map(col).toSeq ++
      graft.ops.Text.piiScrubColumns(col(textCol))): _*)

  /** Quantile quality gate at scale: drop the worst `dropBelow` fraction
    * of rows by stopword-ratio score using a percentile sketch cutoff —
    * no global sort (see `graft.ops.Text.qualityFilterApprox`).
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
                    langCol: String, dropBelow: Double = 0.2): DataFrame =
    graft.ops.Text.qualityFilterApprox(
      df.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(textCol).as("text")), dropBelow)

  /** Point-in-interval range join on a long-valued domain with no equi
    * key — bucketized so it plans as an equi-join on bucket id instead
    * of a BroadcastNestedLoopJoin (see `graft.ops.RangeJoin`).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame =
    graft.ops.RangeJoin.pointInInterval(points, intervals,
      pointCol, loCol, hiCol, bucketWidth)

  /** Cluster a frame along the Z-curve of two numeric columns before a
    * write (the Delta OPTIMIZE ZORDER analog; native interleave-bits
    * key, `graft.functions.ZOrderKey`).
    */
  def zorderCluster(df: DataFrame, c1: String, c2: String): DataFrame =
    graft.functions.ZOrderKey.clusterBy(df, c1, c2)

  /** Per-row text quality signals appended to the frame (length, token
    * stats, punctuation density, stopword ratio).
    */
  def textQuality(df: DataFrame, textCol: String): DataFrame =
    df.select((df.columns.map(col).toSeq ++
      graft.ops.Text.qualityColumns(col(textCol))): _*)

  /** Stopword-evidence language scores + argmax prediction appended. */
  def langId(df: DataFrame, textCol: String): DataFrame =
    df.select((df.columns.map(col).toSeq ++
      graft.ops.Text.langIdColumns(col(textCol))): _*)

  /** Regex pre-token count appended (BPE-style pre-tokenizer — letter
    * runs | digit runs | single glyph; see `graft.ops.Text.BpePattern`).
    */
  def bpeTokenCount(df: DataFrame, textCol: String,
                    as: String = "n_re_tokens"): DataFrame =
    df.withColumn(as,
      size(regexp_extract_all(col(textCol),
        lit(graft.ops.Text.BpePattern), lit(0))).cast("long"))

  /** Learn a BPE merge table from a corpus (one distributed aggregation
    * per merge; only the winning pair returns to the driver).
    */
  def bpeLearn(df: DataFrame, textCol: String,
               numMerges: Int): Seq[(String, String)] =
    graft.ops.Bpe.learnMerges(df, textCol, numMerges)

  /** Pre-token and learned-BPE piece counts per row (native
    * `graft.functions.BpePieces` segmentation with the given merge
    * table).
    */
  def bpePieceCount(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)] = graft.ops.Bpe.DefaultMerges): DataFrame =
    graft.ops.Bpe.tokenBpeLearnedOf(df, idCol, textCol, merges)

  /** Top-k rows per group by a numeric column, via the custom
    * bounded-heap physical operator (`graft.plans.GroupedTopK`):
    * O(n log k) single pass, no per-partition sort. Row order is
    * unspecified; ties at the k boundary resolve arbitrarily.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCol: String, k: Int): DataFrame =
    graft.plans.GroupedTopK.of(df, groupCols, orderCol, k)

  /** As-of (point-in-time) join over caller columns — see
    * `graft.ops.AsOf.asofJoin` for semantics and the union+window plan.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               leftTie: String, rightTie: String,
               rightValueCols: Seq[String]): DataFrame =
    graft.ops.AsOf.asofJoin(left, right, leftKey, rightKey,
      leftTime, rightTime, leftTie, rightTie, rightValueCols)

  /** Gap-based sessionization over caller columns (batch; for the
    * streaming twin see `graft.streaming.Sessionize.sessionStream`).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCol: String,
                 gapSeconds: Long = 1800L): DataFrame =
    graft.streaming.Sessionize.sessionsOf(df, keyCol, tsCol, tieCol, valueCol, gapSeconds)

  /** Top-k most frequent values of a column via the bounded-memory
    * Misra–Gries sketch (see `graft.functions.MisraGries`).
    */
  def heavyHitters(df: DataFrame, valueCol: String,
                   k: Int = 10, capacity: Int = 256): DataFrame =
    df.agg(graft.functions.MisraGries
        .heavyHitters(df.sparkSession,
          col(valueCol).cast(StringType), k, capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.token").as("value"), col("h.est").as("occurrences"))

  /** Per-group quantiles of a numeric column via the log-binned
    * mergeable sketch (`graft.functions.DdSketch`): guaranteed
    * relative error `alpha`, state O(log range / alpha) per group —
    * the heavy-tailed-domain member of the sketch family. Returns one
    * row per (group, p) with the estimate and the group count.
    */
  def sketchQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
                      alpha: Double = 0.01): DataFrame = {
    val state = df.groupBy(col(groupCol))
      .agg(graft.functions.DdSketch
        .sketch(df.sparkSession, col(valueCol), alpha).as("sk"))
      .select(col(groupCol), explode(col("sk")).as("cell"))
      .select(col(groupCol), col("cell.bin").as("bin"), col("cell.n").as("n"))
    graft.ops.Sketches.ddQuantilesFromBinned(state, groupCol, alpha, ps,
      countName = "n_values")
  }

  /** Gopher-style repetition signals appended to the frame (duplicate
    * token / duplicate-bigram / top-bigram fractions — the staged
    * `graft.ops.Curate.withRepetitionSignals`, which evaluates each
    * intermediate array once per row).
    */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame =
    graft.ops.Curate.withRepetitionSignals(df, col(textCol))

  /** Benchmark decontamination: (doc, benchmark) pairs sharing at least
    * `minCommon` distinct word 3-grams. The benchmark side broadcasts;
    * grams ride as xxhash64 longs (`graft.ops.Curate`).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    minCommon: Long = 4): DataFrame = {
    val tagged = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("_side", lit(1))
      .unionByName(benchmark
        .select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .withColumn("_side", lit(0)))
    // reuse the modulo-split core by tagging: side 0 = benchmark
    graft.ops.Curate.contaminatedPairsTagged(tagged, minCommon, hashed = true)
  }

  /** Deterministic per-stratum-rate sampling (domain mixing): a pure
    * predicate on a salted hash of the key — partition-invariant,
    * rerun-stable, no shuffle (`graft.ops.Curate.stratifiedSample`).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame =
    graft.ops.Curate.stratifiedSample(df, keyCol, stratumCol, rates, defaultRate)

  /** Deterministic EXACT-n-per-stratum sample (quota sampling): the n
    * rows with the largest salted-hash keys per stratum, via the
    * bounded-heap GroupedTopK operator — no per-stratum sort, shuffle
    * carries ≤ partitions × strata × n rows (`graft.ops.Curate`).
    */
  def stratifiedQuota(df: DataFrame, keyCol: String, stratumCol: String,
                      n: Int, salt: String = "quota:"): DataFrame =
    graft.ops.Curate.stratifiedQuota(df, keyCol, stratumCol, n, salt)

  /** Per-row duplicate-span counts (exact-substring dedup signal, Lee
    * et al. ACL'22): of each row's n-token spans, how many occur more
    * than once in the whole corpus. Span keys ride as xxhash64 longs
    * (`graft.ops.Curate.dupSpanCounts`).
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 8): DataFrame =
    graft.ops.Curate.dupSpanCounts(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      n, hashed = true)

  /** Unordered key pairs at edit distance exactly 1 (typo-level fuzzy
    * dedup / entity resolution), via SymSpell deletion-neighborhood
    * blocking — one shuffle on the variant key, no all-pairs scan
    * (`graft.ops.Dedup.fuzzyPairs`).
    */
  def fuzzyKeyPairs(df: DataFrame, keyCol: String,
                    maxBucket: Int = 1000): DataFrame =
    graft.ops.Dedup.fuzzyPairs(df, keyCol, maxBucket)

  /** Sequence-packing layout (concatenate-and-chunk): each row's first
    * chunk, last chunk, and offset when the corpus token stream is split
    * into `chunkTokens` windows in `idCol` order. Distributed two-phase
    * prefix sum — no global window (`graft.ops.Curate`).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int = 2048): DataFrame =
    graft.ops.Curate.packChunksDistributed(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")), chunkTokens)

  /** Reproducible global shuffle (training-order randomization): sort
    * by a salted hash of the key; vary `salt` per epoch for a fresh
    * permutation (`graft.ops.Curate.deterministicShuffle`).
    */
  def shuffleCorpus(df: DataFrame, keyCol: String,
                    salt: String = "shuf:"): DataFrame =
    graft.ops.Curate.deterministicShuffle(df, keyCol, salt)

  /** Deterministic train/val/test split column by salted key hash —
    * disjoint, exhaustive, stable across reruns and incremental ingests
    * (`graft.ops.Curate.hashSplit`).
    */
  def hashSplit(df: DataFrame, keyCol: String,
                trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame =
    graft.ops.Curate.hashSplit(df, keyCol, trainFrac, valFrac)

  /** Incremental-ingest dedup: batch rows whose `contentCol` is not in
    * `existing` — Bloom pre-filter (no false negatives) + exact confirm
    * anti-join on the hits only (`graft.ops.Curate.incrementalNew`).
    */
  def newRowsOnly(existing: DataFrame, batch: DataFrame, contentCol: String,
                  expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame =
    graft.ops.Curate.incrementalNew(existing, batch, contentCol, expectedItems, fpp)

  /** Top-k distinctive terms per document by df-normalized term
    * frequency (TF-IDF-style keyword extraction; rational score).
    */
  def termRelevance(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame =
    graft.ops.Text.termRelevanceOf(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")), k)

  /** Per-label, per-dimension embedding centroids as (label, pos,
    * centroid, vectors) rows — exact decimal accumulation, partition
    * -order independent.
    */
  def embeddingCentroids(df: DataFrame, labelCol: String,
                         vecCol: String): DataFrame =
    Similarity.embeddingCentroidsOf(
      df.select(col(labelCol).as("label"), col(vecCol).as("embedding")))

  /** Manual salted equi-join for hot probe keys beyond AQE's skew
    * splitting; row-identical to the plain join.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String, salt: Int = 8): DataFrame =
    graft.ops.Skew.saltedJoin(probe, build, probeKey, buildKey, salt)

  /** Commit-manifest table write: the whole refresh becomes visible
    * atomically (or not at all); previous versions stay readable.
    */
  def writeVersioned(df: DataFrame, path: String,
                     partitionCols: Seq[String] = Nil,
                     statsCols: Seq[String] = Nil): Long =
    graft.pipeline.ManifestTable.write(df, path, partitionCols,
      statsCols = statsCols)

  /** Transactional append to a manifest table: the new version reads
    * the previous version's files plus this batch's — atomic, previous
    * versions untouched. With `idempotencyTag` set (e.g. a streaming
    * batch id), replaying the same tag is a no-op — the exactly-once
    * sink pattern (`graft.pipeline.ManifestTable.appendIdempotent`).
    */
  def appendVersioned(df: DataFrame, path: String,
                      idempotencyTag: String = null,
                      statsCols: Seq[String] = Nil): Long =
    if (idempotencyTag == null)
      graft.pipeline.ManifestTable.append(df, path, statsCols = statsCols)
    else
      graft.pipeline.ManifestTable.appendIdempotent(df, path, idempotencyTag,
        statsCols = statsCols)

  /** Stats-pruned read of a manifest table: only files whose recorded
    * per-file [min, max] for `column` intersects [lower, upper] are
    * scanned (Delta-style data skipping; sound — files without stats
    * are kept). Pair with a range-clustered `writeVersioned(...,
    * statsCols = ...)`.
    */
  def readVersionedRange(spark: org.apache.spark.sql.SparkSession,
                         path: String, column: String,
                         lower: Double, upper: Double): DataFrame =
    graft.pipeline.ManifestTable.readNumericRange(spark, path, column,
      lower, upper)

  /** Row-level insert/delete change feed between two committed versions
    * of a manifest table (CDC-lite; updates appear as delete+insert).
    */
  def changeFeed(spark: org.apache.spark.sql.SparkSession, path: String,
                 fromVersion: Long, toVersion: Long): DataFrame =
    graft.pipeline.ManifestTable.diff(spark, path, fromVersion, toVersion)

  /** Read the current committed version of a manifest table (falls back
    * to a plain parquet read for unversioned paths).
    */
  def readVersioned(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    graft.pipeline.Medallion.readTable(spark, path)

  /** Exact cosine top-k neighbors of each probe row against the corpus.
    * Probes are broadcast; the corpus is scanned once, never shuffled.
    */
  def cosineTopK(corpus: DataFrame, probes: DataFrame,
                 idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("cand_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
    val p = probes.select(col(idCol).as("probe_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        Similarity.cosine(col("pv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("sim"))
  }

  /** Remove corpus-duplicate n-token spans from each document, keeping
    * the globally-first occurrence (the rewrite half of exact-substring
    * dedup; `duplicateSpans` is the measurement half).
    */
  def scrubDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                          spanTokens: Int = 8): DataFrame =
    graft.ops.Curate.spanScrub(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")), spanTokens)

  /** Per-user ordered-funnel timestamps (first view, first click after
    * a view, first purchase after such a click) — one shuffle+sort on
    * the user key drives all stages.
    */
  def funnelStages(events: DataFrame, userCol: String, idCol: String,
                   tsCol: String, typeCol: String): DataFrame =
    graft.ops.Star.funnelPerUser(
      events.select(col(userCol).as("user_id"), col(idCol).as("event_id"),
        col(tsCol).as("ts"), col(typeCol).as("event_type")))

  /** Cohort retention triangle over (entity, event-time) rows: first
    * month cohorts × months-since with retention vs month 0.
    */
  def cohortRetention(df: DataFrame, keyCol: String,
                      tsCol: String): DataFrame =
    graft.ops.Aggregates.cohortRetentionOf(
      df.select(col(keyCol).as("o_custkey"), col(tsCol).as("o_orderdate")))

  /** Int8 scalar quantization diagnostics for an embedding column with
    * global per-dimension calibration (code sum/min/max per vector).
    */
  def quantizeEmbeddings(df: DataFrame, idCol: String, vecCol: String,
                         labelCol: String): DataFrame =
    Similarity.quantizeInt8(
      df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
        col(labelCol).as("label")))

  /** Dense daily grid per series with zero-filled gaps and a
    * forward-filled average (`filled` marks synthesized rows).
    */
  def gapFillDaily(df: DataFrame, seriesCol: String, tsCol: String,
                   valueCol: String): DataFrame =
    graft.ops.TimeSeries.gapFillDaily(
      df.select(col(seriesCol).as("event_type"), col(tsCol).as("ts"),
        col(valueCol).as("value")))

  /** Out-of-vocabulary rate per document against the deterministic
    * top-V corpus vocabulary (tokenizer-fit / gibberish signal).
    */
  def vocabOov(df: DataFrame, idCol: String, textCol: String,
               vocabSize: Int = 20): DataFrame =
    graft.ops.Text.vocabOovOf(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")), vocabSize)

  /** Per-(series, day) volume-anomaly flags: daily count deviating more
    * than `k` population σ from the series mean, decided in exact
    * integer arithmetic (`graft.ops.TimeSeries.anomalyDays`).
    */
  def anomalyDays(df: DataFrame, seriesCol: String, tsCol: String,
                  k: Int = 2): DataFrame =
    graft.ops.TimeSeries.anomalyDays(
      df.select(col(seriesCol).as("event_type"), col(tsCol).as("ts")), k)

  /** Rolling `window`-day distinct `actorCol` per day (WAU family). */
  def rollingDistinct(df: DataFrame, actorCol: String, tsCol: String,
                      window: Int = 7): DataFrame =
    graft.ops.TimeSeries.rollingDistinctUsers(
      df.select(col(actorCol).as("user_id"), col(tsCol).as("ts")), window)

  /** Exact discrete per-group quantiles by rank selection — one window
    * pass per group, deterministic ties via `tiebreak`.
    */
  def groupQuantiles(df: DataFrame, keyCol: String, valCol: String,
                     tiebreak: String,
                     ps: Seq[(String, Double)] = Seq(
                       "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)): DataFrame =
    graft.ops.Aggregates.groupQuantilesOf(df, keyCol, valCol, tiebreak, ps)

  /** Single-scan per-column profile: rows / nulls / exact distincts.
    * `approximate = true` swaps HLL++ estimates in (no Expand — the
    * 100 TB form).
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     approximate: Boolean = false): DataFrame =
    if (approximate) graft.ops.Profile.profileApprox(df, cols)
    else graft.ops.Profile.profile(df, cols)

  /** Cross-batch NEAR-dup pairs: (batch id, existing id) at n-gram
    * Jaccard ≥ threshold — "which of today's ingest are rewordings of
    * the standing corpus". Batch posting broadcasts; the corpus scans
    * once and never shuffles for the join
    * (`graft.ops.Dedup.incrementalNearPairs`).
    */
  def incrementalNearDups(existing: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String,
                          threshold: Double = 0.5): DataFrame = {
    def norm(df: DataFrame) =
      df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    Dedup.incrementalNearPairs(norm(existing), norm(batch), threshold)
  }

  /** Frequent co-occurring item pairs (≥ minSupport shared baskets). */
  def copurchasePairs(df: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long = 2, maxBasket: Int = 10000): DataFrame =
    graft.ops.Basket.pairCounts(df, basketCol, itemCol, minSupport, maxBasket)

  // ------------------------------------------------------------------
  // Skew-guard audit twins. Every bounded operator above caps its worst
  // case (hot shingles, degenerate LSH buckets, oversized baskets) by
  // DROPPING the offending group whole — correct protection, but a user
  // deduping real data cannot distinguish "no duplicates" from "the
  // duplicates sat in a capped group". Each twin reports exactly what
  // its operator suppressed, with the same inputs and parameters; an
  // empty frame certifies nothing was dropped.
  // ------------------------------------------------------------------

  /** Shingles [[ngramNearDups]] drops for exceeding maxDf, with their
    * document frequency (shingle reported as its 64-bit hash — the key
    * the operator shuffles on).
    */
  def ngramNearDupsDropped(df: DataFrame, idCol: String, textCol: String,
                           maxDf: Int = 1000): DataFrame =
    Dedup.ngramDropped(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")), maxDf)

  /** LSH buckets [[cosineNearDups]] drops for exceeding maxBucket. */
  def cosineNearDupsDropped(df: DataFrame, idCol: String, vecCol: String,
                            tables: Int = 8, planes: Int = 6,
                            maxBucket: Int = 1000): DataFrame =
    Dedup.embeddingDropped(
      df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v")),
      tables, planes, maxBucket)

  /** Variant buckets [[fuzzyKeyPairs]] drops for exceeding maxBucket. */
  def fuzzyKeyPairsDropped(df: DataFrame, keyCol: String,
                           maxBucket: Int = 1000): DataFrame =
    graft.ops.Dedup.fuzzyDropped(df, keyCol, maxBucket)

  /** Baskets [[copurchasePairs]] drops for exceeding maxBasket. */
  def copurchasePairsDropped(df: DataFrame, basketCol: String, itemCol: String,
                             maxBasket: Int = 10000): DataFrame =
    graft.ops.Basket.basketsDropped(df, basketCol, itemCol, maxBasket)

  /** Boilerplate batch shingles [[incrementalNearDups]] drops for
    * exceeding maxBatchDf, with their batch document frequency.
    */
  def incrementalNearDupsDropped(batch: DataFrame,
                                 idCol: String, textCol: String,
                                 maxBatchDf: Int = 1000): DataFrame =
    Dedup.incrementalDropped(
      batch.select(col(idCol).as("doc_id"), col(textCol).as("text")), maxBatchDf)

  /** K-means clusters `graft.ops.Dedup.semanticPairs` drops for
    * exceeding maxCluster (same fit/assignment ⇒ same clusters).
    */
  def semanticNearDupsDropped(df: DataFrame, idCol: String, vecCol: String,
                              cells: Int = 10, maxCluster: Int = 2000): DataFrame =
    graft.ops.Dedup.semanticDropped(
      df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v")),
      cells, maxCluster)

  /** BM25 top-N of the corpus against a fixed query term set
    * (k1=1.2, b=0.75; bit-reproducible scores — see `Text.bm25Of`).
    */
  def bm25TopN(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], topN: Int = 20): DataFrame =
    graft.ops.Text.bm25Of(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      terms, topN = topN)

  /** Exact top-k cosine neighbors of every vector WITHIN its cell
    * (IVF cell id, label, shard — whatever bounds the quadratic).
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
               cellCol: String, k: Int = 3): DataFrame =
    Similarity.knnWithinCell(
      df.select(col(idCol).as("vec_id"), col(cellCol),
        col(vecCol).as("embedding")), cellCol, k)

  /** IVF-SQ8 compressed ANN: deterministic k-means cells + int8-coded
    * residuals (1 byte/dim index), asymmetric reconstruct-and-re-rank
    * search. Probes = rows with id < numProbes (the declared-query
    * contract); see `Similarity.ivfRqSearch` for the scale shape.
    */
  def annIvfRq(df: DataFrame, idCol: String, vecCol: String,
               cells: Int = 10, numProbes: Int = 10,
               k: Int = 5, nprobe: Int = 2): DataFrame =
    Similarity.ivfRqSearch(
      df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v")),
      cells, numProbes, k, nprobe)

  /** Overlapping token-window chunks of `textCol` — RAG / long-context
    * preparation (window tokens, advancing by stride; the short tail is
    * always covered). Map-only; see `Curate.docChunk`.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 32, stride: Int = 24): DataFrame =
    graft.ops.Curate.docChunk(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      window, stride)

  /** Temperature-weighted resampling WITH repetition: weight w emits
    * floor(w) copies + one more with probability frac(w), decided by a
    * salted-md5 coin — deterministic at any parallelism and across
    * incremental batches. See `Curate.temperatureResample`.
    */
  def resampleByDomain(df: DataFrame, keyCol: String, domainCol: String,
                       weights: Map[String, Double],
                       defaultWeight: Double = 1.0,
                       salt: String = "resample:"): DataFrame =
    graft.ops.Curate.temperatureResample(
      df, keyCol, domainCol, weights, defaultWeight, salt)

  /** Laplace-smoothed unigram-LM average NLL per row — the
    * perplexity-proxy quality score (CCNet/Gopher style); higher =
    * less probable under the corpus distribution.
    */
  def unigramNllScores(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.Text.unigramNllOf(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")))

  /** Per-row Shannon entropy of the row's own token distribution +
    * type-token ratio (low entropy = boilerplate/spam).
    */
  def tokenEntropyScores(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.Text.tokenEntropyOf(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")))

  /** Laplace-smoothed bigram-LM average conditional NLL per row — the
    * ORDER-sensitive perplexity proxy (`unigramNllScores` passes
    * shuffled text; this catches it). Rows with <2 tokens are absent.
    */
  def bigramNllScores(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.Text.bigramNllOf(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")))

  /** Top-k adjacent-bigram PMI collocations of the corpus (phrase
    * mining / tokenizer-vocabulary signal).
    */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5, k: Int = 100): DataFrame =
    graft.ops.Text.bigramPmiOf(
      df.select(col(textCol).as("text")), minCount, k)

  /** Integer fixed-point PageRank over (src, dst) edges — bit-identical
    * at any parallelism; see `graft.ops.Graph.pageRank`. Pass
    * `materializeEdges = false` when `edges` is already materialized
    * (cached/bucketed): construction then runs no jobs and pins no
    * second edge copy in executor storage.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, materializeEdges: Boolean = true): DataFrame =
    graft.ops.Graph.pageRank(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")), iters,
      materializeEdges = materializeEdges)

  // --- ACID table verbs (thin renames into graft.pipeline.ManifestTable) ---

  /** Keyed copy-on-write MERGE (upsert/delete) into a manifest table;
    * `deleteVectors = true` commits sparse deletes as merge-on-read
    * sidecars instead of rewriting files.
    */
  def mergeVersioned(updates: DataFrame, path: String, key: String,
                     deleteCol: String = null,
                     statsCols: Seq[String] = Nil,
                     deleteVectors: Boolean = false): Long =
    graft.pipeline.ManifestTable.merge(updates, path, key,
      Option(deleteCol), statsCols = statsCols,
      deleteVectors = deleteVectors)

  /** Metadata-only RENAME COLUMN (Delta column mapping): no data file
    * is touched; stats/bloom/DV pruning resolve through the map.
    */
  def renameTableColumn(spark: org.apache.spark.sql.SparkSession,
                        path: String, from: String, to: String): Long =
    graft.pipeline.ManifestTable.renameColumn(spark, path, from, to)

  /** Metadata-only DROP COLUMN; a re-added name never resurrects the
    * dropped data.
    */
  def dropTableColumn(spark: org.apache.spark.sql.SparkSession,
                      path: String, name: String): Long =
    graft.pipeline.ManifestTable.dropColumn(spark, path, name)

  /** OPTIMIZE ZORDER BY (c1, c2): rewrite the table Morton-clustered
    * with per-file stats on both dimensions, as one atomic commit.
    */
  def optimizeZOrderTable(spark: org.apache.spark.sql.SparkSession,
                          path: String, c1: String, c2: String,
                          targetFiles: Int): Long =
    graft.pipeline.ManifestTable.optimizeZOrder(spark, path, c1, c2,
      targetFiles)

  /** N-column OPTIMIZE ZORDER (3-8 dims, round-robin Morton interleave). */
  def optimizeZOrderTableN(spark: org.apache.spark.sql.SparkSession,
                           path: String, cols: Seq[String],
                           targetFiles: Int): Long =
    graft.pipeline.ManifestTable.optimizeZOrderN(spark, path, cols,
      targetFiles)

  /** Zero-copy SHALLOW CLONE of a manifest table version. */
  def cloneTable(spark: org.apache.spark.sql.SparkSession,
                 src: String, dst: String,
                 version: java.lang.Long = null): Long =
    graft.pipeline.ManifestTable.cloneShallow(spark, src, dst,
      Option(version).map(_.longValue))

  /** DEEP CLONE — files copied under the clone's root (distributed
    * copy job), fully independent of the source's retention. */
  def deepCloneTable(spark: org.apache.spark.sql.SparkSession,
                     src: String, dst: String,
                     version: java.lang.Long = null): Long =
    graft.pipeline.ManifestTable.cloneDeep(spark, src, dst,
      Option(version).map(_.longValue))

  /** Metadata-only RESTORE to an earlier committed version. */
  def restoreTable(spark: org.apache.spark.sql.SparkSession,
                   path: String, toVersion: Long): Long =
    graft.pipeline.ManifestTable.restore(spark, path, toVersion)

  /** Enable stable row ids on an empty manifest table (Delta 3.x row
    * tracking); read them back with [[readRowIds]].
    */
  def enableRowTracking(spark: org.apache.spark.sql.SparkSession,
                        path: String): Long =
    graft.pipeline.ManifestTable.enableRowTracking(spark, path)

  /** Current version WITH the stable `_graft_row_id` column exposed. */
  def readRowIds(spark: org.apache.spark.sql.SparkSession,
                 path: String): DataFrame =
    graft.pipeline.ManifestTable.readWithRowIds(spark, path)

  /** Stats- then bloom-pruned point lookup `column = value`. */
  def pointLookup(spark: org.apache.spark.sql.SparkSession,
                  path: String, column: String, value: Any): DataFrame =
    graft.pipeline.ManifestTable.readWhereEquals(spark, path, column, value)

  /** Join against a manifest table with the build-side strategy decided
    * from the table's COMMITTED STATISTICS (`setNdvStats` row counts) —
    * the CBO broadcast decision without scanning or size-guessing the
    * build side: fully-covered row count ≤ `broadcastMaxRows` applies
    * an explicit broadcast hint; anything else (no index, partial
    * sidecar coverage, too big) falls through to Spark's own planning.
    * At 100 TB this is the difference between shuffling a fact table
    * against a dimension Spark mis-sized and a map-side join chosen
    * from metadata.
    */
  /** Merge-on-read predicate DELETE: matching rows killed by a
    * deletion-vector sidecar, zero data files touched; `key` must be
    * row-unique per file (see ManifestTable.deleteWhereDV). */
  def deleteWhereDV(spark: org.apache.spark.sql.SparkSession,
                    path: String, cond: org.apache.spark.sql.Column,
                    key: String): Long =
    graft.pipeline.ManifestTable.deleteWhereDV(spark, path, cond, key)

  /** Merge-on-read predicate UPDATE: old images deletion-vectored,
    * transformed new images appended — no data file rewritten (see
    * ManifestTable.updateWhereDV for the key contract). */
  def updateWhereDV(spark: org.apache.spark.sql.SparkSession,
                    path: String,
                    set: Seq[(String, org.apache.spark.sql.Column)],
                    cond: org.apache.spark.sql.Column, key: String): Long =
    graft.pipeline.ManifestTable.updateWhereDV(spark, path, set, cond, key)

  /** Declare cluster columns (liquid-clustering shape): staged batches
    * sort locally by the key; [[optimizeClusteredTable]] maintains
    * global disjointness incrementally. */
  def setClusterColumns(spark: org.apache.spark.sql.SparkSession,
                        path: String, cols: Seq[String]): Long =
    graft.pipeline.ManifestTable.setClusterColumns(spark, path, cols)

  /** Incremental cluster maintenance: rewrites only unclustered files
    * plus the range-overlapping clustered tail; no-op when fully
    * clustered. */
  def optimizeClusteredTable(spark: org.apache.spark.sql.SparkSession,
                             path: String, targetFiles: Int = 0): Long =
    graft.pipeline.ManifestTable.optimizeClustered(spark, path, targetFiles)

  /** Declare the table's persistent stats schema: every subsequent
    * commit records per-file min/max stats for these columns without
    * per-call `statsCols` (Delta's `dataSkippingStatsColumns`). */
  def setStatsColumns(spark: org.apache.spark.sql.SparkSession,
                      path: String, cols: Seq[String]): Long =
    graft.pipeline.ManifestTable.setStatsColumns(spark, path, cols)

  /** Read a manifest table with the broadcast decision injected from
    * its committed NDV statistics — ANY join written against the
    * returned frame plans map-side when metadata proves the table
    * small (see [[graft.pipeline.ManifestTable.readAuto]]).
    */
  def readTableAuto(spark: org.apache.spark.sql.SparkSession,
                    path: String,
                    broadcastMaxRows: Long = 1L << 22): DataFrame =
    graft.pipeline.ManifestTable.readAuto(spark, path, broadcastMaxRows)

  def joinWithStats(left: DataFrame, rightPath: String,
                    usingColumns: Seq[String],
                    broadcastMaxRows: Long = 1L << 22,
                    joinType: String = "inner"): DataFrame = {
    val spark = left.sparkSession
    val right = graft.pipeline.ManifestTable.read(spark, rightPath)
    val smallByStats =
      try {
        val (rows, covered, total) =
          graft.pipeline.ManifestTable.rowCountFromStats(spark, rightPath)
        covered == total && rows <= broadcastMaxRows
      } catch {
        case _: IllegalStateException => false    // no committed version
        case _: IllegalArgumentException => false // no NDV index declared
      }
    if (smallByStats)
      left.join(org.apache.spark.sql.functions.broadcast(right),
        usingColumns, joinType)
    else left.join(right, usingColumns, joinType)
  }

  // --- round-12 surface ---

  /** Selective overwrite (Delta `replaceWhere`): atomically replace
    * exactly the rows matching `cond` with `batch` — the
    * backfill-one-slice write. */
  def overwriteWhere(batch: DataFrame, path: String,
                     cond: org.apache.spark.sql.Column): Long =
    graft.pipeline.ManifestTable.overwriteWhere(batch, path, cond)

  /** NOT NULL column invariant: violating writes reject atomically. */
  def setNotNull(spark: org.apache.spark.sql.SparkSession,
                 path: String, column: String): Long =
    graft.pipeline.ManifestTable.setNotNull(spark, path, column)

  /** Time-based retention: sweep versions older than `retainHours`
    * against the commit wall-times in the log. */
  def vacuumHours(spark: org.apache.spark.sql.SparkSession,
                  path: String, retainHours: Double): Seq[Long] =
    graft.pipeline.ManifestTable.vacuumHours(spark, path, retainHours)

  /** IDENTITY column (BY DEFAULT): engine-assigned unique step-spaced
    * values whenever a write batch omits the column. */
  def setIdentityColumn(spark: org.apache.spark.sql.SparkSession,
                        path: String, column: String,
                        startWith: Long = 1L, step: Long = 1L): Long =
    graft.pipeline.ManifestTable.setIdentityColumn(spark, path, column,
      startWith, step)

  /** Read a catalog-name table (`db.t` under the graft warehouse). */
  def table(spark: org.apache.spark.sql.SparkSession,
            name: String): DataFrame =
    graft.catalog.GraftCatalog.table(spark, name)

  /** Write/append a DataFrame under a catalog name. */
  def saveAsTable(df: DataFrame, name: String,
                  mode: String = "overwrite"): Long =
    graft.catalog.GraftCatalog.saveAsTable(df, name, mode)

  /** Declare an EMPTY table (schema + optional partitioning) under a
    * catalog name — Delta's plain CREATE TABLE (r13). */
  def createTable(spark: org.apache.spark.sql.SparkSession, name: String,
                  schema: org.apache.spark.sql.types.StructType,
                  partitionCols: Seq[String] = Nil): Unit =
    graft.catalog.GraftCatalog.createTable(spark, name, schema,
      partitionCols)

  /** Rename a catalog-name table (managed: one dir move; external:
    * registry re-point) — `ALTER TABLE ... RENAME TO` (r13). */
  def renameTable(spark: org.apache.spark.sql.SparkSession,
                  oldName: String, newName: String): Unit =
    graft.catalog.GraftCatalog.renameTable(spark, oldName, newName)

  /** Keyed CoW MERGE with additive SCHEMA EVOLUTION — delta-spark's
    * `withSchemaEvolution()` (r13). */
  def mergeVersionedEvolving(updates: DataFrame, path: String,
                             key: String): Long =
    graft.pipeline.ManifestTable.merge(updates, path, key,
      schemaEvolution = true)

  /** Column DEFAULT declarations (r14): constant expression filling
    * the column when a write doesn't supply it (column-list INSERT,
    * unassigned MERGE INSERT columns, `SET c = DEFAULT`). */
  def setColumnDefault(spark: org.apache.spark.sql.SparkSession,
                       path: String, column: String,
                       exprSql: String): Long =
    graft.pipeline.ManifestTable.setColumnDefault(spark, path, column,
      exprSql)

  def dropColumnDefault(spark: org.apache.spark.sql.SparkSession,
                        path: String, column: String): Long =
    graft.pipeline.ManifestTable.dropColumnDefault(spark, path, column)

  def columnDefaults(spark: org.apache.spark.sql.SparkSession,
                     path: String): Map[String, String] =
    graft.pipeline.ManifestTable.columnDefaults(spark, path)

  /** User TBLPROPERTIES — set/unset as one metadata commit, read the
    * current map (r13; `graft.` keys are reserved for engine
    * features). */
  def setTableProperties(spark: org.apache.spark.sql.SparkSession,
                         path: String,
                         props: Map[String, String]): Long =
    graft.pipeline.ManifestTable.setProperties(spark, path, props)
  def unsetTableProperties(spark: org.apache.spark.sql.SparkSession,
                           path: String, keys: Seq[String]): Long =
    graft.pipeline.ManifestTable.unsetProperties(spark, path, keys)
  def tableProperties(spark: org.apache.spark.sql.SparkSession,
                      path: String): Map[String, String] =
    graft.pipeline.ManifestTable.tableProperties(spark, path)
}
