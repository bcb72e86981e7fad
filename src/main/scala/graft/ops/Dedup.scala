package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deduplication family over `documents` — exact, n-gram Jaccard,
  * MinHash+LSH banding, SimHash. The LLM-data-pipeline north star
  * (BASELINE.json), designed shuffle-first for 100 TB:
  *
  *  - exact dedup: one shuffle on the content key (or its md5 — constant
  *    width regardless of document size).
  *  - near-dup: never an O(n²) cross join. Candidate generation goes
  *    through an inverted index (explode on shingle / band key / simhash
  *    block), so the self-join is per-posting-list. Hot keys (a shingle
  *    shared by millions of docs) are the skew risk — capped via
  *    document-frequency pruning before the join.
  */
object Dedup {

  /** Exact dedup, first-writer-wins: keep the lowest doc_id per distinct
    * text. row_number over a hash-partitioned window — a single shuffle
    * on the dedup key. At 100 TB the window key becomes md5(text)
    * (constant-width shuffle rows); doc_id ordering keeps it deterministic.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    exactDedup(Tables.documents(spark, sfDir), "text", "doc_id")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** DataFrame-first core: drop duplicate rows by `contentCol`, keeping
    * the row with the smallest `tieBreakCol` (first-writer-wins).
    */
  def exactDedup(df: DataFrame, contentCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol)).orderBy(col(tieBreakCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Word 3-gram shingles of a text column (distinct). */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = split(trim(c), "\\s+")
    when(size(toks) >= n, array_distinct(slidingConcat(toks, n)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** All n-token sliding windows of `toks`, space-joined, built by
    * zipping n shifted copies of the array. NOT the obvious
    * `transform(sequence(...), i => concat_ws(slice(toks, i, n)))`:
    * higher-order lambdas evaluate interpreted and re-evaluate
    * non-attribute children per element, so that form re-runs the
    * whole `toks` subtree (split+trim — or anything the optimizer
    * substituted into it) once per window. `zip_with` evaluates its
    * array arguments once per row; the lambda touches only elements.
    * `toks` is evaluated n times per row (constant), not O(windows).
    */
  private[ops] def slidingConcat(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    val shifted = (0 until n).map(j => slice(toks, lit(j + 1), count))
    shifted.reduceLeft((acc, s) => zip_with(acc, s, (a, b) => concat_ws(" ", a, b)))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard similarity ≥ threshold.
    *
    * Plan shape (the 100 TB-safe one):
    *   docs → explode(shingles)           [narrow]
    *        → df-prune hot shingles       [one small agg]
    *        → self-join on shingle        [shuffle on shingle, posting
    *                                       lists only — no cross join]
    *        → count common per pair       [shuffle on (doc1,doc2)]
    *        → jaccard = common/(n1+n2-common), filter ≥ t.
    *
    * Document-frequency pruning bounds the worst posting list: a shingle
    * appearing in > maxDf docs generates O(maxDf²) pairs at most.
    */
  def dedupNgram(spark: SparkSession, sfDir: String,
                 threshold: Double = 0.5, maxDf: Int = 1000): DataFrame =
    ngramPairs(Tables.parallelize(Tables.documents(spark, sfDir)), threshold, maxDf)

  /** DataFrame-first core over (doc_id, text) rows. */
  def ngramPairs(input: DataFrame,
                 threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    val posting = ngramPosting(input)
    // Gather each shingle's posting list in ONE shuffle, prune by list
    // size (df < 2 → no pair; df > maxDf → hot-shingle skew bomb), then
    // expand candidate pairs with two chained explodes — plain codegen'd
    // Generate operators, no lambda eval, and, critically, a tree-shaped
    // plan: a self-join formulation recomputes the posting branch once
    // per join side (Catalyst can't reuse the exchange across the a/b
    // alias renames), 4× the scan+shingle work at any scale.
    val lists = posting
      .groupBy(col("shingle"))
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("lst"))
      .filter(size(col("lst")).between(2, maxDf))
    lists
      .select(explode(col("lst")).as("a"), col("lst"))
      .select(col("a"), explode(col("lst")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.n_sh").as("n1"), col("b.n_sh").as("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast(DoubleType) /
          (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("common"), col("jaccard"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** Inverted-index build shared by [[ngramPairs]] and [[ngramDropped]]:
    * (doc_id, n_sh, shingle-hash) posting rows.
    *
    * Shingles are computed AND hashed by the native ShingleHashes
    * expression (one pass; spec-cross-checked against the composed
    * [[shingles]]+xxhash64 form) and carried as longs from here on —
    * constant-width shuffle keys instead of arbitrary-length strings
    * (collision odds ~ pairs·2⁻⁶⁴, negligible).
    *
    * explode_outer: with an attribute child, InferFiltersFromGenerate
    * would synthesize size(sh)>0 ∧ isnotnull(sh), substitute the full
    * ShingleHashes expression into it, and push it below the
    * parallelize repartition — hashing every document twice on the
    * single pre-shuffle scan task. Outer generators are exempt; the
    * null rows (shingle-less docs) drop on the exploded attribute.
    */
  private def ngramPosting(input: DataFrame): DataFrame =
    input
      .select(col("doc_id"),
        graft.functions.ShingleHashes
          .shingleHashes(SparkSession.active, col("text")).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .select(col("doc_id"), col("n_sh"), explode_outer(col("sh")).as("shingle"))
      .filter(col("shingle").isNotNull)

  /** Audit twin of [[ngramPairs]]'s df-pruning guard: the hot shingles
    * it drops, with their document frequency. A shingle in > maxDf docs
    * never generates candidate pairs in the main path — correct skew
    * protection, but silent; a user deduping real data cannot otherwise
    * distinguish "no duplicates" from "the duplicates shared a capped
    * shingle". Run alongside the main query (same inputs/params) when
    * the drop rate matters; empty output = nothing was suppressed.
    */
  def ngramDropped(input: DataFrame, maxDf: Int = 1000): DataFrame =
    ngramPosting(input)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .orderBy(col("df").desc, col("shingle"))

  /** Cross-batch NEAR-dup detection: pairs (batch doc, existing doc)
    * with n-gram Jaccard ≥ threshold — the near-dup complement of the
    * exact [[graft.ops.Curate]] incremental Bloom path, i.e. "which of
    * today's ingest are rewordings of something already in the corpus".
    *
    * Plan shape for the 100 TB case (huge corpus, small daily batch):
    * the BATCH posting list broadcasts; the corpus is scanned ONCE and
    * never shuffles for the join — only rows whose shingle matches a
    * batch shingle survive into the (b_id, e_id) pair aggregation, so
    * the single real shuffle carries matched postings only.
    *
    * The blowup term is MULTIPLICATIVE per shingle: df_batch(s) ×
    * df_corpus(s) joined rows. `maxBatchDf` caps the batch factor —
    * shingles shared by more than that many BATCH docs (boilerplate
    * headers/footers, the classic offender) are dropped from the
    * broadcast, bounding join output at maxBatchDf × (corpus postings
    * hitting the batch shingle set) — linear in the corpus with a
    * caller-controlled constant. [[incrementalDropped]] is the audit
    * twin reporting exactly which shingles the cap suppressed.
    */
  def incrementalNearPairs(existing: DataFrame, batch: DataFrame,
                           threshold: Double = 0.5,
                           maxBatchDf: Int = 1000): DataFrame = {
    posting(existing, "e_id", "e_n")
      .join(broadcast(batchPosting(batch, maxBatchDf)), Seq("shingle"))
      .groupBy(col("b_id"), col("e_id"), col("b_n"), col("e_n"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast(DoubleType) /
          (col("b_n") + col("e_n") - col("common")))
      // coalesce, not a bare `jaccard >= t`: the bare form lets
      // constraint inference derive isnotnull(jaccard) → isnotnull(b_n)
      // → alias-substitute size(graft_shingle_hashes(text)) into the
      // SCAN filters of both sides — the whole shingle kernel evaluated
      // twice per row (the PlanAuditSpec kernel-in-Filter trap).
      // Null-intolerance analysis stops at coalesce (never null), and
      // jaccard is never null here anyway (common ≥ 1, n's non-null).
      .filter(coalesce(col("jaccard"), lit(-1.0)) >= threshold)
      .select(col("b_id"), col("e_id"), col("common"), col("jaccard"))
      .orderBy(col("b_id"), col("e_id"))
  }

  /** Renamed [[ngramPosting]] — ONE shared posting builder (the
    * explode_outer/InferFiltersFromGenerate discipline documented
    * there must not fork).
    */
  private def posting(df: DataFrame, idAs: String, nAs: String): DataFrame =
    ngramPosting(df).withColumnsRenamed(Map("doc_id" -> idAs, "n_sh" -> nAs))

  /** Batch side of [[incrementalNearPairs]]: posting rows minus the
    * shingles whose batch document frequency exceeds `maxBatchDf` (the
    * multiplicative-blowup guard). One small window on the (already
    * tiny) batch posting.
    */
  private def batchPosting(batch: DataFrame, maxBatchDf: Int): DataFrame =
    posting(batch, "b_id", "b_n")
      .withColumn("_df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("_df") <= maxBatchDf)
      .drop("_df")

  /** Audit twin of [[incrementalNearPairs]]'s maxBatchDf guard: the
    * boilerplate shingles it drops from the batch, with their batch
    * document frequency. Empty output = nothing was suppressed.
    */
  def incrementalDropped(batch: DataFrame, maxBatchDf: Int = 1000): DataFrame =
    posting(batch, "b_id", "b_n")
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxBatchDf)
      .orderBy(col("df").desc, col("shingle"))

  /** Declared query: every-20th document plays the incoming batch, the
    * rest the standing corpus — near-dup matches across the boundary.
    */
  def dedupIncrementalNgram(spark: SparkSession, sfDir: String,
                            threshold: Double = 0.5): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text"))
    incrementalNearPairs(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), threshold)
  }

  /** MinHash signature + LSH banding candidate pairs.
    *
    * numHashes independent min-hashes from xxhash64(shingle, seed) —
    * computed inside the exploded posting aggregation (one shuffle),
    * then grouped into bands; a pair collides if any band matches.
    * Engine-native hash → deterministic within Spark, not
    * SQL-oracle-expressible (declared rows-only per SURVEY §2b).
    *
    * At scale: signatures are numHashes×8 bytes/doc regardless of doc
    * size; band join shuffles on (band_idx, band_hash) — the classic
    * LSH layout. Seeds fixed for reproducibility.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 16): DataFrame = {
    // Each shingle is tokenized+hashed ONCE by the native ShingleHashes
    // expression; the numHashes independent min-hash families then
    // re-hash the 8-byte value (seeded by index) — 16 long-hashes
    // instead of 16 variable-length string-hashes per shingle, and the
    // map-side partial min-agg shuffles one row per doc.
    val posting = docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashes
          .shingleHashes(docs.sparkSession, col("text"))).as("shingle"))
    val mins: Seq[Column] = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i")
    }
    posting.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  def dedupMinhash(spark: SparkSession, sfDir: String,
                   numHashes: Int = 16, bands: Int = 4): DataFrame =
    minhashCandidates(
      Tables.parallelize(Tables.documents(spark, sfDir)), numHashes, bands)

  /** DataFrame-first core over (doc_id, text) rows. */
  def minhashCandidates(docs: DataFrame,
                        numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(docs, numHashes)
    val bandHashes: Seq[Column] = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      xxhash64(hs: _*)
    }
    // carry ALL band hashes with each banded row (bands longs — cheap) so
    // pair emission can be restricted to the FIRST matching band below
    val banded = sig
      .withColumn("bhs", array(bandHashes: _*))
      .select(col("doc_id"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band", "bh")))
    // Bucket-collect instead of self-join: one shuffle on the band key,
    // pairs expanded by chained explodes (codegen Generates). A self-join
    // would recompute the whole signature branch per side. Duplicate
    // collisions (same pair, several bands) are eliminated shuffle-free
    // by the first-matching-band test instead of a distinct().
    val firstMatch = (0 until bands).map { e =>
      when(col("band") > e,
        element_at(col("a.bhs"), e + 1) =!= element_at(col("b.bhs"), e + 1))
        .otherwise(lit(true))
    }.reduce(_ && _)
    banded
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("doc_id"), col("bhs"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("band"), explode(col("ds")).as("a"), col("ds"))
      .select(col("band"), col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") && firstMatch)
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** Embedding-cosine near-duplicates: pairs of vectors with cosine ≥
    * `threshold`, found without an O(n²) cross join via multi-table
    * random-hyperplane LSH — `tables` independent signature families of
    * `planes` sign bits each; a pair is a candidate if its signatures
    * collide in ANY table; candidates get an exact cosine re-rank.
    *
    * Multi-table is what makes moderate-similarity pairs findable: one
    * k-bit table finds a pair with probability (1−θ/π)^k; L tables raise
    * that to 1−(1−p)^L with L× the bucketing cost and unchanged shuffle
    * shape (band key = (table, signature), exactly like MinHash banding).
    * `maxBucket` caps degenerate buckets (skew guard). Deterministic:
    * planes are hash-derived, no RNG state.
    */
  def dedupEmbedding(spark: SparkSession, sfDir: String,
                     threshold: Double = 0.4, tables: Int = 8,
                     planes: Int = 6, maxBucket: Int = 1000): DataFrame =
    cosinePairs(
      Tables.parallelize(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast(DoubleType)).as("v")),
      threshold, tables, planes, maxBucket)

  /** DataFrame-first core over (vec_id, v: array<double>) rows. */
  def cosinePairs(emb: DataFrame,
                  threshold: Double = 0.4, tables: Int = 8,
                  planes: Int = 6, maxBucket: Int = 1000): DataFrame = {
    // all table signatures ride along (tables longs) so a pair colliding
    // in several tables is emitted only from the FIRST matching table —
    // no distinct() shuffle, and the exact cosine runs once per pair
    val firstMatch = (0 until tables).map { e =>
      when(col("tbl") > e,
        element_at(col("a.sigs"), e + 1) =!= element_at(col("c.sigs"), e + 1))
        .otherwise(lit(true))
    }.reduce(_ && _)
    lshExploded(emb, tables, planes)
      .groupBy(col("tbl"), col("sig"))
      .agg(collect_list(struct(col("vec_id"), col("v"), col("sigs"))).as("bucket"))
      .filter(size(col("bucket")).between(2, maxBucket))
      .select(col("tbl"), explode(col("bucket")).as("a"), col("bucket"))
      .select(col("tbl"), col("a"), explode(col("bucket")).as("c"))
      .filter(col("a.vec_id") < col("c.vec_id") && firstMatch)
      .select(col("a.vec_id").as("vec1"), col("c.vec_id").as("vec2"),
        Similarity.cosine(col("a.v"), col("c.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("vec1"), col("vec2"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv 2303.09540): k-means-cluster the embeddings (seeded, fixed
    * init), then compare pairs ONLY within a cluster — the paper's
    * trick for making all-pairs semantic comparison tractable: the
    * quadratic term drops from n² to Σ cluster². Complements
    * [[cosinePairs]]: LSH tables bound recall probabilistically per
    * pair; the cluster route inherits k-means locality (a pair split
    * across clusters is missed — the paper accepts exactly this
    * trade). `maxCluster` guards degenerate clusters; at production
    * scale `cells` grows with the corpus (the paper runs 11k clusters
    * for 100M embeddings) so cluster populations stay bounded.
    */
  def semanticPairs(emb: DataFrame, cells: Int = 10,
                    threshold: Double = 0.4,
                    maxCluster: Int = 2000,
                    sampleMod: Int = 4): DataFrame =
    assignCells(emb, cells, sampleMod)
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("v"))).as("bucket"))
      .filter(size(col("bucket")).between(2, maxCluster))
      .select(explode(col("bucket")).as("a"), col("bucket"))
      .select(col("a"), explode(col("bucket")).as("c"))
      .filter(col("a.vec_id") < col("c.vec_id"))
      .select(col("a.vec_id").as("vec1"), col("c.vec_id").as("vec2"),
        Similarity.cosine(col("a.v"), col("c.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("vec1"), col("vec2"))

  /** Per-table LSH signature explode shared by [[cosinePairs]] and
    * [[embeddingDropped]]: (vec_id, v, sigs, tbl, sig) rows.
    *
    * posexplode_outer: a non-outer generate over the aliased sigs
    * attribute gets size(sigs)>0 inferred, alias-substituted, and
    * pushed below the parallelize repartition — all `tables`
    * signatures evaluated a second time per row in a scan-level
    * Filter (see the same trap in ngramPairs). Outer is exempt; the
    * array is never empty (literal arity) so no null rows appear.
    */
  private def lshExploded(emb: DataFrame, tables: Int, planes: Int): DataFrame = {
    val sigCols: Seq[Column] = (0 until tables).map { t =>
      Similarity.lshSignature(col("v"), planes, t * planes)
    }
    emb
      .withColumn("sigs", array(sigCols: _*))
      .select(col("vec_id"), col("v"), col("sigs"),
        posexplode_outer(col("sigs")).as(Seq("tbl", "sig")))
  }

  /** Audit twin of [[cosinePairs]]'s maxBucket guard: the LSH buckets
    * it drops whole, with their population. Empty output = nothing was
    * suppressed. Counts only — the vectors never shuffle here.
    */
  def embeddingDropped(emb: DataFrame, tables: Int = 8,
                       planes: Int = 6, maxBucket: Int = 1000): DataFrame =
    lshExploded(emb, tables, planes)
      .groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucket)
      .orderBy(col("n_members").desc, col("tbl"), col("sig"))

  /** Cluster assignment for [[semanticPairs]]: k-means is FIT on a
    * deterministic hash-sample of the corpus (keep rows where
    * xxhash64(vec_id) ≡ 0 mod `sampleMod`), and every vector is then
    * assigned by the native broadcast-centroid
    * [[graft.functions.NearestCentroid]] expression — a narrow,
    * embarrassingly parallel projection.
    *
    * Why the split: fitting on the whole corpus — the pre-round-5
    * shape — scanned every vector through the iterative fit; here the
    * fit touches only the sample, the corpus is never repartitioned,
    * and the assignment inherits whatever parallelism the input
    * already has. Identical vectors still land in the same cell by
    * construction (same point → same nearest centroid), which is what
    * the planted-clone recovery property needs.
    */
  private[ops] def assignCells(emb: DataFrame, cells: Int,
                               sampleMod: Int): DataFrame = {
    val centers = fitCenters(emb, cells, sampleMod)
    emb.select(
      graft.functions.NearestCentroid
        .nearestCentroid(emb.sparkSession, col("v"), centers).as("cell"),
      col("vec_id"), col("v"))
  }

  /** Sample-guarded coarse-quantizer fit over (vec_id, v) rows — the
    * driver-side centers [[assignCells]] assigns with, exposed so
    * callers that also need the center VECTORS (IVF-RQ residuals,
    * probe-cell ranking) fit exactly once instead of re-deriving them.
    */
  private[ops] def fitCenters(emb: DataFrame, cells: Int,
                              sampleMod: Int): Array[Array[Double]] = {
    val hashSample =
      emb.filter(pmod(xxhash64(col("vec_id")), lit(sampleMod.toLong)) === 0)
    // tiny-corpus guard: the fit wants comfortably more rows than k;
    // fall back to the full corpus when the sample undershoots (the
    // probe is limit-bounded — it never scans past `need` rows)
    val need = cells * 2L
    val sample =
      if (sampleMod <= 1) emb
      else if (hashSample.limit(need.toInt).count() < need) emb
      else hashSample
    kmeansFitExact(sample, cells, iters = 4)
  }

  /** Deterministic-BY-CONSTRUCTION k-means over (vec_id, v) rows — the
    * SemDeDup coarse quantizer without spark.ml's fit:
    *
    *  - init: the `cells` sample points with the smallest salted hash
    *    (a deterministic scatter — no k-means|| partition sampling, so
    *    no partition-layout pin is needed anywhere);
    *  - assign: the codegen'd [[graft.functions.NearestCentroid]]
    *    kernel (strict-< first-index ties);
    *  - update: per-(cell, dim) means through the exact DECIMAL
    *    accumulator ([[graft.Det.davg]]) — order-independent, so the
    *    centers are bit-identical at any parallelism BY CONSTRUCTION,
    *    where spark.ml's float treeAggregate is only stable for a
    *    pinned partition layout. An emptied cell keeps its center.
    *
    * Per iteration: one narrow assign + one partial+final agg whose
    * shuffle is cells×dims rows; only the centers (cells×dims doubles)
    * reach the driver. Few iterations on purpose — a coarse dedup
    * partition needs locality, not convergence.
    */
  private[ops] def kmeansFitExact(input: DataFrame, cells: Int,
                                  iters: Int): Array[Array[Double]] = {
    // one action per iteration plus init — cache the sample so each
    // doesn't re-derive it from the source scan
    val sample = input.cache()
    try {
      var centers: Array[Array[Double]] = sample
        .orderBy(xxhash64(lit("kmeans-init"), col("vec_id")), col("vec_id"))
        .limit(cells)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      var i = 0
      while (i < iters) {
        val means = sample
          .select(
          graft.functions.NearestCentroid
            .nearestCentroid(sample.sparkSession, col("v"), centers).as("cell"),
          col("v"))
        .select(col("cell"), posexplode_outer(col("v")).as(Seq("pos", "val")))
        .filter(col("val").isNotNull)
        .groupBy(col("cell"), col("pos"))
        .agg(graft.Det.davg(col("val")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        centers = centers.indices.map(c => means.getOrElse(c, centers(c))).toArray
        i += 1
      }
      centers
    } finally sample.unpersist(blocking = false)
  }

  /** Audit twin of [[semanticPairs]]'s maxCluster guard: the clusters
    * it drops whole, with their population. Same fit/assignment as the
    * main path (same params ⇒ same centroids), so a non-empty result
    * means real vectors were excluded from pair generation — the
    * no-silent-truncation companion. Cheaper than the main path: only
    * counts shuffle, never the vectors.
    */
  def semanticDropped(emb: DataFrame, cells: Int = 10,
                      maxCluster: Int = 2000,
                      sampleMod: Int = 4): DataFrame =
    assignCells(emb, cells, sampleMod)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxCluster)
      .orderBy(col("n_members").desc, col("cell"))

  def dedupSemantic(spark: SparkSession, sfDir: String,
                    cells: Int = 10, threshold: Double = 0.4): DataFrame =
    semanticPairs(
      Tables.parallelize(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast(DoubleType)).as("v")),
      cells, threshold)

  /** 64-bit SimHash per document: per-token xxhash64 (seed 42, same as
    * Spark's `xxhash64`), sum ±1 votes per bit, sign → bit. Computed by
    * the native [[graft.functions.SimHash64]] expression — one pass, one
    * hash per token, vs the composed-builtin form's 64 `aggregate()`
    * calls that each re-hash every token. Near-dups = pairs within
    * Hamming distance `maxHamming`, found by exploding the signature
    * into 4×16-bit blocks (pigeonhole: distance ≤3 ⇒ at least one
    * identical block) and joining on block equality — no cross join.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions
        .simhash64(docs.sparkSession, col("text")).as("simhash"))

  def dedupSimhash(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame =
    simhashPairs(Tables.parallelize(Tables.documents(spark, sfDir)), maxHamming)

  /** DataFrame-first core over (doc_id, text) rows. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs)
    val blocks: Seq[Column] = (0 until 4).map { blk =>
      struct(lit(blk).as("blk"),
        shiftright(col("simhash"), blk * 16).bitwiseAND(0xFFFFL).as("bv"))
    }
    val exploded = sig
      .select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.bv").as("bv"))
    // Same bucket-collect shape as [[dedupMinhash]] — one shuffle, no
    // self-join recompute of the signature branch. A pair colliding in
    // several blocks would duplicate; instead of a distinct() shuffle,
    // emit each pair only from its FIRST matching block (computable
    // per row — both signatures are in hand), which is shuffle-free.
    def blockOf(s: org.apache.spark.sql.Column, e: Int) =
      shiftright(s, e * 16).bitwiseAND(0xFFFFL)
    val firstMatch = (0 until 4).map { e =>
      when(col("blk") > e,
        blockOf(col("a.simhash"), e) =!= blockOf(col("b.simhash"), e))
        .otherwise(lit(true))
    }.reduce(_ && _)
    exploded
      .groupBy(col("blk"), col("bv"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("blk"), explode(col("ds")).as("a"), col("ds"))
      .select(col("blk"), col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") && firstMatch)
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc1"), col("doc2"))
  }

  // ------------------------------------------------------------------
  // Fuzzy key dedup: edit-distance ≤ 1 via deletion neighborhoods
  // ------------------------------------------------------------------

  /** The SymSpell/FastSS candidate set of a string: itself plus every
    * single-character deletion. Two strings at Levenshtein ≤ 1 ALWAYS
    * share a member (substitution → both drop the edited position;
    * insert/delete → the shorter string IS a deletion of the longer),
    * and sharing one implies distance ≤ 2 — so an equi-join on
    * variants plus one exact confirm replaces the O(n²) all-pairs
    * scan with |s|+1 generated keys per row. `array_distinct` folds
    * the duplicate variants repeated characters produce.
    */
  def deletionVariants(c: Column): Column =
    array_distinct(concat(
      array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1),
          c.substr(i + 1, length(c))))))

  /** Unordered pairs of `keyCol` values at edit distance exactly 1
    * (equal keys are exact-dedup's job, not this operator's).
    *
    * Plan shape: explode deletion variants [narrow, ≤ |s|+1 rows each]
    * → ONE shuffle gathering each variant's bucket → chained-explode
    * pair expansion inside the bucket (tree-shaped: a self-join would
    * recompute the variant branch per side — Catalyst cannot reuse the
    * exchange across alias renames) → `levenshtein ≤ 1` confirm →
    * distinct (a pair can share several variants). `maxBucket` prunes
    * degenerate hot variants (the skew guard; buckets that large mean
    * a near-constant key column, not typos).
    */
  def fuzzyPairs(input: DataFrame, keyCol: String,
                 maxBucket: Int = 1000): DataFrame = {
    variantBuckets(input, keyCol)
      .filter(size(col("ks")).between(2, maxBucket))
      .select(explode(col("ks")).as("k1"), col("ks"))
      .select(col("k1"), explode(col("ks")).as("k2"))
      // THRESHOLD-bounded levenshtein: the 3-arg form bails out of the
      // DP once the distance must exceed 1 — O(len·1) per pair instead
      // of O(len²), and the confirm step runs on every candidate pair
      // (it returns -1 above the threshold, so ≥ 0 keeps d ∈ {0, 1};
      // d = 0 is impossible under k1 < k2)
      .filter(col("k1") < col("k2") &&
        levenshtein(col("k1"), col("k2"), 1) >= 0)
      .distinct()
      .orderBy(col("k1"), col("k2"))
  }

  /** Variant-bucket build shared by [[fuzzyPairs]] and [[fuzzyDropped]]:
    * each deletion variant with the set of keys generating it.
    *
    * Variants are derived BEFORE the rename: with an input column
    * already named "k" the one-select form would read the alias as a
    * lateral column reference and fail analysis. explode_outer, not
    * explode: InferFiltersFromGenerate would substitute the variant
    * expression into an inferred size>0 Filter — computed twice per
    * row (the outer form is exempt; variants are never empty anyway).
    */
  private def variantBuckets(input: DataFrame, keyCol: String): DataFrame =
    input
      .withColumn("_dv", deletionVariants(col(keyCol)))
      .select(col(keyCol).as("k"), explode_outer(col("_dv")).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(collect_set(col("k")).as("ks"))

  /** Audit twin of [[fuzzyPairs]]'s maxBucket guard: the variant
    * buckets it drops whole, with their key count. A bucket over
    * `maxBucket` distinct keys means a near-constant key column, not
    * typos — but the pairs inside it are still silently suppressed;
    * this reports them. Empty output = nothing was suppressed.
    */
  def fuzzyDropped(input: DataFrame, keyCol: String,
                   maxBucket: Int = 1000): DataFrame =
    variantBuckets(input, keyCol)
      .select(col("v"), size(col("ks")).as("n_keys"))
      .filter(col("n_keys") > maxBucket)
      .orderBy(col("n_keys").desc, col("v"))

  /** Declared query: per customer name, how many OTHER names sit at
    * edit distance 1 (entity-resolution / typo-cluster signal on a key
    * column). Counts both pair directions, so `n_close` is the degree
    * of the name in the distance-1 graph — matching the oracle's
    * directed self-join count. */
  def fuzzyDedup(spark: SparkSession, sfDir: String): DataFrame =
    fuzzyPairs(
      Tables.customer(spark, sfDir).select(col("c_name")), "c_name")
      // one explode over both endpoints — a union of two selects would
      // recompute the whole pairs plan per branch
      .select(explode(array(col("k1"), col("k2"))).as("c_name"))
      .groupBy(col("c_name"))
      .agg(count(lit(1)).as("n_close"))
      .orderBy(col("c_name"))
}
