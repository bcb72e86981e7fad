package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over `embeddings.embedding: array<float>` (64-dim).
  *
  * Two paths, as a real 100 TB pipeline would ship them:
  *  - [[similarityTopk]]: exact brute-force cosine top-k for a small
  *    probe set — broadcast the probes, scan the corpus once, per-probe
  *    top-k via window. Cost O(|corpus|·|probes|·dim) but a single
  *    corpus scan, no shuffle of the corpus itself: this is the correct
  *    exact baseline even at scale when |probes| is small.
  *  - [[annLsh]]: random-hyperplane LSH bucketing — corpus and probes
  *    hash to sign-pattern buckets; candidates join per bucket; exact
  *    re-rank inside the bucket. Sub-linear candidate sets; the shuffle
  *    key is the bucket signature.
  *
  * Dot products fold left-to-right over the array (`aggregate`), giving
  * bit-reproducible doubles (same fold order as the DuckDB oracle's
  * list_reduce).
  */
object Similarity {

  /** Left-to-right fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native [[graft.functions.CosineSim]] expression
    * (bit-identical to [[cosineComposed]], which the spec cross-checks;
    * same fold order as the DuckDB oracle's list_reduce). Zero-norm
    * inputs yield 0.0, not NaN — see the CosineSim scaladoc.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cos(SparkSession.active, a, b)

  /** Builtin-composed cosine — reference implementation for the spec
    * (same zero-norm guard as the native expression).
    */
  def cosineComposed(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast(DoubleType))

  /** Exact cosine top-k: probes = vec_id < numProbes (stand-in for a
    * user-supplied query set), candidates = whole corpus minus self.
    * Probe side is broadcast — the corpus never shuffles for the join;
    * the only shuffle is the per-probe top-k window over k·|probes| rows
    * (pre-pruned: rank within probe partition).
    */
  def similarityTopk(spark: SparkSession, sfDir: String,
                     numProbes: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val scored = emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        cosine(col("pv"), col("v")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-0.5, 0.5). No RNG state → reproducible
    * across runs/executors with zero broadcast.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(100000L)).cast(DoubleType) / 100000.0) - 0.5

  /** Sign of ⟨v, plane_p⟩ for one hyperplane. */
  private def planeBit(v: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x * planeComponent(plane, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** LSH bucket signature: numPlanes sign bits packed into a long.
    * `planeOffset` selects an independent plane family — multi-table LSH
    * uses offsets t·numPlanes for table t. Computed by the native
    * [[graft.functions.HyperplaneSig]] expression (plane matrix cached
    * per task); [[lshSignatureComposed]] is the builtin-composed
    * reference implementation the spec cross-checks against.
    */
  def lshSignature(v: Column, numPlanes: Int = 8, planeOffset: Int = 0): Column =
    graft.functions.HyperplaneSig.sig(SparkSession.active, v, numPlanes, planeOffset)

  /** Builtin-composed LSH signature — same bits as [[lshSignature]]. */
  def lshSignatureComposed(v: Column, numPlanes: Int = 8, planeOffset: Int = 0): Column =
    (0 until numPlanes)
      .map(p => shiftleft(planeBit(v, planeOffset + p), p))
      .reduce(_.bitwiseOR(_))

  /** ANN via random-hyperplane LSH: bucket corpus + probes by signature,
    * exact cosine re-rank within the bucket, top-k per probe.
    *
    * Multi-probe: each probe additionally searches the `multiProbe`
    * buckets at Hamming distance 1 from its own signature (one sign bit
    * flipped) — near neighbors most often land one plane away, so recall
    * rises steeply for a (multiProbe+1)× probe-side fan-out while the
    * CORPUS side is bucketed exactly once (the scale-relevant cost).
    * Deterministic: bits are flipped in fixed order.
    */
  def annLsh(spark: SparkSession, sfDir: String,
             numProbes: Int = 10, k: Int = 5, numPlanes: Int = 6,
             multiProbe: Int = 6): DataFrame =
    lshSearch(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v")),
      numProbes, k, numPlanes, multiProbe)

  /** DataFrame-first core of [[annLsh]] over (vec_id, v: array<double>)
    * rows (probes = vec_id < numProbes).
    *
    * Parameter trade (SCALE.md documents the measured points):
    * `numPlanes` sets bucket granularity — candidates per probe scale
    * like |corpus|·(multiProbe+1)/2^numPlanes, so planes grow with the
    * corpus; `multiProbe` buys recall with probe-side fan-out only (the
    * corpus is bucketed exactly once — the scale-relevant cost).
    * Defaults probe all Hamming-1 buckets of a 6-bit signature: ~11% of
    * the corpus per probe, recall@5 ≈ 0.2 on ISOTROPIC-random vectors
    * (the worst case for any sublinear ANN) and ≥ 0.9 on data with real
    * near-neighbor structure (the planted-twin spec gate).
    */
  def lshSearch(input: DataFrame,
                numProbes: Int = 10, k: Int = 5, numPlanes: Int = 6,
                multiProbe: Int = 6): DataFrame = {
    val emb = input.withColumn("sig", lshSignature(col("v"), numPlanes))
    val probeSigs: Seq[Column] =
      col("sig") +: (0 until math.min(multiProbe, numPlanes)).map(b =>
        col("sig").bitwiseXOR(lit(1L << b)))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        explode(array(probeSigs: _*)).as("psig"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    // null-safe equality (<=>) is still a hash equi-join key but stops
    // Catalyst inferring isnotnull(sig) — which pushdown would alias-
    // substitute into a scan-level Filter re-running the signature
    // expression on every corpus row before the parallelize repartition.
    // broadcast(): the probe side is definitionally tiny (probes ×
    // (multiProbe+1) rows) but Catalyst ESTIMATES it from the corpus
    // relation it derives from — the round-5 scale probe caught the
    // planner flipping to a sort-merge join at 10× corpus, shuffling
    // every corpus row for a 70-row build side
    emb.join(broadcast(probes), col("sig") <=> col("psig"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        cosine(col("pv"), col("v")).as("sim"))
      // a candidate can match in several probed buckets — dedupe before
      // ranking (sim is a pure function of the pair, so distinct is exact)
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN: the corpus is coarsely partitioned into
    * cells; a probe searches only its `nprobe` nearest cells.
    *
    * Cell assignment here is the `label` column (standing in for an
    * offline-trained k-means coarse quantizer); centroids are the exact
    * per-cell mean vectors, computed distributively by position
    * (posexplode → per-(cell,pos) avg → re-assemble ordered array).
    *
    * Scale shape: the centroid table is tiny (cells × dim) → broadcast;
    * the corpus never shuffles — candidates are selected by a broadcast
    * semi-join on the cell id, and only candidate rows pay the exact
    * cosine. Wrong-cell misses are the recall trade-off (spec measures
    * recall against [[similarityTopk]]).
    */
  def annIvf(spark: SparkSession, sfDir: String,
             numProbes: Int = 10, k: Int = 5, nprobe: Int = 2): DataFrame =
    ivfSearch(
      Tables.parallelize(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"), col("label").as("cell"),
          asDouble(col("embedding")).as("v")),
      numProbes, k, nprobe)

  /** IVF with a trained coarse quantizer: seeded k-means (spark.ml)
    * assigns the cells instead of the label stand-in — the production
    * IVF layout where no natural partition exists.
    */
  def annIvfKmeans(spark: SparkSession, sfDir: String,
                   cells: Int = 10, numProbes: Int = 10,
                   k: Int = 5, nprobe: Int = 2): DataFrame =
    ivfKmeansSearch(
      Tables.parallelize(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"), asDouble(col("embedding")).as("v")),
      cells, numProbes, k, nprobe)

  /** DataFrame-first core of [[annIvfKmeans]]: the quantizer is fit
    * on a deterministic hash-sample by the exact-decimal k-means
    * ([[Dedup.assignCells]] — deterministic by construction at any
    * parallelism, the same scale-correct train/assign split as
    * SemDeDup), then the standard IVF search.
    */
  def ivfKmeansSearch(emb: DataFrame, cells: Int = 10,
                      numProbes: Int = 10, k: Int = 5,
                      nprobe: Int = 2): DataFrame =
    ivfSearch(
      Dedup.assignCells(emb, cells, sampleMod = 4)
        .select(col("vec_id"), col("cell"), col("v")),
      numProbes, k, nprobe)

  /** IVF search core over (vec_id, cell, v) rows. */
  def ivfSearch(input: DataFrame,
                numProbes: Int, k: Int, nprobe: Int): DataFrame = {
    val emb = input
    // Per-cell centroids via posexplode → (cell, pos) EXACT-DECIMAL
    // mean → reassemble (the embedding_centroid shape). Two shuffles
    // instead of Summarizer.mean's one — but the shuffled rows number
    // cells×dim (tiny at any corpus scale; the map-side partial agg
    // collapses the dim× row expansion before the exchange), and the
    // decimal accumulator makes the centroids — and so the whole
    // query — independent of shuffle-arrival order: float Summarizer
    // means vary in final ulps with partial-merge order, which is
    // invisible to rows-only checks but breaks the frozen-expected
    // oracle this query now carries.
    val centroids = emb
      .select(col("cell"), posexplode_outer(col("v")).as(Seq("pos", "val")))
      .filter(col("val").isNotNull)
      .groupBy(col("cell"), col("pos"))
      .agg(graft.Det.davg(col("val")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    // Probe → nprobe nearest cells (centroid table broadcast).
    val wCell = Window.partitionBy(col("probe_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probeCells = probes.join(broadcast(centroids))
      .select(col("probe_id"), col("pv"), col("cell"),
        cosine(col("pv"), col("cv")).as("csim"))
      .withColumn("crank", row_number().over(wCell))
      .filter(col("crank") <= nprobe)
      .select(col("probe_id"), col("pv"), col("cell"))
    // Exact re-rank inside the selected cells only.
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    emb.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        cosine(col("pv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** IVF with int8 residual quantization — the memory-compressed ANN
    * index a 100 TB embedding store actually serves from (FAISS
    * IVF+SQ8 shape: Johnson et al., "Billion-scale similarity search
    * with GPUs", and the reference's ANN surface re-expressed for
    * Spark). The corpus is coarsely quantized into `cells` by the
    * deterministic exact-decimal k-means ([[Dedup.fitCenters]]), each
    * vector is stored as its cell id plus the int8-coded RESIDUAL
    * (v − centroid): 1 byte/dim instead of 8 — the index for a
    * 100 TB float corpus fits in ~12.5 TB and each query touches only
    * `nprobe` cells of it.
    *
    * Search is asymmetric (ADC): the probe stays full-precision; each
    * candidate is reconstructed as centroid + dequantized residual
    * (mid-rise: mn + (code+0.5)·w) and scored by exact cosine against
    * the probe. Reconstruction error ≤ half a quantization step per
    * dimension, so ranking matches the float index except at
    * near-ties (the spec bounds |sim − exact cos| and floors planted
    * recall alongside the float IVF).
    *
    * Scale shape: fit touches a bounded hash-sample; calibration is
    * one posexplode pass collapsed map-side to dims rows; coding is a
    * per-row expression (corpus never shuffles); search = broadcast of
    * (probe × nprobe) cell picks into the index, exact re-rank on the
    * candidates only. The only corpus-wide shuffle anywhere is the
    * calibration agg's dims-row exchange.
    *
    * Determinism (frozen-expected oracle): centers are deterministic
    * by construction (salted-hash init + DECIMAL means), codes are
    * integer outputs of single fixed-order IEEE expressions, min/max
    * calibration is order-independent, reconstruction + cosine are
    * per-row fixed-fold, ranks tie-break on cand_id.
    */
  def ivfRqSearch(emb: DataFrame, cells: Int = 10, numProbes: Int = 10,
                  k: Int = 5, nprobe: Int = 2,
                  sampleMod: Int = 4): DataFrame = {
    val centers = Dedup.fitCenters(emb, cells, sampleMod)
    val centersLit = typedlit(centers.map(_.toSeq).toSeq)
    val assigned = emb.select(
        graft.functions.NearestCentroid
          .nearestCentroid(emb.sparkSession, col("v"), centers).as("cell"),
        col("vec_id"), col("v"))
      .withColumn("r",
        zip_with(col("v"), element_at(centersLit, col("cell") + 1),
          (x, c) => x - c))
    // Per-dimension residual calibration: one posexplode pass whose
    // map-side partial collapses to dims rows before the exchange,
    // folded to a single (mins, maxs) row and broadcast back.
    val calibRow = assigned
      .select(posexplode_outer(col("r")).as(Seq("pos", "val")))
      .filter(col("val").isNotNull)
      .groupBy(col("pos"))
      .agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("mins"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("maxs"))
    val codes = transform(sequence(lit(1), size(col("r"))), i => {
      val x  = element_at(col("r"), i)
      val mn = element_at(col("mins"), i)
      val mx = element_at(col("maxs"), i)
      when(mx === mn, lit(0L)).otherwise(
        least(greatest(floor((x - mn) * lit(255.0) / (mx - mn)), lit(0L)),
          lit(255L)))
    })
    // The compressed index: (vec_id, cell, codes) — at scale this is
    // the table that persists; v and r never leave the build stage.
    val index = assigned.crossJoin(broadcast(calibRow))
      .withColumn("codes", codes)
      .select(col("vec_id"), col("cell"), col("codes"))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    // Probe → nprobe nearest cells by cosine against the FIT centers
    // (driver-side literal table — cells × dims doubles).
    import emb.sparkSession.implicits._
    val centroidDf = centers.zipWithIndex.toSeq
      .map { case (cv, i) => (i, cv.toSeq) }.toDF("cell", "cv")
    val wCell = Window.partitionBy(col("probe_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probeCells = probes.join(broadcast(centroidDf))
      .select(col("probe_id"), col("pv"), col("cell"),
        cosine(col("pv"), col("cv")).as("csim"))
      .withColumn("crank", row_number().over(wCell))
      .filter(col("crank") <= nprobe)
      .select(col("probe_id"), col("pv"), col("cell"))
    // ADC re-rank: reconstruct centroid + mid-rise dequantized residual.
    val recon = transform(sequence(lit(1), size(col("codes"))), i => {
      val cvi  = element_at(element_at(centersLit, col("cell") + 1), i)
      val mn   = element_at(col("mins"), i)
      val mx   = element_at(col("maxs"), i)
      val code = element_at(col("codes"), i)
      cvi + when(mx === mn, mn).otherwise(
        mn + (code.cast(DoubleType) + 0.5) * (mx - mn) / 255.0)
    })
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    // null-safe equality (<=>) is still a hash equi-join key but stops
    // Catalyst inferring isnotnull(cell) — which alias-substitution
    // would push into a scan-level Filter re-running the
    // NearestCentroid kernel on every corpus row (the lshSearch trap)
    index.join(broadcast(probeCells.withColumnRenamed("cell", "pcell")),
        col("cell") <=> col("pcell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .crossJoin(broadcast(calibRow))
      .withColumn("recon", recon)
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        cosine(col("pv"), col("recon")).as("sim"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Declared query: IVF-RQ over the fixture corpus (same probe/k
    * contract as [[annIvf]]/[[annIvfKmeans]]).
    */
  def annIvfRq(spark: SparkSession, sfDir: String,
               cells: Int = 10, numProbes: Int = 10,
               k: Int = 5, nprobe: Int = 2): DataFrame =
    ivfRqSearch(
      Tables.parallelize(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"), asDouble(col("embedding")).as("v")),
      cells, numProbes, k, nprobe)

  /** Corpus-level embedding stats: per label, centroid norm and count —
    * the aggregation shape used for IVF coarse-centroid training
    * (element-wise array mean via per-dimension exact sums).
    */
  def embeddingStats(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("label"), asDouble(col("embedding")).as("v"))
    emb.groupBy(col("label"))
      .agg(
        count(lit(1)).as("vectors"),
        graft.Det.davg(norm(col("v"))).as("avg_norm"))
      .orderBy(col("label"))
  }

  /** Per-label, per-dimension embedding centroids — the class-centroid
    * diagnostic an embedding-space curation pass runs (drift detection,
    * nearest-centroid labeling, IVF seeding). Emitted as (label, pos,
    * centroid) rows rather than reassembled arrays: the flat form is
    * what downstream joins want, and each dimension's mean goes through
    * the exact decimal accumulator ([[graft.Det.davg]]) so the result
    * is independent of partition/accumulation order — float summation
    * order would otherwise make the hash nondeterministic.
    *
    * Plan shape: one posexplode pass (dim × rows, map-side) into a
    * partial+final aggregation on (label, pos) — cardinality
    * labels × dims, tiny at any corpus scale. posexplode_outer keeps
    * Catalyst's generator-filter inference from pushing an
    * is-not-empty probe of the array child below the scan.
    */
  def embeddingCentroids(spark: SparkSession, sfDir: String): DataFrame =
    embeddingCentroidsOf(Tables.embeddings(spark, sfDir))

  /** DataFrame-first core over (label, embedding) rows. */
  def embeddingCentroidsOf(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode_outer(col("embedding")).as(Seq("pos", "val")))
      .filter(col("val").isNotNull)
      .groupBy(col("label"), col("pos"))
      .agg(
        graft.Det.davg(col("val").cast(DoubleType)).as("centroid"),
        // count of NON-NULL values per dimension — matches the mean's
        // denominator and the oracle's COUNT(val) even if an embedding
        // carries null elements
        count(col("val")).as("vectors"))
      .orderBy(col("label"), col("pos"))

  /** Int8 scalar quantization of the embedding column with data-derived
    * per-dimension calibration — the compression step a 100 TB embedding
    * store runs before indexing (4× smaller than float32; IVF/ANN then
    * scans codes, not floats). Each dimension is affinely mapped to
    * [0, 255] by its global [min, max]; a constant dimension maps to 0.
    * Emitted as integer code diagnostics (sum/min/max per vector) so the
    * declared output is exact: every float op here is a single
    * per-element IEEE expression with a fixed evaluation order —
    * bit-identical across engines — and the aggregated outputs are pure
    * long arithmetic.
    *
    * Plan: calibration = one posexplode pass into a partial+final
    * (pos → min/max) aggregate — 1 row per dimension — folded to a
    * single array row and BROADCAST back; quantization is then a
    * per-row codegen'd `transform` over the original (never-exploded,
    * never-shuffled) vectors. Total cost at scale: one corpus scan for
    * calibration + one for coding, zero data shuffles.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = asDouble(col("embedding"))
    val ex = emb
      .select(posexplode_outer(v).as(Seq("pos", "val")))
      .filter(col("val").isNotNull)
    val calib = ex.groupBy(col("pos"))
      .agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
    val calibRow = calib.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
        s => s.getField("mn")).as("mins"),
      transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
        s => s.getField("mx")).as("maxs"))
    val codes = transform(sequence(lit(1), size(col("v"))), i => {
      val x  = element_at(col("v"), i)
      val mn = element_at(col("mins"), i)
      val mx = element_at(col("maxs"), i)
      when(mx === mn, lit(0L)).otherwise(
        least(greatest(floor((x - mn) * lit(255.0) / (mx - mn)), lit(0L)),
          lit(255L)))
    })
    emb.select(col("vec_id"), col("label"), v.as("v"))
      .crossJoin(broadcast(calibRow))
      .withColumn("codes", codes)
      .select(col("vec_id"), col("label"),
        size(col("v")).as("n_dims"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"))
      .orderBy(col("vec_id"))
  }

  def embeddingQuantize(spark: SparkSession, sfDir: String): DataFrame =
    quantizeInt8(Tables.embeddings(spark, sfDir))

  /** Seeded random-sign projection (Achlioptas'01 / Johnson–Lindenstrauss
    * dense ±1 variant): reduce `embedding` to `outDims` dimensions with
    * a pseudo-random {-1, 0, +1} matrix derived from an integer LCG on
    * the (input-dim, output-dim) index pair — the dimensionality cut a
    * pipeline applies before ANN indexing or pairwise dedup when 64+
    * dims are overkill. No materialized matrix, no randomness source:
    * the "matrix" is arithmetic on the indices, so any engine (and the
    * DuckDB oracle) regenerates it exactly.
    *
    * Determinism: sign(i,j) is pure BIGINT arithmetic; each output
    * coordinate is a fixed left-to-right fold of per-element IEEE
    * doubles (same order as the oracle's 0.0-prepended list_reduce) —
    * bit-identical at any parallelism. Output is long form
    * (vec_id, dim, val) with a total order on (vec_id, dim).
    *
    * Plan: per-row expression over the source array — one corpus scan,
    * ZERO shuffles (the sort at the end is the declared-determinism
    * tail, not part of the operator). At 100 TB this is the ideal
    * shape: embarrassingly parallel, O(inDims · outDims) flops per row,
    * vectors never leave their partition.
    */
  def projectSigns(emb: DataFrame, outDims: Int): DataFrame = {
    require(outDims >= 1, "projectSigns: outDims must be >= 1")
    val sign: (Column, Column) => Column = (i, j) =>
      (((lit(1103515245L) * (i * lit(outDims.toLong) + j) + lit(12345L))
        % lit(2147483648L)) % lit(3L) - lit(1L)).cast(DoubleType)
    val proj = transform(sequence(lit(0L), lit((outDims - 1).toLong)), j =>
      aggregate(
        sequence(lit(0L), (size(col("embedding")) - 1).cast(LongType)),
        lit(0.0),
        (acc, i) => acc +
          element_at(col("embedding"), (i + 1).cast(IntegerType))
            .cast(DoubleType) * sign(i, j)))
    emb.filter(size(col("embedding")) > 0)
      .select(col("vec_id"), posexplode(proj).as(Seq("dim", "val")))
      .select(col("vec_id"), col("dim").cast(LongType).as("dim"), col("val"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** Declared query: 64-dim fixture embeddings down to 16 dims. */
  def embeddingProject(spark: SparkSession, sfDir: String,
                       outDims: Int = 16): DataFrame =
    projectSigns(Tables.embeddings(spark, sfDir), outDims)

  /** Exact k-NN graph WITHIN partition cells (here the `label` column —
    * in the full pipeline, the IVF cell id from [[annIvf]]'s quantizer):
    * each vector's top-k cosine neighbors among its cell's members. This
    * is the in-cell exact refinement step every cell-partitioned ANN
    * system runs after coarse quantization, and the graph a semantic
    * dedup / diversity-sampling stage consumes.
    *
    * Scale shape: ONE shuffle of the corpus on the cell key, then a
    * per-cell self-join — cost Σ|cell|², bounded by the quantizer's cell
    * size (the reason k-NN graphs are built per-cell and not all-pairs:
    * at 100 TB an all-pairs join is 10²⁴ row pairs; cells cap it at
    * |cell|·|corpus|). Skewed cells → AQE skew-join split, and the cell
    * width is the quantizer's k knob. Per-vector top-k via window inside
    * the cell partition; native codegen'd [[graft.functions.CosineSim]]
    * per pair.
    */
  def knnWithinCell(emb: DataFrame, cellCol: String, k: Int): DataFrame = {
    val v = emb.select(col("vec_id"), col(cellCol).as("cell"),
      asDouble(col("embedding")).as("v"))
    val pairs = v.select(col("vec_id"), col("cell"), col("v"))
      .join(v.select(col("vec_id").as("neighbor_id"), col("cell"),
        col("v").as("nv")), Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosine(col("v"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Declared query: top-3 in-label neighbors over the fixture corpus. */
  def embeddingKnn(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    knnWithinCell(Tables.embeddings(spark, sfDir), "label", k)
}
