package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe harness: measures how the dedup-family queries scale
  * from sf0.1 to a synthesized 10× corpus (the "sf1 analog"), in ONE
  * JVM so both points share warm-up state. Evidence for the SCALE.md
  * claims that the declared plans are ~linear in the input — a plan
  * that quietly went quadratic (a lost pushdown, a degenerate bucket)
  * shows up here as a super-linear sec or shuffle-bytes ratio long
  * before it shows up on a cluster.
  *
  * The 10× corpus is derived, not fabricated: each replica k shifts the
  * ids into a disjoint range and makes the content DISSIMILAR to every
  * other replica — documents through a per-replica character rotation
  * (`translate` over 10 letters; replica 0 is the identity) so replicas
  * of one doc share almost no shingles, customer names through a 2-char
  * replica suffix so replicas sit at edit distance 2. A plain suffix is
  * NOT enough for the n-gram family: it leaves the text body identical,
  * every doc gains 9 near-clones, posting-list sizes multiply by 10 and
  * candidate pairs by ~100 — the probe would then measure a duplicate-
  * saturated workload, not the plan's scaling. With dissimilar replicas
  * the per-replica duplicate structure is preserved and output sizes
  * scale ~10×. Everything is column-derived, deterministic, and written
  * once to the probe dir in the fixture layout, so the declared queries
  * run against it unchanged.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleProbe
  *   /root/testdata/sf0.1 /tmp/graft_sf1 [factor]"
  * Prints one JSON line per query with sec + shuffle bytes at both
  * scales and the ratios. Results table lives in SCALE.md.
  */
object ScaleProbe {

  /** Accumulates shuffle write bytes across completed stages. */
  private final class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private val Queries = Seq(
    "dedup_ngram", "dedup_clusters", "fuzzy_dedup", "seq_pack",
    "quality_filter", "dedup_exact", "dedup_embedding", "similarity_ann_lsh",
    // iterative family: per-iteration edge shuffle must scale with the
    // edge count, not super-linearly (round-5 verdict #5)
    "pagerank_copurchase",
    // the round-5 fix's core claim, measured: fit cost is bounded by
    // sampleMod (constant), assignment is narrow codegen — shuffle
    // bytes must scale ~linearly with the corpus
    "dedup_semantic",
    // round-6 text/curation family: the two map-only ops must show
    // ~zero shuffle growth; the two counting ops shuffle distinct
    // keys (sub-linear in rows once vocab saturates), never occurrences
    "doc_chunk", "domain_resample", "unigram_nll", "bigram_pmi",
    // bigram pair keys grow faster than unigram vocab (pair space) but
    // the shuffle still carries distinct (doc,a,b) keys, never
    // occurrences, and the V_b branch reuses the pair exchange
    "bigram_nll",
    // round-8 additions: export assignment is map-only (shuffle carries
    // 8 shard rows); histogram state shuffles (month, bin) cells —
    // sub-linear once the bin space saturates
    "export_manifest", "quantile_histogram_rollup",
    // round-9 additions: merge cost must track the TOUCHED fraction
    // (update keys mod 97 → ~1% of rows; the rewrite reads candidate
    // files once + stages the touched rewrite); the log-bin sketch
    // state shuffles (month, bin) cells like the histogram — saturating
    // bin space, sub-linear shuffle growth
    "merge_upsert", "quantile_sketch_rollup",
    // round-10 additions: the zorder rewrite is one range-shuffle of
    // the table (shuffle ~linear in rows); the column-mapping
    // lifecycle is metadata + three loads (shuffle ~0 growth beyond
    // the loads' own staging); the NDV index adds one sketch pass per
    // commit whose shuffle carries (file, col) sketch rows — constant
    // cells, never occurrences
    "zorder_optimize", "column_mapping", "ndv_stats",
    // round-11 additions: the keyless predicate UPDATE's cost must
    // track the MATCHING-file fraction (stats pre-prune + filter-pushed
    // detection + CoW rewrite of touched files only); the SQL-text
    // merge must match merge_upsert's shape (same engine underneath —
    // the parser adds driver-side O(1))
    "update_where", "sql_merge_upsert",
    // the incremental-cluster lifecycle: the declared query's cost is
    // dominated by the initial load + first full cluster (linear); the
    // second (incremental) run must stay O(appended batch + overlap)
    "cluster_incremental",
    // round-12 additions: replaceWhere's cost must track the SLICE
    // fraction (stats-pruned detection + slice rewrite + batch stage,
    // never the whole table beyond the fixture's own base write); the
    // catalog lifecycle adds name RESOLUTION (driver-side O(1) against
    // the registry) on top of the same CTAS/UPDATE/MERGE/INSERT
    // engine ops — shuffle must match the path-addressed equivalents
    "replace_where", "catalog_table_verbs",
    // round-13 additions: the named-format lifecycle is the SAME
    // engine ops (overwrite + tagged append + replaceWhere) behind the
    // format facade — shuffle must match the path-addressed
    // equivalents; the evolving merge's cost must track the touched
    // fraction exactly like merge_upsert (evolution is a schema
    // metadata change + NULL-fill projection, never a table rewrite);
    // the image-aware gold fold reads O(changed files) per upstream
    // commit and aggregates at group cardinality
    "format_roundtrip", "merge_evolution", "feed_gold_images",
    // late round-13 additions: the CDF range read costs O(touched
    // files per version in range) — here the append's own files plus
    // the delete's rewrites, linear in DATA via the probe's base
    // write, never a two-snapshot diff; ADD COLUMNS is ONE metadata
    // commit (zero data files — the probe's cost is the base write +
    // populated append); SQL time travel on names resolves
    // version→scan in driver metadata (cost = the CTAS/INSERT
    // lifecycle's own staging); the startingVersion drain reads the
    // at-or-after-floor versions' files only — v1's bootstrap never
    // enters a batch, which must show as sub-proportional cost when
    // the skipped fraction grows
    "cdf_read_options", "add_columns", "catalog_time_travel",
    "stream_feed_from",
    // COPY INTO: per-run cost = listing + ledger diff (driver, O(dump
    // files)) + staging the NEW files' rows — linear in the landed
    // data, flat in the table and in the ledger's past
    "copy_into",
    // CONVERT: adoption is ONE manifest write (O(files) names, zero
    // data moved) — the probe's cost is the fixture dump's own write
    // plus the post-convert merge's touched-file CoW
    "convert_table",
    // V2 writer: the writeTo lifecycle is the SAME engine ops (empty
    // declare + write + append + replaceWhere) behind Spark's
    // V1-fallback write exec — shuffle must match the path-addressed
    // equivalents; the builder adds analysis-time dispatch only
    "writer_v2",
    // TBLPROPERTIES: each SET/UNSET is ONE metadata commit touching
    // zero data files — the probe's wall is the base write; property
    // cost must be flat in data at any scale
    "table_properties",
    // fluent handle: the DML lifecycle (update + 2 merges + delete) is
    // the SAME CoW engine ops as the SQL verbs — cost tracks the
    // touched fraction like merge_upsert, never the table beyond the
    // probe's own base write
    "fluent_table_verbs",
    // GENERATE: manifest export is driver metadata (O(files) names,
    // zero data read); the probe's wall is the base write + delete
    // rewrite + the read-back through the exported URIs (linear in
    // DATA — the read IS the point)
    "symlink_manifest",
    // multi-clause MERGE: the claim cascade compiles into ONE keyed
    // CoW merge — shuffle/cost must match sql_merge_upsert's shape
    // (same engine; clauses are projection-level, zero extra passes)
    "merge_multi_clause",
    // round-14 additions. DEEP CLONE: cost is the distributed file
    // copy — O(data) executor I/O by definition — plus O(files)
    // driver metadata; wall must scale ~linearly with data and carry
    // ~ZERO shuffle growth (a copy is not an exchange)
    "deep_clone",
    // BY SOURCE merge: one base scan + one anti-join + the claimed
    // rows' CoW rewrite — linear in the base, shuffle dominated by
    // the probe's own base write like merge_upsert
    "merge_by_source",
    // column DEFAULTs: declaration is ONE metadata commit (flat in
    // data); the fill is a write-side projection on the inserted
    // slice only — cost tracks the INSERT's own rows, never the table
    "column_defaults",
    // round-15 additions: composite keys must cost no extra exchange
    // (same confirm/carry shuffles keyed on N columns, intersected
    // prune); the residual evaluates inside the resolution join and
    // the keyed-carry window rides its partitioning
    "merge_composite_key", "merge_residual_on")

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val probeDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- materialize the scaled corpus (idempotent) ----
    // regenerate unless EVERY table committed (a _SUCCESS-bearing dir)
    // AND the recorded factor matches: gating on one table's existence
    // would let a crashed half-run be silently reused, and reusing a
    // corpus generated with a DIFFERENT factor would report ratios for
    // the wrong scale (round-5 advice)
    val factorFile = java.nio.file.Paths.get(s"$probeDir/_factor")
    val recordedFactor =
      try java.nio.file.Files.readString(factorFile).trim.toInt
      catch { case _: Throwable => -1 }
    val complete = recordedFactor == factor &&
      Seq("documents", "customer", "embeddings", "lineitem", "orders")
        .forall(t =>
          new java.io.File(s"$probeDir/$t.parquet/_SUCCESS").exists())
    if (!complete) {
      // stale marker first: a crash mid-regeneration must read as
      // incomplete, never as the old factor's corpus
      java.nio.file.Files.createDirectories(factorFile.getParent)
      java.nio.file.Files.deleteIfExists(factorFile)
      val docs = Tables.documents(spark, baseDir)
      // two independent 10-letter rotations → 100 distinct per-replica
      // text transforms (replica 0 = identity)
      val r1 = "abcdefghij"
      val r2 = "klmnopqrst"
      def rotate(s: String, k: Int) = s.drop(k) + s.take(k)
      val scaledDocs = (0 until factor).map { k =>
        docs.select(
          (col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id"),
          translate(translate(col("text"), r1, rotate(r1, k % 10)),
            r2, rotate(r2, (k / 10) % 10)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      scaledDocs.write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
      // embeddings: replica k > 0 adds deterministic hash-noise per
      // (vec_id, replica, dim) and renormalizes. Noise amplitude 1.2
      // puts a replica at cos ≈ 0.34 to its original — just BELOW the
      // 0.4 near-dup threshold (|noise|² ≈ d·1.2²/12 ≈ 7.7 on a unit
      // vector → cos ≈ 1/√8.7): replicas are dissimilar enough that
      // pair density does not explode quadratically (a 0.5 amplitude
      // left replicas at cos ≈ 0.87 — every vector gained 9 in-band
      // clones and bucket sizes measured 13.8× at 10×, the same
      // duplicate-saturation trap as the text suffix). Probes
      // (vec_id < 10) stay the replica-0 originals.
      val emb = Tables.embeddings(spark, baseDir)
      val scaledEmb = (0 until factor).map { k =>
        if (k == 0)
          emb.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("embedding"),
            col("label"))
        else {
          val noisy = transform(col("embedding"), (x, i) =>
            x.cast("double") + lit(1.2) *
              (pmod(xxhash64(col("vec_id"), lit(k), i), lit(1000L))
                .cast("double") / 1000.0 - 0.5))
          emb
            .select((col("vec_id") + lit(k.toLong * 1000000000L)).as("vec_id"),
              noisy.as("nv"), col("label"))
            .withColumn("nn",
              sqrt(aggregate(col("nv"), lit(0.0), (a, x) => a + x * x)))
            .select(col("vec_id"),
              transform(col("nv"), x => x / col("nn")).as("embedding"),
              col("label"))
        }
      }.reduce(_ unionByName _)
      scaledEmb.write.mode("overwrite").parquet(s"$probeDir/embeddings.parquet")
      val cust = Tables.customer(spark, baseDir)
      val scaledCust = (0 until factor).map { k =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(k.toLong * 1000000000L))
          // 2-char suffix: replicas of one name sit at edit distance 2 —
          // no cross-replica distance-1 pairs, per-replica pairs intact
          .withColumn("c_name", concat(col("c_name"), lit(s"$k$k")))
      }.reduce(_ unionByName _)
      scaledCust.write.mode("overwrite").parquet(s"$probeDir/customer.parquet")
      // lineitem, basket columns only (pagerank_copurchase projects just
      // these — column pruning makes the rest dead weight): each replica
      // shifts BOTH the basket key and the item key into a disjoint
      // range, so the co-purchase graph becomes `factor` disjoint copies
      // — edges scale by `factor`, per-replica graph structure intact
      // (the same disjoint-replica discipline as the other tables).
      // (r15: plus the composite-merge columns — linenumber/quantity/
      // returnflag carry verbatim so merge_composite_key's per-pair
      // key structure replicates per disjoint key range)
      val li = Tables.lineitem(spark, baseDir)
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      val scaledLi = (0 until factor).map { k =>
        li.select(
          (col("l_orderkey") + lit(k.toLong * 1000000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(k.toLong * 1000000000L)).as("l_partkey"),
          col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      }.reduce(_ unionByName _)
      scaledLi.write.mode("overwrite").parquet(s"$probeDir/lineitem.parquet")
      // orders: keys shift into disjoint ranges, dates/values unchanged —
      // per-day order volume scales by `factor`, the histogram bin space
      // does NOT (same value distribution), which is exactly the
      // saturation the quantile-state probe should exhibit
      val ord = Tables.orders(spark, baseDir)
      val scaledOrd = (0 until factor).map { k =>
        ord
          .withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 1000000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(k.toLong * 1000000000L))
      }.reduce(_ unionByName _)
      scaledOrd.write.mode("overwrite").parquet(s"$probeDir/orders.parquet")
      // marker last: its presence certifies a COMPLETE corpus at `factor`
      java.nio.file.Files.writeString(factorFile, factor.toString)
    }

    // Dev-only subset filter (the Bench/Verify convention): re-probing
    // one new query at 100× must not re-run the whole family.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val probed = only match {
      case Some(names) => Queries.filter(names)
      case None        => Queries
    }

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def run(name: String, dir: String): (Double, Long) = {
      // settle the async listener queue so the previous query's stage
      // events don't bleed into this query's meter (the public API has
      // no flush; stage-completed events trail the action by <100 ms)
      Thread.sleep(500)
      meter.bytes.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      (sec, meter.bytes.get())
    }

    // warm-up (JIT + codegen) on the small scale, untimed
    probed.foreach(q => try SparkEntry.queries(q)(spark, baseDir).count()
      catch { case _: Throwable => () })

    probed.foreach { q =>
      val (s1, b1) = run(q, baseDir)
      val (s2, b2) = run(q, probeDir)
      val secRatio = if (s1 > 0) s2 / s1 else Double.NaN
      val byteRatio = if (b1 > 0) b2.toDouble / b1 else Double.NaN
      println(f"""{"query":"$q","sf01_sec":$s1%.2f,"sf1_sec":$s2%.2f,"sec_ratio":$secRatio%.2f,"sf01_shuffle_mb":${b1 / 1e6}%.1f,"sf1_shuffle_mb":${b2 / 1e6}%.1f,"shuffle_ratio":$byteRatio%.2f}""")
    }
    spark.stop()
  }
}
