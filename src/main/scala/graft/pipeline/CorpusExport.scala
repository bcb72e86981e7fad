package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sharded corpus export — the last mile of the
  * training-data pipeline: after curation/packing, data loaders want N
  * stable shard files plus a manifest with per-shard accounting, and the
  * SAME corpus must produce byte-identical shards on every run (resume,
  * re-export, multi-site reproduction).
  *
  * Shard assignment is a pure function of doc_id (salted-md5 equal-width
  * buckets — the house corpus-op coin, same family as
  * [[graft.ops.Curate]]'s split/shuffle/mix), so:
  *  - no shuffle is needed to DECIDE placement (map-only, any
  *    parallelism, any partitioning of the input);
  *  - assignment survives reruns, added executors, and input
  *    re-splitting — only NEW doc_ids change the picture;
  *  - the DuckDB oracle recomputes the full manifest independently
  *    (`export_manifest` is hash-gated like any relational query).
  *
  * The physical export pays the one unavoidable shuffle (repartition by
  * shard) so each shard lands as one contiguous file set, sorted by
  * doc_id within the shard for reproducible bytes.
  */
object CorpusExport {

  /** Deterministic shard id in [0, n): first 8 md5 hex chars of the
    * salted doc_id, bucketed by equal-width thresholds. Hex-string
    * comparison IS unsigned-32-bit comparison here (same length, same
    * alphabet), which is what makes the same ladder expressible in
    * ANSI SQL without hex parsing.
    *
    * Two physical forms of ONE function (the spec proves them equal):
    *
    *  - small n: the (n−1)-branch threshold CASE — the form an ANSI
    *    oracle states verbatim (`export_manifest`, n=8). Capped at 64:
    *    Spark 4's column-node converter recurses per nested
    *    when/otherwise, and a many-hundred-branch chain overflows the
    *    stack before codegen even sees it (measured at 512);
    *  - larger n: closed arithmetic — shard = ⌊(u·n + n−1) / 2³²⌋ with
    *    u the prefix as an unsigned 32-bit integer. Counting the CASE's
    *    thresholds t_k = ⌊k·2³²/n⌋ with t_k ≤ u gives exactly
    *    ⌈(u+1)·n/2³²⌉ − 1 = that expression, so the arithmetic form IS
    *    the ladder, O(1) per row. This supersedes the two-level √n
    *    nested-CASE sketch the cap comment used to carry: same
    *    function, no ~2√n comparison chain, no deep expression tree —
    *    a 100k-shard export costs one multiply-shift per row.
    *
    * Because the two forms are the same function, the cutoff is purely
    * physical — moving it can never re-shard an existing corpus.
    */
  def shardCol(n: Int, salt: String = "shard"): Column = {
    require(n >= 1 && n <= (1 << 20), s"numShards $n out of range")
    if (n <= 64) shardColLadder(n, salt) else shardColArith(n, salt)
  }

  private def saltedPrefix(salt: String): Column = substring(
    md5(concat(lit(salt + ":"), col("doc_id").cast(StringType))), 1, 8)

  /** The explicit threshold CASE (oracle-stateable form). */
  private[graft] def shardColLadder(n: Int, salt: String = "shard"): Column = {
    val prefix = saltedPrefix(salt)
    val thresholds = (1 until n).map(k => f"${(k.toLong << 32) / n}%08x")
    thresholds.zipWithIndex.reverse.foldLeft(lit(n - 1): Column) {
      case (acc, (t, i)) => when(prefix < lit(t), lit(i)).otherwise(acc)
    }
  }

  /** The closed arithmetic form — identical function, any n. u·n + n
    * stays < 2⁵² for n ≤ 2²⁰: exact long arithmetic, no overflow.
    */
  private[graft] def shardColArith(n: Int, salt: String = "shard"): Column = {
    val u = conv(saltedPrefix(salt), 16, 10).cast(LongType)
    shiftright(u * lit(n.toLong) + lit(n.toLong - 1L), 32).cast(IntegerType)
  }

  /** Per-shard accounting over the documents table: doc count, token
    * count (same tokenizer as seq_pack), and a doc_id checksum so a
    * lost/duplicated document is visible per shard, not just globally.
    */
  def manifestOf(docs: DataFrame, numShards: Int): DataFrame =
    docs.select(
        shardCol(numShards).as("shard"),
        col("doc_id"),
        graft.ops.Text.tokenCount(col("text")).cast(LongType).as("n_tokens"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("doc_id")).as("doc_checksum"))
      .orderBy(col("shard"))

  /** Declared query: the manifest the export below writes. */
  def exportManifest(spark: SparkSession, sfDir: String,
                     numShards: Int = 8): DataFrame =
    manifestOf(Tables.documents(spark, sfDir), numShards)

  /** Write the corpus as `numShards` stable shard directories
    * (`shard=K/`) under `outDir` plus a `_manifest` JSON, and return the
    * manifest. `format` is any batch sink ("parquet", "json" for JSONL
    * shards). One repartition co-locates each shard into one task; the
    * within-shard sort makes file contents reproducible byte-for-byte.
    */
  def exportShards(spark: SparkSession, sfDir: String, outDir: String,
                   numShards: Int = 8, format: String = "parquet"): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.withColumn("shard", shardCol(numShards))
      // range, not hash: hashing N distinct shard ids over N partitions
      // collides (birthday) — ~1/e of tasks idle and some carry two
      // shards' bytes; the range split lands shards 1:1. Shard-dir
      // BYTES are reproducible either way (partitionBy splits by value,
      // the sort orders within), this is purely task balance.
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.partitionBy("shard").mode("overwrite").format(format)
      .save(outDir)
    val m = exportManifest(spark, sfDir, numShards)
    m.coalesce(1).write.mode("overwrite").json(s"$outDir/_manifest")
    m
  }
}
