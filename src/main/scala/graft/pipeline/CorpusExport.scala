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
    */
  def shardCol(n: Int, salt: String = "shard"): Column = {
    // the threshold ladder is an (n-1)-branch CASE: exact, and the same
    // expression an ANSI oracle can state. Codegen splits oversized
    // methods automatically, but a many-thousand-way export should
    // shard hierarchically (two nested ladders of √n) rather than lean
    // on one giant CASE — hence the cap.
    require(n >= 1 && n <= 4096, s"numShards $n out of range")
    val prefix = substring(
      md5(concat(lit(salt + ":"), col("doc_id").cast(StringType))), 1, 8)
    val thresholds = (1 until n).map(k => f"${(k.toLong << 32) / n}%08x")
    thresholds.zipWithIndex.reverse.foldLeft(lit(n - 1): Column) {
      case (acc, (t, i)) => when(prefix < lit(t), lit(i)).otherwise(acc)
    }
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
