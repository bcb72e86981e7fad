package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File sources/sinks beyond parquet — the reference's ingest boundary.
  *
  * CSV scan with header + schema inference is the reference's bronze
  * input (`src/etl_pipeline.py:49-51`); its dataset-prep step writes CSV
  * back out (`src/download_dataset.py:9`).
  *
  * Scale guidance encoded here: prefer [[Csv.read]] with an explicit
  * schema — `inferSchema=true` costs an extra full pass over the input
  * before the first real job (at 100 TB that is a second 100 TB scan),
  * and inferred types can drift between daily drops. [[Csv.readInferred]]
  * exists for reference-parity exploration only.
  */
object Csv {

  /** Header-aware CSV scan with a pinned schema — single pass, stable
    * types, filters/projection still push into the scan.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  /** Reference-parity inferred read (two passes: one to infer, one to
    * scan). Use only for exploration; see class doc.
    */
  def readInferred(spark: SparkSession, path: String,
                   header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .csv(path)

  /** Quarantining read for dirty feeds: malformed rows land in a
    * `_corrupt` column (PERMISSIVE mode) instead of failing the job or
    * being silently dropped — callers split the frame on
    * `_corrupt IS NULL` into clean rows and a quarantine sink. At 100 TB
    * a single bad row must never kill a multi-hour ingest, and dropping
    * it unrecorded is a silent data loss.
    */
  def readQuarantining(spark: SparkSession, path: String, schema: StructType,
                       header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add(StructField("_corrupt", StringType, nullable = true)))
      .csv(path)

  /** Header CSV sink (`mode=overwrite`), one file per partition —
    * distributed write, no driver collect (the reference funnels
    * through pandas `to_csv`, a single-process bottleneck).
    */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write
      .option("header", header.toString)
      .mode("overwrite")
      .csv(path)
}

/** JSON-lines source/sink: one JSON object per line, splittable and
  * schema-explicit for the same reasons as [[Csv]].
  */
object Jsonl {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Inference pass included for exploration (extra scan, see [[Csv]]). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Quarantining JSONL read — same contract as [[Csv.readQuarantining]]:
    * malformed lines land whole in `_corrupt` instead of killing the job
    * or vanishing. This is the ingest half of the
    * [[graft.pipeline.CorpusExport]] loop: shards written by one site are
    * re-ingested by another, and a truncated upload must surface as
    * quarantine rows, not a dead pipeline.
    */
  def readQuarantining(spark: SparkSession, path: String,
                       schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add(StructField("_corrupt", StringType, nullable = true)))
      .json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

/** ORC source/sink — the other columnar format a lakehouse meets in the
  * wild (Hive-era tables). Same pushdown story as parquet: predicates
  * and column pruning reach the ORC reader, so migrating a table
  * between the two formats doesn't change any declared plan shape.
  */
object Orc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}

/** Raw-blob ingest for the multimodal layer: Spark's `binaryFile`
  * source reads a directory of files as (path, modificationTime,
  * length, content) rows — the entry point that turns an image/audio
  * dump into the `binary`-column table [[graft.ops.Multimodal]]
  * operates on. `pathGlobFilter` pushes the extension filter into the
  * LISTING (files that don't match are never opened); at 100 TB the
  * same scan runs against an object store with the driver listing
  * parallelized by Spark's file index.
  */
object BinaryDir {

  /** (doc_id, media, n_bytes) rows from a directory of blob files —
    * doc_id = the file name, the natural join key back to a metadata
    * table. Column names line up with the multimodal fixture so
    * [[graft.ops.Multimodal]] kernels apply unchanged.
    */
  def read(spark: SparkSession, dir: String,
           glob: String = "*"): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("doc_id"),
        col("content").as("media"),
        col("length").as("n_bytes"))
  }
}
