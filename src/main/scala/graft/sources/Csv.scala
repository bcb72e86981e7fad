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

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
