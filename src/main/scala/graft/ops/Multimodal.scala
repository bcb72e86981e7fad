package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, plus the decode/feature-extract plumbing a training
  * pipeline needs.
  *
  * The fixtures carry no real media, and this container has no
  * image/audio codecs, so the *decode kernel* is a clearly-marked
  * deterministic stub ([[StubCodec]]); everything Spark-side — schema,
  * batching, partition-local iteration, typed output — is real and
  * tested. Swapping [[StubCodec.decode]] for a JNI/FFmpeg/imageio call
  * changes nothing in the plan shape.
  *
  * Scale notes: decode runs in `mapPartitions` (the Scala analog of
  * `mapInPandas` batch UDFs) so per-partition setup (codec init) is paid
  * once per task, not per row; binary payloads never shuffle — metadata
  * is extracted first, and only the narrow typed columns flow downstream.
  */
object Multimodal {

  /** Typed metadata row produced by the decode stage. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      content_fp: String,
      width: Int,
      height: Int,
      channels: Int)

  /** Deterministic stand-in for a media decoder. Real deployments replace
    * this object; the fake derives "decoded" dimensions from the payload
    * so tests are stable. THIS IS A STUB — no actual media parsing.
    */
  object StubCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 640 + 1, n % 480 + 1, 3)
    }
  }

  /** Fabricate a binary media column from the documents fixture (UTF-8
    * payload) — stands in for reading real image/audio bytes from a
    * binary parquet column.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Partition-local decode: binary payload → typed metadata. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (once per task)
        it.map { case (id, payload) =>
          val (w, h, c) = StubCodec.decode(payload)
          val fp = java.security.MessageDigest.getInstance("MD5")
            .digest(payload).map("%02x".format(_)).mkString
          MediaMeta(id, payload.length.toLong, fp, w, h, c)
        }
      }
  }

  /** Declared query: metadata extraction expressed with codegen'd
    * built-ins only (octet_length/md5 + arithmetic), so it is
    * SQL-oracle-checkable; semantically identical to [[decodeMeta]] on
    * this payload shape.
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("content_fp"),
        (pmod(octet_length(col("payload")), lit(640)) + 1).as("width"),
        (pmod(octet_length(col("payload")), lit(480)) + 1).as("height"),
        lit(3).as("channels"))
      .orderBy(col("doc_id"))
}
