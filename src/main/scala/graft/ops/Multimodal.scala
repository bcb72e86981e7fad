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

  /** Typed rows for the remaining media stages. */
  case class MediaFeatures(doc_id: Long, dim: Int, features: Array[Float])
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB feature extractor: a deterministic hash-derived vector stands
    * in for a CNN/audio embedding. Real deployments swap the kernel; the
    * batch shape (fixed dim, Array[Float], partition-local model init)
    * is the real contract.
    */
  def featureExtract(spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model load would go here (once per task)
        it.map { case (id, payload) =>
          val f = new Array[Float](dim)
          var i = 0
          while (i < payload.length) {
            f(i % dim) += (payload(i) & 0xFF) / 255.0f
            i += 1
          }
          MediaFeatures(id, dim, f)
        }
      }
  }

  /** STUB frame sampler: every `stride`-th fixed-size byte window stands
    * in for decoded video frames. Emits an iterator per row — frames
    * stream through the task, the full frame set is never materialized
    * (the property that matters when one video is thousands of frames).
    */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int = 64, stride: Int = 4): Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = math.max(payload.length / frameBytes, 0)
        (0 until nFrames by stride).iterator.map { fi =>
          MediaFrame(id, fi, java.util.Arrays.copyOfRange(
            payload, fi * frameBytes, math.min((fi + 1) * frameBytes, payload.length)))
        }
      }
  }

  /** STUB resize: recompute target dimensions and truncate the payload
    * proportionally — stands in for a pixel resample. Plumbing contract:
    * binary in, binary out, new typed dims alongside.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int = 64, targetH: Int = 48): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, _) = StubCodec.decode(payload)
          val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
          val keep = math.max(1, math.min(payload.length, (payload.length * scale).toInt))
          ResizedMedia(id, (w * scale).toInt.max(1), (h * scale).toInt.max(1),
            java.util.Arrays.copyOf(payload, keep))
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
