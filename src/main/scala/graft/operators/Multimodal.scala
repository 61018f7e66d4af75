package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed,
  * extracted metadata.
  *
  * The container has no image/audio codecs, so the decoder is a STUB with a
  * deterministic fake implementation (metadata derived from an MD5 of the
  * bytes). Everything around the stub is real and load-bearing: the binary
  * column schema, the per-partition decoder lifecycle in `mapPartitions`
  * (one decoder instance per partition — exactly how a JNI/codec handle
  * would be managed on a cluster), and the typed Dataset boundary.
  */
object Multimodal {

  final case class MediaFile(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, frames: Int)

  /** Documents → a binary media table (text bytes standing in for an
    * encoded image payload).
    */
  def mediaTable(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      col("text").cast("binary").as("content"))
      .as[MediaFile]
  }

  /** The decode stub: a real codec would parse the header; the fake derives
    * (width, height, frames) deterministically from the payload's MD5 so
    * results are reproducible and oracle-checkable.
    */
  private final class FakeDecoder {
    private val md = MessageDigest.getInstance("MD5")
    def decode(m: MediaFile): MediaMeta = {
      md.reset()
      val hex = md.digest(m.content).map("%02x".format(_)).mkString
      MediaMeta(
        m.doc_id,
        m.content.length,
        1 + (java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1024).toInt,
        1 + (java.lang.Long.parseLong(hex.substring(6, 12), 16) % 768).toInt,
        1 + (m.content.length % 30))
    }
  }

  /** Metadata extraction over partitions: decoder constructed once per
    * partition (the codec-handle pattern), rows streamed through it.
    */
  def extractMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new FakeDecoder
      it.map(decoder.decode)
    }
  }

  /** End-to-end: documents → binary table → per-partition decode. */
  def documentMedia(docs: DataFrame): DataFrame =
    extractMeta(mediaTable(docs)).toDF()

  /** Oracle twin of the fake decode (same MD5 arithmetic in SQL). */
  val documentMediaSql: String =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |       CAST(1 + ('0x' || substring(md5(text), 1, 6))::BIGINT % 1024 AS INT) AS width,
      |       CAST(1 + ('0x' || substring(md5(text), 7, 6))::BIGINT % 768 AS INT) AS height,
      |       CAST(1 + octet_length(encode(text)) % 30 AS INT) AS frames
      |FROM documents""".stripMargin

  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Frame sampling: at most 4 evenly spaced frames per media file (step =
    * ceil(frames/4)). The stub "decodes" a frame by hashing (payload md5,
    * frame index) — a real codec would seek + decode + hash pixels — but
    * the sampling arithmetic, the per-doc fan-out shape, and the
    * one-decoder-per-partition lifecycle are the real, load-bearing parts.
    */
  def sampleFrames(media: Dataset[MediaFile]): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
      it.flatMap { m =>
        md.reset()
        val payload = hex(md.digest(m.content))
        val frames = 1 + (m.content.length % 30)
        val step = (frames + 3) / 4
        (0 until 4).map(_ * step).filter(_ < frames).map { f =>
          md.reset()
          FrameSample(m.doc_id, f,
            hex(md.digest((payload + ":" + f).getBytes("UTF-8"))))
        }
      }
    }
  }

  /** End-to-end frame sampling over the documents' media table. */
  def documentFrames(docs: DataFrame): DataFrame =
    sampleFrames(mediaTable(docs)).toDF()

  /** Oracle twin of [[documentFrames]] — same step arithmetic, same
    * hash-of-hash frame fingerprint.
    */
  val documentFramesSql: String =
    """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |       md5(md5(text) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_md5
      |FROM (
      |  SELECT doc_id, text,
      |         1 + octet_length(encode(text)) % 30 AS frames,
      |         unnest(generate_series(0, 3))
      |           * ((1 + octet_length(encode(text)) % 30 + 3) // 4) AS frame_idx
      |  FROM documents)
      |WHERE frame_idx < frames""".stripMargin

  /** Resize-to-fit planning (integer-exact): scale each decoded (w, h) to
    * fit a square training input, preserving aspect ratio — the batch
    * shape of an image-preprocessing pass. Pure column arithmetic over the
    * metadata; the pixel work would happen in the per-partition decoder.
    */
  def resizePlan(meta: DataFrame, target: Int = 224): DataFrame = {
    import graft.functions.OracleSafe.intDiv
    val longest = greatest(col("width"), col("height"))
    // clamp to >= 1: an extreme aspect ratio (1 x 768) truncates to 0
    meta.select(
      col("doc_id"), col("width"), col("height"),
      greatest(lit(1), intDiv(col("width") * target, longest).cast("int")).as("out_width"),
      greatest(lit(1), intDiv(col("height") * target, longest).cast("int")).as("out_height"))
  }

  def resizePlanSql(target: Int = 224): String =
    s"""SELECT doc_id, width, height,
       |       CAST(GREATEST(1, (width * $target) // GREATEST(width, height)) AS INT) AS out_width,
       |       CAST(GREATEST(1, (height * $target) // GREATEST(width, height)) AS INT) AS out_height
       |FROM ($documentMediaSql)""".stripMargin
}
