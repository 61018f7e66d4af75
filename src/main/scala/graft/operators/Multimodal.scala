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
}
