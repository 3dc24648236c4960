package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BINARY` payloads with
  * typed metadata, decoded/feature-extracted in executor-side BATCHES
  * (the Scala analogue of `mapInPandas` — `mapPartitions` over grouped
  * iterators, so a real decoder would amortize per-batch model/codec
  * setup).
  *
  * The actual image/audio decode is STUBBED (`decodeBatch`): no media
  * libraries exist in this environment, so the decoder derives
  * deterministic fake dimensions from the payload bytes. The Spark-side
  * contract — binary column, batch iterator shape, output schema,
  * partition-preserving plan — is real and oracle-tested.
  */
object Multimodal {
  import TData._

  final case class MediaMeta(doc_id: Long, n_bytes: Long, content_md5: String,
                             width: Int, height: Int, n_frames: Int)

  /** STUB decoder: replace the body with a real codec (e.g. JNI to
    * libjpeg/ffmpeg) keeping the batch signature. Deterministic fake:
    * dimensions derive from payload length, digest from the bytes.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
    batch.map { case (id, bytes) =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      val n = bytes.length.toLong
      MediaMeta(id, n, md5hex,
        (n % 640).toInt + 1, ((n * 7) % 480).toInt + 1, (n % 16).toInt + 1)
    }

  /** Binary ingestion + batched metadata extraction. The oracle re-derives
    * everything from the text the payload was encoded from (same UTF-8
    * bytes), proving the binary round-trip is faithful.
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(batch => decodeBatch(batch)) // batch ≈ mapInPandas
    }.toDF()
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  strlen(text)::BIGINT AS n_bytes,
      |  md5(text) AS content_md5,
      |  (strlen(text) % 640 + 1)::INT AS width,
      |  ((strlen(text) * 7) % 480 + 1)::INT AS height,
      |  (strlen(text) % 16 + 1)::INT AS n_frames
      |FROM documents""".stripMargin
}
