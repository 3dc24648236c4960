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

  final case class MediaFeatures(doc_id: Long, rs_width: Int, rs_height: Int,
                                 feat_csv: String)

  /** STUB resize + feature-extract, batched like [[decodeBatch]]: "resize"
    * computes the 224-bounded target dims with integer aspect preservation
    * (the arithmetic a real resizer gets told to hit); "features" are an
    * 8-bin byte histogram standing in for a real embedding model's output
    * vector (CSV-encoded for the scalar hash gate). Swap the body for a
    * real codec+model keeping the batch signature.
    */
  private def featureBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val n = bytes.length.toLong
      val w = (n % 640).toInt + 1
      val h = ((n * 7) % 480).toInt + 1
      val rw = math.min(w, 224)
      val rh = math.max(1, h * rw / w)
      val hist = new Array[Long](8)
      bytes.foreach(b => hist((b & 0xff) % 8) += 1)
      MediaFeatures(id, rw, rh, hist.mkString(","))
    }

  /** Batched resize/feature-extract over the binary column — the second
    * stage of a media pipeline (decode → resize → embed), same
    * `mapPartitions` batch shape as [[mediaMeta]].
    */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(featureBatch))
      .toDF()
  }

  // oracle re-derives the histogram from the characters (payload bytes ==
  // UTF-8 of the ASCII synthetic text, so ord(char) == byte)
  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |  least((strlen(text) % 640 + 1)::INT, 224) AS rs_width,
      |  greatest(1, ((strlen(text) * 7) % 480 + 1)
      |    * least((strlen(text) % 640 + 1)::INT, 224)
      |    // (strlen(text) % 640 + 1))::INT AS rs_height,
      |  array_to_string(list_transform(generate_series(0, 7), b ->
      |    CAST(len(list_filter(
      |      list_transform(generate_series(1, strlen(text)::INT),
      |        i -> ord(text[i])),
      |      c -> c % 8 = b)) AS VARCHAR)), ',') AS feat_csv
      |FROM documents""".stripMargin

  final case class Frame(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** STUB frame sampler: every 2nd frame index of each media's n_frames,
    * "frame content" = md5(payload ++ ":idx"). The plumbing — per-media
    * fan-out to frame rows inside the batch iterator, output row count ∝
    * Σ(n_frames/2) — is exactly a real video sampler's shape.
    */
  private def frameBatch(batch: Seq[(Long, Array[Byte])]): Seq[Frame] =
    batch.flatMap { case (id, bytes) =>
      val nFrames = (bytes.length % 16) + 1
      (0 until nFrames by 2).map { idx =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes ++ s":$idx".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        Frame(id, idx, md)
      }
    }

  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(frameBatch))
      .toDF()
  }

  val frameSampleSql: String =
    """SELECT doc_id, i AS frame_idx, md5(text || ':' || i) AS frame_md5
      |FROM documents,
      |     UNNEST(generate_series(0, strlen(text) % 16, 2)) AS t(i)""".stripMargin
}
