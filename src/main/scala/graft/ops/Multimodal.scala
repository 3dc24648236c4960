package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `BINARY` payloads with
  * typed metadata, decoded/feature-extracted in executor-side BATCHES
  * (the Scala analogue of `mapInPandas` — `mapPartitions` over grouped
  * iterators, so per-batch codec setup amortizes).
  *
  * The decoder is REAL: payloads are genuine PNG bytes (encoded with the
  * JDK's `javax.imageio`, 8-bit grayscale — lossless), and every
  * reported number comes out of `ImageIO.read` on those bytes — decoded
  * dimensions, decoded pixel sums/histograms, decoded per-frame values —
  * never from the generation arithmetic. The oracle can still recompute
  * the expectations because the FIXTURES are deterministic: each
  * document's image is painted from its own UTF-8 text bytes under a
  * published rule (dims from text length, pixel i = byte i, zero
  * padding), so DuckDB re-derives from `documents.text` what Spark must
  * observe by actually decoding. A lossy or broken decode path fails the
  * hash gate.
  *
  * At scale the shape is what matters: encode happens where the data
  * lives (executors, inside the scan projection), decode runs batched in
  * `mapPartitions` with no shuffle before it, and output rows carry only
  * small typed columns — the 100 TB plan is scan → per-partition decode
  * → downstream aggregation, media bytes never cross the wire.
  */
object Multimodal {
  import TData._

  // javax.imageio defaults to DISK-backed stream caches: every
  // ImageIO.write/read against an in-memory stream creates (and deletes)
  // a temp file. These codecs run per document (and per FRAME in the
  // demuxer), so the default turns a CPU-bound decode into tmp-dir file
  // churn. Memory caching changes no bytes — encodes/decodes stay real.
  // NOTE: this mutates PROCESS-GLOBAL javax.imageio state on driver and
  // executors — any co-resident code reading very large images in the
  // same JVM gets memory-backed stream caches too. Acceptable for this
  // engine's small fixtures; a host embedding this library next to a
  // large-image pipeline should scope the choice per call site with
  // explicit MemoryCacheImageInput/OutputStream instead.
  ImageIO.setUseCache(false)

  /** The published fixture rule: image dims derived from text LENGTH
    * (small on purpose — the decode cost scales with rows, not with a
    * production frame size, and correctness is dimension-independent).
    */
  private def dims(len: Int): (Int, Int) =
    ((len % 64) + 1, ((len.toLong * 7) % 48).toInt + 1)

  /** Encode one document's text into a real grayscale PNG: pixel i (row
    * major) = text byte i, zero-padded past the text, truncated at the
    * image area. 8-bit gray PNG is lossless, so a correct decoder must
    * read the exact bytes back.
    */
  private def encodePng(text: Array[Byte]): Array[Byte] = {
    val (w, h) = dims(text.length)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    // bulk row-major fill: TYPE_BYTE_GRAY is a single-band byte raster,
    // so the pixel array IS the text bytes zero-padded to w*h
    val n = w * h
    val px = new Array[Byte](n)
    System.arraycopy(text, 0, px, 0, math.min(text.length, n))
    raster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def documentPngs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, encodePng(text.getBytes("UTF-8")))
      })
      .toDF("doc_id", "payload")
  }

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             n_px: Long, px_sum: Long)

  /** Batched REAL decode: `ImageIO.read` per payload, dimensions and the
    * full-pixel sum read from the decoded raster.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
    batch.map { case (id, payload) =>
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      // one bulk getSamples instead of w*h virtual getSample calls
      val px = raster.getSamples(0, 0, w, h, 0, null: Array[Int])
      var sum = 0L
      var i = 0
      while (i < px.length) { sum += px(i); i += 1 }
      MediaMeta(id, w, h, w.toLong * h, sum)
    }

  /** Binary ingestion + batched metadata extraction over REAL PNG
    * payloads. The oracle re-derives dims from the fixture rule and the
    * pixel sum from the text bytes — only a genuine, lossless decode
    * matches.
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documentPngs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(decodeBatch)) // batch ≈ mapInPandas
      .toDF()
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  (strlen(text) % 64 + 1)::INT AS width,
      |  ((strlen(text) * 7) % 48 + 1)::INT AS height,
      |  ((strlen(text) % 64 + 1) * ((strlen(text) * 7) % 48 + 1))::BIGINT AS n_px,
      |  COALESCE(list_sum(list_transform(
      |    generate_series(1, least(strlen(text),
      |      (strlen(text) % 64 + 1) * ((strlen(text) * 7) % 48 + 1))::INT),
      |    i -> ord(text[i]))), 0)::BIGINT AS px_sum
      |FROM documents""".stripMargin

  final case class MediaFeatures(doc_id: Long, rs_width: Int, rs_height: Int,
                                 feat_csv: String)

  /** Batched REAL decode + resize + feature-extract: `ImageIO.read`,
    * `Graphics2D.drawImage` down to a 32-bounded thumbnail (reported
    * dims come from the RESIZED image object), and an 8-bin histogram
    * over the decoded original's pixels (the resized raster is
    * interpolation-dependent, so features that must be exact read the
    * lossless original).
    */
  private def featureBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, payload) =>
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      val w = img.getWidth; val h = img.getHeight
      val rw = math.min(w, 32)
      val rh = math.max(1, h * rw / w)
      val resized = new BufferedImage(rw, rh, BufferedImage.TYPE_BYTE_GRAY)
      val g = resized.createGraphics()
      try g.drawImage(img, 0, 0, rw, rh, null) finally g.dispose()
      val raster = img.getRaster
      val hist = new Array[Long](8)
      val px = raster.getSamples(0, 0, w, h, 0, null: Array[Int])
      var i = 0
      while (i < px.length) { hist(px(i) % 8) += 1; i += 1 }
      MediaFeatures(id, resized.getWidth, resized.getHeight,
        hist.mkString(","))
    }

  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documentPngs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(featureBatch))
      .toDF()
  }

  // oracle: histogram over min(len, w*h) text bytes, plus the zero
  // padding (w*h - that) landing in bin 0
  val mediaFeaturesSql: String =
    """WITH dims AS (
      |  SELECT doc_id, text,
      |    (strlen(text) % 64 + 1)::INT AS w,
      |    ((strlen(text) * 7) % 48 + 1)::INT AS h,
      |    least(strlen(text), (strlen(text) % 64 + 1)
      |      * ((strlen(text) * 7) % 48 + 1))::INT AS m
      |  FROM documents)
      |SELECT doc_id,
      |  least(w, 32) AS rs_width,
      |  greatest(1, h * least(w, 32) // w) AS rs_height,
      |  array_to_string(list_transform(generate_series(0, 7), b ->
      |    CAST(len(list_filter(
      |      list_transform(generate_series(1, m), i -> ord(text[i])),
      |      c -> c % 8 = b))
      |      + CASE WHEN b = 0 THEN w * h - m ELSE 0 END AS VARCHAR)), ',')
      |    AS feat_csv
      |FROM dims""".stripMargin

  /** Encode one document's "video": a length-prefixed container of
    * `(len % 16) + 1` real single-color 4×4 PNG frames, frame f painted
    * with text byte `f mod len`. The container framing is the demuxer's
    * contract; each frame is an independent `javax.imageio` decode.
    */
  // a single-color 4×4 frame has only 256 possible contents — memoize the
  // encodes per JVM (fixture generation only; DECODE always runs for real)
  private lazy val frameCache: Array[Array[Byte]] =
    Array.tabulate(256) { v =>
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < 4) {
        var x = 0
        while (x < 4) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  private def encodeFrameContainer(text: Array[Byte]): Array[Byte] = {
    val n = (text.length % 16) + 1
    val frames = (0 until n).map { f =>
      val v = if (text.length == 0) 0 else text(f % text.length) & 0xff
      frameCache(v)
    }
    val buf = ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
    buf.putInt(n)
    frames.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
    buf.array()
  }

  final case class Frame(doc_id: Long, frame_idx: Int, px_val: Int)

  /** Batched demux + per-frame REAL decode, sampling every 2nd frame:
    * the reported value is the decoded frame's pixel (0,0). Per-media
    * fan-out happens inside the batch iterator — output rows ∝
    * Σ(n_frames/2), media bytes never leave the partition.
    */
  private def frameBatch(batch: Seq[(Long, Array[Byte])]): Seq[Frame] =
    batch.flatMap { case (id, payload) =>
      val buf = ByteBuffer.wrap(payload)
      val n = buf.getInt
      val frames = (0 until n).map { _ =>
        val len = buf.getInt
        val fb = new Array[Byte](len)
        buf.get(fb)
        fb
      }
      (0 until n by 2).map { idx =>
        val img = ImageIO.read(new ByteArrayInputStream(frames(idx)))
        Frame(id, idx, img.getRaster.getSample(0, 0, 0))
      }
    }

  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, encodeFrameContainer(text.getBytes("UTF-8")))
      })
      .mapPartitions(_.grouped(64).flatMap(frameBatch))
      .toDF()
  }

  val frameSampleSql: String =
    """SELECT doc_id, i AS frame_idx,
      |  CASE WHEN strlen(text) = 0 THEN 0
      |       ELSE ord(substr(text, (i % strlen(text)) + 1, 1)) END::INT AS px_val
      |FROM documents,
      |     UNNEST(generate_series(0, strlen(text) % 16, 2)) AS t(i)""".stripMargin
}
