package graft.media

import graft.imaging.{PHash, Raster, Resample}
import graft.text.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the decode / feature-extract / resize / frame-sample
  * operators a training-data pipeline needs over them.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, error
  * side-channel — is real and tested. Codec coverage: images decode for real
  * (JDK ImageIO); audio/video decoding has no library in this container, so
  * those decoders are deterministic stubs behind the same interface
  * (clearly marked below) — swap in a real codec where one exists.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: String, media_ref: String,
                            mime: String, bytes: Array[Byte])

  final case class ImageFeatures(doc_id: String, media_ref: String,
                                 width: Int, height: Int,
                                 phash: Long, dhash_row: Long, dhash_col: Long,
                                 mean_luma: Double)

  final case class MediaError(doc_id: String, media_ref: String, error: String)

  final case class FrameSample(doc_id: String, media_ref: String,
                               frame_index: Int, frame_phash: Long)

  /** Image decode + feature extraction, one narrow mapPartitions (the batch
    * shape: decode amortizes any per-partition codec init; rows never leave
    * the partition). Returns (features, errors) side-by-side.
    */
  def imageFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): (Dataset[ImageFeatures], Dataset[MediaError]) = {
    import spark.implicits._
    val decoded = media.mapPartitions { rows =>
      rows.map { m =>
        Raster.decode(m.bytes) match {
          case Right(img) =>
            val (r, c) = PHash.dhash(img)
            var luma = 0.0
            var y = 0
            while (y < img.height) {
              var x = 0
              while (x < img.width) { luma += img.grey(x, y); x += 1 }
              y += 1
            }
            val n = math.max(img.width * img.height, 1)
            Right(ImageFeatures(m.doc_id, m.media_ref, img.width, img.height,
              PHash.dct64(img), r, c, luma / n / 65535.0))
          case Left(err) => Left(MediaError(m.doc_id, m.media_ref, err))
        }
      }
    }
    (decoded.flatMap(_.toOption), decoded.flatMap(_.left.toOption))
  }

  /** Image resize-to-thumbnail as a binary→binary column op (PNG bytes). */
  def thumbnail(media: Dataset[MediaRow], w: Int, h: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.map { m =>
      val out = Raster.decode(m.bytes).map { img =>
        val small = Resample.resize(img, w, h, Resample.Linear)
        encodePng(small)
      }
      (m.doc_id, m.media_ref, out.toOption.orNull)
    }.toDF("doc_id", "media_ref", "thumb_png")
  }

  private def encodePng(img: Raster): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      math.max(img.width, 1), math.max(img.height, 1),
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val argb = (img.a(x, y) << 24) | (img.r(x, y) << 16) |
          (img.g(x, y) << 8) | img.b(x, y)
        bi.setRGB(x, y, argb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // STUBBED DECODERS — no audio/video codec libraries ship in this
  // container. The stubs are deterministic functions of the payload bytes
  // so every downstream operator (schema, partitioning, batching, joins)
  // runs for real and reproducibly; replace the body with a codec call
  // (e.g. javax.sound.sampled / jcodec) where available.
  // ------------------------------------------------------------------

  /** STUB audio decode → fixed-rate PCM summary features. */
  def audioFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.map { m =>
      val h = Hashing.hash64(m.media_ref)
      val durationMs = 1000 + (java.lang.Long.remainderUnsigned(
        Hashing.hash64(h, m.bytes.length.toLong), 600000L)).toInt
      // deterministic fake spectral fingerprint over byte windows
      val fp = (0 until 8).map { i =>
        var acc = Hashing.mix64(h ^ i.toLong)
        var j = i
        while (j < m.bytes.length) { acc = Hashing.hash64(acc, m.bytes(j).toLong); j += 64 }
        acc
      }.toArray
      (m.doc_id, m.media_ref, durationMs, fp)
    }.toDF("doc_id", "media_ref", "duration_ms", "audio_fp")
  }

  /** STUB video frame sampling → per-frame pHash. Frames are synthesized
    * deterministically from (payload digest, frame index); a real decoder
    * would seek and decode at the same indices.
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int, maxFrames: Int)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.flatMap { m =>
      val digest = Hashing.hash64(m.media_ref, m.bytes.length.toLong)
      val nFrames = 1 + (java.lang.Long.remainderUnsigned(digest, 240L)).toInt
      (0 until nFrames by everyNth).take(maxFrames).map { i =>
        val frame = SynthMedia.render(Hashing.hash64(digest, i.toLong), 0)
        FrameSample(m.doc_id, m.media_ref, i, PHash.dct64(frame))
      }
    }
  }

  /** Near-duplicate video pairs by fraction of matching sampled-frame
    * hashes (banded on frame pHash for the candidate join).
    */
  def videoNearDups(frames: Dataset[FrameSample], minShared: Int)(
      implicit spark: SparkSession): DataFrame = {
    // dedup (doc_id, frame_phash) BEFORE the join: a static/repetitive video
    // with k identical-hash frames would otherwise contribute k*m join rows
    // and shared_frames would count cross products, not distinct shared hashes
    val f = frames.toDF().select("doc_id", "frame_phash").distinct()
    val l = f.select(col("doc_id").as("a"), col("frame_phash"))
    val r = f.select(col("doc_id").as("b"), col("frame_phash"))
    l.join(r, Seq("frame_phash")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }
}
