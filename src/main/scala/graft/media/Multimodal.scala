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
  * (JDK ImageIO); WAV/PCM audio decodes for real (pure-JVM RIFF parser —
  * [[decodeWavPcm]]); MJPEG-in-AVI video decodes for real (RIFF frame
  * extraction [[extractAviFrames]] + ImageIO per frame); compressed audio
  * and other video containers have no decoder in this container, so those
  * paths are deterministic stubs behind the same interface (clearly marked
  * below) — swap in a real codec where one exists.
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
      implicit spark: SparkSession): (Dataset[ImageFeatures], Dataset[MediaError], () => Unit) = {
    import spark.implicits._
    // the row type is a PAIR OF OPTIONS, not Either: Spark has a product
    // encoder for it (Either is abstract to the codegen serializer), and
    // the pair form lets the decoded relation be persisted so that reading
    // BOTH advertised consumers (features + the bad-record side channel)
    // costs ONE ImageIO decode + double-pHash pass, not one per consumer —
    // the same multiple-consumer shape Pipeline.materialize exists for.
    // The third element releases that persisted relation — without it a
    // long-lived session calling imageFeatures per batch strands one
    // decoded relation per call (the release contract every other
    // multi-consumer API here carries: Pipeline.Result, LinkResult, ...)
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
            (Some(ImageFeatures(m.doc_id, m.media_ref, img.width, img.height,
              PHash.dct64(img), r, c, luma / n / 65535.0)),
              Option.empty[MediaError])
          case Left(err) =>
            (Option.empty[ImageFeatures], Some(MediaError(m.doc_id, m.media_ref, err)))
        }
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (decoded.flatMap(_._1), decoded.flatMap(_._2), () => { decoded.unpersist(); () })
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
  // AUDIO — WAV/PCM decodes FOR REAL: a pure-JVM RIFF chunk walker (no
  // codec library exists for 16-bit PCM because none is needed).
  // Compressed formats (mp3/aac/...) have no decoder in this container
  // and fall back to the deterministic stub path behind the same
  // interface and slot shape.
  // ------------------------------------------------------------------

  final case class AudioClip(sampleRate: Int, samples: Array[Double])

  /** RIFF/WAVE PCM decoder: 16-bit little-endian PCM, mono or stereo
    * (averaged to mono), chunks walked per the RIFF spec (word-aligned,
    * unknown chunks skipped). Returns None for anything else — the
    * caller's signal to take the stub path.
    */
  def decodeWavPcm(bytes: Array[Byte]): Option[AudioClip] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong | (u16(i + 2).toLong << 16)) & 0xffffffffL
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var rate = 0; var channels = 0; var fmtOk = false
    var samples: Array[Double] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val size = math.min(u32(pos + 4), (bytes.length - pos - 8).toLong).toInt
      val body = pos + 8
      if (id == "fmt " && body + 16 <= bytes.length) {
        val audioFormat = u16(body)
        channels = u16(body + 2)
        rate = u32(body + 4).toInt
        val bits = u16(body + 14)
        fmtOk = audioFormat == 1 && bits == 16 &&
          (channels == 1 || channels == 2) && rate > 0
      } else if (id == "data" && fmtOk && samples == null) {
        val n = size / (2 * channels)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val off = body + (i * channels + c) * 2
            acc += ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort / 32768.0
            c += 1
          }
          out(i) = acc / channels
          i += 1
        }
        samples = out
      }
      pos = body + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (fmtOk && samples != null && samples.nonEmpty) Some(AudioClip(rate, samples))
    else None
  }

  /** JDK `javax.sound.sampled` decode tier (still no external library):
    * covers what the fast RIFF path doesn't — PCM at other bit depths,
    * G.711 µ-law/A-law WAVs, AIFF/AU containers — by converting to
    * 16-bit signed PCM through AudioSystem and downmixing to mono.
    * Returns None where the JDK has no codec (mp3/aac/...).
    */
  def decodeJavaSound(bytes: Array[Byte]): Option[AudioClip] = {
    var in: javax.sound.sampled.AudioInputStream = null
    var pcm: javax.sound.sampled.AudioInputStream = null
    try {
      in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val base = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels,
        base.getChannels * 2, base.getSampleRate, false)
      pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
      val buf = pcm.readAllBytes()
      val ch = math.max(base.getChannels, 1)
      val n = buf.length / (2 * ch)
      if (n == 0) return None
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2
          acc += ((buf(off) & 0xff) | (buf(off + 1) << 8)).toShort / 32768.0
          c += 1
        }
        out(i) = acc / ch
        i += 1
      }
      Some(AudioClip(base.getSampleRate.toInt, out))
    } catch {
      case _: Exception => None
    } finally {
      if (pcm != null) try pcm.close() catch { case _: Exception => () }
      if (in != null) try in.close() catch { case _: Exception => () }
    }
  }

  /** Per-window fingerprint over decoded PCM with DUAL-OFFSET grids:
    * 8 equal segments × 4 grid pairs = 32 slots. Each segment yields a
    * log-energy (dB) and a zero-crossing rate; each feature is quantized
    * on two grids offset by half a step (energy: 1 dB steps; zcr: 1/32
    * steps), and one slot is emitted per (energy grid, zcr grid) pair.
    *
    * Recall GUARANTEE: a re-encode/noise perturbation that moves energy
    * by < 1/4 dB and zcr by < 1/128 leaves each feature at least half a
    * step inside one of its two offset grids, so per segment at least
    * one of the 4 grid pairs is bit-identical — ≥ 8 of 32 slots shared,
    * whatever the clip's position relative to bucket boundaries (a
    * single hard quantizer flips ALL slots for a clip sitting on a
    * boundary — measured with G.711 µ-law re-encodes in MultimodalSpec).
    * Precision: clips differing by a full step in either feature share
    * no slot on any grid.
    */
  def pcmFingerprint(clip: AudioClip): Array[Long] = {
    val n = clip.samples.length
    val out = new Array[Long](32)
    var seg = 0
    while (seg < 8) {
      val lo = (n.toLong * seg / 8).toInt
      val hi = (n.toLong * (seg + 1) / 8).toInt
      var energy = 0.0
      var zc = 0
      var i = lo
      while (i < hi) {
        val s = clip.samples(i)
        energy += s * s
        if (i > lo && (s >= 0) != (clip.samples(i - 1) >= 0)) zc += 1
        i += 1
      }
      val len = math.max(hi - lo, 1)
      val dB = 10.0 * math.log10(energy / len + 1e-12)
      val z32 = zc.toDouble * 32.0 / len
      var g = 0
      while (g < 4) {
        val eB = math.floor(dB + (g >> 1) * 0.5).toLong
        val zB = math.floor(z32 + (g & 1) * 0.5).toLong
        out(seg * 4 + g) =
          Hashing.hash64(Hashing.hash64(0x617564L + seg * 4 + g, eB), zB)
        g += 1
      }
      seg += 1
    }
    out
  }

  /** Audio decode → per-window fingerprint features. 16-bit WAV/PCM
    * takes the fast pure parser ([[decodeWavPcm]]); other JDK-decodable
    * audio (µ-law/A-law WAV, AIFF/AU, other PCM depths) goes through
    * [[decodeJavaSound]]; only payloads with no JDK codec take the STUB
    * path (deterministic function of the bytes) — same schema and slot
    * shape in every case.
    */
  def audioFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.map { m =>
      decodeWavPcm(m.bytes).orElse(decodeJavaSound(m.bytes)) match {
        case Some(clip) =>
          val durationMs =
            (clip.samples.length.toLong * 1000 / clip.sampleRate).toInt
          (m.doc_id, m.media_ref, durationMs, pcmFingerprint(clip))
        case None =>
          val h = Hashing.hash64(m.media_ref)
          val durationMs = 1000 + (java.lang.Long.remainderUnsigned(
            Hashing.hash64(h, m.bytes.length.toLong), 600000L)).toInt
          // deterministic fake spectral fingerprint over byte windows
          // (32 slots — same shape as the real path's dual-grid output)
          val fp = (0 until 32).map { i =>
            var acc = Hashing.mix64(h ^ i.toLong)
            var j = i % 8
            while (j < m.bytes.length) { acc = Hashing.hash64(acc, m.bytes(j).toLong); j += 64 }
            Hashing.hash64(acc, i.toLong)
          }.toArray
          (m.doc_id, m.media_ref, durationMs, fp)
      }
    }.toDF("doc_id", "media_ref", "duration_ms", "audio_fp")
  }

  /** AVI (RIFF) frame extractor: walks the chunk tree to the `movi` LIST
    * and returns the raw bytes of every video frame chunk (`##db`/`##dc`,
    * including frames nested in `rec ` LISTs) in stream order. Pure JVM —
    * for MJPEG AVIs each frame is a JPEG blob ImageIO can decode (NB:
    * some MJPEG encoders omit the standard Huffman tables from frames;
    * those need a codec and fall back to the stub path when ImageIO
    * rejects them). Returns None for non-AVI payloads.
    */
  def extractAviFrames(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val out = IndexedSeq.newBuilder[Array[Byte]]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'b' || id(3) == 'c')
    // iterative depth-first walk with an explicit continuation stack: a
    // crafted payload of nested LIST headers must not overflow the call
    // stack (malformed input is data, never a task-killing Error), and
    // descending INTO a list before its later siblings preserves stream
    // order for frames nested in `rec ` lists
    val stack = scala.collection.mutable.Stack.empty[(Int, Int, Boolean)]
    var pos = 12
    var to = bytes.length
    var inMovi = false
    var done = false
    while (!done) {
      if (pos + 8 <= to) {
        val id = tag(pos)
        val size = math.min(u32(pos + 4), (to - pos - 8).toLong).toInt
        val body = pos + 8
        val next = body + size + (size & 1) // word-aligned
        if (id == "LIST" && size >= 4) {
          stack.push((next, to, inMovi)) // resume siblings after the list
          inMovi = inMovi || tag(body) == "movi"
          pos = body + 4
          to = body + size
        } else {
          if (inMovi && isFrameId(id) && size > 0)
            out += java.util.Arrays.copyOfRange(bytes, body, body + size)
          pos = next
        }
      } else if (stack.nonEmpty) {
        val (p, t, m) = stack.pop()
        pos = p; to = t; inMovi = m
      } else done = true
    }
    val frames = out.result()
    if (frames.nonEmpty) Some(frames) else None
  }

  /** Video frame sampling → per-frame pHash. AVI payloads decode FOR REAL
    * (frame chunks via [[extractAviFrames]], pixels via ImageIO — covers
    * MJPEG with embedded tables); anything else takes the STUB path:
    * frames synthesized deterministically from (payload digest, frame
    * index) — no compressed-video codec ships in this container. Same
    * sampling semantics (every `everyNth`-th frame, up to `maxFrames`)
    * and output shape either way.
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int, maxFrames: Int)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    // driver-side usage errors, not executor task deaths: everyNth = 0
    // would otherwise throw `step cannot be 0` inside every task
    require(everyNth > 0, s"everyNth must be positive (got $everyNth)")
    require(maxFrames > 0, s"maxFrames must be positive (got $maxFrames)")
    import spark.implicits._
    media.flatMap { m =>
      def stub: Seq[FrameSample] = {
        val digest = Hashing.hash64(m.media_ref, m.bytes.length.toLong)
        val nFrames = 1 + (java.lang.Long.remainderUnsigned(digest, 240L)).toInt
        (0 until nFrames by everyNth).take(maxFrames).map { i =>
          val frame = SynthMedia.render(Hashing.hash64(digest, i.toLong), 0)
          FrameSample(m.doc_id, m.media_ref, i, PHash.dct64(frame))
        }
      }
      extractAviFrames(m.bytes) match {
        case Some(frames) =>
          val decoded = (0 until frames.length by everyNth).take(maxFrames)
            .flatMap { i =>
              Raster.decode(frames(i)).toOption
                .map(img => FrameSample(m.doc_id, m.media_ref, i, PHash.dct64(img)))
            }
          // an AVI whose sampled frames ImageIO cannot decode (e.g. MJPEG
          // without embedded Huffman tables, rawvideo/xvid codecs) takes
          // the stub path like any other codec-less payload — the clip
          // must not silently vanish from near-dup detection
          if (decoded.nonEmpty) decoded else stub
        case None => stub
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
