package graft

import graft.media.{Multimodal, SynthMedia}
import graft.media.Multimodal.MediaRow
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def pngBytes(seed: String): Array[Byte] = {
    val img = SynthMedia.resolve(s"synth://$seed").toOption.get
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until img.height; x <- 0 until img.width)
      bi.setRGB(x, y, (img.a(x, y) << 24) | (img.r(x, y) << 16) | (img.g(x, y) << 8) | img.b(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  test("image features: real decode, pHash matches direct-kernel hash, errors side-channeled") {
    implicit val s = spark
    import s.implicits._
    val good = MediaRow("d1", "m1", "image/png", pngBytes("mm-1"))
    val bad = MediaRow("d2", "m2", "image/png", Array[Byte](1, 2, 3))
    val (feats, errs, release) = Multimodal.imageFeatures(s.createDataset(Seq(good, bad)))
    val f = feats.collect()
    assert(f.length == 1 && f(0).doc_id == "d1")
    assert(f(0).width == 32 && f(0).height == 32)
    // PNG round-trip is lossless → pHash equals hashing the raster directly
    assert(f(0).phash == graft.imaging.PHash.dct64(SynthMedia.resolve("synth://mm-1").toOption.get))
    assert(f(0).mean_luma > 0.0 && f(0).mean_luma < 1.0)
    val e = errs.collect()
    assert(e.length == 1 && e(0).doc_id == "d2")
    release()
  }

  test("thumbnail: binary->binary op produces decodable resized PNG") {
    implicit val s = spark
    import s.implicits._
    val rows = Multimodal.thumbnail(
      s.createDataset(Seq(MediaRow("d1", "m1", "image/png", pngBytes("mm-2")))), 8, 8).collect()
    val thumb = rows(0).getAs[Array[Byte]]("thumb_png")
    val back = graft.imaging.Raster.decode(thumb).toOption.get
    assert(back.width == 8 && back.height == 8)
  }

  test("stubbed audio/video paths: deterministic schema-correct plumbing") {
    implicit val s = spark
    import s.implicits._
    val media = s.createDataset(Seq(
      MediaRow("v1", "vid1", "video/mp4", Array.fill[Byte](1000)(7)),
      MediaRow("v2", "vid1-copy", "video/mp4", Array.fill[Byte](1000)(7)),
      MediaRow("v3", "vid3", "video/mp4", Array.fill[Byte](900)(9))))
    val audio = Multimodal.audioFeatures(media).collect()
    assert(audio.length == 3)
    assert(audio.map(_.getAs[scala.collection.Seq[Long]]("audio_fp")).forall(_.length == 32))

    // parameter guards are driver-side usage errors, not executor deaths
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, everyNth = 0, maxFrames = 10))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, everyNth = 2, maxFrames = 0))

    val frames = Multimodal.sampleFrames(media, everyNth = 2, maxFrames = 10)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.keySet == Set("v1", "v2", "v3"))
    // v1 and v2 have identical payload size + different refs → frames differ;
    // determinism: rerun yields identical hashes
    val again = Multimodal.sampleFrames(media, 2, 10).collect().groupBy(_.doc_id)
    assert(byDoc("v1").map(_.frame_phash).toSeq == again("v1").map(_.frame_phash).toSeq)

    // shared-frame near-dup join: duplicate payload+ref → all frames shared
    val media2 = s.createDataset(Seq(
      MediaRow("w1", "same-ref", "video/mp4", Array.fill[Byte](500)(1)),
      MediaRow("w2", "same-ref", "video/mp4", Array.fill[Byte](500)(1)),
      MediaRow("w3", "other", "video/mp4", Array.fill[Byte](400)(2))))
    val nd = Multimodal.videoNearDups(Multimodal.sampleFrames(media2, 1, 20), minShared = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(nd.toSeq == Seq(("w1", "w2")))
  }

  private def jpgBytes(seed: String): Array[Byte] = {
    val img = SynthMedia.resolve(s"synth://$seed").toOption.get
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR) // JPEG writer rejects alpha
    for (y <- 0 until img.height; x <- 0 until img.width)
      bi.setRGB(x, y, (img.r(x, y) << 16) | (img.g(x, y) << 8) | img.b(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal RIFF/AVI container holding the given frame blobs as `00dc`
    * chunks inside a `movi` LIST (what an MJPEG AVI looks like to the
    * frame extractor; header lists are optional for it). DELIBERATELY an
    * independent reimplementation of the container layout rather than a
    * call to SynthMedia.aviClip — the extractor is tested against bytes
    * it did not round-trip with its sibling writer, so a shared layout
    * bug cannot hide.
    */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val chunkLens = frames.map(f => 8 + f.length + (f.length & 1))
    val moviSize = 4 + chunkLens.sum
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + moviSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + moviSize)
      .put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(moviSize)
      .put("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      bb.put("00dc".getBytes("US-ASCII")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  test("AVI/MJPEG decodes for real: frame extraction, per-frame pHash, near-dup join") {
    implicit val s = spark
    import s.implicits._
    val fa = Seq("fr1", "fr2", "fr3", "fr4").map(jpgBytes)
    val fc = Seq("zz1", "zz2", "zz3", "zz4").map(jpgBytes)
    // extractor: frame count and bytes survive the container roundtrip
    val got = Multimodal.extractAviFrames(aviBytes(fa)).get
    assert(got.length == 4 && got.zip(fa).forall { case (a, b) => a.sameElements(b) })
    assert(Multimodal.extractAviFrames(Array.fill[Byte](64)(5)).isEmpty)

    // sampled frame hashes equal the direct decode+pHash of the same blobs
    val media = s.createDataset(Seq(
      MediaRow("va", "clip-a", "video/avi", aviBytes(fa)),
      MediaRow("vb", "clip-b", "video/avi", aviBytes(fa)), // identical content
      MediaRow("vc", "clip-c", "video/avi", aviBytes(fc))))
    val frames = Multimodal.sampleFrames(media, everyNth = 1, maxFrames = 10).collect()
    val vaHashes = frames.filter(_.doc_id == "va").sortBy(_.frame_index)
      .map(_.frame_phash).toSeq
    val want = fa.map(b => graft.imaging.PHash.dct64(
      graft.imaging.Raster.decode(b).toOption.get))
    assert(vaHashes == want, "real-decode path must hash the actual frames")

    // the shared-frame near-dup join finds the identical pair only
    val nd = Multimodal.videoNearDups(
        Multimodal.sampleFrames(media, 1, 10), minShared = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(nd.toSeq == Seq(("va", "vb")))

    // an AVI whose frames ImageIO cannot decode (a codec the JVM lacks)
    // must fall back to stub frames — the clip may not silently vanish
    val badCodec = s.createDataset(Seq(
      MediaRow("vx", "raw-clip", "video/avi",
        aviBytes(Seq(Array.fill[Byte](200)(11), Array.fill[Byte](200)(12))))))
    val fallback = Multimodal.sampleFrames(badCodec, 1, 10).collect()
    assert(fallback.nonEmpty && fallback.forall(_.doc_id == "vx"),
      "undecodable-frame AVI must emit stub frames")

    // a nested-LIST bomb (thousands of LIST headers) must not blow the
    // stack — malformed input is data, not a task-killing Error
    val bomb = {
      val depth = 20000
      val unit = 12 // "LIST" + size + "movi"
      val bb = java.nio.ByteBuffer.allocate(12 + depth * unit)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + depth * unit)
        .put("AVI ".getBytes("US-ASCII"))
      (0 until depth).foreach { i =>
        bb.put("LIST".getBytes("US-ASCII"))
          .putInt((depth - i) * unit - 8)
          .put("movi".getBytes("US-ASCII"))
      }
      bb.array()
    }
    assert(Multimodal.extractAviFrames(bomb).isEmpty) // no frames, no crash
  }

  /** 16-bit PCM RIFF/WAVE bytes for the given mono signal (or interleaved
    * stereo when two signals are given).
    */
  private def wavBytes(rate: Int, channels: Seq[Array[Double]]): Array[Byte] = {
    val n = channels.head.length
    val ch = channels.length
    val dataLen = n * ch * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      channels.foreach { c =>
        bb.putShort(math.round(math.max(-1.0, math.min(1.0, c(i))) * 32767).toShort)
      }
      i += 1
    }
    bb.array()
  }

  private def sine(freqHz: Double, rate: Int, seconds: Double, amp: Double,
                   noise: Double = 0.0): Array[Double] =
    Array.tabulate((rate * seconds).toInt) { i =>
      amp * math.sin(2 * math.Pi * freqHz * i / rate) +
        noise * math.sin(13.7 * i) // deterministic jitter
    }

  test("G.711 u-law re-encode decodes via the JDK tier and still fingerprints as the same clip") {
    val rate = 8000
    // amp 0.5 = −9.03 dB sits 0.03 dB from a decile edge — the case a
    // SINGLE hard quantizer failed on (µ-law's ~0.1 dB energy jitter
    // flipped every slot); the dual-offset grids guarantee >= 8 of 32
    // shared slots at ANY boundary position
    val tone = sine(440, rate, 1.0, 0.5)
    val pcmWav = wavBytes(rate, Seq(tone))
    // the JDK tier agrees with the pure RIFF parser on plain 16-bit PCM
    val viaJdk = Multimodal.decodeJavaSound(pcmWav).get
    val viaRiff = Multimodal.decodeWavPcm(pcmWav).get
    assert(viaJdk.sampleRate == viaRiff.sampleRate &&
      viaJdk.samples.length == viaRiff.samples.length)
    assert(viaJdk.samples.zip(viaRiff.samples)
      .forall { case (a, b) => math.abs(a - b) < 1e-6 })

    // µ-law (telephone-quality, 8-bit log) re-encode of the same clip:
    // only the JDK tier decodes it, and the coarse-quantized fingerprint
    // still matches the PCM original exactly
    import javax.sound.sampled._
    val src = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(pcmWav))
    val ulawStream = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.ULAW, rate.toFloat, 8, 1, 1, rate.toFloat, false),
      src)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawStream, AudioFileFormat.Type.WAVE, bos)
    val ulawWav = bos.toByteArray
    assert(Multimodal.decodeWavPcm(ulawWav).isEmpty,
      "the pure parser must decline non-PCM16 WAVs")
    val clipU = Multimodal.decodeJavaSound(ulawWav).get
    assert(clipU.sampleRate == rate)
    val shared = Multimodal.pcmFingerprint(clipU)
      .zip(Multimodal.pcmFingerprint(viaRiff)).count { case (a, b) => a == b }
    assert(shared >= 8,
      s"dual-grid guarantee violated: only $shared of 32 slots survived the re-encode")
  }

  test("WAV/PCM decodes for real: roundtrip, stereo downmix, noise-stable fingerprints, near-dup join") {
    implicit val s = spark
    import s.implicits._
    val rate = 8000
    val tone = sine(440, rate, 1.0, 0.5)
    // roundtrip: sample count, rate, and values survive 16-bit quantization
    val clip = Multimodal.decodeWavPcm(wavBytes(rate, Seq(tone))).get
    assert(clip.sampleRate == rate && clip.samples.length == tone.length)
    assert(clip.samples.zip(tone).forall { case (a, b) => math.abs(a - b) < 1e-3 })

    // stereo carrying the same signal on both channels downmixes to the
    // same fingerprint as the mono encoding
    val fpMono = Multimodal.pcmFingerprint(clip)
    val fpStereo = Multimodal.pcmFingerprint(
      Multimodal.decodeWavPcm(wavBytes(rate, Seq(tone, tone))).get)
    assert(fpMono.toSeq == fpStereo.toSeq)

    // small deterministic noise keeps >= 8 of 32 slots (the dual-grid
    // guarantee: per segment, at least one of the 4 grid pairs is stable
    // under sub-half-step jitter — here the noise sits exactly on the
    // offset zcr grid's boundary, flipping some offset slots while every
    // base pair survives); different pitch and different level share NONE
    def sharedSlots(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).count { case (x, y) => x == y }
    val fpNoisy = Multimodal.pcmFingerprint(
      Multimodal.decodeWavPcm(wavBytes(rate, Seq(sine(440, rate, 1.0, 0.5, noise = 0.001)))).get)
    assert(sharedSlots(fpMono, fpNoisy) >= 8,
      s"guarantee violated: ${sharedSlots(fpMono, fpNoisy)} of 32 shared")
    val fpOtherPitch = Multimodal.pcmFingerprint(
      Multimodal.decodeWavPcm(wavBytes(rate, Seq(sine(1760, rate, 1.0, 0.5)))).get)
    val fpQuiet = Multimodal.pcmFingerprint(
      Multimodal.decodeWavPcm(wavBytes(rate, Seq(sine(440, rate, 1.0, 0.05)))).get)
    assert(sharedSlots(fpMono, fpOtherPitch) == 0 && sharedSlots(fpMono, fpQuiet) == 0)

    // not-WAV payloads take the stub path, same schema; truncated/garbage
    // WAV prefixes must not crash the decoder
    assert(Multimodal.decodeWavPcm("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWavPcm(Array.fill[Byte](100)(3)).isEmpty)

    // end-to-end: the Spark features + shared-slot join find the real
    // near-dup pair (identical tone, one noisy re-record) and not the
    // different-pitch clip
    val media = s.createDataset(Seq(
      MediaRow("a1", "tone", "audio/wav", wavBytes(rate, Seq(tone))),
      MediaRow("a2", "tone-rerecord", "audio/wav",
        wavBytes(rate, Seq(sine(440, rate, 1.0, 0.5, noise = 0.001)))),
      MediaRow("a3", "other", "audio/wav", wavBytes(rate, Seq(sine(1760, rate, 1.0, 0.5))))))
    val feats = Multimodal.audioFeatures(media)
    assert(feats.collect().forall(_.getAs[Int]("duration_ms") == 1000))
    val f = feats.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.col("audio_fp")).as(Seq("w", "v"))).distinct()
    val l = f.select(f("doc_id").as("a"), f("w"), f("v"))
    val r = f.select(f("doc_id").as("b"), f("w"), f("v"))
    val pairs = l.join(r, Seq("w", "v"))
      .filter(org.apache.spark.sql.functions.col("a") <
        org.apache.spark.sql.functions.col("b"))
      .groupBy("a", "b")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("shared"))
      .filter(org.apache.spark.sql.functions.col("shared") >= 8)
      .collect().map(x => (x.getString(0), x.getString(1)))
    assert(pairs.toSeq == Seq(("a1", "a2")))
  }
}
