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
    val (feats, errs) = Multimodal.imageFeatures(s.createDataset(Seq(good, bad)))
    val f = feats.collect()
    assert(f.length == 1 && f(0).doc_id == "d1")
    assert(f(0).width == 32 && f(0).height == 32)
    // PNG round-trip is lossless → pHash equals hashing the raster directly
    assert(f(0).phash == graft.imaging.PHash.dct64(SynthMedia.resolve("synth://mm-1").toOption.get))
    assert(f(0).mean_luma > 0.0 && f(0).mean_luma < 1.0)
    val e = errs.collect()
    assert(e.length == 1 && e(0).doc_id == "d2")
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
    assert(audio.map(_.getAs[scala.collection.Seq[Long]]("audio_fp")).forall(_.length == 8))

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
}
