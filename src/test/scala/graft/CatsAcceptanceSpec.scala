package graft

import graft.model.{Doc, Span}
import graft.pipeline.{GraftConfig, Pipeline}
import org.scalatest.funsuite.AnyFunSuite

/** Acceptance corpus from the reference's own test images
  * (`/root/reference/testimages/`, labeling per its README.md:9-14 and the
  * corpus description README.md:115-117 — the wallpaper dump deliberately
  * CONTAINS direct duplicates and recolorings).
  *
  * Measured kernel facts this suite locks (our port is the oracle —
  * SURVEY.md §7.4.2; the Go binary never runs here):
  *  - DCT radius 22 clusters all 8 cat transforms, and also the inverted
  *    cat (its DCT distance to cat.jpg is 6 — the luminosity structure
  *    survives this particular inversion, so the hash math cannot separate
  *    it; the README's inversion claim holds under dHash, tested below);
  *  - dHash radius 10 separates the inversion (distance 16) while keeping
  *    the brightness/scale transforms (dark=4, shrink=0, upscaled=2).
  */
class CatsAcceptanceSpec extends AnyFunSuite with SparkTestBase {

  private val root = "/root/reference/testimages"

  private def available: Boolean = new java.io.File(s"$root/cats/cat.jpg").exists()

  private def runPipeline(cfg: GraftConfig): Map[String, String] = {
    implicit val s = spark
    // dataflow source end-to-end (S1/S2): distributed binaryFile listing
    // with the image-extension glob — zero driver-side directory walking
    val docs = graft.sources.MediaSource.asDocs(s,
      graft.sources.MediaSource.scanImages(s, root, recursive = true))
    // doc_id is the full path (collision-safe under recursion); this corpus
    // has unique basenames, so key the assertions by basename for brevity
    Pipeline.run(s, docs, cfg).clusters.select("doc_id", "cluster_id")
      .collect().map(x => (x.getString(0).split('/').last, x.getString(1))).toMap
  }

  private lazy val dct = runPipeline(GraftConfig()) // DCT, radius 22 (defaults)
  private lazy val dhash = runPipeline(GraftConfig(useDct = false, mediaThreshold = 10))

  test("DCT: cat transforms cluster with cat.jpg (README.md:9-14)") {
    assume(available)
    val transforms = Seq("cat.jpg", "cat-dark.jpg", "cat-greyscale.jpg",
      "cat-distorted.jpg", "cat-upscaled.jpg", "cat-saturated.jpg",
      "cat-skewed.jpg", "cat-shrink.jpg")
    assert(transforms.map(dct(_)).toSet.size == 1,
      transforms.map(t => s"$t=${dct(t)}").mkString(", "))
  }

  test("DCT: kitten copies cluster together; kitten-looking-up stays out") {
    assume(available)
    val kittens = Seq("kitten.jpg", "copy-of-kitten.jpg", "kitten-resized.jpg")
    assert(kittens.map(dct(_)).toSet.size == 1)
    assert(dct("kitten-looking-up.jpg") != dct("kitten.jpg"))
  }

  test("DCT: couch cat is not a duplicate of cat (different subject framing)") {
    assume(available)
    assert(dct("cat-on-couch.jpg") != dct("cat.jpg"))
  }

  test("DCT: cats and kittens never merge with wallpapers") {
    assume(available)
    val catCluster = dct("cat.jpg")
    val kittenCluster = dct("kitten.jpg")
    val walls = new java.io.File(root).listFiles().filter(_.isFile).map(_.getName)
    walls.foreach { w =>
      assert(dct(w) != catCluster && dct(w) != kittenCluster, s"wallpaper $w merged with cats")
    }
  }

  test("DCT: byte-identical wallpapers cluster (direct duplicates in the dump)") {
    assume(available)
    // md5-identical pair in the corpus
    assert(dct("17be544c-8296-46b1-a981-6ea6a5a508d1.jpg") ==
      dct("a455e0ac-d2fc-415d-8840-dcebf1aef85e.jpg"))
    // visually unrelated wallpapers stay apart
    assert(dct("06d8ab52-f423-4507-8555-ca105db9e820.jpg") !=
      dct("abbee063-3963-47ad-be61-0bba171eb8ab.jpg"))
  }

  test("dHash radius 10: inversion is NOT a duplicate (README.md:7), scale/brightness are") {
    assume(available)
    assert(dhash("cat-inverted.jpg") != dhash("cat.jpg"))
    Seq("cat-dark.jpg", "cat-shrink.jpg", "cat-upscaled.jpg").foreach { t =>
      assert(dhash(t) == dhash("cat.jpg"), s"$t split from cat under dhash")
    }
    assert(dhash("kitten.jpg") == dhash("copy-of-kitten.jpg"))
  }
}
