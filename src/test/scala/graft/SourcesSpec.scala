package graft

import graft.model.{Doc, Span}
import graft.sources.MediaSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Directory media source (S1/S2), path classifier (S3), list-source
  * semi-join (S4) — reference `utils/file.go:25-60`, `cmd/dedupe/main.go:110-117`.
  */
class SourcesSpec extends AnyFunSuite with SparkTestBase {

  private val root = "/root/reference/testimages"
  private def available: Boolean = new java.io.File(s"$root/cats/cat.jpg").exists()

  test("recursive scan finds exactly the image files the reference walk finds") {
    assume(available)
    def goWalk(dir: java.io.File): Seq[String] =
      dir.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) goWalk(f)
        else if (Seq(".png", ".jpg", ".jpeg").exists(f.getName.endsWith)) Seq(f.getName)
        else Nil
      }
    val expected = goWalk(new java.io.File(root)).sorted
    val got = MediaSource.scanImages(spark, root, recursive = true)
      .select("path").collect().map(_.getString(0).split('/').last).sorted.toSeq
    assert(got == expected)
    assert(got.contains("cat.jpg") && got.size > 20)
  }

  test("non-recursive scan skips subdirectories (reference SkipDir)") {
    assume(available)
    val got = MediaSource.scanImages(spark, root, recursive = false)
      .select("path").collect().map(_.getString(0).split('/').last).toSet
    assert(!got.contains("cat.jpg"), "cats/ subdir leaked into top-level scan")
    assert(got.exists(_.endsWith(".jpeg")) && got.exists(_.endsWith(".jpg")))
  }

  test("path-only projection does not read file bytes (column pruning)") {
    assume(available)
    val plan = MediaSource.scanImages(spark, root).select("path")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<path:string>"), plan.takeRight(500))
  }

  test("kindOfPath classifies extensions as a dataflow column") {
    import spark.implicits._
    val got = Seq("/a/x.jpg", "/a/y.mp4", "/a/z.wav", "/a/w.txt", "/a/v.jpeg")
      .toDF("p").select(MediaSource.kindOfPath(col("p")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("image", "video", "audio", "other", "image"))
  }

  test("asDocs: same basename in different directories yields distinct doc_ids") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-src").toFile
    try {
      Seq("a", "b").foreach { d =>
        val dir = new java.io.File(tmp, d); dir.mkdirs()
        val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "cat.png"))
      }
      val docs = MediaSource.asDocs(spark,
        MediaSource.scanImages(spark, tmp.getAbsolutePath, recursive = true)).collect()
      assert(docs.length == 2)
      assert(docs.map(_.doc_id).distinct.length == 2, "basename collision in doc_id")
      // doc_id doubles as the span's media_ref: both resolve to real files
      docs.foreach(d => assert(new java.io.File(d.doc_id).isFile, d.doc_id))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("asDocs yields resolvable paths for names with URI-special chars") {
    // PINNING test for the Hadoop Path ambiguity: this Spark line emits
    // the binaryFile `path` column RAW (space/%/# literal, probed), so
    // asDocs must NOT URI-decode — a literal "%25" would corrupt to "%".
    // If a future engine version switches the column to URI-encoded form,
    // this test fails loudly and MediaSource.localPath is where the
    // decode belongs.
    val tmp = java.nio.file.Files.createTempDirectory("graft-uri").toFile
    try {
      val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      javax.imageio.ImageIO.write(img, "png", new java.io.File(tmp, "my cat.png"))
      javax.imageio.ImageIO.write(img, "png", new java.io.File(tmp, "pct%25.png"))
      javax.imageio.ImageIO.write(img, "png", new java.io.File(tmp, "ha#sh.png"))
      val docs = MediaSource.asDocs(spark,
        MediaSource.scanImages(spark, tmp.getAbsolutePath, recursive = false)).collect()
      assert(docs.length == 3)
      docs.foreach { d =>
        assert(new java.io.File(d.doc_id).isFile, s"unresolvable doc_id ${d.doc_id}")
        assert(d.doc_id == d.spans.head.media_ref)
      }
      assert(docs.exists(_.doc_id.endsWith("/my cat.png")))
      assert(docs.exists(_.doc_id.endsWith("/pct%25.png")))
      assert(docs.exists(_.doc_id.endsWith("/ha#sh.png")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("restrictTo semi-joins docs against an external id list") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      Doc("a", Seq(Span.text("x", 0))),
      Doc("b", Seq(Span.text("y", 0))),
      Doc("c", Seq(Span.text("z", 0)))))
    val ids = spark.createDataset(Seq("a", "c", "nope"))
    val got = MediaSource.restrictTo(docs, ids).collect().map(_.doc_id).sorted.toSeq
    assert(got == Seq("a", "c"))
  }
}
