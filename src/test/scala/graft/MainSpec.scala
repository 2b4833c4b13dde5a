package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** End-to-end CLI spec (reference surface `cmd/dedupe/main.go:30-95,164-236`):
  * flag parsing incl. the stdin list source, the cats-corpus CSV groups, the
  * targeted-compare mode, and a keep-first delete on a scratch copy. All
  * discovery is the distributed binaryFile listing (zero driver-side walks).
  */
class MainSpec extends AnyFunSuite with SparkTestBase {

  private val root = "/root/reference/testimages"
  private def available: Boolean = new java.io.File(s"$root/cats/cat.jpg").exists()

  test("parse: flags, aliases, stdin list source, and errors") {
    val ok = Main.parse(Seq("--recursive", "--hash", "dhash", "--threshold", "7",
      "--move", "/tmp/x", "-q", "a", "b"), Iterator.empty).toOption.get
    assert(ok.recursive && ok.hashName == "dhash" && ok.threshold == 7 &&
      ok.moveTo == "/tmp/x" && ok.quiet && ok.targets == Seq("a", "b"))
    // `-` anywhere makes stdin REPLACE the positional targets (reference
    // slices.Contains semantics, cmd/dedupe/main.go:110-117)
    val fromStdin = Main.parse(Seq("x.jpg", "-"),
      Iterator("a.jpg b.jpg", "c.jpg")).toOption.get
    assert(fromStdin.targets == Seq("a.jpg", "b.jpg", "c.jpg"))
    assert(Main.parse(Seq("--bogus", "d"), Iterator.empty).isLeft)
    assert(Main.parse(Seq("--hash", "sha1", "d"), Iterator.empty).isLeft)
    assert(Main.parse(Seq(), Iterator.empty).isLeft) // no targets
    // --delete-all implies delete with keepFirst off
    val da = Main.parse(Seq("--delete-all", "d"), Iterator.empty).toOption.get
    assert(da.delete && da.deleteAll)
    // out-of-range / malformed threshold is a usage ERROR, never a crash
    // (exit 1 is reserved for "no duplicates" — a stack-trace death there
    // would read as a clean no-dup run to a calling script)
    assert(Main.parse(Seq("--threshold", "99999999999", "d"), Iterator.empty).isLeft)
    assert(Main.parse(Seq("--threshold", "-3", "d"), Iterator.empty).isLeft)
    assert(Main.parse(Seq("--threshold", "nope", "d"), Iterator.empty).isLeft)
    // stdin list source splits on ANY whitespace (tabs from cut/join tools)
    val tabbed = Main.parse(Seq("-"), Iterator("a.jpg\tb.jpg", " c.jpg ")).toOption.get
    assert(tabbed.targets == Seq("a.jpg", "b.jpg", "c.jpg"))
    // graft checkpoint extensions: --bucketed needs --checkpoint
    val cp = Main.parse(Seq("--checkpoint", "/tmp/cp", "--bucketed", "d"),
      Iterator.empty).toOption.get
    assert(cp.checkpointDir == "/tmp/cp" && cp.bucketed)
    assert(Main.parse(Seq("--bucketed", "d"), Iterator.empty).isLeft)
    // a value-taking flag as the LAST token: a specific "requires a value"
    // error (not "unknown flag" for --csv)
    val miss = Main.parse(Seq("d", "--csv"), Iterator.empty)
    assert(miss.isLeft && miss.swap.toOption.get.contains("requires a value"))
    // reference parity (main.go:63-77): -o/--output is a BOOLEAN (suppress
    // info, keep rows) — not a --csv alias; -v/--verbose and --version parse
    val ob = Main.parse(Seq("-o", "d"), Iterator.empty).toOption.get
    assert(ob.output && ob.csvOut.isEmpty && ob.targets == Seq("d") && ob.suppressInfo)
    val vb = Main.parse(Seq("--verbose", "d"), Iterator.empty).toOption.get
    assert(vb.verbose && !vb.suppressInfo)
    // --version needs no targets (reference exits before the target check)
    val ver = Main.parse(Seq("--version"), Iterator.empty).toOption.get
    assert(ver.version)
    assert(Main.parse(Seq("-q", "d"), Iterator.empty).toOption.get.suppressInfo)
  }

  test("E1: cats corpus groups — cat transforms in ONE csv row, keeper first") {
    assume(available)
    val cli = Main.CliConfig(targets = Seq(root), recursive = true)
    val buf = new java.io.ByteArrayOutputStream()
    val code = Main.run(spark, cli, new java.io.PrintStream(buf, true, "UTF-8"))
    assert(code == 0)
    val rows = buf.toString("UTF-8").linesIterator.toSeq
    val catRow = rows.filter(_.contains("/cat.jpg"))
    assert(catRow.size == 1, rows.mkString("\n"))
    val members = catRow.head.split(',').map(_.split('/').last).toSet
    // README.md:9-14 transform set under DCT radius 22 (incl. the inverted
    // cat, whose DCT distance is 6 — see CatsAcceptanceSpec)
    Seq("cat.jpg", "cat-dark.jpg", "cat-greyscale.jpg", "cat-distorted.jpg",
      "cat-upscaled.jpg", "cat-saturated.jpg", "cat-skewed.jpg", "cat-shrink.jpg")
      .foreach(t => assert(members.contains(t), s"$t missing from ${members}"))
    assert(!members.contains("cat-on-couch.jpg") && !members.contains("kitten.jpg"))
    // keeper (min path) leads each row
    assert(catRow.head.split(',').head == catRow.head.split(',').min)
    // the kitten copies form their own row
    assert(rows.exists(r => r.contains("/kitten.jpg") && r.contains("copy-of-kitten.jpg")))
  }

  test("E1: --csv sink writes the same group rows to a directory") {
    assume(available)
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft-cli-csv").resolve("groups").toString
    val cli = Main.CliConfig(targets = Seq(root), recursive = true, csvOut = out, quiet = true)
    assert(Main.run(spark, cli, new java.io.PrintStream(new java.io.ByteArrayOutputStream())) == 0)
    val lines = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".txt"))
      .flatMap(p => Files.readAllLines(p).asScala).toList
    assert(lines.exists(_.contains("/cat.jpg")))
  }

  test("E2: first-arg image without --search compares against the rest") {
    assume(available)
    val cli = Main.parse(Seq(s"$root/cats/cat.jpg", s"$root/cats"), Iterator.empty).toOption.get
    val buf = new java.io.ByteArrayOutputStream()
    val code = Main.run(spark, cli, new java.io.PrintStream(buf, true, "UTF-8"))
    assert(code == 0)
    val lines = buf.toString("UTF-8").trim.linesIterator.toSeq
    // reference header precedes the row (main.go:188-189); it names the target
    assert(lines.head.matches("These \\d+ images are duplicates of .*cat\\.jpg"),
      lines.mkString("\n"))
    val members = lines.last.split(',').map(_.split('/').last).toSet
    assert(members.contains("cat-dark.jpg") && members.contains("cat-shrink.jpg"))
    assert(!members.contains("cat.jpg"), "target itself must not be in its duplicate list")
    assert(!members.contains("cat-on-couch.jpg"))
    // --output (reference -o): same rows, info header dropped — the
    // pipe-to-csv mode; --quiet: nothing at all, exit code still 0
    val bufO = new java.io.ByteArrayOutputStream()
    assert(Main.run(spark, cli.copy(output = true),
      new java.io.PrintStream(bufO, true, "UTF-8")) == 0)
    assert(bufO.toString("UTF-8").trim == lines.last, "output mode must print rows only")
    val bufQ = new java.io.ByteArrayOutputStream()
    assert(Main.run(spark, cli.copy(quiet = true),
      new java.io.PrintStream(bufQ, true, "UTF-8")) == 0)
    assert(bufQ.toString("UTF-8").isEmpty, "quiet mode must print nothing")
  }

  test("exit code 1 when no duplicates are found") {
    assume(available)
    // two visually unrelated wallpapers
    val cli = Main.CliConfig(targets = Seq(
      s"$root/06d8ab52-f423-4507-8555-ca105db9e820.jpg",
      s"$root/abbee063-3963-47ad-be61-0bba171eb8ab.jpg"), search = true, quiet = true)
    val code = Main.run(spark, cli, new java.io.PrintStream(new java.io.ByteArrayOutputStream()))
    assert(code == 1)
  }

  test("E2 + --delete: a SINGLE duplicate of the target is still acted on") {
    assume(available)
    // 1-member compare group — with the full-dedup minGroupSize=2 filter
    // this was a silent no-op (round-3 review finding)
    val tmp = Files.createTempDirectory("graft-cli-single")
    Files.copy(Paths.get(s"$root/cats/cat-dark.jpg"), tmp.resolve("cat-dark.jpg"))
    try {
      val cli = Main.parse(Seq(s"$root/cats/cat.jpg", tmp.toString, "--delete-all", "-q"),
        Iterator.empty).toOption.get
      val code = Main.run(spark, cli, new java.io.PrintStream(new java.io.ByteArrayOutputStream()))
      assert(code == 0)
      assert(!Files.exists(tmp.resolve("cat-dark.jpg")), "single duplicate not deleted")
      assert(Files.exists(Paths.get(s"$root/cats/cat.jpg")), "target must never be acted on")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.list(tmp).iterator().asScala.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(tmp)
    }
  }

  test("--checkpoint: stage state lands on disk, resumes, and --bucketed agrees") {
    assume(available)
    import scala.jdk.CollectionConverters._
    def runTo(cli: Main.CliConfig): String = {
      val buf = new java.io.ByteArrayOutputStream()
      assert(Main.run(spark, cli, new java.io.PrintStream(buf, true, "UTF-8")) == 0)
      buf.toString("UTF-8")
    }
    val base = Main.CliConfig(targets = Seq(s"$root/cats"))
    val plain = runTo(base)
    val cpDir = Files.createTempDirectory("graft-cli-cp")
    try {
      val cp = base.copy(checkpointDir = cpDir.toString)
      assert(runTo(cp) == plain, "checkpointed run diverged from plain run")
      val manifests = Files.walk(cpDir).iterator().asScala
        .filter(_.getFileName.toString == "_graft_manifest.json").toList
      assert(manifests.nonEmpty, "no stage manifests written under --checkpoint")
      // resume: second run must reuse the completed stages (manifests
      // untouched — stage() only rewrites on a resume-key mismatch)
      val mtimes = manifests.map(p => p -> Files.getLastModifiedTime(p)).toMap
      assert(runTo(cp) == plain)
      manifests.foreach(p => assert(Files.getLastModifiedTime(p) == mtimes(p),
        s"stage rewritten on resume: $p"))
      // bucketed state layout produces the same groups
      val bk = base.copy(checkpointDir = cpDir.resolve("bucketed").toString, bucketed = true)
      assert(runTo(bk) == plain, "bucketed checkpointed run diverged")
    } finally {
      Files.walk(cpDir).iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  test("action failures are counted (exit-3 path): nonexistent files fail the plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val members = Seq(("/nope/a.jpg", "g1"), ("/nope/b.jpg", "g1"))
      .toDF("doc_id", "cluster_id").withColumn("path", col("doc_id"))
    val results = graft.sinks.FileActions.execute(spark,
      graft.sinks.FileActions.plan(members, "delete", keepFirst = false))
      .collect()
    assert(results.length == 2 && results.forall(!_.ok),
      results.mkString(", "))
  }

  test("--delete keep-first: survivors are exactly the per-group keepers") {
    assume(available)
    // scratch copy of the cats dir (never touch the read-only reference)
    val tmp = Files.createTempDirectory("graft-cli-del")
    val src = Paths.get(s"$root/cats")
    Files.list(src).iterator().forEachRemaining { p =>
      Files.copy(p, tmp.resolve(p.getFileName.toString))
    }
    try {
      val cliGroups = Main.CliConfig(targets = Seq(tmp.toString))
      val expected = Main.duplicateGroups(spark, cliGroups)
        .select("members").collect()
        .map(_.getSeq[String](0)).map(m => (m.min, m.toSet)).toSeq
      assert(expected.nonEmpty)
      val cli = cliGroups.copy(delete = true, quiet = true)
      assert(Main.run(spark, cli, new java.io.PrintStream(new java.io.ByteArrayOutputStream())) == 0)
      expected.foreach { case (keeper, members) =>
        assert(Files.exists(Paths.get(keeper)), s"keeper deleted: $keeper")
        (members - keeper).foreach(m =>
          assert(!Files.exists(Paths.get(m)), s"duplicate survived: $m"))
      }
      // singletons (not in any duplicate group) are never touched
      Seq("cat-on-couch.jpg", "kitten-looking-up.jpg").foreach(f =>
        assert(Files.exists(tmp.resolve(f)), s"singleton deleted: $f"))
    } finally {
      import scala.jdk.CollectionConverters._
      Files.list(tmp).iterator().asScala.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(tmp)
    }
  }
}
