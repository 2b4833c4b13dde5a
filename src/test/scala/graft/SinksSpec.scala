package graft

import graft.sinks.{FileActions, Report}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** Report (A3 group materialization + S7 CSV sink) and file-action sinks
  * (S8 move / S9 copy / S10 delete with keep-first survivorship) —
  * semantics per `/root/reference/cmd/dedupe/main.go:194-236`,
  * `utils/file.go:63-92`.
  */
class SinksSpec extends AnyFunSuite with SparkTestBase {

  import scala.jdk.CollectionConverters._

  private def clustersDf() = {
    import spark.implicits._
    // clusters: {1,2,3} (keeper 1), {5,6} (keeper 5), singleton 9
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
  }

  test("Report.groups materializes multi-member clusters, keeper first") {
    val g = Report.groups(clustersDf()).orderBy("cluster_id").collect()
    assert(g.length == 2)
    assert(g(0).getAs[Long]("cluster_id") == 1L)
    assert(g(0).getAs[Long]("n_members") == 3L)
    assert(g(0).getSeq[Long](g(0).fieldIndex("members")) == Seq(1L, 2L, 3L))
    assert(g(1).getSeq[Long](g(1).fieldIndex("members")) == Seq(5L, 6L))
  }

  test("Report.groups maxMembers bounds the aggregation buffer (100k-member cluster)") {
    import spark.implicits._
    // one adversarial 100k-member cluster + one normal pair
    val big = spark.range(0, 100000).select(col("id").as("doc_id"), lit(0L).as("cluster_id"))
    val df = big.union(Seq((200000L, 200000L), (200001L, 200000L)).toDF("doc_id", "cluster_id"))
    val g = Report.groups(df, maxMembers = 10)
    // the cap is applied BEFORE collect_list: a rank filter feeds the agg
    val plan = g.queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number"), plan.take(800))
    val rows = g.orderBy("cluster_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_members") == 100000L) // counts ALL members
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("members")) == (0L until 10L))
    assert(rows(1).getSeq[Long](rows(1).fieldIndex("members")) == Seq(200000L, 200001L))
  }

  test("Report.writeGroupsCsv emits one comma-joined row per group") {
    val out = Files.createTempDirectory("graft-csv").resolve("groups").toString
    Report.writeGroupsCsv(Report.groups(clustersDf()), out, coalesce1 = true)
    val lines = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".txt"))
      .flatMap(p => Files.readAllLines(p).asScala).toList.sorted
    assert(lines == List("1,2,3", "5,6"))
  }

  private def mkFiles(dir: Path, ids: Seq[Long]): Map[Long, String] =
    ids.map { id =>
      val p = dir.resolve(s"doc$id.txt")
      Files.writeString(p, s"content-$id")
      id -> p.toString
    }.toMap

  private def withPaths(paths: Map[Long, String]) = {
    import spark.implicits._
    val pdf = paths.toSeq.toDF("doc_id", "path")
    clustersDf().join(pdf, "doc_id")
  }

  test("delete keep-first removes dups, keeps keepers and singletons") {
    val dir = Files.createTempDirectory("graft-del")
    val paths = mkFiles(dir, Seq(1, 2, 3, 5, 6, 9))
    val plan = FileActions.plan(withPaths(paths), "delete")
    val res = FileActions.execute(spark, plan).collect()
    assert(res.forall(_.ok), res.filterNot(_.ok).mkString(";"))
    assert(res.map(_.src).toSet == Set(paths(2L), paths(3L), paths(6L)))
    assert(Files.exists(Paths.get(paths(1L))) && Files.exists(Paths.get(paths(5L))) &&
      Files.exists(Paths.get(paths(9L))), "keeper/singleton deleted")
    assert(!Files.exists(Paths.get(paths(2L))) && !Files.exists(Paths.get(paths(3L))) &&
      !Files.exists(Paths.get(paths(6L))), "dup survived delete")
  }

  test("delete-all (keepFirst=false) removes every group member") {
    val dir = Files.createTempDirectory("graft-delall")
    val paths = mkFiles(dir, Seq(1, 2, 3, 5, 6, 9))
    FileActions.execute(spark,
      FileActions.plan(withPaths(paths), "delete", keepFirst = false)).collect()
    Seq(1L, 2L, 3L, 5L, 6L).foreach(id =>
      assert(!Files.exists(Paths.get(paths(id))), s"doc$id survived delete-all"))
    assert(Files.exists(Paths.get(paths(9L))), "singleton must survive")
  }

  test("move relocates groups into per-cluster dirs; copy duplicates them") {
    val dir = Files.createTempDirectory("graft-mv")
    val paths = mkFiles(dir, Seq(1, 2, 3, 5, 6, 9))
    val dest = Files.createTempDirectory("graft-mv-dest").toString
    val res = FileActions.execute(spark,
      FileActions.plan(withPaths(paths), "move", destDir = dest)).collect()
    assert(res.forall(_.ok))
    // every member of both groups moved, grouped by cluster id; singleton untouched
    assert(Files.exists(Paths.get(dest, "group-1", "doc1.txt")))
    assert(Files.exists(Paths.get(dest, "group-1", "doc3.txt")))
    assert(Files.exists(Paths.get(dest, "group-5", "doc6.txt")))
    assert(!Files.exists(Paths.get(paths(1L))))
    assert(Files.exists(Paths.get(paths(9L))))

    val dir2 = Files.createTempDirectory("graft-cp")
    val paths2 = mkFiles(dir2, Seq(1, 2, 5, 6, 9))
    val dest2 = Files.createTempDirectory("graft-cp-dest").toString
    // cluster {1,2} and {5,6} via the same clustersDf (3 is absent -> inner join drops it)
    FileActions.execute(spark,
      FileActions.plan(withPaths(paths2), "copy", destDir = dest2)).collect()
    assert(Files.exists(Paths.get(dest2, "group-1", "doc2.txt")))
    assert(Files.exists(Paths.get(paths2(2L))), "copy must not remove the source")
    assert(Files.readString(Paths.get(dest2, "group-1", "doc2.txt")) == "content-2")
  }

  test("failures are data, not exceptions: missing file yields ok=false row") {
    import spark.implicits._
    val ghost = Seq((2L, 1L, "/nonexistent/ghost.txt", "", "delete"))
      .toDF("doc_id", "cluster_id", "src", "dest", "action")
    val res = FileActions.execute(spark, ghost).collect()
    assert(res.length == 1 && !res(0).ok && res(0).error.nonEmpty)
  }

  test("same-basename members of one group get disambiguated dests (no silent clobber)") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("graft-col-a")
    val dirB = Files.createTempDirectory("graft-col-b")
    Files.writeString(dirA.resolve("img.txt"), "content-A")
    Files.writeString(dirB.resolve("img.txt"), "content-B")
    val dest = Files.createTempDirectory("graft-col-dest").toString
    val clusters = Seq(
      (s"$dirA/img.txt", 1L, s"$dirA/img.txt"),
      (s"$dirB/img.txt", 1L, s"$dirB/img.txt"))
      .toDF("doc_id", "cluster_id", "path")
    val plan = FileActions.plan(clusters, "copy", destDir = dest)
    // both rows plan to DIFFERENT dests
    assert(plan.select("dest").distinct().count() == 2)
    val res = FileActions.execute(spark, plan).collect()
    assert(res.forall(_.ok))
    // both contents survive: the src-ordered first keeps the plain name,
    // the collision gets the "<rank>-<md5(src) 8 hex>-" prefix (the src
    // hash makes the synthesized name unable to equal a REAL member
    // basename like "2-img.txt" in the same group)
    val h8 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dirB/img.txt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    assert(Files.readString(Paths.get(dest, "group-1", "img.txt")) == "content-A")
    assert(Files.readString(Paths.get(dest, "group-1", s"2-$h8-img.txt")) == "content-B")
  }

  test("synthesized collision names cannot clobber a real member basename") {
    import spark.implicits._
    // the ADVICE r4 scenario: a/img.jpg, b/img.jpg, c/2-img.jpg in ONE
    // group — a bare rank prefix would plan b to "2-img.jpg", the exact
    // plain name c keeps; all three dests must be distinct
    val clusters = Seq(
      ("a/img.jpg", 1L, "a/img.jpg"),
      ("b/img.jpg", 1L, "b/img.jpg"),
      ("c/2-img.jpg", 1L, "c/2-img.jpg"))
      .toDF("doc_id", "cluster_id", "path")
    val plan = FileActions.plan(clusters, "copy", destDir = "/tmp/adv")
    val dests = plan.select("dest").collect().map(_.getString(0)).toSet
    assert(dests.size == 3, s"dest collision: $dests")
    assert(dests.contains("/tmp/adv/group-1/img.jpg"))
    assert(dests.contains("/tmp/adv/group-1/2-img.jpg"))
  }

  test("retried move is idempotent: src gone + dest present reads as ok") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-retry")
    Files.writeString(dir.resolve("m.txt"), "content-M")
    val dest = Files.createTempDirectory("graft-retry-dest").toString
    val plan = Seq((s"$dir/m.txt", 1L, s"$dir/m.txt", s"$dest/group-1/m.txt", "move"))
      .toDF("doc_id", "cluster_id", "src", "dest", "action")
    assert(FileActions.execute(spark, plan).collect().forall(_.ok))
    // re-execute the same plan (a task retry re-runs its whole slice):
    // the already-moved file must read as ok, not a spurious failure
    val second = FileActions.execute(spark, plan).collect()
    assert(second.forall(_.ok), s"retry read as failure: ${second.toSeq}")
    assert(Files.readString(Paths.get(dest, "group-1", "m.txt")) == "content-M")
  }

  test("CSV fields with commas/quotes are RFC-4180 quoted; plain rows stay bare") {
    import spark.implicits._
    val g = Seq(
      ("g1", 2L, Seq("/a/plain.txt", "/b/plain.txt")),
      ("g2", 2L, Seq("/a/cats, dogs.txt", "/b/has\"quote.txt")))
      .toDF("cluster_id", "n_members", "members")
    val dir = Files.createTempDirectory("graft-csvq").toString + "/out"
    Report.writeGroupsCsv(g, dir, coalesce1 = true)
    val rows = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".txt")).flatMap(p =>
        Files.readAllLines(p).asScala).toList.sorted
    assert(rows == List(
      "\"/a/cats, dogs.txt\",\"/b/has\"\"quote.txt\"",
      "/a/plain.txt,/b/plain.txt"))
  }

  test("csvField quotes leading-whitespace fields and the literal \\. like Go encoding/csv") {
    import spark.implicits._
    // Go's fieldNeedsQuotes: leading space/tab (any unicode.IsSpace first
    // rune) and the exact field `\.` are quoted even without commas
    val got = Seq(" lead-space.txt", "\tlead-tab.txt", "\\.", "mid space.txt",
        "\u00a0nbsp.txt", "trail.txt ")
      .toDF("f").select(Report.csvField(col("f")).as("q"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("\" lead-space.txt\"", "\"\tlead-tab.txt\"", "\"\\.\"",
      "mid space.txt", "\"\u00a0nbsp.txt\"", "trail.txt "))
  }
}
