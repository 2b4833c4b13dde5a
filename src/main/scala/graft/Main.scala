package graft

import graft.model.{Doc, Span}
import graft.pipeline.{GraftConfig, Pipeline}
import graft.sinks.{FileActions, Report}
import graft.sources.MediaSource
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit front door mirroring the reference CLI
  * (`/root/reference/cmd/dedupe/main.go:30-95,164-236`):
  *
  *   spark-submit --class graft.Main graft.jar \
  *     [--recursive] [--search] [--hash dct|dhash] [--threshold N] \
  *     [--csv DIR|-] [--move DIR|--copy DIR|--delete|--delete-all] \
  *     <image|dir|-> [<image|dir> ...]
  *
  * Semantics preserved from the reference:
  *  - first arg is an image and no --search → targeted compare (E2): which
  *    of the remaining images/dirs duplicate it;
  *  - otherwise full dedup (E1): block → score → cluster over every image
  *    found, one CSV row per duplicate group, keeper (min path) first;
  *  - `-` as an argument reads whitespace-separated targets from stdin
  *    (the reference's list source);
  *  - --threshold overrides the hash radius (F4); --hash picks dct
  *    (radius 22) or dhash (radius 10) — `hash/hash.go:29-39`;
  *  - --move/--copy relocate every member of each group into a per-group
  *    directory; --delete removes all but the keeper; --delete-all removes
  *    every member (`cmd/dedupe/main.go:208-236`);
  *  - exit 0 when duplicates were found, 1 when none (the reference returns
  *    an error for the no-duplicates case so callers can branch on it).
  *
  * Everything is dataflow: directory listing is the distributed binaryFile
  * index, survivorship is an anti-join plan, file actions run as a
  * mapPartitions sink — the driver never walks directories or loops groups.
  */
object Main {

  final case class CliConfig(
      targets: Seq[String] = Vector.empty,
      recursive: Boolean = false,
      search: Boolean = false,
      hashName: String = "dct",
      threshold: Int = 0,
      csvOut: String = "", // "" = print groups to stdout; else a directory for the CSV sink
      moveTo: String = "",
      copyTo: String = "",
      delete: Boolean = false,
      deleteAll: Boolean = false,
      quiet: Boolean = false)

  val usage: String =
    """usage: graft.Main [--recursive] [--search] [--hash dct|dhash] [--threshold N]
      |                  [--csv DIR|-] [--move DIR|--copy DIR|--delete|--delete-all]
      |                  [--quiet] <image|dir|-> [<image|dir> ...]""".stripMargin

  /** Pure argument parser (no I/O except the lazily-read stdin for `-`). */
  def parse(args: Seq[String], stdin: => Iterator[String]): Either[String, CliConfig] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: CliConfig): Either[String, CliConfig] = rest match {
      case Nil => Right(acc)
      case ("--recursive" | "-r") :: t => loop(t, acc.copy(recursive = true))
      case "--search" :: t => loop(t, acc.copy(search = true))
      case ("--quiet" | "-q") :: t => loop(t, acc.copy(quiet = true))
      case "--hash" :: h :: t if h == "dct" || h == "dhash" => loop(t, acc.copy(hashName = h))
      case "--hash" :: h :: _ => Left(s"unknown hash type '$h' (dct, dhash)")
      case "--threshold" :: v :: t if v.forall(_.isDigit) && v.nonEmpty =>
        loop(t, acc.copy(threshold = v.toInt))
      case ("--csv" | "-o") :: p :: t => loop(t, acc.copy(csvOut = p))
      case ("--move" | "-m") :: p :: t => loop(t, acc.copy(moveTo = p))
      case ("--copy" | "-c") :: p :: t => loop(t, acc.copy(copyTo = p))
      case ("--delete" | "-d") :: t => loop(t, acc.copy(delete = true))
      case "--delete-all" :: t => loop(t, acc.copy(delete = true, deleteAll = true))
      case "-" :: t =>
        // stdin list source (reference cmd/dedupe/main.go:110-117)
        val fromStdin = stdin.flatMap(_.split(' ')).filter(_.nonEmpty).toVector
        loop(t, acc.copy(targets = acc.targets ++ fromStdin))
      case f :: _ if f.startsWith("--") => Left(s"unknown flag $f\n$usage")
      case f :: t => loop(t, acc.copy(targets = acc.targets :+ f))
    }
    loop(args.toList, CliConfig()).filterOrElse(_.targets.nonEmpty, s"no targets provided\n$usage")
  }

  private val imageExts = Seq(".png", ".jpg", ".jpeg")
  private def isImageFile(p: String): Boolean =
    imageExts.exists(p.toLowerCase.endsWith) && new java.io.File(p).isFile

  /** GraftConfig for the CLI's media-only pipeline: dct/dhash radius with
    * the reference defaults, --threshold override (strict `<`, F4).
    */
  def graftConfig(cli: CliConfig): GraftConfig = {
    val useDct = cli.hashName == "dct"
    val defaultThreshold = if (useDct) 22 else 10
    GraftConfig(useDct = useDct,
      mediaThreshold = if (cli.threshold > 0) cli.threshold else defaultThreshold)
  }

  /** Targets → Dataset[Doc]: directories become distributed binaryFile
    * scans, explicit image paths become single-span docs. doc_id = path.
    */
  def collectDocs(spark: SparkSession, cli: CliConfig): Dataset[Doc] = {
    import spark.implicits._
    val (dirs, files) = cli.targets.partition(t => new java.io.File(t).isDirectory)
    val imageFiles = files.filter(isImageFile)
    val dirDocs = dirs.map(d =>
      MediaSource.asDocs(spark, MediaSource.scanImages(spark, d, cli.recursive)))
    val fileDocs =
      if (imageFiles.isEmpty) None
      else Some(spark.createDataset(imageFiles.map(p =>
        Doc(new java.io.File(p).getAbsolutePath,
          Seq(Span.media(new java.io.File(p).getAbsolutePath, 0))))))
    (dirDocs ++ fileDocs).reduceOption(_ union _)
      .getOrElse(spark.emptyDataset[Doc])
  }

  /** E1: duplicate groups over every target image —
    * (cluster_id, n_members, members) for multi-member clusters.
    */
  def duplicateGroups(spark: SparkSession, cli: CliConfig): DataFrame = {
    val docs = collectDocs(spark, cli)
    Report.groups(Pipeline.run(spark, docs, graftConfig(cli)).clusters)
  }

  /** E2: paths among `candidates` that duplicate the single target image. */
  def compareTarget(spark: SparkSession, cli: CliConfig): DataFrame = {
    val target = cli.targets.head
    val rest = cli.copy(targets = cli.targets.tail)
    val targetDoc = Doc(new java.io.File(target).getAbsolutePath,
      Seq(Span.media(new java.io.File(target).getAbsolutePath, 0)))
    Pipeline.compare(spark, targetDoc, collectDocs(spark, rest), graftConfig(cli))
  }

  /** Execute the parsed CLI against a session. Returns the exit code. */
  def run(spark: SparkSession, cli: CliConfig,
          out: java.io.PrintStream = System.out): Int = {
    val compareMode = isImageFile(cli.targets.head) && !cli.search
    // groups as (cluster_id, members[path]) — compare mode yields ONE group
    // of the target's duplicates, mirroring the reference's single-row CSV
    val groups: DataFrame =
      if (compareMode) {
        val dups = compareTarget(spark, cli)
        dups.agg(collect_list(col("doc_id")).as("members"))
          .select(lit("target").as("cluster_id"), size(col("members")).as("n_members"),
            sort_array(col("members")).as("members"))
          .filter(col("n_members") > 0)
      } else duplicateGroups(spark, cli)

    val rows = groups.select(col("cluster_id").cast("string"),
        array_join(transform(col("members"), _.cast("string")), ",").as("row"))
      .orderBy("cluster_id")
    val collected = rows.select("row").collect().map(_.getString(0))

    if (collected.isEmpty) {
      if (!cli.quiet) out.println("No duplicate images found")
      return 1
    }
    if (cli.csvOut.nonEmpty && cli.csvOut != "-")
      Report.writeGroupsCsv(groups, cli.csvOut, coalesce1 = true)
    else collected.foreach(out.println)

    // survivorship actions over the full-dedup clusters (reference applies
    // them group-by-group on the driver; here they are a distributed plan)
    val action =
      if (cli.moveTo.nonEmpty) Some(("move", cli.moveTo, true))
      else if (cli.copyTo.nonEmpty) Some(("copy", cli.copyTo, true))
      else if (cli.delete) Some(("delete", "", !cli.deleteAll))
      else None
    action.foreach { case (kind, dest, keepFirst) =>
      val members = groups.select(col("cluster_id"), explode(col("members")).as("doc_id"))
        .withColumn("path", col("doc_id"))
      // eager checkpoint: the mapPartitions sink is SIDE-EFFECTING, so it
      // must execute exactly once — a second action on the raw plan would
      // re-run every move/copy/delete
      val results = FileActions.execute(spark,
        FileActions.plan(members, kind, dest, keepFirst)).localCheckpoint(true)
      val failed = results.filter(!_.ok).collect()
      failed.foreach(r => System.err.println(s"[graft] $kind failed: ${r.src}: ${r.error}"))
      if (!cli.quiet) out.println(s"${results.count() - failed.length} files ${kind}d")
    }
    0
  }

  def main(args: Array[String]): Unit = {
    parse(args.toIndexedSeq, scala.io.Source.stdin.getLines()) match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(2)
      case Right(cli) =>
        val spark = SparkSession.builder()
          .appName("graft-dedupe")
          .config("spark.sql.adaptive.enabled", "true")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val code = run(spark, cli)
        spark.stop()
        sys.exit(code)
    }
  }
}
