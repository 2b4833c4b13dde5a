package graft.sources

import graft.model.{Doc, Span}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Directory media source as a Spark dataflow (reference S1/S2/S3:
  * `FindImages` walk + extension predicate, `/root/reference/utils/file.go:25-60`).
  *
  * The reference walks a directory on one thread and accumulates a path
  * array in memory (its own TODO notes that list "could be potentially very
  * large"). Here discovery is Spark's distributed `binaryFile` file index:
  * listing parallelizes across the cluster, the extension predicate is a
  * `pathGlobFilter` applied during listing (never reads file bytes), and
  * column pruning means a `path`-only projection never opens the files —
  * `.explain` shows ReadSchema: struct<path:string> only.
  */
object MediaSource {

  /** The reference's image-extension predicate (`utils/file.go:34-37`),
    * case-sensitive lowercase exactly as `filepath.Ext` equality is.
    */
  val ImageGlob = "*.{png,jpg,jpeg}"

  /** S1+S2: recursive (or top-level-only) image scan under `root`.
    * Columns: path, modificationTime, length, content (prunable).
    */
  def scanImages(spark: SparkSession, root: String, recursive: Boolean = true): DataFrame =
    if (recursive)
      spark.read.format("binaryFile")
        .option("pathGlobFilter", ImageGlob)
        .option("recursiveFileLookup", "true")
        .load(root)
    else // glob in the load path = top-level only (the reference's SkipDir)
      spark.read.format("binaryFile")
        .load(s"${root.stripSuffix("/")}/$ImageGlob")

  /** S3 path classifier as a dataflow column (not a driver-side walk):
    * extension → media kind. Unknown extensions classify as "other" and can
    * be routed to a skip/error channel by the caller.
    */
  def kindOfPath(path: Column): Column =
    when(path.rlike("\\.(png|jpg|jpeg)$"), "image")
      .when(path.rlike("\\.(mp4|mov|mkv|webm)$"), "video")
      .when(path.rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
      .otherwise("other")

  /** Scanned files → Dataset[Doc]: one single-media-span doc per file,
    * doc_id = full path (the reference keys its FileMapper by path and its
    * report rows ARE paths — `cmd/dedupe/main.go:151-160`). A basename key
    * would collide for same-named files in different directories under
    * recursive scans, violating the pipeline's doc_id-uniqueness assumption
    * (pre-collapse mapping joins and keeper selection would then act on the
    * wrong file). Top-level scan only reads `path` — decode happens later in
    * the signature stage via MediaResolver.
    */
  def asDocs(spark: SparkSession, files: DataFrame): Dataset[Doc] = {
    import spark.implicits._
    files.select(col("path")).as[String].map { p =>
      val local = localPath(p)
      Doc(local, Seq(Span.media(local, 0)))
    }
  }

  /** binaryFile's `path` column → local filesystem path. MEASURED behavior
    * on this Spark/Hadoop line (probed, and pinned by SourcesSpec's
    * URI-escape test): Hadoop `Path.toString` emits the path RAW —
    * "file:/a/my cat.png", "pct%25.png", "ha#sh.png" keep their literal
    * space/%/# — so the ONLY transform needed is dropping the scheme
    * prefix. Do NOT URI-decode here: a raw literal "%25" in a filename
    * would decode to "%", making the real file unresolvable (the string
    * alone cannot distinguish encoded from literal — the classic Hadoop
    * Path ambiguity). If a future engine version switches this column to
    * URI-encoded form, the pinning test fails loudly and this helper is
    * where the decode belongs.
    */
  private[graft] def localPath(p: String): String = p.stripPrefix("file:")

  /** S4 list source: the reference reads a target list from stdin
    * (`cmd/dedupe/main.go:110-117`) and dedupes only those files. The Spark
    * analog: the external list becomes a Dataset and the restriction is a
    * LEFT SEMI join — broadcastable when the list is stdin-sized, shuffled
    * when it is another table.
    */
  def restrictTo(docs: Dataset[Doc], ids: Dataset[String]): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.join(ids.toDF("doc_id"), Seq("doc_id"), "left_semi").as[Doc]
  }
}
