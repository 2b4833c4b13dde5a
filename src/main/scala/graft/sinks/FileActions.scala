package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Survivorship action sinks (reference S8/S9/S10:
  * `/root/reference/cmd/dedupe/main.go:208-236`, `utils/file.go:63-92`):
  * move / copy / delete the files behind duplicate groups.
  *
  *  - move: every member of a group → `destDir/group-<cluster_id>/<basename>`
  *  - copy: same layout, copy instead of rename
  *  - delete keep-first: every member EXCEPT the keeper (min doc_id) removed
  *  - delete all: the whole group removed (the reference's `-delete-all`)
  *
  * The reference loops groups on one thread; here the *plan* is a DataFrame
  * (anti-join survivorship rewrite — no collect) and the *execution* is a
  * `mapPartitions` sink over that plan: each task talks to the FileSystem
  * for its slice of files, and per-file outcomes come back as a result
  * Dataset (the reference's errors.Join bubble-up, as a dataflow). Group
  * subdirectories are keyed by cluster_id (stable, deterministic) instead of
  * the reference's in-memory group ordinal, which does not exist distributed.
  */
object FileActions {

  final case class PlannedAction(doc_id: String, cluster_id: String,
                                 src: String, dest: String, action: String)
  final case class ActionResult(src: String, action: String, ok: Boolean, error: String)

  /** Build the action plan from cluster assignments.
    *
    * @param clusters (doc_id, cluster_id, path) — path is the file behind the doc
    * @param action   "move" | "copy" | "delete"
    * @param destDir  target root for move/copy (ignored for delete)
    * @param keepFirst delete only: survivors (min doc_id per cluster) are
    *                  anti-joined OUT of the plan; false = reference -delete-all
    * @param minGroupSize smallest cluster the plan acts on. Default 2:
    *                  singletons are not duplicates in full-dedup mode.
    *                  Targeted-compare groups hold ONLY the target's
    *                  duplicates (the target itself is excluded), so a
    *                  single duplicate is a legitimate 1-member group —
    *                  pass 1 there or the action silently no-ops.
    */
  def plan(clusters: DataFrame, action: String, destDir: String = "",
           keepFirst: Boolean = true, minGroupSize: Int = 2): DataFrame = {
    require(Set("move", "copy", "delete")(action), s"unknown action $action")
    // keep doc_id in its NATIVE type until survivorship is decided: casting
    // to string first would silently switch the keeper to the LEXICOGRAPHIC
    // min ("10" < "2") for numeric ids — caught by SurvivorshipPropertySpec
    val members = clusters.select(
      col("doc_id"),
      col("cluster_id").cast("string").as("cluster_id"),
      col("path").cast("string").as("src"))
    val sizes = members.groupBy("cluster_id").agg(count(lit(1)).as("n"))
    val dupMembers = members.join(
      sizes.filter(col("n") >= minGroupSize).select("cluster_id"), "cluster_id")
    val inScope0 = if (action == "delete" && keepFirst) {
      // survivorship as an anti-join: keepers never enter the plan
      val keepers = dupMembers.groupBy("cluster_id").agg(min("doc_id").as("doc_id"))
      dupMembers.join(keepers, Seq("cluster_id", "doc_id"), "left_anti")
    } else dupMembers
    val inScope = inScope0.withColumn("doc_id", col("doc_id").cast("string"))
    // distinct members of one group can share a basename (a/img.jpg and
    // b/img.jpg) — without disambiguation both would plan to the same dest
    // and the second move/copy would silently clobber the first. Collisions
    // get a deterministic "<rank>-<md5(src) 8 hex>-" prefix (rank by src
    // within (group, name)); the common no-collision case keeps the
    // reference's plain basename. The src hash is what makes the prefixed
    // names collision-proof among THEMSELVES and against a plain kept name:
    // a bare "<rank>-" prefix could equal a real member basename in the
    // same group (members a/img.jpg, b/img.jpg, c/2-img.jpg — b would plan
    // to "2-img.jpg", which c keeps as its rank-1 plain name), silently
    // clobbering on move/copy. Two prefixed names are equal only for equal
    // (rank, md5(src), base) — same partition forbids equal ranks, and a
    // plain name collides only if a real basename literally embeds another
    // member's md5, which no accidental layout produces.
    val base = element_at(split(col("src"), "/"), -1)
    val withRk = inScope.withColumn("base", base)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"), col("base")).orderBy(col("src"))))
    val name = when(col("rk") === 1, col("base"))
      .otherwise(concat(col("rk").cast("string"), lit("-"),
        substring(md5(col("src")), 1, 8), lit("-"), col("base")))
    val dest =
      if (action == "delete") lit("")
      else concat(lit(destDir.stripSuffix("/") + "/group-"), col("cluster_id"),
        lit("/"), name)
    withRk.select(col("doc_id"), col("cluster_id"), col("src"),
      dest.as("dest"), lit(action).as("action"))
  }

  /** Execute a plan: one FileSystem handle per partition, one row in, one
    * outcome row out. Distributed-safe: no driver-side iteration, failures
    * are data (bad-row channel), not exceptions.
    */
  def execute(spark: SparkSession, planDf: DataFrame): Dataset[ActionResult] = {
    import spark.implicits._
    // Ship the session's Hadoop conf to executors (fs.defaultFS, credentials,
    // object-store settings): Configuration isn't serializable and Spark's
    // SerializableConfiguration is private[spark], so capture the entries
    // and rebuild per partition — a fresh Configuration() would silently
    // drop the session's filesystem config on a real cluster.
    val confEntries: Seq[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.result()
    }
    planDf.select("doc_id", "cluster_id", "src", "dest", "action").as[PlannedAction]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        // idempotent per file (a retried task's already-done work reads as
        // ok, not as a spurious failure); dest paths resolve through the
        // DEST's FileSystem so move/copy across stores (s3a source, local
        // dest) lands where the user pointed instead of being re-qualified
        // against the source bucket
        def copyBytes(sfs: org.apache.hadoop.fs.FileSystem,
                      s: org.apache.hadoop.fs.Path,
                      dfs: org.apache.hadoop.fs.FileSystem,
                      d: org.apache.hadoop.fs.Path): Unit = {
          val in = sfs.open(s)
          try {
            val out = dfs.create(d, true)
            try {
              val buf = new Array[Byte](64 * 1024)
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
            } finally out.close()
          } finally in.close()
        }
        def sameFs(a: org.apache.hadoop.fs.FileSystem,
                   b: org.apache.hadoop.fs.FileSystem): Boolean =
          a.getUri == b.getUri
        it.map { a =>
          try {
            val srcPath = new org.apache.hadoop.fs.Path(a.src)
            val fs = srcPath.getFileSystem(conf)
            a.action match {
              case "delete" =>
                // deliberately STRICT (missing file = reported failure,
                // like the reference's os.Remove): unlike move, a missing
                // src carries no evidence the delete already happened, and
                // silently passing typo'd paths would be worse than a rare
                // spurious retry failure
                if (!fs.delete(srcPath, false)) throw new java.io.IOException("delete returned false")
              case "move" =>
                val d = new org.apache.hadoop.fs.Path(a.dest)
                val dfs = d.getFileSystem(conf)
                // retry idempotence: src gone + dest present reads as
                // already-done. CAVEAT: with the src gone there is nothing
                // left to compare against, so a pre-existing UNRELATED file
                // at dest (a destDir reused across different plans) is
                // indistinguishable from our completed move and reads as
                // ok. Within one plan this cannot happen (dest names are
                // collision-proof, see plan()); across plans, point
                // move/copy at a fresh destDir.
                if (!fs.exists(srcPath) && dfs.exists(d)) ()
                else {
                  dfs.mkdirs(d.getParent)
                  if (sameFs(fs, dfs)) {
                    if (!fs.rename(srcPath, d)) throw new java.io.IOException("rename returned false")
                  } else {
                    // rename can't cross filesystems: copy then delete
                    copyBytes(fs, srcPath, dfs, d)
                    if (!fs.delete(srcPath, false))
                      throw new java.io.IOException("source delete after cross-fs copy returned false")
                  }
                }
              case "copy" =>
                val d = new org.apache.hadoop.fs.Path(a.dest)
                val dfs = d.getFileSystem(conf)
                dfs.mkdirs(d.getParent)
                copyBytes(fs, srcPath, dfs, d)
            }
            ActionResult(a.src, a.action, ok = true, error = "")
          } catch {
            case e: Exception =>
              ActionResult(a.src, a.action, ok = false,
                error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
  }
}
