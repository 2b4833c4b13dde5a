package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Stage checkpointing with lineage + metrics manifests (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * No Iceberg runtime jar ships in this sandbox (SURVEY.md preamble), so the
  * abstraction is a partitioned Parquet table plus a `_graft_manifest.json`
  * sidecar carrying {stage, resume key, row count, per-partition row counts,
  * wall time}. `stage()` skips recompute when an existing manifest's resume
  * key (config digest ⊕ input-data digest ⊕ stage ordinal — see
  * Pipeline.run's baseKey) matches — a rerun after a kill
  * resumes at the first missing/mismatched stage with byte-identical results
  * (the pipeline is deterministic end-to-end). An Iceberg-backed TableIO can
  * be dropped in where the runtime exists; the contract is this trait.
  */
trait TableIO extends Serializable {
  def write(name: String, df: DataFrame, resumeKey: Long): Unit
  def read(spark: SparkSession, name: String): DataFrame
  /** resume key of a completed stage, if present and readable. */
  def completedKey(name: String): Option[Long]
}

class ParquetTableIO(root: String) extends TableIO {
  protected def dir(name: String) = s"$root/$name"
  private def manifestPath(name: String) = Paths.get(dir(name), "_graft_manifest.json")

  /** The data write alone (manifest handled by [[write]]) — the override
    * point for layouts that keep the same path contract but a different
    * writer (e.g. [[BucketedParquetTableIO]]).
    */
  protected def writeData(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(dir(name))

  def write(name: String, df: DataFrame, resumeKey: Long): Unit = {
    val t0 = System.nanoTime()
    writeData(name, df)
    // per-partition (file) row counts from the written footers = the
    // per-partition lineage/metrics record
    val spark = df.sparkSession
    val written = spark.read.parquet(dir(name))
    val perFileCounts = written
      .select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .groupBy("f").count().collect()
      .map(r => (fileTail(r.getString(0)), r.getLong(1)))
    val perFile = perFileCounts
      .map { case (f, n) => s"""{"file":${jsonStr(f)},"rows":$n}""" }
    val rows = perFileCounts.map(_._2).sum
    val wallMs = (System.nanoTime() - t0) / 1000000
    val json =
      s"""{"stage":${jsonStr(name)},"resume_key":"$resumeKey","rows":$rows,""" +
        s""""wall_ms":$wallMs,"partitions":[${perFile.mkString(",")}]}"""
    Files.writeString(manifestPath(name), json)
  }

  /** Reads restore bucket co-location whenever the stage dir self-describes
    * as bucketed (see [[Bucketing.readMaybeBucketed]]) — so a later
    * generation's fold gets shuffle-free state joins no matter which
    * TableIO class reads the checkpoint.
    */
  def read(spark: SparkSession, name: String): DataFrame =
    Bucketing.readMaybeBucketed(spark, dir(name))

  def completedKey(name: String): Option[Long] = {
    val p = manifestPath(name)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      val m = """"resume_key":"(-?\d+)"""".r.findFirstMatchIn(s)
      m.map(_.group(1).toLong)
    }
  }

  private def fileTail(f: String): String = f.split('/').takeRight(1).mkString
  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object Checkpoints {
  /** Compute-or-resume a stage. The returned frame always reads from the
    * materialized table, truncating upstream lineage.
    */
  def stage(spark: SparkSession, io: TableIO, name: String, resumeKey: Long)(
      compute: => DataFrame): DataFrame = {
    if (!io.completedKey(name).contains(resumeKey)) io.write(name, compute, resumeKey)
    io.read(spark, name)
  }
}
