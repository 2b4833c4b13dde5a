package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucket-co-located persistence for join-heavy state.
  *
  * The incremental/retraction legs repeatedly join id-keyed state tables
  * (signatures, assignments, band relations) that were WRITTEN by a
  * previous run — as plain parquet, every such join re-shuffles the
  * old-corpus side on doc_id even though its partitioning never changed
  * between runs. Hash-bucketed catalog tables persist that partitioning:
  * two tables bucketed identically on the join key sort-merge-join with
  * ZERO Exchange on either side (BucketingSpec asserts the plan), so a
  * fold's O(corpus) state joins become shuffle-free and only the O(batch)
  * side moves. This is the parquet-native analog of what an Iceberg
  * bucket-partitioned table would give (no Iceberg jar in this sandbox —
  * see TableIO's scaladoc; same drop-in contract).
  *
  * Spark requires the session catalog for bucket metadata (`bucketBy` is
  * only honored through `saveAsTable`), hence this helper is
  * catalog-backed where [[ParquetTableIO]] is path-based: pass an explicit
  * `path` so the data itself still lives under the caller's state root and
  * the catalog entry is just metadata.
  *
  * Scale note: pick `buckets` ≈ the cluster's target shuffle width for
  * this table (too few buckets under-parallelize the join; too many make
  * small files). Bucket counts that divide evenly can still co-locate
  * (Spark coalesces the larger side since 3.1).
  */
object Bucketing {

  /** Write `df` as a hash-bucketed, per-bucket-sorted parquet table at
    * `path`, registered as `table` in the session catalog (replacing any
    * previous registration).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], path: String): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .option("path", path)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back WITH its bucket metadata (a plain
    * `spark.read.parquet(path)` would lose it and re-shuffle on join).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
