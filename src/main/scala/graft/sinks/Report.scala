package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Duplicate-group report: the reference's flagship output — one CSV row per
  * duplicate group, members ordered with the keeper (min doc_id) first
  * (`/root/reference/dedupe.go:101-123`, `cmd/dedupe/main.go:194-206`).
  *
  * `groups` is the A3 group-materialization operator: cluster assignments →
  * one row per multi-member cluster. The `collect_list` is bounded by the
  * largest duplicate group (a data property, not the corpus size), so the
  * aggregation is a plain map-side-combined hash aggregate — safe at 100 TB
  * as long as no single entity has millions of copies; `maxMembers` caps the
  * materialized list for adversarial groups.
  */
object Report {

  /** (doc_id, cluster_id, ...) → (cluster_id, n_members, members) with
    * members sorted ascending (keeper first), multi-member clusters only.
    */
  def groups(clusters: DataFrame, maxMembers: Int = 100000): DataFrame =
    clusters
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        slice(sort_array(collect_list(col("doc_id"))), 1, maxMembers).as("members"))
      .filter(col("n_members") > 1)

  /** S7 CSV sink: one comma-joined row per group, keeper first — the exact
    * shape of the reference's `csv.Writer.Write(group)` rows. Partitioned
    * write (one file per task); pass `coalesce1 = true` for the reference's
    * literal single-file layout on small outputs.
    */
  def writeGroupsCsv(groupsDf: DataFrame, path: String, coalesce1: Boolean = false): Unit = {
    val rows = groupsDf
      .select(array_join(transform(col("members"), _.cast("string")), ",").as("group"))
      .orderBy(col("group"))
    val out = if (coalesce1) rows.coalesce(1) else rows
    // bare comma-joined rows, no header/quoting: the reference's csv.Writer
    // emits exactly id1,id2,... per group
    out.write.mode(SaveMode.Overwrite).text(path.stripSuffix("/"))
  }
}
