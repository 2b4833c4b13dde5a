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
    *
    * `maxMembers` bounds the aggregation BUFFER, not just the output width:
    * members are rank-filtered per cluster BEFORE `collect_list`, so an
    * adversarial million-member cluster materializes at most `maxMembers`
    * entries in any buffer. `n_members` still counts every member (plain
    * map-side-combined hash aggregate). Singleton clusters — the bulk of a
    * dedup result — are filtered out before the rank window, so the
    * shuffle+sort only sees actual duplicate-group rows.
    */
  def groups(clusters: DataFrame, maxMembers: Int = 100000): DataFrame = {
    val counts = clusters.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    val multi = clusters.select("cluster_id", "doc_id")
      .join(counts.filter(col("n_members") > 1), "cluster_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy("doc_id")
    // row_number ascending keeps the smallest maxMembers doc_ids — the same
    // keeper-first prefix the previous slice(sort_array(...)) produced
    multi.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxMembers)
      .groupBy("cluster_id", "n_members")
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .select("cluster_id", "n_members", "members")
  }

  /** RFC-4180 field quoting, matching the reference's Go `encoding/csv`
    * writer (`fieldNeedsQuotes`): a member is wrapped in quotes (inner
    * quotes doubled) when it contains comma, quote, CR or LF, when its
    * FIRST rune is white space (Go quotes leading-space fields so readers
    * with TrimLeadingSpace don't eat the content), or when it is the
    * literal field `\.` (Go's PostgreSQL-dump guard). Plain members stay
    * bare, so comma-free corpora keep byte-identical rows to the unquoted
    * form. (A bare array_join would corrupt any group holding a legal path
    * like `cats, dogs/img.jpg` — consumers splitting on commas would see
    * bogus members and a cleanup script would target wrong paths.)
    * Leading-whitespace class: Java's \s plus the Unicode space separators
    * and NEL — the code points unicode.IsSpace accepts.
    */
  def csvField(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.rlike("[\",\n\r]") || c.rlike("^[\\s\\p{Zs}\\u0085\\u2028\\u2029]") ||
        c === lit("\\."),
      concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))
      .otherwise(c)

  /** One CSV row from a members array, keeper first, fields quoted per
    * [[csvField]] — shared by the CSV sink and Main's stdout report.
    */
  def csvRow(members: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(transform(members, m => csvField(m.cast("string"))), ",")

  /** S7 CSV sink: one comma-joined row per group, keeper first — the exact
    * shape of the reference's `csv.Writer.Write(group)` rows (including its
    * quoting of comma/quote-bearing fields). Partitioned write (one file
    * per task); pass `coalesce1 = true` for the reference's literal
    * single-file layout on small outputs.
    */
  def writeGroupsCsv(groupsDf: DataFrame, path: String, coalesce1: Boolean = false): Unit = {
    val rows = groupsDf
      .select(csvRow(col("members")).as("group"))
      .orderBy(col("group"))
    val out = if (coalesce1) rows.coalesce(1) else rows
    out.write.mode(SaveMode.Overwrite).text(path.stripSuffix("/"))
  }
}
