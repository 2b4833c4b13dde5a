package graft

/** Dumps formatted physical plans for the flagship queries → PLANS.md
  * material. Checks the things the design promises: pushed filters, pruned
  * read schemas, broadcast joins where a side is small, no Exchange where
  * none is needed.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    val interesting = Seq("q1_agg", "q_top_customers", "q_exact_dedup",
      "q_hamming_pairs", "q_lev_pairs", "q_cosine_topk", "q_minhash_lsh",
      "q_embed_near_dup", "q_jw_pairs", "q_cluster_groups", "q_survivorship",
      "q_list_filter")
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // pushdown check: projection+filter over parquet
    println("\n===== pushdown probe =====")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
      .explain("formatted")
    spark.stop()
  }
}
