package graft

/** Census for the q_constrained_cc constraint derivation: how many flagship
  * components span multiple sources/langs per SF (the cannot-link supply),
  * plus the resulting constrained split profile — the measurement behind
  * the "constraints do real work on this corpus" claim in ConstrainedSpec.
  */
object DiagConstrained {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cc = SparkEntry.sFlagshipCC(spark, dir)
      val j = cc.join(docs.select("doc_id", "lang", "source"), "doc_id")
      val byComp = j.groupBy("cluster_id").agg(
        countDistinct("source").as("ns"), countDistinct("lang").as("nl"),
        count(lit(1)).as("n"))
      val total = byComp.count()
      val multiS = byComp.filter(col("ns") > 1).count()
      val multiL = byComp.filter(col("nl") > 1).count()
      val out = SparkEntry.queries("q_constrained_cc")(spark, dir)
      val splits = out.groupBy("cluster_id")
        .agg(countDistinct("ccl_id").as("k"), count(lit(1)).as("n"))
      val split = splits.filter(col("k") > 1).count()
      val whole = splits.filter(col("k") === 1).count()
      // resolved queue: how many components the must-links keep merged
      // that the all-declined queue split
      val outM = SparkEntry.queries("q_constrained_must")(spark, dir)
      val splitsM = outM.groupBy("cluster_id")
        .agg(countDistinct("ccl_id").as("k"))
      val splitM = splitsM.filter(col("k") > 1).count()
      val rows = out.count()
      val diff = out.select("doc_id", "ccl_id")
        .except(outM.select("doc_id", "ccl_id")).count()
      println(s"[diag] $dir comps=$total multi-source=$multiS multi-lang=$multiL " +
        s"declined-queue: split=$split kept-whole=$whole | " +
        s"resolved-queue: split=$splitM rows-moved=$diff/$rows")
    }
    spark.stop()
  }
}
