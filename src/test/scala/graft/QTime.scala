package graft
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = sys.env.getOrElse("QNAME", "q_embed_near_dup")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    df.count()
    println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
