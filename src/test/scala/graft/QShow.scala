package graft
object QShow {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(sys.env.getOrElse("QNAME","q_embed_near_dup"))(spark, sys.env.getOrElse("QSF","/root/testdata/sf0.1")).show(50, false)
    spark.stop()
  }
}
