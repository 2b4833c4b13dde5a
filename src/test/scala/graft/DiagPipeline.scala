package graft
import graft.synth.Corpus
object DiagPipeline {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[" + sys.env.getOrElse("DIAG_CPUS", "32") + "]").config("spark.sql.shuffle.partitions", sys.env.getOrElse("DIAG_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = Corpus.generate(Corpus.Params(entities = sys.env.getOrElse("DIAG_ENTITIES", "5000").toInt,
      minWords = sys.env.getOrElse("DIAG_MINWORDS", "20").toInt,
      maxWords = sys.env.getOrElse("DIAG_MAXWORDS", "60").toInt,
      mediaSpanProb = sys.env.getOrElse("DIAG_MEDIA", "0.5").toDouble, seed = 42)).map(_.doc)
    val docs = spark.createDataset(corpus).repartition(sys.env.getOrElse("DIAG_PARTS", "64").toInt).cache()
    println("docs=" + docs.count())
    val t0 = System.nanoTime()
    val r = graft.pipeline.Pipeline.run(spark, docs, Corpus.RecommendedConfig)
    println("rows=" + r.clusters.count() + " edges=" + r.edges.count())
    println(f"total=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
