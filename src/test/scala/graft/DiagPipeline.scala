package graft
import graft.synth.Corpus
object DiagPipeline {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[" + sys.env.getOrElse("DIAG_CPUS", "32") + "]").config("spark.sql.shuffle.partitions", sys.env.getOrElse("DIAG_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = Corpus.generate(Corpus.Params(entities = sys.env.getOrElse("DIAG_ENTITIES", "5000").toInt, seed = 42)).map(_.doc)
    val docs = spark.createDataset(corpus).repartition(sys.env.getOrElse("DIAG_CPUS", "32").toInt * 2).cache()
    println("docs=" + docs.count())
    val t0 = System.nanoTime()
    val r = graft.pipeline.Pipeline.run(spark, docs, Corpus.RecommendedConfig)
    println("rows=" + r.clusters.count() + " edges=" + r.edges.count())
    println(f"total=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
