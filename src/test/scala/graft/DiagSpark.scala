package graft
import graft.synth.Corpus
import graft.pipeline.{GraftConfig, Signatures}
import graft.media.DefaultMedia
object DiagSpark {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = Corpus.generate(Corpus.Params(entities = 150000, seed = 42)).map(_.doc)
    val docs = spark.createDataset(corpus).repartition(64).cache()
    println("docs=" + docs.count())
    val cfg = Corpus.RecommendedConfig
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val sig = Signatures.derive(docs, cfg, DefaultMedia)(spark)
    time("map+count only")(sig.count())
    time("map+count again")(sig.count())
    val df = Signatures.derive(docs, cfg, DefaultMedia)(spark).toDF()
    time("toDF+persist+count") {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
    }
    time("read persisted")(df.count())
    spark.stop()
  }
}
