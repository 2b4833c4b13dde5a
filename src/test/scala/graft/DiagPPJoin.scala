package graft

import org.apache.spark.sql.functions._

/** Census for the exactShinglePairs (PPJoin) key family across scale
  * factors: prefix-block growth is the quantity that decides whether the
  * exact join survives a 100× scale-up (the r2 prefix-of-string family
  * grew 2.8× per 10× docs and was retired for it). Reuses the SHIPPING
  * [[SparkEntry.shinglePrefix]]/[[SparkEntry.positionalCandidates]]
  * stages, so the census cannot drift from the join it measures. Prints,
  * per sf dir: docs, shingle vocabulary, prefix rows, block count, max
  * block size, prefix-candidate pairs, positional-filter survivors,
  * verified pairs.
  *
  * The second loop runs the SAME census on the Zipf(1.07) ~50k-type
  * natural-vocabulary corpus (Corpus.Params.zipfTypes — verdict r4 item 4)
  * at two sizes 10× apart, replacing the "on natural text this would be
  * fine" prose with a measured block-growth slope.
  */
object DiagPPJoin {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/spark-graft"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val thr = 0.8

    def census(label: String, dir: String, sampleK: Int): Unit = {
      val all = spark.read.parquet(s"$dir/documents.parquet")
      val base = if (sampleK <= 1) all
        else all.filter(SparkEntry.sampleBucket(col("doc_id")) % sampleK === 0)
      val d = base.select(col("doc_id"), SparkEntry.shingleSet(col("text")).as("toks"))
      val tok = d.select(col("doc_id"), explode(col("toks")).as("token"))
      val pref = SparkEntry.shinglePrefix(d, thr).localCheckpoint(true)
      val blocks = pref.groupBy("ptok").agg(count(lit(1)).as("bn"))
      val bstats = blocks.agg(count(lit(1)).as("nblocks"), max("bn").as("maxblk"),
        sum(col("bn") * (col("bn") - 1) / 2).as("cand")).collect()(0)
      val surv = SparkEntry.positionalCandidates(pref, thr).count()
      val docs = d.count()
      val vocab = tok.select("token").distinct().count()
      val prefRows = pref.count()
      val pairs = SparkEntry.exactShinglePairs(spark, dir, thr, sampleK).count()
      println(s"[ppjoin] $label sampleK=$sampleK docs=$docs vocab=$vocab prefRows=$prefRows " +
        s"blocks=${bstats.getLong(0)} maxBlock=${bstats.getLong(1)} " +
        s"prefixCand=${bstats.getDouble(2).toLong} posSurvivors=$surv verified=$pairs")
    }

    // sampleK = 1: the full-corpus join; sampleK = 2: the deterministic
    // 1/2 md5 stratum of the bounded evaluator mode (verdict r4 item 6) —
    // the census that shows how much prefix-candidate volume the stratum
    // sheds on this saturated synthetic vocabulary
    // (GRAFT_PPJOIN_SKIP_SF=1 skips these recorded legs when extending the
    // zipf slope with a new size)
    if (!sys.env.get("GRAFT_PPJOIN_SKIP_SF").contains("1"))
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); sampleK <- Seq(1, 2))
        census(sf, s"/root/testdata/$sf", sampleK)

    // natural-vocabulary legs: Zipf(1.07) over ~50k types, bench-shaped
    // docs (150-400 words), sizes 10× apart so the growth SLOPE is the
    // reading (not one absolute number). GRAFT_PPJOIN_ZIPF_ENTITIES
    // (comma-separated) extends/overrides the recorded sizes.
    import spark.implicits._
    val zipfSizes = sys.env.get("GRAFT_PPJOIN_ZIPF_ENTITIES")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(3000, 30000))
    for (entities <- zipfSizes) {
      val dir = s"${if (new java.io.File("/dev/shm").canWrite) "/dev/shm" else System.getProperty("java.io.tmpdir")}/graft_ppjoin_zipf_$entities"
      val docs = graft.synth.Corpus.generateDistributed(spark,
          graft.synth.Corpus.Params(entities = entities, minWords = 150,
            maxWords = 400, seed = 42, zipfTypes = 50000))
        .map { ld =>
          val d = ld.doc
          (d.doc_id.filter(_.isDigit).toLong, d.concatText)
        }
        .toDF("doc_id", "text")
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      census(s"zipf50k-e$entities", dir, sampleK = 1)
    }
    spark.stop()
  }
}
