package graft

import graft.model.{Doc, Span}
import graft.pipeline.Pipeline
import graft.synth.Corpus
import graft.text.Hashing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew stress: the clean corpora (testdata, Corpus) never produce a hot
  * or degenerate block (every 850k-doc census to date read 0 keys), so the
  * explicit skew machinery — census → salted hot-block join, degenerate
  * drop, exact pre-collapse — has scale CORRECTNESS proofs (BlockJoinOracle
  * Spec forces them at toy size) but no scale EVIDENCE. This main runs the
  * flagship pipeline on a web-shaped skewed corpus and asserts the paths
  * engage and stay correct at ~250k docs:
  *
  *   - hot media family: H docs sharing ONE media span (the reused-logo
  *     shape — every page of a site carries the same header image) with
  *     distinct texts. All C(8,2)=28 media block tables hold the family as
  *     one block of size H > hotBlockSize ⇒ salted join; media_dist = 0
  *     decides every within-family pair (the text scorers stay gated off —
  *     see Pairs.scoreSides), so the family must land in EXACTLY one
  *     cluster of size H.
  *   - degenerate family: D > maxBlockSize docs sharing a different media
  *     span — the block census must DROP all 28 blocks with logged counts,
  *     and (distinct texts) every member must come out a singleton.
  *   - exact farm: hotEntityCopies byte-identical copies of entity 0's
  *     base doc — pre-collapse keeps them out of blocking entirely and the
  *     farm must cluster with its base.
  *
  * The clean corpus runs first at the same scale for the wall-time delta:
  * the skew families must cost their candidate volume, not a stall.
  *
  * Env: SPARK_GRAFT_SKEW_ENTITIES (default 120000 → ~205k base docs),
  * SPARK_GRAFT_SKEW_HOT (default 4096), SPARK_GRAFT_SKEW_DEG (default
  * 10000), SPARK_GRAFT_SKEW_FARM (default 20000).
  */
object DiagSkew {
  private def words(seed: Long, n: Int): String = {
    var s = seed
    val sb = new StringBuilder(n * 8)
    var i = 0
    while (i < n) {
      s = Hashing.mix64(s)
      if (i > 0) sb.append(' ')
      sb.append("w").append(java.lang.Long.toHexString(s & 0xffffffffL))
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val entities = sys.env.getOrElse("SPARK_GRAFT_SKEW_ENTITIES", "120000").toInt
    val hotN = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT", "4096").toInt
    val degN = sys.env.getOrElse("SPARK_GRAFT_SKEW_DEG", "10000").toInt
    val farmN = sys.env.getOrElse("SPARK_GRAFT_SKEW_FARM", "20000").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/spark-graft"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // maxBlockSize lowered so the degenerate family is test-sized; the
    // production default (100k) means the same shape at 100k+ members
    val cfg = Corpus.RecommendedConfig.copy(maxBlockSize = 8192)
    require(hotN > cfg.hotBlockSize && hotN <= cfg.maxBlockSize, "hot family must salt")
    require(degN > cfg.maxBlockSize, "degenerate family must drop")

    val base = Corpus.generateDistributed(spark,
      Corpus.Params(entities = entities, minWords = 150, maxWords = 400,
        seed = 42, hotEntityCopies = farmN)).map(_.doc)

    def family(tag: String, n: Int, ref: String): org.apache.spark.sql.Dataset[Doc] =
      spark.range(0, n.toLong, 1L, 32).map { i =>
        Doc(f"$tag-$i%06d", Seq(
          Span.text(words(Hashing.hash64(tag, i), 200), 0),
          Span.media(ref, 1)))
      }

    val hot = family("hot", hotN, "synth://hotfam")
    val deg = family("deg", degN, "synth://degfam")

    def timeRun(name: String, docs: org.apache.spark.sql.Dataset[Doc]): Pipeline.Result = {
      val t0 = System.nanoTime()
      val r = Pipeline.run(spark, docs, cfg)
      val n = r.clusters.count()
      println(f"[skew] $name%-6s wall ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
        f"docs=$n  salted=${r.stats.saltedBlocks} dropped=${r.stats.droppedBlocks} " +
        f"droppedRows=${r.stats.droppedRows}")
      r
    }

    val clean = timeRun("clean", base)
    clean.release()
    val skew = timeRun("skewed", base.unionByName(hot).unionByName(deg))

    // ---- path-engagement asserts (deterministic: seeded corpus) ----
    require(skew.stats.saltedBlocks >= 28,
      s"hot family did not salt: ${skew.stats.saltedBlocks} blocks")
    require(skew.stats.droppedBlocks >= 28,
      s"degenerate family not dropped: ${skew.stats.droppedBlocks} blocks")
    require(skew.stats.droppedRows >= 28L * degN,
      s"dropped row count too low: ${skew.stats.droppedRows}")

    val clusters = skew.clusters.select("doc_id", "cluster_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hot family: exactly one cluster holding exactly the H members
    val hotClusters = clusters.filter(col("doc_id").startsWith("hot-"))
      .select("cluster_id").distinct().as[String].collect()
    require(hotClusters.length == 1, s"hot family split: ${hotClusters.length} clusters")
    val hotSize = clusters.filter(col("cluster_id") === hotClusters(0)).count()
    require(hotSize == hotN, s"hot cluster polluted or short: $hotSize != $hotN")
    // degenerate family: every member a singleton (its own cluster)
    val degNonSingleton = clusters.filter(col("doc_id").startsWith("deg-"))
      .filter(col("cluster_id") =!= col("doc_id")).count()
    require(degNonSingleton == 0, s"$degNonSingleton degenerate docs clustered")
    // exact farm: base doc of entity 0 + all copies share one cluster
    val farmSize = clusters.filter(col("cluster_id") ===
      clusters.filter(col("doc_id") === "d00000000-0").select("cluster_id").as[String].head())
      .filter(col("doc_id").startsWith("d00000000-0")).count()
    require(farmSize >= farmN + 1, s"exact farm not clustered with base: $farmSize")
    println(f"[skew] OK  hot cluster=$hotSize  farm cluster=$farmSize  " +
      f"deg singletons=$degN")
    clusters.unpersist()
    skew.release()
    spark.stop()
  }
}
