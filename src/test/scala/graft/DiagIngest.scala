package graft

import graft.pipeline.Pipeline
import graft.streaming.StreamIngest
import graft.synth.Corpus

/** Bench-scale evidence for the streaming-ingest generation loop
  * (BASELINE.md): seed ~90% of the 102k bench corpus as generation 0, fold
  * two ~5% micro-batches through `StreamIngest.foldBatch` (the exact code
  * the foreachBatch sink runs, including the parquet generation writes and
  * pointer commits), and assert the final generation's assignment table
  * byte-equals a full pipeline run over the union. Reports per-fold wall
  * time so the generation-rewrite share is visible next to the fold
  * compute DiagIncremental isolates.
  */
object DiagIngest {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val entities = sys.env.getOrElse("SPARK_GRAFT_BENCH_ENTITIES", "60000").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/spark-graft"
        else System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val enc: org.apache.spark.sql.Encoder[graft.model.Doc] =
      org.apache.spark.sql.Encoders.product

    val cfg = Corpus.RecommendedConfig
    val all = Corpus.generateDistributed(spark,
        Corpus.Params(entities = entities, minWords = 150, maxWords = 400, seed = 42))
      .map(_.doc).cache()
    val nAll = all.count()
    def bucket(id: String): Long = Math.floorMod(graft.text.Hashing.hash64(id), 20L)
    val seedDocs = all.filter((d: graft.model.Doc) => bucket(d.doc_id) >= 2).cache()
    val b1 = all.filter((d: graft.model.Doc) => bucket(d.doc_id) == 0).cache()
    val b2 = all.filter((d: graft.model.Doc) => bucket(d.doc_id) == 1).cache()
    println(s"[diag] corpus=$nAll seed=${seedDocs.count()} b1=${b1.count()} b2=${b2.count()}")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      a
    }

    val stateDir = java.nio.file.Files.createTempDirectory("graft-diag-ingest").toString
    time("seed (full pipeline + gen0 write)") {
      StreamIngest.seed(spark, seedDocs, stateDir, cfg)
    }
    time("fold batch 0 (incl. gen1 write + commit)") {
      StreamIngest.foldBatch(spark, b1, 0L, stateDir, cfg)
    }
    time("fold batch 1 (incl. gen2 write + commit)") {
      StreamIngest.foldBatch(spark, b2, 1L, stateDir, cfg)
    }

    val (_, assign) = StreamIngest.readCurrentState(spark, stateDir)
    val got = assign.collect().map(r => (r.getString(0), r.getString(1))).toMap
    val full = time("full run over the union (reference)") {
      val r = Pipeline.run(spark, all, cfg)
      val m = r.clusters.select("doc_id", "cluster_id").collect()
        .map(x => (x.getString(0), x.getString(1))).toMap
      r.release(); m
    }
    val diffs = full.count { case (id, c) => got.get(id) != Some(c) }
    println(s"[diag] RESULT generation=${StreamIngest.currentDir(stateDir)} " +
      s"assignments=${got.size} cluster_diffs_vs_full=$diffs")
    require(got.size == nAll, s"assignment table covers ${got.size} of $nAll docs")
    require(diffs == 0, s"streamed generations diverged from the full run: $diffs docs")
    spark.stop()
  }
}
