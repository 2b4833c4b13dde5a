package graft

import graft.pipeline.{Blocking, Components, GraftConfig, Pairs, Pipeline, Signatures}
import graft.synth.Corpus
import org.apache.spark.sql.functions._

/** Round-6 optimization probe: isolates the pipeline's stage internals
  * (band relation build, census, block self-join, vote, scoring) on the
  * bench corpus so the 10-second "candidates" stage can be attributed.
  * Methodology: guide §1.4 — each leg materialized via count/noop, timed
  * warm (2nd rep).
  */
object DiagR06 {
  def main(args: Array[String]): Unit = {
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[" + sys.env.getOrElse("DIAG_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .config("spark.ui.enabled", "false")
    sys.env.get("DIAG_EVENTLOG").foreach { d =>
      new java.io.File(d).mkdirs()
      builder.config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", d)
    }
    val spark = builder
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._

    val entities = sys.env.getOrElse("DIAG_ENTITIES", "60000").toInt
    val docs = Corpus.generateDistributed(spark,
        Corpus.Params(entities = entities, minWords = 150, maxWords = 400, seed = 42))
      .map(_.doc)(org.apache.spark.sql.Encoders.product[graft.model.Doc])
      .cache()
    println("docs=" + docs.count())
    val cfg = Corpus.RecommendedConfig

    def timed[T](name: String, reps: Int = 2)(f: => T): T = {
      var out: Option[T] = None
      (1 to reps).foreach { i =>
        spark.sparkContext.setJobDescription(s"diag:$name rep$i")
        val t0 = System.nanoTime()
        out = Some(f)
        println(f"[diag] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.sparkContext.setJobDescription(null)
      out.get
    }

    // leg 1: signature derivation alone (noop-materialized)
    timed("signatures(noop)") {
      Signatures.derive(docs, cfg, graft.media.DefaultMedia).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    val sigs = Signatures.derive(docs, cfg, graft.media.DefaultMedia).map(_.sig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("sigs=" + sigs.count())

    // leg 2: band relation build + persist + count
    val b = timed("bandRows build+count", 1) {
      val x = Blocking.bandRowsDF(sigs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("bandRows=" + x.count())
      x
    }
    // leg 3: census over the persisted band relation
    timed("census(groupBy+collect)") {
      val c = b.groupBy("block_key").agg(count(lit(1)).as("bsize"))
        .filter(col("bsize") > math.min(cfg.hotBlockSize, cfg.maxBlockSize))
        .collect()
      println("censusKeys=" + c.length)
    }
    // leg 4: raw block self-join volume (pre-vote)
    timed("selfJoin raw pairs(count)") {
      val l = b.alias("l"); val r = b.alias("r")
      val n = l.join(r, col("l.block_key") === col("r.block_key") &&
          col("l.doc_id") < col("r.doc_id")).count()
      println("rawPairs=" + n)
    }
    // leg 5: the full prefilteredPairs + vote (the shipping candidates stage body)
    val cands = timed("candidatePairs full") {
      val (c, _, rel) = Blocking.candidatePairs(sigs, cfg)
      val x = c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("cands=" + x.count())
      rel()
      x
    }
    // leg 6: scoring
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/diag_score_plan.txt"),
      Pairs.score(cands, sigs, cfg).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    timed("score(noop)") {
      Pairs.score(cands, sigs, cfg).write.format("noop").mode("overwrite").save()
    }
    // leg 7: CC on edges
    timed("cc") {
      val e = Pairs.edges(Pairs.score(cands, sigs, cfg))
      println("cc rows=" + Components.connectedComponents(e).count())
    }
    spark.stop()
  }
}

/** Micro: full vs threshold levenshtein on 60-char pairs (the levVerify /
  * q_blocking_recall predicate shape).
  */
object DiagLev {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val words = Array.fill(2000)(org.apache.spark.unsafe.types.UTF8String.fromString(
      (1 to 60).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
    // near pairs: perturbed copies
    val near = words.map { w =>
      val s = w.toString.toCharArray
      (0 until 10).foreach(_ => s(rnd.nextInt(60)) = ('a' + rnd.nextInt(26)).toChar)
      org.apache.spark.unsafe.types.UTF8String.fromString(new String(s))
    }
    def bench(name: String)(f: (Int, Int) => Int): Unit = {
      (1 to 3).foreach { rep =>
        var acc = 0L
        val t0 = System.nanoTime()
        var i = 0
        while (i < 2000) {
          var j = 0
          while (j < 500) { acc += f(i, (i + j + 1) % 2000); j += 1 }
          i += 1
        }
        if (rep == 3) println(f"$name: ${(System.nanoTime() - t0) / 1e6}%.1f ms (1M pairs) acc=$acc")
      }
    }
    bench("full rand")((i, j) => words(i).levenshteinDistance(words(j)))
    bench("thr14 rand")((i, j) => words(i).levenshteinDistance(words(j), 14))
    bench("full near")((i, j) => words(i).levenshteinDistance(near(i)))
    bench("thr14 near")((i, j) => words(i).levenshteinDistance(near(i), 14))
  }
}
