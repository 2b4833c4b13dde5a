package graft

import graft.synth.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operator-surface stress at the 850k-doc corpus (VERDICT r3 item 7):
  * the candidate-volume stress in BASELINE.md covers the flagship
  * PIPELINE leg only — this main runs the banded-relation QUERY family
  * (the sBandRelation / levEdges / sFlagshipCC consumers: scorer pairs,
  * CC, reports, survivorship, audits) once at 8× bench scale and prints
  * per-query wall seconds plus the shared-relation census, confirming the
  * session-memoized localCheckpoint relations hold under MEMORY_AND_DISK.
  *
  * Protocol: the deterministic labeled corpus (seed 42, same generator as
  * the Bench/stress pipeline legs) is written as a documents-table-shaped
  * parquet dir (doc_id int64, text, lang, source, n_chars — the
  * TESTDATA.md shape), then each family query runs via
  * `SparkEntry.queries` exactly as the driver would. doc_id =
  * digits-of-string-id (entity*10 + dup index — unique by construction
  * with hotEntityCopies = 0); lang/source are deterministic id functions.
  *
  * Env: SPARK_GRAFT_SCALE_ENTITIES (default 500000 → 850,306 docs),
  * SPARK_GRAFT_SCALE_DIR (default /dev/shm/graft_bandscale).
  */
object DiagBandScale {
  def main(args: Array[String]): Unit = {
    val entities = sys.env.getOrElse("SPARK_GRAFT_SCALE_ENTITIES", "500000").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/dev/shm/graft_bandscale")
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

    val t0 = System.nanoTime()
    val docs = Corpus.generateDistributed(spark,
        Corpus.Params(entities = entities, minWords = 150, maxWords = 400, seed = 42))
      .map { ld =>
        val d = ld.doc
        val idNum = d.doc_id.filter(_.isDigit).toLong // e*10 + dup idx, unique
        val text = d.concatText
        (idNum, text, Seq("en", "de", "fr", "es", "it")((idNum % 5).toInt),
          s"src${idNum % 20}", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"[bandscale] wrote $nDocs docs in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $dir")

    // the banded-relation consumer family (no PPJoin-truth consumers: the
    // exact evaluator runs sampled at this scale — q_er_f1_sampled's knob)
    val family = Seq(
      "q_lev_pairs", "q_jw_pairs", "q_monge_elkan", "q_cand_hist",
      "q_cc_clusters", "q_center_clusters", "q_cluster_groups",
      "q_survivorship", "q_cluster_cohesion", "q_threshold_sweep",
      "q_cross_source_dups", "q_golden_record", "q_fellegi_sunter",
      "q_fs_decisions",
      // round-4 second-session additions riding the same pinned relations
      "q_hac_clusters", "q_cluster_stability", "q_dedup_cascade",
      // round-5: COP constrained clustering (same pinned relations; the
      // solver adds two O(components) constraint joins + one capped
      // flatMapGroups)
      "q_constrained_cc", "q_constrained_must",
      // round-5 ER-audit additions: mutual-best rides the linkage band
      // split; the capture-recapture and blocking-scheme censuses pay
      // stratum-bounded pair legs — run this main with
      // GRAFT_EVAL_SAMPLE_K sized for the corpus (e.g. 64 at 850k: the
      // same 1/k dial the evaluator family documents), because the
      // first-token-Soundex blocker SATURATES on the synthetic vocabulary
      // (few hundred keys) and the full-stratum pair leg is exactly the
      // bad-blocker cost the analytic n_cand_full column is there to
      // expose without enumerating
      "q_mutual_best", "q_dup_rate_cr", "q_blocking_scheme",
      // round-5 graph audits (same pinned relations, capped
      // component-parallel kernels)
      "q_bridge_docs", "q_evidence_mst")
    var total = 0.0
    family.foreach { name =>
      val q0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - q0) / 1e9
      total += sec
      println(f"[bandscale] $name%-22s $sec%8.1f s  rows=$rows")
    }
    println(f"[bandscale] family total $total%.1f s over ${family.size} queries at $nDocs docs")
    spark.stop()
  }
}
