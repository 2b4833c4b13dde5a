package graft

import graft.pipeline.{Checkpoints, ParquetTableIO, Pipeline}
import graft.synth.Corpus
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** North-rule resumability: per-stage materialized tables + manifests;
  * a rerun resumes from completed stages (no recompute) and the final
  * clusters are identical.
  */
class ResumeSpec extends AnyFunSuite with SparkTestBase {

  private def tempDir(): Path = Files.createTempDirectory("graft-ckpt")

  test("pipeline run with checkpointing writes stage manifests with metrics") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val docs = s.createDataset(Corpus.generate(Corpus.Params(entities = 60)).map(_.doc))
    Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir))
      .clusters.count()
    Seq("signatures", "candidates", "scored", "clusters").foreach { stage =>
      val m = java.nio.file.Paths.get(dir, stage, "_graft_manifest.json")
      assert(Files.exists(m), s"missing manifest for $stage")
      val json = Files.readString(m)
      assert(json.contains("\"rows\":") && json.contains("\"wall_ms\":") &&
        json.contains("\"partitions\":"), s"manifest $stage lacks metrics: $json")
    }
  }

  test("rerun resumes: completed stages are not recomputed, clusters identical") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val docs = s.createDataset(Corpus.generate(Corpus.Params(entities = 60)).map(_.doc))
    val first = Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir))
      .clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val sigManifest = java.nio.file.Paths.get(dir, "signatures", "_graft_manifest.json")
    val mtime = Files.getLastModifiedTime(sigManifest)
    Thread.sleep(20)
    val second = Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir))
      .clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(Files.getLastModifiedTime(sigManifest) == mtime,
      "signatures stage was recomputed on resume")
    assert(first == second)
  }

  test("resume skips the hot-key census entirely (no eager O(corpus) collect)") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val docs = s.createDataset(Corpus.generate(Corpus.Params(entities = 40)).map(_.doc))
    Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir)).clusters.count()
    // the census announces itself on stderr ("[graft]   census: ...") —
    // a resumed run with a completed candidates stage must never reach it:
    // candidatePairs' collect() is the largest scan in the pipeline and
    // used to run eagerly at plan-construction time, before the manifest
    // check, wasting a full band pass on every resume
    val realErr = System.err
    val buf = new java.io.ByteArrayOutputStream()
    val r2 = try {
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir))
    } finally System.setErr(realErr)
    r2.clusters.count()
    r2.release()
    assert(!buf.toString("UTF-8").contains("census:"),
      "hot-key census ran on a fully-resumed pipeline")
    // and the contract value: nothing was dropped/salted THIS run
    assert(r2.stats == graft.pipeline.Blocking.BlockStats(0L, 0L, 0L))
  }

  test("config change invalidates the resume key and forces recompute") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val docs = s.createDataset(Corpus.generate(Corpus.Params(entities = 30)).map(_.doc))
    Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir)).clusters.count()
    val sigManifest = java.nio.file.Paths.get(dir, "signatures", "_graft_manifest.json")
    val mtime = Files.getLastModifiedTime(sigManifest)
    Thread.sleep(20)
    Pipeline.run(s, docs, Corpus.RecommendedConfig.copy(shingleK = 9),
      checkpointDir = Some(dir)).clusters.count()
    assert(Files.getLastModifiedTime(sigManifest) != mtime,
      "changed config must recompute the stage")
  }

  test("input-data change invalidates the resume key and forces recompute") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val docs = s.createDataset(Corpus.generate(Corpus.Params(entities = 30)).map(_.doc))
    Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir)).clusters.count()
    val sigManifest = java.nio.file.Paths.get(dir, "signatures", "_graft_manifest.json")
    val mtime = Files.getLastModifiedTime(sigManifest)
    Thread.sleep(20)
    // same config, DIFFERENT input: stale stage tables must not be reused
    val docs2 = s.createDataset(Corpus.generate(Corpus.Params(entities = 31)).map(_.doc))
    Pipeline.run(s, docs2, Corpus.RecommendedConfig, checkpointDir = Some(dir)).clusters.count()
    assert(Files.getLastModifiedTime(sigManifest) != mtime,
      "signatures stage reused a checkpoint from different input data")
  }

  test("content change under STABLE doc_ids invalidates the resume key") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val base = Corpus.generate(Corpus.Params(entities = 30)).map(_.doc)
    val docs = s.createDataset(base)
    Pipeline.run(s, docs, Corpus.RecommendedConfig, checkpointDir = Some(dir)).clusters.count()
    val sigManifest = java.nio.file.Paths.get(dir, "signatures", "_graft_manifest.json")
    val mtime = Files.getLastModifiedTime(sigManifest)
    Thread.sleep(20)
    // same doc_id SET, one doc's spans edited: an id-only digest would
    // silently reuse every stale stage table (round-2 advisory)
    val edited = base.map { d =>
      if (d.doc_id == base.head.doc_id)
        d.copy(spans = d.spans.map(sp =>
          if (sp.kind == "text") sp.copy(text = sp.text + " EDITED") else sp))
      else d
    }
    Pipeline.run(s, s.createDataset(edited), Corpus.RecommendedConfig,
      checkpointDir = Some(dir)).clusters.count()
    assert(Files.getLastModifiedTime(sigManifest) != mtime,
      "signatures stage reused a checkpoint after doc CONTENT changed")
  }

  test("a killed run resumes mid-pipeline: later stages compute, earlier ones reuse") {
    implicit val s = spark
    import s.implicits._
    val dir = tempDir().toString
    val docs = s.createDataset(Corpus.generate(Corpus.Params(entities = 30)).map(_.doc))
    val cfg = Corpus.RecommendedConfig
    val io = new ParquetTableIO(dir)
    // simulate a run that died after the signature stage: only that stage exists
    val key = Pipeline.resumeBaseKey(docs, cfg)
    Checkpoints.stage(s, io, "signatures", key) {
      graft.pipeline.Signatures.derive(docs, cfg, graft.media.DefaultMedia)(s).toDF()
    }
    assert(io.completedKey("signatures").contains(key))
    assert(io.completedKey("candidates").isEmpty)
    // full run picks up from there
    val r = Pipeline.run(s, docs, cfg, checkpointDir = Some(dir))
    assert(r.clusters.count() == docs.count())
    assert(io.completedKey("clusters").isDefined)
  }
}
